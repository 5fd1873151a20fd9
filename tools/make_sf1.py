#!/usr/bin/env python3
"""Derive a 10x scale-up ("sf1") of the driver's sf0.1 testdata for the
scale sweep. Dimensions (region, nation) are kept as-is; every other table
is replicated 10x with span-offset key remapping so all FK relationships
stay valid. documents.text is word-rotated and embeddings.embedding is
element-rotated per copy so replicas are NOT artificial near-duplicates
(exact clones would quadratically distort the dedup/ANN scaling numbers).
Deterministic; dev-side tool only (pyarrow/pandas are driver-side libs)."""
import os, sys
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
DST = sys.argv[2] if len(sys.argv) > 2 else '/tmp/sf1'
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# optional 4th arg: comma-separated tables to scale (others copy 1:1) —
# the sf10 spot tier replicates only documents+embeddings x100 so the
# candidate-growth families get their third scale point without a 100x
# relational fact blow-up nothing reads
ONLY = set(sys.argv[4].split(',')) if len(sys.argv) > 4 else None
os.makedirs(DST, exist_ok=True)

SPAN = dict(customer=15000, supplier=1000, part=20000, orders=150000,
            events=100000, documents=5000, embeddings=2000, users=1500)
# table -> [(column, span-name)]
REMAP = {
    'customer':  [('c_custkey', 'customer')],
    'supplier':  [('s_suppkey', 'supplier')],
    'part':      [('p_partkey', 'part')],
    'orders':    [('o_orderkey', 'orders'), ('o_custkey', 'customer')],
    'lineitem':  [('l_orderkey', 'orders'), ('l_partkey', 'part'),
                  ('l_suppkey', 'supplier')],
    'events':    [('event_id', 'events'), ('user_id', 'users')],
    'documents': [('doc_id', 'documents')],
    'embeddings': [('vec_id', 'embeddings')],
}

def rotate_words(text, k):
    w = text.split(' ')
    if len(w) < 2 or k == 0: return text
    r = (k * 7) % len(w)
    return ' '.join(w[r:] + w[:r])

def rotate_list(vals, k):
    if not vals or k == 0: return vals
    r = k % len(vals)
    return vals[r:] + vals[:r]

for name in ['region', 'nation']:
    t = pq.read_table(f'{SRC}/{name}.parquet')
    pq.write_table(t, f'{DST}/{name}.parquet')
    print(name, t.num_rows)

for name, remaps in REMAP.items():
    t = pq.read_table(f'{SRC}/{name}.parquet')
    copies = COPIES if ONLY is None or name in ONLY else 1
    chunks = []
    for k in range(copies):
        cols = {}
        for field in t.schema:
            col = t[field.name]
            span = next((s for c, s in remaps if c == field.name), None)
            if span is not None:
                arr = pa.compute.add(col.combine_chunks(),
                                     pa.scalar(k * SPAN[span], type=field.type))
                cols[field.name] = arr
            elif name == 'documents' and field.name == 'text':
                cols[field.name] = pa.array(
                    [rotate_words(v, k) for v in col.to_pylist()], type=field.type)
            elif name == 'embeddings' and field.name == 'embedding':
                cols[field.name] = pa.array(
                    [rotate_list(v, k) for v in col.to_pylist()], type=field.type)
            else:
                cols[field.name] = col.combine_chunks()
        chunks.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(chunks)
    pq.write_table(out, f'{DST}/{name}.parquet', row_group_size=200_000)
    print(name, t.num_rows, '->', out.num_rows)
