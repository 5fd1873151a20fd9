package graft

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Typed view of a replay envelope row (SURVEY.md §1.1: optional
  * `Dataset[StreamEnvelope]` typed surface over the untyped DataFrame). */
case class StreamEnvelope(key: Array[Byte], value: Array[Byte], topic: String,
    partition: Int, offset: Long, timestamp: java.sql.Timestamp)

/** The reusable operator library — what a user of the reference engine would
  * call after switching to graft. Every operator is a DataFrame-in /
  * DataFrame-out composition designed for horizontal scale: hash-partitioned
  * aggregation, inverted-index / bucket joins instead of cross products,
  * broadcast for provably-small sides, zero driver-side collects.
  * The declared queries in [[graft.operators.PipelineQueries]] are thin
  * bindings of these onto the testdata tables.
  */
object GraftOps {


  /** Per-label centroid distance with an AUTOMATIC dispatch (VERDICT r16
    * "what's wrong" #3): at or below `maxCase` labels the centroids fold
    * into a driver CASE chain of typed literals — zero joins, whole-stage
    * codegen, the right plan for the handful of labels a release actually
    * has; PAST the bound the same centroids dispatch through a broadcast
    * LEFT join instead of throwing — the scale-safe plan the engine
    * already knows how to build, chosen automatically. Both paths produce
    * byte-identical rows (spec-pinned). `cents` must be (label: Long,
    * c: array<double>); rows whose label has no centroid get a NULL dist
    * on both paths. */
  def withCentroidDist(df: DataFrame, cents: DataFrame, vec: Column,
      label: Column, maxCase: Int = 4096): DataFrame = {
    // ONE capped fetch both sizes the label space and delivers the
    // centroids (a separate count() would run the full centroid
    // aggregation twice — it is the dominant cost of the caller's build)
    val rows = cents.limit(maxCase + 1).collect()
    if (rows.length <= maxCase) {
      val folded = rows.map(r => (r.getLong(0), r.getSeq[Double](1)))
        .sortBy(_._1)
        .foldLeft(lit(null).cast("double")) { case (acc, (l, cv)) =>
          when(label === l, l2_dist(vec, typedlit(cv))).otherwise(acc)
        }
      df.withColumn("dist", folded)
    } else
      df.join(broadcast(cents.select(col("label").as("__dl"),
          col("c").as("__dc"))),
          label === col("__dl"), "left")
        .withColumn("dist", l2_dist(vec, col("__dc")))
        .drop("__dl", "__dc")
  }

  /** Driver-side broadcast guard (VERDICT r14 #5): every `.collect()` in
    * this engine is a bounded broadcast by DESIGN — this makes the bound
    * auditable and LOUD. The fetch itself is capped at `maxRows + 1`
    * (limit pushes into the plan), so even the failure path cannot pull a
    * corpus onto the driver; crossing the documented bound throws with the
    * site's name instead of OOMing 10 minutes later. SCALE.md §"driver
    * broadcast budget" lists each site, its size formula, and the corpus
    * parameter that could break it. */
  def boundedCollect(df: DataFrame, maxRows: Int, what: String)
      : Array[org.apache.spark.sql.Row] = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$what: driver-side broadcast exceeds its documented bound of " +
        s"$maxRows rows — the corpus parameter behind this table grew past " +
        "the design assumption; shard or aggregate it instead")
    rows
  }

  /** Document-frequency cap policy for [[jaccardNearDups]]' candidate index.
    * A shingle shared by d documents fans out to d·(d-1)/2 candidate pairs in
    * the inverted-index self-join, so ONE boilerplate shingle (navigation
    * chrome, license header) can turn a linear corpus into a quadratic plan.
    * The cap bounds that fanout in the CANDIDATE stage only — verification
    * always recomputes exact Jaccard from the full shingle sets. */
  sealed trait DfCapPolicy
  object DfCapPolicy {
    /** Default: cap = max(64, ceil(8·sqrt(ndocs))), derived IN-PLAN from a
      * broadcast one-row count — no driver action. Any single shingle's
      * self-join fanout is then ≤ cap² = 64·ndocs rows, i.e. linear in the
      * corpus, which is the invariant that survives a 100 TB scan. */
    case object Auto extends DfCapPolicy
    /** Explicit opt-out: uncapped single-pass exact join-count formulation.
      * Only safe on corpora known to share no high-df boilerplate. */
    case object Exact extends DfCapPolicy
    /** Operator-chosen absolute cap (e.g. from profiled df statistics). */
    final case class Fixed(cap: Long) extends DfCapPolicy
  }

  /** Eagerly materialize a small intermediate that feeds multiple plan
    * branches (self-joins recompute their subtree per side otherwise — the
    * simhash pipeline ran 5x slower without this). Same pattern MLlib's LSH
    * models use; tables here are signature-sized (rows ≈ corpus, not tokens).
    */
  private def materialize(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** Spread a narrow scan across the cluster before CPU-heavy per-row work.
    * A small parquet file arrives as one input split, which would run the
    * whole shingling/transform stage single-threaded (measured 2.5 s of a
    * 3.8 s near-dup run at sf0.1). If the input already has at least
    * defaultParallelism splits — always true for a 100 TB table — this is a
    * NO-OP, so the extra exchange exists exactly when it pays for itself. */
  private def spreadSmall(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  // ---- text shingling ------------------------------------------------------

  /** Distinct k-gram word shingles: id, sh (array<string>), nsh. The input
    * is spread to cluster parallelism first (no-op at scale) — shingling is
    * the CPU-bound stage of every near-dup pipeline, so it runs as the
    * one-pass native `word_shingles` expression (codegen; ExpressionsSpec
    * pins its equivalence to the split/transform/array_distinct SQL chain). */
  def shingles(df: DataFrame, id: Column, text: Column, k: Int = 5): DataFrame =
    spreadSmall(df)
      .select(id.as("id"), word_shingles(text, k).as("sh"))
      .withColumn("nsh", size(col("sh")).cast("long"))

  // ---- deduplication -------------------------------------------------------

  /** Exact dedup by content hash: one keeper (min id) per distinct text.
    * Scale: a single hash-partitioned aggregation over md5(text). */
  def exactDedup(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text).as("h"))
      .agg(min(id).as("keeper"), count(lit(1)).as("n"))
      .select(col("keeper"), col("n"), col("h"))

  /** Small-file compaction: coalesce a fragmented table's scan down to
    * ceil(totalBytes / targetBytes) output partitions. The 100 TB operational
    * problem this solves: streaming sinks and fine-grained ingest leave
    * thousands of KB-scale files per partition, and every downstream scan
    * pays per-file open/footer cost. `coalesce` is the scale-correct move —
    * a NARROW dependency that merges co-located splits without shuffling a
    * byte (a `repartition` compaction would re-exchange the whole table).
    * Sizing reads only file-status metadata, never data — and reuses the
    * statuses the relation's `FileIndex` already fetched when the DataFrame
    * was planned, so a millions-of-files table costs ZERO extra driver RPCs
    * (the earlier per-file `getFileStatus` loop was minutes of sequential
    * driver wall clock at that scale). Non-file relations fall back to
    * parallel stats over `inputFiles`. */
  def compact(df: DataFrame, targetBytes: Long = 128L << 20): DataFrame = {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val indexedBytes = df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.sizeInBytes // cached statuses from the planning listing
        case r => r.sizeInBytes
      }
    }
    val totalBytes =
      if (indexedBytes.nonEmpty) indexedBytes.sum
      else {
        val hconf = df.sparkSession.sessionState.newHadoopConf()
        java.util.Arrays.stream(df.inputFiles).parallel().mapToLong { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(hconf).getFileStatus(p).getLen
        }.sum()
      }
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    df.coalesce(n)
  }

  /** Incremental near-dup gate: screen a FRESH ingest batch against the
    * HISTORY corpus at exact shingle-Jaccard ≥ threshold — the near-dup twin
    * of the exact-hash incremental dedup (X18). Returns one row per fresh
    * doc: `(doc_id, n_matches, verdict)` with verdict `drop` when any
    * history doc matches.
    *
    * Scale stance (the nightly-ingest shape): the fresh batch is small
    * relative to history, so its exploded shingle index BROADCASTS and
    * history streams past it map-side — history is never shuffled and never
    * self-joined (the x13 decontamination pattern). Only matched candidate
    * rows reach the pair-count exchange. Exactness: candidates need one
    * shared shingle, and `common` counts distinct shared shingles, so every
    * Jaccard is exact — no sketch recall loss. For a fresh batch too large
    * to broadcast, drop the hint and the same plan degrades to a shuffle
    * join on `sg`; boilerplate-shingle skew is capped the same way as
    * [[jaccardNearDups]]'s `maxDf`. */
  def incrementalNearDups(fresh: DataFrame, hist: DataFrame,
      id: Column, text: Column, k: Int = 5,
      threshold: Double = 0.5): DataFrame = {
    val shF = materialize(shingles(fresh, id, text, k))
    val exF = shF.select(col("id").as("fid"), col("nsh").as("nf"),
      explode(col("sh")).as("sg"))
    val exH = shingles(hist, id, text, k)
      .select(col("id").as("hid"), col("nsh").as("nh"), explode(col("sh")).as("sg"))
    val matches = exH.join(broadcast(exF), Seq("sg"))
      .groupBy(col("fid"), col("hid"), col("nf"), col("nh"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common").cast("double")
        / (col("nf") + col("nh") - col("common")) >= threshold)
      .groupBy(col("fid")).agg(count(lit(1)).as("n_matches"))
    shF.select(col("id").as("doc_id"))
      .join(matches, col("doc_id") === col("fid"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        when(coalesce(col("n_matches"), lit(0L)) > 0, "drop")
          .otherwise("keep").as("verdict"))
  }

  /** Exact shingle-Jaccard near-dup pairs ≥ threshold via an inverted-index
    * join: explode shingles, join on shingle, count common per pair. Exact
    * answers without an all-pairs cross product.
    *
    * `maxDf` is the boilerplate guard for skewed corpora: shingles with
    * document frequency above the cap (navigation chrome, license
    * headers — the shingles that explode the self-join fanout quadratically)
    * are dropped from the CANDIDATE index only. Verification then recomputes
    * the EXACT Jaccard from the full shingle sets, so every reported `j` is
    * still exact — the cap can only lose pairs whose entire overlap is capped
    * boilerplate (which near-dup removal wants to ignore anyway). The
    * DEFAULT is [[DfCapPolicy.Auto]] — a corpus-derived cap (8·sqrt(ndocs))
    * computed in-plan, so the one-boilerplate-line-makes-d²-rows failure
    * mode cannot happen by default; [[DfCapPolicy.Exact]] is the explicit
    * opt-out for corpora known to be chrome-free. */
  def jaccardNearDups(df: DataFrame, id: Column, text: Column,
      k: Int = 5, threshold: Double = 0.5,
      maxDf: DfCapPolicy = DfCapPolicy.Auto): DataFrame = {
    val sh = shingles(df, id, text, k)
    // Exact document-frequency pruning: a shingle held by a single document
    // contributes no pair, so df>=2 filtering shrinks the self-join input
    // without changing any intersection count (na/nb stay the full sizes).
    // The df comes from a count-over-shingle WINDOW on the exploded index —
    // the same by-shingle shuffle the self-join needs anyway, replacing the
    // earlier aggregate + join-back round trip (measured 3.0→2.3 s at sf0.1;
    // a hot shingle skews this window exactly as it would the join, which is
    // what the cap bounds).
    val withDf = sh.select(col("id"), col("nsh"), explode(col("sh")).as("sg"))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sg"))))
    maxDf match {
      case DfCapPolicy.Exact =>
        val ex = materialize(withDf.filter(col("df") >= 2).drop("df"))
        ex.as("a").join(ex.as("b"),
            col("a.sg") === col("b.sg") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
            col("a.nsh").as("na"), col("b.nsh").as("nb"))
          .agg(count(lit(1)).as("common"))
          .withColumn("j",
            col("common").cast("double") / (col("na") + col("nb") - col("common")))
          .filter(col("j") >= threshold)
          .select(col("doc_a"), col("doc_b"), col("j"))
      case policy =>
        // capped index generates candidates; exact verify on the full sets
        // (counting common over a pruned index would UNDERcount j — the cap
        // must never change a reported similarity, only candidate recall)
        val capped = policy match {
          case DfCapPolicy.Fixed(cap) =>
            withDf.filter(col("df") >= 2 && col("df") <= cap)
          case _ =>
            // Auto: join the 1-row corpus count (broadcast — the blessed
            // constant-size cross) and cap at max(64, ceil(8·sqrt(ndocs)));
            // any surviving shingle fans out ≤ 64·ndocs candidate rows
            val nd = sh.agg(
              greatest(lit(64L), ceil(lit(8.0) * sqrt(count(lit(1)))))
                .cast("long").as("autocap"))
            withDf.join(broadcast(nd))
              .filter(col("df") >= 2 && col("df") <= col("autocap"))
        }
        val ex = materialize(capped.select(col("id"), col("sg")))
        val shm = materialize(sh)
        val cand = ex.as("a").join(ex.as("b"),
            col("a.sg") === col("b.sg") && col("a.id") < col("b.id"))
          .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
          .distinct()
        cand
          .join(shm.as("sa"), col("doc_a") === col("sa.id"))
          .join(shm.as("sb"), col("doc_b") === col("sb.id"))
          .withColumn("common",
            size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("long"))
          .withColumn("j",
            col("common").cast("double") / (col("sa.nsh") + col("sb.nsh") - col("common")))
          .filter(col("j") >= threshold)
          .select(col("doc_a"), col("doc_b"), col("j"))
    }
  }

  /** MinHash + LSH banding near-dup candidates, verified with exact Jaccard
    * (resemblance sketching per Broder, "On the resemblance and containment
    * of documents", 1997; banding per Leskovec/Rajaraman/Ullman, Mining of
    * Massive Datasets ch. 3).
    * numHashes = bands * rowsPerBand. Scale: candidates come from a bucket
    * equi-join on (band, bandHash) — the standard shuffle-friendly LSH plan;
    * AQE handles skewed buckets. */
  def minhashNearDups(df: DataFrame, id: Column, text: Column, k: Int = 5,
      threshold: Double = 0.5, bands: Int = 16, rowsPerBand: Int = 4,
      seed: Long = 42L): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sh = materialize(shingles(df, id, text, k))
    val sig = sh.withColumn("sig", minhash_sig(col("sh"), numHashes, seed))
    val banded = materialize(sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .toDF("id", "band", "bh"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    cand
      .join(sh.as("sa"), col("doc_a") === col("sa.id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.id"))
      .withColumn("common",
        size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("long"))
      .withColumn("j",
        col("common").cast("double") / (col("sa.nsh") + col("sb.nsh") - col("common")))
      .filter(col("j") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("j"))
  }

  /** SimHash near-dup pairs: candidates from 16-bit band collisions of the
    * 64-bit simhash, verified by Hamming distance ≤ maxHamming. */
  def simhashNearDups(df: DataFrame, id: Column, text: Column, k: Int = 5,
      maxHamming: Int = 12): DataFrame = {
    val docs = materialize(shingles(df, id, text, k)
      .select(col("id"), simhash64(col("sh")).as("sh64")))
    def bkey(i: Int) =
      shiftrightunsigned(col("sh64"), i * 16).bitwiseAND(lit(0xFFFFL))
    val bands = docs.select(col("id"), col("sh64"),
        explode(array((0 to 3).map(i =>
          struct(lit(i).as("band"), bkey(i).as("bkey"))): _*)).as("bs"))
      .select(col("id"), col("sh64"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        bit_count(col("a.sh64").bitwiseXOR(col("b.sh64"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Collision-free id offset for planted payload variants: one past the
    * corpus max id, so `id + offset` can never alias a real id at any
    * scale. One metadata-cheap agg (parquet max statistics). */
  def imageVariantOffset(df: DataFrame, id: Column): Long = {
    // max over zero rows is NULL — an empty/filtered corpus plants no
    // variants, so any positive offset is fine; never NPE opaquely
    val row = df.agg(max(id)).head()
    if (row.isNullAt(0)) 1L else row.getLong(0) + 1L
  }

  /** Perceptual near-duplicate IMAGE pairs via average-hash + Hamming
    * banding — the multimodal twin of [[simhashNearDups]] (X05's near-dup
    * axis). Each payload maps to a 64-bit aHash; the hash splits into four
    * 16-bit bands, candidates come from a band equi-join, and the reported
    * `hamming` is the exact distance on the full hashes. The pigeonhole
    * guarantee is structural: pairs within `maxHamming` ≤ 3 differ in at
    * most 3 of 64 bits, so at least one of the 4 bands matches exactly —
    * banding NEVER loses a qualifying pair (ImageHashSpec proves it against
    * brute force). Scale: one band-key shuffle, never image×image. */
  def imageNearDups(df: DataFrame, id: Column, image: Column,
      maxHamming: Int = 3): DataFrame = {
    val imgs = materialize(spreadSmall(df)
      .select(id.as("id"), avg_hash64(image).as("h64")))
    def bkey(i: Int) =
      shiftrightunsigned(col("h64"), i * 16).bitwiseAND(lit(0xFFFFL))
    val bands = imgs.select(col("id"), col("h64"),
        explode(array((0 to 3).map(i =>
          struct(lit(i).as("band"), bkey(i).as("bkey"))): _*)).as("bs"))
      .select(col("id"), col("h64"),
        col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("img_a"), col("b.id").as("img_b"),
        bit_count(col("a.h64").bitwiseXOR(col("b.h64"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Per-group MinHash lane minima: for each group (e.g. a corpus source),
    * the element-wise minimum of `lanes` independent portable hashes over
    * the group's k-word shingles. The constant-state alternative to an
    * exact shingle inverted index (x19's shape) for BETWEEN-group
    * similarity: min is idempotent and mergeable, so (a) duplicate shingles
    * need no `distinct` — no shingle shuffle ever happens — and (b)
    * map-side partial aggregation collapses every partition to at most
    * |groups|×`lanes` rows before the one (group, lane) exchange, making
    * shuffle volume INDEPENDENT of corpus size. P(min_a = min_b) = J(A,B),
    * so lane-match fractions between two groups estimate their shingle
    * Jaccard with stderr sqrt(J(1-J)/lanes). One md5 per shingle (the
    * portable hex→int idiom, x52/x54), then Broder's affine lane family
    * h_l = ((2l+1)·b0 + b1) mod 2^48 — every intermediate ≤ 2^55, so the
    * arithmetic is overflow-free and bit-exact on both engines (BIGINT
    * multiply overflow RAISES in DuckDB but silently wraps in Spark —
    * staying provably under 2^63 is load-bearing, not cosmetic). The
    * lane fold runs inside [[graft.functions.MinLanesAgg]] — one
    * aggregate row per SHINGLE, not per shingle×lane (measured 64×
    * input-volume cut vs the posexplode formulation), then the signature
    * array unpacks to (lane, mh) rows after the group collapse. */
  def minhashLaneMins(df: DataFrame, group: Column, text: Column,
      k: Int = 3, lanes: Int = 64): DataFrame =
    df.select(group.as("grp"), explode(word_shingles(text, k)).as("g"))
      .select(col("grp"), md5(col("g")).as("hx"))
      .select(col("grp"),
        conv(substring(col("hx"), 1, 12), 16, 10).cast("long").as("b0"),
        conv(substring(col("hx"), 13, 12), 16, 10).cast("long").as("b1"))
      .groupBy(col("grp"))
      .agg(min_lanes(col("b0"), col("b1"), lanes).as("mhs"))
      .select(col("grp"), posexplode(col("mhs")))
      .toDF("grp", "lane", "mh")

  // ---- similarity search ---------------------------------------------------

  /** Brute-force cosine top-k: broadcast the (small) query side against the
    * full corpus, fused codegen cosine kernel, per-query top-k window. */
  def annTopK(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, qId: Column, qVec: Column, k: Int): DataFrame = {
    val c = corpus.select(id.as("n_id"), vec.as("n_vec"))
    val q = queries.select(qId.as("q_id"), qVec.as("q_vec"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), cosine_sim(col("q_vec"), col("n_vec")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN (sign random projection): candidate set restricted to
    * the query's bucket — the plan that survives corpora too large to
    * cross-join. `probes` > 0 turns on multi-probe: each query ALSO searches
    * the `probes` Hamming-1 neighbor buckets (one plane's sign flipped),
    * trading `probes`× candidate volume for recall without touching the
    * corpus-side index — the standard knob when raising `planes` for
    * precision costs too much recall. A corpus vector lives in exactly one
    * bucket, so probe buckets never produce duplicate (query, neighbor)
    * candidates. */
  def annTopKLsh(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, qId: Column, qVec: Column, k: Int,
      planes: Int = 4, seed: Long = 42L, probes: Int = 0): DataFrame = {
    val c = corpus.select(id.as("n_id"), vec.as("n_vec"),
      rp_bucket(vec, planes, seed).as("bucket"))
    val b0 = rp_bucket(qVec, planes, seed)
    val probeBuckets = b0 +: (0 until math.min(probes, planes))
      .map(i => b0.bitwiseXOR(lit(1 << i)))
    val q = queries.select(qId.as("q_id"), qVec.as("q_vec"),
      explode(array(probeBuckets: _*)).as("bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), cosine_sim(col("q_vec"), col("n_vec")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF-style ANN: build per-cluster centroids with the CentroidAgg UDAF,
    * assign each query to its nearest centroid (nprobe=1), then search only
    * that cluster — the index-backed scale path where neither side fits a
    * broadcast. `cluster` is the coarse-quantizer assignment (here any
    * partitioning column; a production index would k-means it). */
  def annTopKIvf(corpus: DataFrame, id: Column, vec: Column, cluster: Column,
      queries: DataFrame, qId: Column, qVec: Column, k: Int, dim: Int): DataFrame = {
    val centroid = udaf(new graft.functions.CentroidAgg(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    val cents = corpus.groupBy(cluster.as("cl")).agg(centroid(vec).as("centroid"))
    val wa = Window.partitionBy(col("q_id")).orderBy(col("cscore").desc, col("cl"))
    val assigned = queries.select(qId.as("q_id"), qVec.as("q_vec"))
      .crossJoin(broadcast(cents))
      .withColumn("cscore", cosine_sim(col("q_vec"), col("centroid")))
      .withColumn("crank", row_number().over(wa))
      .filter(col("crank") === 1)
      .select(col("q_id"), col("q_vec"), col("cl"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    corpus.select(id.as("n_id"), vec.as("n_vec"), cluster.as("cl"))
      .join(broadcast(assigned), Seq("cl"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), cosine_sim(col("q_vec"), col("n_vec")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Embedding near-dup pairs with cosine ≥ threshold: candidates from
    * sign-random-projection bucket collisions across `tables` independently
    * seeded hash tables (union), verified with the exact codegen cosine
    * kernel. The candidate step is a bucket equi-join on (table, bucket) —
    * never an all-pairs cross product — so the plan shuffles by bucket and
    * scales horizontally. Multi-table collisions are scored up to `tables`
    * times (cheap map-side codegen) and deduped AFTER the threshold
    * filter, so the distinct's shuffle carries matches, not candidates.
    *
    * Recall tuning: one table collides with probability
    * `(1 − θ/π)^planes` (θ = angle at the threshold). At real near-dup
    * thresholds (≥ 0.9 ⇒ p ≈ 0.86) a handful of tables with planes 8–16
    * gives high recall over tiny candidate sets. A LOW threshold sits deep
    * in the corpus cosine distribution's tail where exact recall forces the
    * candidate set toward all-pairs regardless of algorithm — lower `planes`
    * / raise `tables` there and the union stays exhaustive on the measured
    * tail (the declared x03 query documents its measured-full-recall
    * config). The plan SHAPE is the scale contract; the knobs trade recall
    * against candidate volume without changing it.
    *
    * Occupancy-targeted plane scaling (`targetBucket > 0`): a FIXED plane
    * count is quadratic in disguise — per-bucket pair generation is
    * |bucket|², so 10× the corpus at the same bucket count is 100× the
    * candidate work funneled through the same (table, bucket) join keys
    * (measured: the sf1 sweep's one wedged single-thread stage). With
    * planes = max(planes, ⌈log2(n / targetBucket)⌉) the expected occupancy
    * stays ≈ targetBucket, so candidates ∝ buckets ∝ n (LINEAR) and the
    * join key space grows with the corpus — the 100 TB contract. The
    * corpus count reads off the already-materialized signature table (no
    * extra pass). Recall at a fixed threshold decays as planes grow — raise
    * `tables` to compensate (p_table = (1−θ/π)^planes, miss = (1−p)^T);
    * small corpora never pass the max(), so driver-oracle configs are
    * untouched. */
  def cosineNearDups(df: DataFrame, id: Column, vec: Column,
      threshold: Double, planes: Int = 8, tables: Int = 4,
      seed: Long = 42L, targetBucket: Long = 0L): DataFrame = {
    val v = materialize(df.select(id.as("id"), vec.as("vec")))
    val effPlanes =
      if (targetBucket <= 0L) planes
      else {
        val n = v.count() // cached by materialize — metadata-cheap
        math.max(planes, math.ceil(
          math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt)
      }
    val tabSeeds = graft.functions.Hashing.permSeeds(seed, tables)
    // Vectors travel WITH their bucket rows, so each candidate pair is
    // scored INLINE in the bucket join's projection and never crosses an
    // exchange: the only shuffles are the (tab, bucket) hash partition of
    // n·tables vector-bearing rows (linear in the corpus) and the final
    // distinct over MATCHES (tiny — the filter runs before it). The r8
    // formulation joined a bare (a_id, b_id) candidate table back to the
    // vector table twice; that verification join auto-broadcast the
    // vectors at small scale but silently flipped to a shuffle join once
    // the vector table outgrew the 10 MB broadcast threshold — shuffling
    // the FULL candidate set (∝ n·targetBucket·tables rows) twice, a
    // memory-pressure cliff measured at 288 s on 60k vectors (sf3).
    // Candidates keep their multi-table duplicates through scoring; the
    // deterministic score lets the late distinct collapse them exactly.
    val bucketed = v.select(col("id"), col("vec"),
        posexplode(array(tabSeeds.toIndexedSeq.map(s =>
          rp_bucket(col("vec"), effPlanes, s)): _*)))
      .toDF("id", "vec", "tab", "bucket")
    // SHUFFLE_HASH: sorting vector-bearing rows buys nothing here (the
    // per-bucket pair loop re-iterates the build group either way), and
    // skipping the two SMJ sorts took sf1 from 18.9 s to 1.95 s and sf3
    // from 16 s to 11.9 s — the sort of wide array rows, not the cosine
    // work, dominated the merge-join form
    bucketed.as("a").join(bucketed.as("b").hint("SHUFFLE_HASH"),
        col("a.tab") === col("b.tab") && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        cosine_sim(col("a.vec"), col("b.vec")).as("score"))
      .filter(col("score") >= threshold)
      .distinct()
  }

  /** Connected components over a near-dup pair graph: every document gets the
    * MINIMUM doc id of its component as `cluster` — the step that turns
    * pairwise near-dup hits into "keep one representative per duplicate
    * cluster" (transitive closure: a~b, b~c ⇒ {a,b,c} is one cluster even if
    * a and c were never compared).
    *
    * Algorithm: iterative min-label propagation — each round every node takes
    * the minimum label among itself and its neighbors; converges in
    * O(component diameter) rounds. Each round is one shuffle-join + partial
    * agg; the driver only coordinates the loop and reads a scalar
    * convergence count (no data collects). Near-dup components are
    * short-diameter by construction (duplicates of a common source), so
    * rounds stay in the single digits; a web-scale general graph would swap
    * in the large-star/small-star formulation (Kiveris et al., "Connected
    * Components in MapReduce"), which this API deliberately matches. */
  def dedupClusters(pairs: DataFrame, a: Column, b: Column,
      maxIter: Int = 50): DataFrame = {
    val s = pairs.sparkSession
    // materialize the pair graph FIRST, under the caller's session conf: the
    // lazy `pairs` plan is usually corpus-scale (e.g. the inverted-index
    // shingle self-join) and must keep its full shuffle parallelism
    val edgesRaw = materialize(
      pairs.select(a.as("src"), b.as("dst"))
        .union(pairs.select(b.as("src"), a.as("dst")))
        .distinct())
    // right-size the PER-ROUND exchanges with explicit repartitioning, never
    // the session conf (a session-global knob leaks into any concurrently
    // running query): the persisted pair graph is orders of magnitude smaller
    // than the corpus that produced it, so size partitions from the actual
    // edge count (~1M edges each), floored for latency, capped at 4x cores.
    val n = math.max(8, math.min(s.sparkContext.defaultParallelism * 4,
      (edgesRaw.count() / 1000000L + 1).toInt))
    // pre-partition the static join side ONCE by dst: every round's
    // neighbor join is then exchange-free on the edge side, and keeping all
    // per-round tables HashPartitioning(key, n) makes the label joins
    // co-partitioned (zero extra shuffles inside the loop).
    val edges = materialize(edgesRaw.repartition(n, col("dst")))
    edgesRaw.unpersist()
    var labels = materialize(
      edges.select(col("src").as("id")).distinct().withColumn("lbl", col("id"))
        .repartition(n, col("id")))
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "nid"), col("dst") === col("nid"))
        .repartition(n, col("src"))
        .groupBy(col("src").as("id")).agg(min(col("lbl")).as("nlbl"))
      // carry the did-anything-change flag IN the label table: the
      // convergence check IS the materializing action (one job per round —
      // the filter-count populates every cached partition on the way)
      // localCheckpoint (lazy) both persists the round result AND truncates
      // its lineage — each round's plan references the previous one several
      // times, so without truncation the logical plan grows exponentially
      // with round count (OOMs in plan stringification long before the data
      // is big). The convergence count below is the materializing action.
      val next = labels
        .join(viaNeighbors.withColumnRenamed("id", "jid"),
          col("id") === col("jid"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("newLbl"),
          (coalesce(col("nlbl"), col("lbl")) < col("lbl")).as("chg"))
        .select(col("id"), col("newLbl").as("lbl"), col("chg"))
        .localCheckpoint(false)
      val changed = next.filter(col("chg")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"dedupClusters did not converge in $maxIter rounds (component diameter " +
        s"exceeds the bound — raise maxIter or use dedupClustersStar)")
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster"))
  }

  /** Star-contraction connected components (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) — the high-diameter
    * fallback [[dedupClusters]] documents. Alternating large-star/small-star
    * edge rewrites converge in O(log n) rounds regardless of component
    * diameter (min-label propagation needs O(diameter) rounds — ~n on a path
    * graph), at the cost of a slightly heavier round (two rewrites, each one
    * shuffle). Same contract as [[dedupClusters]]: every node appearing in
    * `pairs` is labeled with the MINIMUM id of its connected component.
    *
    * Use min-label for near-dup graphs (short diameter by construction);
    * star-contraction for arbitrary graphs — equivalence is property-tested
    * on random graphs in StarContractionSpec. */
  def dedupClustersStar(pairs: DataFrame, a: Column, b: Column,
      maxIter: Int = 50): DataFrame =
    starContraction(pairs, a, b, maxIter)._1

  /** Implementation of [[dedupClustersStar]], returning (labels, rounds) so
    * the O(log n) convergence bound is assertable in specs. Edges are kept
    * canonical (hi > lo); the fixed point is a star forest rooted at each
    * component minimum. */
  private[graft] def starContraction(pairs: DataFrame, a: Column, b: Column,
      maxIter: Int): (DataFrame, Int) = {
    val s = pairs.sparkSession
    val edges0 = materialize(
      pairs.select(greatest(a, b).as("hi"), least(a, b).as("lo"))
        .filter(col("hi") =!= col("lo")).distinct())
    // explicit per-round exchange sizing from the edge count, same policy as
    // dedupClusters (never the session conf)
    val n = math.max(8, math.min(s.sparkContext.defaultParallelism * 4,
      (edges0.count() / 1000000L + 1).toInt))

    // large-star (paper §3): every node u re-points each strictly-LARGER
    // neighbor v at m = min(N(u) ∪ {u}). Each canonical edge is processed at
    // its lo end, so the whole rewrite is one groupBy(u) + join.
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
        .repartition(n, col("u"))
      val m = nbrs.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      nbrs.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo")) // v > u >= m: canonical
        // NOTE (r18 A/B): dropping this intermediate repartition+distinct is
        // provably set-identical at the round boundary (smallStar's window
        // min is duplicate-insensitive and smallStar ends in its own
        // distinct; StarContractionSpec stayed green) but measured FLAT —
        // x07_star 5.34 -> 5.49 s standalone min-of-3: the loop is per-round
        // job-latency-bound at this scale, not exchange-bound. Kept, since
        // the dedup also bounds the multiset blowup between rewrites at
        // 100 TB edge counts.
        .repartition(n, col("hi"), col("lo")).distinct()
    }

    // small-star (paper §3): every node u re-points its smaller-or-equal
    // neighbors (the lo ends of canonical edges grouped by hi) plus itself at
    // the group minimum. Group-min via window, so each member row emits.
    def smallStar(e: DataFrame): DataFrame = {
      val withMin = e.repartition(n, col("hi"))
        .withColumn("m", min(col("lo")).over(Window.partitionBy(col("hi"))))
      withMin.select(col("lo").as("hi"), col("m").as("lo")) // lo_i >= m
        .unionAll(withMin.select(col("hi"), col("m").as("lo")))
        .filter(col("hi") =!= col("lo"))
        .repartition(n, col("hi"), col("lo")).distinct()
    }

    // convergence = edge-set fixed point, detected by an order-independent
    // (count, sum-of-hashes) signature — one scalar agg per round instead of
    // two anti-joins.
    def signature(e: DataFrame): (Long, String) = {
      // hash-sum as decimal(38,0): a long sum overflows under ANSI mode
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("hi"), col("lo")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1).toString)
    }

    var e = edges0
    var sig = signature(e)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      // lazy localCheckpoint: persists AND truncates lineage (the rewrites
      // reference `e` several times — an un-truncated loop plan grows
      // exponentially with rounds); signature() materializes it.
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nsig = signature(next)
      e.unpersist()
      e = next
      converged = nsig == sig
      sig = nsig
      rounds += 1
    }
    if (!converged) throw new IllegalStateException(
      s"starContraction did not converge in $maxIter rounds")
    // fixed point is a star forest: every non-root points at its component
    // min; roots label themselves.
    val labels = e.select(col("hi").as("doc_id"), col("lo").as("cluster"))
      .unionAll(e.select(col("lo").as("doc_id"), col("lo").as("cluster")))
      .distinct()
    (labels, rounds)
  }

  /** Greedy sequence packing: documents are packed, in id order, into bins
    * of at most `capacity` tokens — the context-window packing step before
    * tokenized training batches. Packing is inherently sequential (bin state
    * depends on every earlier doc), so parallelism comes from SHARDING:
    * shard = id / shardSize, each shard packs independently in one sorted
    * group scan (`flatMapSortedGroups` — Spark sorts/spills the group, the
    * fold keeps O(1) state). A doc that doesn't fit the open bin starts a
    * new one; an oversized doc (> capacity) occupies a bin alone. Output:
    * (doc_id, shard, bin, n_tokens) with bins numbered from 0 per shard. */
  def packSequences(df: DataFrame, id: Column, nTokens: Column,
      capacity: Long, shardSize: Long = 100L): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(id.cast("long").as("id"), nTokens.cast("long").as("n"))
      // exact integer FLOOR division (negative ids shard like DuckDB's `//`;
      // a double divide would truncate toward zero and lose precision > 2^53)
      .withColumn("shard",
        expr(s"(id - pmod(id, ${shardSize}L)) div ${shardSize}L"))
      .select(col("shard"), col("id"), col("n")).as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("id")) { (shard, rows) =>
        var bin = 0L; var acc = 0L; var first = true
        rows.map { case (_, docId, n) =>
          if (first) { acc = n; first = false }
          else if (acc + n <= capacity) acc += n
          else { bin += 1; acc = n }
          (docId, shard, bin, n)
        }
      }
      .toDF("doc_id", "shard", "bin", "n_tokens")
  }

  /** Benchmark decontamination: per-document count of k-gram shingles shared
    * with an evaluation set — the train/test-leak scan a training-data
    * pipeline runs before any model sees the corpus.
    *
    * Scale: the eval side (held-out benchmarks) is tiny relative to a 100 TB
    * corpus, so its distinct shingle set is BROADCAST and the corpus side
    * probes it partition-locally — corpus shingles are never shuffled; the
    * only exchange is the per-document hit count (hash-partitioned by id).
    * Output: (doc_id, nsh, n_hits, contam_frac, flagged) for every corpus
    * doc, zero-hit docs included. `contam_frac` is a single exact IEEE
    * division rounded through decimal(18,6) for cross-engine stability. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame,
      id: Column, text: Column, k: Int = 3,
      flagFrac: Double = 0.2): DataFrame = {
    val evalGrams = shingles(evalSet, id, text, k)
      .select(explode(col("sh")).as("g")).distinct()
      .withColumn("hit", lit(1L))
    // one shingle pass + one broadcast LEFT probe per gram: zero-hit docs
    // stay in the stream, so no second join back to the corpus is needed
    // (shingles() de-dups per doc, so sum(hit) = distinct hits)
    shingles(corpus, id, text, k)
      .select(col("id"), col("nsh"), explode(col("sh")).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy(col("id"), col("nsh"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("id").as("doc_id"), col("nsh"), col("n_hits"))
      .withColumn("contam_frac",
        (col("n_hits").cast("double") / col("nsh").cast("double"))
          .cast("decimal(18,6)").cast("double"))
      .withColumn("flagged", col("contam_frac") >= lit(flagFrac))
  }

  /** BM25(k1, b) top-k document ranking for a SMALL query-term table
    * `queries(q_id, word)`. Inverted-index shape: the corpus postings (tf)
    * join the BROADCAST query terms first, so the corpus is scanned once
    * for all queries and only matching postings reach any shuffle — the
    * 100 TB stance (never corpus × queries). Term scores are decimal so the
    * per-doc sum is merge-order-free; ranks tie-break by doc_id. Returns
    * (q_id, rank, doc_id, n_terms, sd[decimal score]). */
  def bm25TopK(docs: DataFrame, id: Column, text: Column, queries: DataFrame,
      topK: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val words = spreadSmall(docs)
      .select(id.as("doc_id"), explode(split(text, " ")).as("word"))
    val dl = words.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).cast("double").as("nd"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val term = tf.join(broadcast(queries), "word")
      .join(dl, "doc_id").join(dfreq, "word")
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("doc_id"),
        (log((col("nd") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl")))))
          .cast("decimal(18,6)").as("ts"))
    val perDoc = term.groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("ts")).as("sd"), count(lit(1)).as("n_terms"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sd").desc, col("doc_id"))
    perDoc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two per-query rank
    * lists on a shared id space: rrf = Σ 1/(c + rank) over the lists an id
    * appears in. The fusion is a full-outer join of two ALREADY-top-k lists
    * (tiny relative to the corpus), so its cost is negligible next to the
    * arms; exactly two addends keeps the double sum order-free. */
  def rrfFuse(a: DataFrame, b: DataFrame, c: Double = 60.0,
      topK: Int = 10): DataFrame = {
    val fused = a.join(b, Seq("q_id", "id"), "full_outer")
      .select(col("q_id"), col("id"),
        (coalesce(lit(1.0) / (lit(c) + col("ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rb")), lit(0.0))).as("rrf"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col("id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("id"), col("rrf"))
  }

  // ---- tokenizer induction -------------------------------------------------

  /** Distributed BPE (byte-pair-encoding) vocabulary induction — the
    * tokenizer-TRAINING half of the X04 text axis (x04_bpe_tokens is the
    * inference-side pre-tokenizer). Classic algorithm (Sennrich et al. 2016,
    * "Neural Machine Translation of Rare Words with Subword Units"):
    * represent each distinct word as a symbol sequence, repeatedly count
    * adjacent symbol pairs corpus-wide (weighted by word frequency) and
    * merge the most frequent pair into one symbol, `merges` times.
    *
    * Scale shape: the working set is the DISTINCT-WORD frequency table — the
    * same corpus→vocabulary reduction industrial tokenizer trainers perform
    * first, because 100 TB of raw text is only ~10^8 distinct words — built
    * with one map-side-combinable shuffle. Each merge iteration is one
    * weighted pair-count aggregation (partial aggregation + a 1-row top-k)
    * plus a NARROW per-row greedy left-to-right re-segmentation (an
    * `aggregate` higher-order fold — no shuffle, no UDF). Only the winning
    * pair (bytes, not rows) reaches the driver each iteration, and the
    * word table is re-cached per iteration so lineage stays flat.
    *
    * Ties break deterministically: (count desc, left asc, right asc).
    * Returns one row per learned merge: (rank, left, right, merged,
    * pair_freq), rank ascending — the merge table a tokenizer would ship.
    */
  def bpeVocab(docs: DataFrame, text: Column, merges: Int): DataFrame =
    bpeVocab(docs, text, merges, batch = 1)

  /** [[bpeVocab]] with frontier batching — the driver-pacing fix for real
    * vocabulary sizes (VERDICT r7 #6). `batch = 1` is the EXACT classic
    * algorithm (one driver round-trip + one corpus re-segmentation per
    * merge — fine for demo-sized merge counts, ~2·merges jobs). For a 50k
    * vocab that pacing is the bottleneck, so `batch = K` selects the top K
    * pairwise SYMBOL-DISJOINT pairs per round and applies them in ONE
    * re-segmentation: disjointness makes the selected merges commute (no
    * merge can create or destroy occurrences of another selected pair), so
    * every batched merge is individually a valid greedy step against the
    * counts it was ranked under. The approximation vs strict BPE: a pair
    * CREATED by merge i (e.g. ("th","e") after ("t","h")) cannot be chosen
    * until the next round, so ranks can reorder within a window of ~K —
    * the standard trade industrial trainers make (frontier batching).
    * Driver round-trips drop from `merges` to ~`merges / K`; candidate
    * fetch per round is ≤ 4K tiny (string, string, long) rows. */
  def bpeVocab(docs: DataFrame, text: Column, merges: Int, batch: Int): DataFrame = {
    val spark = docs.sparkSession
    require(batch >= 1, s"batch must be >= 1, got $batch")
    // distinct-word frequency table, words as single-char symbol arrays.
    // Round-17 optimization: LAZY persist instead of materialize() — each
    // round's candidate collect is the job that populates the current words
    // cache (one job per round instead of a count + a collect), and the
    // FINAL round's re-segmentation is never computed at all (it used to be
    // materialized and immediately unpersisted). The previous round's table
    // stays cached until the collect that reads the next one has run, so
    // nothing recomputes from scratch. x41: 4.29 -> measured below.
    var words = spreadSmall(docs)
      .select(explode(split(lower(text), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(split(col("word"), "(?!^)(?=.)").as("syms"), col("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var prevWords: DataFrame = null
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      val want = math.min(batch, merges - rank)
      // corpus-wide weighted adjacent-pair counts; deterministic tie-break.
      // Over-fetch 4× so the disjointness filter usually still fills the
      // batch; a short round just re-counts — progress is ≥ 1 merge/round.
      val cand = words
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("pair_freq"))
        .orderBy(col("pair_freq").desc, col("l"), col("r"))
        .limit(want * 4).collect()
      // this collect just materialized the current words cache — the
      // previous round's table has no remaining consumer
      if (prevWords != null) { prevWords.unpersist(); prevWords = null }
      if (cand.isEmpty) exhausted = true
      else {
        // greedy prefix of mutually symbol-disjoint pairs (merged symbols
        // count as used too, so a later pair can't reference one)
        val used = scala.collection.mutable.Set.empty[String]
        val sel = cand.iterator.flatMap { r0 =>
          val (a, b) = (r0.getString(0), r0.getString(1))
          if (used(a) || used(b) || used(a + b)) None
          else { used += a; used += b; used += (a + b); Some((a, b, r0.getLong(2))) }
        }.take(want).toVector
        sel.foreach { case (a, b, f) =>
          learned += ((rank, a, b, a + b, f)); rank += 1
        }
        // ONE greedy left-to-right re-segmentation applying every selected
        // merge — a narrow fold; non-overlapping by construction (the
        // merged symbol won't re-match `a` unless it literally equals it,
        // which IS the BPE semantics), and disjoint pairs can't interact.
        // Lazy persist: the NEXT round's candidate collect computes this off
        // the still-cached current table and caches it in the same job.
        val next = words.select(
          aggregate(col("syms"),
            array().cast("array<string>"),
            (acc, s) => {
              val grow = concat(acc, array(s))
              sel.foldLeft(when(lit(false), grow)) { case (w, (a, b, _)) =>
                w.when(
                  size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
                  concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              }.otherwise(grow)
            }).as("syms"),
          col("freq"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        prevWords = words
        words = next
      }
    }
    if (prevWords != null) prevWords.unpersist()
    words.unpersist()
    spark.createDataFrame(learned.toSeq)
      .toDF("rank", "left", "right", "merged", "pair_freq")
      .select(col("rank").cast("int"), col("left"), col("right"),
        col("merged"), col("pair_freq").cast("long"))
  }

  /** Apply a learned BPE merge table ([[bpeVocab]] output) to ENCODE a
    * corpus — the deployment half of tokenizer training: x41 learns the
    * merges, this ships them. Encoding applies each merge as one greedy
    * left-to-right pass in rank order — byte-identical to the
    * re-segmentation fold the trainer itself runs, so encoding the training
    * corpus reproduces the trainer's final symbol table exactly (BpeSpec
    * pins this against an independent reference encoder, plus the
    * concat-roundtrip identity).
    *
    * Scale shape: the merge table broadcasts (a 50k-merge vocabulary is
    * ~1 MB); encoding is one mapPartitions pass — ZERO shuffles, and a
    * per-partition word→tokens memo collapses work to the distinct words a
    * partition holds (the same corpus→vocab reduction the trainer exploits:
    * Zipf means a handful of encodes serve most tokens). mapPartitions is
    * the right primitive here, not a fold expression: encode is inherently
    * per-word sequential over ranks, and inlining |merges| nested HOF folds
    * into one Catalyst expression tree would defeat codegen long before
    * real vocabulary sizes. */
  def bpeEncode(docs: DataFrame, id: Column, text: Column,
      merges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // bounded broadcast: a merge table is a VOCABULARY (config-sized, 64k
    // is already far past any BPE in use); crossing it means someone fed a
    // corpus-sized frame where the trainer output belongs — fail loud
    val table: Array[(String, String)] = merges.orderBy(col("rank"))
      .select(col("left").cast("string"), col("right").cast("string"))
      .limit((1 << 16) + 1)
      .as[(String, String)].collect()
    require(table.length <= (1 << 16),
      "bpeEncode merge table exceeds 65536 entries — not a driver-side " +
        "broadcastable vocabulary")
    val bc = spark.sparkContext.broadcast(table)
    docs.select(id.cast("long").as("_id"), text.cast("string").as("_txt"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        def enc(word: String): Array[String] = memo.getOrElseUpdate(word, {
          var syms: Array[String] = word.map(_.toString).toArray
          var k = 0
          while (k < ms.length) {
            val (a, b) = ms(k)
            if (syms.length > 1) {
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (out.nonEmpty && out.last == a && syms(i) == b)
                  out(out.length - 1) = a + b
                else out += syms(i)
                i += 1
              }
              syms = out.toArray
            }
            k += 1
          }
          syms
        })
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (d, t) =>
          val words = t.toLowerCase(java.util.Locale.ROOT)
            .split(" ").filter(_.nonEmpty)
          val toks = words.flatMap(enc)
          md.reset()
          // \\u0001-separated so the hash witnesses token BOUNDARIES — a
          // bare concat would equal the input under ANY segmentation
          val hex = md.digest(toks.mkString("\u0001").getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
          (d, words.length.toLong, words.map(_.length.toLong).sum,
            toks.length.toLong, hex, toks)
        }
      }
      .toDF("doc_id", "n_words", "n_chars", "n_tokens", "tokens_md5", "tokens")
  }

  // ---- skew mitigation -----------------------------------------------------

  /** Salted inner equi-join for skewed keys: left rows scatter across
    * `salt` sub-keys via a deterministic hash of `leftSaltSource` (any
    * high-cardinality left column), the (small-ish) right side replicates
    * `salt` times — so one hot key becomes `salt` evenly-sized shuffle
    * partitions instead of one straggler. Use when AQE's skew splitting isn't
    * enough (e.g. a single key holding >executor-memory rows). */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, salt: Int,
      leftSaltSource: Column): DataFrame = {
    val l = left.withColumn("__salt", pmod(xxhash64(leftSaltSource), lit(salt)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)))).withColumn("__salt",
      col("__salt").cast("bigint"))
    l.join(r, leftKey === rightKey && l("__salt") === r("__salt"))
      .drop("__salt")
  }

  /** Point-in-interval join WITHOUT an equi key, as a bin-bucketed equi join.
    *
    * Spark plans a keyless `p.join(i, start <= point && point < end)` as a
    * BroadcastNestedLoopJoin (or a cartesian product when neither side fits
    * in memory) — O(|points| × |intervals|) comparisons, the classic range-
    * join scale killer. Binning converts it to a hash join: every interval is
    * exploded into the fixed-width bins it overlaps (`ceil(len/width)+1`
    * rows), every point maps to exactly ONE bin, and the join runs as an
    * equi join on the bin id with the range predicate as a residual filter.
    * Because a point lives in a single bin, each qualifying (point, interval)
    * pair matches exactly once — no post-join dedup. Shuffle volume is
    * O(|points| + |intervals| × fanout); pick `binWidth` near the median
    * interval length so fanout stays ~2. Both sides hash-partition on the
    * bin, so the plan scales horizontally and AQE can split hot bins.
    *
    * `point`/`start`/`end` are long-valued expressions over their side
    * (intervals are half-open `[start, end)`).
    */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
      point: Column, start: Column, end: Column, binWidth: Long): DataFrame = {
    val w = lit(binWidth)
    val binned = intervals.filter(end > start)
      .withColumn("__bin", explode(sequence(floor(start / w).cast("long"),
        floor((end - 1) / w).cast("long"))))
    points
      .withColumn("__bin", floor(point / w).cast("long"))
      .join(binned, Seq("__bin"))
      .filter(start <= point && point < end)
      .drop("__bin")
  }

  // ---- graph ----------------------------------------------------------------

  /** Damped PageRank over a directed edge list `(a → b)` — the generic
    * iterate-over-a-static-graph shape (label propagation / HITS / Katz share
    * it). Returns `(node, r)` after `iters` supersteps.
    *
    * Determinism contract (what lets an external engine replay it exactly):
    * per-edge messages r/deg are quantized decimal(28,12) BEFORE the
    * destination sum — exact, associative, merge-order-proof — and the
    * damping update runs in double on the exact sum. `jump` and `damping`
    * are both explicit literals so no engine ever computes `1 - damping` in
    * floating point.
    *
    * Scale shape: edges join their out-degree ONCE and the result is
    * materialized — no iteration ever moves an edge. Per-iteration cost is
    * one rank join + one map-side-combined groupBy:
    *   - `copartition = false` (default): the |nodes|-sized rank table
    *     BROADCASTS into the stationary edges; the only shuffle is the
    *     ~|nodes|×|partitions| combined message partials.
    *   - `copartition = true`: the trillion-edge variant, for when ranks
    *     outgrow a broadcast. Edges are hash-partitioned on `a` once before
    *     materializing; each iteration shuffles ONLY the rank table into
    *     that fixed layout (the edge side re-sorts locally, no exchange).
    * Both modes produce bit-identical results (PageRankSpec pins it). */
  def pageRank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85,
      jump: Double = 0.15, copartition: Boolean = false): DataFrame = {
    val outdeg = edges.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    val pre = edges.join(outdeg, "a").select(col("a"), col("b"), col("deg"))
    // broadcast mode lays the stationary edges out by DESTINATION: each
    // partition then holds every message for its nodes, so the per-iteration
    // partial aggregate collapses |edges| messages to ~|nodes| partials
    // BEFORE the groupBy shuffle (measured 4.0→3.0 s at sf0.1, and the
    // shuffled bytes per iteration drop from O(edges) to O(nodes)).
    // copartition mode keeps the source layout its merge join needs.
    val cedges = (if (copartition) pre.repartition(col("a"))
                  else pre.repartition(col("b")))
      .localCheckpoint(true)
    // nodes + degrees re-derive from the CHECKPOINTED edges (deg rides on
    // every edge row), so nN and r0 never re-run the upstream edge build
    val outdegC = cedges.select(col("a"), col("deg")).distinct()
    val nN = broadcast(outdegC.agg(count(lit(1)).cast("double").as("nn")))
    var r = outdegC.crossJoin(nN)
      .select(col("a").as("node"), (lit(1.0d) / col("nn")).as("r"))
    // NOTE (round-17 optimization pass): per-iteration localCheckpoint of `r`
    // was tried here to stop broadcast rebuilds re-executing earlier
    // supersteps, and MEASURED SLOWER at sf0.1 (x39 3.16 -> 3.96 s, x89
    // 1.79 -> 2.47 s standalone min-of-3): the superstep recompute is cheap
    // next to the persist + extra job boundaries at this state size, and in
    // copartition mode (the trillion-edge variant) there are no broadcast
    // rebuilds — the whole iteration tree executes ONCE in a single DAG, so
    // nothing is re-executed at scale either. Left as-is deliberately.
    for (_ <- 1 to iters) {
      val rside = if (copartition) r else broadcast(r)
      // merge hint in copartition mode: at trillion-edge scale neither side
      // fits a broadcast, and the hint keeps the test-scale plan honest —
      // SMJ over the fixed edge layout, only the rank side exchanges
      val eside = if (copartition) cedges.hint("merge") else cedges
      val msgs = eside.join(rside, col("node") === col("a"))
        .select(col("b").as("node"),
          (col("r") / col("deg")).cast("decimal(28,12)").as("m"))
      r = msgs.groupBy(col("node"))
        .agg(sum(col("m")).cast("double").as("sm"))
        .crossJoin(nN)
        .select(col("node"),
          (lit(jump) / col("nn") + lit(damping) * col("sm")).as("r"))
    }
    r
  }

  // ---- envelope views ------------------------------------------------------

  /** Typed Dataset view of an envelope DataFrame. */
  def typedEnvelope(envelope: DataFrame): org.apache.spark.sql.Dataset[StreamEnvelope] = {
    val enc = org.apache.spark.sql.Encoders.product[StreamEnvelope]
    envelope.as[StreamEnvelope](enc)
  }

  /** Strict reference-parity projection of a replay envelope: drop the
    * metadata columns and coerce null key/value to empty bytes, matching
    * /root/reference/src/lib.rs:7-12 (non-nullable 2-column schema) and
    * execution.rs:137-140 (unwrap_or(&[])). */
  def strictParityEnvelope(envelope: DataFrame): DataFrame =
    envelope.select(
      coalesce(col("key"), lit(Array.emptyByteArray)).as("key"),
      coalesce(col("value"), lit(Array.emptyByteArray)).as("value"))
}
