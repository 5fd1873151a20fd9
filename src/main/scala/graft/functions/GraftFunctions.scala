package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.shims

/** Column-level API over the custom Catalyst expressions — the graft
  * counterpart of `org.apache.spark.sql.functions`. */
object GraftFunctions {
  private def c(e: Expression): Column = shims.toColumn(e)
  private def x(col: Column): Expression = shims.toExpression(col)

  /** cosine similarity of two array<float> columns (codegen, double accum). */
  def cosine_sim(a: Column, b: Column): Column = c(CosineSimilarity(x(a), x(b)))

  /** Unicode canonical composition (NFC) of a string column (codegen). */
  def nfc_normalize(s: Column): Column = c(NfcNormalize(x(s)))

  /** NFD + combining-mark removal (café→cafe) of a string column (codegen). */
  def strip_accents(s: Column): Column = c(StripAccents(x(s)))

  /** Euclidean distance over two `array<double>` columns (codegen kernel). */
  def l2_dist(a: Column, b: Column): Column = c(L2Distance(x(a), x(b)))

  /** sign-random-projection LSH bucket id for an array<float> embedding. */
  def rp_bucket(v: Column, planes: Int = 16, seed: Long = 42L): Column =
    c(RandomProjectionBucket(x(v), planes, seed))

  /** k-long MinHash signature of an array<string> token/shingle set. */
  def minhash_sig(tokens: Column, k: Int = 64, seed: Long = 42L): Column =
    c(MinHashSignature(x(tokens), k, seed))

  /** 64-bit SimHash of an array<string> token multiset. */
  def simhash64(tokens: Column): Column = c(SimHash64(x(tokens)))

  /** winnowing rolling-hash document fingerprint of a string column. */
  def winnow_fp(text: Column, k: Int = 8, w: Int = 4): Column =
    c(WinnowFingerprint(x(text), k, w))

  /** heuristic language id (letter-frequency profiles) of a string column. */
  def lang_id(text: Column): Column = c(LanguageId(x(text)))

  /** one-pass distinct k-gram word shingles of a string column. */
  def word_shingles(text: Column, k: Int = 5): Column = c(WordShingles(x(text), k))

  /** UDTF: explode text into (pos, shingle) k-gram word shingle rows. */
  def pos_shingles(text: Column, k: Int = 5): Column = c(ShingleGenerator(x(text), k))

  /** exact top-k values per group, sorted descending (binary-state
    * TypedImperativeAggregate — O(k) state per group). */
  def topk_vals(v: Column, k: Int): Column =
    c(TopKAgg(x(v), k).toAggregateExpression())

  /** element-wise MinHash lane minima over Broder's affine family from the
    * per-shingle 48-bit md5 halves (b0, b1) — `lanes` longs of state per
    * group, no row blowup (see [[MinLanesAgg]]). */
  def min_lanes(b0: Column, b1: Column, lanes: Int): Column =
    c(MinLanesAgg(x(b0), x(b1), lanes).toAggregateExpression())

  /** decode a binary Avro record column into a struct (flat primitive
    * records; the envelope-payload decode path). */
  def avro_decode(value: Column, schemaJson: String): Column =
    c(AvroDecode(x(value), schemaJson))

  /** encode a struct column as a binary Avro record (producer half). */
  def avro_encode(record: Column, schemaJson: String): Column =
    c(AvroEncode(x(record), schemaJson))

  /** point-query a serialized Count-Min sketch for a long item's frequency. */
  def cms_estimate(sketch: Column, item: Column): Column =
    c(CmsEstimate(x(sketch), x(item)))

  /** mergeable Bloom-filter build over a string column (binary state). */
  def bloom_agg(item: Column, expectedItems: Long, fpp: Double): Column =
    c(BloomAgg(x(item), expectedItems, fpp).toAggregateExpression())

  /** probe a serialized Bloom filter for string membership (no false
    * negatives; false positives bounded by the build fpp). */
  def bloom_might_contain(bloom: Column, item: Column): Column =
    c(BloomMightContain(x(bloom), x(item)))

  /** visible-text extraction from an HTML page (raw-text excision, comment
    * drop, entity decode, block-tag line boundaries, whitespace collapse);
    * lines joined by \n. The crawled-corpus tag-strip step. */
  def html_text(html: Column): Column = c(HtmlText(x(html)))

  /** hrefs of a page's <a> elements in document order, entity-decoded
    * (crawl-frontier extraction; commented-out/raw-text links excluded). */
  def html_links(html: Column): Column = c(HtmlLinks(x(html)))

  /** deterministic URL canonicalization: lowercase scheme/host, default
    * ports and fragments dropped, utm_* params removed, surviving params
    * sorted — the crawl-dedup key. */
  def url_canon(url: Column): Column = c(UrlCanon(x(url)))

  /** robots.txt fetchability decision for a fixed crawler token (RFC 9309
    * core: prefix rules, longest-match, Allow wins ties, specific group
    * shadows '*'). */
  def robots_allowed(robots: Column, pathq: Column, agent: String): Column =
    c(RobotsAllowed(x(robots), x(pathq), agent))

  /** group-scoped Crawl-delay seconds for a fixed crawler token (-1 =
    * none declared) — the per-host politeness interval a scheduler uses. */
  def robots_crawl_delay(robots: Column, agent: String): Column =
    c(RobotsCrawlDelay(x(robots), agent))

  /** every Sitemap URL of a robots.txt in document order (global
    * directive, not group-scoped). */
  def robots_sitemaps(robots: Column): Column = c(RobotsSitemaps(x(robots)))

  /** one genuine WARC/1.0 record (version line, named headers,
    * Content-Length, CRLFCRLF terminator) for a fixed WARC-Type. */
  def warc_record(uri: Column, tsMs: Column, payload: Column,
      wtype: String): Column =
    c(WarcRecord(x(uri), x(tsMs), x(payload), wtype))

  /** parse a concatenation of WARC records back into (wtype, uri,
    * n_bytes, payload) structs; NULL for malformed shards. */
  def warc_extract(bytes: Column): Column = c(WarcExtract(x(bytes)))

  /** one WARC record as one gzip member — the *.warc.gz framing crawled
    * corpora ship in (one member per record, members concatenated). */
  def warc_gz_record(uri: Column, tsMs: Column, payload: Column,
      wtype: String): Column =
    c(WarcGzRecord(x(uri), x(tsMs), x(payload), wtype))

  /** inflate concatenated gzip members and parse the WARC records inside;
    * NULL for malformed shards (bad member, CRC mismatch, inflation bomb). */
  def warc_gz_extract(bytes: Column): Column = c(WarcGzExtract(x(bytes)))

  /** charset-aware bytes→text decode (WHATWG order: BOM → Content-Type
    * charset → meta prescan → UTF-8), STRICT — poisoned/unknown encodings
    * decode to NULL, never to replacement characters. A NULL content_type
    * is treated as "no transport declaration". */
  def decode_charset(bytes: Column, contentType: Column): Column =
    c(DecodeCharset(x(bytes),
      x(org.apache.spark.sql.functions.coalesce(contentType,
        org.apache.spark.sql.functions.lit("")))))

  /** text→bytes under a fixed WHATWG charset label — the test-data
    * constructor's inverse of decode_charset (real pipelines only decode;
    * the x92 shard builder needs the legacy bytes to exist). NULL when a
    * char has no byte in the target encoding. */
  def encode_whatwg(str: Column, label: String): Column =
    c(EncodeWhatwg(x(str), label))

  /** DEFLATE-compressed byte length of a string (compression-ratio signal). */
  def deflate_len(text: Column): Column = c(DeflateLength(x(text)))

  /** average-hash (aHash) 64-bit perceptual fingerprint of a binary image
    * payload: 8×8 block-average grid, bit i = cell i above the grid mean. */
  def avg_hash64(image: Column): Column = c(AvgHash64(x(image)))

  /** encode an int array as a real PCM16 mono RIFF/WAVE payload. */
  def wav_pcm16(samples: Column, sampleRate: Column): Column =
    c(WavEncodePcm16(x(samples), x(sampleRate)))

  /** parse a PCM16 RIFF/WAVE payload into exact audio-QA statistics
    * (sample_rate, channels, n_samples, peak, clipped, zero_cross, sum_sq);
    * NULL for undecodable payloads. */
  def wav_stats(bytes: Column): Column = c(WavStats(x(bytes)))

  /** encode an array of raw 8-bit grayscale frames as a real RIFF/AVI 1.0
    * payload (hdrl/avih/strl/strh/strf + movi 00db chunks + idx1 index,
    * AVIIF_KEYFRAME every `keyEvery`-th frame). */
  def avi_pack(frames: Column, fps: Column, width: Column, height: Column,
      keyEvery: Column): Column =
    c(AviPack(Seq(x(frames), x(fps), x(width), x(height), x(keyEvery))))

  /** parse a RIFF/AVI payload and sample every `every`-th frame through the
    * idx1 index (seek + verify, only sampled payloads touched): exact-integer
    * stats (width, height, usec_per_frame, fps, n_frames, n_keyframes,
    * sampled_n, sampled_sum, sampled_max); NULL for undecodable payloads. */
  def avi_frame_sample(bytes: Column, every: Column): Column =
    c(AviFrameSample(x(bytes), x(every)))

  /** Pack an int array into a binary (one byte per element, low 8 bits). */
  def pack_bytes(ints: Column): Column = c(PackBytes(x(ints)))

  /** encode an array<struct<name,data>> as a real POSIX ustar archive (the
    * WebDataset shard layout); deterministic fixed metadata. */
  def tar_pack(entries: Column): Column = c(TarPack(x(entries)))

  /** walk a ustar header chain: one (name, size, chksum_ok, data_sum,
    * data_max) row per entry, NULL for malformed archives. */
  def tar_index(bytes: Column): Column = c(TarIndex(x(bytes)))

  /** Morton z-value of two 16-bit keys: bit-interleaves `a` (even positions)
    * and `b` (odd positions) so lexicographic order on the result is a
    * space-filling curve over (a, b) — sort-by-z clusters BOTH dimensions
    * into each file's min/max envelope. Pure builtin bit ops (shift/or/and),
    * so the whole computation stays inside whole-stage codegen; inputs must
    * already be normalized to [0, 65535]. */
  def zvalue16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(org.apache.spark.sql.functions.shiftleft(spread16(b), 1))

  /** spread the low 16 bits of v: bit i moves to position 2i. */
  private def spread16(v: Column): Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft}
    var z = v.cast("long").bitwiseAND(lit(0xFFFFL))
    z = z.bitwiseOR(shiftleft(z, 8)).bitwiseAND(lit(0x00FF00FFL))
    z = z.bitwiseOR(shiftleft(z, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    z = z.bitwiseOR(shiftleft(z, 2)).bitwiseAND(lit(0x33333333L))
    z.bitwiseOR(shiftleft(z, 1)).bitwiseAND(lit(0x55555555L))
  }
}
