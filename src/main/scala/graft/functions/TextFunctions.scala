package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting, shingles,
  * MinHash and SimHash — all as pure `Column` combinators (codegen'd,
  * shuffle-free per row; the expensive set operations live in
  * `operators.Dedup`).
  *
  * Hashing is "portable": `h(s)` = first 8 hex chars of `md5(s)` as a
  * 32-bit integer. md5 is bit-identical across engines, which makes
  * every derived signature oracle-checkable in DuckDB — and
  * deterministic across cluster re-runs, unlike JVM `hashCode`.
  */
object TextFunctions {

  /** Whitespace tokenization; empty/blank text → empty array (split of
    * "" would otherwise yield [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Portable 32-bit hash (see object doc). Returns LongType in
    * [0, 2^32). */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Seeded variant: independent hash functions h_i(s) = h(i ++ ":" ++ s). */
  def portableHash(c: Column, seed: Int): Column =
    portableHash(concat(lit(s"$seed:"), c))

  /** Word k-shingles: overlapping k-token windows re-joined by a single
    * space. Fewer than k tokens → empty array. Compiled single-pass
    * Expression (see org.apache.spark.sql.graft.WordShingles) —
    * shingling is the hot inner loop of the MinHash/Jaccard dedup
    * operators and the HOF formulation is interpreted. */
  def wordShingles(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.WordShingles(text, k)

  /** Interpreted higher-order-function reference implementation of
    * [[wordShingles]]; kept for differential testing only. */
  private[graft] def wordShinglesHof(text: Column, k: Int): Column = {
    val ts = tokens(text)
    val n = size(ts) - (k - 1)
    when(n <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), n),
        i => concat_ws(" ", slice(ts, i, lit(k)))))
  }

  /** Fixed-size token chunks with overlap — the context-window packing
    * step of a training pipeline: chunk i covers tokens
    * [1 + i·(maxTokens−overlap), …][..maxTokens]. Chunk starts advance
    * by the stride while `start ≤ max(len − overlap, 1)`, so the final
    * chunk reaches the end exactly once (no degenerate fully-contained
    * tail chunks); blank text → empty array. */
  def tokenChunks(text: Column, maxTokens: Int, overlap: Int): Column = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got maxTokens=$maxTokens overlap=$overlap")
    val ts = tokens(text)
    val stride = maxTokens - overlap
    val n = size(ts)
    when(n <= 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), greatest(n - overlap, lit(1)), lit(stride)),
        s => concat_ws(" ", slice(ts, s, lit(maxTokens)))))
  }

  /** Character n-grams of the raw text. */
  def charNgrams(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.CharNgrams(text, n)

  /** The interpreted HOF formulation [[charNgrams]] replaced — kept
    * for the differential spec (TextFunctionsSpec): interpreted
    * ArrayTransform + per-gram from-zero substring scans, O(len²) per
    * document; the sf1 gate measured q221_chrf at 15+ min in this. */
  private[graft] def charNgramsHof(text: Column, n: Int): Column = {
    val len = length(text) - (n - 1)
    when(len <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), len), i => substring(text, i, lit(n))))
  }

  /** Universal-hash family over the portable base hash:
    * h_i(s) = (a_i · (h(s) mod P) + b_i) mod P, P = 2³¹−1. The md5 runs
    * ONCE per shingle; the per-function work is two integer ops —
    * 16× cheaper than hashing per (function, shingle), and equally
    * oracle-expressible. Constants are pure functions of i so the
    * DuckDB oracle embeds the same values. */
  val MinhashP: Long = 2147483647L
  def minhashA(i: Int): Long = 1L + 2L * ((2654435761L * (i + 1)) % 1073741823L)
  def minhashB(i: Int): Long = (40503L * 65537L * (i + 1)) % MinhashP

  /** MinHash signature over a shingle array: sig[i] = min over shingles
    * of h_i(s). Compiled single-pass Expression (see
    * org.apache.spark.sql.graft.MinhashSignature): one md5 per shingle,
    * all n minima updated in registers, zero shuffle. Empty shingle
    * set → null signature. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.MinhashSignature(shingles,
      (0 until numHashes).map(minhashA), (0 until numHashes).map(minhashB),
      MinhashP)

  /** Interpreted higher-order-function reference implementation of
    * [[minhashSignature]]; kept for differential testing only. */
  private[graft] def minhashSignatureHof(shingles: Column, numHashes: Int): Column = {
    val aLit = array((0 until numHashes).map(i => lit(minhashA(i))): _*)
    val bLit = array((0 until numHashes).map(i => lit(minhashB(i))): _*)
    val base = transform(array_distinct(shingles),
      s => pmod(portableHash(s), lit(MinhashP)))
    val folded = aggregate(
      base,
      array_repeat(lit(MinhashP), numHashes),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(numHashes - 1)),
        (m, i) => least(m,
          pmod(h * element_at(aLit, i + 1) + element_at(bLit, i + 1),
            lit(MinhashP)))))
    when(size(shingles) === 0, lit(null).cast("array<bigint>")).otherwise(folded)
  }

  /** LSH band key: hash of the signature slice for one band. Equal band
    * keys → candidate duplicate pair. */
  def bandKey(signature: Column, band: Int, rowsPerBand: Int): Column =
    md5(concat_ws(",",
      slice(signature, band * rowsPerBand + 1, rowsPerBand).cast("array<string>")))

  /** Bit b (Column-valued) of a non-negative long: floor(h / 2^b) mod 2.
    * (`shiftright` only takes literal shift amounts; double-precision
    * powers are exact below 2^53.) */
  private[functions] def bitAt(h: Column, b: Column): Column =
    pmod(floor(h.cast("double") / pow(lit(2.0), b)).cast("long"), lit(2L))

  /** 32-bit SimHash over the token multiset (duplicates weigh in, as in
    * the classic Charikar construction): bit b is set iff
    * Σ_tokens (±1 by bit b of h(token)) >= 0. Compiled single-pass
    * Expression (see org.apache.spark.sql.graft.Simhash32) — a pure
    * projection, so the signature stage of SimHash dedup costs zero
    * shuffle. */
  def simhash32(text: Column): Column =
    org.apache.spark.sql.graft.Simhash32(text)

  /** Interpreted higher-order-function reference implementation of
    * [[simhash32]]; kept for differential testing only. */
  private[graft] def simhash32Hof(text: Column): Column = {
    val hs = transform(tokens(text), t => portableHash(t))
    val bits = sequence(lit(0), lit(31))
    val counts = aggregate(
      hs,
      array_repeat(lit(0), 32),
      (acc, h) => zip_with(acc, bits,
        (c, b) => c + when(bitAt(h, b) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(counts, bits,
        (c, b) => when(c >= 0, pow(lit(2.0), b).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }

  /** Hamming distance between two 32-bit SimHashes. */
  def hamming32(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Content fingerprint: md5 of normalized text (exact dedup key). */
  def fingerprint(text: Column): Column = md5(trim(text))

  /** Prefix fingerprint: md5 of the first k tokens — groups documents
    * sharing a head, a cheap near-dup blocking key. */
  def prefixFingerprint(text: Column, k: Int): Column =
    md5(concat_ws(" ", slice(tokens(text), 1, k)))

  /** Order-sensitive rolling fingerprint: polynomial fold
    * h = fold(tokens, h·B + hash(t) mod P). Unlike the md5 of the full
    * text, it streams (constant state per document) and distinguishes
    * permutations, the classic rolling-hash document signature. */
  def rollingFingerprint(text: Column): Column = {
    val hs = transform(tokens(text), t => pmod(portableHash(t), lit(MinhashP)))
    when(size(hs) === 0, lit(null).cast("long"))
      .otherwise(aggregate(
        slice(hs, lit(2), greatest(size(hs) - 1, lit(0))),
        element_at(hs, 1),
        (acc, h) => pmod(acc * lit(1000003L) + h, lit(MinhashP))))
  }

  /** BPE-ish subword token count: letter runs, digit runs, and single
    * punctuation marks each count as one unit (the cheap proxy for a
    * byte-pair vocabulary's segmentation). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  // ------------------------------------------------------------- quality
  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this", "be")

  /** Share of tokens that are stopwords; 0.0 for empty docs. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val ts = tokens(text)
    val sw = filter(ts, t => t.isin(stopwords: _*))
    when(size(ts) === 0, lit(0.0))
      .otherwise(size(sw).cast("double") / size(ts).cast("double"))
  }

  /** Mean token length; 0.0 for empty docs. */
  def meanTokenLength(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(
        aggregate(ts, lit(0), (a, t) => a + length(t)).cast("double") /
          size(ts).cast("double"))
  }

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")))
        .cast("double") / length(text).cast("double"))

  /** Digit-character ratio. */
  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[0-9]", "")))
        .cast("double") / length(text).cast("double"))

  /** Composite quality score in [0,1]: penalizes extreme lengths, low
    * stopword share and punctuation soup — the standard cheap heuristics
    * a pretraining pipeline applies before expensive dedup. */
  def qualityScore(text: Column): Column = {
    val lenOk = when(tokenCount(text).between(5, 100000), 1.0).otherwise(0.0)
    val swOk = when(stopwordRatio(text) > 0.01, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.3, 1.0).otherwise(0.0)
    (lit(lenOk) + lit(swOk) + lit(punctOk)) / 3.0
  }

  // ------------------------------------------------------------- lang id
  /** Tiny per-language stopword lists for the n-gram/stopword-vote
    * heuristic. Deliberately minimal — the operator structure (vote +
    * deterministic tie-break) is the point; lists are swappable. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "la", "los", "que", "es"))

  /** Language-ID by stopword vote: argmax language by stopword hits;
    * zero hits → "und" (undetermined). Nonzero ties resolve to the
    * lexicographically GREATEST language (struct-max semantics — the
    * deterministic rule the DuckDB oracle mirrors). One whole-doc
    * segment through the compiled [[segmentLangs]] pass (blank text
    * votes an empty array → coalesce to "und", exactly the zero-hit
    * rule). */
  def langId(text: Column): Column =
    coalesce(try_element_at(segmentLangs(text, 1 << 28), lit(1)), lit("und"))

  /** The [[langId]] vote over a token ARRAY — exposed so callers can
    * vote on slices (per-segment language for code-switch detection)
    * without re-tokenizing. */
  def langIdTokens(ts: Column): Column = {
    def hits(ws: Seq[String]): Column = size(filter(ts, t => t.isin(ws: _*)))
    val langs = langStopwords.toSeq.sortBy(_._1)
    val best = langs.map { case (l, ws) => struct(hits(ws).as("n"), lit(l).as("l")) }
    val winner = array_max(array(best: _*)) // max by (n, then lang desc)
    when(winner.getField("n") === 0, lit("und")).otherwise(winner.getField("l"))
  }

  /** Per-segment language votes: the token stream cut into fixed
    * `window`-token segments (last segment ragged), each segment
    * language-voted independently — the substrate for code-switch
    * detection. One compiled pass per row
    * ([[org.apache.spark.sql.graft.SegmentLangs]]): no explode, no
    * shuffle, whatever the corpus size. Blank text → empty array. */
  def segmentLangs(text: Column, window: Int): Column =
    org.apache.spark.sql.graft.SegmentLangs(text, window,
      langStopwords.toSeq.sortBy(_._1))

  /** The interpreted HOF formulation [[segmentLangs]] replaced — kept
    * for the differential spec: the HOF tower re-materializes a token
    * slice + a filtered array per (segment, language), interpreted;
    * the sf1 gate measured q150_code_switch at ~10 min in it. */
  private[graft] def segmentLangsHof(text: Column, window: Int): Column = {
    require(window >= 1, s"window must be >= 1: $window")
    val ts = tokens(text)
    val nSeg = floor((size(ts) + lit(window - 1)) / lit(window)).cast("int")
    when(size(ts) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), nSeg),
        i => langIdTokens(slice(ts, (i - 1) * window + 1, lit(window)))))
  }
}
