package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.wordShingles

/** Document-quality operators beyond per-row scoring
  * (`TextFunctions.qualityScore`): Gopher-style repetition profiling
  * and PII scrubbing — the standard pre-training hygiene passes.
  */
object QualityOps {

  /** Per-doc n-gram NOVELTY against the corpus: how many of a
    * document's distinct shingles appear in NO lower-id document —
    * the "how much new text does this doc add" curation signal (docs
    * that only restate earlier content score 0 and are crawl-dup /
    * boilerplate suspects). Ordering by id makes the metric
    * deterministic and engine-independent; any total order column
    * works. Returns (idCol, n_shingles, n_novel) for EVERY input doc
    * (0/0 when too short to shingle).
    *
    * Scale shape: one explode + one shuffle keyed on the shingle for
    * the first-seen election (min id — an associative aggregate with
    * map-side partials), one join back keyed the same way, one per-doc
    * count. No pairwise doc comparisons. */
  def noveltyProfile(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 3): DataFrame = {
    val sh = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol),
        explode(array_distinct(wordShingles(col(textCol), n))).as("__sh"))
    val firstSeen = sh.groupBy("__sh").agg(min(col(idCol)).as("__first"))
    val stats = sh.join(firstSeen, Seq("__sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
    df.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .na.fill(0L, Seq("n_shingles", "n_novel"))
  }

  /** Per-doc word-n-gram repetition profile: total grams, distinct
    * grams, the hottest gram's frequency, and the duplicate-gram ratio
    * `(total - distinct) / total` (the "repetition fraction" filters
    * threshold on). Docs with fewer than `n` tokens have no grams and
    * are absent. One shuffle keyed on (doc, gram) with map-side
    * partial counts; per-doc state is bounded by the doc's own gram
    * count, never the corpus. */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 2): DataFrame =
    df.select(col(idCol), explode(wordShingles(col(textCol), n)).as("gram"))
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_freq"))
      .withColumn("dup_ratio",
        (col("n_grams") - col("n_distinct")).cast("double") /
          col("n_grams").cast("double"))

  /** Gopher/C4-style projection-rule battery (Rae et al. 2021 §A1.1,
    * adapted): per-rule boolean flags plus the overall `pass` verdict,
    * from the existing codegen'd quality signals — a pure per-row
    * projection, no shuffle. Repetition rules (duplicate-gram
    * fractions) are the aggregation-shaped complement in
    * [[repetitionProfile]]. Token-less docs fail `len_ok` and carry
    * false flags throughout (no NaN comparisons reach the output). */
  def gopherFlags(df: DataFrame, textCol: String,
                  minTokens: Int = 50, maxTokens: Int = 100000,
                  minMeanTokLen: Double = 3.0, maxMeanTokLen: Double = 10.0,
                  maxDigitRatio: Double = 0.2,
                  minStopwordRatio: Double = 0.02): DataFrame = {
    import graft.functions.TextFunctions._
    val t = col(textCol)
    val nonEmpty = tokenCount(t) > 0
    val lenOk = tokenCount(t).between(minTokens, maxTokens)
    val meanOk = nonEmpty && meanTokenLength(t).between(minMeanTokLen, maxMeanTokLen)
    val digitOk = nonEmpty && digitRatio(t) <= maxDigitRatio
    val stopOk = nonEmpty && stopwordRatio(t) >= minStopwordRatio
    df.withColumn("len_ok", lenOk)
      .withColumn("mean_len_ok", meanOk)
      .withColumn("digit_ok", digitOk)
      .withColumn("stopword_ok", stopOk)
      .withColumn("pass", lenOk && meanOk && digitOk && stopOk)
  }

  /** `https?` host of a URL column (empty string when no match). */
  def extractDomain(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(url, "^https?://([^/]+)", 1)

  /** Canonical URL (compiled expression; see
    * [[org.apache.spark.sql.graft.UrlCanonicalize]] for the exact
    * rules): the dedup key for by-URL web-corpus dedup — group or
    * [[graft.operators.Dedup.exact]] on it. */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.UrlCanonicalize(url)

  /** Drop rows whose URL host appears in `blocked` (single `domain`-like
    * column; first column is used). Blocklists are small by contract —
    * broadcast anti-join, so the corpus never shuffles. */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
                           blocked: DataFrame): DataFrame =
    df.withColumn("__domain", extractDomain(col(urlCol)))
      .join(broadcast(blocked.select(col(blocked.columns.head).as("__domain"))),
        Seq("__domain"), "left_anti")
      .drop("__domain")

  /** Conservative PII patterns, chosen to behave identically under
    * Java regex and RE2 (the DuckDB oracle dialect): emails and
    * NNN-NNN-NNNN phone numbers. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\d{3}-\\d{3}-\\d{4}"

  /** Redact emails/phones in `textCol` (in place) and count what was
    * redacted in `n_emails`/`n_phones`. Emails redact first, and the
    * phone count runs on the post-email text — a phone-shaped
    * substring consumed by an email match (e.g. `123-456-7890@x.com`)
    * is one email redaction, not a phantom phone one. Pure per-row
    * projection — no shuffle, trivially 100 TB-parallel. */
  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailPattern, "<EMAIL>")
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(afterEmail, lit(PhonePattern), lit(0))).cast("long"))
      .withColumn(textCol,
        regexp_replace(afterEmail, PhonePattern, "<PHONE>"))
  }

  /** Card-shaped spans: 16 digits, contiguous or 4-4-4-4 grouped by
    * space/dash — fixed-shape alternatives so Java regex and RE2 agree
    * on every match boundary. */
  val CardPattern: String =
    "\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}|\\d{16}"

  /** Luhn checksum over a span's digits (ISO/IEC 7812): from the
    * RIGHTMOST digit, double every second one (subtracting 9 past 9)
    * and test the sum mod 10 — the checksum real card numbers carry.
    * Pure integer HOF arithmetic, replayed identically in SQL. */
  def luhnValid(span: Column): Column = {
    val ds = reverse(regexp_replace(span, "[^0-9]", ""))
    val sum = aggregate(sequence(lit(0), length(ds) - 1), lit(0L),
      (acc, i) => {
        val d = (ascii(element_at(split(ds, ""), i + lit(1))) - lit(48))
          .cast("long")
        acc + when(i % 2 === 0, d)
          .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
      })
    length(ds) >= 13 && sum % 10 === 0
  }

  /** Luhn-VALIDATED card redaction: card-shaped spans that fail the
    * checksum are left alone (order ids, timestamps and phone-number
    * fragments are the classic false positives a shape-only scrubber
    * destroys); spans that pass redact to `<CARD>`. Counts both.
    * Zero-shuffle per-row projection: extract candidates, filter by
    * [[luhnValid]], fold exact-string replacement over the valid set.
    */
  def scrubCards(df: DataFrame, textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit(CardPattern), lit(0))
    df.withColumn("__valid", filter(cands, luhnValid(_)))
      .withColumn("n_card_candidates", size(cands).cast("long"))
      .withColumn("n_cards", size(col("__valid")).cast("long"))
      .withColumn(textCol,
        aggregate(col("__valid"), col(textCol),
          (acc, s) => org.apache.spark.sql.functions.replace(
            acc, s, lit("<CARD>"))))
      .drop("__valid")
  }
}
