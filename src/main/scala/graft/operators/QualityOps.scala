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

  /** Readability statistics per group — the Flesch–Kincaid ingredient
    * pass: words, vowel-group syllables (the standard deterministic
    * syllable heuristic: maximal `[aeiouy]+` runs of the lowercased
    * token) and "complex" words (≥ 3 syllable groups, the Gunning-fog
    * numerator). Emits the exact integer components plus two
    * quantized rates and an FKGL-style grade in milli-units, each
    * term floor-divided independently so both engines assemble the
    * identical integer:
    *   fkgl_milli = (390·words) div units + (11800·syllables) div
    *                words − 15590
    * `units` is the count of text units handed in — pass one row per
    * SENTENCE for true FKGL; over unsegmented corpora (like the
    * synthetic documents) a row is a document and the grade is a
    * per-document-length proxy, still monotone in the two ratios.
    *
    * One explode + map-side-combined agg on the group key; the
    * per-token syllable count is a codegen'd regexp over the token —
    * zero extra shuffle at any corpus size.
    */
  def readabilityStats(df: DataFrame, groupCols: Seq[String],
                       textCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val units = df.groupBy(g: _*).agg(count(lit(1)).as("n_units"))
    val w = df.select(g :+ explode(
      graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("__w"): _*)
      .withColumn("__syl",
        size(regexp_extract_all(col("__w"), lit("[aeiouy]+"), lit(0)))
          .cast("long"))
    val agg = w.groupBy(g: _*).agg(
      count(lit(1)).as("n_words"),
      sum(col("__syl")).as("n_syllables"),
      sum(when(col("__syl") >= 3, 1L).otherwise(0L)).as("n_complex"))
    units.join(agg, groupCols, "left")
      .select(g ++ Seq(
        col("n_units"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_syllables"), lit(0L)).as("n_syllables"),
        coalesce(col("n_complex"), lit(0L)).as("n_complex"),
        when(coalesce(col("n_words"), lit(0L)) === 0L, lit(null).cast("long"))
          .otherwise(expr("(n_syllables * 1000000) div n_words"))
          .as("syl_per_word_micro"),
        when(coalesce(col("n_words"), lit(0L)) === 0L, lit(null).cast("long"))
          .otherwise(expr("(n_complex * 1000000) div n_words"))
          .as("complex_ppm"),
        when(coalesce(col("n_words"), lit(0L)) === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "(390 * n_words) div n_units + (11800 * n_syllables) div n_words" +
              " - 15590")).as("fkgl_milli")): _*)
  }

  /** DuckDB replay of [[readabilityStats]] over `docsSql` →
    * (groupCols…, text). */
  def readabilityStatsOracleSql(docsSql: String,
                                groupCols: Seq[String]): String = {
    val gl = groupCols.mkString(", ")
    s"""WITH d AS (SELECT $gl, text FROM ($docsSql)),
       |u AS (SELECT $gl, CAST(count(*) AS BIGINT) AS n_units FROM d GROUP BY $gl),
       |w AS (SELECT $gl,
       |    CAST(len(regexp_extract_all(tok, '[aeiouy]+')) AS BIGINT) AS syl
       |  FROM (SELECT $gl, unnest(
       |      CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |        ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END) AS tok
       |    FROM d)),
       |a AS (SELECT $gl, CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(syl) AS BIGINT) AS n_syllables,
       |    CAST(sum(CASE WHEN syl >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_complex
       |  FROM w GROUP BY $gl)
       |SELECT $gl, n_units,
       |  coalesce(n_words, 0) AS n_words,
       |  coalesce(n_syllables, 0) AS n_syllables,
       |  coalesce(n_complex, 0) AS n_complex,
       |  CASE WHEN coalesce(n_words, 0) = 0 THEN CAST(NULL AS BIGINT)
       |    ELSE n_syllables * 1000000 // n_words END AS syl_per_word_micro,
       |  CASE WHEN coalesce(n_words, 0) = 0 THEN CAST(NULL AS BIGINT)
       |    ELSE n_complex * 1000000 // n_words END AS complex_ppm,
       |  CASE WHEN coalesce(n_words, 0) = 0 THEN CAST(NULL AS BIGINT)
       |    ELSE (390 * n_words) // n_units + (11800 * n_syllables) // n_words
       |      - 15590 END AS fkgl_milli
       |FROM u LEFT JOIN a USING ($gl)
       |ORDER BY $gl""".stripMargin
  }
}
