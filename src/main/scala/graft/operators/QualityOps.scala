package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.wordShingles

/** Document-quality operators beyond per-row scoring
  * (`TextFunctions.qualityScore`): Gopher-style repetition profiling
  * and PII scrubbing — the standard pre-training hygiene passes.
  */
object QualityOps {

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

  /** Conservative PII patterns, chosen to behave identically under
    * Java regex and RE2 (the DuckDB oracle dialect): emails and
    * NNN-NNN-NNNN phone numbers. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\d{3}-\\d{3}-\\d{4}"

  /** Redact emails/phones in `textCol` (in place) and count what was
    * redacted in `n_emails`/`n_phones`. Pure per-row projection — no
    * shuffle, trivially 100 TB-parallel. */
  def scrubPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0))).cast("long"))
      .withColumn(textCol,
        regexp_replace(regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>"))
}
