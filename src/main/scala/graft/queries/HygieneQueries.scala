package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{CleanOps, Decontaminate, Dedup, Vocab}

/** Round-4 corpus-hygiene tier: unicode cleaning, sub-document
  * (paragraph) dedup, vocabulary/OOV statistics, and substring-level
  * contamination — each oracle-checked against DuckDB.
  *
  * The synthetic documents are single-line ASCII, so the queries plant
  * the structure they clean DETERMINISTICALLY (combining marks,
  * zero-widths, CRLF runs, repeated paragraphs, verbatim spans): both
  * engines construct bit-identical dirty input, so the full clean /
  * dedup / probe pipeline is verified end-to-end, not just on happy
  * bytes.
  */
object HygieneQueries {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")

  /** The dirty suffix planted by q65: NFC-composable "cafe" +
    * combining acute, zero-width space, CRLF / CR-run line endings, a
    * soft-hyphenated word, a blank-line run, a C0 control, stray
    * spaces. Oracle builds the same bytes via chr() (see [[oracles]]). */
  private val DirtySuffix =
    "  cafe\u0301 \u200b\r\nfi\u00adnal\r\r\n\n\n\n end\u0007 "

  /** Unicode cleaning end-to-end: NFC normalization (é composes),
    * newline canonicalization, control/format strip, whitespace
    * collapse — planted dirt, hash-matched cleaned text. */
  val q65UnicodeClean: Q = (s, d) =>
    docs(s, d)
      .select(col("doc_id"),
        concat(lit("\ufeff"), col("text"), lit(DirtySuffix)).as("dirty"))
      .select(col("doc_id"),
        length(col("dirty")).cast("long").as("dirty_len"),
        CleanOps.cleanText(col("dirty")).as("clean"))
      .select(col("doc_id"), col("dirty_len"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(col("clean")).as("clean_md5"))
      .orderBy("doc_id")

  private val ParaSep = "\n\n"
  private val Boilerplate = "subscribe to our newsletter for updates"

  /** Multi-paragraph documents: own text + a corpus-wide boilerplate
    * paragraph + a mod-7-shared footer + the doc's 40-char prefix. */
  private def paraDocs(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"),
      concat_ws(ParaSep,
        col("text"),
        lit(Boilerplate),
        concat(lit("footer block "), (col("doc_id") % 7).cast("string")),
        substring(col("text"), 1, 40)).as("text"))

  /** Paragraph-level dedup across the corpus: boilerplate survives only
    * in its first host document; every document is reassembled from its
    * kept paragraphs. */
  val q66ParagraphDedup: Q = (s, d) =>
    Dedup.paragraphDedup(paraDocs(s, d), "doc_id", "text", ParaSep)
      .select(col("doc_id"), col("n_paras"), col("n_kept"),
        md5(col("text")).as("clean_md5"))
      .orderBy("doc_id")

  private val VocabSize = 16

  /** Corpus vocabulary (top-16 by frequency, lexicographic ties) +
    * per-doc OOV counts against it — integer outputs, exact compare. */
  val q67VocabOov: Q = (s, d) => {
    val vocab = Vocab.build(docs(s, d), "text", VocabSize)
    Vocab.oovStats(docs(s, d), "doc_id", "text", vocab)
      .orderBy("doc_id")
  }

  /** Substring-level contamination: 40-char spans lifted from every
    * 50th document (span_id = source doc_id), probed verbatim against
    * the whole corpus in one compiled Rabin–Karp pass. Every span hits
    * at least its own source document. */
  val q68SubstringContam: Q = (s, d) => {
    val spans = docs(s, d)
      .filter(col("doc_id") % 50 === 0 && length(col("text")) >= 50)
      .select(col("doc_id"), substring(col("text"), 11, 40).as("span"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      .sortBy(_._1)
    Decontaminate.substringMatches(docs(s, d), "doc_id", "text", spans)
      .orderBy("doc_id", "span_id")
  }

  val queries: Map[String, Q] = Map(
    "q65_unicode_clean" -> q65UnicodeClean,
    "q66_paragraph_dedup" -> q66ParagraphDedup,
    "q67_vocab_oov" -> q67VocabOov,
    "q68_substring_contam" -> q68SubstringContam,
  )

  // ------------------------------------------------------------- oracles

  /** One regexp_replace chain = CleanOps.cleanText, with the SAME
    * pattern strings (Java regex ∩ RE2 syntax — see CleanOps doc). */
  private def cleanSql(expr: String): String = {
    val nl = "chr(10)"
    s"""nfc_normalize(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |  nfc_normalize($expr),
       |  '\\r\\n?', $nl, 'g'),
       |  '${CleanOps.StripPattern}', '', 'g'),
       |  '${CleanOps.SpaceRunPattern}', ' ', 'g'),
       |  '${CleanOps.NewlineTrimPattern}', $nl, 'g'),
       |  '${CleanOps.NewlineRunPattern}', $nl || $nl, 'g'),
       |  '${CleanOps.EdgePattern}', '', 'g'))""".stripMargin
  }

  /** chr()-composed replica of [[DirtySuffix]]. */
  private val dirtySuffixSql =
    "'  cafe' || chr(769) || ' ' || chr(8203) || chr(13) || chr(10) || " +
      "'fi' || chr(173) || 'nal' || chr(13) || chr(13) || chr(10) || " +
      "chr(10) || chr(10) || chr(10) || ' end' || chr(7) || ' '"

  private val sepSql = "chr(10) || chr(10)"

  private val tok = """regexp_split_to_array(trim(text), '\s+')"""

  val oracles: Map[String, String] = Map(
    "q65_unicode_clean" ->
      s"""WITH dirty AS (SELECT doc_id,
         |  chr(65279) || text || $dirtySuffixSql AS dirty FROM documents),
         |clean AS (SELECT doc_id, length(dirty) AS dirty_len,
         |  ${cleanSql("dirty")} AS clean FROM dirty)
         |SELECT doc_id, CAST(dirty_len AS BIGINT) AS dirty_len,
         |  CAST(length(clean) AS BIGINT) AS clean_len,
         |  md5(clean) AS clean_md5
         |FROM clean ORDER BY doc_id""".stripMargin,
    "q66_paragraph_dedup" ->
      s"""WITH built AS (SELECT doc_id,
         |  text || $sepSql || '$Boilerplate' || $sepSql ||
         |  'footer block ' || CAST(doc_id % 7 AS VARCHAR) || $sepSql ||
         |  substr(text, 1, 40) AS dtext FROM documents),
         |splits AS (SELECT doc_id, string_split(dtext, $sepSql) AS parts FROM built),
         |paras AS (SELECT doc_id, unnest(
         |  [struct_pack(idx := i - 1, para := parts[i])
         |   for i in range(1, len(parts) + 1)], recursive := true) FROM splits),
         |keep AS (SELECT doc_id, idx, para,
         |  row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, idx) AS rn
         |  FROM paras),
         |agg AS (SELECT doc_id, count(*) AS n_kept,
         |  string_agg(para, $sepSql ORDER BY idx) AS cleaned
         |  FROM keep WHERE rn = 1 GROUP BY doc_id),
         |tot AS (SELECT doc_id, count(*) AS n_paras FROM paras GROUP BY doc_id)
         |SELECT t.doc_id, CAST(t.n_paras AS BIGINT) AS n_paras,
         |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
         |  md5(coalesce(a.cleaned, '')) AS clean_md5
         |FROM tot t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q67_vocab_oov" ->
      s"""WITH toks AS (SELECT doc_id, unnest($tok) AS token FROM documents),
         |freq AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
         |vocab AS (SELECT token FROM (
         |  SELECT token, row_number() OVER (ORDER BY c DESC, token) AS rn FROM freq)
         |  WHERE rn <= $VocabSize),
         |st AS (SELECT t.doc_id, count(*) AS n_tokens,
         |  sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
         |  FROM toks t LEFT JOIN vocab v USING (token) GROUP BY t.doc_id)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(n_oov AS BIGINT) AS n_oov
         |FROM st ORDER BY doc_id""".stripMargin,
    "q68_substring_contam" ->
      """WITH spans AS (SELECT doc_id AS span_id, substr(text, 11, 40) AS span
        |  FROM documents WHERE doc_id % 50 = 0 AND length(text) >= 50)
        |SELECT d.doc_id, s.span_id FROM documents d, spans s
        |WHERE contains(d.text, s.span)
        |ORDER BY doc_id, span_id""".stripMargin,
  )
}
