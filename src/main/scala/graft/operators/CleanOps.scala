package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.UnicodeNormalize

/** Unicode-aware text cleaning for corpus preparation: normalization,
  * control/format-character stripping, newline and whitespace
  * canonicalization — the first pass every web-scraped training corpus
  * runs before dedup and quality scoring.
  *
  * Everything here is a per-row projection built from codegen'd
  * expressions (`regexp_replace` + the compiled
  * [[org.apache.spark.sql.graft.UnicodeNormalize]]): zero shuffle, one
  * pass, safe inside whole-stage codegen at any scale.
  *
  * Cross-engine contract: the regex patterns use only syntax that Java
  * regex and RE2 (DuckDB's `regexp_replace`) interpret identically —
  * explicit `\x{…}` code-point escapes and plain classes, no `&&`
  * intersection, no lookaround — so the same pattern strings are
  * embedded verbatim in the DuckDB oracles (q65).
  */
object CleanOps {

  /** C0 controls except `\t`/`\n` (cleaning happens after newline
    * canonicalization, so `\r` is gone by then), DEL, zero-width
    * space/non-joiner/joiner/LRM/RLM, BOM/zero-width-no-break, and the
    * soft hyphen — the characters that corrupt tokenization while
    * rendering invisibly. */
  val StripPattern: String =
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\x{200b}-\\x{200f}\\x{feff}\\x{ad}]"

  /** Runs of spaces/tabs (not newlines). */
  val SpaceRunPattern: String = "[ \\t]+"

  /** Spaces hugging a newline. */
  val NewlineTrimPattern: String = " *\\n *"

  /** Three or more consecutive newlines (post-trim) — paragraph breaks
    * keep at most one blank line. */
  val NewlineRunPattern: String = "\\n{3,}"

  /** Leading/trailing whitespace incl. newlines (plain `trim` only
    * strips U+0020 in both engines). */
  val EdgePattern: String = "^[ \\t\\n]+|[ \\t\\n]+$"

  /** Unicode-normalize (default NFC — what utf8proc/DuckDB expose). */
  def normalize(text: Column, form: String = "NFC"): Column =
    UnicodeNormalize(text, form)

  /** CRLF / lone CR → LF. */
  def canonicalNewlines(text: Column): Column =
    regexp_replace(text, "\\r\\n?", "\n")

  /** Drop control/format characters ([[StripPattern]]). */
  def stripControl(text: Column): Column =
    regexp_replace(text, StripPattern, "")

  /** Collapse horizontal whitespace runs, trim spaces around newlines,
    * cap blank lines at one, strip the edges. */
  def collapseWhitespace(text: Column): Column = {
    val spaced = regexp_replace(text, SpaceRunPattern, " ")
    val nlTrim = regexp_replace(spaced, NewlineTrimPattern, "\n")
    val nlRun = regexp_replace(nlTrim, NewlineRunPattern, "\n\n")
    regexp_replace(nlRun, EdgePattern, "")
  }

  /** HTML/XML tags (including attributes) — boilerplate markup left by
    * web extraction. Deliberately simple tag-shaped regex: real HTML
    * parsing is an extraction concern; this is the salvage pass for
    * text that mostly escaped it. */
  val TagPattern: String = "<[^>]*>"

  /** The HTML character entities worth decoding in cleaned text, in
    * apply order — `&amp;` LAST so `&amp;lt;` decodes to the literal
    * `&lt;` (one level, exactly like a browser). Shared with the DuckDB
    * oracle, which replays the same replace chain. */
  val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'",
    "&amp;" -> "&")

  /** Strip markup: tags → a space (so `a<br>b` stays two words), then
    * decode the common entities. Compose with [[cleanText]] to collapse
    * the leftover whitespace. */
  def stripHtml(text: Column): Column =
    Entities.foldLeft(regexp_replace(text, TagPattern, " ")) {
      case (c, (entity, repl)) => replace(c, lit(entity), lit(repl))
    }

  /** The standard cleaning pipeline: NFC → newline canonicalization →
    * control strip → whitespace collapse → NFC again. The second
    * normalize is what makes the pipeline idempotent: stripping a
    * zero-width/format character can bring a combining mark next to a
    * base it was separated from (NFC is composition-blocked across
    * e.g. ZWSP), so the first pass alone can leave newly-composable
    * sequences behind. Re-normalizing is near-free on the
    * already-normalized fast path. */
  def cleanText(text: Column): Column =
    normalize(
      collapseWhitespace(stripControl(canonicalNewlines(normalize(text)))))
}
