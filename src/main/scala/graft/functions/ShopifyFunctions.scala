package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar functions F1–F8 from SURVEY.md §2.3, re-expressed as pure
  * `Column` combinators (whole-stage-codegen friendly; zero UDFs).
  *
  * Semantics harvested from the reference's Python helpers
  * (`incremental_loaders.py:63-77` clean_id/safe_val/get_money) and the
  * rendered merge SQL (`run_logs.txt:346-379` SKU normalization). Each
  * function preserves the reference's quirks (null-safety, defaults,
  * stringified booleans) so that oracle parity holds bit-for-bit.
  */
object ShopifyFunctions {

  /** F1 — `clean_id(gid, prefix)`: null-safe; substring after the last
    * `/` of a Shopify GID (`gid://shopify/Order/123` → `123`), prepended
    * with a store prefix (`R-`/`W-`; empty for product/variant ids).
    * Ref: incremental_loaders.py:63-65.
    */
  def cleanId(gid: Column, prefix: String): Column =
    cleanId(gid, lit(prefix))

  def cleanId(gid: Column, prefix: Column): Column =
    when(gid.isNull, lit(null).cast("string"))
      .otherwise(concat(prefix, element_at(split(gid, "/"), -1)))

  /** F2 — `safe_val`: try-cast with default on null or bad input.
    * `try_cast` yields null on garbage (Spark 4 is ANSI by default, so a
    * plain cast would throw), and `coalesce` supplies the reference's
    * try/except default. Ref: incremental_loaders.py:67-69.
    */
  def safeCast(c: Column, to: String, default: Any): Column =
    coalesce(c.try_cast(to), lit(default).cast(to))

  /** F3 — `get_money`: money set → double. Mirrors the reference's
    * control flow exactly (incremental_loaders.py:71-77): if `shopMoney`
    * is a non-empty object, use its `amount` (default 0.0, with NO
    * fallback to the outer amount); otherwise use the outer `amount`;
    * null/absent → 0.0. "Non-empty" ⇔ at least one field non-null, which
    * is how a JSON `{}` parses against a fixed StructType.
    */
  def money(obj: Column): Column = {
    val sm = obj.getField("shopMoney")
    val smNonEmpty = sm.isNotNull &&
      (sm.getField("amount").isNotNull || sm.getField("currencyCode").isNotNull)
    when(obj.isNull, lit(0.0))
      .when(smNonEmpty, coalesce(sm.getField("amount").try_cast("double"), lit(0.0)))
      .otherwise(coalesce(obj.getField("amount").try_cast("double"), lit(0.0)))
  }

  /** F4 — tag-array join: `["a","b"]` → `"a,b"`, null → `""`.
    * Ref: incremental_loaders.py:148,235,292.
    */
  def joinTags(tags: Column): Column =
    concat_ws(",", coalesce(tags, array()))

  /** F5 — order-name normalize: strip `#`, null → `""`.
    * Ref: incremental_loaders.py:228.
    */
  def stripHash(c: Column): Column =
    regexp_replace(coalesce(c, lit("")), "#", "")

  /** F6 — Python-style stringified boolean: true→"True", false→"False",
    * null→"None". A reference quirk (`str(node.get(...))`) preserved for
    * parity. Ref: incremental_loaders.py:147,234,293,310.
    */
  def pyStr(b: Column): Column =
    when(b.isNull, lit("None"))
      .when(b === lit(true), lit("True"))
      .otherwise(lit("False"))

  /** F7 — SKU normalization used as dedup/join key: `UPPER(TRIM(x))`.
    * Ref: run_logs.txt:346-379.
    */
  def normKey(c: Column): Column = upper(trim(c))

  /** F8 — timestamp renders used by the raw-file sink and loaders. */
  def tsCompact(c: Column): Column = date_format(c, "yyyyMMdd_HHmmss")
  def tsIso(c: Column): Column = date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
  def tsDate(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
