package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization as one compiled per-row projection — the
  * first step of dedup-by-URL in a web corpus, where the same page
  * arrives as `HTTPS://Site.COM:443/a/?utm_source=feed#top` and
  * `https://site.com/a?a=1` across crawls. One pass, no regex
  * backtracking, stays inside whole-stage codegen.
  *
  * Canonical form (deterministic, idempotent — specced):
  *  1. the fragment (`#...`) is dropped;
  *  2. no `://` → not a URL: returned as-is (minus fragment);
  *  3. scheme and host are lowercased;
  *  4. a default port is dropped (`:80` for http, `:443` for https);
  *  5. the path drops trailing `/`s; an empty path becomes `/`;
  *  6. query params are split on `&`; empties, `utm_*`, and the usual
  *     click-tracker keys (fbclid/gclid/msclkid/ref/mc_cid/mc_eid)
  *     are dropped; the rest are sorted byte-wise and re-joined —
  *     param ORDER never distinguishes two URLs, param VALUES do.
  *
  * No percent-decoding and no IDN mapping: both can change meaning
  * (`%2F` vs `/`), and canonicalization must never merge two URLs a
  * server could distinguish beyond the rules above.
  */
case class UrlCanonicalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_url"

  private def isTracker(param: String): Boolean = {
    val eq = param.indexOf('=')
    val key = if (eq < 0) param else param.substring(0, eq)
    key.startsWith("utm_") ||
      key == "fbclid" || key == "gclid" || key == "msclkid" ||
      key == "ref" || key == "mc_cid" || key == "mc_eid"
  }

  def compute(s: UTF8String): UTF8String = {
    var url = s.toString
    val hash = url.indexOf('#')
    if (hash >= 0) url = url.substring(0, hash)
    val sep = url.indexOf("://")
    if (sep < 0) return UTF8String.fromString(url)
    val scheme = url.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = url.substring(sep + 3)
    var cut = rest.length
    var i = 0
    while (i < cut) { // host ends at the first '/' or '?'
      val ch = rest.charAt(i)
      if (ch == '/' || ch == '?') cut = i else i += 1
    }
    var host = rest.substring(0, cut).toLowerCase(java.util.Locale.ROOT)
    if (scheme == "http" && host.endsWith(":80")) host = host.dropRight(3)
    if (scheme == "https" && host.endsWith(":443")) host = host.dropRight(4)
    val pathq = rest.substring(cut)
    val q = pathq.indexOf('?')
    var path = if (q < 0) pathq else pathq.substring(0, q)
    while (path.endsWith("/")) path = path.dropRight(1)
    if (path.isEmpty) path = "/"
    val params =
      if (q < 0) Array.empty[String]
      else pathq.substring(q + 1).split("&", -1)
        .filter(p => p.nonEmpty && !isTracker(p))
    java.util.Arrays.sort(params.asInstanceOf[Array[AnyRef]])
    val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
    UTF8String.fromString(scheme + "://" + host + path + query)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("urlCanonicalize", this,
      classOf[UrlCanonicalize].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

object UrlCanonicalize {
  def apply(url: Column): Column =
    ExpressionUtils.column(new UrlCanonicalize(ExpressionUtils.expression(url)))
}
