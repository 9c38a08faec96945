package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking cut points (the LBFS / Rabin-fingerprint
  * CDC family, Muthitacharoen et al. SOSP'01): a chunk boundary falls
  * after position p when the fingerprint of the w-byte window ending
  * at p satisfies `h % divisor == 0`, subject to min/max chunk bounds.
  * Because the boundary decision depends only on LOCAL bytes, chunking
  * RESYNCHRONIZES after insertions/deletions — shifted copies of the
  * same content still produce identical chunks, the property that
  * makes chunk-hash dedup work where fixed-size blocks fail.
  *
  * Fingerprint = [[TextCodec.md5Prefix32]] of the window's UTF-8
  * bytes — the battery's portable hash, so the DuckDB oracle replays
  * boundaries exactly (`hx(substr(s, p-w+1, w)) % divisor`).
  * Positions are CHARACTER-based (ASCII-safe per the testdata layout
  * contract, as with chrF).
  *
  * Cut selection per chunk (all integer, deterministic): from the
  * previous cut `last`, the next cut is the smallest candidate p in
  * [last+minLen, min(last+maxLen, len)] (candidates require a full
  * window, p ≥ w), else min(last+maxLen, len) — the forced cut that
  * bounds chunk size; the tail remainder may undershoot minLen.
  * Each position hashes at most once → O(len) digests per document.
  *
  * Returns the 1-based cut END positions (last element = len); empty
  * or null text → empty array / null. A per-row compiled projection —
  * the corpus-wide dedup that follows (group by chunk hash) is the
  * operator's only shuffle.
  */
case class CdcCuts(child: Expression, window: Int, divisor: Int,
                   minLen: Int, maxLen: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(window >= 1 && divisor >= 1 && minLen >= window &&
    maxLen > minLen,
    s"need 1 <= window <= minLen < maxLen, divisor >= 1; " +
      s"got w=$window d=$divisor min=$minLen max=$maxLen")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_cuts"

  def compute(s: UTF8String): Any = {
    val str = s.toString
    val len = str.length
    if (len == 0) return new GenericArrayData(Array.empty[Int])
    val cuts = scala.collection.mutable.ArrayBuffer[Int]()
    var last = 0
    while (last < len) {
      val hardStop = math.min(last + maxLen, len)
      var chosen = hardStop
      var p = last + minLen
      var found = false
      while (!found && p <= hardStop) {
        if (p >= window) {
          val h = TextCodec.md5Prefix32(
            str.substring(p - window, p).getBytes("UTF-8"))
          if (h % divisor == 0L) { chosen = p; found = true }
        }
        p += 1
      }
      cuts += chosen
      last = chosen
    }
    new GenericArrayData(cuts.toArray)
  }

  override def nullSafeEval(x: Any): Any = compute(x.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcCuts", this, classOf[CdcCuts].getName)
    nullSafeCodeGen(ctx, ev, x => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
       |  $ref.compute($x);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  def apply(text: Column, window: Int, divisor: Int, minLen: Int,
            maxLen: Int): Column =
    ExpressionUtils.column(new CdcCuts(
      ExpressionUtils.expression(text), window, divisor, minLen, maxLen))
}
