package org.apache.spark.sql.graft

import java.security.MessageDigest
import org.apache.spark.unsafe.types.UTF8String

/** THE single definition of the cross-engine text contract shared by
  * the compiled expressions ([[WordShingles]], [[Simhash32]],
  * [[MinhashSignature]]):
  *
  *  - tokenize: Spark semantics — trim U+0020 only (like `trim()`),
  *    Java-regex `\s+` split with limit -1 (like `split()`); blank →
  *    empty. Non-space leading whitespace yields a leading "" token,
  *    exactly as the Column formulation does.
  *  - md5Prefix32: first 8 md5 hex chars of the UTF-8 bytes as an
  *    unsigned 32-bit value — `TextFunctions.portableHash`, which every
  *    DuckDB oracle re-derives.
  *
  * Keeping both here means a semantics tweak cannot silently diverge
  * one expression from the others (or from the oracles). Public so
  * driver-side code (e.g. Bm25 query tokenization) can reuse the SAME
  * contract instead of approximating it with java.lang.String.trim
  * (which trims all chars ≤ U+0020, not just the space).
  */
object TextCodec {

  private val whitespace = java.util.regex.Pattern.compile("\\s+")

  /** MessageDigest is stateful and expression objects are shared across
    * tasks via the codegen references array — one digest per thread. */
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def tokenize(s: UTF8String): Array[String] = {
    val trimmed = s.trim()
    if (trimmed.numBytes() == 0) Array.empty
    else whitespace.split(trimmed.toString, -1)
  }

  def md5Prefix32(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Two independent 60-bit hashes from one md5 pass: the numeric
    * values of hex chars 1-15 and 16-30 — exactly
    * `conv(substring(md5(x), 1, 15), 16, 10)` /
    * `conv(substring(md5(x), 16, 15), 16, 10)`, the Kirsch–Mitzenmacher
    * base pair every sketch oracle re-derives in DuckDB. */
  def md5Pair60(bytes: Array[Byte]): (Long, Long) = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var a = 0L
    var i = 0
    while (i < 8) { a = (a << 8) | (d(i) & 0xffL); i += 1 }
    var b = 0L
    while (i < 16) { b = (b << 8) | (d(i) & 0xffL); i += 1 }
    // hex char j = nibble j of the big-endian digest: chars 1-15 are
    // nibbles 0-14 (top 60 bits of a), chars 16-30 are nibble 15 (low
    // nibble of a) followed by nibbles 16-29 (top 56 bits of b)
    (a >>> 4, ((a & 0xfL) << 56) | (b >>> 8))
  }
}
