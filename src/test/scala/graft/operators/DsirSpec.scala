package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // independent reference: same md5-based bucket hash, same formula
  private def bucket(term: String, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(term.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % b
  }

  private val docs = Seq(
    (1L, "en", "spark table spark"),
    (2L, "en", "spark window"),
    (3L, "xx", "blob blob glorp"),
    (4L, "xx", "glorp table")).toDF("doc_id", "lang", "text")

  test("importanceWeights: exact quantized log-ratio sums") {
    val b = 64
    val out = Dsir.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en", carryCols = Seq("lang"), buckets = b)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap

    // recompute reference counts
    val toks = Seq(
      (1L, true, "spark table spark"), (2L, true, "spark window"),
      (3L, false, "blob blob glorp"), (4L, false, "glorp table"))
      .flatMap { case (id, t, s) => s.split(" ").map(w => (id, t, bucket(w, b))) }
    val cr = toks.groupBy(_._3).map { case (f, xs) => f -> xs.size.toLong }
    val ct = toks.filter(_._2).groupBy(_._3).map { case (f, xs) => f -> xs.size.toLong }
    val r = toks.size.toLong; val t = toks.count(_._2).toLong
    def contrib(f: Long): Long =
      math.floor((math.log(ct.getOrElse(f, 0L) + 1.0) - math.log(cr(f) + 1.0) +
        math.log(r + b.toDouble) - math.log(t + b.toDouble)) * 1e6).toLong
    val expected = toks.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map(x => contrib(x._3)).sum
    }

    expected.foreach { case (id, w) =>
      assert(out(id)._1 == w, s"doc $id: got ${out(id)._1}, want $w")
    }
    assert(out(1L)._2 == 3L && out(3L)._2 == 3L, "n_toks counts occurrences")
    assert(out.forall { case (id, (w, _, flag)) => flag == (w > 0) })
  }

  test("importanceWeights: target-vocabulary docs score above off-target docs") {
    val out = Dsir.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en", buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) > out(3L) && out(2L) > out(4L),
      s"target-like docs must outrank: $out")
  }
}
