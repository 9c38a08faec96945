package graft.operators

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark spark query"),
    (2L, "spark table"),
    (3L, "window sort table")).toDF("id", "text")

  test("termWeights: exact tf, df, and smoothed idf") {
    val out = TfIdf.termWeights(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // 'spark': tf=2 in doc1, df=2 of N=3
    val (tf, dfq, w) = out((1L, "spark"))
    assert(tf == 2 && dfq == 2)
    val expected = 2.0 * (math.log(4.0 / 3.0) + 1.0)
    assert(math.abs(w - expected) < 1e-12)
    // 'window': tf=1, df=1 → idf higher than 'table' (df=2)
    assert(out((3L, "window"))._3 > out((3L, "table"))._3)
  }

  test("termWeights topK ranks by weight desc with term tie-break") {
    val top1 = TfIdf.termWeights(docs, "id", "text", topK = 1)
    assert(top1.count() == 3) // one per doc
    val d1 = top1.filter($"id" === 1).head()
    assert(d1.getAs[String]("term") == "spark") // tf=2 dominates
  }

  test("mllibPipeline produces reusable fixed-width feature vectors") {
    val (feat, model) = TfIdf.mllibPipeline(docs, "text", numFeatures = 64)
    assert(feat.columns.contains("features"))
    val v = feat.head().getAs[org.apache.spark.ml.linalg.Vector]("features")
    assert(v.size == 64)
    // fitted model applies to new data without refitting
    val more = Seq((9L, "spark again")).toDF("id", "text")
    assert(model.transform(more).count() == 1)
  }
}
