package graft.operators

import graft.SparkSpec

class FeatureSelectSpec extends SparkSpec {
  import spark.implicits._

  test("chi2TopTokens: hand-computed 2x2 table on a separating token") {
    // 4 docs: "pos" docs contain 'happy', "neg" docs contain 'sad';
    // 'the' appears everywhere (chi2 = 0), hapax 'rare' df=1 pruned
    val docs = Seq(
      (1L, "the happy day rare", "pos"),
      (2L, "the happy morning", "pos"),
      (3L, "the sad day", "neg"),
      (4L, "the sad night", "neg")).toDF("id", "text", "label")
    val out = FeatureSelect.chi2TopTokens(docs, "id", "text", "label",
      k = 3, minDf = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))

    // 'happy' vs pos: a=2 b=0 c=0 d=2, N=4 → chi2 = 4·(4)²/(2·2·2·2) = 4.0
    val posTop = out.filter(_._1 == "pos").head
    assert(posTop._3 == "happy" && posTop._4 == 4000L)
    val negTop = out.filter(_._1 == "neg").head
    assert(negTop._3 == "sad" && negTop._4 == 4000L)
    // 'the' is present in every doc → excluded by the t < N guard
    assert(!out.exists(_._3 == "the"))
    // 'rare' has df 1 < minDf → pruned
    assert(!out.exists(_._3 == "rare"))
    // 'day' appears once per class: a=1 b=1 c=1 d=1 → chi2 = 0
    assert(out.filter(_._1 == "pos").exists(t => t._3 == "day" && t._4 == 0L))
  }

  test("chi2TopTokens: repeated tokens count once per doc (presence, not frequency)") {
    val docs = Seq(
      (1L, "spam spam spam spam", "a"),
      (2L, "spam ham", "a"),
      (3L, "ham ham", "b"),
      (4L, "ham eggs", "b")).toDF("id", "text", "label")
    val out = FeatureSelect.chi2TopTokens(docs, "id", "text", "label",
      k = 5, minDf = 2).collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(4), r.getLong(5)))
    // spam: df 2 (both label a) despite 5 occurrences
    assert(out.exists { case (l, t, a, df) => l == "a" && t == "spam" && a == 2 && df == 2 })
    // ham: present in 3 docs total, 1 of label a
    assert(out.exists { case (l, t, a, df) => l == "a" && t == "ham" && a == 1 && df == 3 })
  }

  test("chi2TopTokens: rank ties break by token; ranks are 1..k") {
    val docs = Seq(
      (1L, "aa bb", "x"), (2L, "aa bb", "x"),
      (3L, "cc dd", "y"), (4L, "cc dd", "y")).toDF("id", "text", "label")
    val out = FeatureSelect.chi2TopTokens(docs, "id", "text", "label",
      k = 4, minDf = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // only tokens PRESENT under a label are candidate features (a >= 1):
    // label x sees aa/bb (tied chi2, alphabetical), never cc/dd
    assert(out.filter(_._1 == "x").map(_._3).toSeq == Seq("aa", "bb"))
    assert(out.filter(_._1 == "x").map(_._2).toSeq == Seq(1L, 2L))
    assert(out.filter(_._1 == "y").map(_._3).toSeq == Seq("cc", "dd"))
  }
}
