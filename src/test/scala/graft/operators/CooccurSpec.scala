package graft.operators

import graft.SparkSpec

class CooccurSpec extends SparkSpec {
  import spark.implicits._

  test("pmiPairs: window-2 ordered pairs with exact counts and marginals") {
    val docs = Seq("a b c", "a b").toDF("text")
    // doc1 pairs: (a,b) (a,c) (b,c); doc2: (a,b)
    val out = Cooccur.pmiPairs(docs, "text", window = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val (cab, ca, cb, pmiQ) = out(("a", "b"))
    assert(cab == 2 && ca == 3 && cb == 2)
    val expected = math.floor((math.log(2.0) - math.log(3.0) -
      math.log(2.0) + math.log(4.0)) * 1e6).toLong
    assert(pmiQ == expected)
    // (b,c): cab=1, ca(b·)=1, cb(·c)=2
    assert(out(("b", "c"))._1 == 1 && out(("b", "c"))._2 == 1 && out(("b", "c"))._3 == 2)
  }

  test("pmiPairs: window-1 restricts to adjacent pairs; topK + tie order") {
    val docs = Seq("x y z", "x y").toDF("text")
    val rows = Cooccur.pmiPairs(docs, "text", window = 1, topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // pairs: (x,y)×2, (y,z)×1 — no (x,z) at window 1
    assert(rows.toSeq == Seq(("x", "y", 2L), ("y", "z", 1L)))
  }

  test("pmiPairs: single-token and empty docs contribute nothing") {
    val docs = Seq("solo", "", "p q").toDF("text")
    val rows = Cooccur.pmiPairs(docs, "text", window = 2, topK = 10).collect()
    assert(rows.length == 1 && rows.head.getString(0) == "p")
  }
}
