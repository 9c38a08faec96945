package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (nation, segment, balance, name): nation 1 / seg A is a 4-row
  // class but only 2 distinct balances; nation 2 / seg B is a
  // 5-row diverse class; nation 3 / seg C is a singleton.
  private lazy val rows = Seq(
    (1, "A", 100.0), (1, "A", 100.0), (1, "A", 200.0), (1, "A", 200.0),
    (2, "B", 10.0), (2, "B", 20.0), (2, "B", 30.0), (2, "B", 40.0), (2, "B", 50.0),
    (3, "C", 999.0)
  ).toDF("nat", "seg", "bal")

  test("classes: one row per QID combination with size and diversity") {
    val out = Privacy.classes(rows, Seq("nat", "seg"), Some("bal"))
      .orderBy("nat").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1, 4L, 2L), (2, 5L, 5L), (3, 1L, 1L)))
  }

  test("riskClasses: flags small AND homogeneous classes") {
    val out = Privacy.riskClasses(rows, Seq("nat", "seg"), k = 5,
      sensitive = Some("bal"), l = 3).orderBy("nat").collect()
    // nation 1: size 4 < 5 AND l 2 < 3; nation 3: singleton; nation 2 passes
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 3))
  }

  test("riskClasses without sensitive column checks k only") {
    val out = Privacy.riskClasses(rows, Seq("nat", "seg"), k = 5)
      .orderBy("nat").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 3))
    assert(!out.head.schema.fieldNames.contains("l_distinct"))
  }

  test("NULL QIDs form their own class instead of hiding") {
    val withNull = rows.union(Seq((0, null: String, 7.0), (0, null: String, 8.0))
      .toDF("nat", "seg", "bal"))
    val cls = Privacy.classes(withNull, Seq("nat", "seg"), Some("bal"))
      .filter(col("nat") === 0).collect()
    assert(cls.length == 1 && cls.head.getLong(2) == 2L)
  }

  test("band: fixed-width banding floors negatives consistently") {
    val banded = Seq(-999.99, -0.01, 0.0, 999.99, 1000.0, 2500.0)
      .toDF("v").select(Privacy.band(col("v"), 1000L).as("b"))
      .collect().map(_.getLong(0))
    assert(banded.toSeq == Seq(-1000L, -1000L, 0L, 0L, 1000L, 2000L))
  }

  test("generalizationLadder: monotone min-class profile, first achieving width is minimal") {
    // bal values 0..9: width 1 -> singletons; width 5 -> two classes
    // of 5; width 10 -> one class of 10 (single nation)
    val rows = (0 until 10).map(i => (1, i.toDouble)).toDF("nat", "bal")
    val out = Privacy.generalizationLadder(rows, Seq("nat"), "bal",
      widths = Seq(1L, 5L, 10L), k = 5).orderBy("width").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq ==
      Seq((1L, 10L, 1L, false), (5L, 2L, 5L, true), (10L, 1L, 10L, true)))
  }

  test("summary: headline gate numbers") {
    val s = Privacy.summary(rows, Seq("nat", "seg"), k = 5, "bal", l = 3).collect().head
    assert(s.getLong(0) == 1L) // achieved k = the singleton
    assert(s.getLong(1) == 1L) // achieved l
    assert(s.getLong(2) == 2L) // risk classes
    assert(s.getLong(3) == 5L) // rows they cover (4 + 1)
  }

  test("tCloseness: hand-computed EMD — concentrated classes score 1/2, matching class 0") {
    // global values {1, 2} at 50/50; class A all-1s, class B all-2s:
    // EMD = (|0.5| + |0|) / (m-1) = 0.5 -> 500000 ppm for both.
    val polar = Seq((1, 1L), (1, 1L), (2, 2L), (2, 2L)).toDF("nat", "v")
    val outP = Privacy.tCloseness(polar, Seq("nat"), "v")
      .orderBy("nat").collect()
    assert(outP.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1, 2L, 500000L), (2, 2L, 500000L)))
    // a class whose distribution equals the global one scores exactly 0
    val mixed = Seq((1, 1L), (1, 2L), (2, 1L), (2, 2L)).toDF("nat", "v")
    assert(Privacy.tCloseness(mixed, Seq("nat"), "v")
      .collect().forall(_.getLong(2) == 0L))
  }

  test("tCloseness: three-value skew, single-valued table, NULL exclusion") {
    // global (1/3, 1/3, 1/3); end classes (1,0,0)/(0,0,1): cum diffs
    // 2/3, 1/3, 0 -> 1 -> /2 = 0.5. The MIDDLE class (0,1,0) is
    // genuinely closer under the ordered metric: 1/3, 2/3... no —
    // cum diffs -1/3, +1/3, 0 -> 2/3 -> /2 = 1/3 -> 333333 ppm.
    val tri = Seq((1, 10L), (2, 20L), (3, 30L)).toDF("nat", "v")
    val a = Privacy.tCloseness(tri, Seq("nat"), "v")
      .orderBy("nat").collect()
    assert(a.map(_.getLong(2)).toSeq == Seq(500000L, 333333L, 500000L))
    // m = 1: every class scores 0 by definition
    val mono = Seq((1, 5L), (2, 5L)).toDF("nat", "v")
    assert(Privacy.tCloseness(mono, Seq("nat"), "v")
      .collect().forall(_.getLong(2) == 0L))
    // NULL sensitive rows are excluded, not a phantom value
    val withNull = Seq((1, Some(1L)), (1, None), (2, Some(2L)))
      .toDF("nat", "v")
    val n = Privacy.tCloseness(withNull, Seq("nat"), "v")
      .orderBy("nat").collect()
    assert(n.map(_.getLong(1)).toSeq == Seq(1L, 1L)) // class sizes exclude NULL
  }

  test("tCloseness: emd is invariant to input partitioning") {
    val rows = (0 until 64).map(i => (i % 4, (i * 7) % 5L)).toDF("nat", "v")
    val one = Privacy.tCloseness(rows.repartition(1), Seq("nat"), "v")
      .orderBy("nat").collect().toSeq
    val many = Privacy.tCloseness(rows.repartition(13), Seq("nat"), "v")
      .orderBy("nat").collect().toSeq
    assert(one == many)
  }

  // ------------------------------------------------- randomized response

  /** Scala replica of the portable md5 coin. */
  private def h32(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
      16)

  test("randomizedResponse: keep-all coin recovers exact counts") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "a"), (5L, "c"))
      .toDF("id", "cat")
    // keepNum = 2^32: every row keeps its true category and the
    // estimator collapses to c·1000 exactly
    val out = Privacy.randomizedResponse(df, "cat", "id",
      keepNum = 4294967296L).orderBy("category").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ==
      Seq(("a", 3L, 3L, 3000L), ("b", 1L, 1L, 1000L), ("c", 1L, 1L, 1000L)))
  }

  test("randomizedResponse: mechanism replays the md5 coin bit-for-bit") {
    val ids = (1L to 40L).toSeq
    val df = ids.map(i => (i, if (i % 3 == 0) "x" else "y")).toDF("id", "cat")
    val keepNum = 2000000000L
    val cats = Seq("x", "y")
    // driver-side replay of the exact mechanism
    val reported = ids.map { i =>
      val trueCat = if (i % 3 == 0) "x" else "y"
      if (h32(s"91:$i") < keepNum) trueCat
      else cats((h32(s"92:$i") % 2).toInt)
    }
    val expRep = reported.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = Privacy.randomizedResponse(df, "cat", "id", keepNum = keepNum)
      .orderBy("category").collect()
    assert(out.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      cats.map(c => (c, expRep.getOrElse(c, 0L))))
    // estimator replay: max(0, c·B·k − n·(B−T))·1000 div (T·k)
    val B = BigInt(4294967296L)
    out.foreach { r =>
      val c = BigInt(r.getLong(2))
      val exp = ((c * B * 2 - BigInt(40) * (B - BigInt(keepNum)))
        .max(BigInt(0)) * 1000) / (BigInt(keepNum) * 2)
      assert(r.getLong(3) == exp.toLong, s"estimator mismatch on ${r.getString(0)}")
    }
  }

  test("randomizedResponse: nulls excluded, absent categories read zero spine rows") {
    val df = Seq((1L, "a"), (2L, null), (3L, "b")).toDF("id", "cat")
    val out = Privacy.randomizedResponse(df, "cat", "id",
      keepNum = 4294967296L).collect()
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    assert(out.map(_.getLong(1)).sum == 2L) // null row never counted
  }

  test("randomizedResponse: category-spine cap fails loudly") {
    val big = (1L to (Privacy.MaxRrCategories + 1).toLong)
      .map(i => (i, s"cat$i")).toDF("id", "cat")
    val e = intercept[IllegalArgumentException] {
      Privacy.randomizedResponse(big, "cat", "id")
    }
    assert(e.getMessage.contains("control-plane"))
  }
}
