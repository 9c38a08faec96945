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
}
