package graft.operators

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val fact = Seq(
    (1L, "hot"), (2L, "hot"), (3L, "hot"), (4L, "hot"), (5L, "hot"),
    (6L, "cold"), (7L, "warm")
  ).toDF("id", "key")
  private val dim = Seq(("hot", 100), ("cold", 200), ("warm", 300))
    .toDF("key", "attr")

  test("salted join is row-identical to the plain join") {
    val plain = fact.join(dim, Seq("key"))
      .select($"id", $"key", $"attr").as[(Long, String, Int)].collect().sorted
    val salted = SkewJoin.saltedEquiJoin(fact, dim, "key", "id", saltFactor = 4)
      .select($"id", $"key", $"attr").as[(Long, String, Int)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("hot key actually spreads across multiple salts") {
    val salts = fact.withColumn("__salt",
      org.apache.spark.sql.functions.pmod(
        graft.functions.TextFunctions.portableHash(
          $"id".cast("string"), 0),
        org.apache.spark.sql.functions.lit(4)))
      .filter($"key" === "hot")
      .select("__salt").distinct().count()
    assert(salts >= 2, s"5 hot rows landed on $salts salt(s)")
  }

  test("inner-join semantics: unmatched fact keys drop") {
    val dimNoWarm = dim.filter($"key" =!= "warm")
    val out = SkewJoin.saltedEquiJoin(fact, dimNoWarm, "key", "id", 4)
    assert(out.filter($"key" === "warm").count() == 0)
    assert(out.count() == 6)
  }
}
