package graft.sources

import java.nio.file.Files
import graft.SparkSpec

/** S8 end-to-end against the Derby embedded driver that ships with
  * Spark: real JDBC writes, real readback — not just option plumbing. */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url = {
    val dir = Files.createTempDirectory("jdbc").resolve("db")
    s"jdbc:derby:$dir;create=true"
  }

  test("append mode batches rows into the table; reread matches") {
    val df = (1 to 57).map(i => (i, s"name$i", i * 1.5)).toDF("id", "name", "v")
    // batchSize smaller than the row count → several flushes per partition
    JdbcSink.writeJdbc(df, url, "t_orders", batchSize = 10, numPartitions = 2)
    val back = JdbcSink.readJdbc(spark, url, "t_orders")
    assert(back.count() == 57)
    assert(back.columns.map(_.toLowerCase).toSet == Set("id", "name", "v"))
    assert(back.filter($"id" === 7).select("name").as[String].head() == "name7")
    // append again → rows accumulate (the reference's if_exists="append")
    JdbcSink.writeJdbc(df.filter($"id" <= 3), url, "t_orders", batchSize = 5000)
    assert(JdbcSink.readJdbc(spark, url, "t_orders").count() == 60)
  }

  test("overwrite mode replaces the table") {
    val df = (1 to 5).map(i => (i, s"a$i")).toDF("id", "s")
    JdbcSink.writeJdbc(df, url, "t_dim", batchSize = 2)
    JdbcSink.writeJdbc((6 to 8).map(i => (i, s"b$i")).toDF("id", "s"),
      url, "t_dim", mode = "overwrite")
    val back = JdbcSink.readJdbc(spark, url, "t_dim")
    assert(back.select("id").as[Int].collect().toSet == Set(6, 7, 8))
  }

  test("invalid batch size is rejected before touching the database") {
    intercept[IllegalArgumentException] {
      JdbcSink.writeJdbc(Seq((1, "x")).toDF("id", "s"), url, "t_bad", batchSize = 0)
    }
  }
}
