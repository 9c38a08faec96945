package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate like their Column twins") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_clean_id('gid://shopify/Order/42', 'R-') AS id,
        |  graft_norm_key('  wid-1 ') AS sku,
        |  graft_py_str(true) AS b,
        |  graft_token_count('a b  c') AS n,
        |  graft_fingerprint(' x ') AS fp,
        |  long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dot,
        |  graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos
        |""".stripMargin).head()
    assert(r.getAs[String]("id") == "R-42")
    assert(r.getAs[String]("sku") == "WID-1")
    assert(r.getAs[String]("b") == "True")
    assert(r.getAs[Int]("n") == 3)
    assert(r.getAs[String]("fp") == org.apache.commons.codec.digest.DigestUtils.md5Hex("x"))
    assert(r.getAs[Long]("dot") == 32L)
    assert(r.getAs[Double]("cos") == 1.0)
    val r2 = spark.sql(
      """SELECT graft_domain('https://spam.example/x/y') AS d,
        |  graft_quality_score('the quick brown fox and the lazy dog of june') AS q
        |""".stripMargin).head()
    assert(r2.getAs[String]("d") == "spam.example")
    assert(r2.getAs[Double]("q") > 0.0 && r2.getAs[Double]("q") <= 1.0)
  }

  test("extensions class wires the same registry at session build") {
    val ext = new GraftExtensions()
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(exts) // must not throw; builder list is non-empty
    assert(GraftExtensions.all.size >= 14)
  }

  test("compiled shingle/minhash expressions work from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_word_shingles('a b c d', 3) AS sh,
        |  graft_minhash_signature(graft_word_shingles('a b c d', 2), 4) AS sig,
        |  graft_simhash32('a b c') AS sim
        |""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getSeq[Long](1).length == 4)
    assert(r.getLong(2) >= 0 && r.getLong(2) < (1L << 32))
    // non-literal k is rejected with a clear message
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles('a b c', cast(rand()*3 AS INT))").head()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("deletion-neighborhood keys work from SQL at both radii") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_deletion_neighborhood('abc') AS d1,
        |       graft_deletion_neighborhood('abc', 2) AS d2""".stripMargin).head()
    assert(r.getSeq[String](0).toSet == Set("abc", "bc", "ac", "ab"))
    assert(r.getSeq[String](1).toSet ==
      Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    // a non-literal radius is rejected with the same clear message as
    // every other literal-argument function, not an unbound-attribute
    // crash at eval time
    val e = intercept[Exception] {
      spark.sql("SELECT graft_deletion_neighborhood('abc', cast(rand()*2 AS INT))").head()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("SQL minhash-ish pipeline runs end-to-end through the registry") {
    GraftExtensions.register(spark)
    Seq((1L, "spark table scan join"), (2L, "spark table scan join"),
      (3L, "totally different words here")).toDF("id", "text")
      .createOrReplaceTempView("docs")
    val groups = spark.sql(
      """SELECT graft_fingerprint(text) AS fp, count(*) AS n, min(id) AS canon
        |FROM docs GROUP BY 1 ORDER BY n DESC""".stripMargin).collect()
    assert(groups.head.getAs[Long]("n") == 2)
    assert(groups.head.getAs[Long]("canon") == 1L)
  }

  test("hygiene functions work from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_nfc('café') AS nfc, " +
        "graft_clean_text('  a​  b\r\n\r\n\r\nc ') AS ct, " +
        "graft_strip_html('<p>x &amp; y</p>') AS sh").head()
    assert(r.getAs[String]("nfc") == "caf\u00e9")
    assert(r.getAs[String]("ct") == "a b\n\nc")
    assert(r.getAs[String]("sh") == " x & y ")
  }
}
