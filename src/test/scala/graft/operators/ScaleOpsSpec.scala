package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange on the bucketed sides") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      val dims = (1 to 200).map(i => (i.toLong, s"n$i")).toDF("k", "name")
      ScaleOps.writeBucketed(facts, "graft_facts_b", Seq("k"), 8)
      ScaleOps.writeBucketed(dims, "graft_dims_b", Seq("k"), 8)
      val joined = spark.table("graft_facts_b").join(spark.table("graft_dims_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(joined.count() == 200)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }

  test("saltedSum equals plain aggregation on skewed data") {
    // hot key: 10k rows on one key, a few on others
    val rows = (1 to 10000).map(_ => ("hot", 1.0)) ++
      (1 to 50).map(i => (s"k${i % 5}", 2.0))
    val df = rows.toDF("k", "v")
    val salted = ScaleOps.saltedSum(df, "k", "v", saltBuckets = 16)
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val plain = df.groupBy("k").agg(sum("v"), count(lit(1)))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("canonicalize: transitive closure assigns min id per component") {
    // components: {1,2,3,4} (chain), {10,11}, singleton pairs absent
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val canon = ScaleOps.canonicalize(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("canonicalize: pointer doubling converges a 64-chain in O(log n) rounds") {
    // a 64-node chain has diameter 63 — plain neighbor propagation
    // needs ~63 rounds (it would blow the default 20-round bound);
    // pointer doubling must land it in ~log2(64)+slack
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val canon = ScaleOps.canonicalize(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon.size == 64 && canon.values.forall(_ == 0L))
    assert(ScaleOps.lastCanonicalizeRounds <= 10,
      s"took ${ScaleOps.lastCanonicalizeRounds} rounds — doubling regressed")
  }

  test("canonicalize: randomized graphs match a driver union-find reference") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val nodes = 120
      val edges = (0 until 150).map { _ =>
        val a = rnd.nextInt(nodes).toLong
        val b = rnd.nextInt(nodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val got = ScaleOps.canonicalize(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver reference: plain union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val members = edges.flatMap(p => Seq(p._1, p._2)).distinct
      val expect = members
        .groupBy(find).flatMap { case (_, ms) => ms.map(_ -> ms.min) }.toMap
      assert(got == expect, s"seed=$seed")
    }
  }

  test("dropDuplicateRows keeps one survivor per near-dup cluster") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (10L, "b"), (11L, "b"), (20L, "c"))
      .toDF("id", "text")
    val pairs = Dedup.minhashCandidates(
      docs.withColumn("text", concat_ws(" ",
        (1 to 10).map(i => concat(col("text"), lit(i.toString))): _*)),
      "id", "text")
    val kept = ScaleOps.dropDuplicateRows(docs, "id", pairs)
      .select("id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(10L) && kept.contains(20L))
    assert(!kept.contains(2L) && !kept.contains(3L) && !kept.contains(11L))
  }
}
