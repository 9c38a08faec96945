package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DbscanSpec extends SparkSpec {
  import spark.implicits._

  private def run(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int) =
    Dbscan.cluster(pts.toDF("id", "x", "y"), "id", "x", "y", eps, minPts)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toSeq

  /** O(n²) textbook replica with union-find over core-core edges. */
  private def replica(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int) = {
    def near(a: (Long, Long, Long), b: (Long, Long, Long)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) <= eps * eps
    val nbrs = pts.map(p => p._1 -> pts.count(q => near(p, q))).toMap // self incl.
    val core = pts.filter(p => nbrs(p._1) >= minPts).map(_._1).toSet
    val parent = scala.collection.mutable.Map(core.toSeq.map(i => i -> i): _*)
    def find(i: Long): Long =
      if (parent(i) == i) i else { val r = find(parent(i)); parent(i) = r; r }
    for (a <- pts if core(a._1); b <- pts if core(b._1) && a._1 < b._1
         if near(a, b)) {
      val (ra, rb) = (find(a._1), find(b._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(i => i -> {
      // component minimum
      val root = find(i)
      core.filter(j => find(j) == root).min
    }).toMap
    pts.map { p =>
      if (core(p._1)) (p._1, nbrs(p._1).toLong, "core", Some(label(p._1)))
      else {
        val coreNbr = pts.filter(q => core(q._1) && q._1 != p._1 && near(p, q))
        if (coreNbr.nonEmpty)
          (p._1, nbrs(p._1).toLong, "border", Some(coreNbr.map(q => label(q._1)).min))
        else (p._1, nbrs(p._1).toLong, "noise", None)
      }
    }
  }

  test("hand line: one 3-core cluster, a 2-point pair below minPts, a loner") {
    val pts = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L),
      (4L, 10L, 0L), (5L, 11L, 0L), (6L, 20L, 0L))
    val out = run(pts, eps = 2, minPts = 3)
    assert(out == Seq(
      (1L, 3L, "core", Some(1L)), (2L, 3L, "core", Some(1L)),
      (3L, 3L, "core", Some(1L)),
      (4L, 2L, "noise", None), (5L, 2L, "noise", None),
      (6L, 1L, "noise", None)))
  }

  test("borders attach to the minimum neighboring cluster label") {
    // two 4-core clusters and a bridge point within eps of a core on
    // each side but itself below minPts: border, label = min cluster
    val pts = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L), (4L, 3L, 0L),
      (10L, 7L, 0L), (11L, 8L, 0L), (12L, 9L, 0L), (13L, 10L, 0L),
      (20L, 5L, 0L))
    val out = run(pts, eps = 2, minPts = 4)
    val byId = out.map(r => r._1 -> r).toMap
    // endpoints (ids 1, 13) see only 3 points → borders of their cluster
    assert(byId(1L)._3 == "border" && byId(1L)._4.contains(2L))
    assert(byId(13L)._3 == "border" && byId(13L)._4.contains(10L))
    // the bridge sees cores of BOTH clusters → minimum label wins
    assert(byId(20L)._3 == "border" && byId(20L)._4.contains(2L))
    assert(byId(2L)._3 == "core" && byId(2L)._4.contains(2L))
    assert(byId(11L)._3 == "core" && byId(11L)._4.contains(10L))
    // the bridge is NOT core, so the two clusters stay separate
    assert(out.filter(_._3 == "core").flatMap(_._4).distinct.sorted == Seq(2L, 10L))
  }

  test("negative coordinates: pairs straddling the 0/-1 cell boundary are found") {
    // floor-division grid: (-1,0) is in cell -1, (1,0) in cell 0 —
    // truncating division would fold them; the pair must still meet
    val pts = Seq((1L, -1L, 0L), (2L, 1L, 0L), (3L, -2L, 1L))
    val out = run(pts, eps = 3, minPts = 3)
    // only id 1 sees all three; 2 and 3 are its borders — but the
    // (1,2) pair crosses cells -1 and 0, which truncating division
    // would have merged into a false shared cell (or missed entirely
    // on the probe side)
    assert(out.map(_._3).toSeq == Seq("core", "border", "border"))
    assert(out.forall(_._4.contains(1L)))
  }

  test("differential vs O(n²) union-find replica on hashed point clouds") {
    for ((n, eps, minPts, seed) <- Seq((60, 5L, 3, 1), (90, 8L, 5, 2),
      (40, 3L, 4, 3))) {
      val rnd = new scala.util.Random(seed)
      val pts = (1 to n).map(i =>
        (i.toLong, (rnd.nextInt(61) - 30).toLong, (rnd.nextInt(61) - 30).toLong))
      assert(run(pts, eps, minPts) == replica(pts, eps, minPts),
        s"mismatch at n=$n eps=$eps minPts=$minPts seed=$seed")
    }
  }

  test("coincident points: weighted collapse matches the point-level replica") {
    // heavy duplication — 70 points on 7 distinct coordinates plus a
    // sparse fringe; the multiplicity collapse must reproduce exact
    // per-point nbrs (self + coincident + in-range), core status from
    // weighted counts, and min-member-id cluster labels
    val dense = (1 to 70).map(i => (i.toLong, (i % 7).toLong * 2, 0L))
    val fringe = Seq((100L, 20L, 0L), (101L, 21L, 0L), (102L, 40L, 40L))
    val pts = dense ++ fringe
    assert(run(pts, eps = 2, minPts = 5) == replica(pts, eps = 2, minPts = 5))
    // a lone coincident stack below minPts stays noise; at minPts ≤
    // stack size it is core purely through its own weight
    val stack = (1 to 4).map(i => (i.toLong, 0L, 0L)) :+ (9L, 50L, 50L)
    assert(run(stack, eps = 1, minPts = 5) == replica(stack, eps = 1, minPts = 5))
    assert(run(stack, eps = 1, minPts = 4) == replica(stack, eps = 1, minPts = 4))
  }

  test("hot-cell density cap: sharded join is exact at every cap") {
    // one ε-cell holding many distinct coordinates — force sharding
    // with tiny caps and require bit-identical output vs the uncapped
    // run and the replica (every pair must still meet exactly once)
    val rnd = new scala.util.Random(11)
    val pts = (1 to 60).map(i =>
      (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val expected = replica(pts, eps = 6, minPts = 4)
    for (cap <- Seq(1, 2, 7)) {
      val out = Dbscan.cluster(pts.toDF("id", "x", "y"), "id", "x", "y",
          eps = 6, minPts = 4, hotCellCap = cap)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getString(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
      assert(out == expected, s"mismatch at hotCellCap=$cap")
    }
  }

  test("collapse and shard cap together: duplicated dense cloud, tiny cap") {
    // duplicates AND hot cells at once — both adaptive branches engage
    // in the same run and the result must still be the textbook one
    val rnd = new scala.util.Random(19)
    val pts = (1 to 80).map { i =>
      (i.toLong, (rnd.nextInt(12)).toLong, (rnd.nextInt(12)).toLong)
    } // 80 points on a 12×12 grid: many coincident, cells dense
    val expected = replica(pts, eps = 3, minPts = 4)
    val out = Dbscan.cluster(pts.toDF("id", "x", "y"), "id", "x", "y",
        eps = 3, minPts = 4, hotCellCap = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(out == expected)
  }

  test("partitioning invariance") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 80).map(i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val one = run(pts, 4, 4)
    val many = Dbscan.cluster(pts.toDF("id", "x", "y").repartition(13),
      "id", "x", "y", 4, 4).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(one == many)
  }
}
