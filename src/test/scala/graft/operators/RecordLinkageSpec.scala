package graft.operators

import graft.SparkSpec

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    (1L, "alice", 10, "A"),
    (2L, "alicx", 10, "A"),   // dist 1, both fields agree → 30+15+15 = 60
    (3L, "alicx", 99, "B"),   // dist 1 to alice, fields differ → 30
    (4L, "alice", 10, "A"),   // exact dup of 1 → 50+15+15 = 80
    (5L, "zz", 1, "C"))
    .toDF("id", "name", "nation", "seg")

  private def run(threshold: Int) =
    RecordLinkage.link(people, "id", "name",
      Seq("nation" -> 15, "seg" -> 15), Seq(50, 30, 20), threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3))).toMap

  test("link: weighted integer scores across name distance and exact fields") {
    val out = run(threshold = 45)
    assert(out((1L, 4L)) == (0, 80), "exact duplicate scores max")
    assert(out((1L, 2L)) == (1, 60))
    assert(out((2L, 4L)) == (1, 60))
    assert(!out.contains((1L, 3L)), "agreeing name alone must miss 45")
    // 2 vs 3: same name (dist 0 → 50) but fields differ → exactly 50
    assert(out((2L, 3L)) == (0, 50))
    assert(!out.keySet.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("link: threshold slices the same deterministic score surface") {
    val strict = run(threshold = 61)
    assert(strict.keySet == Set((1L, 4L)))
    val loose = run(threshold = 30)
    assert(loose.contains((1L, 3L)) && loose((1L, 3L)) == (1, 30))
  }
}
