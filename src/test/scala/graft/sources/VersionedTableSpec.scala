package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("vt").resolve("t").toString

  test("write/read roundtrip, versions advance, time travel works") {
    val path = tmpTable()
    assert(VersionedTable.read(spark, path).isEmpty)
    assert(VersionedTable.write(Seq(1, 2).toDF("x"), path) == 1L)
    assert(VersionedTable.write(Seq(3).toDF("x"), path) == 2L)
    assert(VersionedTable.write(Seq(4, 5, 6).toDF("x"), path) == 3L)
    assert(VersionedTable.currentVersion(spark, path).contains(3L))
    assert(VersionedTable.read(spark, path).get
      .as[Int].collect().sorted.toSeq == Seq(4, 5, 6))
    assert(VersionedTable.readVersion(spark, path, 2L).get
      .as[Int].collect().toSeq == Seq(3))
  }

  test("retention prunes beyond keepVersions, current survives") {
    val path = tmpTable()
    for (i <- 1 to 5)
      VersionedTable.write(Seq(i).toDF("x"), path, keepVersions = 2)
    assert(VersionedTable.versions(spark, path) == Seq(4L, 5L))
    assert(VersionedTable.readVersion(spark, path, 1L).isEmpty) // pruned
    assert(VersionedTable.read(spark, path).get.as[Int].head() == 5)
  }

  test("missing pointer recovers to the newest landed version") {
    val path = tmpTable()
    VersionedTable.write(Seq(1).toDF("x"), path)
    VersionedTable.write(Seq(2).toDF("x"), path)
    // simulate a crash between pointer delete and rename
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, "_CURRENT"), false)
    assert(VersionedTable.currentVersion(spark, path).contains(2L))
    assert(VersionedTable.read(spark, path).get.as[Int].head() == 2)
    // the next write repairs the pointer
    assert(VersionedTable.write(Seq(3).toDF("x"), path) == 3L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "_CURRENT")))
  }

  test("a stale orphan version dir from a crashed write is replaced") {
    val path = tmpTable()
    VersionedTable.write(Seq(1).toDF("x"), path)
    // land an orphan v2 with no commit (simulated crash after rename)
    val table = new org.apache.hadoop.fs.Path(path)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(99).toDF("x").write.parquet(s"$path/_versions/v00000002")
    // pointer still says v1, so reads serve v1
    assert(VersionedTable.read(spark, path).get.as[Int].head() == 1)
    // next write claims v2 (pointer + 1), replacing the orphan
    assert(VersionedTable.write(Seq(2).toDF("x"), path) == 2L)
    assert(VersionedTable.read(spark, path).get.as[Int].head() == 2)
  }

  test("partitioned snapshots retain their layout") {
    val path = tmpTable()
    VersionedTable.write(
      Seq((1, "a"), (2, "b")).toDF("x", "p"), path, partitionBy = Seq("p"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      path, "_versions/v00000001/p=a")))
    assert(VersionedTable.read(spark, path).get.count() == 2)
  }

  test("compact: small files collapse, rows identical, old version travels") {
    val path = tmpTable()
    val df = (1 to 2000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    val v1 = VersionedTable.write(df.repartition(64), path)
    assert(VersionedTable.fileCount(spark, path, v1) == 64)
    val v2 = VersionedTable.compact(spark, path, targetBytes = 1L << 30)
    assert(v2.contains(v1 + 1))
    assert(VersionedTable.fileCount(spark, path, v2.get) == 1)
    val now = VersionedTable.read(spark, path).get
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(now == (1 to 2000).map(i => (i.toLong, s"row$i")))
    // pre-compaction snapshot still reachable until retention drops it
    assert(VersionedTable.readVersion(spark, path, v1).get.count() == 2000)
  }

  test("schema evolves freely across versions; time travel keeps old schemas") {
    val path = tmpTable()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), path)
    // v2 adds a column and drops nothing — full-snapshot versioning
    // makes evolution trivially safe: no mixed-schema file soup
    VersionedTable.write(Seq((1L, "a", 0.5)).toDF("id", "s", "score"), path)
    assert(VersionedTable.read(spark, path).get.columns.toSeq ==
      Seq("id", "s", "score"))
    assert(VersionedTable.readVersion(spark, path, 1L).get.columns.toSeq ==
      Seq("id", "s"))
  }

  test("compact is a no-op when the table already meets the target") {
    val path = tmpTable()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s").repartition(1), path)
    assert(VersionedTable.compact(spark, path).isEmpty)
    assert(VersionedTable.currentVersion(spark, path).contains(1L))
  }

  test("pin: a pinned snapshot reads the SAME rows across a concurrent commit") {
    val path = tmpTable()
    VersionedTable.write(Seq((1L, "old")).toDF("id", "s"), path)
    val pinned = VersionedTable.pin(spark, path).get
    assert(pinned.version == 1L)
    // writer swaps underneath the pin
    VersionedTable.write(Seq((1L, "new"), (2L, "new")).toDF("id", "s"), path)
    // unpinned readers see the new world...
    assert(VersionedTable.read(spark, path).get.count() == 2)
    // ...the pin still reads exactly its version (immutability +
    // resolve-once: snapshot isolation without a transaction log)
    assert(pinned.df.as[(Long, String)].collect().toSeq == Seq((1L, "old")))
  }

  test("writeIf: stale expected version conflicts loudly, fresh one commits") {
    val path = tmpTable()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), path)
    val pin = VersionedTable.pin(spark, path).get
    // another writer commits first
    VersionedTable.write(Seq((1L, "b")).toDF("id", "s"), path)
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.writeIf(Seq((1L, "lost")).toDF("id", "s"), path,
        expected = Some(pin.version))
    }
    // the losing write must NOT have clobbered the winner
    assert(VersionedTable.read(spark, path).get
      .as[(Long, String)].collect().toSeq == Seq((1L, "b")))
    // re-pin → retry succeeds
    val pin2 = VersionedTable.pin(spark, path).get
    val v = VersionedTable.writeIf(Seq((1L, "c")).toDF("id", "s"), path,
      expected = Some(pin2.version))
    assert(v == pin2.version + 1)
  }

  test("writeIf: expected=None creates a fresh table, conflicts if one exists") {
    val path = tmpTable()
    val v = VersionedTable.writeIf(Seq((1L, "a")).toDF("id", "s"), path,
      expected = None)
    assert(v == 1L)
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.writeIf(Seq((2L, "b")).toDF("id", "s"), path,
        expected = None)
    }
  }
}
