package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private def mkVecs(n: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, Seq.fill(dims)(rnd.nextFloat() * 2 - 1)))
  }
  private def quant(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1000000.0).toLong).toArray

  test("train is deterministic and validates its geometry") {
    val df = mkVecs(64, 5).toDF("vec_id", "embedding")
    val a = Pq.train(df, "vec_id", "embedding", m = 2, k = 4, dims = dims)
    val b = Pq.train(df, "vec_id", "embedding", m = 2, k = 4, dims = dims)
    assert(a.cents.flatten.flatten.toSeq == b.cents.flatten.flatten.toSeq)
    assert(a.dsub == 4)
    intercept[IllegalArgumentException] {
      Pq.train(df, "vec_id", "embedding", m = 3, k = 4, dims = dims)
    }
    intercept[IllegalArgumentException] {
      Pq.train(df.limit(2), "vec_id", "embedding", m = 2, k = 4, dims = dims)
    }
  }

  test("encode ≡ brute-force per-subspace argmin (ties to lower code)") {
    val rows = mkVecs(80, 11)
    val df = rows.toDF("vec_id", "embedding")
    val cb = Pq.train(df, "vec_id", "embedding", m = 2, k = 4, dims = dims)
    val got = Pq.encode(df, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    rows.foreach { case (id, v) =>
      val qv = quant(v)
      val want = (0 until cb.m).map { s =>
        (0 until cb.k).minBy { c =>
          val cent = cb.cents(s)(c)
          ((0 until cb.dsub).map { j =>
            val t = qv(s * cb.dsub + j) - cent(j); t * t
          }.sum, c) // strict < fold == minBy (dist, code)
        }
      }
      assert(got(id) == want, s"vec $id")
    }
  }

  test("adcTopK ≡ scala ADC reference; ties rank by vec_id") {
    val rows = mkVecs(60, 23)
    val df = rows.toDF("vec_id", "embedding")
    val cb = Pq.train(df, "vec_id", "embedding", m = 2, k = 4, dims = dims)
    val codes = Pq.encode(df, "vec_id", "embedding", cb)
    val queries = df.filter(col("vec_id") <= 3)
    val got = Pq.adcTopK(queries, codes, "vec_id", "embedding", cb, k = 5)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap

    val codeMap = codes.as[(Long, Seq[Int])].collect().toMap
    rows.filter(_._1 <= 3).foreach { case (qid, qvF) =>
      val qq = quant(qvF)
      val dists = rows.map { case (cid, _) =>
        val d = (0 until cb.m).map { s =>
          val cent = cb.cents(s)(codeMap(cid)(s))
          (0 until cb.dsub).map { j =>
            val t = qq(s * cb.dsub + j) - cent(j); t * t
          }.sum
        }.sum
        (cid, d)
      }
      val want = dists.sortBy { case (cid, d) => (d, cid) }.take(5).toSeq
      assert(got(qid) == want, s"query $qid")
    }
  }

  test("recallVsExact ≡ scala reference intersection; query with 0 hits kept") {
    val rows = mkVecs(50, 47)
    val df = rows.toDF("vec_id", "embedding")
    val cb = Pq.train(df, "vec_id", "embedding", m = 2, k = 4, dims = dims)
    val k = 5
    val got = Pq.recallVsExact(df.filter(col("vec_id") <= 3), df,
        "vec_id", "embedding", cb, k)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // scala reference
    val codes = Pq.encode(df, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    rows.filter(_._1 <= 3).foreach { case (qid, qvF) =>
      val qq = quant(qvF)
      def exactD(v: Seq[Float]) = {
        val cv = quant(v)
        (0 until dims).map { j => val t = qq(j) - cv(j); t * t }.sum
      }
      val exactTop = rows.map { case (cid, v) => (cid, exactD(v)) }
        .sortBy { case (cid, d) => (d, cid) }.take(k).map(_._1).toSet
      val adcTop = rows.map { case (cid, _) =>
        val d = (0 until cb.m).map { s =>
          val cent = cb.cents(s)(codes(cid)(s))
          (0 until cb.dsub).map { j =>
            val t = qq(s * cb.dsub + j) - cent(j); t * t
          }.sum
        }.sum
        (cid, d)
      }.sortBy { case (cid, d) => (d, cid) }.take(k).map(_._1).toSet
      val hits = exactTop.intersect(adcTop).size.toLong
      assert(got(qid) == ((hits, 1000000L * hits / k)), s"query $qid")
    }
    assert(got.keySet == Set(1L, 2L, 3L)) // every query row present
  }

  test("ivfPqTopK ≡ scala reference: probe pruning + ADC within probed cells") {
    val rows = mkVecs(60, 61)
    val df = rows.toDF("vec_id", "embedding")
    val cb = Pq.train(df, "vec_id", "embedding", m = 2, k = 4, dims = dims)
    // coarse cells: 4 hand-planted centroids in quantized coords
    val cells = Array(
      Array.fill(dims)(-500000L), Array.fill(dims)(0L),
      Array.fill(dims)(500000L), Array.fill(dims)(900000L))
    val nProbe = 2; val k = 4
    val got = Pq.ivfPqTopK(df.filter(col("vec_id") <= 2), df,
        "vec_id", "embedding", cells, cb, nProbe, k)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap

    def cellOf(qv: Array[Long]): Int =
      cells.indices.minBy { c =>
        (qv.indices.map { j => val t = qv(j) - cells(c)(j); t * t }.sum, c)
      }
    val codes = Pq.encode(df, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    val asn = rows.map { case (id, v) => id -> cellOf(quant(v)) }.toMap
    rows.filter(_._1 <= 2).foreach { case (qid, qvF) =>
      val qq = quant(qvF)
      val probed = cells.indices.sortBy { c =>
        (qq.indices.map { j => val t = qq(j) - cells(c)(j); t * t }.sum, c)
      }.take(nProbe).toSet
      val want = rows.collect { case (cid, _) if probed(asn(cid)) =>
        val d = (0 until cb.m).map { s =>
          val cent = cb.cents(s)(codes(cid)(s))
          (0 until cb.dsub).map { j =>
            val t = qq(s * cb.dsub + j) - cent(j); t * t
          }.sum
        }.sum
        (cid, d)
      }.sortBy { case (cid, d) => (d, cid) }.take(k).toSeq
      assert(got(qid) == want, s"query $qid")
    }
  }

  test("encode is a zero-shuffle projection; results partition-invariant") {
    val df = mkVecs(100, 31).toDF("vec_id", "embedding")
    val cb = Pq.train(df, "vec_id", "embedding", m = 4, k = 4, dims = dims)
    val plan = Pq.encode(df, "vec_id", "embedding", cb)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"))
    val a = Pq.encode(df, "vec_id", "embedding", cb)
      .collect().map(_.toString).sorted.toSeq
    val b = Pq.encode(df.repartition(7), "vec_id", "embedding", cb)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("refineTopK with all cells + all candidates == exact brute top-k") {
    val rows = mkVecs(70, 31)
    val df = rows.toDF("vec_id", "embedding")
    val cb = Pq.train(df, "vec_id", "embedding", m = 2, k = 4, dims = dims)
    val cells = Similarity.fitQuantizedCentroids(df, "embedding", 4, seed = 42L)
      .map(_.map(_.toLong))
    val queries = df.filter(col("vec_id") <= 3)
    // probe EVERY cell and keep EVERY candidate: stage 2 must then
    // reproduce the exact quantized top-k bit-for-bit
    val got = Pq.refineTopK(queries, df, "vec_id", "embedding", cells, cb,
        nProbe = 4, candidates = 70, k = 5)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val vecs = rows.map { case (id, v) => id -> quant(v) }.toMap
    (1L to 3L).foreach { qid =>
      val qv = vecs(qid)
      val want = rows.map { case (id, v) =>
        val cv = quant(v)
        val d = (0 until dims).map { i => val t = qv(i) - cv(i); t * t }.sum
        (d, id)
      }.sortBy(identity).take(5).map(_._2)
      assert(got(qid) == want, s"query $qid")
    }
  }

  test("refine recovers recall the ADC-only ranking loses (or matches it)") {
    val rows = mkVecs(120, 47)
    val df = rows.toDF("vec_id", "embedding")
    val cb = Pq.train(df, "vec_id", "embedding", m = 2, k = 4, dims = dims)
    val cells = Similarity.fitQuantizedCentroids(df, "embedding", 4, seed = 42L)
      .map(_.map(_.toLong))
    val queries = df.filter(col("vec_id") <= 5)
    // candidates = corpus, nProbe = all cells: stage-1 misses nothing,
    // so refined recall must be 100% regardless of how lossy ADC is
    val refined = Pq.refineRecallVsExact(queries, df, "vec_id", "embedding",
        cells, cb, nProbe = 4, candidates = 120, k = 5)
      .as[(Long, Long, Long)].collect()
    assert(refined.nonEmpty)
    refined.foreach { case (qid, hits, ppm) =>
      assert(hits == 5L && ppm == 1000000L, s"query $qid: $hits hits")
    }
  }
}
