package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 2000L).map(i => (i, s"doc$i")).toDF("id", "payload")

  test("deterministicSample: same rows on any partition layout, ~fraction") {
    val base = Sampling.deterministicSample(ids, "id", 0.3, seed = 5)
      .select("id").as[Long].collect().toSet
    for (p <- Seq(1, 7, 32)) {
      val again = Sampling.deterministicSample(ids.repartition(p), "id", 0.3, seed = 5)
        .select("id").as[Long].collect().toSet
      assert(again == base, s"membership changed at $p partitions")
    }
    assert(math.abs(base.size / 2000.0 - 0.3) < 0.05) // binomial concentration
    // different seed → different (but still deterministic) draw
    val other = Sampling.deterministicSample(ids, "id", 0.3, seed = 6)
      .select("id").as[Long].collect().toSet
    assert(other != base)
    // nested fractions: 0.1 sample ⊂ same-seed 0.3 sample
    val tenth = Sampling.deterministicSample(ids, "id", 0.1, seed = 5)
      .select("id").as[Long].collect().toSet
    assert(tenth.subsetOf(base))
  }

  test("assignSplit: total, disjoint, weight-proportional, reproducible") {
    val split = Sampling.assignSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7).cache()
    assert(split.count() == 2000) // every row labeled
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05)
    // reproducible row-level: rerun assigns identical labels
    val a = split.select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.assignSplit(ids.repartition(11), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    split.unpersist()
  }

  test("assignSplit: adversarial weights (exact thirds) — rational cuts, driver replay") {
    // 1/3,1/3,1/3 has no finite decimal cut points: the old float-fold
    // cuts were engine-dependent here. The exact thresholds must (a)
    // partition [0, 2^32) with no gap or overlap, (b) replay row-for-row
    // from the published integers, (c) be independent of partitioning
    val thirds = Seq("a" -> (1.0 / 3), "b" -> (1.0 / 3), "c" -> (1.0 / 3))
    val th = Sampling.assignSplitThresholds(thirds)
    assert(th.map(_._1) == Seq("a", "b", "c"))
    assert(th.last._2 == 4294967296L, s"last cut must be 2^32: $th")
    assert(th.map(_._2) == th.map(_._2).sorted, s"cuts must ascend: $th")
    // each third is within one unit of 2^32/3 of its neighbor
    val widths = (0L +: th.map(_._2)).sliding(2).map(w => w(1) - w(0)).toSeq
    assert(widths.forall(w => math.abs(w - 4294967296.0 / 3) <= 1.0), s"$widths")
    val labeled = Sampling.assignSplit(ids, "id", thirds, seed = 3)
    val hashes = ids.select($"id",
      graft.functions.TextFunctions.portableHash($"id".cast("string"), 3).as("h"))
      .as[(Long, Long)].collect().toMap
    val got = labeled.select("id", "split").as[(Long, String)].collect()
    got.foreach { case (id, label) =>
      val h = hashes(id)
      val expect = th.collectFirst { case (n, t) if h < t => n }.get
      assert(label == expect, s"id=$id h=$h")
    }
    // proportions near thirds
    val counts = labeled.groupBy("split").count().as[(String, Long)].collect().toMap
    counts.values.foreach(c => assert(math.abs(c / 2000.0 - 1.0 / 3) < 0.05, counts))
    // layout-independent
    val again = Sampling.assignSplit(ids.repartition(13), "id", thirds, seed = 3)
      .select("id", "split").as[(Long, String)].collect().toSet
    assert(again == got.toSet)
  }

  test("null ids: dropped by sample, null-labeled by split") {
    val withNull = Seq(Some(1L), Some(2L), None).toDF("id")
    assert(Sampling.deterministicSample(withNull, "id", 1.0).count() == 2)
    val labeled = Sampling.assignSplit(withNull, "id", Seq("train" -> 1.0))
    assert(labeled.filter($"id".isNull).select("split").head().isNullAt(0))
    assert(labeled.filter($"id".isNotNull && $"split".isNull).count() == 0)
  }

  test("stratifiedSample: per-stratum fractions honored, partition-independent") {
    val strat = ids.withColumn("lang",
      element_at(array(lit("en"), lit("de"), lit("fr")), (pmod($"id", lit(3)) + 1).cast("int")))
    val kept = Sampling.stratifiedSample(strat, "id", "lang",
      Map("en" -> 0.5, "de" -> 1.0), defaultFraction = 0.0, seed = 2)
    val byLang = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("fr", 0L) == 0L)     // default 0: dropped
    assert(byLang("de") > 600)                   // fraction 1.0: all ~667
    assert(math.abs(byLang("en") / 667.0 - 0.5) < 0.1)
    val again = Sampling.stratifiedSample(strat.repartition(13), "id", "lang",
      Map("en" -> 0.5, "de" -> 1.0), defaultFraction = 0.0, seed = 2)
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
  }

  test("fillTokenBudget: per-stratum totals within budget, layout-independent") {
    val rnd = new scala.util.Random(9)
    val docs = (1L to 300L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 10L + rnd.nextInt(90)))
      .toDF("id", "stratum", "n_tokens")
    val kept = Sampling.fillTokenBudget(docs, "id", "stratum", "n_tokens",
      budgetPerStratum = 1000L, seed = 4)
    val sums = kept.groupBy("stratum").agg(sum("n_tokens").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums.values.forall(_ <= 1000L))
    // greedy fill in hash order: adding the NEXT doc in order would
    // overflow, so totals sit near the budget, not far under it
    assert(sums.values.forall(_ >= 1000L - 100L))
    val again = Sampling.fillTokenBudget(docs.repartition(11), "id", "stratum",
      "n_tokens", budgetPerStratum = 1000L, seed = 4)
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
  }

  test("mixCorpora: per-source samples are independent across sources") {
    // two corpora SHARING an id scheme must not draw id-identical subsets
    val a = (1L to 2000L).map(i => (i, "a")).toDF("id", "payload")
    val b = (1L to 2000L).map(i => (i, "b")).toDF("id", "payload")
    val mixed = Sampling.mixCorpora(Seq(("web", a, 0.3), ("forums", b, 0.3)), "id")
    val byS = mixed.select("source_corpus", "id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val overlap = byS("web").intersect(byS("forums")).size.toDouble /
      math.max(byS("web").size, 1)
    assert(overlap < 0.6, s"draws look correlated: overlap=$overlap") // ~0.3 expected
    intercept[IllegalArgumentException] { Sampling.mixCorpora(Seq.empty, "id") }
    intercept[IllegalArgumentException] {
      Sampling.mixCorpora(Seq(("x", a, 0.5), ("x", b, 0.5)), "id")
    }
  }

  test("temperatureResample: rare strata keep a higher rate; exact + layout-free") {
    // 900 'big' rows vs 100 'small' rows: sqrt weights 30 vs 10, so
    // small's keep RATE must exceed big's despite the smaller quota
    val df = (1 to 1000).map(i => (i.toLong, if (i <= 900) "big" else "small"))
      .toDF("id", "lang")
    val kept = Sampling.temperatureResample(df, "id", "lang", 1, 2, seed = 3)
    val rates = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    val rateBig = rates.getOrElse("big", 0L).toDouble / 900
    val rateSmall = rates.getOrElse("small", 0L).toDouble / 100
    assert(rateSmall > rateBig,
      s"flattening failed: small=$rateSmall big=$rateBig")
    // total close to the n/2 budget (binomial concentration)
    val total = rates.values.sum
    assert(total > 400 && total < 600, s"budget missed: $total")
    // identical row set under a different partitioning
    val again = Sampling.temperatureResample(df.repartition(13), "id", "lang",
      1, 2, seed = 3).select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
  }

  test("temperatureResample thresholds replay the documented integer math") {
    val df = (1 to 100).map(i => (i.toLong, if (i <= 64) "a" else "b"))
      .toDF("id", "lang")
    // sizes 64/36 -> weights 8/6, budget 50, quotas 28/21,
    // thresholds floor(28*2^32/64), floor(21*2^32/36)
    val thrA = BigInt(28) * (BigInt(1) << 32) / 64
    val thrB = BigInt(21) * (BigInt(1) << 32) / 36
    val kept = Sampling.temperatureResample(df, "id", "lang", 1, 2, seed = 5)
      .select("id").as[Long].collect().toSet
    val hashes = df.select($"id",
      graft.functions.TextFunctions.portableHash($"id".cast("string"), 5).as("h"),
      $"lang").as[(Long, Long, String)].collect()
    val expect = hashes.collect {
      case (id, h, "a") if h < thrA => id
      case (id, h, "b") if h < thrB => id
    }.toSet
    assert(kept == expect)
  }

  test("temperatureResample at 5000 strata: broadcast-join path, identical kept set") {
    // past joinCutoff the when-chain would do 5000 string compares per
    // row; the threshold table must broadcast-join instead — and keep
    // EXACTLY the same rows as the when-chain semantics
    val df = (1 to 20000).map(i => (i.toLong, s"s${i % 5000}")).toDF("id", "lang")
    val joined = Sampling.temperatureResample(df, "id", "lang", 1, 2, seed = 9)
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"threshold table not broadcast-joined:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CaseWhen"), plan)
    // driver replay of the documented integer math over all 5000
    // strata (the when-chain can't even BUILD at this width — a
    // 5000-deep nested CASE overflows the converter stack, which is
    // the scale wall the join path exists to remove)
    val sizes = df.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totalRows = sizes.values.sum
    val totalW = sizes.values.map(sz => BigInt(math.sqrt(sz.toDouble).toLong)).sum
    val budget = BigInt(totalRows) / 2
    val thr = sizes.map { case (s, sz) =>
      val quota = budget * BigInt(math.sqrt(sz.toDouble).toLong) / totalW
      s -> ((BigInt(1) << 32) min (quota * (BigInt(1) << 32) / sz))
    }
    val hashed = df.select($"id", $"lang",
      graft.functions.TextFunctions.portableHash($"id".cast("string"), 9).as("h"))
      .as[(Long, String, Long)].collect()
    val expect = hashed.collect { case (id, s, h) if BigInt(h) < thr(s) => id }.toSet
    assert(joined.select("id").as[Long].collect().toSet == expect)
    // schema is unchanged by the join path (helper columns dropped)
    assert(joined.columns.toSeq == df.columns.toSeq)
    // and at a width the chain CAN build, both paths keep identical rows
    val small = (1 to 2000).map(i => (i.toLong, s"s${i % 100}")).toDF("id", "lang")
    val viaChain = Sampling.temperatureResample(small, "id", "lang", 1, 2, seed = 9)
      .select("id").as[Long].collect().toSet
    val viaJoin = Sampling.temperatureResample(small, "id", "lang", 1, 2,
      seed = 9, joinCutoff = 10).select("id").as[Long].collect().toSet
    assert(viaChain == viaJoin)
  }

  test("exactStratifiedSample: exactly k per stratum, hash-priority rows") {
    val df = (1 to 500).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "lang")
    val out = Sampling.exactStratifiedSample(df, "id", "lang", k = 10, seed = 7)
    val sizes = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L))
    // equals the row_number composition (total order -> same row set)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
      .orderBy(graft.functions.TextFunctions.portableHash($"id".cast("string"), 7), $"id")
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10).select("id").as[Long].collect().toSet
    assert(out.select("id").as[Long].collect().toSet == viaWindow)
    // a stratum smaller than k survives whole
    val tiny = (1 to 4).map(i => (i.toLong, "only")).toDF("id", "lang")
    assert(Sampling.exactStratifiedSample(tiny, "id", "lang", 10).count() == 4)
  }

  test("mixCorpora: per-source rates with provenance tags") {
    val a = (1L to 1000L).map(i => (i, "a")).toDF("id", "payload")
    val b = (1L to 1000L).map(i => (i + 10000, "b")).toDF("id", "payload")
    val mixed = Sampling.mixCorpora(
      Seq(("web", a, 0.4), ("books", b, 1.0)), "id", seed = 3).cache()
    val bySource = mixed.groupBy("source_corpus").count()
      .as[(String, Long)].collect().toMap
    assert(bySource("books") == 1000) // fraction 1.0 keeps everything
    assert(math.abs(bySource("web") / 1000.0 - 0.4) < 0.07)
    assert(mixed.columns.contains("source_corpus"))
    mixed.unpersist()
  }

  test("weightedSample: priorities replay exactly; draw is weight-biased") {
    import spark.implicits._
    def md5h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map(x => f"$x%02x").mkString.take(8), 16)
    }
    // ids 0..199 light (w=1), 200..219 heavy (w=1000)
    val df = ((0L until 200L).map((_, 1L)) ++ (200L until 220L).map((_, 1000L)))
      .toDF("id", "w")
    val out = Sampling.weightedSample(df, "id", "w", k = 20, seed = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    // exact replay of every selected priority
    out.foreach { case (_, id, priQ) =>
      val u = (md5h(s"3:$id") + 1.0) / 4294967296.0
      val w = if (id >= 200) 1000L else 1L
      assert(priQ == math.floor(math.log(u) / w * 1e9).toLong, s"id=$id")
    }
    // heavy rows are 1000× likelier: expect the draw dominated by them
    val heavy = out.count(_._2 >= 200L)
    assert(heavy >= 15, s"only $heavy/20 heavy rows drawn — bias broken?")
    assert(out.map(_._1).toSeq == (1 to 20), "ranks must be 1..k in draw order")
  }

  test("weightedSample: deterministic across partitionings; zero weights excluded") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i % 7)).toDF("id", "w")
    val a = Sampling.weightedSample(df.repartition(1), "id", "w", k = 10, seed = 1)
      .collect().map(_.toString).toSeq
    val b = Sampling.weightedSample(df.repartition(13), "id", "w", k = 10, seed = 1)
      .collect().map(_.toString).toSeq
    assert(a == b)
    val picked = Sampling.weightedSample(df, "id", "w", k = 100, seed = 1)
      .collect().map(_.getLong(1)).toSet
    assert(picked.forall(_ % 7 != 0), "w=0 rows must never be drawn")
  }

  test("epochShuffle: a permutation, partitioning-invariant, seed-independent epochs") {
    import spark.implicits._
    val df = (0L until 500L).toDF("id")
    val a = Sampling.epochShuffle(df.repartition(3), "id", nShards = 4, seed = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // every row exactly once; positions within a shard are 1..size
    assert(a.map(_._1).sorted.toSeq == (0L until 500L))
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    val b = Sampling.epochShuffle(df.repartition(11), "id", nShards = 4, seed = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq, "partitioning must not matter")
    // a different seed is a different permutation (not the identity diff)
    val c = Sampling.epochShuffle(df, "id", nShards = 4, seed = 1)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val aMap = a.map(r => r._1 -> ((r._2, r._3))).toMap
    assert((0L until 500L).count(i => aMap(i) != c(i)) > 400,
      "epochs must be independent permutations")
  }

  test("groupHoldout: every row of a group lands in the same split") {
    val df = (1L to 900L).map(i => (i, s"author${i % 30}")).toDF("id", "grp")
    val out = Sampling.groupHoldout(df, "grp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 3)
    val perGroup = out.groupBy("grp")
      .agg(countDistinct(col("split")).as("n"))
      .as[(String, Long)].collect()
    assert(perGroup.forall(_._2 == 1L), "a split boundary crossed a group")
    // group-keyed assignment coincides with assignSplit ON the group key
    val viaAssign = Sampling.assignSplit(
      df.select("grp").distinct(), "grp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 3)
      .as[(String, String)].collect().toMap
    val got = out.select("grp", "split").distinct()
      .as[(String, String)].collect().toMap
    assert(got == viaAssign)
  }
}
