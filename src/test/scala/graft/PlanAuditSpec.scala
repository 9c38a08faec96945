package graft

/** Plan-shape regression guard: the properties that make these queries
  * scale are in the PLAN, not the output — filters reaching the parquet
  * scan, column pruning, broadcast dimension joins, whole-stage codegen,
  * no cartesian products. Output hashes can't catch a plan regression
  * (the answer stays right, 100× slower), so these assert on the
  * executed plan directly, against the real testdata tables. */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** AQE finalizes stages (and their codegen wrapping) only at
    * execution; run the query, then inspect the same plan. */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q1: shipdate filter is pushed to the lineitem scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("LessThanOrEqual(l_shipdate"), s"no pushed filter:\n$p")
  }

  test("q2: scan prunes to the two needed orders columns") {
    val p = plan("q2_revenue_by_day")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("o_comment"), "column pruning lost: o_comment read")
    assert(!p.contains("o_clerk"), "column pruning lost: o_clerk read")
  }

  test("q3/q5: dimension joins broadcast (no shuffle of the fact side)") {
    assert(plan("q3_top_orders").contains("BroadcastHashJoin"))
    val p5 = plan("q5_region_revenue")
    assert(p5.contains("BroadcastHashJoin"))
    assert(!p5.contains("SortMergeJoin"), "star join degraded to SMJ")
  }

  test("q28: broadcast nested loop, never a cartesian product") {
    val p = plan("q28_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("aggregation queries stay inside whole-stage codegen") {
    // codegen stages print as "*(n) Operator" in the final plan tree
    assert(finalPlan("q1_pricing_summary").contains("*(1) "))
    assert(finalPlan("q17_events_hourly").contains("*(1) "))
  }

  test("top-k shapes: bounded group-limit and top-k sort, not full sorts") {
    // latest-per-key dedup (the W1 merge shape): rank<=1 must plan as
    // WindowGroupLimit (bounded per-key state), not a full partition sort
    assert(finalPlan("q9_latest_order").contains("WindowGroupLimit"))
    // global top-10: TakeOrderedAndProject (per-partition heaps + driver
    // merge), never sort-everything-then-limit
    assert(finalPlan("q3_top_orders").contains("TakeOrderedAndProject"))
  }

  test("q31: IVF probe scan prunes to the probed cell= partitions") {
    // the persistent-index path: the data scan must carry a partition
    // filter on `cell` — a probe reads the probed directories only
    val p = plan("q31_ann_ivf")
    assert(p.matches("(?s).*PartitionFilters: \\[.*cell.*"), s"no cell pruning:\n$p")
  }

  test("q54: the custom TopKPerKey operator plans (not a window fallback)") {
    val p = finalPlan("q54_topk_per_key")
    assert(p.contains("TopKPerKeyFinal") && p.contains("TopKPerKeyPartial"), p)
    assert(!p.contains("Window"), s"fell back to Window:\n$p")
  }

  test("q55: the decontamination probe broadcasts the test-gram set") {
    val p = plan("q55_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"probe degraded to SMJ:\n$p")
  }

  test("document queries prune the scan to the needed columns") {
    // documents carries (doc_id, text, lang, source, n_chars); the
    // text operators must not drag the unused columns through the scan
    for (name <- Seq("q21_dedup_exact", "q56_repetition", "q64_char_ngrams")) {
      val p = plan(name)
      assert(!p.contains("n_chars"), s"$name reads n_chars:\n$p")
      assert(!p.contains("source"), s"$name reads source:\n$p")
    }
  }

  test("no query plans a cartesian product") {
    // cross joins in this library are always broadcast-bounded
    for (name <- Seq("q24_minhash_dedup", "q26_simhash_dedup",
        "q27_ngram_jaccard", "q29_embedding_pairs", "q48_embedding_lsh",
        "q69_fuzzy_decontam"))
      assert(!plan(name).contains("CartesianProduct"), s"$name")
  }

  test("hygiene queries prune the documents scan and stay shuffle-lean") {
    // q65/q70 are pure per-row projections: no Exchange anywhere before
    // the final presentation sort
    for (name <- Seq("q65_unicode_clean", "q70_html_strip")) {
      val p = plan(name)
      assert(!p.contains("n_chars") && !p.contains("lang"),
        s"$name lost column pruning:\n$p")
      assert(!p.split("Sort", 2)(0).contains("Exchange"),
        s"$name shuffles before its presentation sort:\n$p")
    }
    // q32 single-scan SRP: exactly one scan of embeddings on the corpus
    // side plus one on the (broadcast) query side
    val p32 = plan("q32_ann_srp")
    val scans = "Scan parquet".r.findAllIn(p32).size
    assert(scans <= 2, s"q32 scans embeddings $scans times:\n$p32")
  }

  test("q67/q69: the small probe side broadcasts") {
    assert(plan("q67_vocab_oov").contains("BroadcastHashJoin"))
    assert(plan("q69_fuzzy_decontam").contains("BroadcastHashJoin"))
  }

  test("q77: the sketch side of the CMS estimate join broadcasts") {
    // the counter table is <= depth*width rows BY CONSTRUCTION; probing
    // must never shuffle the probe side against it
    assert(plan("q77_cms_freq").contains("BroadcastHashJoin"))
  }

  test("q78/q82: sketch aggregations partial-aggregate map-side") {
    // the whole point of mergeable sketch state: the shuffle carries
    // per-partition partials, not rows — partial_max/partial aggregate
    // nodes must appear below the exchange
    for (name <- Seq("q78_hll_registers", "q82_profile")) {
      val p = finalPlan(name)
      assert(p.contains("partial_max") || p.contains("partial_"),
        s"$name has no map-side partial aggregation:\n$p")
    }
  }

  test("q79: the bloom probe is a scan-side filter, not a join") {
    // BloomContains evaluates inside the fact projection; the only
    // joins in q79 are the broadcast membership/demo joins, and the
    // probe itself must stay inside whole-stage codegen
    val p = finalPlan("q79_bloom_prefilter")
    assert(p.contains("bloom_contains"), s"probe expression missing:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q79 degraded to SMJ:\n$p")
  }

  test("q80: incremental dedup never cartesians and scans each side once per stage") {
    val p = plan("q80_incremental_dedup")
    assert(!p.contains("CartesianProduct"), s"q80 cartesians:\n$p")
  }

  test("q81: LM scoring keeps count tables as shuffle joins, no cartesian") {
    val p = plan("q81_bigram_lm")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q81 BNLJ:\n$p")
  }

  test("q86: cell assignment is a projection (codegen argmin, no Exchange); " +
    "the verify join is cell-keyed, never all-pairs") {
    // the full q86 plan starts from the checkpointed assignment, so pin
    // the assignment's own plan: one projection, no Exchange
    import org.apache.spark.sql.functions._
    val cents = Array(Array(0.0, 0.0), Array(1e6, 1e6))
    val asn = Tables(spark, dir, "embeddings").select(col("vec_id"),
      org.apache.spark.sql.graft.NearestCentroids.nearestCell(
        graft.functions.VectorFunctions.quantize(col("embedding")), cents).as("cell"))
    val ap = asn.queryExecution.executedPlan.toString
    assert(ap.contains("nearest_centroids"), s"argmin expression missing:\n$ap")
    assert(!ap.contains("Exchange"), s"cell assignment shuffles:\n$ap")
    val p = finalPlan("q86_semdedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q86 pair generation degenerated to all-pairs:\n$p")
  }

  test("q87: the skipping read scans a pruned file subset, filter still pushed") {
    import org.apache.spark.sql.functions._
    import graft.sources.DataSkipping, DataSkipping.ColRange
    val path = graft.queries.SketchQueries.SkipTable.getOrBuild(spark, dir)
    val ranges = Seq(
      ColRange("l_shipdate", lit("1995-03-01").cast("timestamp"),
        lit("1995-05-31").cast("timestamp")),
      ColRange("l_extendedprice", lit(30000.0), lit(60000.0)))
    val (files, total) = DataSkipping.pruneFiles(spark, path, ranges)
    assert(files.size < total / 2,
      s"Z-order + envelopes must skip most files (read ${files.size}/$total)")
    // the residual filter must still reach the (pruned) scan
    val p = DataSkipping.prunedRead(spark, path, ranges)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      s"residual range not pushed to the pruned scan:\n$p")
  }

  test("q88: dynamic pivot plans one aggregate, not a per-value self-join") {
    val p = finalPlan("q88_pivot")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      s"pivot expanded into joins:\n$p")
  }

  test("q90: deletion-neighborhood blocking, never a cartesian; " +
    "string re-attach joins broadcast") {
    val p = finalPlan("q90_fuzzy_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join degraded to an all-pairs shape:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"string re-attach did not broadcast the row side:\n$p")
  }

  test("q91: the date spine broadcasts; the fact aggregates once") {
    val p = finalPlan("q91_date_spine")
    assert(p.contains("BroadcastHashJoin"), s"spine join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"spine join degraded to SMJ:\n$p")
  }

  test("q92/q95: one Exchange on the business key, windows fused on one sort") {
    // SCD2 and burst collapse are window chains over the SAME key+order:
    // they must not shuffle once per window function
    for (name <- Seq("q92_scd2", "q95_debounce")) {
      // count only the final adaptive plan, not the echoed initial plan
      val p = finalPlan(name).split("== Initial Plan ==").head
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges <= 1, s"$name: $exchanges key shuffles (want 1):\n$p")
    }
  }

  test("q93: per-round aggregation partial-aggregates map-side, no cartesian") {
    val p = finalPlan("q93_pagerank")
    assert(!p.contains("CartesianProduct"), s"pagerank cartesianed:\n$p")
    assert(p.contains("partial_sum") || p.contains("Partial"),
      s"contribution sum lost map-side partial aggregation:\n$p")
  }

  test("q96: the salt-replicated dim still broadcasts") {
    val p = finalPlan("q96_salted_join")
    assert(p.contains("BroadcastHashJoin"), s"salted dim not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"salted join degraded to SMJ:\n$p")
  }

  test("q98: the corpus-side decision is a pure projection (no join, no key shuffle)") {
    // stratum stats are a control-plane aggregate at construction; the
    // RETURNED plan must be scan -> filter -> output sort only
    val p = finalPlan("q98_temperature_mix").split("== Initial Plan ==").head
    assert(!p.contains("Join"), s"threshold lookup became a join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"decision required a key shuffle:\n$p")
  }

  test("q99: the exact sample runs on the bounded-heap TopKPerKey operator") {
    val p = finalPlan("q99_exact_sample")
    assert(p.contains("TopKPerKeyFinal") && p.contains("TopKPerKeyPartial"), p)
    assert(!p.contains("Window"), s"fell back to Window:\n$p")
  }

  test("q103: the k-sigma flag is a literal projection — no join at all") {
    // the stats fold is a control-plane collect at construction; the
    // RETURNED plan must be the daily aggregate plus a projection
    // against literal thresholds — zero joins of any kind
    val p = finalPlan("q103_anomaly").split("== Initial Plan ==").head
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"stats became a runtime join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"$exchanges hash Exchanges (daily agg only):\n$p")
  }

  test("q106: token ids are one compiled projection — zero shuffle before the sort") {
    val p = finalPlan("q106_bpe_ids").split("== Initial Plan ==").head
    assert(!p.contains("Join"), s"id lookup became a join:\n$p")
    assert(!p.contains("Generate"), s"id stats exploded the array:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"encode/stats required a key shuffle:\n$p")
  }

  test("q107: pack assembly is exactly ONE key shuffle, no join") {
    val p = finalPlan("q107_pack_ids").split("== Initial Plan ==").head
    assert(!p.contains("Join"), s"assembly joined:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, // pack groupBy (+ its partial-agg split under AQE)
      s"$exchanges hash Exchanges for one assembly:\n$p")
    assert(p.contains("Window"), s"running offsets lost the window:\n$p")
  }

  test("q100: the ring successor is bucket-sharded; the fallback broadcasts") {
    val p = finalPlan("q100_neg_sampling").split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("SortMergeJoin"),
      s"successor search degraded:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"fallback not broadcast:\n$p")
    // ONE key shuffle: the bucket Exchange of the union scan
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"$exchanges key shuffles (want 1):\n$p")
  }

  test("q110: BM25 tf is a compiled scan pass; stats/df/query joins all broadcast") {
    val p = finalPlan("q110_bm25")
    // per-term tf comes from ONE token_term_counts pass per document —
    // no corpus token explode and no per-(doc, term) aggregation
    // shuffle may reappear; every small side (df, stats, query terms)
    // must broadcast — an SMJ anywhere means a corpus-sized shuffle
    // snuck in
    assert(p.contains("token_term_counts"),
      s"compiled term-count pass missing:\n$p")
    assert(!p.contains("HashAggregate(keys=[doc_id"),
      s"per-(doc, term) aggregation shuffle reappeared:\n$p")
    assert(!p.contains("SortMergeJoin"), s"BM25 degraded to SMJ:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"one-row stats not broadcast:\n$p")
  }

  test("q115: k-means assignment is a shuffle-free compiled projection") {
    val p = finalPlan("q115_kmeans")
    // centroids ride as a NearestCentroids literal — no join anywhere;
    // the only exchanges are the final orderBy's range partitioning
    // and AQE echoes of it
    assert(p.contains("nearest_centroids"), s"compiled assignment missing:\n$p")
    assert(!p.contains("Join"), s"k-means must not join:\n$p")
  }

  test("q116: hard negatives broadcast the query set, never a cartesian") {
    val p = plan("q116_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q118: indexed BM25 probe prunes to the query terms' buckets") {
    val p = plan("q118_bm25_index")
    assert(p.matches("(?s).*PartitionFilters: \\[.*bucket.*"),
      s"no bucket pruning:\n$p")
    assert(!p.contains("SortMergeJoin"), s"indexed BM25 degraded to SMJ:\n$p")
  }

  test("q254: indexed ANN-MaxSim stage 1 prunes to the probed (t, bucket) partitions") {
    // tight regex: "bucket" must appear INSIDE a PartitionFilters
    // bracket (the embeddings scans legitimately print empty ones);
    // finalPlan because the tiny audit join resolves SMJ→BHJ under AQE
    val p = finalPlan("q254_maxsim_ann_indexed")
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*bucket.*"),
      s"no (t, bucket) pruning on the pooled-vector index scan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian snuck in:\n$p")
  }

  test("q112/q122: the bucket-count model table broadcasts back onto the stream") {
    // DSIR scoring and PSI both build a ≤B-row model — re-attaching it
    // must be a broadcast, never a corpus-sized shuffle join
    assert(finalPlan("q112_dsir").contains("BroadcastExchange"))
    assert(!plan("q112_dsir").contains("SortMergeJoin"))
    assert(finalPlan("q122_drift_psi").contains("BroadcastExchange"))
    assert(!plan("q122_drift_psi").contains("SortMergeJoin"))
  }

  test("q113: co-occurrence marginals broadcast; no positions self-join anywhere") {
    // the pair explode runs inside the Materialize.once checkpoint job,
    // so the final plan starts at the checkpoint scan — pin what it CAN
    // show: every join broadcast (marginals + N), no SMJ, no cartesian
    val p = finalPlan("q113_cooccur_pmi")
    assert(p.contains("BroadcastExchange"), s"marginals not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"marginal join degraded to SMJ:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q128: the node-sized label frame broadcasts against edges each round") {
    val p = finalPlan("q128_communities")
    assert(p.contains("BroadcastExchange"), s"labels not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q111: percentile selection is ONE key shuffle plus the window sort") {
    val p = finalPlan("q111_percentiles")
    // rank selection needs exactly one hashpartitioning Exchange (the
    // group key); the pct explode must not add joins or shuffles
    val plan = p.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"$exchanges key shuffles (want 1):\n$p")
    assert(!plan.contains("Join"), s"pct literals must not join:\n$p")
  }

  test("q132: marginals and the frequent set broadcast; rules end in TakeOrdered") {
    val p = finalPlan("q132_basket_rules")
    val plan = p.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), s"marginals not broadcast:\n$p")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"rule metrics degraded to a wide join:\n$p")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k global-sorted:\n$p")
  }

  test("q134: triangle closure is hash equi-joins; crosses only for 1-row stats") {
    val p = finalPlan("q134_triangles")
    val plan = p.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), s"wedge join degenerated:\n$p")
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin)".r
      .findFirstIn(plan).isDefined, s"no equi-join for the closure:\n$p")
    // the only nested loops are the single-row summary crosses
    assert("BroadcastNestedLoopJoin BuildRight, Cross".r
      .findAllIn(plan).size == "BroadcastNestedLoopJoin".r.findAllIn(plan).size,
      s"non-cross nested loop crept in:\n$p")
  }

  test("q137: the dot-product pass joins nothing but the 1-row renorm max") {
    val p = finalPlan("q137_power_iteration")
    val plan = p.split("== Initial Plan ==").head
    // direction literal is compiled in: no equi-join anywhere; the one
    // nested loop is the single-row max cross for renormalization
    assert(!plan.contains("CartesianProduct") && !plan.contains("HashJoin") &&
      !plan.contains("SortMergeJoin"), s"direction must be a literal:\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, p)
  }

  test("q138: bin assignment is a literal projection over the scan — no join") {
    val p = finalPlan("q138_quantile_bins")
    val plan = p.split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"cuts must be literals:\n$p")
  }

  test("q140: annotator reliabilities broadcast back onto the vote table") {
    val p = finalPlan("q140_weighted_vote")
    val plan = p.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), s"reliability join not broadcast:\n$p")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q143: the EWMA fold is ONE key shuffle, no self-join on the series") {
    val p = finalPlan("q143_ewma_chart")
    val plan = p.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"$exchanges key shuffles (want <=2: month agg + fold):\n$p")
  }

  test("q148: rollup is one Expand into a partial-aggregated shuffle, nation broadcast") {
    val p = finalPlan("q148_rollup_revenue")
    val plan = p.split("== Initial Plan ==").head
    assert("Expand".r.findAllIn(plan).size == 1,
      s"expected exactly one Expand (three grouping levels, one scan):\n$p")
    assert(plan.contains("BroadcastHashJoin"), s"nation join not broadcast:\n$p")
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"rollup aggregation lost map-side partials:\n$p")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q149: cube's four grouping levels cost one scan and one agg shuffle") {
    val p = finalPlan("q149_cube_orders")
    val plan = p.split("== Initial Plan ==").head
    assert("Expand".r.findAllIn(plan).size == 1, s"want one Expand:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"$exchanges key shuffles (want 1):\n$p")
  }

  test("q153: the touch pairing is one user-keyed hash join, no cartesian") {
    val p = finalPlan("q153_attribution")
    val plan = p.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), s"attribution went quadratic:\n$p")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"lookback predicate must ride the user equi-join as a residual:\n$p")
    // events scan → conv/touch splits → ONE pairing join on user
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"no hash/merge equi-join found:\n$p")
  }

  test("q154: the funnel is ONE user shuffle however many steps") {
    val p = finalPlan("q154_funnel_steps")
    val plan = p.split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"funnel must not join per step:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"$exchanges shuffles (want <=2: user agg + step agg):\n$p")
  }

  test("q157: code-space search broadcasts queries; corpus never shuffles") {
    val p = finalPlan("q157_int8_topk")
    val plan = p.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastNestedLoopJoin"), s"queries not broadcast:\n$p")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q158: chi2 label marginals broadcast onto the token-label counts") {
    val p = finalPlan("q158_chi2_tokens")
    val plan = p.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), s"label marginals not broadcast:\n$p")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q159: the group-holdout split is a pure projection — no join, no shuffle before the rollup") {
    val p = finalPlan("q159_group_holdout")
    val plan = p.split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"split assignment must not join a group table:\n$p")
  }

  test("q160: MAD reuses one event_type partitioning across both medians") {
    val p = finalPlan("q160_mad_outliers")
    val plan = p.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"))
    // both rank selections and both joins hash on the same group key;
    // AQE may reuse exchanges but never plan a nested loop here
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"group join degraded:\n$p")
  }

  test("q120/q209/q211: capped overlap dedup — array verify only behind the barrier, no windowed df") {
    // the capped family prunes candidates with a lossless scalar bound
    // (cold_shared + min hot counts), then runs the exact hot-array
    // intersect ONCE per bound-survivor behind a materialization
    // barrier. The final (post-barrier) plan is count arithmetic only:
    // a full-set array_intersect here would mean the verify escaped the
    // barrier back into the candidate join (triple-evaluated in a join
    // condition, the r11 regression), and a count-over-window df (the
    // hot-key one-task straggler) must never resurface in any stage
    Seq("q120_containment", "q209_containment_capped",
      "q211_jaccard_capped").foreach { q =>
      val p = finalPlan(q)
      assert(!p.contains("array_intersect"),
        s"$q: array verify escaped the barrier into the final plan:\n$p")
      assert(!p.contains("Window"),
        s"$q: windowed df (one-task hot key) resurfaced:\n$p")
    }
  }

  test("q128/q210/q212: rank-keyed loops hash-aggregate — no sort-agg, no label window") {
    // the per-round argmax is an integer-coded min (HashAggregate) and
    // community sizes are groupBy+join; a struct-keyed SortAggregate
    // or a count-over-label Window would be the r11 plan regressions.
    // q128 shares the surgery (label propagation runs the same packed
    // argmax), q212 runs the louvain loop twice (weighted at level 2)
    // — all three must stay pinned
    Seq("q128_communities", "q210_louvain", "q212_louvain_coarse").foreach { q =>
      val p = finalPlan(q)
      assert(!p.contains("SortAggregate"), s"$q: struct-buffer argmax resurfaced:\n$p")
      assert(!p.contains("Window"), s"$q: label window (mega-community skew) resurfaced:\n$p")
    }
  }

  test("q215/q219: BLEU and WordPiece are pure projections over the scan") {
    // both metrics are compiled per-row work; a join, window, or
    // generate here would mean the zero-shuffle contract broke
    Seq("q215_bleu", "q219_wordpiece_encode").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q: join appeared in a projection metric:\n$p")
      assert(!p.contains("Window"), s"$q: window appeared:\n$p")
      assert(!p.contains("Generate"), s"$q: explode appeared:\n$p")
    }
  }

  test("q218: link prediction joins are equi-joins with a bounded TakeOrdered tail") {
    val p = finalPlan("q218_link_prediction")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q218: wedge/anti joins degraded to a cartesian:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"q218: top-k lost its bounded TakeOrdered tail:\n$p")
  }

  test("q220: margin mining broadcasts the query side; rest is hash work") {
    // the deliberate cross product carries a broadcast side (the q28
    // exactness-anchor layout); a non-broadcast cartesian would shuffle
    // corpus x corpus
    val p = finalPlan("q220_margin_mine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"q220: query side no longer broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q220: non-broadcast cartesian appeared:\n$p")
  }

  test("q236/q238: rank marginals and boiler dfs are aggs, not row windows") {
    // spearman's milliranks come from cumulative sums over DISTINCT-
    // value marginals — a Window is expected there, but never a
    // cartesian; boilerplate's document frequencies must stay a
    // groupBy (a Window over postings would single-task a hot shingle)
    val sp = finalPlan("q236_spearman")
    assert(!sp.contains("CartesianProduct"), s"q236 cartesian:\n$sp")
    val bp = finalPlan("q238_boilerplate")
    assert(!bp.contains("Window"),
      s"q238: df computation regressed to a window over postings:\n$bp")
    assert(!bp.contains("CartesianProduct"), s"q238 cartesian:\n$bp")
  }

  test("q240: dictionary tagging is a compiled projection — no join, " +
    "one exchange (the output sort)") {
    val p = finalPlan("q240_dict_tag")
    assert(!p.contains("Join"), s"q240: a join appeared:\n$p")
    assert(p.contains("multi_pattern_count") || p.contains("MultiPatternCount"),
      s"q240: compiled matcher missing:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, // AQE may print the sort exchange + its read
      s"q240: tagging should shuffle only for the output sort, got " +
        s"$exchanges exchanges:\n$p")
  }

  test("q241: silhouette scoring is join-free compiled integer dots") {
    val p = finalPlan("q241_silhouette")
    assert(!p.contains("Join"), s"q241: scoring pass gained a join:\n$p")
    assert(p.contains("long_array_dot"),
      s"q241: compiled dot products missing:\n$p")
  }

  test("q242/q243: the per-group model tables broadcast back") {
    val cf = finalPlan("q242_conformal")
    assert(cf.contains("BroadcastHashJoin"), s"q242: q-hat join not broadcast:\n$cf")
    assert(!cf.contains("CartesianProduct"), s"q242 cartesian:\n$cf")
    val se = finalPlan("q243_seasonal")
    assert(se.contains("BroadcastHashJoin"), s"q243: phase join not broadcast:\n$se")
    assert(!se.contains("Window"),
      s"q243: trend regressed to a row-ordered series window:\n$se")
    assert(!se.contains("CartesianProduct"), s"q243 cartesian:\n$se")
  }
}
