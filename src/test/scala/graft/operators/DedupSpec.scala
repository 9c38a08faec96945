package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic word-soup corpus with planted near-duplicates. */
  private lazy val corpus = {
    val vocab = Vector("spark", "query", "table", "scan", "join", "sort",
      "merge", "hash", "row", "batch", "filter", "group", "window", "key")
    val rnd = new scala.util.Random(7)
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 30).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // planted near-dups: drop the first token of docs 0..4
    val near = (0 until 5).map(i =>
      (100L + i, docs(i)._2.split(" ").drop(1).mkString(" ")))
    (docs ++ near).toDF("id", "text")
  }

  test("exact: copies collapse to one canonical id") {
    val withCopies = corpus.unionByName(
      corpus.filter($"id" < 3).select(($"id" + 1000).as("id"), $"text"))
    val out = Dedup.exact(withCopies, "id", "text")
    assert(out.filter($"n_dups" === 2).count() == 3)
    val canon = out.filter($"n_dups" === 2).select("canonical_id").as[Long].collect()
    assert(canon.toSet == Set(0L, 1L, 2L)) // min id wins
    assert(Dedup.exactRows(withCopies, "id", "text").count() == corpus.count())
  }

  test("minhashDuplicates finds planted near-dups") {
    val pairs = Dedup.minhashDuplicates(corpus, "id", "text", threshold = 0.5)
      .collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    // all 5 planted pairs are (i, 100+i) with jaccard ≈ (n-1)/n-ish
    (0 until 5).foreach(i => assert(found.contains((i.toLong, 100L + i)),
      s"missing planted pair ($i, ${100 + i})"))
    pairs.foreach(r => assert(r.getDouble(2) >= 0.5))
  }

  test("simhashDuplicates == brute force (pigeonhole completeness)") {
    val sigs = corpus.select($"id",
      TextFunctions.simhash32($"text").as("sig")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val got = Dedup.simhashDuplicates(corpus, "id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == brute)
  }

  test("ngramJaccardDuplicates == brute force (prefix-filter completeness)") {
    val sh = corpus.select($"id",
      array_distinct(TextFunctions.wordShingles($"text", 3)).as("sh"))
      .as[(Long, Seq[String])].collect().map { case (i, s) => (i, s.toSet) }
    val brute = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.6
    } yield (ia, ib)).toSet
    val got = Dedup.ngramJaccardDuplicates(corpus, "id", "text", threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == brute)
    assert(brute.nonEmpty) // planted dups make this a real check
  }

  test("ngramJaccard hot-shingle cutoff: subset of exact, true scores, finds dups") {
    // explicit uncapped anchor (negative = the Σdf² brute join)
    val exact = Dedup.ngramJaccardDuplicates(corpus, "id", "text", threshold = 0.6,
      maxDocFrequency = -1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // generous cutoff (no shingle is that hot) → identical to exact
    val capped = Dedup.ngramJaccardDuplicates(corpus, "id", "text",
      threshold = 0.6, maxDocFrequency = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped == exact)
    // aggressive cutoff: pairs found are a subset, scores stay exact
    val tight = Dedup.ngramJaccardDuplicates(corpus, "id", "text",
      threshold = 0.6, maxDocFrequency = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    tight.foreach { case (pair, j) =>
      assert(exact.contains(pair) && exact(pair) == j, s"$pair")
    }
  }

  test("maxDocFrequency = 0 (the old silent-uncapped sentinel) fails loudly") {
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardDuplicates(corpus, "id", "text", threshold = 0.6,
        maxDocFrequency = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(corpus, "id", "text", maxDocFrequency = 0)
    }
  }

  test("operators leave the SQL cache empty (localCheckpoint lifetime)") {
    import org.apache.spark.sql.graft.CacheIntrospect
    spark.catalog.clearCache() // session is shared; other suites .cache()
    Dedup.minhashDuplicates(corpus, "id", "text", threshold = 0.5).count()
    Dedup.simhashDuplicates(corpus, "id", "text", maxHamming = 3).count()
    Dedup.ngramJaccardDuplicates(corpus, "id", "text", threshold = 0.6).count()
    assert(CacheIntrospect.sqlCacheEmpty(spark),
      "dedup operators must not leak persist() registrations to callers")
  }

  test("persist fallback mode (spark.graft.localCheckpoint=false) stays correct") {
    spark.conf.set("spark.graft.localCheckpoint", "false")
    try {
      val pairs = Dedup.minhashDuplicates(corpus, "id", "text", threshold = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      (0 until 5).foreach(i => assert(pairs.contains((i.toLong, 100L + i))))
    } finally {
      spark.conf.unset("spark.graft.localCheckpoint")
      spark.catalog.clearCache() // persist mode leaves cache entries by design
    }
  }

  test("embeddingDuplicates: identical vectors always collide") {
    val vecs = (0 until 20).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)
    }
    val withDup = (vecs :+ (100L, vecs(3)._2)).toDF("id", "vec")
    val pairs = Dedup.embeddingDuplicates(withDup, "id", "vec",
      threshold = 0.99, planes = 8)
    val found = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found.contains((3L, 100L)))
    // quantized path: same collision guarantee, bit-deterministic cosine
    val qpairs = Dedup.embeddingDuplicatesQuantized(withDup, "id", "vec",
      threshold = 0.99, planes = 8, dims = 16)
    val qdup = qpairs.filter($"id_a" === 3 && $"id_b" === 100)
      .select("cosine").as[Double].collect()
    assert(qdup.length == 1 && qdup.head == 1.0)
  }

  test("semanticDedupQuantized: planted copies drop, first occurrence kept") {
    val vecs = (0 until 30).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat).toSeq)
    }
    // exact copies of ids 2, 7 under larger ids
    val withDups = (vecs ++ Seq((102L, vecs(2)._2), (107L, vecs(7)._2)))
      .toDF("id", "vec")
    val cents = Similarity.fitQuantizedCentroids(withDups, "vec", nCells = 4,
      seed = 1L)
    val out = Dedup.semanticDedupQuantized(withDups, "id", "vec", cents,
      threshold = 0.99)
    val keep = out.select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out.count() == 32)
    assert(!keep(102L) && !keep(107L), "copies must be dropped")
    assert(keep(2L) && keep(7L), "first occurrences must survive")
    // identical vectors are assigned to the same cell
    val cells = out.select("id", "cell").as[(Long, Int)].collect().toMap
    assert(cells(2L) == cells(102L) && cells(7L) == cells(107L))
    // partitioning must not change any verdict (hash decisions only)
    val out11 = Dedup.semanticDedupQuantized(withDups.repartition(11), "id",
      "vec", cents, threshold = 0.99)
    assert(out.orderBy("id").collect().toSeq ==
      out11.orderBy("id").collect().toSeq)
  }

  test("duplicatedSpanCoverage: hand case — shared trigram union, overlap merged") {
    // docs 1 and 2 share "a b c" at two positions in doc 1 (overlapping
    // occurrences: p=0 and p=2 via 'a b a b c'? no — doc 1 holds the
    // gram at p=0 and p=4, doc 3 is untouched
    val docs = Seq(
      (1L, "a b c x a b c"),   // gram 'a b c' at p=0 and p=4 (7 tokens)
      (2L, "z a b c z z"),     // at p=1 (6 tokens)
      (3L, "q r s t u v")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: spans [0,3) ∪ [4,7) → 6 of 7 tokens; ppm = 6e6 div 7
    assert(out(1L) == ((7L, 2L, 6L, 857142L)))
    assert(out(2L) == ((6L, 1L, 3L, 500000L)))
    assert(out(3L) == ((6L, 0L, 0L, 0L)))
  }

  test("duplicatedSpanCoverage: overlapping duplicated grams never double-count") {
    // docs share the 4-token run 'a b c d' → duplicated trigrams at
    // p=0 and p=1 overlap in [1,3); union must be 4, not 6
    val docs = Seq(
      (1L, "a b c d x y"),
      (2L, "a b c d q r")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 4L)))
    assert(out(2L) == ((2L, 4L)))
  }

  test("duplicatedSpanCoverage: within-doc repetition alone is not cross-doc duplication") {
    val docs = Seq(
      (1L, "m n o m n o m n o"), // self-repeats, but no other doc has it
      (2L, "totally different words here now")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
  }

  test("duplicatedSpanCoverage: fully boilerplate doc scores 1000000 ppm") {
    val docs = Seq(
      (1L, "the same exact line"),
      (2L, "the same exact line"),
      (3L, "the same exact line plus a tail")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out(1L) == 1000000L && out(2L) == 1000000L)
    assert(out(3L) == 4000000L / 7L)
  }

  test("maximalRepeatedSpans: hand case — boundaries, within-doc repeats, text") {
    // plant an 8-token passage in docs 1 and 2 (2 also holds it twice)
    val docs = Seq(
      (1L, "u1 u2 P1 P2 P3 P4 P5 P6 P7 P8 u3 u4"),
      (2L, "P1 P2 P3 P4 P5 P6 P7 P8 v1 P1 P2 P3 P4 P5 P6 P7 P8"),
      (3L, "w1 w2 w3 w4 w5 w6 w7")).toDF("id", "text")
    val out = Dedup.maximalRepeatedSpans(docs, "id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val plant = "P1 P2 P3 P4 P5 P6 P7 P8"
    assert(out.toSet == Set(
      (1L, 2L, 8L, 4L, plant),
      (2L, 0L, 8L, 4L, plant),
      (2L, 9L, 8L, 4L, plant)))
  }

  test("maximalRepeatedSpans == brute-force repeat scan (completeness on planted repeats)") {
    val rnd = new scala.util.Random(11)
    def soup(k: Int) = (0 until k).map(_ => "w" + rnd.nextInt(5000)).mkString(" ")
    val plant = "alpha beta gamma delta epsilon zeta eta theta"
    val raw = Seq(
      (1L, soup(20) + " " + plant + " " + soup(15)),
      (2L, soup(10) + " " + plant + " tail " + plant), // cross-doc AND twice here
      (3L, soup(30)),
      (4L, "x1 x2 x3 x4 x5 x6 " + soup(8) + " x1 x2 x3 x4 x5 x6"), // within-doc only
      (5L, soup(12) + " alpha beta gamma delta epsilon " + soup(4))) // partial overlap of the plant
    val n = 5
    // brute-force reference: count EVERY n-gram occurrence corpus-wide,
    // mark repeated positions, merge consecutive runs, slice the text
    val toks = raw.map { case (id, t) => id -> t.split("\\s+").toVector }
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for ((_, ts) <- toks; i <- 0 to ts.length - n)
      counts(ts.slice(i, i + n).mkString(" ")) += 1
    val expect = (for ((id, ts) <- toks) yield {
      val repPos = (0 to ts.length - n).filter(i => counts(ts.slice(i, i + n).mkString(" ")) >= 2)
      // islands of consecutive positions
      val runs = repPos.foldLeft(Vector.empty[Vector[Int]]) {
        case (acc, p) if acc.nonEmpty && acc.last.last == p - 1 =>
          acc.init :+ (acc.last :+ p)
        case (acc, p) => acc :+ Vector(p)
      }
      runs.map { r =>
        val start = r.head; val end = r.last + n
        (id, start.toLong, (end - start).toLong, r.size.toLong,
          ts.slice(start, end).mkString(" "))
      }
    }).flatten.toSet
    assert(expect.nonEmpty, "fixture must plant real repeats")
    val got = Dedup.maximalRepeatedSpans(raw.toDF("id", "text"), "id", "text", n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    assert(got == expect)
    // maximality: extending any span by one window on either side must
    // break the every-window-repeated predicate (or fall off the doc)
    val tokMap = toks.toMap
    got.foreach { case (id, start, len, _, _) =>
      val ts = tokMap(id)
      if (start > 0)
        assert(counts(ts.slice(start.toInt - 1, start.toInt - 1 + n).mkString(" ")) < 2)
      val after = start.toInt + len.toInt - n + 1
      if (after + n <= ts.length)
        assert(counts(ts.slice(after, after + n).mkString(" ")) < 2)
    }
  }
}
