package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-memory path for "most frequent tokens over 100 TB of text",
  * where an exact `groupBy(token).count()` would shuffle a
  * billions-term vocabulary.
  *
  * State is at most k (token, weight) pairs per partial aggregate;
  * merges are associative. Guarantee: every token with true frequency
  * > n/(k+1) survives, and reported weight underestimates the true
  * count by at most n/(k+1). Exact counting for the survivors (the
  * usual second pass) is a cheap semi-joined groupBy.
  *
  * Demonstrates the `Aggregator[IN, BUF, OUT]` extension surface
  * (SURVEY §2.10/§7.6) with Kryo-free product encoders.
  */
object HeavyHitters {

  type Sketch = Map[String, Long]

  class MisraGries(k: Int) extends Aggregator[String, Sketch, Sketch] {
    override def zero: Sketch = Map.empty

    override def reduce(buf: Sketch, token: String): Sketch = {
      val updated = buf.updatedWith(token) {
        case Some(c) => Some(c + 1)
        case None => Some(1L)
      }
      shrink(updated)
    }

    override def merge(a: Sketch, b: Sketch): Sketch =
      shrink(b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updatedWith(t) { case Some(x) => Some(x + c); case None => Some(c) }
      })

    /** Keep at most k entries: subtract the (k+1)-th largest weight
      * from everyone and drop non-positive weights (the classic MG
      * decrement, applied in bulk). */
    private def shrink(m: Sketch): Sketch =
      if (m.size <= k) m
      else {
        val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
        m.collect { case (t, c) if c > cut => t -> (c - cut) }
      }

    override def finish(reduction: Sketch): Sketch = reduction
    // expression encoders (not Kryo): the buffer stays a structured
    // map column, so partial aggregates ship compactly and inspectably
    override def bufferEncoder: Encoder[Sketch] = ExpressionEncoder[Sketch]()
    override def outputEncoder: Encoder[Sketch] = ExpressionEncoder[Sketch]()
  }

  /** Approximate top-k tokens over a text column: MG sketch for the
    * candidate set, then one exact count for true frequencies (the
    * standard two-pass heavy-hitters pipeline), restricted to the
    * survivors via a broadcast semi-join (an `isin` with thousands of
    * arms would build a thousand-arm In expression instead).
    *
    * `sketchCapacity` (default 8k) controls the candidate guarantee:
    * any token absent from the sketch has true frequency ≤
    * n/(capacity+1). The recount output therefore equals the exact
    * `groupBy(token).count()` top-k WHENEVER the k-th most frequent
    * token's count exceeds n/(capacity+1) — the usual regime for
    * natural text, where stopword counts dwarf n/capacity. On
    * near-uniform distributions (no token above n/(capacity+1)) true
    * top-k members can be evicted and the output is approximate, as
    * with any bounded-state sketch; raise the capacity toward the
    * vocabulary size to recover exactness. q43's oracle pins the exact
    * regime on the documents corpus. */
  def frequentTokens(df: DataFrame, textCol: String, k: Int,
                     sketchCapacity: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val capacity = if (sketchCapacity > 0) sketchCapacity else 8 * k
    val toks = df.select(explode(
      graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
    val sketch = toks.as[String].select(
      new MisraGries(capacity).toColumn.name("sketch")).head()
    val survivors = spark.createDataset(sketch.keys.toSeq).toDF("token")
    toks.join(broadcast(survivors), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)
  }
}
