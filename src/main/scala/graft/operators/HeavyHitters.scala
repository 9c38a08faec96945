package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
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
    override def bufferEncoder: Encoder[Sketch] =
      implicitly[Encoder[Sketch]](Encoders.kryo[Sketch])
    override def outputEncoder: Encoder[Sketch] =
      implicitly[Encoder[Sketch]](Encoders.kryo[Sketch])
  }

  /** Approximate top-k tokens over a text column: MG sketch for the
    * candidate set, then one exact semi-joined count for true
    * frequencies (the standard two-pass heavy-hitters pipeline). */
  def frequentTokens(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(
      graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
    val sketch = toks.as[String].select(
      new MisraGries(k).toColumn.name("sketch")).head()
    val survivors = sketch.keys.toSeq
    toks.filter(col("token").isin(survivors: _*))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)
  }
}
