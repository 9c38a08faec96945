package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float|double>` embedding columns, as
  * pure higher-order-function `Column`s (no UDFs — stays inside
  * whole-stage codegen; the O(n²)/LSH machinery lives in
  * `operators.Similarity`).
  *
  * All arithmetic is done in double with left-to-right summation so
  * results are deterministic and engine-portable.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val n = norm(a) * norm(b)
    when(n === 0.0, lit(0.0)).otherwise(dot(a, b) / n)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Unit-normalize (zero vector passes through unchanged). */
  def normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, d(a)).otherwise(transform(d(a), x => x / n))
  }

  // ---------------------------------------------------- quantized (exact)
  /** Quantize to integers: floor(x * scale). Integer dot products are
    * exact and commutative — identical on any engine and any partition
    * count, unlike float summation. Used by the oracle-checked queries;
    * error vs true cosine is O(1/scale). */
  def quantize(vec: Column, scale: Double = 1e6): Column =
    transform(d(vec), x => floor(x * scale).cast("long"))

  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine over pre-quantized integer vectors — bit-identical across
    * engines (integer dot, one sqrt, one division). */
  def quantizedCosine(qa: Column, qb: Column): Column = {
    val n = sqrt(intDot(qa, qa).cast("double")) * sqrt(intDot(qb, qb).cast("double"))
    when(n === 0.0, lit(0.0)).otherwise(intDot(qa, qb).cast("double") / n)
  }

  /** Sign-random-projection LSH bucket: one bit per hyperplane, bit p =
    * sign(v · h_p), hyperplanes seeded deterministically per (seed, p,
    * dim). Vectors with equal buckets are cosine-similar candidates;
    * different seeds give independent hash tables. */
  def srpBucket(vec: Column, planes: Int, seed: Int = 0): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)), lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(d(vec), sequence(lit(0), size(vec) - 1),
            (x, i) => x * ((conv(substring(md5(
              concat(lit(s"hp:$seed:"), p.cast("string"), lit(":"), i.cast("string"))), 1, 8), 16, 10)
              .cast("long").cast("double") / lit(2147483648.0)) - lit(1.0))),
          lit(0.0), (a2, x) => a2 + x)
        acc + when(proj >= 0, pow(lit(2.0), p).cast("long")).otherwise(lit(0L))
      })
}
