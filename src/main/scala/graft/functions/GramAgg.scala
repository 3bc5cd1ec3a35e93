package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass second-moment (Gram) aggregate over an embedding column:
  * accumulates `n`, per-dimension sums, and the upper triangle of
  * Σ x·xᵀ in a single flat `Array[Double]`, from which the population
  * covariance matrix — the input PCA / ZCA-whitening of an embedding
  * corpus needs — is derived at finish.
  *
  * This is the scale-correct shape for distributed covariance: the
  * naive SQL twin (self-join on row id over the exploded vectors, or a
  * d²-wide explode) multiplies the corpus by d or d² BEFORE the
  * aggregate, so at 100 TB × d=1024 the exchange carries petabytes.
  * Here the map side folds every partition into one d(d+3)/2+1-double
  * buffer (d=64 → 17 KB, d=1024 → 4.2 MB) and the exchange carries one
  * buffer per map task — the same partial-aggregation argument as
  * `TopKAgg`, applied to dense linear algebra. Catalyst plans it as
  * two-phase ObjectHashAggregate.
  *
  * Finish emits the strict upper triangle INCLUSIVE diagonal as
  * (i, j, cov) entries (population covariance, E[xy] − E[x]E[y]),
  * rounded so the value survives cross-engine summation-order drift.
  */
final class GramAgg(dim: Int, roundTo: Int = 6)
    extends Aggregator[Seq[Float], Array[Double], Seq[(Int, Int, Double)]] {
  require(dim >= 1, s"dim must be >= 1, got $dim")

  // [0] = n, [1..dim] = sums, then upper-triangle products row-major:
  // (i,j) i<=j at 1 + dim + i*dim - i*(i+1)/2 + j
  private val bufLen = 1 + dim + dim * (dim + 1) / 2
  @inline private def tri(i: Int, j: Int): Int =
    1 + dim + i * dim - i * (i + 1) / 2 + j

  override def zero: Array[Double] = new Array[Double](bufLen)

  override def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = {
    if (v == null) return b                 // null vectors don't count
    require(v.length == dim, s"expected dim-$dim vector, got ${v.length}")
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) { x(i) = v(i).toDouble; i += 1 }
    b(0) += 1.0
    i = 0
    while (i < dim) {
      b(1 + i) += x(i)
      var j = i
      val base = tri(i, i) - i
      while (j < dim) { b(base + j) += x(i) * x(j); j += 1 }
      i += 1
    }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Double]): Seq[(Int, Int, Double)] = {
    val n = b(0)
    if (n == 0) return Seq.empty
    // HALF_UP, matching Spark's and DuckDB's round() (rint's half-even
    // would disagree with both on exact .5 boundaries); both engines
    // pass NaN/±Inf through round() unchanged, and BigDecimal would
    // throw on them instead — guard first. + 0.0 folds IEEE -0.0 to
    // +0.0 so the hash compare can't split on zero's sign.
    def r(x: Double): Double =
      if (x.isNaN || x.isInfinite) x
      else BigDecimal(x).setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val out = Vector.newBuilder[(Int, Int, Double)]
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val cov = b(tri(i, j)) / n - (b(1 + i) / n) * (b(1 + j) / n)
        out += ((i + 1, j + 1, r(cov)))
        j += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Seq[(Int, Int, Double)]] =
    ExpressionEncoder[Seq[(Int, Int, Double)]]()
}

object GramAgg {
  /** Column form: `df.agg(covariance(64)($"embedding"))` →
    * `array<struct<_1:int,_2:int,_3:double>>` of upper-triangle
    * (i, j, cov) entries, 1-based dimensions.
    */
  def covariance(dim: Int, roundTo: Int = 6): Column => Column = {
    val f = udaf(new GramAgg(dim, roundTo), ExpressionEncoder[Seq[Float]]())
    vec => f(vec)
  }
}
