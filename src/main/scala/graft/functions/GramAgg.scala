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
final case class GramAgg(dim: Int, roundTo: Int = 6)
    extends Aggregator[Array[Float], Array[Double], Seq[(Int, Int, Double)]] {
  require(dim >= 1, s"dim must be >= 1, got $dim")

  // [0] = n, [1..dim] = sums, then upper-triangle products row-major:
  // (i,j) i<=j at 1 + dim + i*dim - i*(i+1)/2 + j
  private val bufLen = 1 + dim + dim * (dim + 1) / 2
  @inline private def tri(i: Int, j: Int): Int =
    1 + dim + i * dim - i * (i + 1) / 2 + j

  override def zero: Array[Double] = new Array[Double](bufLen)

  // Array[Float] input (not Seq): the primitive-array encoder
  // deserializes via a lambda-free toFloatArray, so the resolved input
  // encoder stays structurally equal across queries (a Seq deserializer
  // is a MapObjects with fresh lambda ids — the same canonicalization
  // hazard as the buffer encoder above), and it skips the Seq wrapper
  // on the hot path
  override def reduce(b: Array[Double], v: Array[Float]): Array[Double] = {
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

  // kryo BUFFER encoder, deliberately: ScalaAggregator embeds the
  // resolved buffer encoder and compares it during canonicalization; a
  // resolved ExpressionEncoder[Array[Double]] carries fresh
  // lambda-variable ids per query, so two builds of the same covariance
  // plan would never be sameResult (the r11/r12 persisted-frame trap).
  // Kryo resolves lambda-free (same device as TopKAgg/KmvAgg); the
  // buffer crosses the shuffle once per map task, so the codec choice
  // is not hot.
  override def bufferEncoder: Encoder[Array[Double]] =
    Encoders.kryo[Array[Double]]

  override def outputEncoder: Encoder[Seq[(Int, Int, Double)]] =
    ExpressionEncoder[Seq[(Int, Int, Double)]]()
}

object GramAgg {
  // one UDAF per parameterization — see the canonicalization-trap note
  // in TopKAgg (plans with fresh instances are never sameResult)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int),
      org.apache.spark.sql.expressions.UserDefinedFunction]()

  /** Column form: `df.agg(covariance(64)($"embedding"))` →
    * `array<struct<_1:int,_2:int,_3:double>>` of upper-triangle
    * (i, j, cov) entries, 1-based dimensions.
    *
    * Vectors carrying a NULL ELEMENT — at any length — are EXCLUDED
    * via the native `vec_has_null` pre-guard (same convention as the
    * encode pipelines): without it a single null element either kills
    * the task inside the primitive `Seq[Float]` deserializer or
    * silently folds as 0.0 into every covariance entry — at 100 TB one
    * corrupt row must not fail the pass. Null-FREE ragged vectors
    * still fail LOUDLY (the dim-mismatch `require`): a whole corpus at
    * the wrong declared dim is a caller error, not row corruption. The
    * guard keeps the unboxed fast path for clean rows; run the
    * `vec_is_clean` census first if the corrupt count matters.
    *
    * CANONICALIZATION CAVEAT: unlike top_k/kmv/cms, plans containing
    * this aggregate never canonicalize equal across invocations — the
    * array<float> input encoder deserializes through MapObjects, whose
    * lambda-variable ids Spark mints fresh per query (pinned as a
    * canary in GramAggSpec). Persist the one-row OUTPUT if reuse is
    * needed; a persisted frame containing the raw aggregate can never
    * serve a rebuilt plan.
    */
  def covariance(dim: Int, roundTo: Int = 6): Column => Column = {
    val f = cache.computeIfAbsent((dim, roundTo),
      _ => udaf(GramAgg(dim, roundTo), ExpressionEncoder[Array[Float]]()))
    vec => {
      import org.apache.spark.sql.functions.when
      // exclude on "carries a null ELEMENT" regardless of length — a
      // ragged vector that ALSO has a null element must not reach the
      // primitive Array[Float] deserializer (opaque task death); only
      // null-free ragged vectors fall through to the loud dim-mismatch
      // require. Native vec_has_null, not exists(_.isNull): higher-
      // order functions are CodegenFallback and would run the lambda
      // interpreted on every scanned row.
      f(when(VectorFunctions.vec_has_null(vec),
        org.apache.spark.sql.functions.lit(null)).otherwise(vec))
    }
  }
}
