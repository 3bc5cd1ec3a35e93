package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Primitive float-vector kernels for the similarity operators
  * (SURVEY §2.12). Embedding comparisons run once per CANDIDATE PAIR —
  * the hot path of LSH-bucket near-dup at scale — so they are native
  * codegen'd expressions over `array<float>`: direct `getFloat(i)`
  * reads off Tungsten array data, no per-element boxing, no Seq
  * conversion (a `udf((a: Seq[Float], ...)` boxes every element of
  * every pair).
  */
object VecOps {
  // dot/cosine return NaN on a LENGTH MISMATCH (instead of silently
  // truncating to the shorter vector): a ragged corrupt vector scored
  // over the overlap reads as a perfectly finite ±1.0 cosine —
  // hijacking rank 1 of every top-k and passing every near-dup
  // threshold (r20 review; the PQ paths already length-check via
  // finiteOrNull). The expression wrappers convert NaN to NULL, so
  // ragged rows SINK exactly like NaN-element rows. Callers comparing
  // prefixes slice explicitly (x84 Matryoshka) and are unaffected.
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val d = math.sqrt(aa) * math.sqrt(bb)
    if (d == 0.0) 0.0 else ab / d
  }

  /** L2-normalize into a fresh float array. Arithmetic matches the
    * `udf((v: Seq[Float]) => ...)` it replaced bit-for-bit on clean
    * data (StableKernelsSpec): sum of squares in Double over widened
    * floats, `sqrt`, then per-element Double division narrowed back to
    * Float; a zero-norm vector passes through unchanged. Null ELEMENTS
    * read as 0.0 — the [[PqOps]] convention (the replaced Seq[Float]
    * UDF NPEd on them), so corrupt rows normalize as if the missing
    * dimension were 0 instead of killing the task.
    */
  def normalize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (v.isNullAt(i)) 0.0 else v.getFloat(i).toDouble
      s += x * x; i += 1
    }
    val norm = math.sqrt(s)
    val out = new Array[Float](n)
    i = 0
    while (i < n) {
      val x = if (v.isNullAt(i)) 0f else v.getFloat(i)
      out(i) = if (norm == 0.0) x else (x / norm).toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Length-agnostic null-element scan: true iff the vector carries at
    * least one null element. The corrupt-row guard for consumers that
    * must also let RAGGED null-free vectors through to their own loud
    * dim check (GramAgg) — [[isClean]] conflates the two conditions.
    */
  def hasNullElement(v: ArrayData): Boolean = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** True iff the vector has NO null element and every element is
    * finite (no NaN/Infinity) — the quantizer-training admission test.
    * A single NaN coordinate entering Lloyd accumulation poisons the
    * centroid mean, and NaN distance comparisons then collapse every
    * point into cluster 0 — the whole codebook silently degenerates
    * (r17 review finding); Infinity degenerates the same way through
    * the mean.
    */
  def allFinite(v: ArrayData): Boolean = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return false
      val x = v.getFloat(i)
      if (java.lang.Float.isNaN(x) || java.lang.Float.isInfinite(x)) return false
      i += 1
    }
    true
  }

  /** True iff `v` is exactly `dim` long with no null elements. The
    * encode/normalize kernels deliberately absorb corrupt rows (null
    * elements and ragged vectors zero-pad — a total function beats a
    * mid-job task failure at 100 TB), which means corruption is
    * otherwise INVISIBLE; this predicate is the observability hook —
    * `df.filter(!vec_is_clean(col, dim))` isolates the corrupt rows,
    * `sum(when(...))` counts them for a data-quality gate.
    */
  def isClean(v: ArrayData, dim: Int): Boolean = {
    if (v.numElements() != dim) return false
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return false
      i += 1
    }
    true
  }

  def eqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }

  /** PQ ADC score: Σⱼ table(j)(code(j)) — m array lookups per row,
    * identical double-addition order to the scalar spec (the x47
    * golden is bit-exact against it). `adc_score` is on the public SQL
    * surface, so out-of-range codes fail with a descriptive message
    * instead of a raw ArrayIndexOutOfBoundsException; the checks are
    * integer compares against values already in registers — noise next
    * to the array loads.
    */
  def adc(code: ArrayData, table: ArrayData): Double = {
    val m = code.numElements()
    if (m > table.numElements())
      throw new IllegalArgumentException(
        s"adc_score: code has $m subspaces but the distance table has only " +
          s"${table.numElements()} — the code and table must come from the same PqModel")
    var s = 0.0
    var j = 0
    while (j < m) {
      val sub = table.getArray(j)
      val c = code.getInt(j)
      if (c < 0 || c >= sub.numElements())
        throw new IllegalArgumentException(
          s"adc_score: code($j) = $c is outside [0, ${sub.numElements()}) — " +
            "codes must be produced by pqEncode with the matching PqModel")
      s += sub.getDouble(c)
      j += 1
    }
    s
  }

  /** 1-bit-per-dimension binary quantization: bit i of the result is
    * set iff v(i) > 0, first 64 dimensions. 64× compression (a 64-dim
    * float vector becomes ONE long), and Hamming distance between two
    * packed words is a single XOR + POPCNT — the cheap shortlist stage
    * of binary-quantized retrieval; survivors are re-scored against
    * the float vectors (asymmetric rerank). Strictly sign-of-component
    * (no hyperplanes) so an independent engine reproduces the exact
    * bits from the same floats.
    */
  def signPack(v: ArrayData): Long = {
    val n = math.min(v.numElements(), 64)
    var bits = 0L
    var i = 0
    while (i < n) { if (v.getFloat(i) > 0f) bits |= (1L << i); i += 1 }
    bits
  }

  /** IVF-PQ ADC: per-cell table select then [[adc]] — `tables` is
    * dense over cell ids (unprobed cells hold empty arrays; the
    * curated ivfPqTopK path's cell IN-list filter guarantees they are
    * never reached, but arbitrary SQL callers get a descriptive error
    * rather than a wrong score or a raw index exception).
    */
  def adcCell(cell: Int, code: ArrayData, tables: ArrayData): Double = {
    if (cell < 0 || cell >= tables.numElements())
      throw new IllegalArgumentException(
        s"adc_score_cells: cell $cell is outside [0, ${tables.numElements()})")
    val t = tables.getArray(cell)
    if (t.numElements() == 0)
      throw new IllegalArgumentException(
        s"adc_score_cells: cell $cell was not probed (empty distance table) — " +
          "rows must be filtered to the probed cells before scoring")
    adc(code, t)
  }
}

/** `sig_eqcount(a, b)`: number of positions where two long-array
  * signatures agree — the MinHash similarity estimator's kernel, one
  * call per candidate pair.
  */
case class SigEqCountExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sig_eqcount"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.eqCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigEqCountExpr =
    copy(left = l, right = r)
}

/** `vec_dot(a, b)`: float-array dot product.
  *
  * Non-finite results (a NaN/Infinity element, or the kernel's NaN on
  * a length mismatch) return NULL for the same reason [[VecCosineExpr]]
  * does: Spark's comparison semantics treat NaN as LARGER than every
  * real double, so `vec_dot(...) >= threshold` on one corrupt row
  * would otherwise emit it as a near-duplicate of everything in its
  * bucket (r20 review — embeddingNearDup is exactly that consumer).
  */
case class VecDotExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val d = VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) null else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         ${ev.value} = graft.functions.VecOps.dot($a, $b);
         if (Double.isNaN(${ev.value}) || Double.isInfinite(${ev.value})) {
           ${ev.isNull} = true;
         }
       """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotExpr =
    copy(left = l, right = r)
}

/** `vec_cosine(a, b)`: float-array cosine similarity. */
case class VecCosineExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vec_cosine"

  // A non-finite cosine (a NaN or Infinity ELEMENT in either vector)
  // returns NULL, never NaN: Spark orders NaN ABOVE every real double,
  // so one corrupt embedding would otherwise HIJACK rank 1 of every
  // desc top-k that scans it (measured r17: hostile rows topped
  // x07/x84/x86). NULL under desc ordering lands last by default —
  // corrupt rows sink instead of surfacing. Zero-norm vectors stay 0.0
  // (defined in VecOps.cosine); clean corpora are unaffected.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val d = VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) null else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         ${ev.value} = graft.functions.VecOps.cosine($a, $b);
         if (Double.isNaN(${ev.value}) || Double.isInfinite(${ev.value})) {
           ${ev.isNull} = true;
           ${ev.value} = 0.0;
         }
       """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosineExpr =
    copy(left = l, right = r)
}

/** `vec_normalize(v)`: L2-normalized copy of a float vector — see
  * [[VecOps.normalize]]. Runs once per row on the corpus-streaming
  * scan that feeds every embedding near-dup / semantic-dedup operator,
  * so it is native (the boxed `Seq[Float]` UDF it replaced was the
  * engine's last non-native corpus-scan kernel) and, as a plain
  * parameter-free case class, canonicalization-stable: the persisted
  * normalized-signature frame in `Dedup.embeddingNearDup` serves every
  * later build of the same plan.
  */
case class VecNormalizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_normalize"

  override protected def nullSafeEval(v: Any): Any =
    VecOps.normalize(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VecOps.normalize($v)")

  override protected def withNewChildInternal(newChild: Expression): VecNormalizeExpr =
    copy(child = newChild)
}

/** `vec_is_clean(v, dim)` — see [[VecOps.isClean]]. NOT
  * null-intolerant: a NULL vector is corrupt, so it must report
  * `false` rather than propagate NULL and vanish from both sides of a
  * corruption census.
  */
case class VecIsCleanExpr(child: Expression, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "vec_is_clean"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    v != null && VecOps.isClean(v.asInstanceOf[ArrayData], dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          boolean ${ev.value} =
            !${c.isNull} && graft.functions.VecOps.isClean(${c.value}, $dim);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): VecIsCleanExpr =
    copy(child = newChild)
}

/** `vec_has_null(v)` — see [[VecOps.hasNullElement]]. Codegen'd
  * replacement for `exists(v, _.isNull)` on hot aggregate guards
  * (higher-order functions are CodegenFallback — the lambda would run
  * interpreted per row and split whole-stage codegen). NOT
  * null-intolerant: a NULL vector has no null ELEMENT, so it reports
  * `false` and lets the consumer's own null handling decide.
  */
case class VecHasNullExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "vec_has_null"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    v != null && VecOps.hasNullElement(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          boolean ${ev.value} =
            !${c.isNull} && graft.functions.VecOps.hasNullElement(${c.value});
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): VecHasNullExpr =
    copy(child = newChild)
}

/** `vec_is_finite(v)` — see [[VecOps.allFinite]]. NOT null-intolerant:
  * a NULL vector is not finite, so it reports `false` (the filter
  * `vec_is_finite(v)` therefore excludes null vectors too — one
  * admission test for quantizer training).
  */
case class VecIsFiniteExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "vec_is_finite"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    v != null && VecOps.allFinite(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          boolean ${ev.value} =
            !${c.isNull} && graft.functions.VecOps.allFinite(${c.value});
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): VecIsFiniteExpr =
    copy(child = newChild)
}

/** `sign_pack(v)`: binary quantization of a float vector into one
  * 64-bit word of sign bits — see [[VecOps.signPack]]. Runs once per
  * scanned row in the binary-shortlist path, so native codegen.
  */
case class SignPackExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_pack"

  override protected def nullSafeEval(v: Any): Any =
    VecOps.signPack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VecOps.signPack($v)")

  override protected def withNewChildInternal(newChild: Expression): SignPackExpr =
    copy(child = newChild)
}

/** `adc_score(code, table)`: PQ asymmetric-distance score — the scan
  * side of quantized ANN touches only m-int codes, so the kernel must
  * not box them; table is a broadcast-literal m×k double array.
  */
case class AdcScoreExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "adc_score"

  override protected def nullSafeEval(code: Any, table: Any): Any =
    VecOps.adc(code.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) => s"graft.functions.VecOps.adc($c, $t)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScoreExpr =
    copy(left = l, right = r)
}

/** `adc_score_cells(cell, code, tables)`: IVF-PQ ADC — selects the
  * probed cell's residual table, then scores like [[AdcScoreExpr]].
  */
case class AdcCellScoreExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(
    org.apache.spark.sql.types.IntegerType,
    ArrayType(org.apache.spark.sql.types.IntegerType),
    ArrayType(ArrayType(ArrayType(DoubleType))))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "adc_score_cells"

  override protected def nullSafeEval(cell: Any, code: Any, tables: Any): Any =
    VecOps.adcCell(cell.asInstanceOf[Int],
      code.asInstanceOf[ArrayData], tables.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (cell, code, tabs) => s"graft.functions.VecOps.adcCell($cell, $code, $tabs)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): AdcCellScoreExpr =
    copy(first = f, second = s, third = t)
}

/** Rademacher (±1) random-hyperplane sign-LSH signatures — native and
  * CANONICALIZATION-STABLE, which is the load-bearing property: the
  * closure-capturing UDF this replaced
  * (`udf((v: Seq[Float]) => ...)` with `planes` captured) built a NEW
  * function object per operator invocation, so two builds of "the
  * same" signature plan were never `sameResult` and a persisted
  * signature frame could not serve ANY later invocation — every bench
  * rep (and every re-derived plan in a long session) silently
  * recomputed the full signature scan. A case-class expression
  * parameterized by (numTables, signBits, dim) canonicalizes
  * structurally; planes regenerate deterministically from the pinned
  * seed-42 schedule ([[graft.operators.Dedup.rademacherPlanes]]'s
  * contract) and are cached per shape.
  */
object SignLshOps {

  private val planesCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** Seed-42 Rademacher planes — MUST stay bit-identical to
    * `Dedup.rademacherPlanes` (the x06/x08/x35 goldens are derived
    * from that schedule by an independent Python reimplementation).
    */
  def planes(signBits: Int, dim: Int): Array[Array[Double]] =
    planesCache.computeIfAbsent((signBits, dim), _ => {
      val rnd = new scala.util.Random(42)
      Array.fill(signBits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
    })

  /** `numTables` sign signatures; table t uses plane rows
    * [t·signBits, (t+1)·signBits). Null vector → all-zero signatures
    * (NOT null), matching the UDF it replaced. Identical arithmetic:
    * Double plane × widened Float element, dot over
    * min(dim, |v|) components.
    */
  def signatures(v: ArrayData, numTables: Int, signBits: Int, dim: Int): ArrayData = {
    val out = new Array[Long](numTables)
    if (v != null) {
      val ps = planes(numTables * signBits, dim)
      val n = math.min(dim, v.numElements())
      var t = 0
      while (t < numTables) {
        var sig = 0L
        var b = 0
        while (b < signBits) {
          val p = ps(t * signBits + b)
          var s = 0.0
          var i = 0
          while (i < n) { s += p(i) * v.getFloat(i); i += 1 }
          if (s > 0) sig |= (1L << b)
          b += 1
        }
        out(t) = sig
        t += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** `sign_lsh(vec, numTables, signBits, dim)` — see [[SignLshOps]].
  * NOT null-intolerant: a null vector carries all-zero signatures,
  * exactly like the UDF it replaced (a null would silently drop the
  * row from every LSH bucket instead of bucketing it at 0).
  */
case class SignLshExpr(child: Expression, numTables: Int, signBits: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  require(signBits >= 1 && signBits <= 63, s"signBits must be in [1, 63], got $signBits")
  require(numTables >= 1, s"numTables must be >= 1, got $numTables")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sign_lsh"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SignLshOps.signatures(
      child.eval(input).asInstanceOf[ArrayData], numTables, signBits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            graft.functions.SignLshOps.signatures(
              ${c.isNull} ? null : ${c.value}, $numTables, $signBits, $dim);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshExpr =
    copy(child = newChild)
}

/** Product-quantization encode kernels — the only ANN passes that
  * stream the full corpus (everything downstream reads m-int codes).
  * The argmin math is copied verbatim from `Similarity.nearest`/
  * `dist2` (strict `<`, first-index tie-break, x − codeword
  * subtraction order, ragged vectors zero-padded to dim) so the
  * x47/x48 goldens reproduce bit-for-bit; StableKernelsSpec pins the
  * kernels against the replaced UDF bodies. Inputs are read as
  * primitive `getFloat` off Tungsten arrays — the `udf((v:
  * Seq[Float]) => ...)` encoders these replace boxed every element of
  * every vector on the corpus-streaming pass, and (the r12 lesson)
  * captured their trained codebooks in method-local closures, leaving
  * the encode plans canonically unique per invocation.
  */
object PqOps {

  // null ELEMENTS read as 0.0 too, explicitly: UnsafeArrayData would
  // return the zeroed value bits while GenericArrayData would throw —
  // the isNullAt guard makes both paths agree, total, on the same
  // convention as the out-of-range pad. (The replaced Seq[Float] UDFs
  // NPEd on null elements; a corrupt row now encodes as if the
  // missing dimension were 0, like a short vector.)
  private def padded(v: ArrayData, n: Int, i: Int): Double =
    if (i < n && !v.isNullAt(i)) v.getFloat(i).toDouble else 0.0

  /** Squared L2 from the (optionally residual) subvector at `off` to
    * codeword `c`. `coarseRow == null` ⇒ plain PQ; otherwise the
    * residual (x − centroid) is formed per dimension first, exactly
    * like the UDF's precomputed residual array.
    */
  private def subDist2(
      v: ArrayData, n: Int, off: Int, dsub: Int,
      c: Array[Double], coarseRow: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < dsub) {
      val idx = off + i
      val xv = padded(v, n, idx)
      val x = if (coarseRow == null) xv else xv - coarseRow(idx)
      val d = x - c(i); s += d * d; i += 1
    }
    s
  }

  private def subNearest(
      v: ArrayData, n: Int, off: Int, dsub: Int,
      cb: Array[Array[Double]], coarseRow: Array[Double]): Int = {
    var best = 0; var bestD = subDist2(v, n, off, dsub, cb(0), coarseRow)
    var c = 1
    while (c < cb.length) {
      val dd = subDist2(v, n, off, dsub, cb(c), coarseRow)
      if (dd < bestD) { bestD = dd; best = c }
      c += 1
    }
    best
  }

  private def cellDist2(v: ArrayData, n: Int, c: Array[Double], dim: Int): Double = {
    var s = 0.0; var i = 0
    while (i < dim) { val d = padded(v, n, i) - c(i); s += d * d; i += 1 }
    s
  }

  /** Nearest coarse centroid of the zero-padded vector. */
  def ivfCell(v: ArrayData, coarse: Array[Array[Double]], dim: Int): Int = {
    val n = v.numElements()
    var best = 0; var bestD = cellDist2(v, n, coarse(0), dim)
    var c = 1
    while (c < coarse.length) {
      val dd = cellDist2(v, n, coarse(c), dim)
      if (dd < bestD) { bestD = dd; best = c }
      c += 1
    }
    best
  }

  /** Plain PQ code: per subspace, index of the nearest codeword. */
  def pqCode(v: ArrayData, cbs: Array[Array[Array[Double]]], dim: Int): ArrayData = {
    val m = cbs.length; val dsub = dim / m
    val n = v.numElements()
    val out = new Array[Int](m)
    var j = 0
    while (j < m) { out(j) = subNearest(v, n, j * dsub, dsub, cbs(j), null); j += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  private def codeAgainst(
      v: ArrayData, coarseRow: Array[Double],
      cbs: Array[Array[Array[Double]]], dim: Int): ArrayData = {
    val m = cbs.length; val dsub = dim / m
    val n = v.numElements()
    val out = new Array[Int](m)
    var j = 0
    while (j < m) { out(j) = subNearest(v, n, j * dsub, dsub, cbs(j), coarseRow); j += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** IVF-PQ residual code: nearest coarse cell selects the residual,
    * then per-subspace nearest codeword of (x − centroid).
    */
  def ivfPqCode(
      v: ArrayData, coarse: Array[Array[Double]],
      cbs: Array[Array[Array[Double]]], dim: Int): ArrayData =
    codeAgainst(v, coarse(ivfCell(v, coarse, dim)), cbs, dim)

  /** IVF-PQ residual code against a CALLER-SUPPLIED cell — the bulk
    * encode path, where the cell was already computed as its own
    * column and the coarse argmin must not run a second time.
    */
  def ivfPqCodeAt(
      v: ArrayData, cell: Int, coarse: Array[Array[Double]],
      cbs: Array[Array[Array[Double]]], dim: Int): ArrayData = {
    if (cell < 0 || cell >= coarse.length)
      throw new IllegalArgumentException(
        s"ivfpq_code_at: cell $cell is outside [0, ${coarse.length}) — the cell " +
          "column must come from ivf_cell with the same coarse quantizer")
    codeAgainst(v, coarse(cell), cbs, dim)
  }
}

/** `pq_encode(vec)`: m-int PQ code of a float vector. Codebooks are
  * case-class parameters as immutable nested Seqs, so two invocations
  * built from the same trained model canonicalize EQUAL (deep
  * structural equality — an Array param would compare by reference
  * and re-open the r12 capturing-closure trap at the expression
  * layer); the eval path reads a converted primitive array.
  */
case class PqEncodeExpr(child: Expression, codebooks: Seq[Seq[Seq[Double]]], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  require(codebooks.nonEmpty, "pq_encode needs at least one subspace codebook")
  require(dim % codebooks.length == 0,
    s"dim $dim not divisible by m=${codebooks.length} subspaces")
  // shape validation at construction, not as a per-task
  // ArrayIndexOutOfBoundsException at execution: every subspace needs
  // at least one codeword, and every codeword must cover the dsub
  // dimensions the kernel reads
  require(codebooks.forall(_.nonEmpty),
    "pq_encode: every subspace codebook needs at least one codeword")
  require(codebooks.forall(_.forall(_.length >= dim / codebooks.length)),
    s"pq_encode: every codeword must have at least dsub=${dim / codebooks.length} " +
      "dimensions (codebooks and dim must come from the same PqModel)")
  @transient private lazy val cbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any): Any =
    PqOps.pqCode(v.asInstanceOf[ArrayData], cbs, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", cbs, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqOps.pqCode($c, $ref, $dim)")
  }

  // plan strings print the codebook SHAPE, not its contents — at
  // production sizes (100k+ codewords) every explain()/debug-log/
  // assert-message stringification of a plan containing this
  // expression would otherwise materialize MBs of doubles
  override def flatArguments: Iterator[Any] = Iterator(child,
    s"codebooks<${codebooks.length}x${codebooks.head.length}x${codebooks.head.head.length}>",
    dim)

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** `ivf_cell(vec)`: nearest coarse centroid index. Deterministic —
  * pairs with [[IvfPqCodeExpr]] as two independent columns, so a
  * pushed-down cell predicate re-evaluates only this cheap argmin
  * (nCells·dim flops), never the full encode (the reason the UDF
  * this replaces had to lie `asNondeterministic`: its single struct
  * output made any pushdown replay the whole encode per row).
  */
case class IvfCellExpr(child: Expression, coarse: Seq[Seq[Double]], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  require(coarse.nonEmpty, "ivf_cell needs at least one centroid")
  require(coarse.forall(_.length >= dim),
    s"ivf_cell: every centroid must have at least dim=$dim dimensions " +
      "(coarse and dim must come from the same model)")
  @transient private lazy val cc: Array[Array[Double]] = coarse.map(_.toArray).toArray
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivf_cell"

  override protected def nullSafeEval(v: Any): Any =
    PqOps.ivfCell(v.asInstanceOf[ArrayData], cc, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCoarse", cc, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqOps.ivfCell($c, $ref, $dim)")
  }

  // shape, not contents, in plan strings (see PqEncodeExpr)
  override def flatArguments: Iterator[Any] = Iterator(child,
    s"coarse<${coarse.length}x${coarse.head.length}>", dim)

  override protected def withNewChildInternal(newChild: Expression): IvfCellExpr =
    copy(child = newChild)
}

/** `ivfpq_code(vec)`: residual PQ code against the vector's own
  * nearest coarse cell (recomputed in-kernel — see [[IvfCellExpr]]
  * for why cell and code are separate deterministic expressions).
  */
case class IvfPqCodeExpr(
    child: Expression, coarse: Seq[Seq[Double]],
    codebooks: Seq[Seq[Seq[Double]]], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  require(coarse.nonEmpty, "ivfpq_code needs at least one centroid")
  require(codebooks.nonEmpty, "ivfpq_code needs at least one subspace codebook")
  require(dim % codebooks.length == 0,
    s"dim $dim not divisible by m=${codebooks.length} subspaces")
  require(coarse.forall(_.length >= dim),
    s"ivfpq_code: every centroid must have at least dim=$dim dimensions")
  require(codebooks.forall(_.nonEmpty),
    "ivfpq_code: every subspace codebook needs at least one codeword")
  require(codebooks.forall(_.forall(_.length >= dim / codebooks.length)),
    s"ivfpq_code: every codeword must have at least dsub=${dim / codebooks.length} dimensions")
  @transient private lazy val cc: Array[Array[Double]] = coarse.map(_.toArray).toArray
  @transient private lazy val cbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivfpq_code"

  override protected def nullSafeEval(v: Any): Any =
    PqOps.ivfPqCode(v.asInstanceOf[ArrayData], cc, cbs, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCoarse", cc, "double[][]")
    val cbRef = ctx.addReferenceObj("pqCodebooks", cbs, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqOps.ivfPqCode($c, $cRef, $cbRef, $dim)")
  }

  // shape, not contents, in plan strings (see PqEncodeExpr)
  override def flatArguments: Iterator[Any] = Iterator(child,
    s"coarse<${coarse.length}x${coarse.head.length}>",
    s"codebooks<${codebooks.length}x${codebooks.head.length}x${codebooks.head.head.length}>",
    dim)

  override protected def withNewChildInternal(newChild: Expression): IvfPqCodeExpr =
    copy(child = newChild)
}

/** `ivfpq_code_at(vec, cell)`: residual PQ code against a
  * caller-supplied coarse cell. The bulk-encode complement of
  * [[IvfPqCodeExpr]]: on a full-corpus encode pass with no cell
  * predicate to push, recomputing the coarse argmin inside the code
  * kernel doubles the nCells·dim flops — here the cell arrives as a
  * COLUMN (computed once by [[IvfCellExpr]] in the projection below),
  * and because a non-cheap expression referenced twice is never
  * inlined by CollapseProject, the argmin genuinely runs once per row.
  * [[graft.operators.Similarity.ivfPqEncode]] composes the two; a cell
  * predicate still pushes between the projections, pruning rows before
  * this kernel runs.
  */
case class IvfPqCodeAtExpr(
    left: Expression, right: Expression, coarse: Seq[Seq[Double]],
    codebooks: Seq[Seq[Seq[Double]]], dim: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(coarse.nonEmpty, "ivfpq_code_at needs at least one centroid")
  require(codebooks.nonEmpty, "ivfpq_code_at needs at least one subspace codebook")
  require(dim % codebooks.length == 0,
    s"dim $dim not divisible by m=${codebooks.length} subspaces")
  require(coarse.forall(_.length >= dim),
    s"ivfpq_code_at: every centroid must have at least dim=$dim dimensions")
  require(codebooks.forall(_.nonEmpty),
    "ivfpq_code_at: every subspace codebook needs at least one codeword")
  require(codebooks.forall(_.forall(_.length >= dim / codebooks.length)),
    s"ivfpq_code_at: every codeword must have at least dsub=${dim / codebooks.length} dimensions")
  @transient private lazy val cc: Array[Array[Double]] = coarse.map(_.toArray).toArray
  @transient private lazy val cbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivfpq_code_at"

  override protected def nullSafeEval(v: Any, cell: Any): Any =
    PqOps.ivfPqCodeAt(v.asInstanceOf[ArrayData], cell.asInstanceOf[Int], cc, cbs, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCoarse", cc, "double[][]")
    val cbRef = ctx.addReferenceObj("pqCodebooks", cbs, "double[][][]")
    defineCodeGen(ctx, ev,
      (v, cell) => s"graft.functions.PqOps.ivfPqCodeAt($v, $cell, $cRef, $cbRef, $dim)")
  }

  // shape, not contents, in plan strings (see PqEncodeExpr)
  override def flatArguments: Iterator[Any] = Iterator(left, right,
    s"coarse<${coarse.length}x${coarse.head.length}>",
    s"codebooks<${codebooks.length}x${codebooks.head.length}x${codebooks.head.head.length}>",
    dim)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IvfPqCodeAtExpr =
    copy(left = l, right = r)
}

/** All unordered element pairs of an array, in one native pass. */
object PairOps {
  // n(n-1)/2 must stay a sane in-row materialization: past ~46k
  // elements the pair count overflows Int (NegativeArraySizeException)
  // and well before that a single row holds 10⁹ structs. A basket
  // this wide means upstream pruning failed — fail with the knob to
  // turn, instead of an OOM or a silent negative-size crash. (The
  // self-join shape this kernel replaced streamed such pathologies
  // slowly; an explicit error is the honest contract for an IN-ROW
  // expansion.)
  private val MaxElems = 1 << 14 // 16384 → ≤ ~134M pairs per row

  def pairs(arr: ArrayData, et: DataType): ArrayData = {
    val n = arr.numElements()
    if (n > MaxElems) throw new IllegalArgumentException(
      s"array_pairs: input has $n elements (> $MaxElems); an in-row " +
        "pair expansion this wide means upstream pruning (e.g. " +
        "Cooccur minSupport) is too weak — raise it, or pre-split the group")
    val out = new Array[AnyRef](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = arr.get(i, et)
      var j = i + 1
      while (j < n) {
        out(idx) = org.apache.spark.sql.catalyst.InternalRow(a, arr.get(j, et))
        idx += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `array_pairs(arr)`: all (i < j) element pairs of `arr` as
  * struct<pa, pb> rows — the in-row pair-expansion kernel under
  * basket co-occurrence mining. The composed HOF form
  * (`flatten(transform(arr, (x,i) => transform(slice(arr, i+2, …),
  * y => struct(x, y))))`) evaluates its lambdas on the INTERPRETED
  * path and re-slices per outer element; on the x72 input (150 k
  * baskets → 2.4 M pairs) that measured 11 task-CPU-s where this
  * single pass is a tight two-loop copy. For a SORTED input array the
  * emitted (pa, pb) are ascending, preserving the `pa < pb` output
  * contract.
  */
case class ArrayPairsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_pairs needs an array input, got $other")
    }
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pa", elemType),
      org.apache.spark.sql.types.StructField("pb", elemType))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_pairs"

  override protected def nullSafeEval(arr: Any): Any =
    PairOps.pairs(arr.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val etRef = ctx.addReferenceObj("etype", elemType)
    defineCodeGen(ctx, ev, c => s"graft.functions.PairOps.pairs($c, $etRef)")
  }

  override protected def withNewChildInternal(c: Expression): ArrayPairsExpr =
    copy(child = c)
}

object VectorFunctions {
  def array_pairs(arr: Column): Column =
    GraftColumnBridge.column(ArrayPairsExpr(GraftColumnBridge.expression(arr)))

  def sign_lsh(vec: Column, numTables: Int, signBits: Int, dim: Int): Column =
    GraftColumnBridge.column(SignLshExpr(
      GraftColumnBridge.expression(vec), numTables, signBits, dim))

  def adc_score(code: Column, table: Column): Column =
    GraftColumnBridge.column(AdcScoreExpr(
      GraftColumnBridge.expression(code), GraftColumnBridge.expression(table)))

  def adc_score_cells(cell: Column, code: Column, tables: Column): Column =
    GraftColumnBridge.column(AdcCellScoreExpr(
      GraftColumnBridge.expression(cell), GraftColumnBridge.expression(code),
      GraftColumnBridge.expression(tables)))

  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDotExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def vec_cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecCosineExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def vec_normalize(v: Column): Column =
    GraftColumnBridge.column(VecNormalizeExpr(GraftColumnBridge.expression(v)))

  def vec_is_clean(v: Column, dim: Int): Column =
    GraftColumnBridge.column(VecIsCleanExpr(GraftColumnBridge.expression(v), dim))

  def vec_has_null(v: Column): Column =
    GraftColumnBridge.column(VecHasNullExpr(GraftColumnBridge.expression(v)))

  def vec_is_finite(v: Column): Column =
    GraftColumnBridge.column(VecIsFiniteExpr(GraftColumnBridge.expression(v)))

  def sig_eqcount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SigEqCountExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def sign_pack(v: Column): Column =
    GraftColumnBridge.column(SignPackExpr(GraftColumnBridge.expression(v)))

  def pq_encode(vec: Column, codebooks: Seq[Seq[Seq[Double]]], dim: Int): Column =
    GraftColumnBridge.column(PqEncodeExpr(
      GraftColumnBridge.expression(vec), codebooks, dim))

  def ivf_cell(vec: Column, coarse: Seq[Seq[Double]], dim: Int): Column =
    GraftColumnBridge.column(IvfCellExpr(
      GraftColumnBridge.expression(vec), coarse, dim))

  def ivfpq_code(
      vec: Column, coarse: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], dim: Int): Column =
    GraftColumnBridge.column(IvfPqCodeExpr(
      GraftColumnBridge.expression(vec), coarse, codebooks, dim))

  def ivfpq_code_at(
      vec: Column, cell: Column, coarse: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], dim: Int): Column =
    GraftColumnBridge.column(IvfPqCodeAtExpr(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(cell),
      coarse, codebooks, dim))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  import graft.functions.SqlBuilders.nArgs

  /** SQL registration via GraftExtensions. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotExpr].getName, "vec_dot"),
      nArgs("vec_dot", 2)(exprs => VecDotExpr(exprs(0), exprs(1)))),
    (FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosineExpr].getName, "vec_cosine"),
      nArgs("vec_cosine", 2)(exprs => VecCosineExpr(exprs(0), exprs(1)))),
    (FunctionIdentifier("sig_eqcount"),
      new ExpressionInfo(classOf[SigEqCountExpr].getName, "sig_eqcount"),
      nArgs("sig_eqcount", 2)(exprs => SigEqCountExpr(exprs(0), exprs(1)))),
    (FunctionIdentifier("adc_score"),
      new ExpressionInfo(classOf[AdcScoreExpr].getName, "adc_score"),
      nArgs("adc_score", 2)(exprs => AdcScoreExpr(exprs(0), exprs(1)))),
    (FunctionIdentifier("adc_score_cells"),
      new ExpressionInfo(classOf[AdcCellScoreExpr].getName, "adc_score_cells"),
      nArgs("adc_score_cells", 3)(exprs => AdcCellScoreExpr(exprs(0), exprs(1), exprs(2)))),
    (FunctionIdentifier("sign_pack"),
      new ExpressionInfo(classOf[SignPackExpr].getName, "sign_pack"),
      nArgs("sign_pack", 1)(exprs => SignPackExpr(exprs.head))),
    (FunctionIdentifier("vec_normalize"),
      new ExpressionInfo(classOf[VecNormalizeExpr].getName, "vec_normalize"),
      nArgs("vec_normalize", 1)(exprs => VecNormalizeExpr(exprs.head))))
}
