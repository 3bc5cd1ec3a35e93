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
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
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

  def eqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
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

/** `vec_dot(a, b)`: float-array dot product. */
case class VecDotExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotExpr =
    copy(left = l, right = r)
}

/** `vec_cosine(a, b)`: float-array cosine similarity. */
case class VecCosineExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosineExpr =
    copy(left = l, right = r)
}

object VectorFunctions {
  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDotExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def vec_cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecCosineExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def sig_eqcount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SigEqCountExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** SQL registration via GraftExtensions. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotExpr].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDotExpr(exprs(0), exprs(1))),
    (FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosineExpr].getName, "vec_cosine"),
      (exprs: Seq[Expression]) => VecCosineExpr(exprs(0), exprs(1))),
    (FunctionIdentifier("sig_eqcount"),
      new ExpressionInfo(classOf[SigEqCountExpr].getName, "sig_eqcount"),
      (exprs: Seq[Expression]) => SigEqCountExpr(exprs(0), exprs(1))))
}
