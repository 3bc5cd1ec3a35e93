package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity kernels for fuzzy entity matching (record
  * linkage). The score runs once per CANDIDATE PAIR inside the blocked
  * self-join — the hot path of entity resolution at scale — so it is a
  * native codegen'd expression over the raw UTF-8 bytes: no String
  * materialization, no boxing, stays inside whole-stage codegen next
  * to the join.
  */
object StrOps {

  /** Jaro similarity over UTF-8 bytes, bit-identical to DuckDB's
    * `jaro_similarity` (calibrated on 4k random pairs): match window
    * `max(l1,l2)/2 - 1`, greedy first-free-match, half-transposition
    * count, and the exact double-op order
    * `(m/l1 + m/l2 + (m-t)/m) / 3`. Byte-wise comparison matches
    * DuckDB's byte semantics (identical to char-wise for ASCII keys).
    * Empty-vs-anything — including empty-vs-empty — scores 0.
    */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    var window = math.max(l1, l2) / 2 - 1
    if (window < 0) window = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t) / md) / 3.0
  }

  /** Jaro-Winkler, bit-identical to DuckDB's
    * `jaro_winkler_similarity`: prefix boost `j + l*0.1*(1-j)` with
    * common-prefix cap 4, applied only when jaro > 0.7 (the classic
    * boost threshold — DuckDB keeps it, several other engines don't).
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val s1 = a.getBytes
    val s2 = b.getBytes
    val n = math.min(math.min(s1.length, s2.length), 4)
    var l = 0
    while (l < n && s1(l) == s2(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** `jaro_winkler_similarity(a, b)` — registered under DuckDB's exact
  * function name so parity oracles run unchanged on both engines.
  */
case class JaroWinklerExpr(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StrOps.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrOps.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerExpr =
    copy(left = l, right = r)
}

object StringFunctions {
  def jaro_winkler_similarity(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinklerExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** SQL registration via GraftExtensions. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("jaro_winkler_similarity"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler_similarity"),
      SqlBuilders.nArgs("jaro_winkler_similarity", 2)(
        exprs => JaroWinklerExpr(exprs(0), exprs(1)))))
}
