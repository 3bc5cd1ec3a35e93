package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token n-gram kernel — the gram producer under the dedup span census
  * (x68/x88/x97), DSIR bucketing (x69), and repetition scoring.
  *
  * Why native: the composed form
  * `transform(sequence(1, greatest(size(t)-(n-1), 1)),
  *            i => array_join(slice(t, i, n), " "))`
  * with `t = split(lower(trim(text)), "\s+")` is a higher-order
  * function, and HOF lambdas evaluate on the INTERPRETED path — where
  * common-subexpression elimination does not apply, so the captured
  * `split` re-tokenizes the whole document once per array ELEMENT:
  * O(tokens²) regex work per document. Measured on the sf0.1 corpus
  * (5k docs), the interpreted HOF costs ~26 CPU-s in x69's three gram
  * passes and dominates the span-census family. This expression
  * produces the identical array in ONE pass per row and stays inside
  * whole-stage codegen.
  */
object TextOps {

  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val space = UTF8String.fromString(" ")

  /** Positional n-grams of `split(lower(trim(text)), "\s+")`, each
    * `n` consecutive tokens joined by " ".
    *
    * `stride = 1` (n-grams): positions `0 .. max(len-n, 0)` — a
    * shorter-than-n document yields ONE (short) gram, exactly like the
    * `greatest(…, 1)`+`slice` form. `stride = n` (chunking): positions
    * `0, n, 2n, …` — `max(ceil(len/n), 1)` chunks, the last one the
    * (possibly short) remainder, exactly like [[TextAnalysis
    * .chunkTokens]]'s `ceil`+`slice` form. `trim`/`toLowerCase` are
    * the UTF8String methods Spark's own `StringTrim`/`Lower` call, and
    * `Pattern.split(s, -1)` is the exact path of `split(str, regex)`
    * with its default -1 limit, so tokens are bit-identical to the
    * composed forms.
    */
  def tokenNgrams(u: UTF8String, n: Int, stride: Int): ArrayData = {
    val parts = ws.split(u.trim().toLowerCase().toString, -1)
    val len = parts.length
    val count =
      if (stride == 1) math.max(len - n + 1, 1)
      else math.max((len + stride - 1) / stride, 1)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      val start = i * stride
      val end = math.min(start + n, len)
      if (end - start == 1) out(i) = UTF8String.fromString(parts(start))
      else {
        val gram = new Array[UTF8String](end - start)
        var j = start
        while (j < end) { gram(j - start) = UTF8String.fromString(parts(j)); j += 1 }
        out(i) = UTF8String.concatWs(space, gram: _*)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `token_ngrams(text, n[, stride])` — see [[TextOps.tokenNgrams]].
  * `n` and `stride` are plan-time constants (embedded in the generated
  * code), matching every call site's literals. Only `stride == 1`
  * (sliding n-grams) and `stride == n` (chunking) are meaningful
  * shapes here; anything else is a call-site bug.
  */
case class TokenNgramsExpr(child: Expression, n: Int, stride: Int = 1)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"n must be >= 1, got $n")
  require(stride == 1 || stride == n,
    s"stride must be 1 (n-grams) or n (chunks), got stride=$stride n=$n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_ngrams"

  override protected def nullSafeEval(s: Any): Any =
    TextOps.tokenNgrams(s.asInstanceOf[UTF8String], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextOps.tokenNgrams($c, $n, $stride)")

  override protected def withNewChildInternal(c: Expression): TokenNgramsExpr =
    copy(child = c)
}

object TextFunctions {
  def token_ngrams(text: Column, n: Int): Column =
    GraftColumnBridge.column(TokenNgramsExpr(GraftColumnBridge.expression(text), n))

  /** Consecutive `chunkSize`-token chunks (stride = n). */
  def token_chunks(text: Column, chunkSize: Int): Column =
    GraftColumnBridge.column(TokenNgramsExpr(
      GraftColumnBridge.expression(text), chunkSize, chunkSize))
}
