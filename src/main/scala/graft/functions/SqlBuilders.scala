package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared helper for `SparkSessionExtensions.injectFunction` builders.
  *
  * A builder that indexes `exprs(i)` directly surfaces a wrong-arity SQL
  * call (`SELECT st_intersects(geom)`) as a raw IndexOutOfBoundsException
  * from inside analysis; wrapping it here turns that into a clear
  * wrong-argument-count message naming the function.
  */
object SqlBuilders {
  def nArgs(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument(s), got ${exprs.length}")
      f(exprs)
    }

  /** A string as a Spark SQL single-quoted literal — for the few places
    * that build `selectExpr` strings from user-supplied names (stage
    * names, column names): an unescaped quote is a ParseException at
    * best and an injection vector at worst.
    */
  def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** A name as a backtick-quoted Spark SQL identifier (column names
    * with spaces/dots/hyphens are routine in ingested data).
    */
  def quoteId(s: String): String = "`" + s.replace("`", "``") + "`"
}
