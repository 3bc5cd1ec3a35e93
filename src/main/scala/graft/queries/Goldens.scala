package graft.queries

/** Loader for the VALUES-golden oracle tables under
  * `src/main/resources/goldens/`.
  *
  * The signature-family operators (MinHash/LSH, SimHash, winnowing,
  * sign-LSH) are not expressible in DuckDB SQL — their hash kernels
  * (splitmix64, FNV-1a, xxHash64, java.util.Random streams) don't
  * exist there. Their oracles are instead pinned as VALUES goldens
  * produced by `tools/golden_ext.py`: an INDEPENDENT from-spec Python
  * reimplementation of the same public algorithms (JDK LCG javadoc,
  * FNV, xxHash spec, SplittableRandom finalizer). Agreement between
  * the two implementations is a genuine two-implementation check; the
  * goldens are regenerated from the sf0.01 parquet, which is the scale
  * the driver verifies at.
  */
object Goldens {

  /** Rows of a golden TSV resource. */
  def rows(resource: String): Seq[Array[String]] = {
    val in = getClass.getResourceAsStream(s"/goldens/$resource")
    require(in != null, s"missing golden resource $resource")
    // split limit -1: the default drops TRAILING empty fields, so a
    // golden row whose last column is an empty string would lose
    // columns and break the VALUES arity. Only TRAILING empty lines
    // are dropped (the file's final newline); an INTERIOR empty line
    // is a real row — for a single-column golden it is an
    // empty-string value, and a blanket nonEmpty filter silently
    // deleted it, shorting the oracle by one row (r20 review). In a
    // multi-column golden an interior empty line now breaks the
    // VALUES arity LOUDLY instead of vanishing.
    try {
      val all = scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toIndexedSeq
      all.reverse.dropWhile(_.isEmpty).reverse.map(_.split("\t", -1))
    } finally in.close()
  }

  /** `(VALUES (...), ...) AS t(c1, c2, ...)` with per-column SQL types
    * so DuckDB's arrow schema matches Spark's parquet schema exactly
    * (bare integer literals would come back INT32, bare decimals
    * DECIMAL). `cols` maps name -> DuckDB cast type, in TSV order.
    */
  def valuesTable(resource: String, cols: Seq[(String, String)]): String = {
    val rs = rows(resource)
    // an empty golden must still be valid SQL — "(VALUES ) AS ..." is
    // not. Surfaced regenerating goldens at sf0.1 (r14): winnowing has
    // zero collision pairs there, and the x17 oracle would have become
    // a parse error instead of an empty table.
    if (rs.isEmpty) {
      val sel = cols.map { case (n, t) => s"CAST(NULL AS $t) AS $n" }
        .mkString(", ")
      return s"(SELECT $sel WHERE false) AS __g"
    }
    val body = rs.map { r =>
      r.zip(cols).map { case (v, (_, t)) =>
        if (v == "\\N") s"CAST(NULL AS $t)"
        else if (t == "VARCHAR") "'" + v.replace("'", "''") + "'"
        // string-cast doubles: DuckDB parses a bare numeric literal as
        // DECIMAL first, which can be off by one ulp from the correctly
        // rounded value; VARCHAR -> DOUBLE is correctly rounded
        else if (t == "DOUBLE") s"'$v'::DOUBLE"
        else s"CAST($v AS $t)"
      }.mkString("(", ", ", ")")
    }.mkString(",\n  ")
    s"(VALUES\n  $body) AS __g(${cols.map(_._1).mkString(", ")})"
  }
}
