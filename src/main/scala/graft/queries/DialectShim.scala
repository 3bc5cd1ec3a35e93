package graft.queries

/** Mechanical DuckDB→Spark-SQL dialect shims for the declared oracle
  * corpus (SURVEY §2.13 allows exactly these). The oracle strings are
  * written in the portable intersection; the handful of spots where the
  * engines genuinely differ rewrite 1:1:
  *
  *  - `epoch_us(x)`            → `unix_micros(x)`
  *  - `date_diff('day', a, b)` → `datediff(b, a)`  (argument order!)
  *  - `list_sort`/`string_split`/`array_to_string`/`len`
  *                             → `array_sort`/`split`/`concat_ws`/`size`
  *
  * With these applied, every oracle query also runs through
  * `spark.sql(...)` and must match the DataFrame implementation —
  * proving the engine's SQL surface (`SqlParitySpec`).
  */
object DialectShim {

  def toSparkSql(duckSql: String): String = {
    var s = duckSql
    // bare VARCHAR is not a Spark type; TIMESTAMP must stay naive (the
    // tables carry TIMESTAMP_NTZ); epoch_us needs an LTZ input in Spark
    // (identity under the UTC session)
    s = s.replaceAll("""AS VARCHAR\)""", "AS STRING)")
    s = s.replaceAll("""AS TIMESTAMP\)""", "AS TIMESTAMP_NTZ)")
    val eu = """epoch_us\(""".r
    while (eu.findFirstIn(s).isDefined) {
      val m = eu.findFirstMatchIn(s).get
      val (arg, end) = splitOneArg(s, m.end)
      s = s.substring(0, m.start) + s"unix_micros(cast($arg as timestamp))" + s.substring(end + 1)
    }
    // DuckDB regexp_extract_all defaults to group 0; Spark to group 1
    s = s.replaceAll("""regexp_extract_all\(([^,]+),\s*('(?:[^'])*')\)""",
      "regexp_extract_all($1, $2, 0)")
    // the rewrite's simple-arg pattern cannot see a comma-bearing
    // first argument or an escaped-quote pattern — a miss there used
    // to pass through UNREWRITTEN and run with Spark's group-1
    // default, a silent wrong-answer in the parity gate (r20 review):
    // any two-arg call left after the rewrite is a loud error instead
    require(!"""regexp_extract_all\((?:[^()']|'(?:[^'])*'|\([^()]*\))*\)"""
        .r.findAllIn(s).exists(c => !c.matches(""".*,\s*\d+\s*\)""")),
      "DialectShim: a regexp_extract_all call is too complex for the " +
        "group-0 rewrite (comma in the first argument, or an escaped " +
        "quote in the pattern) — add the explicit group argument in " +
        s"the oracle SQL itself: $s")
    // date_diff('day', a, b) -> datediff(b, a): swap the two args
    val dd = """date_diff\('day',\s*""".r
    while (dd.findFirstIn(s).isDefined) {
      val m = dd.findFirstMatchIn(s).get
      val (args, end) = splitTwoArgs(s, m.end)
      s = s.substring(0, m.start) + s"datediff(${args._2}, ${args._1})" + s.substring(end + 1)
    }
    s = s.replaceAll("""\blist_sort\(""", "array_sort(")
    s = s.replaceAll("""\bstring_split\(""", "split(")
    s = s.replaceAll("""\barray_to_string\(""", "concat_ws_rev(") // placeholder, fixed below
    // DuckDB array_to_string(list, sep) == Spark concat_ws(sep, list):
    // swap arguments
    val cw = """concat_ws_rev\(""".r
    while (cw.findFirstIn(s).isDefined) {
      val m = cw.findFirstMatchIn(s).get
      val (args, end) = splitTwoArgs(s, m.end)
      s = s.substring(0, m.start) + s"concat_ws(${args._2}, ${args._1})" + s.substring(end + 1)
    }
    s = s.replaceAll("""\blen\(""", "size(")
    s = s.replaceAll("""\bquantile_cont\(""", "percentile(")
    s = s.replaceAll("""\bjson_extract_string\(""", "get_json_object(")
    // DuckDB vector SQL → the engine's injected native kernels
    s = s.replaceAll("""\blist_cosine_similarity\(""", "vec_cosine(")
    s = s.replaceAll("""AS DOUBLE\[\]\)""", "AS ARRAY<DOUBLE>)")
    s = s.replaceAll("""\bregexp_split_to_array\(""", "split(")
    s = s.replaceAll("""\bregexp_matches\(""", "regexp_like(")
    s = s.replaceAll("""\blist_intersect\(""", "array_intersect(")
    s = s.replaceAll("""\blist_contains\(""", "array_contains(")
    s = s.replaceAll("""\blist_filter\(""", "filter(")
    s = s.replaceAll("""\blist_distinct\(""", "array_distinct(")
    // SCOPE: valid only for SELECT-position, single-generator unnest —
    // every current oracle qualifies. A future FROM-clause / LATERAL
    // unnest, or two unnests in one SELECT (Spark allows one generator
    // per SELECT), would rewrite into a Spark analysis error; extend to
    // a LATERAL VIEW rewrite then, don't widen this regex.
    s = s.replaceAll("""\bunnest\(""", "explode(")
    // DuckDB list literal ['a','b'] / [CAST(...), ...] → Spark
    // array(...). Only when the content starts with a quote or CAST —
    // regex character classes like [A-Za-z0-9] must pass through.
    s = s.replaceAll("""\[(\s*'[^\[\]]*')\]""", "array($1)")
    s = s.replaceAll("""\[(\s*CAST\([^\[\]]+)\]""", "array($1)")
    // Spark SQL string literals eat single backslashes ('\s+' parses to
    // "s+"); DuckDB keeps them. Double them for Spark's parser.
    s = s.replaceAll("""\\s\+""", """\\\\s+""")
    // DuckDB encode(str) → Spark encode(str, 'UTF-8'); octet_length
    // then works on the binary in both engines
    val en = """\bencode\(""".r
    var searchFrom = 0
    var m = en.findFirstMatchIn(s.substring(searchFrom)).map(x => (x.start + searchFrom, x.end + searchFrom))
    while (m.isDefined) {
      val (mStart, mEnd) = m.get
      val (arg, end) = splitOneArg(s, mEnd)
      if (arg.contains("'UTF-8'")) searchFrom = mEnd
      else {
        s = s.substring(0, mStart) + s"encode($arg, 'UTF-8')" + s.substring(end + 1)
        searchFrom = mStart + s"encode($arg, 'UTF-8')".length
      }
      m = en.findFirstMatchIn(s.substring(searchFrom)).map(x => (x.start + searchFrom, x.end + searchFrom))
    }
    s
  }

  /** Scan "a)" starting at `from`; returns (a, index of closing paren). */
  private def splitOneArg(s: String, from: Int): (String, Int) = {
    var depth = 0
    var i = from
    var inQuote = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inQuote = !inQuote
      else if (!inQuote) {
        if (c == '(') depth += 1
        else if (c == ')') {
          if (depth == 0) return (s.substring(from, i).trim, i)
          depth -= 1
        }
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced args at $from in: $s")
  }

  /** Split "a, b)" starting at `from` into its two top-level arguments;
    * returns ((a, b), index of the closing paren).
    */
  private def splitTwoArgs(s: String, from: Int): ((String, String), Int) = {
    var depth = 0
    var i = from
    var commaAt = -1
    var inQuote = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inQuote = !inQuote
      else if (!inQuote) {
        if (c == '(') depth += 1
        else if (c == ')') {
          if (depth == 0)
            return ((s.substring(from, commaAt).trim, s.substring(commaAt + 1, i).trim), i)
          depth -= 1
        } else if (c == ',' && depth == 0 && commaAt < 0) commaAt = i
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced args at $from in: $s")
  }
}
