package graft.tools

/** Dump the driver-contract entry list for the round-open gate
  * (`tools/round_open.sh`): one query name per line to the file given
  * as arg 0, plus `oracle:<name>` lines for the oracleSql keys. The
  * gate diffs these against the latest CORRECTNESS_r*.json — entry-
  * list drift in EITHER direction (a query the driver never verified,
  * or a verified name that silently vanished from the contract) is how
  * a correctness regression hides behind a green gate. File output,
  * not stdout: sbt's forked-run [info] prefixing would otherwise need
  * fragile stripping.
  */
object ListQueries {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: ListQueries <outfile>")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val oracles = graft.SparkEntry.oracleSql.keys.toSeq.sorted
    val out = new java.io.PrintWriter(args(0))
    try {
      names.foreach(out.println)
      oracles.foreach(n => out.println(s"oracle:$n"))
    } finally out.close()
  }
}
