package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StringFunctions

/** Fuzzy entity matching (record linkage): find pairs of rows whose
  * name strings are nearly — but not necessarily exactly — equal.
  *
  * Classic blocking design: an all-pairs similarity join is O(n²) and
  * unrunnable at corpus scale, so candidates are restricted to pairs
  * sharing a cheap deterministic blocking key (brand + first name
  * token, a phonetic code, a sorted-token prefix …). The plan is then
  * two hash exchanges on the block key and a within-block equi-join —
  * cost Σ|block|², bounded by the largest block, NOT by n². Block-key
  * choice is the scale contract: keys must keep the largest block
  * small (the classic record-linkage trade-off between recall and
  * cost); a skewed key explodes quadratically, which AQE's skew-join
  * split mitigates but cannot eliminate.
  *
  * The verify step scores each candidate pair with the native
  * codegen'd [[graft.functions.JaroWinklerExpr]] — one kernel call per
  * pair, inside whole-stage codegen, no string boxing.
  */
object FuzzyMatch {

  /** Candidate pairs of `df` rows sharing `blockKey` with
    * `jaro_winkler_similarity(name) >= minScore`, each pair once
    * (`a < b` on `idCol`). Output: `a`, `b`, `a_name`, `b_name`,
    * `score`.
    */
  def blockedSelfMatch(
      df: DataFrame, idCol: String, nameCol: String, blockKey: Column,
      minScore: Double): DataFrame = {
    val keyed = df.select(blockKey.as("block"), col(idCol).as("id"), col(nameCol).as("name"))
    val a = keyed.select(col("block"), col("id").as("a"), col("name").as("a_name"))
    val b = keyed.select(col("block"), col("id").as("b"), col("name").as("b_name"))
    // The join OUTPUT (Σ|block|² candidate pairs) is far larger than its
    // input, so parallelism must come from the probe side's partitioning,
    // not the input file layout: a small dim side broadcasts and a BHJ
    // inherits the scan's partitions — one small file = ONE task doing
    // every pairwise score (measured 4.3 s serial vs 0.3 s spread at
    // sf0.1). Pin an explicit block-keyed exchange: explicit N so AQE's
    // input-byte-based coalescing (blind to expansion) can't fold it
    // back to one partition; block-keyed so per-task expansion stays
    // whole-block-bounded and a shuffled-join fallback is co-partitioned.
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    a.repartition(parts, col("block")).join(b, "block")
      .where(col("a") < col("b"))
      .withColumn("score", StringFunctions.jaro_winkler_similarity(col("a_name"), col("b_name")))
      .where(col("score") >= minScore)
      .drop("block")
  }
}
