package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.12). Two paths:
  *
  *  - brute force: cosine against the query via codegen'd higher-order
  *    functions, then `orderBy.limit(k)` which Spark plans as
  *    TakeOrderedAndProject — per-partition top-k heaps, only k rows
  *    per partition reach the driver. Correct baseline at any scale;
  *    cost is one full scan.
  *  - sign-LSH bucketed: deterministic random-hyperplane signature
  *    restricts the scan to buckets within `probeHamming` of the query
  *    signature. At 100 TB with the table written bucket-partitioned,
  *    bucket pruning turns the full scan into a few partition reads.
  */
object Similarity {

  import Dedup.cosine

  /** Exact top-k by cosine against a literal query vector. */
  def bruteForceTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  private[operators] def signSignature(vecCol: Column, dim: Int, signBits: Int): Column = {
    val rnd = new scala.util.Random(42)
    val planes = Array.fill(signBits, dim)(rnd.nextGaussian())
    udf((v: Seq[Float]) => {
      if (v == null) 0L
      else {
        var sig = 0L; var b = 0
        while (b < signBits) {
          var s = 0.0; var i = 0
          val p = planes(b)
          while (i < math.min(dim, v.length)) { s += p(i) * v(i); i += 1 }
          if (s > 0) sig |= (1L << b)
          b += 1
        }
        sig
      }
    }).apply(vecCol)
  }

  /** ANN top-k: scan only rows whose LSH bucket is within
    * `probeHamming` bits of the query's bucket, then exact cosine.
    */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, dim: Int,
      signBits: Int = 8, probeHamming: Int = 1): DataFrame = {
    val qSig = {
      val rnd = new scala.util.Random(42)
      val planes = Array.fill(signBits, dim)(rnd.nextGaussian())
      var sig = 0L; var b = 0
      while (b < signBits) {
        var s = 0.0; var i = 0
        while (i < math.min(dim, query.length)) { s += planes(b)(i) * query(i); i += 1 }
        if (s > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
    df.withColumn("__bucket", signSignature(col(vecCol), dim, signBits))
      .filter(bit_count(col("__bucket").bitwiseXOR(lit(qSig))) <= probeHamming)
      .select(col(idCol), cosine(col(vecCol), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
