package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The fused [[MinhashSignatureExpr]] must reproduce the two-UDF chain
  * it replaced bit-for-bit: FNV-1a(+murmur avalanche) over each k-char
  * window of `trim.toLowerCase`, then min over shingles of
  * `splitmix64(h ^ seed_i)` with seeds from `Random(42)`. The expected
  * values here are an INDEPENDENT in-test re-implementation of that
  * contract (not a call back into the kernel), and the x03/x05 VALUES
  * goldens pin the same math end-to-end through LSH.
  */
class MinhashSignatureSpec extends SparkTestBase {

  // independent reference: the exact published chain, in plain Scala
  private def refSignature(raw: String, numHashes: Int, k: Int): Array[Long] = {
    def mix64(x0: Long): Long = {
      var z = x0
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val rnd = new scala.util.Random(42)
    val seeds = Array.fill(numHashes)(rnd.nextLong())
    val out = Array.fill(numHashes)(Long.MaxValue)
    if (raw != null) {
      val s = raw.trim.toLowerCase
      val n = math.max(1, s.length - k + 1)
      var i = 0
      while (i < n) {
        var h = 0xcbf29ce484222325L
        var j = i
        val end = math.min(s.length, i + k)
        while (j < end) { h ^= s.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
        h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
        var q = 0
        while (q < numHashes) {
          val v = mix64(h ^ seeds(q))
          if (v < out(q)) out(q) = v
          q += 1
        }
        i += 1
      }
    }
    out
  }

  test("fused kernel equals the independent reference on edge cases and the corpus") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox", "abc", "ab", "", "   padded   ",
      // non-space whitespace at the boundaries: kernel and verify path
      // must strip ALL of it (Java-trim semantics) — UTF8String.trim
      // strips ASCII 0x20 only and would shingle different windows
      "\tabc\n", "\r\n padded \t\r", "\t\t", "a\tb",
      "MIXED Case ΣΙΓΜΑ", "aaaaaaaaaaaaaaa", "x") ++
      graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .select("text").limit(40).collect().map(_.getString(0)).toSeq
    val got = texts.toDF("text")
      .select(TextFunctions.minhash_signature(col("text"), 64, 5).as("sig"))
      .collect().map(_.getSeq[Long](0).toArray)
    texts.zip(got).foreach { case (t, sig) =>
      assert(sig.sameElements(refSignature(t, 64, 5)), s"mismatch on '${t.take(30)}'")
    }
  }

  test("null text carries the empty-set signature (all MaxValue), not NULL") {
    import spark.implicits._
    val rows = Seq[Option[String]](None, Some("abcdef")).toDF("text")
      .select(TextFunctions.minhash_signature(col("text"), 16, 5).as("sig"))
      .collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(0).getSeq[Long](0).forall(_ == Long.MaxValue))
    assert(rows(1).getSeq[Long](0).exists(_ != Long.MaxValue))
  }

  test("the plan stays whole-stage codegen over a real scan") {
    val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextFunctions.minhash_signature(col("text"), 64, 5).as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [minhash_signature("), plan.take(600))
  }
}
