package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The native [[TokenNgramsExpr]] must be BIT-IDENTICAL to the
  * composed form it replaced
  * (`transform(sequence(1, greatest(size(t)-(n-1), 1)),
  *             i => array_join(slice(t, i, n), " "))`,
  * `t = split(lower(trim(text)), "\s+")`) — x68/x69/x88/x97's oracles
  * were written against that form's boundary behavior.
  */
class TokenNgramsSpec extends SparkTestBase {

  private def composed(text: org.apache.spark.sql.Column, n: Int) = {
    val t = split(lower(trim(text)), "\\s+")
    transform(
      sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
      i => array_join(slice(t, i, lit(n)), " "))
  }

  private val edgeCases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one",                       // shorter than any n > 1
    "two words",
    "",                          // empty → [""]
    "   leading and trailing   ",
    "MIXED Case TOKENS",
    "tabs\tand\nnewlines\r\nsplit  too",
    "unicode Ωμέγα ΣΙΓΜΑ tokens",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "repeat repeat repeat repeat repeat")

  test("native kernel equals the composed HOF form on edge cases, n in 1..9") {
    import spark.implicits._
    val df = edgeCases.toDF("text")
    Seq(1, 2, 3, 5, 8, 9).foreach { n =>
      val diff = df.select(
          TextFunctions.token_ngrams(col("text"), n).as("fast"),
          composed(col("text"), n).as("slow"))
        .where(not(col("fast") === col("slow")))
      assert(diff.isEmpty, s"n=$n: ${diff.collect().mkString("; ")}")
    }
  }

  test("native kernel equals the composed form on the real corpus (n=2 DSIR, n=8 spans)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    Seq(2, 8).foreach { n =>
      val diff = docs.select(
          TextFunctions.token_ngrams(col("text"), n).as("fast"),
          composed(col("text"), n).as("slow"))
        .where(not(col("fast") === col("slow")))
      assert(diff.isEmpty, s"n=$n mismatch on corpus")
    }
  }

  private def composedChunks(text: org.apache.spark.sql.Column, chunkSize: Int) = {
    val t = split(lower(trim(text)), "\\s+")
    val nChunks = greatest(
      ceil(size(t).cast("double") / chunkSize).cast("int"), lit(1))
    transform(sequence(lit(1), nChunks),
      i => array_join(slice(t, (i - 1) * chunkSize + 1, lit(chunkSize)), " "))
  }

  test("stride-n chunking equals the composed ceil+slice form (edge cases + corpus)") {
    import spark.implicits._
    val df = edgeCases.toDF("text")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    Seq(1, 2, 5, 512).foreach { cs =>
      Seq(df.select(col("text")), docs.select(col("text"))).foreach { src =>
        val diff = src.select(
            TextFunctions.token_chunks(col("text"), cs).as("fast"),
            composedChunks(col("text"), cs).as("slow"))
          .where(not(col("fast") === col("slow")))
        assert(diff.isEmpty, s"chunkSize=$cs: ${diff.collect().take(3).mkString("; ")}")
      }
    }
  }

  test("property: native == composed on generated texts (whitespace/unicode/case soup)") {
    import org.scalacheck.{Gen, rng}
    import spark.implicits._
    val token = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("Σ", "ω", "文", "-", "..", "#tag", "a.b,c", "MiXeD"),
      Gen.const(""))                       // adjacent separators collapse
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val textGen = for {
      toks <- Gen.listOfN(12, token)
      seps <- Gen.listOfN(12, sep)
      pad <- Gen.oneOf("", " ", "\t")
    } yield pad + toks.zip(seps).map { case (t, s) => t + s }.mkString + pad
    val params = Gen.Parameters.default
    val texts = (0 until 60).map(i => textGen.pureApply(params, rng.Seed(1700L + i)))
    val df = texts.toDF("text")
    Seq(1, 2, 3, 8).foreach { n =>
      val diff = df.select(col("text"),
          TextFunctions.token_ngrams(col("text"), n).as("fast"),
          composed(col("text"), n).as("slow"))
        .where(not(col("fast") === col("slow")))
      assert(diff.isEmpty,
        s"n=$n: ${diff.collect().take(2).map(_.toString).mkString("; ")}")
      val diffC = df.select(
          TextFunctions.token_chunks(col("text"), n).as("fast"),
          composedChunks(col("text"), n).as("slow"))
        .where(not(col("fast") === col("slow")))
      assert(diffC.isEmpty, s"chunk n=$n mismatch")
    }
  }

  test("null text yields null; the plan stays whole-stage codegen with no lambda") {
    import spark.implicits._
    // null propagation (a local relation folds at plan time — fine,
    // it exercises the interpreted eval path)
    val rows = Seq[Option[String]](None, Some("a b c")).toDF("text")
      .select(TextFunctions.token_ngrams(col("text"), 2).as("g"))
      .collect()
    assert(rows.map(_.isNullAt(0)).toSeq == Seq(true, false))
    // plan shape over a real scan: whole-stage codegen, no HOF lambda
    val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextFunctions.token_ngrams(col("text"), 8).as("g"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` is the whole-stage-codegen marker in the simple plan string
    assert(plan.contains("*(1) Project [token_ngrams("), plan.take(800))
    assert(!plan.toLowerCase.contains("lambdafunction"), plan.take(800))
  }
}
