package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** removeDupSpans edge semantics: untouched docs keep their exact
  * (normalized) text, fully-covered docs come out empty, and partial
  * coverage drops exactly the covered positions.
  */
class DupSpanRemovalSpec extends SparkTestBase {

  private def md5Of(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("doc with no shared span keeps its normalized text verbatim") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 4L))
    assert(out(0).getString(2) == md5Of("alpha beta gamma delta"))
  }

  test("identical docs are fully covered and come out empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four"),
      (2L, "one two three four")).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 0L))
    assert(out.forall(_.getString(2) == md5Of("")))
  }

  test("partial overlap drops only the covered positions") {
    import spark.implicits._
    // the shared 3-gram "x y z" sits at positions 3..5 of doc 1 and
    // 1..3 of doc 2; everything else is unique
    val docs = Seq(
      (1L, "aa bb x y z cc"),
      (2L, "x y z dd ee ff")).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 3L)
    assert(out(0).getString(2) == md5Of("aa bb cc"))
    assert(out(1).getLong(1) == 3L)
    assert(out(1).getString(2) == md5Of("dd ee ff"))
  }
}
