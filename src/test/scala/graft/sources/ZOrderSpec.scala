package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Z-order clustering: kernel correctness and the actual data-skipping
  * win — a pushed two-dimensional range filter over the z-ordered
  * layout must read far fewer rows out of the scan (row-group pruning
  * on parquet min/max stats) than the same filter over an unclustered
  * layout of the same data.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits (scalar cross-check)") {
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L))
      .toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b", 8).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1), 8),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // z-order locality sanity: quadrants sort together
    assert(morton(0, 0, 8) < morton(1, 1, 8) && morton(1, 1, 8) < morton(0, 2, 8))
  }

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.get
  }

  test("zValue on INT columns: no sign-bit wrap at bits=16, no mod-32 aliasing above") {
    import spark.implicits._
    // old code shifted in 32-bit int space: bits=16 put b's bit 15 at
    // position 31 (sign), splitting the curve at the wrap; bits=20
    // shifted by 38 ≡ 6 (mod 32), aliasing distinct cells
    val df = Seq((0, 40000), (524288, 0), (8, 0)).toDF("a", "b")
    val z16 = df.select(graft.sources.Layout.zValue($"a", $"b", 16).as("z"))
      .collect().map(_.getLong(0))
    assert(z16.forall(_ >= 0L), z16.toSeq)
    val z20 = df.select(graft.sources.Layout.zValue($"a", $"b", 20).as("z"))
      .collect().map(_.getLong(0))
    // (2^19, 0) and (2^3, 0) collided under mod-32 shifts (both 64)
    assert(z20(1) != z20(2), s"aliased: ${z20.toSeq}")
    assert(z20(1) == (1L << 38), z20(1))
  }

  test("z-ordered layout prunes row groups a random layout cannot") {
    val n = 40000
    val rnd = new scala.util.Random(42)
    val data = (1 to n).map(_ => (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    // unclustered: shuffled round-robin, every file spans the full space
    data.repartition(16).write.parquet(s"$base/random")
    Layout.writeZOrdered(data, s"$base/zorder", "x", "y", files = 16, bits = 10)

    def query(dir: String) = spark.read.parquet(dir)
      .filter($"x" >= 100 && $"x" < 200 && $"y" >= 300 && $"y" < 400)
    val expected = query(s"$base/random").count()
    assert(query(s"$base/zorder").count() == expected)   // same answer

    val randomRows = scanOutputRows(query(s"$base/random"))
    val zorderRows = scanOutputRows(query(s"$base/zorder"))
    // the selective 2-D predicate keeps ~1% of rows; over the z-ordered
    // layout most files' (x, y) min/max rectangles miss the query box
    // entirely and their row groups never leave the scan
    assert(zorderRows < randomRows / 2,
      s"z-order scan emitted $zorderRows rows vs random layout $randomRows")
  }
}
