package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable sketch aggregates for cardinality and frequency at 100 TB.
  *
  * Both sketches are SINGLE-PASS and MERGEABLE: they plan as two-phase
  * `ObjectHashAggregate`, so every map task reduces its partition to a
  * fixed-size state and the exchange carries one bounded buffer per
  * task — the scale contract that makes `count(distinct)` (full
  * re-shuffle of every distinct value) and exact per-key counting
  * (state ∝ key cardinality) unnecessary when an estimate suffices.
  *
  * Both are DETERMINISTIC by construction: every hash is md5 of the
  * value's string form, so the sketch — and therefore the estimate —
  * is identical across runs, partitionings, AND engines. That is what
  * lets the DuckDB oracle recompute the exact same estimate in SQL
  * (`CAST(concat('0x', substr(md5(v), 1, n)) AS BIGINT)`), where a
  * seed-randomized sketch (Spark's own HLL, DataSketches) could only
  * ever be range-checked. Commutativity/associativity of merge holds
  * exactly (set union / elementwise long addition), so the result is
  * independent of partitioning and merge order.
  */
object SketchAggs {

  /** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002):
    * keep the k smallest DISTINCT md5(value) hex strings; md5 is
    * uniform over the 128-bit space, so the k-th smallest hash at
    * fraction `f` of the space estimates `(k-1)/f` distinct values
    * (standard error ~ 1/√k). With fewer than k distinct values the
    * sketch holds ALL of them and the count is exact — the estimator
    * must use `size(sketch)` then, not the KMV formula.
    *
    * Buffer protocol mirrors [[TopKAgg]]: append raw, sort-dedupe-trim
    * to k when the buffer reaches `trimAt`·k — amortized O(log k)-ish
    * per row with a hard `trimAt`·k bound on any partial buffer
    * crossing the shuffle.
    */
  final case class KmvAgg(k: Int, trimAt: Int = 8)
      extends Aggregator[String, ArrayBuffer[String], Seq[String]] {
    require(k >= 2, s"k must be >= 2, got $k")

    private def trim(b: ArrayBuffer[String]): ArrayBuffer[String] = {
      if (b.length > k) {
        b.sortInPlace()
        var w = 0
        var i = 0
        while (i < b.length && w < k) {
          if (w == 0 || b(i) != b(w - 1)) { b(w) = b(i); w += 1 }
          i += 1
        }
        b.takeInPlace(w)
      }
      b
    }

    override def zero: ArrayBuffer[String] = ArrayBuffer.empty

    override def reduce(b: ArrayBuffer[String], a: String): ArrayBuffer[String] = {
      if (a != null) {
        b += a
        if (b.length >= trimAt * k) trim(b)
      }
      b
    }

    override def merge(a: ArrayBuffer[String], b: ArrayBuffer[String]): ArrayBuffer[String] =
      trim(a ++= b)

    // final trim may leave < k survivors after dedupe even when the
    // buffer was over k raw entries; sort-dedupe without the length
    // guard so the output is canonical
    override def finish(b: ArrayBuffer[String]): Seq[String] = {
      b.sortInPlace()
      val out = ArrayBuffer.empty[String]
      for (s <- b) if (out.isEmpty || out.last != s) out += s
      out.takeInPlace(math.min(k, out.length)).toSeq
    }

    override def bufferEncoder: Encoder[ArrayBuffer[String]] =
      Encoders.kryo[ArrayBuffer[String]]
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }

  /** `kmv_min_k(k)(md5Col)` → `array<string>`: the k smallest distinct
    * 32-hex md5 strings. Hash OUTSIDE the aggregate (`md5(col)`) so
    * the hashing stays in whole-stage codegen and the aggregate input
    * is already the canonical key.
    */
  def kmv_min_k(k: Int): Column => Column = {
    val f = udafCache.computeIfAbsent(("kmv", k, 0),
      _ => udaf(KmvAgg(k), ExpressionEncoder[String]()))
    h => f(h)
  }

  // one UDAF instance per parameterization: repeated kmv_min_k(k) /
  // cms_sketch(d, w) calls must hand Catalyst the SAME function object,
  // or plans containing them are never sameResult and persisted frames
  // can't serve later invocations (the r11/r12 canonicalization trap)
  private val udafCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int),
      org.apache.spark.sql.expressions.UserDefinedFunction]()

  /** Distinct-count estimate from a [[kmv_min_k]] sketch column, as a
    * whole-stage-codegen expression over the array: exact `size` when
    * the sketch is under-full, else `(k-1) / frac(k-th hash)` with the
    * fraction read from the first 12 hex digits (48 bits — exact in a
    * double). Rounded to `dec` so the last double ulp can't differ
    * from an independent re-computation.
    */
  def kmvEstimate(sketch: Column, k: Int, dec: Int = 4): Column = {
    val kth = element_at(sketch, k)
    val frac = conv(substring(kth, 1, 12), 16, 10).cast("double") /
      lit(Math.pow(16.0, 12))
    round(
      when(size(sketch) < k, size(sketch).cast("double"))
        .otherwise(lit((k - 1).toDouble) / frac),
      dec)
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005): `depth` hash
    * rows × `width` counters of longs; point-estimate = min over rows
    * of the keyed counter (always an OVERcount, never under). Row `j`
    * hashes `item` to `first-8-hex(md5("j:item")) mod width` — the
    * same arithmetic an independent SQL twin can write down.
    *
    * State is `depth`·`width` longs regardless of input size — the
    * heavy-hitter / frequency primitive when exact per-key counts
    * (state ∝ cardinality) stop fitting, e.g. n-gram frequencies over
    * a 100 TB corpus.
    */
  final case class CmsAgg(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth >= 1 && width >= 2, s"bad CMS shape: $depth x $width")

    override def zero: Array[Long] = new Array[Long](depth * width)

    // per-j "j:" prefixes, built once per aggregator instance: the
    // reduce loop digests depth rows PER INPUT ROW, and the first cut
    // interpolated s"$j:$item" + re-encoded the whole string each time
    // — depth string + byte-array allocations and re-encodings per row
    // of pure map-side CPU (r20 review). Feeding the digest the cached
    // prefix then the item's bytes produces byte-identical md5 input.
    @transient private lazy val prefixes: Array[Array[Byte]] =
      Array.tabulate(depth)(j => s"$j:".getBytes(StandardCharsets.UTF_8))

    override def reduce(b: Array[Long], item: String): Array[Long] = {
      if (item != null) {
        val itemBytes = item.getBytes(StandardCharsets.UTF_8)
        var j = 0
        while (j < depth) {
          b(j * width + CmsAgg.bucketOf(prefixes(j), itemBytes, width)) += 1L
          j += 1
        }
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b

    // kryo BUFFER encoder, deliberately: ScalaAggregator embeds the
    // resolved buffer encoder and compares it during canonicalization,
    // and a resolved ExpressionEncoder[Array[Long]] carries fresh
    // lambda-variable ids per query — two builds of the same sketch
    // plan would never be sameResult (the r11/r12 persisted-frame
    // trap). Kryo resolves to a lambda-free, structurally-equal tree
    // (same device as TopKAgg/KmvAgg); the buffer crosses the shuffle
    // once per map task, so the codec choice is not hot.
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  object CmsAgg {
    // the reduce loop calls bucket() depth times PER ROW: a fresh
    // provider lookup + digest allocation there is pure map-side CPU at
    // 100 TB. digest() resets the instance, so a thread-local reuse
    // produces identical bytes.
    private val md = ThreadLocal.withInitial[MessageDigest](
      () => MessageDigest.getInstance("MD5"))

    /** Row-j bucket of `item`: first 8 hex digits of md5("j:item") as
      * an unsigned 32-bit int, mod width. Positive by construction.
      * (Cold-path form — estimates, specs; the reduce hot loop goes
      * through [[bucketOf]] with cached bytes.)
      */
    def bucket(j: Int, item: String, width: Int): Int =
      bucketOf(s"$j:".getBytes(StandardCharsets.UTF_8),
        item.getBytes(StandardCharsets.UTF_8), width)

    /** [[bucket]] over pre-encoded bytes: md5(prefix ++ item) is
      * byte-identical to md5 of the interpolated string.
      */
    def bucketOf(prefix: Array[Byte], itemBytes: Array[Byte], width: Int): Int = {
      val digest = md.get()
      digest.update(prefix)
      val d = digest.digest(itemBytes)
      // first 4 bytes big-endian == first 8 hex digits
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (v % width).toInt
    }
  }

  /** `cms_sketch(depth, width)(itemCol)` → `array<bigint>` of length
    * depth·width (row-major).
    */
  def cms_sketch(depth: Int, width: Int): Column => Column = {
    val f = udafCache.computeIfAbsent(("cms", depth, width),
      _ => udaf(CmsAgg(depth, width), ExpressionEncoder[String]()))
    item => f(item)
  }

  /** Point-estimate of `item`'s count from a [[cms_sketch]] column:
    * min over the depth rows of the item's counter. The sketch is one
    * row after aggregation — broadcast it and this expression probes
    * per item with no shuffle.
    */
  def cmsEstimate(sketch: Column, item: Column, depth: Int, width: Int): Column = {
    val probes = (0 until depth).map { j =>
      val h = conv(substring(md5(concat(lit(s"$j:"), item)), 1, 8), 16, 10)
        .cast("bigint")
      element_at(sketch, (h % width + lit(j.toLong * width) + 1).cast("int"))
    }
    least(probes: _*)
  }
}
