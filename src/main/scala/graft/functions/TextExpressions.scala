package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token n-gram kernel — the gram producer under the dedup span census
  * (x68/x88/x97), DSIR bucketing (x69), and repetition scoring.
  *
  * Why native: the composed form
  * `transform(sequence(1, greatest(size(t)-(n-1), 1)),
  *            i => array_join(slice(t, i, n), " "))`
  * with `t = split(lower(trim(text)), "\s+")` is a higher-order
  * function, and HOF lambdas evaluate on the INTERPRETED path — where
  * common-subexpression elimination does not apply, so the captured
  * `split` re-tokenizes the whole document once per array ELEMENT:
  * O(tokens²) regex work per document. Measured on the sf0.1 corpus
  * (5k docs), the interpreted HOF costs ~26 CPU-s in x69's three gram
  * passes and dominates the span-census family. This expression
  * produces the identical array in ONE pass per row and stays inside
  * whole-stage codegen.
  */
/** Shared kernels of the text-hash family. The FNV-1a + murmur-avalanche
  * window hash is THE hash of the dedup pipeline: MinhashOps (candidate
  * signatures), ShingleOps (exact-Jaccard verify grams), and
  * WinnowingOps (fingerprints) MUST stay bit-identical — the LSH
  * candidate stage, the verify stage, and the goldens all assume one
  * hash family, so a constant or normalization tweak applied to one
  * copy would silently desynchronize candidate generation from
  * verification. One definition removes that risk.
  */
private[functions] object TextHash {

  /** The whitespace tokenizer Pattern (`\s+`), shared so the token
    * family (TextOps, SimhashOps) splits identically.
    */
  val ws: java.util.regex.Pattern = java.util.regex.Pattern.compile("\\s+")

  /** Java-trim + LOCALE-INDEPENDENT lowercase — the r12-unified
    * normalization contract of the minhash/shingle/winnowing family
    * (mirrors `golden_ext.py`'s `.strip().lower()` on this corpus).
    * `Locale.ROOT` pins lowercasing against JVM default-locale drift:
    * a `tr_TR` cluster JVM would otherwise lowercase 'I' to U+0131,
    * silently changing every signature versus the goldens.
    */
  @inline def normalize(u: UTF8String): String =
    u.toString.trim.toLowerCase(java.util.Locale.ROOT)

  /** FNV-1a over `s[from, end)` chars + murmur-final avalanche. */
  @inline def windowHash(s: String, from: Int, end: Int): Long = {
    var h = 0xcbf29ce484222325L
    var j = from
    while (j < end) { h ^= s.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
    h
  }
}

object TextOps {

  private val ws = TextHash.ws
  private val space = UTF8String.fromString(" ")

  /** Positional n-grams of `split(lower(trim(text)), "\s+")`, each
    * `n` consecutive tokens joined by " ".
    *
    * `stride = 1` (n-grams): positions `0 .. max(len-n, 0)` — a
    * shorter-than-n document yields ONE (short) gram, exactly like the
    * `greatest(…, 1)`+`slice` form. `stride = n` (chunking): positions
    * `0, n, 2n, …` — `max(ceil(len/n), 1)` chunks, the last one the
    * (possibly short) remainder, exactly like [[TextAnalysis
    * .chunkTokens]]'s `ceil`+`slice` form. `trim`/`toLowerCase` are
    * the UTF8String methods Spark's own `StringTrim`/`Lower` call, and
    * `Pattern.split(s, -1)` is the exact path of `split(str, regex)`
    * with its default -1 limit, so tokens are bit-identical to the
    * composed forms.
    */
  def tokenNgrams(u: UTF8String, n: Int, stride: Int): ArrayData = {
    val strParts = ws.split(u.trim().toLowerCase().toString, -1)
    val len = strParts.length
    // each token appears in up to n grams (stride=1, the span-census
    // hot path): convert to UTF8String ONCE per token, not once per
    // gram — UTF8String is immutable, so grams share the instances
    // (r20 review; saves (n-1)× of the re-encode/copy on the hottest
    // gram producer)
    val parts = new Array[UTF8String](len)
    var p = 0
    while (p < len) { parts(p) = UTF8String.fromString(strParts(p)); p += 1 }
    val count =
      if (stride == 1) math.max(len - n + 1, 1)
      else math.max((len + stride - 1) / stride, 1)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      val start = i * stride
      val end = math.min(start + n, len)
      if (end - start == 1) out(i) = parts(start)
      else out(i) = UTF8String.concatWs(
        space, java.util.Arrays.copyOfRange(parts, start, end): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `token_ngrams(text, n[, stride])` — see [[TextOps.tokenNgrams]].
  * `n` and `stride` are plan-time constants (embedded in the generated
  * code), matching every call site's literals. Only `stride == 1`
  * (sliding n-grams) and `stride == n` (chunking) are meaningful
  * shapes here; anything else is a call-site bug.
  */
case class TokenNgramsExpr(child: Expression, n: Int, stride: Int = 1)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"n must be >= 1, got $n")
  require(stride == 1 || stride == n,
    s"stride must be 1 (n-grams) or n (chunks), got stride=$stride n=$n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_ngrams"

  override protected def nullSafeEval(s: Any): Any =
    TextOps.tokenNgrams(s.asInstanceOf[UTF8String], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextOps.tokenNgrams($c, $n, $stride)")

  override protected def withNewChildInternal(c: Expression): TokenNgramsExpr =
    copy(child = c)
}

/** Fused MinHash signature kernel — the single hottest loop of the
  * dedup pipeline at corpus scale (numHashes × shingles updates per
  * document). Replaces the two-UDF chain
  * `sigUdf(shingleHashes(text, k))`, which materialized the per-doc
  * shingle-hash array and paid a serialize/convert round-trip BETWEEN
  * the UDFs; here each FNV+avalanche shingle hash streams straight
  * into the running minima, one pass over the characters, no
  * intermediate array. Bit-identical math: FNV-1a over chars +
  * murmur-final avalanche per window, splitmix64(h ^ seedᵢ) minima,
  * seeds from `Random(42)` — `MinhashSignatureSpec` pins equivalence
  * against an independent re-implementation and the x03/x05 goldens
  * pin it end-to-end.
  */
object MinhashOps {

  private val seedsCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  def seeds(numHashes: Int): Array[Long] =
    seedsCache.computeIfAbsent(numHashes, n => {
      val rnd = new scala.util.Random(42)
      Array.fill(n)(rnd.nextLong())
    })

  @inline private def mix64(x0: Long): Long = {
    var z = x0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** All-MaxValue signature for null/shingle-less input, matching the
    * old chain (null text → empty shingle array → untouched minima).
    *
    * Normalization is JAVA-trim semantics (`String.trim`, strips every
    * char <= U+0020), NOT `UTF8String.trim` (ASCII space only): the
    * exact-Jaccard verify stage ([[graft.operators.Dedup.shingleHashes]])
    * and the golden generator (`tools/golden_ext.py`, Python `.strip()`)
    * both strip tabs/newlines/CRs, and candidate and verify paths MUST
    * shingle the same windows — a `\t`-padded document normalized two
    * different ways gets different shingle sets, so its signature (and
    * hence its LSH candidacy) silently diverges from what the verify
    * stage would score. `MinhashSignatureSpec` pins the boundary with a
    * `"\tabc\n"`-style case.
    */
  def signature(u: UTF8String, numHashes: Int, shingleK: Int): ArrayData = {
    val sds = seeds(numHashes)
    val out = Array.fill(numHashes)(Long.MaxValue)
    if (u != null) {
      val s = TextHash.normalize(u)
      val n = math.max(1, s.length - shingleK + 1)
      var i = 0
      while (i < n) {
        val h = TextHash.windowHash(s, i, math.min(s.length, i + shingleK))
        var q = 0
        while (q < numHashes) {
          val v = mix64(h ^ sds(q))
          if (v < out(q)) out(q) = v
          q += 1
        }
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** `minhash_signature(text, numHashes, shingleK)` — see [[MinhashOps]].
  * NOT null-intolerant: a null document carries the empty-set
  * signature (all Long.MaxValue), exactly like the UDF chain it
  * replaced, so null-vs-null candidate semantics are unchanged.
  */
case class MinhashSignatureExpr(child: Expression, numHashes: Int, shingleK: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(numHashes >= 1 && shingleK >= 1, s"bad params: $numHashes, $shingleK")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_signature"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    MinhashOps.signature(
      child.eval(input).asInstanceOf[UTF8String], numHashes, shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            graft.functions.MinhashOps.signature(
              ${c.isNull} ? null : ${c.value}, $numHashes, $shingleK);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): MinhashSignatureExpr =
    copy(child = c)
}

/** Char-shingle FNV-1a(+avalanche) hash kernel — native and
  * CANONICALIZATION-STABLE. The tight UDF it replaced
  * (`Dedup.shingleHashes`) was built INSIDE the method and captured
  * `k`, so every `ngramJaccard` invocation carried a fresh function
  * object: two builds of "the same" gram plan were never `sameResult`,
  * the persisted gram/pair frames could not serve any later
  * invocation, and every one silently re-persisted an unmatchable
  * twin and recomputed the shingle pass (caught by the r12 bench's
  * own gate: x04 flagged at 15.1 CPU-s with evict=0 — recompute
  * without eviction is exactly this signature). A case-class
  * expression parameterized by `k` canonicalizes structurally, so
  * cached gram frames serve every consumer. Same bits as the UDF:
  * Java-trim + toLowerCase normalization (the r12-unified family
  * contract), FNV-1a over chars + murmur-final avalanche per window,
  * texts shorter than k yield one short window.
  */
object ShingleOps {

  def hashes(u: UTF8String, k: Int): ArrayData = {
    if (u == null)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    val s = TextHash.normalize(u)
    val n = math.max(1, s.length - k + 1)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = TextHash.windowHash(s, i, math.min(s.length, i + k))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** `shingle_hashes(text, k)` — see [[ShingleOps.hashes]]. NOT
  * null-intolerant: null text carries the EMPTY hash array (not
  * null), exactly like the UDF it replaced.
  */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1, s"k must be >= 1, got $k")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "shingle_hashes"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    ShingleOps.hashes(child.eval(input).asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            graft.functions.ShingleOps.hashes(
              ${c.isNull} ? null : ${c.value}, $k);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr =
    copy(child = c)
}

/** Fused 64-bit SimHash kernel. Replaces
  * `foldUdf(transform(split(lower(trim(text)), "\s+"), t => xxhash64(t)))`
  * — the HOF's per-token `xxhash64` evaluated interpreted and the fold
  * crossed a UDF boundary with the materialized hash array. Here each
  * token hashes through THE SAME `XXH64.hashUnsafeBytes` static
  * Spark's `xxhash64` codegen calls (seed 42), streaming straight
  * into the 64 bit-counters — bit-identical by construction
  * (`SimhashSpec` pins the composed form; the x05 golden pins it
  * end-to-end through the block trick).
  */
object SimhashOps {

  private val ws = TextHash.ws

  /** Null text folds zero tokens → all-zero counters → signature 0L,
    * exactly like the UDF chain (whose fold returned 0 for a null
    * hash array).
    */
  def simhash(u: UTF8String): Long = {
    val acc = new Array[Int](64)
    if (u != null) {
      val parts = ws.split(u.trim().toLowerCase().toString, -1)
      var i = 0
      while (i < parts.length) {
        val t = UTF8String.fromString(parts(i))
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
        var j = 0
        while (j < 64) {
          acc(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1); j += 1
        }
        i += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
}

/** `simhash64(text)` — see [[SimhashOps.simhash]]. */
case class SimhashExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash64"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SimhashOps.simhash(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          long ${ev.value} = graft.functions.SimhashOps.simhash(
            ${c.isNull} ? null : ${c.value});
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): SimhashExpr =
    copy(child = c)
}

/** Winnowing fingerprint kernel (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * — native and CANONICALIZATION-STABLE. The method-local UDF it
  * replaced ([[graft.operators.TextAnalysis.winnowingFingerprints]]
  * pre-r13) captured `k`/`w`, so every invocation carried a fresh
  * closure: two builds of x17's fingerprint plan were never
  * `sameResult`, and since the frame is `CacheLifecycle.persist`ed and
  * the bench rebuilds the DataFrame per rep, the persisted frame could
  * NEVER serve reps 2+ — every rep re-ran the full rolling-hash scan
  * and registered an unmatchable twin cache entry (the exact bug class
  * r12 root-caused; x17 was gate-flagged at ×5.6 task-CPU with
  * evict=0). A case-class expression parameterized by `(k, w)`
  * canonicalizes structurally, so the persisted fingerprint frame
  * serves every consumer. Bit-identical to the UDF: Java-trim +
  * toLowerCase normalization (the family contract), FNV-1a char
  * k-grams + murmur-final avalanche, minimum of each w-window,
  * DISTINCT minima in first-selected order.
  */
object WinnowingOps {

  /** Null text → empty fingerprint set, like the UDF it replaced. */
  def fingerprints(u: UTF8String, k: Int, w: Int): ArrayData = {
    if (u == null)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    val s = TextHash.normalize(u)
    val n = math.max(1, s.length - k + 1)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {                       // rolling k-gram hashes
      hs(i) = TextHash.windowHash(s, i, math.min(s.length, i + k))
      i += 1
    }
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    var start = 0
    while (start <= n - math.min(w, n)) { // min of each hash window
      var m = Long.MaxValue
      var j = start
      val end = math.min(n, start + w)
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      out += m
      start += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out.toArray)
  }
}

/** `winnowing_fingerprints(text, k, w)` — see [[WinnowingOps]]. NOT
  * null-intolerant: null text carries the EMPTY fingerprint array
  * (not null), exactly like the UDF it replaced.
  */
case class WinnowingExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1 && w >= 1, s"bad params: k=$k, w=$w")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "winnowing_fingerprints"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    WinnowingOps.fingerprints(child.eval(input).asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            graft.functions.WinnowingOps.fingerprints(
              ${c.isNull} ? null : ${c.value}, $k, $w);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): WinnowingExpr =
    copy(child = c)
}

object TextFunctions {
  def token_ngrams(text: Column, n: Int): Column =
    GraftColumnBridge.column(TokenNgramsExpr(GraftColumnBridge.expression(text), n))

  /** Consecutive `chunkSize`-token chunks (stride = n). */
  def token_chunks(text: Column, chunkSize: Int): Column =
    GraftColumnBridge.column(TokenNgramsExpr(
      GraftColumnBridge.expression(text), chunkSize, chunkSize))

  def minhash_signature(text: Column, numHashes: Int, shingleK: Int): Column =
    GraftColumnBridge.column(MinhashSignatureExpr(
      GraftColumnBridge.expression(text), numHashes, shingleK))

  def shingle_hashes(text: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleHashesExpr(
      GraftColumnBridge.expression(text), k))

  def simhash64(text: Column): Column =
    GraftColumnBridge.column(SimhashExpr(GraftColumnBridge.expression(text)))

  def winnowing_fingerprints(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(WinnowingExpr(
      GraftColumnBridge.expression(text), k, w))
}
