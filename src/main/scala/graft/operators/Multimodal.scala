package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2.12): image/audio/video
  * payloads travel as opaque `BinaryType` columns with a typed metadata
  * struct — the same pattern the engine uses for WKB geometry (geometry
  * IS the reference's multimodal column, SURVEY §1.1).
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * container): [[decodeStub]] derives a deterministic fake feature
  * vector from the payload bytes. Everything around the stub — schema,
  * batched per-partition processing, output shape — is real: swapping
  * in a JNI/FFI decoder changes only the marked function.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("size_bytes", LongType)))

  /** Wrap a binary column into the blob struct with metadata sniffed
    * from the payload (here: size only; mime passed by caller).
    */
  def attachBlob(df: DataFrame, bytesCol: String, mime: String): DataFrame =
    df.withColumn("blob", struct(
      col(bytesCol).as("payload"),
      struct(
        lit(mime).as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        length(col(bytesCol)).cast(LongType).as("size_bytes")).as("meta")))

  /** ======= STUB =======
    * Deterministic fake "decode + feature extract": 8 floats derived
    * from payload byte statistics. A real implementation decodes the
    * image/audio and runs the feature model here; the signature
    * (bytes → fixed-width float vector) and the batched mapPartitions
    * harness around it are the production shape.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    if (payload == null) return Array.fill(8)(0f)
    var h = 1125899906842597L
    var sum = 0L
    payload.foreach { b => h = 31 * h + b; sum += (b & 0xff) }
    val n = math.max(1, payload.length)
    Array(
      payload.length.toFloat,
      (sum.toDouble / n).toFloat,
      (h & 0xffff).toFloat / 65535f,
      ((h >>> 16) & 0xffff).toFloat / 65535f,
      ((h >>> 32) & 0xffff).toFloat / 65535f,
      ((h >>> 48) & 0xffff).toFloat / 65535f,
      (payload.headOption.map(_ & 0xff).getOrElse(0)).toFloat,
      (payload.lastOption.map(_ & 0xff).getOrElse(0)).toFloat)
  }

  /** Per-partition batched feature extraction over blob payloads —
    * the Scala analog of `mapInPandas`: one iterator pass per
    * partition, no per-row task overhead, decoder state reusable
    * across the partition.
    */
  def extractFeatures(df: DataFrame, blobCol: String = "blob"): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val payloadIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows =>
      // a real decoder would be initialized once here, per partition
      rows.map { r =>
        val blob = r.getStruct(payloadIdx)
        val payload = if (blob == null) null else blob.getAs[Array[Byte]]("payload")
        Row.fromSeq(r.toSeq :+ decodeStub(payload).toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** ======= STUB =======
    * "Resize": deterministic downsample of the payload to `targetBytes`
    * by strided byte selection — stands in for an image resize the way
    * [[decodeStub]] stands in for a decoder; the Spark-side shape
    * (binary → smaller binary, applied columnwise) is the real part.
    */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (payload == null || payload.length <= targetBytes) payload
    else {
      val out = new Array[Byte](targetBytes)
      val stride = payload.length.toDouble / targetBytes
      var i = 0
      while (i < targetBytes) { out(i) = payload((i * stride).toInt); i += 1 }
      out
    }
  }

  // top-level val with the target as a COLUMN argument, not a per-call
  // closure capturing targetBytes: a method-local capturing UDF makes
  // every resize() plan canonically unique, so persisted frames
  // downstream could never serve a rebuilt plan (the stable-kernel rule
  // pinned by StableKernelsSpec)
  private val resizeUdf =
    org.apache.spark.sql.functions.udf((p: Array[Byte], t: Int) => resizeStub(p, t))

  /** Column form of [[resizeStub]]. */
  def resize(blobPayload: org.apache.spark.sql.Column, targetBytes: Int): org.apache.spark.sql.Column =
    resizeUdf(blobPayload, org.apache.spark.sql.functions.lit(targetBytes))

  /** Deterministic frame sampling for a (stub) video payload: emit one
    * row per sampled frame offset — the explode shape a real
    * frame-sampler produces, with byte-range metadata a real demuxer
    * would fill.
    */
  def sampleFrames(df: DataFrame, blobCol: String, everyNBytes: Int): DataFrame =
    df.withColumn("frame_offset",
        explode(sequence(lit(0L), greatest(lit(0L),
          col(s"$blobCol.meta.size_bytes") - 1), lit(everyNBytes.toLong))))
      .withColumn("frame",
        col(s"$blobCol.payload").substr(col("frame_offset").cast("int") + 1, lit(everyNBytes)))
}
