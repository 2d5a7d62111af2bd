package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video travel as opaque
  * `binary` columns with a typed metadata struct alongside.
  *
  * The actual media codecs are NOT in this environment, so the decode
  * kernel is a clearly marked deterministic stub ([[decodeStub]]) — but
  * everything Spark-side is real and load-bearing at scale: the schema,
  * the per-partition batch iteration shape (mirrors `mapInPandas` /
  * Arrow-batch decode on a cluster with codec libs), the feature-vector
  * contract, and the pushdown-friendly metadata struct.
  *
  * Scale notes: binary payloads make wide rows — keep them OUT of
  * shuffles (extract features first, shuffle the small features), size
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory, and store metadata in columns (not inside the blob)
  * so filters prune row groups without touching bytes.
  */
object Multimodal {

  val FeatureDim = 16

  /** Attach a binary payload + typed metadata to each document. The
    * payload here is the utf-8 text bytes standing in for real media
    * bytes; metadata is derived deterministically so tests and oracles
    * can re-derive it.
    */
  def attachBinary(docs: DataFrame): DataFrame =
    // rebalance BEFORE payload construction (the shuffle carries source
    // text, never blobs) — single-file test inputs otherwise pin the
    // whole encode/inspect pipeline to one core; many-split production
    // inputs skip it entirely (plan-static conditional, see Parallelism).
    Parallelism.ensureParallel(docs)
      .select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (lit(64) + (col("doc_id") % 8) * 16).cast("int").as("width"),
        (lit(48) + (col("doc_id") % 5) * 16).cast("int").as("height"),
        lit(3).cast("int").as("channels"),
        concat(lit("fake/"), (col("doc_id") % 3).cast("string")).as("codec")
      ).as("meta"))

  /** Pure-SQL inspection of the binary column — byte length, content
    * hash, head-of-payload hex. These are the real operations a media
    * pipeline runs before decode (integrity, dedup, sampling) and they
    * stay codegen'd.
    */
  def inspect(withBin: DataFrame): DataFrame =
    withBin.select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("content_md5"),
      lower(hex(substring(col("payload"), 1, 8))).as("head_hex"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.channels").as("channels"),
      col("meta.codec").as("codec"))

  /** "Frame sampling": every strideBytes-th 4-byte window of the payload
    * (stands in for keyframe extraction — same slicing plumbing).
    */
  def frameSample(withBin: DataFrame, strideBytes: Int, maxFrames: Int): DataFrame = {
    val lastFrame = least(lit(maxFrames - 1),
      floor(length(col("payload")) / strideBytes).cast("int") - 1)
    // guard: sequence(0, -1) would be a DESCENDING range, not empty —
    // payloads shorter than one stride must yield zero frames.
    withBin.select(col("doc_id"),
      when(lastFrame >= 0,
        transform(sequence(lit(0), lastFrame),
          i => lower(hex(substring(col("payload"), i * strideBytes + 1, lit(4))))))
        .otherwise(array().cast("array<string>"))
        .as("frames"))
  }

  /** STUB decode kernel =========================================== STUB
    * A real deployment decodes image/audio bytes with a codec library
    * inside this per-partition batch loop (exactly where `mapInPandas`
    * would run it). Environment has no codec libs, so the "decoded
    * features" are a deterministic 16-bin byte histogram, L1-normalized
    * — fake feature values, REAL batching/schema/partitioning.
    */
  def decodeStub(spark: SparkSession, withBin: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val input = withBin.select(col("doc_id"), col("payload"))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      // batch loop: in production each `rows` chunk is an Arrow batch
      // handed to the codec; here the stub histogram stands in.
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Float](FeatureDim)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) % FeatureDim) += 1f; i += 1 }
        val total = math.max(1f, bytes.length.toFloat)
        Row(id, hist.map(_ / total).toSeq)
      }
    }(encoder)
  }
}
