package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video travel as opaque
  * `binary` columns with a typed metadata struct alongside.
  *
  * The decode kernel is REAL: payloads are self-describing uncompressed
  * PPM P6 rasters (`P6\n<w> <h>\n255\n` + w·h·3 RGB bytes — netpbm, a
  * public format chosen because it needs no codec library), and
  * [[decodeRaster]] parses header + pixels byte-by-byte inside the
  * per-partition batch loop where a production `mapInPandas` would run
  * libjpeg/ffmpeg. [[attachRaster]] is the test-fixture "camera": it
  * renders each document's raster from a deterministic pixel formula,
  * so specs and the DuckDB oracle re-derive the decoder's every output
  * from first principles — a true differential test of the
  * encode→bytes→decode round trip. On top of the decoded grid,
  * [[dHash]] computes the standard difference-hash perceptual
  * signature and [[perceptualNearDupPairs]] finds near-duplicate
  * images the way [[Dedup.simhashPairs]] finds near-duplicate text:
  * banded LSH blocking, exact Hamming verification, no O(n²) stage.
  *
  * Scale notes: binary payloads make wide rows — keep them OUT of
  * shuffles (decode to features/hashes first, shuffle the small
  * results), size `spark.sql.files.maxPartitionBytes` so a partition
  * of blobs fits in executor memory, and store metadata in columns
  * (not inside the blob) so filters prune row groups without touching
  * bytes.
  */
object Multimodal {

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

  // ---- real raster decode (PPM P6) ---------------------------------

  /** Deterministic pixel formula behind [[attachRaster]] — the fixture
    * "scene renderer". Interference of two linear gradients plus a
    * per-scene phase (`base`), wrapped mod 256: visually a diagonal
    * ramp whose wrap boundaries move with the scene, so different
    * scenes produce genuinely different dHashes while a ±1 brightness
    * jitter (same scene, different `doc_id / 80` epoch) perturbs only
    * the few samples that straddle a wrap — the textbook
    * near-duplicate.
    */
  private[graft] def pixel(base: Int, x: Int, y: Int, c: Int): Int =
    (7 * x + 13 * y + 31 * c + base) % 256

  private[graft] def rasterDims(id: Long): (Int, Int) =
    ((64 + (id % 8) * 16).toInt, (48 + (id % 5) * 16).toInt)

  private[graft] def rasterBase(id: Long): Int =
    (29 * (id % 16) + (id / 80) % 2).toInt

  /** Render one document's P6 raster: ASCII header + packed RGB. */
  private[graft] def rasterBytes(id: Long): Array[Byte] = {
    val (w, h) = rasterDims(id)
    val base = rasterBase(id)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var o = header.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) { out(o) = pixel(base, x, y, c).toByte; o += 1; c += 1 }
        x += 1
      }
      y += 1
    }
    out
  }

  private val rasterSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Attach a self-describing P6 raster payload to each document — the
    * fixture stand-in for reading real image files. Same conditional
    * rebalance as [[attachBinary]]: the shuffle (if any) carries ids,
    * never blobs.
    */
  def attachRaster(docs: DataFrame): DataFrame = {
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(rasterSchema)
    Parallelism.ensureParallel(docs).select(col("doc_id"))
      .mapPartitions(rows => rows.map { r =>
        val id = r.getLong(0)
        Row(id, rasterBytes(id))
      })(encoder)
  }

  /** Skip netpbm whitespace + `#` comments; returns the next offset. */
  private def skipPpmSpace(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length &&
           (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r' || b(i) == '#')) {
      if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
      else i += 1
    }
    i
  }

  /** Parse one ASCII unsigned int; returns (value, next offset). */
  private def ppmInt(b: Array[Byte], from: Int): (Int, Int) = {
    var i = skipPpmSpace(b, from)
    var v = 0
    require(i < b.length && b(i) >= '0' && b(i) <= '9', s"P6 header: digit expected at $i")
    while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
    (v, i)
  }

  /** The 60-bit difference hash of a decoded RGB grid: grayscale the
    * image, point-sample an 11×6 grid, set bit `j*10+i` iff brightness
    * rises from sample i to sample i+1 in row j. 60 bits (not 64) so
    * the signature — like [[Dedup.SimhashBits]] — fits a signed BIGINT
    * in every engine, splits into 4×15-bit LSH bands, and never
    * touches the sign bit.
    */
  private[graft] def dHash(px: Array[Byte], off: Int, w: Int, h: Int): Long = {
    def g(x: Int, y: Int): Int = {
      val o = off + (y * w + x) * 3
      ((px(o) & 0xff) + (px(o + 1) & 0xff) + (px(o + 2) & 0xff)) / 3
    }
    var hash = 0L
    var j = 0
    while (j < 6) {
      val y = j * h / 6
      var i = 0
      while (i < 10) {
        if (g((i + 1) * w / 11, y) > g(i * w / 11, y)) hash |= 1L << (j * 10 + i)
        i += 1
      }
      j += 1
    }
    hash
  }

  private val decodedFields = Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("maxval", IntegerType, nullable = false),
    StructField("n_pix_bytes", LongType, nullable = false),
    StructField("r0_sum_r", LongType, nullable = false),
    StructField("r0_sum_g", LongType, nullable = false),
    StructField("r0_sum_b", LongType, nullable = false),
    StructField("pix_sum", LongType, nullable = false),
    StructField("dhash", LongType, nullable = false))

  /** REAL decode kernel: parse each P6 payload — magic, header ints
    * (with netpbm comment/whitespace handling), pixel block — and emit
    * exact integer image statistics plus the [[dHash]] perceptual
    * signature. Runs in the per-partition batch loop where a cluster
    * with codec libraries would run its decoder; corrupt payloads fail
    * loudly with the offending doc_id. All outputs are integers, so
    * the registered query carries a full cell-exact DuckDB oracle that
    * re-derives every value from the generator formula — the decoder
    * is verified against the bytes, not against itself.
    */
  def decodeRaster(withRaster: DataFrame): DataFrame =
    decodeRasterKeeping(withRaster, Nil)

  /** [[decodeRaster]] with passthrough columns — `keep` columns ride
    * along unchanged (e.g. the event-time column a streaming caller
    * needs for its watermark downstream of the decode boundary).
    */
  def decodeRasterKeeping(withRaster: DataFrame, keep: Seq[String]): DataFrame = {
    val keepFields = keep.map(n => withRaster.schema(n))
    val outSchema = StructType(
      StructField("doc_id", LongType, nullable = false) +: keepFields ++: decodedFields)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val in = withRaster.select(
      col("doc_id") +: col("payload") +: keep.map(col): _*)
    in.mapPartitions(rows => rows.map { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        require(b.length >= 2 && b(0) == 'P' && b(1) == '6', s"doc $id: not a P6 raster")
        val (w, i1) = ppmInt(b, 2)
        val (h, i2) = ppmInt(b, i1)
        val (maxval, i3) = ppmInt(b, i2)
        val off = i3 + 1 // single whitespace byte separates header and pixels
        val nPix = b.length - off
        require(nPix == w * h * 3,
          s"doc $id: pixel block is $nPix bytes, header promises ${w * h * 3}")
        var pixSum = 0L
        var i = off
        while (i < b.length) { pixSum += (b(i) & 0xff); i += 1 }
        val r0 = new Array[Long](3)
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) { r0(c) += (b(off + x * 3 + c) & 0xff); c += 1 }
          x += 1
        }
        // Seq[Any] everywhere: a mixed Int/Long Seq would numerically
        // widen the Ints to Long and break the encoder's INT fields
        Row.fromSeq(Seq[Any](id) ++ keep.indices.map(k => r.get(2 + k)) ++
          Seq[Any](w, h, maxval, nPix.toLong, r0(0), r0(1), r0(2), pixSum,
              dHash(b, off, w, h)))
      })(encoder)
  }

  /** Near-duplicate image pairs (Hamming distance ≤ maxHamming on the
    * 60-bit dHash) from a `(doc_id, dhash)` frame — 4×15-bit band
    * blocking, then exact verification, the [[Dedup.simhashPairs]]
    * shape. For maxHamming ≤ 3 the pigeonhole makes banding LOSSLESS
    * (4 bands, ≤3 differing bits ⇒ one band agrees exactly), so the
    * result equals the all-pairs scan the oracle runs. Scale: shuffle
    * is O(docs × 4) scalar rows; giant identical-image clusters make
    * hot band keys — the same quadratic-bucket caveat (and capBuckets
    * remedy) as every LSH path in this library.
    */
  def perceptualNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    val banded = hashes.withColumn("band_i", explode(sequence(lit(0), lit(3))))
      .withColumn("band_v", expr("shiftright(dhash, 15 * band_i) & 32767"))
    val ham = bit_count(col("p.a.dhash").bitwiseXOR(col("p.b.dhash")))
    banded.groupBy(col("band_i"), col("band_v"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("dhash")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(Dedup.unorderedPairs(col("xs"))).as("p"))
      .filter(ham <= maxHamming)
      .select(col("p.a.doc_id").as("d1"), col("p.b.doc_id").as("d2"),
              ham.cast("int").as("hamming"))
      .distinct()
  }
}
