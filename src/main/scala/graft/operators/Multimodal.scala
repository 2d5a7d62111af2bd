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

  /** Parse one ASCII unsigned int; returns (value, next offset). The
    * value is capped at 10⁸ so untrusted headers can never overflow
    * the Int accumulator (or downstream w·h products computed in
    * Long) — a corrupt header fails loudly at the parse.
    */
  private def ppmInt(b: Array[Byte], from: Int): (Int, Int) = {
    var i = skipPpmSpace(b, from)
    var v = 0
    require(i < b.length && b(i) >= '0' && b(i) <= '9', s"P6 header: digit expected at $i")
    while (i < b.length && b(i) >= '0' && b(i) <= '9') {
      v = v * 10 + (b(i) - '0')
      require(v <= 100000000, s"P6 header: unreasonable integer at $i")
      i += 1
    }
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

  /** The per-payload raster decode, driver-callable (the mutated-
    * payload property test exercises it without a Spark job, so guard
    * failures surface as bare IllegalArgumentException, undisguised by
    * task-failure wrapping). Returns the [[decodedFields]] values.
    */
  private[graft] def rasterKernel(id: Long, b: Array[Byte]): Seq[Any] = {
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6', s"doc $id: not a P6 raster")
    val (w, i1) = ppmInt(b, 2)
    val (h, i2) = ppmInt(b, i1)
    val (maxval, i3) = ppmInt(b, i2)
    val off = i3 + 1 // single whitespace byte separates header and pixels
    val nPix = b.length - off
    // Long compare: untrusted dims must not wrap the promised size
    require(nPix.toLong == w.toLong * h * 3L,
      s"doc $id: pixel block is $nPix bytes, header promises ${w.toLong * h * 3L}")
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
    Seq[Any](w, h, maxval, nPix.toLong, r0(0), r0(1), r0(2), pixSum,
      dHash(b, off, w, h))
  }

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
        Row.fromSeq(Seq[Any](id) ++ keep.indices.map(k => r.get(2 + k)) ++
          rasterKernel(id, r.getAs[Array[Byte]](1)))
      })(encoder)
  }

  // ---- real audio decode (RIFF/WAVE PCM) ---------------------------

  /** Deterministic sample formula behind [[attachWave]] — the fixture
    * "microphone". A sawtooth `((13t + phase) mod period)·8 − 4·period`
    * under a stepped amplitude envelope `1 + ((t·k) DIV n) mod 4`
    * (16-bit mono, 8 kHz): `period` picks the scene's pitch, `phase`
    * its offset, `k` the envelope's step rate, and the `(id / 80) % 2`
    * epoch bit jitters the phase by one step — the raster fixture's
    * near-duplicate device (ids 80 apart share every parameter except
    * the jitter bit; ids 160 apart render byte-identical audio). The
    * envelope is what makes the signal NON-stationary: a bare periodic
    * sawtooth has identical statistics in every analysis window, which
    * would collapse every rise-profile fingerprint to zero — the
    * classic degenerate-feature trap for windowed audio signatures.
    * Every parameter is a function of `id mod {16,8,5,4}` (all
    * divisors of 80) so the jitter-twin structure survives.
    */
  private[graft] def waveParams(id: Long): (Int, Int, Int, Int) =
    ((16 + (id % 8) * 4).toInt,
     (3 * (id % 16) + (id / 80) % 2).toInt,
     (256 + (id % 5) * 64).toInt,
     (1 + (id % 16)).toInt)

  private[graft] def sampleAt(period: Int, phase: Int, n: Int, k: Int,
                              t: Int): Int =
    (((13 * t + phase) % period) * 8 - period * 4) *
      (1 + ((t * k) / n) % 4)

  private[graft] val WaveRate = 8000

  /** Render a canonical 44-byte-header RIFF/WAVE PCM file from a
    * sample array: fmt chunk (PCM, mono, 16-bit, 8 kHz) + data chunk
    * of little-endian int16 samples. Shared by the fixture renderer
    * and the specs that hand-slice payloads (true-trim containment).
    */
  private[graft] def wavePcmBytes(samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    val dataSize = n * 2
    val out = new Array[Byte](44 + dataSize)
    def putTag(i: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, i)
    def putU32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    def putU16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    putTag(0, "RIFF"); putU32(4, 36L + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); putU32(16, 16L)
    putU16(20, 1); putU16(22, 1); putU32(24, WaveRate.toLong)
    putU32(28, WaveRate.toLong * 2); putU16(32, 2); putU16(34, 16)
    putTag(36, "data"); putU32(40, dataSize.toLong)
    var t = 0
    while (t < n) { putU16(44 + t * 2, samples(t) & 0xffff); t += 1 }
    out
  }

  /** Render one document's fixture WAV from the generator formula. */
  private[graft] def waveBytes(id: Long): Array[Byte] = {
    val (period, phase, n, k) = waveParams(id)
    wavePcmBytes(Array.tabulate(n)(t => sampleAt(period, phase, n, k, t)))
  }

  private val waveSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Attach a self-describing WAV payload to each document — the
    * fixture stand-in for reading real audio files. Rebalance-then-
    * render, as [[attachRaster]].
    */
  def attachWave(docs: DataFrame): DataFrame = {
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(waveSchema)
    Parallelism.ensureParallel(docs).select(col("doc_id"))
      .mapPartitions(rows => rows.map { r =>
        val id = r.getLong(0)
        Row(id, waveBytes(id))
      })(encoder)
  }

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def leS16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) | (b(i + 1) << 8)).toShort.toInt

  /** The 60-bit audio profile fingerprint — the dHash analog for
    * waveforms: 16 equal sample windows, four 15-bit rise profiles
    * (energy Σ|s|, peak max|s|, zero-crossing count, positive-sample
    * count), bit set iff the measure RISES into the next window.
    * Profile shapes survive the ±1 phase jitter (only comparisons that
    * were nearly tied flip) while different scenes diverge — and 60
    * bits means [[perceptualNearDupPairs]]'s 4×15 banding applies
    * unchanged.
    */
  private[graft] def waveFingerprint(s: Array[Int]): Long = {
    val n = s.length
    val e = new Array[Long](16); val m = new Array[Long](16)
    val z = new Array[Long](16); val p = new Array[Long](16)
    var t = 0
    while (t < n) {
      val v = s(t); val a = math.abs(v); val w = (t * 16) / n
      e(w) += a; if (a > m(w)) m(w) = a; if (v > 0) p(w) += 1
      if (t >= 1 && s(t - 1).toLong * v < 0) z(w) += 1
      t += 1
    }
    var afp = 0L
    var w = 0
    while (w < 15) {
      if (e(w + 1) > e(w)) afp |= 1L << w
      if (m(w + 1) > m(w)) afp |= 1L << (15 + w)
      if (z(w + 1) > z(w)) afp |= 1L << (30 + w)
      if (p(w + 1) > p(w)) afp |= 1L << (45 + w)
      w += 1
    }
    afp
  }

  private val waveDecodedFields = Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("sum_s", LongType, nullable = false),
    StructField("max_amp", IntegerType, nullable = false),
    StructField("zero_cross", LongType, nullable = false),
    StructField("afp", LongType, nullable = false))

  /** REAL audio decode kernel: walk the RIFF chunk list (magic checks,
    * little-endian sizes, arbitrary chunk order tolerated), require
    * canonical PCM (format 1, mono, 16-bit), parse the int16 sample
    * block, and emit exact integer waveform statistics plus the
    * [[waveFingerprint]] — all integers, so the registered query
    * carries a full cell-exact DuckDB oracle re-derived from the
    * generator formula, the raster-decode discipline applied to a
    * second modality. Corrupt payloads fail loudly with the doc id.
    */
  def decodeWave(withWave: DataFrame): DataFrame =
    decodeWaveKeeping(withWave, Nil)

  /** RIFF chunk walk + PCM int16 parse, driver-callable (as
    * [[rasterKernel]]): returns (sample_rate, samples). Shared by the
    * whole-track decode and the segment decode.
    */
  private[graft] def waveSamples(id: Long, b: Array[Byte]): (Int, Array[Int]) = {
    require(b.length >= 44 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE", s"doc $id: not RIFF/WAVE")
    var i = 12
    var rate = -1; var dataOff = -1; var dataLen = -1
    while (i + 8 <= b.length && (rate < 0 || dataOff < 0)) {
      val tag = new String(b, i, 4, "US-ASCII")
      val size = leU32(b, i + 4).toInt
      // untrusted size: a low-32-bits value like 0xFFFFFFF8 reads
      // as toInt = -8 and would make the walk step zero/negative —
      // an executor-task infinite loop instead of a loud failure.
      // The sum is compared in LONG: a large positive size like
      // 0x7FFFFFF0 would wrap i+8+size negative in Int and slip
      // past the guard into a raw index exception
      require(size >= 0 && i + 8L + size <= b.length,
        s"doc $id: bad chunk size $size at offset $i")
      if (tag == "fmt ") {
        require(leU16(b, i + 8) == 1 && leU16(b, i + 10) == 1 &&
          leU16(b, i + 22) == 16, s"doc $id: not mono 16-bit PCM")
        rate = leU32(b, i + 12).toInt
      } else if (tag == "data") { dataOff = i + 8; dataLen = size }
      i += 8 + size + (size & 1)
    }
    require(rate > 0 && dataOff >= 0 && dataOff + dataLen <= b.length,
      s"doc $id: missing fmt/data chunk")
    val n = dataLen / 2
    val s = new Array[Int](n)
    var t = 0
    while (t < n) { s(t) = leS16(b, dataOff + t * 2); t += 1 }
    (rate, s)
  }

  /** The per-payload audio decode, driver-callable: the
    * [[waveDecodedFields]] values. */
  private[graft] def waveKernel(id: Long, b: Array[Byte]): Seq[Any] = {
    val (rate, s) = waveSamples(id, b)
    val n = s.length
    var sum = 0L; var maxAmp = 0; var zc = 0L
    var t = 0
    while (t < n) {
      val v = s(t); sum += v
      val a = math.abs(v); if (a > maxAmp) maxAmp = a
      if (t >= 1 && s(t - 1).toLong * v < 0) zc += 1
      t += 1
    }
    Seq[Any](rate, n, sum, maxAmp, zc, waveFingerprint(s))
  }

  /** [[decodeWave]] with passthrough columns — same contract as
    * [[decodeRasterKeeping]] (streaming callers thread their event
    * time through the codec boundary).
    */
  def decodeWaveKeeping(withWave: DataFrame, keep: Seq[String]): DataFrame = {
    val keepFields = keep.map(n => withWave.schema(n))
    val outSchema = StructType(
      StructField("doc_id", LongType, nullable = false) +: keepFields ++: waveDecodedFields)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    withWave.select(col("doc_id") +: col("payload") +: keep.map(col): _*)
      .mapPartitions(rows => rows.map { r =>
        val id = r.getLong(0)
        Row.fromSeq(Seq[Any](id) ++ keep.indices.map(k => r.get(2 + k)) ++
          waveKernel(id, r.getAs[Array[Byte]](1)))
      })(encoder)
  }

  private val waveSegmentFields = Seq(
    StructField("seg", IntegerType, nullable = false),
    StructField("n_segs", IntegerType, nullable = false),
    StructField("sfp", LongType, nullable = false))

  /** Per-SEGMENT audio fingerprints: split each decoded track into
    * fixed-length sample segments and fingerprint each with the same
    * 60-bit four-profile device as the whole track ([[waveFingerprint]]
    * over the segment's 16 sub-windows) — the audio analog of the
    * video frame table `(doc_id, seg, n_segs, sfp)`. Fingerprints are
    * SEGMENT-LOCAL by construction (the zero-crossing count starts at
    * the segment's second sample, nothing reads across the boundary),
    * so a track sliced at a segment boundary reproduces the original's
    * segment fingerprints exactly — the property containment search
    * needs. The tail partial segment is dropped (`n_segs = n ∕ segLen`),
    * mirroring the oracle. `segLen` must be a multiple of 16 so the 16
    * sub-windows are equal.
    */
  def decodeWaveSegments(withWave: DataFrame, segLen: Int): DataFrame = {
    require(segLen >= 16 && segLen % 16 == 0,
      s"segment length $segLen must be a positive multiple of 16")
    val outSchema = StructType(
      StructField("doc_id", LongType, nullable = false) +: waveSegmentFields)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    withWave.select(col("doc_id"), col("payload"))
      .mapPartitions(rows => rows.flatMap { r =>
        val id = r.getLong(0)
        val (_, s) = waveSamples(id, r.getAs[Array[Byte]](1))
        val nSegs = s.length / segLen
        (0 until nSegs).map { g =>
          Row.fromSeq(Seq[Any](id, g, nSegs, waveFingerprint(
            java.util.Arrays.copyOfRange(s, g * segLen, (g + 1) * segLen))))
        }
      })(encoder)
  }

  /** Trim-robust AUDIO containment — a jingle inside a longer track:
    * every (short, long, offset) where the short track's whole segment
    * sequence matches a contiguous window of the long track's,
    * segment-for-segment within `maxHamming` on the 60-bit profile
    * fingerprint. Pure reuse of [[clipContainment]]'s anchor device
    * (the fingerprint was sized 60-bit exactly so the 4×15 banding and
    * its radius-3 pigeonhole carry over): band the short tracks'
    * FIRST-segment fingerprints against all segments, verify only the
    * candidates' aligned windows. `segments` is a
    * [[decodeWaveSegments]]-shaped table.
    */
  def audioContainment(segments: DataFrame, maxHamming: Int = 3): DataFrame =
    clipContainment(
      segments.select(col("doc_id"), col("seg").as("frame"),
        col("n_segs").as("n_frames"), col("sfp").as("fhash")),
      maxHamming)

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

  /** Two-table banded Hamming PROBE — [[perceptualNearDupPairs]]'s
    * 4×15-bit banding generalized from self-join to query-vs-corpus:
    * both sides band, candidates meet per (band_i, band_v), exact
    * popcount verifies. Lossless at radius ≤ 3 by the same pigeonhole.
    * `queries` must carry (qid, qhash); `corpus` a `dhash` column plus
    * any payload columns, which ride through to the output with the
    * exact `hamming`. The probe shape of perceptual retrieval: find
    * every corpus signature near each query signature without scanning
    * corpus × queries.
    */
  def perceptualProbe(queries: DataFrame, corpus: DataFrame,
                      maxHamming: Int = 3): DataFrame = {
    // column contract, enforced loudly: the banding adds band_i/band_v
    // via withColumn (which silently REPLACES a same-named input) and
    // the output prepends qid — a corpus already carrying any of the
    // three would be clobbered or ambiguous, producing wrong joins with
    // no error
    val reserved = Set("band_i", "band_v", "qid")
    val clash = corpus.columns.filter(reserved)
    require(clash.isEmpty,
      s"perceptualProbe: corpus must not carry reserved column(s) ${clash.mkString(", ")}")
    def band(df: DataFrame, hCol: String) = df
      .withColumn("band_i", explode(sequence(lit(0), lit(3))))
      .withColumn("band_v", expr(s"shiftright($hCol, 15 * band_i) & 32767"))
    val ham = bit_count(col("qhash").bitwiseXOR(col("dhash")))
    val out = corpus.columns.filterNot(_ == "dhash").map(col)
    band(queries.select(col("qid"), col("qhash")), "qhash")
      .join(band(corpus, "dhash"), Seq("band_i", "band_v"))
      .filter(ham <= maxHamming)
      .select(col("qid") +: out :+ ham.cast("int").as("hamming"): _*)
      .distinct()
  }

  /** THE band layout of the at-rest signature store — one definition
    * shared by the batch writer ([[frameStoreWrite]]) and the
    * streaming ingester ([[graft.streaming.StreamingOps
    * .frameIngestBatch]]): the stored probe's losslessness depends on
    * writer and ingester agreeing bit-for-bit on this shape.
    */
  private[graft] def bandFrames(frames: DataFrame): DataFrame =
    frames
      .withColumn("band_i", explode(sequence(lit(0), lit(3))))
      .withColumn("band_v", expr("shiftright(fhash, 15 * band_i) & 32767"))

  /** THE exact clip-family labeling — one definition shared by the
    * registered p91 clusters and [[graft.Engine.curateClips]]: group
    * clips by their ordered frame-hash sequence, label each with the
    * family's minimum doc_id (`rep`). A future change to the family
    * key (e.g. folding in geometry) lands in both curation paths at
    * once.
    */
  private[graft] def exactClipFamilies(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    frames
      .groupBy(col("doc_id"), col("n_frames"))
      .agg(expr("transform(array_sort(collect_list(struct(frame, fhash)))," +
                " x -> x.fhash)").as("hseq"))
      .withColumn("rep", min(col("doc_id")).over(
        Window.partitionBy(col("n_frames"), col("hseq"))))
      .select(col("doc_id"), col("rep"))
  }

  /** At-rest banded signature store: persist a decoded frame table as
    * band-exploded rows, hive-partitioned by `band_i` (4 directories)
    * and SORTED by `band_v` within each file — so a stored probe's
    * pushed `band_v IN (…)` filter skips row groups via parquet
    * min/max, the p50 posting-store discipline applied to perceptual
    * signatures. 4× row amplification (one row per band), each row a
    * handful of scalars — the store is still ~32 bytes/frame against
    * the ~2 KB+ frames they index.
    */
  def frameStoreWrite(frames: DataFrame, path: String): Unit =
    bandFrames(frames)
      // ingest_batch -1 marks the initial build — the column the
      // streaming merge's exactly-once presence probe keys on, as in
      // every other at-rest store here
      .withColumn("ingest_batch", lit(-1L))
      .repartition(col("band_i"))
      .sortWithinPartitions(col("band_i"), col("band_v"))
      .write.mode("overwrite").partitionBy("band_i")
      // small row groups from the FIRST build, not only after
      // frameStoreCompact — group size is the probe's
      // read-amplification floor (see the compactor's rationale)
      .option("parquet.block.size", 1 << 20)
      .parquet(path)

  /** Compact a [[frameStoreWrite]]-layout store to ONE band_v-SORTED
    * file per band partition — the p50 posting-store lesson applied to
    * the perceptual index. [[graft.sources.Maintenance
    * .compactPartitioned]] is NOT enough here: it folds sliver files
    * but leaves rows unsorted within each rewritten file, so every
    * row group's band_v min/max spans the whole band space and the
    * stored probe's pushed `band_v IN (…)` filter skips nothing. This
    * pass re-establishes the writer's own sort, after which one probe
    * touches only the row groups holding its candidate band values
    * (measured in `tools/ScaleProbe`: see BASELINE.md's frame-store
    * rows). Rewrite-then-swap like every compactor here: `src` is
    * untouched until `dst` is complete; readers swap paths after.
    * Preserves `ingest_batch`, so the streaming merge's exactly-once
    * presence probe survives compaction (its row-group pruning
    * degrades to a scan of the band — correctness never depended on
    * it).
    */
  def frameStoreCompact(spark: org.apache.spark.sql.SparkSession,
                        src: String, dst: String,
                        rowGroupBytes: Int = 1 << 20): Unit =
    // index-store row groups are deliberately SMALL (1 MB, not the
    // 128 MB analytics default): the probe's pushed band_v filter
    // skips at row-group granularity, so group size IS the read
    // amplification floor — a 128 MB group makes every probe read
    // 128 MB per band. Compression/footer overhead at 1 MB is noise
    // next to that. (Same trade the p50 posting store makes via its
    // sorted bucket files.)
    graft.sources.Maintenance.compactPartitionedSorted(
      spark, src, dst, "band_i", "band_v", rowGroupBytes)

  /** Tombstone-aware banded-store scan — every reader of the frame/
    * fingerprint store family goes through it, so a DEFERRED takedown
    * ([[graft.sources.Maintenance.tombstoneAppend]]) stops matching the
    * moment it is queued; the physical rewrite rides the next
    * compaction (the `Dedup.lshStoreScan` discipline on the perceptual
    * layouts). No pending tombstones → a plain scan.
    */
  private def frameStoreScan(spark: org.apache.spark.sql.SparkSession,
                             path: String): DataFrame =
    graft.sources.Maintenance.minusTombstones(spark, path,
      spark.read.parquet(path))

  /** Stored twin of [[perceptualProbe]]: answer a LITERAL query-hash
    * batch from a [[frameStoreWrite]] store. The query hashes are
    * plan-time literals (query batches are model-sized — the
    * centroid/posting-term precedent), so the probe is a pure scan
    * with partition pruning on `band_i` and a pushed `band_v IN`
    * filter that reads only the row groups holding candidate bands —
    * no join on the store side at all until the verified-candidate
    * set, which is banding-sparse by construction.
    */
  /** Above [[graft.operators.Dedup.MaxProbeLiterals]] query hashes the
    * literal encoding switches to a broadcast join (same shared
    * rationale: an unbounded micro-batch must not build an unbounded
    * Catalyst plan); the scan still visits only its 4 band partitions,
    * trading the pushed `band_v IN` row-group skip for a broadcast
    * hash match. Identical semantics on both paths (spec-pinned).
    */
  def frameProbeStored(spark: org.apache.spark.sql.SparkSession,
                       path: String, queryHashes: Seq[(Long, Long)],
                       maxHamming: Int = 3,
                       maxLiterals: Int =
                         graft.operators.Dedup.MaxProbeLiterals): DataFrame = {
    import org.apache.spark.sql.functions.typedLit
    require(queryHashes.nonEmpty, "empty probe batch")
    if (queryHashes.size <= maxLiterals) {
      val bvByBand: Map[Int, Seq[Long]] = (0 until 4).map { b =>
        b -> queryHashes.map { case (_, h) => (h >>> (15 * b)) & 32767L }
          .distinct
      }.toMap
      val cond = (0 until 4).map { b =>
        col("band_i") === b && col("band_v").isin(bvByBand(b): _*)
      }.reduce(_ || _)
      val qs = typedLit(queryHashes.map { case (q, h) => (q, h) })
      frameStoreScan(spark, path)
        .filter(cond)
        .select(col("doc_id"), col("frame"), col("fhash"), col("band_i"),
          col("band_v"),
          explode(qs).as("q"))
        .filter(expr("shiftright(q._2, band_i * 15) & 32767") === col("band_v"))
        .filter(bit_count(col("q._2").bitwiseXOR(col("fhash"))) <= maxHamming)
        .select(col("q._1").as("qid"), col("doc_id"), col("frame"),
          bit_count(col("q._2").bitwiseXOR(col("fhash"))).cast("int")
            .as("hamming"))
        .distinct()
    } else {
      // the probe frame is pre-exploded to its per-band values so the
      // match is a plain (band_i, band_v) EQUI-join (a condition
      // computing band_v from qh inside the join would mix sides and
      // fall back to a nested loop over the store); AQE sizes the join
      // — broadcast for the usual small over-bound batch, shuffle if a
      // caller hands a huge probe Seq (the text twin's discipline: no
      // forced broadcast of an unbounded query side)
      import spark.implicits._
      val q = queryHashes.flatMap { case (qid, h) =>
        (0 until 4).map(b => (qid, h, b, (h >>> (15 * b)) & 32767L))
      }.toDF("qid", "qh", "band_i", "band_v")
      frameStoreScan(spark, path)
        .join(q, Seq("band_i", "band_v"))
        .filter(bit_count(col("qh").bitwiseXOR(col("fhash"))) <= maxHamming)
        .select(col("qid"), col("doc_id"), col("frame"),
          bit_count(col("qh").bitwiseXOR(col("fhash"))).cast("int")
            .as("hamming"))
        .distinct()
    }
  }

  /** [[frameProbeStored]] with the query side kept a DATAFRAME end to
    * end — the no-driver-collect spelling for probe batches too large
    * for the literal plan (the `Dedup.lshProbeStoredDF` discipline on
    * the perceptual store): the query hashes band-explode to four
    * (band_i, band_v) rows each and ride an equi-join against the
    * store scan that AQE sizes — broadcast when the batch turns out
    * small (every micro-batch), shuffle when a caller hands it a
    * corpus-sized query side (the text twin `Dedup.lshProbeStoredDF`'s
    * discipline: a FORCED broadcast of an unbounded query frame is the
    * wrong default at extreme scale). Identical candidate semantics to
    * the literal path; the partition prune is moot here because a
    * banded query touches all four band partitions by construction —
    * what the DF form trades away is only the pushed `band_v IN`
    * row-group skip, exactly the literal path's own above-bound
    * fallback.
    */
  def frameProbeStoredDF(spark: org.apache.spark.sql.SparkSession,
                         path: String, queries: DataFrame,
                         maxHamming: Int = 3): DataFrame = {
    val q = queries.select(col("qid"), col("qhash"))
      .withColumn("band_i", explode(sequence(lit(0), lit(3))))
      .withColumn("band_v", expr("shiftright(qhash, 15 * band_i) & 32767"))
    val ham = bit_count(col("qhash").bitwiseXOR(col("fhash")))
    frameStoreScan(spark, path)
      .join(q, Seq("band_i", "band_v"))
      .filter(ham <= maxHamming)
      .select(col("qid"), col("doc_id"), col("frame"),
        ham.cast("int").as("hamming"))
      .distinct()
  }

  /** The p90/p91 TEMPORAL pair relation re-derived from a stored
    * [[frameStoreWrite]] layout — the video twin of
    * [[graft.operators.Dedup.lshPairsFromStore]], the LIVE pair source
    * for decision tables over the clip space: the decode that
    * dominates from-scratch pair generation is already paid and at
    * rest, so the pair matrix is one band-partition read (each frame
    * exactly once at `band_i = 0`), the clip length recovered as
    * `max(frame)+1` (the store IS the geometry record — the live-yield
    * device), and p90's equal-length aligned relation recomputed over
    * those rows. TOMBSTONE-AWARE via the shared scan: clips queued for
    * deferred takedown stop pairing immediately, which is what p149's
    * differential pins against the from-scratch survivor relation.
    */
  def videoPairsFromStore(spark: org.apache.spark.sql.SparkSession,
                          path: String, maxHamming: Int = 3): DataFrame = {
    val frames0 = frameStoreScan(spark, path)
      .filter(col("band_i") === 0)
      .select(col("doc_id"), col("frame"), col("fhash"))
    val nfr = frames0.groupBy(col("doc_id"))
      .agg((max(col("frame")) + 1).cast("int").as("n_frames"))
    videoNearDupPairs(frames0.join(nfr, Seq("doc_id")), maxHamming)
      .select(col("d1"), col("d2"))
  }

  /** The ONE-FRAME pair relation re-derived from a stored
    * [[frameStoreWrite]] layout of single-frame signatures (the audio
    * fingerprint store, the image dHash store) — the banded Hamming
    * relation ([[perceptualNearDupPairs]]) over the store's own rows:
    * one band-partition read (each signature exactly once at
    * `band_i = 0`), tombstone-aware through the shared scan, so
    * signatures queued for deferred takedown stop pairing immediately
    * (p150's differential). The single-frame special case of
    * [[videoPairsFromStore]], split out because the one-frame layout
    * needs no length roll-up or alignment stage.
    */
  def perceptualPairsFromStore(spark: org.apache.spark.sql.SparkSession,
                               path: String,
                               maxHamming: Int = 3): DataFrame =
    perceptualNearDupPairs(
      frameStoreScan(spark, path)
        .filter(col("band_i") === 0)
        .select(col("doc_id"), col("fhash").as("dhash")),
      maxHamming)
      .select(col("d1"), col("d2"))

  /** TEMPORAL NEAR-DUP pairs of a decoded batch AGAINST a stored
    * [[frameStoreWrite]] layout — p90's equal-length aligned-frame
    * relation (same frame count, every aligned frame within Hamming ≤
    * `maxHamming`) answered batch-vs-store instead of self-join: the
    * evidence feed that keeps p91's clip-cluster labels live under
    * ingestion (the video member of the published-corpus gate family;
    * [[clipContainment]]'s gate handles the unequal-length trims).
    *
    * Read path: frame-0 anchors probe the banded store via the
    * DataFrame-form probe (no driver collect — a maintenance batch has
    * no size bound), candidates keep only stored frame-0 hits (the
    * equal-length relation pins offset 0), and verification joins the
    * candidates' stored frames (one band partition, candidate ids
    * broadcast) against the batch frames position by position —
    * equal length enforced, max aligned distance exact. Lossless at
    * radius ≤ 3 by the banding pigeonhole on frame 0.
    *
    * `frames` is a decoded `(doc_id, frame, n_frames, fhash)` table
    * (pass a checkpointed one — it feeds the anchor probe and the
    * verify join). Emits (doc_id, dup_of, max_hamming).
    */
  def videoNearDupStored(spark: org.apache.spark.sql.SparkSession,
                         storePath: String, frames: DataFrame,
                         maxHamming: Int = 3): DataFrame = {
    val anchors = frames.filter(col("frame") === 0)
      .select(col("doc_id").as("qid"), col("fhash").as("qhash"))
    val cand = frameProbeStoredDF(spark, storePath, anchors, maxHamming)
      .filter(col("frame") === 0)
      // defensive: arriving ids are new by the ingest contract, but a
      // violated contract must not report a clip duplicating itself
      .filter(col("doc_id") =!= col("qid"))
      .select(col("qid"), col("doc_id").as("did"))
      // two consumers (the candidate-doc broadcast and the verify
      // join) — one probe execution, not two
      .localCheckpoint(eager = false)
    val candDocs = cand.select(col("did")).distinct()
    // stored frames of candidate docs only: one band partition, each
    // frame once, candidate ids broadcast (banding-sparse)
    val sfc = frameStoreScan(spark, storePath)
      .filter(col("band_i") === 0)
      .select(col("doc_id").as("did"), col("frame"), col("fhash").as("h2"))
      .join(broadcast(candDocs), Seq("did"))
    val nfl = sfc.groupBy(col("did")).agg((max(col("frame")) + 1).as("nfl"))
    val qn = frames.select(col("doc_id").as("qid"),
      col("n_frames").as("nfs")).distinct()
    val qf = frames.select(col("doc_id").as("qid"), col("frame"),
      col("fhash").as("h1"))
    cand
      // qn/qf are BATCH-sized (corpus-order at the registered entry's
      // slices) — plain joins AQE sizes; only the banding-sparse
      // candidate side broadcasts
      .join(qn, Seq("qid"))
      .join(broadcast(nfl), Seq("did"))
      .filter(col("nfs") === col("nfl"))
      .join(qf, Seq("qid"))
      .join(sfc, Seq("did", "frame"))
      .groupBy(col("qid"), col("did"), col("nfs"))
      .agg(count(lit(1)).as("n_aligned"),
        max(bit_count(col("h1").bitwiseXOR(col("h2")))).as("mh"))
      .filter(col("n_aligned") === col("nfs") && col("mh") <= maxHamming)
      .select(col("qid").as("doc_id"), col("did").as("dup_of"),
        col("mh").cast("int").as("max_hamming"))
      .distinct()
  }

  /** Stored AUDIO probe: [[frameProbeStored]] under the audio store's
    * (seg → frame, sfp → fhash) isomorphism — THE one definition of
    * the column mapping back, shared by `Engine.audioProbeStored` and
    * the registered p110 query.
    */
  def audioProbeStored(spark: org.apache.spark.sql.SparkSession,
                       path: String, queryFps: Seq[(Long, Long)],
                       maxHamming: Int = 3): DataFrame =
    frameProbeStored(spark, path, queryFps, maxHamming)
      .select(col("qid"), col("doc_id"), col("frame").as("seg"),
        col("hamming"))

  // ---- real video decode (raw PPM stream) --------------------------

  /** Video fixture geometry: every modulus divides 160, so documents
    * whose ids are 160 apart render BYTE-IDENTICAL clips and ids 80
    * apart differ by the same ±1 brightness jitter as the still
    * rasters — the temporal near-duplicate family the pair tests need.
    * Clips have SCENE structure: frames come in two-frame scenes whose
    * phase advances by 1 WITHIN a scene (the jitter-sized step — a few
    * wrap-straddling samples flip) and by 37 ACROSS scene boundaries
    * (a large phase jump — a wide band of dHash bits flips). So
    * consecutive-frame dHash distance separates cleanly into "same
    * scene" and "cut", which is what makes scene-cut detection (p92) a
    * real discrimination task instead of a constant; aligned frames of
    * mod-80 jittered twins still differ by exactly 1.
    */
  private[graft] def videoParams(id: Long): (Int, Int, Int) =
    ((32 + (id % 4) * 8).toInt, (24 + (id % 5) * 8).toInt,
     (2 + (id % 8) % 3).toInt)

  private[graft] def videoFrameBase(id: Long, f: Int): Int =
    rasterBase(id) + 37 * (f / 2) + (f % 2)

  /** Render one document's clip: a RAW PPM STREAM — concatenated
    * self-describing P6 frames, the uncompressed video interchange
    * format ffmpeg's `image2pipe`/`ppm` muxer produces. No container
    * index: like a real stream, frame boundaries come from each
    * frame's own header, which is exactly what [[decodeVideoFrames]]
    * must parse its way through.
    */
  private[graft] def videoBytes(id: Long): Array[Byte] = {
    val (w, h, nf) = videoParams(id)
    val hd = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte]((hd.length + w * h * 3) * nf)
    var o = 0
    var f = 0
    while (f < nf) {
      System.arraycopy(hd, 0, out, o, hd.length)
      o += hd.length
      val base = videoFrameBase(id, f)
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
      f += 1
    }
    out
  }

  private val videoSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Attach a raw-PPM-stream clip payload to each document — the
    * fixture stand-in for reading real video files; same conditional
    * rebalance as [[attachBinary]].
    */
  def attachVideo(docs: DataFrame): DataFrame = {
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(videoSchema)
    Parallelism.ensureParallel(docs).select(col("doc_id"))
      .mapPartitions(rows => rows.map { r =>
        val id = r.getLong(0)
        Row(id, videoBytes(id))
      })(encoder)
  }

  private val videoFrameFields = Seq(
    StructField("frame", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("fhash", LongType, nullable = false))

  /** REAL video decode kernel: walk the raw PPM stream frame by frame
    * — each frame is parsed by the same header logic as
    * [[decodeRaster]] (magic, comment-tolerant ints, pixel block) and
    * hashed with the same [[dHash]] — emitting ONE ROW PER FRAME
    * `(doc_id, frame, n_frames, width, height, fhash)`. This is the
    * frame-explode boundary a production pipeline puts right after
    * ffmpeg: blobs never shuffle; what leaves the decode partition is
    * 8-byte signatures. Truncated or misaligned streams fail loudly
    * with the doc id and frame index.
    */
  /** Shared stream walk of [[decodeVideoFrames]]/[[decodeVideoClip]]:
    * parse every frame of one raw PPM stream to (frame, w, h, dHash).
    */
  private[graft] def walkVideo(id: Long, b: Array[Byte]): Vector[(Int, Int, Int, Long)] = {
    val frames = Vector.newBuilder[(Int, Int, Int, Long)]
    var off = 0
    var f = 0
    while (off < b.length) {
      require(off + 2 <= b.length && b(off) == 'P' && b(off + 1) == '6',
        s"doc $id: frame $f is not a P6 header at offset $off")
      val (w, i1) = ppmInt(b, off + 2)
      val (h, i2) = ppmInt(b, i1)
      val (maxval, i3) = ppmInt(b, i2)
      require(maxval == 255, s"doc $id: frame $f maxval $maxval")
      val po = i3 + 1
      // bounds compared in LONG: header dims are untrusted bytes, and
      // an Int w*h*3 for hostile dims (e.g. 37838×37838) wraps to a
      // small positive that would pass the guard and silently mis-hash
      require(w > 0 && h > 0 &&
          po.toLong + w.toLong * h * 3L <= b.length,
        s"doc $id: frame $f pixel block overruns the stream")
      frames += ((f, w, h, dHash(b, po, w, h)))
      off = po + w * h * 3
      f += 1
    }
    frames.result()
  }

  def decodeVideoFrames(withVideo: DataFrame): DataFrame = {
    val outSchema = StructType(
      StructField("doc_id", LongType, nullable = false) +: videoFrameFields)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    withVideo.select(col("doc_id"), col("payload"))
      .mapPartitions(rows => rows.flatMap { r =>
        val id = r.getLong(0)
        val frames = walkVideo(id, r.getAs[Array[Byte]](1))
        val nf = frames.length
        frames.map { case (fi, w, h, hash) =>
          Row.fromSeq(Seq[Any](id, fi, nf, w, h, hash))
        }
      })(encoder)
  }

  /** 64-bit avalanche mixer (MurmurHash3's fmix64 — public domain
    * constants): position must bind to its frame hash NONLINEARLY
    * before the XOR fold, because XOR alone distributes —
    * `⊕(h_f ^ f·K)` separates into `⊕h_f ^ ⊕f·K` and a permuted clip
    * would sign identically.
    */
  private def fmix64(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    z
  }

  /** The exact CLIP signature: XOR over frames of
    * `fmix64(fhash + (frame+1) · golden)` — order-sensitive (the
    * avalanche binds each hash to its position, so any permutation
    * signs differently with overwhelming probability), equal for
    * byte-identical clips, deterministic across partitionings. An
    * EXACT gate only — near-dup clips go through
    * [[videoNearDupPairs]]'s aligned-frame Hamming, the same
    * exact/perceptual split as text (p01 vs p04) and images
    * (p02 vs p59).
    */
  private[graft] def clipSignature(frames: Seq[(Int, Long)]): Long =
    frames.foldLeft(0L) { case (acc, (f, h)) =>
      acc ^ fmix64(h + (f + 1L) * 0x9e3779b97f4a7c15L)
    }

  /** One-row-per-clip decode: walk the stream once, emit
    * `(doc_id, keep…, n_frames, vhash)` with the [[clipSignature]]
    * fold done inside the codec boundary — the shape a streaming
    * dedup gate needs (stateful operators key on a scalar signature
    * column, not on an exploded frame table).
    */
  def decodeVideoClipKeeping(withVideo: DataFrame, keep: Seq[String]): DataFrame = {
    val keepFields = keep.map(n => withVideo.schema(n))
    val outSchema = StructType(
      StructField("doc_id", LongType, nullable = false) +: keepFields ++: Seq(
        StructField("n_frames", IntegerType, nullable = false),
        StructField("vhash", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    withVideo.select(col("doc_id") +: col("payload") +: keep.map(col): _*)
      .mapPartitions(rows => rows.map { r =>
        val id = r.getLong(0)
        val frames = walkVideo(id, r.getAs[Array[Byte]](1))
        Row.fromSeq(Seq[Any](id) ++ keep.indices.map(k => r.get(2 + k)) ++
          Seq[Any](frames.length,
            clipSignature(frames.map { case (f, _, _, h) => (f, h) })))
      })(encoder)
  }

  def decodeVideoClip(withVideo: DataFrame): DataFrame =
    decodeVideoClipKeeping(withVideo, Nil)

  /** Per-clip KEYFRAME extraction inside the codec boundary: a clip's
    * scene cuts depend only on its own frames, which all live in its
    * one payload row — so the whole p92+p93 computation (consecutive
    * dHash distance, cut threshold, running scene index) runs in the
    * decode kernel with ZERO shuffles and zero cross-row state. The
    * relational twin ([[Pipeline10.keyframesOf]], one window pass)
    * exists because a frame TABLE (e.g. an at-rest store) has no
    * payload rows to walk; this form is what a stream wants —
    * stateless, so it runs in append mode with no watermark at all.
    * Emits `(doc_id, keep…, frame, scene, fhash)`, parity with the
    * window form spec-pinned.
    */
  def decodeVideoKeyframesKeeping(withVideo: DataFrame, tau: Int,
                                  keep: Seq[String]): DataFrame = {
    val keepFields = keep.map(n => withVideo.schema(n))
    val outSchema = StructType(
      StructField("doc_id", LongType, nullable = false) +: keepFields ++: Seq(
        StructField("frame", IntegerType, nullable = false),
        StructField("scene", IntegerType, nullable = false),
        StructField("fhash", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    withVideo.select(col("doc_id") +: col("payload") +: keep.map(col): _*)
      .mapPartitions(rows => rows.flatMap { r =>
        val id = r.getLong(0)
        val hs = walkVideo(id, r.getAs[Array[Byte]](1))
          .map { case (f, _, _, h) => (f, h) }
        var scene = 0
        var prev = 0L
        hs.flatMap { case (f, h) =>
          val cut = f > 0 && java.lang.Long.bitCount(h ^ prev) > tau
          if (cut) scene += 1
          prev = h
          if (f == 0 || cut)
            Some(Row.fromSeq(Seq[Any](id) ++
              keep.indices.map(k => r.get(2 + k)) ++ Seq[Any](f, scene, h)))
          else None
        }
      })(encoder)
  }

  def decodeVideoKeyframes(withVideo: DataFrame, tau: Int): DataFrame =
    decodeVideoKeyframesKeeping(withVideo, tau, Nil)

  /** Trim-robust clip CONTAINMENT: every (short, long, offset) where
    * the short clip's whole frame sequence matches a contiguous window
    * of the long clip at `offset`, frame-for-frame within `maxHamming`
    * — the case [[videoNearDupPairs]]'s equal-length alignment cannot
    * see: a clip re-uploaded with leading/trailing frames trimmed is
    * THE most common video near-duplicate in the wild. Anchor device:
    * the short clip's FIRST frame must match the long clip's frame at
    * `offset`, so banding the short frame-0 signatures against ALL
    * frames ([[perceptualProbe]], lossless at radius ≤ 3) yields every
    * candidate (short, long, offset); verification joins only the
    * candidates' frame windows keyed on (long, frame) — never
    * clips × clips, never sequences in memory.
    *
    * `frames` is a [[decodeVideoFrames]]-shaped table. Equal-length
    * containment at offset 0 is reported too (it equals the p90
    * relation); self-matches are excluded.
    */
  def clipContainment(frames: DataFrame, maxHamming: Int = 3): DataFrame = {
    val f0 = frames.filter(col("frame") === 0)
      .select(col("doc_id").as("qid"), col("n_frames").as("nfs"),
        col("fhash").as("qhash"))
    val cand = perceptualProbe(
        f0.select(col("qid"), col("qhash")),
        frames.select(col("doc_id").as("did"), col("frame").as("off"),
          col("n_frames").as("nfl"), col("fhash").as("dhash")),
        maxHamming)
      .join(f0.select(col("qid"), col("nfs")), Seq("qid"))
      .filter(col("did") =!= col("qid") &&
        col("off") + col("nfs") <= col("nfl"))
      .select(col("qid"), col("did"), col("off"), col("nfs"))
    val fa = frames.select(col("doc_id").as("qid"), col("frame").as("f"),
      col("fhash").as("h1"))
    val fb = frames.select(col("doc_id").as("did"), col("frame").as("fl"),
      col("fhash").as("h2"))
    cand.join(fa, Seq("qid"))
      .withColumn("fl", col("f") + col("off"))
      .join(fb, Seq("did", "fl"))
      .groupBy(col("qid"), col("did"), col("off"), col("nfs"))
      .agg(count(lit(1)).as("n_aligned"),
        max(bit_count(col("h1").bitwiseXOR(col("h2")))).as("mh"))
      .filter(col("n_aligned") === col("nfs") && col("mh") <= maxHamming)
      .select(col("qid").as("short_id"), col("did").as("long_id"),
        col("off").cast("int").as("offset"),
        col("mh").cast("int").as("max_hamming"))
      .distinct()
  }

  /** Temporal near-duplicate clip pairs: two videos are near-dups iff
    * they have the SAME frame count and EVERY aligned frame pair is
    * within `maxHamming` on its dHash — the strict alignment semantics
    * under which frame-0 banding is a lossless blocking (the aligned
    * maximum bounds frame 0's distance, and ≤3-bit banding is lossless
    * by pigeonhole, so every qualifying pair surfaces as a frame-0
    * candidate). Verification joins only the candidates' frame rows —
    * never all-pairs, never the blobs.
    */
  def videoNearDupPairs(frames: DataFrame, maxHamming: Int = 3): DataFrame = {
    val cand = perceptualNearDupPairs(
        frames.filter(col("frame") === 0)
          .select(col("doc_id"), col("fhash").as("dhash")),
        maxHamming)
      .select(col("d1"), col("d2"))
    val fa = frames.select(col("doc_id").as("d1"), col("frame"),
      col("n_frames").as("nf1"), col("fhash").as("h1"))
    val fb = frames.select(col("doc_id").as("d2"), col("frame"),
      col("n_frames").as("nf2"), col("fhash").as("h2"))
    cand.join(fa, Seq("d1")).join(fb, Seq("d2", "frame"))
      .filter(col("nf1") === col("nf2"))
      .groupBy(col("d1"), col("d2"), col("nf1"))
      .agg(max(bit_count(col("h1").bitwiseXOR(col("h2")))).as("mh"))
      .filter(col("mh") <= maxHamming)
      .select(col("d1"), col("d2"), col("nf1").as("n_frames"),
              col("mh").cast("int").as("max_hamming"))
  }
}
