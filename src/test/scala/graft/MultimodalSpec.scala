package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  val docs = Seq((0L, "hello world"), (7L, "abcdefgh"), (9L, "xy"))
    .toDF("doc_id", "text")

  test("binary attach: payload bytes + derived metadata") {
    val r = Multimodal.inspect(Multimodal.attachBinary(docs))
      .orderBy($"doc_id").collect()
    assert(r(0).getAs[Int]("n_bytes") === 11)
    assert(r(0).getAs[String]("head_hex") === "68656c6c6f20776f") // "hello wo"
    assert(r(1).getAs[Int]("width") === 64 + 7 % 8 * 16)
    assert(r(2).getAs[String]("codec") === "fake/0")
  }

  test("raster decode: every output re-derived from the generator formula") {
    // p15 invariant: decodeRaster reads BYTES (header parse + pixel
    // indexing); recompute every stat independently from the pixel
    // formula on the driver and require cell equality.
    val got = Multimodal.decodeRaster(Multimodal.attachRaster(docs))
      .orderBy($"doc_id").collect()
    assert(got.length === 3)
    got.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = Multimodal.rasterDims(id)
      val base = Multimodal.rasterBase(id)
      assert(r.getInt(1) === w && r.getInt(2) === h && r.getInt(3) === 255)
      assert(r.getLong(4) === w.toLong * h * 3)
      for (c <- 0 to 2)
        assert(r.getLong(5 + c) ===
          (0 until w).map(x => Multimodal.pixel(base, x, 0, c).toLong).sum,
          s"doc $id row-0 channel $c sum")
      val expectedPixSum = (for { y <- 0 until h; x <- 0 until w; c <- 0 to 2 }
        yield Multimodal.pixel(base, x, y, c).toLong).sum
      assert(r.getLong(8) === expectedPixSum, s"doc $id pix_sum")
      // dHash from first principles: 11×6 point-sampled grayscale grid
      var expectedHash = 0L
      def g(x: Int, y: Int): Int =
        (0 to 2).map(Multimodal.pixel(base, x, y, _)).sum / 3
      for (j <- 0 until 6; i <- 0 until 10)
        if (g((i + 1) * w / 11, j * h / 6) > g(i * w / 11, j * h / 6))
          expectedHash |= 1L << (j * 10 + i)
      assert(r.getLong(9) === expectedHash, s"doc $id dhash")
      assert(expectedHash >= 0L, "dHash must never touch the sign bit")
    }
  }

  test("raster decode survives netpbm comments and rejects corrupt payloads") {
    val good = Multimodal.rasterBytes(5L)
    // splice a #-comment into the header — a legal netpbm variation the
    // parser must skip (proves this is a real parser, not a fixed-offset
    // slice of our own generator's layout)
    val headerEnd = good.indexOfSlice("255\n".getBytes("US-ASCII"))
    val commented = good.take(2) ++ "\n# fixture camera\n".getBytes("US-ASCII") ++
      good.slice(2, good.length)
    val df = Seq((5L, commented)).toDF("doc_id", "payload")
    val parsed = Multimodal.decodeRaster(df).collect()(0)
    val plain = Multimodal.decodeRaster(Seq((5L, good)).toDF("doc_id", "payload"))
      .collect()(0)
    assert(parsed.toSeq === plain.toSeq, "comment changed the decode")
    // truncated pixel block must fail loudly with the doc id
    val torn = good.dropRight(7)
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeRaster(Seq((5L, torn)).toDF("doc_id", "payload")).collect()
    }
    assert(err.getMessage.contains("doc 5") || err.getCause != null)
  }

  test("frame sampling slices payload windows") {
    val frames = Multimodal.frameSample(Multimodal.attachBinary(docs), 4, 8)
      .orderBy($"doc_id").collect()
    val hw = frames(0).getSeq[String](1) // 11 bytes, stride 4 -> 2 frames
    assert(hw.length === 2 && hw.head === "68656c6c")
  }

  test("frame sampling yields an empty frame list for sub-stride payloads") {
    val frames = Multimodal.frameSample(Multimodal.attachBinary(docs), 64, 8)
      .orderBy($"doc_id").collect()
    assert(frames.forall(_.getSeq[String](1).isEmpty)) // all docs < 64 bytes
  }

  test("frame counts and offsets reconstruct the binary layout on real documents") {
    // p14/p15 layout invariant: for EVERY document, the emitted frame
    // list has exactly min(maxFrames, len/stride) entries and frame i is
    // the hex of the 4-byte payload window at offset i*stride — i.e. the
    // sampler's output is fully determined by (and reassembles against)
    // the raw binary layout.
    val stride = 16
    val maxF = 12
    val bin = Multimodal.attachBinary(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    val rows = Multimodal.frameSample(bin, stride, maxF)
      .join(bin.select($"doc_id", $"payload"), "doc_id")
      .collect()
    assert(rows.length === bin.count())
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      val frames = r.getSeq[String](r.fieldIndex("frames"))
      assert(frames.length === math.min(maxF, payload.length / stride),
        s"doc ${r.getLong(0)}: frame count vs layout")
      frames.zipWithIndex.foreach { case (f, i) =>
        val window = payload.slice(i * stride, i * stride + 4)
        assert(f === window.map("%02x".format(_)).mkString,
          s"doc ${r.getLong(0)} frame $i: offset/content drift")
      }
    }
  }

  test("perceptual near-dup: banded pairs equal brute force, and the fixture has real near-dups") {
    // docs sharing doc_id % 160 render identical rasters (Hamming 0);
    // docs sharing doc_id % 80 differ by the ±1 brightness jitter —
    // drifting only where a sampled pixel straddles a mod-256 wrap
    val ids = ((0L until 400L by 7L) ++ Seq(1L, 81L, 161L, 241L, 321L)).distinct // jitter chain
    val docsDf = ids.map(id => (id, s"doc $id")).toDF("doc_id", "text")
    val hashes = Multimodal.decodeRaster(Multimodal.attachRaster(docsDf))
      .select($"doc_id", $"dhash")
    val got = Multimodal.perceptualNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force on the driver
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      ham = java.lang.Long.bitCount(ha ^ hb) if ham <= 3
    } yield (a, b, ham)).toSet
    assert(got === brute, "banding lost or invented pairs vs brute force")
    // identical-raster pairs exist and land at Hamming 0
    assert(brute.exists { case (a, b, ham) => ham === 0 && (b - a) % 160 === 0 })
    assert(brute.nonEmpty)
  }

  test("video decode: per-frame dHash re-derived from the pixel formula") {
    val vdocs = Seq(3L, 81L, 163L, 240L).toDF("doc_id")
      .withColumn("text", lit(""))
    val got = Multimodal.decodeVideoFrames(Multimodal.attachVideo(vdocs))
      .orderBy($"doc_id", $"frame").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      val f = r.getAs[Int]("frame")
      val (w, h, nf) = Multimodal.videoParams(id)
      assert(r.getAs[Int]("n_frames") === nf)
      assert(r.getAs[Int]("width") === w && r.getAs[Int]("height") === h)
      // independent render: straight from the pixel formula, no stream
      // walking shared with the decoder
      val base = Multimodal.videoFrameBase(id, f)
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        px((y * w + x) * 3 + c) = Multimodal.pixel(base, x, y, c).toByte
      assert(r.getAs[Long]("fhash") === Multimodal.dHash(px, 0, w, h),
        s"doc $id frame $f hash diverged from the formula")
    }
    assert(got.count(_.getLong(0) == 3L) ===
      Multimodal.videoParams(3L)._3, "one row per frame")
  }

  test("video decode rejects truncated and misaligned streams loudly") {
    val good = Multimodal.videoBytes(5L)
    val torn = good.dropRight(3)
    val e1 = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideoFrames(Seq((5L, torn)).toDF("doc_id", "payload"))
        .collect()
    }
    val m1 = e1.getMessage + Option(e1.getCause).map(_.getMessage).getOrElse("")
    assert(m1.contains("doc 5"))
    // a stray byte between frames breaks the next header's magic
    val (w0, h0, _) = Multimodal.videoParams(5L)
    val frame0Len = s"P6\n$w0 $h0\n255\n".length + w0 * h0 * 3
    val misaligned = (good.take(frame0Len) :+ 0.toByte) ++
      good.drop(frame0Len)
    val e2 = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideoFrames(
          Seq((5L, misaligned)).toDF("doc_id", "payload")).collect()
    }
    val m2 = e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(m2.contains("not a P6 header"))
  }

  test("video near-dup: byte-identical clips pair at 0, banding equals brute force") {
    val ids = (0L until 400L by 7L) ++ Seq(160L, 320L, 87L, 167L)
    val vdocs = ids.distinct.toDF("doc_id").withColumn("text", lit(""))
    val frames = Multimodal.decodeVideoFrames(Multimodal.attachVideo(vdocs))
      .localCheckpoint()
    val got = Multimodal.videoNearDupPairs(frames, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // brute force on the driver: same frame count, aligned max Hamming
    val fs = frames.collect()
      .map(r => (r.getLong(0), r.getAs[Int]("frame"), r.getAs[Int]("n_frames"),
        r.getAs[Long]("fhash")))
      .groupBy(_._1).view
      .mapValues(a => (a.head._3, a.sortBy(_._2).map(_._4).toVector)).toMap
    val brute = (for {
      (a, (nfa, ha)) <- fs.toSeq; (b, (nfb, hb)) <- fs.toSeq
      if a < b && nfa == nfb
      mh = ha.zip(hb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.max
      if mh <= 3
    } yield (a, b, mh)).toSet
    assert(got === brute, "frame-0 banding lost or invented clip pairs")
    assert(brute.exists { case (a, b, mh) => mh === 0 && (b - a) % 160 === 0 },
      "mod-160 twins must pair at distance 0")
  }

  test("clip containment finds trimmed re-uploads at their offset (brute-force parity)") {
    // hand-built payloads: slice videoBytes(2) (4 frames) at frame
    // boundaries — a trimmed re-upload is a byte-suffix/-slice of the
    // original stream, exactly what a real trim produces
    val full = Multimodal.videoBytes(2L)
    val (w, h, nf) = Multimodal.videoParams(2L)
    assert(nf === 4)
    val frameLen = s"P6\n$w $h\n255\n".length + w * h * 3
    val docs = Seq(
      100L -> full,                                        // original
      101L -> full.drop(frameLen),                         // head-trimmed (3f)
      102L -> Multimodal.videoBytes(3L),                   // unrelated
      103L -> full.slice(frameLen, 3 * frameLen))          // middle slice (2f)
    val frames = Multimodal.decodeVideoFrames(
      docs.toDF("doc_id", "payload"))
    val got = Multimodal.clipContainment(frames, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Int]("offset"), r.getAs[Int]("max_hamming"))).toSet
    // driver-side brute force over the decoded hashes
    val hs = frames.collect()
      .map(r => (r.getLong(0), r.getAs[Int]("frame"), r.getAs[Long]("fhash")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
    val want = (for {
      (a, ha) <- hs.toSeq; (b, hb) <- hs.toSeq if a != b
      off <- 0 to (hb.length - ha.length)
      ds = ha.indices.map(f => java.lang.Long.bitCount(ha(f) ^ hb(off + f)))
      if ds.max <= 3
    } yield (a, b, off, ds.max)).toSet
    assert(got === want, "containment diverged from brute force")
    assert(got.contains((101L, 100L, 1, 0)), "head-trim not found at offset 1")
    assert(got.contains((103L, 100L, 1, 0)) && got.contains((103L, 101L, 0, 0)))
    assert(!got.exists(c => c._1 == 102L || c._2 == 102L),
      "unrelated clip must not be contained")
  }

  test("audio containment finds hand-sliced jingles at their offset (brute-force parity)") {
    // true trims, which the generated corpus lacks: slice a fixture
    // track's SAMPLES at segment boundaries and re-wrap as WAV — the
    // jingle-inside-a-track case. Segment-local fingerprints must make
    // the slice's segments equal the original's window exactly.
    val L = 64
    val (period, phase, n, k) = Multimodal.waveParams(3L)
    assert(n === 448) // 7 segments at L=64
    val base = Array.tabulate(n)(t => Multimodal.sampleAt(period, phase, n, k, t))
    val docs = Seq(
      100L -> Multimodal.wavePcmBytes(base),                    // original (7 segs)
      101L -> Multimodal.wavePcmBytes(base.slice(L, 5 * L)),    // middle slice (4 segs)
      102L -> Multimodal.wavePcmBytes(base.drop(4 * L)),        // tail (3 segs)
      103L -> Multimodal.waveBytes(9L))                         // unrelated
    val segs = Multimodal.decodeWaveSegments(docs.toDF("doc_id", "payload"), L)
    // segment locality: the slice's fingerprints ARE the original's window
    val fp = segs.collect()
      .map(r => (r.getLong(0), r.getAs[Int]("seg"), r.getAs[Long]("sfp")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
    assert(fp(101L) === fp(100L).slice(1, 5), "sliced fingerprints drifted")
    assert(fp(102L) === fp(100L).drop(4))
    val got = Multimodal.audioContainment(segs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Int]("offset"), r.getAs[Int]("max_hamming"))).toSet
    val want = (for {
      (a, ha) <- fp.toSeq; (b, hb) <- fp.toSeq if a != b
      off <- 0 to (hb.length - ha.length)
      ds = ha.indices.map(f => java.lang.Long.bitCount(ha(f) ^ hb(off + f)))
      if ds.max <= 3
    } yield (a, b, off, ds.max)).toSet
    assert(got === want, "audio containment diverged from brute force")
    assert(got.contains((101L, 100L, 1, 0)), "middle slice not found at offset 1")
    assert(got.contains((102L, 100L, 4, 0)), "tail slice not found at offset 4")
  }

  test("clip signature: equal for identical clips, distinct scenes, order-sensitive") {
    val vdocs = Seq(0L, 1L, 160L).toDF("doc_id").withColumn("text", lit(""))
    val sig = Multimodal.decodeVideoClip(Multimodal.attachVideo(vdocs))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("vhash")).toMap
    assert(sig(0L) === sig(160L), "byte-identical clips must sign equal")
    assert(sig(0L) !== sig(1L), "different scenes must sign differently")
    // the position mix makes a permuted clip sign differently
    val hs = Seq((0, 11L), (1, 22L), (2, 33L))
    assert(Multimodal.clipSignature(hs) !==
      Multimodal.clipSignature(Seq((0, 22L), (1, 11L), (2, 33L))))
  }

  test("kernel keyframes equal the window form for every threshold in the gap") {
    val vdocs = (0L until 60L by 3L).toDF("doc_id").withColumn("text", lit(""))
    val withVideo = Multimodal.attachVideo(vdocs).localCheckpoint()
    for (tau <- Seq(0, 6, 8, 9, 60)) {
      val kernel = Multimodal.decodeVideoKeyframes(withVideo, tau)
        .collect().map(_.toSeq).toSet
      val window = graft.operators.Pipeline10.keyframesOf(
          Multimodal.decodeVideoFrames(withVideo), tau)
        .collect().map(_.toSeq).toSet
      assert(kernel === window, s"kernel/window keyframes diverged at tau=$tau")
    }
  }

  test("scene structure: within-scene dHash steps sit under the cut gap, cross-scene above") {
    val vdocs = (0L until 40L).toDF("doc_id").withColumn("text", lit(""))
    val fr = Multimodal.decodeVideoFrames(Multimodal.attachVideo(vdocs))
      .orderBy($"doc_id", $"frame").collect()
      .map(r => (r.getLong(0), r.getAs[Int]("frame"), r.getAs[Long]("fhash")))
    val trans = fr.groupBy(_._1).values.flatMap { g =>
      g.sortBy(_._2).sliding(2).collect { case Array(a, b) =>
        (b._2, java.lang.Long.bitCount(a._3 ^ b._3))
      }
    }.toSeq
    val (cross, within) = trans.partition(_._1 % 2 == 0) // scenes are 2 frames
    assert(within.nonEmpty && cross.nonEmpty)
    // the p92 threshold (8) must sit strictly inside this measured gap
    assert(within.map(_._2).max <= 6,
      s"within-scene step leaked over the gap: ${within.map(_._2).max}")
    assert(cross.map(_._2).min >= 10,
      s"cross-scene step fell into the gap: ${cross.map(_._2).min}")
  }

  test("stored frame probe: the broadcast fallback matches the literal plan") {
    // an oversized probe batch must not build an unbounded literal
    // plan; the broadcast fallback (forced via maxLiterals = 0) must
    // answer bit-identically
    val vdocs = (0L until 20L).toDF("doc_id").withColumn("text", lit(""))
    val frames = Multimodal.decodeVideoFrames(Multimodal.attachVideo(vdocs))
      .select($"doc_id", $"frame", $"fhash").localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("frame_fb").toString
    Multimodal.frameStoreWrite(frames, store)
    val qs = frames.filter($"frame" === 0)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("fhash"))).toSeq
    def run(ml: Int) =
      Multimodal.frameProbeStored(spark, store, qs, maxHamming = 3,
          maxLiterals = ml)
        .orderBy($"qid", $"doc_id", $"frame").collect().map(_.toSeq).toSeq
    val litRows = run(Int.MaxValue)
    assert(litRows.nonEmpty && run(0) === litRows,
      "frame-probe fallback diverged from the literal plan")
    val plan = Multimodal.frameProbeStored(spark, store, qs, maxHamming = 3,
        maxLiterals = 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "fallback probe frame no longer broadcasts")
  }
}
