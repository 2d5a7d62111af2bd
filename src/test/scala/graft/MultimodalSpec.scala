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

  test("decode stub: fixed feature dim, L1-normalized, deterministic") {
    val f1 = Multimodal.decodeStub(spark, Multimodal.attachBinary(docs))
      .orderBy($"doc_id").collect()
    val f2 = Multimodal.decodeStub(spark, Multimodal.attachBinary(docs))
      .orderBy($"doc_id").collect()
    assert(f1.length === 3)
    f1.foreach { r =>
      val feats = r.getSeq[Float](1)
      assert(feats.length === Multimodal.FeatureDim)
      assert(math.abs(feats.map(_.toDouble).sum - 1.0) < 1e-5)
    }
    assert(f1.map(_.getSeq[Float](1)) === f2.map(_.getSeq[Float](1)))
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

  test("decode-stub features equal the exact per-bin byte histogram of the payload") {
    // p15 invariant: the "decoded" vector is the L1-normalized 16-bin
    // histogram of the payload BYTES — recompute it independently on the
    // driver and require bit-equality bin by bin (counts are exact in
    // float32 far below 2^24, and the normalizing division is the same
    // single IEEE op, so no tolerance is needed).
    val bin = Multimodal.attachBinary(
      graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(50))
    val feats = Multimodal.decodeStub(spark, bin).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val payloads = bin.select($"doc_id", $"payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    assert(feats.keySet === payloads.keySet, "row drop or duplication in decode")
    payloads.foreach { case (id, bytes) =>
      val hist = new Array[Float](Multimodal.FeatureDim)
      bytes.foreach(b => hist((b & 0xff) % Multimodal.FeatureDim) += 1f)
      val total = math.max(1f, bytes.length.toFloat)
      assert(feats(id) === hist.map(_ / total).toSeq, s"doc $id histogram mismatch")
    }
  }
}
