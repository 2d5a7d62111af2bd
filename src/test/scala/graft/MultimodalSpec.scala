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
}
