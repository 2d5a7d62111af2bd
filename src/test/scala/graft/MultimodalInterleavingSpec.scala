package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{LabelStore, Multimodal, Pipeline9}
import graft.sources.Maintenance
import graft.streaming.StreamingOps

/** The remaining three store families under the randomized (and
  * crash-injecting) lifecycle harness — round-16 verdict item 2: the
  * text-LSH, lexical and vector families got random
  * ingest/retract/compact sequences in InterleavingSpec; the video
  * frame store, the audio fingerprint store, and the UNIFIED
  * cross-modal label space (the richest composition — one label store
  * fed by four modality gates, the likeliest place for a composition
  * bug to hide) still relied on hand-picked-order proofs. Same harness
  * contract as InterleavingSpec: random serial mutation sequences per
  * store set, a from-scratch survivor model recomputed with the
  * handlers' own batch functions and asserted after EVERY step, and
  * every mutation run through the crash-injecting step wrapper (arm a
  * random boundary, die mid-handler, heal by re-running the same call,
  * continue) — the composed crash-under-interleaving state space from
  * the start, since these families never had a crash-free randomized
  * pass to preserve.
  *
  * Fixture geometry: the synthetic payload codecs render ids congruent
  * mod 160 byte-identical and link mod-80 neighbors within the banded
  * Hamming radius (the StreamingSpec fixtures' contract), so the
  * universes below carry real families and one cross-family bridge —
  * but the MODEL never assumes any of that: it recomputes
  * pairs/labels from scratch over the live subset.
  */
class MultimodalInterleavingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val nSeqs =
    sys.env.getOrElse("SPARK_GRAFT_INTERLEAVE_SEQS", "16").toInt
  private val nSteps =
    sys.env.getOrElse("SPARK_GRAFT_INTERLEAVE_STEPS", "4").toInt

  private def tmp(tag: String) = SparkTestBase.tmpDir(s"mileave_$tag")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def runAll(run: Int => Unit, n: Int): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(
      Future.sequence((0 until n).map(s => Future(run(s)))),
      45.minutes)
    finally pool.shutdown()
  }

  /** InterleavingSpec's crash-injecting step wrapper (same semantics):
    * arm a random boundary k ∈ [0, 8); an op crossing fewer boundaries
    * completes uncrashed; a killed op re-runs as its own heal.
    */
  private val crashCount = new java.util.concurrent.atomic.AtomicInteger

  private def step(rnd: scala.util.Random)(op: () => Unit): Unit = {
    val k = rnd.nextInt(8)
    val died =
      try { CrashPoints.arm(k); op(); false }
      catch { case _: CrashPoints.InjectedCrash => true }
      finally CrashPoints.disarm()
    if (died) { crashCount.incrementAndGet(); op() }
  }

  /** 8 perceptual families of 3 byte-identical members (bases spaced 10
    * apart are unlinked; members at +160/+320 are identical), with ONE
    * designed cross-family bridge: base 3 and base 83 differ by 80, so
    * their members sit within the banded Hamming radius of each other.
    */
  private val bases = Seq(3L, 83L, 13L, 23L, 33L, 43L, 53L, 63L)
  private val mmUniverse: Seq[Long] =
    bases.flatMap(b => Seq(b, b + 160L, b + 320L))

  private def idsOf(ids: Set[Long]): DataFrame =
    mmUniverse.filter(ids.contains).toDF("doc_id")

  /** The generic runner over one banded store + label pair — video and
    * audio differ only in their decode, pair relation, and handlers, so
    * the sequence driver is shared (the cross-modal family gets its own
    * below: four stores, one label space).
    */
  private def runBandedSequence(
      tag: String, seed: Int,
      initStore: (DataFrame, String) => Unit,
      pairsOf: DataFrame => DataFrame,
      ingest: (String, String, String) => (DataFrame, Long) => DataFrame,
      eager: (String, String) => DataFrame => Long,
      deferred: (String, String) => DataFrame => Long,
      payloadOf: DataFrame => DataFrame,
      expected: Set[Long] => Seq[String]): Unit = {
    val store = tmp(s"${tag}_s"); val lbl = tmp(s"${tag}_l")
    val stage = tmp(s"${tag}_g")
    val rnd = new scala.util.Random(seed)
    var live = mmUniverse.take(6).toSet // the two bridged families
    var pool = mmUniverse.drop(6)
    var everRetracted = Set.empty[Long]
    var nextBatch = 0L
    initStore(idsOf(live), store)
    LabelStore.write(
      LabelStore.labelsFor(idsOf(live), pairsOf(idsOf(live))), lbl)

    def check(ctx: String): Unit = {
      assert(rows(LabelStore.read(spark, lbl)) === expected(live),
        s"$ctx: labels diverged from the from-scratch survivor contraction")
      val stored = Maintenance.minusTombstones(spark, store,
          spark.read.parquet(store))
        .select(col("doc_id")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(stored === live,
        s"$ctx: the tombstone-aware store scan's id set diverged from " +
          "the survivors")
    }
    check(s"$tag seed=$seed init")

    (0 until nSteps).foreach { stepNo =>
      val ctx = s"$tag seed=$seed step=$stepNo"
      def retractTargets(): Set[Long] = {
        val cand = (live ++ everRetracted).toSeq.sorted
        rnd.shuffle(cand).take(1 + rnd.nextInt(2)).toSet
      }
      def compactOp(): Unit = {
        StreamingOps.recoverStoreSwap(spark, store)
        Multimodal.frameStoreCompact(spark, store, s"${store}__compact")
        StreamingOps.swapInCompacted(spark, store)
      }
      rnd.nextInt(8) match {
        case 0 | 1 | 2 if pool.nonEmpty => // ingest via the live handler
          val take = 1 + rnd.nextInt(math.min(3, pool.size))
          val ids = pool.take(take).toSet; pool = pool.drop(take)
          nextBatch += 1; val id = nextBatch // retry reuses the SAME id
          step(rnd)(() =>
            ingest(store, lbl, stage)(payloadOf(idsOf(ids)), id))
          live ++= ids
        case 0 | 1 | 2 => // pool exhausted: compact instead
          step(rnd)(() => compactOp())
        case 3 | 4 => // eager retraction
          val ids = retractTargets()
          step(rnd)(() => eager(store, lbl)(ids.toSeq.toDF("doc_id")))
          everRetracted ++= ids; live --= ids
        case 5 | 6 => // deferred retraction
          val ids = retractTargets()
          step(rnd)(() => deferred(store, lbl)(ids.toSeq.toDF("doc_id")))
          everRetracted ++= ids; live --= ids
        case 7 => // the applying compaction
          step(rnd)(() => compactOp())
      }
      check(ctx)
    }
  }

  // ---- VIDEO frame-store family ----

  private def vFramesOf(ids: DataFrame): DataFrame =
    Multimodal.decodeVideoFrames(Multimodal.attachVideo(ids))
      .select(col("doc_id"), col("frame"), col("n_frames"), col("fhash"))

  private def vPairsOf(ids: DataFrame): DataFrame =
    Multimodal.videoNearDupPairs(vFramesOf(ids), maxHamming = 3)
      .select(col("d1"), col("d2"))

  private val videoModel = collection.mutable.Map.empty[Set[Long], Seq[String]]
  private def videoExpected(live: Set[Long]): Seq[String] =
    videoModel.synchronized(videoModel.getOrElseUpdate(live,
      rows(LabelStore.labelsFor(idsOf(live), vPairsOf(idsOf(live))))))

  test("video frame-store interleavings (with injected crashes) equal a from-scratch survivor rebuild after every step") {
    crashCount.set(0)
    runAll(s => runBandedSequence(
      tag = "vid", seed = 40000 + s,
      initStore = (ids, store) => Multimodal.frameStoreWrite(
        vFramesOf(ids).select(col("doc_id"), col("frame"), col("fhash")),
        store),
      pairsOf = vPairsOf,
      ingest = (store, lbl, stage) =>
        StreamingOps.videoMaintainBatch(spark, store, lbl, stage,
          maxHamming = 3, compactMaxFiles = 2),
      eager = (store, lbl) =>
        StreamingOps.videoRetractBatch(spark, store, lbl),
      deferred = (store, lbl) =>
        StreamingOps.videoRetractDeferred(spark, store, lbl,
          compactMaxFiles = 2),
      payloadOf = Multimodal.attachVideo,
      expected = videoExpected),
      n = math.max(8, nSeqs * 2 / 5))
    info(s"video composed run: ${crashCount.get()} crashes injected and healed")
  }

  // ---- AUDIO fingerprint-store family ----

  private def aFpsOf(ids: DataFrame): DataFrame =
    Multimodal.decodeWave(Multimodal.attachWave(ids))
      .select(col("doc_id"), col("afp"))

  private def aPairsOf(ids: DataFrame): DataFrame =
    Multimodal.perceptualNearDupPairs(
        aFpsOf(ids).select(col("doc_id"), col("afp").as("dhash")),
        maxHamming = 3)
      .select(col("d1"), col("d2"))

  private val audioModel = collection.mutable.Map.empty[Set[Long], Seq[String]]
  private def audioExpected(live: Set[Long]): Seq[String] =
    audioModel.synchronized(audioModel.getOrElseUpdate(live,
      rows(LabelStore.labelsFor(idsOf(live), aPairsOf(idsOf(live))))))

  test("audio fingerprint-store interleavings (with injected crashes) equal a from-scratch survivor rebuild after every step") {
    crashCount.set(0)
    runAll(s => runBandedSequence(
      tag = "aud", seed = 50000 + s,
      initStore = (ids, store) => Multimodal.frameStoreWrite(
        aFpsOf(ids).select(col("doc_id"), lit(0).as("frame"),
          col("afp").as("fhash")),
        store),
      pairsOf = aPairsOf,
      ingest = (store, lbl, stage) =>
        StreamingOps.audioMaintainBatch(spark, store, lbl, stage,
          maxHamming = 3, compactMaxFiles = 2),
      eager = (store, lbl) =>
        StreamingOps.audioRetractBatch(spark, store, lbl),
      deferred = (store, lbl) =>
        StreamingOps.audioRetractDeferred(spark, store, lbl,
          compactMaxFiles = 2),
      payloadOf = Multimodal.attachWave,
      expected = audioExpected),
      n = math.max(8, nSeqs * 2 / 5))
    info(s"audio composed run: ${crashCount.get()} crashes injected and healed")
  }

  // ---- the UNIFIED CROSS-MODAL label space (four stores, one fold) ----

  /** Texts carry their own bridges ACROSS perceptual families: 13 and
    * 243 share a text (perceptual families 13 and 83), 33 and 203 share
    * another (families 33 and 43) — so retracting a text bridge must
    * split families that every PERCEPTUAL relation keeps joined, and
    * vice versa for the base-3/base-83 payload bridge.
    */
  private def xDocsOf(ids: DataFrame): DataFrame = ids
    .withColumn("tid",
      when(col("doc_id").isin(13L, 243L), 999L)
        .when(col("doc_id").isin(33L, 203L), 998L)
        .otherwise(col("doc_id")))
    .select(col("doc_id"),
      concat(lit("xmodal text "), col("tid").cast("string")).as("text"))

  private def xPayloadsOf(docs: DataFrame): DataFrame = docs
    .join(Multimodal.attachRaster(docs).withColumnRenamed("payload", "img"),
      Seq("doc_id"))
    .join(Multimodal.attachWave(docs).withColumnRenamed("payload", "wav"),
      Seq("doc_id"))
    .join(Multimodal.attachVideo(docs).withColumnRenamed("payload", "vid"),
      Seq("doc_id"))

  private def xUnionPairsOf(docs: DataFrame): DataFrame = {
    val dh = Multimodal.decodeRaster(Multimodal.attachRaster(docs))
      .select(col("doc_id"), col("dhash"))
    Pipeline9.exactTextPairsOf(docs)
      .union(Multimodal.perceptualNearDupPairs(dh, 3)
        .select(col("d1"), col("d2")))
      .union(aPairsOf(docs.select(col("doc_id"))))
      .union(vPairsOf(docs.select(col("doc_id"))))
  }

  private val xModel = collection.mutable.Map.empty[Set[Long], Seq[String]]
  private def xExpected(live: Set[Long]): Seq[String] =
    xModel.synchronized(xModel.getOrElseUpdate(live,
      rows(LabelStore.labelsFor(idsOf(live),
        xUnionPairsOf(xDocsOf(idsOf(live)))))))

  private def runXSequence(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val (txt, img, aud, vid) =
      (tmp("x_txt"), tmp("x_img"), tmp("x_aud"), tmp("x_vid"))
    val lbl = tmp("x_lbl"); val stage = tmp("x_stg")
    val stores = Seq(txt, img, aud, vid)
    var live = mmUniverse.take(6).toSet
    var pool = mmUniverse.drop(6)
    var everRetracted = Set.empty[Long]
    var nextBatch = 0L
    val init = xDocsOf(idsOf(live)).localCheckpoint()
    Multimodal.frameStoreWrite(
      Pipeline9.exactTextSigFrames(init)
        .select(col("doc_id"), col("frame"), col("fhash")), txt)
    Multimodal.frameStoreWrite(
      Multimodal.decodeRaster(Multimodal.attachRaster(init))
        .select(col("doc_id"), lit(0).as("frame"),
          col("dhash").as("fhash")), img)
    Multimodal.frameStoreWrite(
      aFpsOf(init).select(col("doc_id"), lit(0).as("frame"),
        col("afp").as("fhash")), aud)
    Multimodal.frameStoreWrite(
      vFramesOf(init).select(col("doc_id"), col("frame"), col("fhash")),
      vid)
    LabelStore.write(
      LabelStore.labelsFor(idsOf(live), xUnionPairsOf(init)), lbl)

    def check(ctx: String): Unit = {
      assert(rows(LabelStore.read(spark, lbl)) === xExpected(live),
        s"$ctx: unified labels diverged from the from-scratch contraction")
      stores.foreach { s =>
        val stored = Maintenance.minusTombstones(spark, s,
            spark.read.parquet(s))
          .select(col("doc_id")).distinct()
          .collect().map(_.getLong(0)).toSet
        assert(stored === live,
          s"$ctx: store $s id set diverged from the survivors")
      }
    }
    check(s"xmodal seed=$seed init")

    (0 until nSteps).foreach { stepNo =>
      val ctx = s"xmodal seed=$seed step=$stepNo"
      def retractTargets(): Set[Long] = {
        val cand = (live ++ everRetracted).toSeq.sorted
        rnd.shuffle(cand).take(1 + rnd.nextInt(2)).toSet
      }
      def compactOp(store: String): Unit = {
        StreamingOps.recoverStoreSwap(spark, store)
        Multimodal.frameStoreCompact(spark, store, s"${store}__compact")
        StreamingOps.swapInCompacted(spark, store)
      }
      rnd.nextInt(8) match {
        case 0 | 1 | 2 if pool.nonEmpty => // ingest via the ONE handler
          val take = 1 + rnd.nextInt(math.min(3, pool.size))
          val ids = pool.take(take).toSet; pool = pool.drop(take)
          nextBatch += 1; val id = nextBatch
          step(rnd)(() =>
            StreamingOps.multimodalMaintainBatch(spark, txt, img, aud,
              vid, lbl, stage, maxHamming = 3, compactMaxFiles = 2)(
              xPayloadsOf(xDocsOf(idsOf(ids))), id))
          live ++= ids
        case 0 | 1 | 2 => // pool exhausted: compact a random store
          step(rnd)(() => compactOp(stores(rnd.nextInt(4))))
        case 3 | 4 => // eager retraction over the unified space
          val ids = retractTargets()
          step(rnd)(() =>
            StreamingOps.multimodalRetractBatch(spark, txt, img, aud,
              vid, lbl)(ids.toSeq.toDF("doc_id")))
          everRetracted ++= ids; live --= ids
        case 5 | 6 => // deferred retraction: four zone appends
          val ids = retractTargets()
          step(rnd)(() =>
            StreamingOps.multimodalRetractDeferred(spark, txt, img, aud,
              vid, lbl, compactMaxFiles = 2)(ids.toSeq.toDF("doc_id")))
          everRetracted ++= ids; live --= ids
        case 7 => // the applying compaction, one random store at a time
          step(rnd)(() => compactOp(stores(rnd.nextInt(4))))
      }
      check(ctx)
    }
  }

  test("cross-modal unified-label interleavings (with injected crashes) equal a from-scratch survivor rebuild after every step") {
    crashCount.set(0)
    runAll(s => runXSequence(60000 + s), n = math.max(6, nSeqs / 5))
    info(s"xmodal composed run: ${crashCount.get()} crashes injected and healed")
  }
}
