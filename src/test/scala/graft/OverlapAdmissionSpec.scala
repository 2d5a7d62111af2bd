package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, LabelStore, Multimodal, Pipeline9, Similarity}
import graft.sources.Maintenance
import graft.streaming.StreamingOps

/** OVERLAP-ADMISSION proof for the NON-LEXICAL retraction handlers —
  * round-16 verdict item 3: the lexical family's takedown carries a
  * numeric half (the `_stats` decrement), where admitting a second
  * batch that shares ids with one stranded between its halves would
  * decrement those ids AGAIN — so lexical got an enforced admission
  * guard. The label-half families (text LSH, vector/IVF, video, audio,
  * and the unified cross-modal space) claim in their scaladoc that NO
  * guard is owed: their two halves each gate on their OWN store's
  * state — the label half re-derives `before` from the label table
  * (already-removed ids count zero, never twice) and the store half is
  * a row removal / zone append (set-semantics, idempotent) — so an
  * overlapping batch admitted inside the labels→store crash window
  * converges instead of double-counting. Until this suite that was an
  * inference; here it is pinned, per family and per form:
  *
  *  1. batch A = {a} is STRANDED by an injected crash at the exact
  *     labels→store boundary (the `.labels` [[CrashPoints]] hit) — and
  *     the suite proves the window is REAL: the labels already exclude
  *     `a` while the tombstone-aware store read still serves it;
  *  2. the OVERLAPPING batch B = {a, c} (the stranded id plus a live
  *     member of the SAME component) is admitted inside that window
  *     and runs to completion — its label half must count exactly the
  *     one row `c` still owns (the stranded `a` must not re-count),
  *     and its store half must clear BOTH ids;
  *  3. A retries to completion as a full no-op (returns 0);
  *  4. labels, the tombstone-aware id set, and — after the applying
  *     compaction retires any zones — the PHYSICAL store all equal the
  *     from-scratch survivor state.
  *
  * All four eager/deferred form pairs run per family (A's form × B's
  * form): the mixed pairs cross the handlers' tombstone/rewrite
  * interplay — an eager B physically removing rows a stranded deferred
  * A never got to tombstone, and a deferred B queueing zones an eager
  * A's retry then rewrites around. One extra cross-modal scenario
  * strands A MID-STORE (after the labels and some of the four store
  * halves) — the widest window the unified handler has.
  */
class OverlapAdmissionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String) = SparkTestBase.tmpDir(s"ovadm_$tag")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** One family instance: fresh store paths per scenario, closures
    * bound to them. `universeLive`'s first three ids are one linked
    * triple (a, c, b) — same component, so B's retraction overlaps A's
    * both by id AND by affected component.
    */
  private case class Family(
      tag: String, idCol: String, universeLive: Seq[Long],
      build: Set[Long] => Unit,
      eager: DataFrame => Long, deferred: DataFrame => Long,
      compactAll: () => Unit,
      expected: Set[Long] => Seq[String],
      labelRows: () => Seq[String],
      // one live / physical id set PER store: inside a mid-store crash
      // window the stores legitimately disagree, so the scenario checks
      // presence via any-store and convergence via every-store
      liveIdsPerStore: () => Seq[Set[Long]],
      physicalIdsPerStore: () => Seq[Set[Long]])

  private def runForm(f: Family, form: String, ids: Set[Long]): Long = {
    val rm = ids.toSeq.toDF(f.idCol)
    if (form == "eager") f.eager(rm) else f.deferred(rm)
  }

  /** The scenario described in the suite scaladoc. `armAt` picks the
    * instrumented boundary that strands A — 0 is the labels→store
    * window in every handler; the cross-modal mid-store variant arms
    * deeper.
    */
  private def overlapScenario(mk: () => Family, formA: String,
                              formB: String, armAt: Int = 0,
                              requireLabelsPoint: Boolean = true): Unit = {
    val f = mk()
    val live0 = f.universeLive.toSet
    f.build(live0)
    val a = f.universeLive.head; val c = f.universeLive(1)
    val ctx = s"${f.tag} A=$formA B=$formB arm=$armAt"

    // 1. strand A between its halves
    val e = intercept[CrashPoints.InjectedCrash] {
      try { CrashPoints.arm(armAt); runForm(f, formA, Set(a)) }
      finally CrashPoints.disarm()
    }
    if (requireLabelsPoint) {
      assert(e.point.endsWith(".labels"),
        s"$ctx: expected to die at the labels->store boundary, died at " +
          s"'${e.point}'")
      // 2. the window is REAL: labels already exclude a, the store-side
      // live read still serves it (this is the state the guard question
      // is ABOUT — a vacuous crash would make the whole proof moot).
      // The mid-store variant skips these raw reads: a crash inside a
      // store half can legitimately leave that store mid-swap (renamed
      // away), a state only the next handler entry's heal — here B's —
      // is contracted to read through.
      assert(f.labelRows() === f.expected(live0 - a),
        s"$ctx: post-crash labels should equal the from-scratch state " +
          "without the stranded id")
      assert(f.liveIdsPerStore().exists(_.contains(a)),
        s"$ctx: the stranded id must still be live in some store — " +
          "otherwise A did not crash inside its window")
    }

    // 3. admit the OVERLAPPING batch inside the window
    val nB = runForm(f, formB, Set(a, c))
    assert(nB === 1L,
      s"$ctx: B={a,c} must count exactly c's one label row — counting " +
        "the stranded a again is the double-decrement class the lexical " +
        "guard exists for")
    assert(f.labelRows() === f.expected(live0 - a - c),
      s"$ctx: labels after the overlapping batch")

    // 4. retry A to completion — a pure no-op
    val nA = runForm(f, formA, Set(a))
    assert(nA === 0L, s"$ctx: A's retry must be a label no-op")

    val survivors = live0 - a - c
    assert(f.labelRows() === f.expected(survivors),
      s"$ctx: labels after A's retry")
    f.liveIdsPerStore().foreach(s => assert(s === survivors,
      s"$ctx: every store's tombstone-aware read after A's retry"))

    // 5. the applying compaction retires any zones; the physical rows
    // converge to the survivors too
    f.compactAll()
    f.physicalIdsPerStore().foreach(s => assert(s === survivors,
      s"$ctx: every store's physical rows after compaction"))
    assert(f.labelRows() === f.expected(survivors),
      s"$ctx: labels after compaction")
    f.liveIdsPerStore().foreach(s => assert(s === survivors,
      s"$ctx: every store's tombstone-aware read after compaction"))
  }

  private val Forms =
    Seq(("eager", "eager"), ("eager", "deferred"),
      ("deferred", "eager"), ("deferred", "deferred"))

  /** The four form pairs run concurrently — each scenario owns its
    * stores, and [[CrashPoints]] arming is thread-scoped.
    */
  private def runFamily(mk: () => Family): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(
      Future.sequence(Forms.map { case (fa, fb) =>
        Future(overlapScenario(mk, fa, fb))
      }), 20.minutes)
    finally pool.shutdown()
  }

  /** Per-family from-scratch label models, cached across the four form
    * pairs (they revisit the same three live sets).
    */
  private val models =
    collection.mutable.Map.empty[(String, Set[Long]), Seq[String]]
  private def model(tag: String, live: Set[Long])(
      compute: => Seq[String]): Seq[String] =
    models.synchronized(models.getOrElseUpdate((tag, live), compute))

  private def liveIdSet(store: String, idCol: String): Set[Long] =
    Maintenance.minusTombstones(spark, store, spark.read.parquet(store))
      .select(col(idCol)).distinct().collect().map(_.getLong(0)).toSet

  private def physIdSet(store: String, idCol: String): Set[Long] =
    spark.read.parquet(store)
      .select(col(idCol)).distinct().collect().map(_.getLong(0)).toSet

  // ---- TEXT LSH family (InterleavingSpec's 3-copy groups) ----

  private val textUniverse: Seq[(Long, String)] =
    (0 until 6).map { i =>
      val g = i / 3
      (i.toLong + 1L,
        s"g${g}ax g${g}bx g${g}cx g${g}dx g${g}ex g${g}fx g${g}gx g${g}hx")
    }
  private def textDocsOf(ids: Set[Long]): DataFrame =
    textUniverse.filter(d => ids.contains(d._1)).toDF("doc_id", "text")

  private def mkText(): Family = {
    val lsh = tmp("lsh"); val lbl = tmp("lbl")
    def pairsOf(d: DataFrame) =
      Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 5, numHashes = 16, bands = 4)
    Family(
      tag = "text", idCol = "doc_id",
      universeLive = textUniverse.map(_._1),
      build = live => {
        val d = textDocsOf(live).localCheckpoint()
        Dedup.lshStoreWrite(Dedup.lshSignatureRows(d, "doc_id", "text",
          n = 5, numHashes = 16, bands = 4), lsh)
        LabelStore.write(Dedup.dedupClusters(d, "doc_id", pairsOf(d)), lbl)
      },
      eager = StreamingOps.dedupRetractBatch(spark, lsh, lbl),
      deferred = StreamingOps.dedupRetractDeferred(spark, lsh, lbl),
      compactAll = () => {
        StreamingOps.recoverStoreSwap(spark, lsh)
        Dedup.lshStoreCompact(spark, lsh, s"${lsh}__compact")
        StreamingOps.swapInCompacted(spark, lsh)
      },
      expected = live => model("text", live) {
        val d = textDocsOf(live).localCheckpoint()
        rows(Dedup.dedupClusters(d, "doc_id", pairsOf(d)))
      },
      labelRows = () => rows(LabelStore.read(spark, lbl)),
      liveIdsPerStore = () => Seq(liveIdSet(lsh, "doc_id")),
      physicalIdsPerStore = () => Seq(physIdSet(lsh, "doc_id")))
  }

  test("text LSH takedown admits an overlapping batch inside its labels->store window and converges (all form pairs)") {
    runFamily(mkText _)
  }

  // ---- VECTOR IVF family (one-hot groups, InterleavingSpec's shape) ----

  private val vecUniverse: Seq[(Long, Seq[Float])] =
    (0 until 6).map { i =>
      val g = i / 3
      (i.toLong + 1L, Seq.tabulate(4)(d => if (d == g) 1f else 0f))
    }
  private def vecsOf(ids: Set[Long]): DataFrame =
    vecUniverse.filter(v => ids.contains(v._1)).toDF("vec_id", "embedding")
  private val VecTau = 0.95
  private lazy val vecCents =
    Similarity.seedCentroids(vecUniverse.toDF("vec_id", "embedding"), 2)

  private def mkVec(): Family = {
    val ivf = tmp("ivf"); val lbl = tmp("vlbl")
    Family(
      tag = "vec", idCol = "vec_id",
      universeLive = vecUniverse.map(_._1),
      build = live => {
        val v = vecsOf(live).localCheckpoint()
        Similarity.ivfWrite(v, vecCents, ivf)
        LabelStore.write(
          LabelStore.labelsFor(v.select(col("vec_id").as("doc_id")),
            Similarity.cellBlockedTauPairs(v, vecCents, VecTau,
              nProbe = vecCents.length)), lbl)
      },
      eager = StreamingOps.vectorRetractBatch(spark, ivf, lbl, vecCents,
        VecTau, nProbe = vecCents.length),
      deferred = StreamingOps.vectorRetractDeferred(spark, ivf, lbl,
        vecCents, VecTau, nProbe = vecCents.length),
      compactAll = () => {
        StreamingOps.recoverStoreSwap(spark, ivf)
        Maintenance.compactPartitioned(spark, ivf, s"${ivf}__compact",
          "cell")
        StreamingOps.swapInCompacted(spark, ivf)
      },
      expected = live => model("vec", live) {
        val v = vecsOf(live).localCheckpoint()
        rows(LabelStore.labelsFor(v.select(col("vec_id").as("doc_id")),
          Similarity.cellBlockedTauPairs(v, vecCents, VecTau,
            nProbe = vecCents.length)))
      },
      labelRows = () => rows(LabelStore.read(spark, lbl)),
      liveIdsPerStore = () => Seq(liveIdSet(ivf, "vec_id")),
      physicalIdsPerStore = () => Seq(physIdSet(ivf, "vec_id")))
  }

  test("vector IVF takedown admits an overlapping batch inside its labels->store window and converges (all form pairs)") {
    runFamily(mkVec _)
  }

  // ---- VIDEO / AUDIO / CROSS-MODAL (MultimodalInterleavingSpec's
  // synthetic-payload geometry: members at +160/+320 are byte-identical,
  // bases 3 and 83 bridge within the banded Hamming radius) ----

  private val mmBases = Seq(3L, 83L)
  private val mmUniverse: Seq[Long] =
    mmBases.flatMap(b => Seq(b, b + 160L, b + 320L))
  private def mmIdsOf(ids: Set[Long]): DataFrame =
    mmUniverse.filter(ids.contains).toDF("doc_id")

  private def vFramesOf(ids: DataFrame): DataFrame =
    Multimodal.decodeVideoFrames(Multimodal.attachVideo(ids))
      .select(col("doc_id"), col("frame"), col("n_frames"), col("fhash"))
  private def vPairsOf(ids: DataFrame): DataFrame =
    Multimodal.videoNearDupPairs(vFramesOf(ids), maxHamming = 3)
      .select(col("d1"), col("d2"))

  private def mkVideo(): Family = {
    val store = tmp("vid"); val lbl = tmp("vidlbl")
    Family(
      tag = "video", idCol = "doc_id",
      universeLive = mmUniverse,
      build = live => {
        Multimodal.frameStoreWrite(
          vFramesOf(mmIdsOf(live))
            .select(col("doc_id"), col("frame"), col("fhash")), store)
        LabelStore.write(
          LabelStore.labelsFor(mmIdsOf(live), vPairsOf(mmIdsOf(live))),
          lbl)
      },
      eager = StreamingOps.videoRetractBatch(spark, store, lbl,
        maxHamming = 3),
      deferred = StreamingOps.videoRetractDeferred(spark, store, lbl,
        maxHamming = 3),
      compactAll = () => {
        StreamingOps.recoverStoreSwap(spark, store)
        Multimodal.frameStoreCompact(spark, store, s"${store}__compact")
        StreamingOps.swapInCompacted(spark, store)
      },
      expected = live => model("video", live) {
        rows(LabelStore.labelsFor(mmIdsOf(live), vPairsOf(mmIdsOf(live))))
      },
      labelRows = () => rows(LabelStore.read(spark, lbl)),
      liveIdsPerStore = () => Seq(liveIdSet(store, "doc_id")),
      physicalIdsPerStore = () => Seq(physIdSet(store, "doc_id")))
  }

  test("video takedown admits an overlapping batch inside its labels->store window and converges (all form pairs)") {
    runFamily(mkVideo _)
  }

  private def aFpsOf(ids: DataFrame): DataFrame =
    Multimodal.decodeWave(Multimodal.attachWave(ids))
      .select(col("doc_id"), col("afp"))
  private def aPairsOf(ids: DataFrame): DataFrame =
    Multimodal.perceptualNearDupPairs(
        aFpsOf(ids).select(col("doc_id"), col("afp").as("dhash")),
        maxHamming = 3)
      .select(col("d1"), col("d2"))

  private def mkAudio(): Family = {
    val store = tmp("aud"); val lbl = tmp("audlbl")
    Family(
      tag = "audio", idCol = "doc_id",
      universeLive = mmUniverse,
      build = live => {
        Multimodal.frameStoreWrite(
          aFpsOf(mmIdsOf(live)).select(col("doc_id"),
            lit(0).as("frame"), col("afp").as("fhash")), store)
        LabelStore.write(
          LabelStore.labelsFor(mmIdsOf(live), aPairsOf(mmIdsOf(live))),
          lbl)
      },
      eager = StreamingOps.audioRetractBatch(spark, store, lbl,
        maxHamming = 3),
      deferred = StreamingOps.audioRetractDeferred(spark, store, lbl,
        maxHamming = 3),
      compactAll = () => {
        StreamingOps.recoverStoreSwap(spark, store)
        Multimodal.frameStoreCompact(spark, store, s"${store}__compact")
        StreamingOps.swapInCompacted(spark, store)
      },
      expected = live => model("audio", live) {
        rows(LabelStore.labelsFor(mmIdsOf(live), aPairsOf(mmIdsOf(live))))
      },
      labelRows = () => rows(LabelStore.read(spark, lbl)),
      liveIdsPerStore = () => Seq(liveIdSet(store, "doc_id")),
      physicalIdsPerStore = () => Seq(physIdSet(store, "doc_id")))
  }

  test("audio takedown admits an overlapping batch inside its labels->store window and converges (all form pairs)") {
    runFamily(mkAudio _)
  }

  // ---- the UNIFIED CROSS-MODAL label space (four stores, one fold) ----

  private def xDocsOf(ids: DataFrame): DataFrame = ids
    .select(col("doc_id"),
      concat(lit("xmodal text "), col("doc_id").cast("string")).as("text"))

  private def xUnionPairsOf(docs: DataFrame): DataFrame = {
    val dh = Multimodal.decodeRaster(Multimodal.attachRaster(docs))
      .select(col("doc_id"), col("dhash"))
    Pipeline9.exactTextPairsOf(docs)
      .union(Multimodal.perceptualNearDupPairs(dh, 3)
        .select(col("d1"), col("d2")))
      .union(aPairsOf(docs.select(col("doc_id"))))
      .union(vPairsOf(docs.select(col("doc_id"))))
  }

  private def mkXModal(): Family = {
    val (txt, img, aud, vid) =
      (tmp("x_txt"), tmp("x_img"), tmp("x_aud"), tmp("x_vid"))
    val lbl = tmp("x_lbl")
    val stores = Seq(txt, img, aud, vid)
    Family(
      tag = "xmodal", idCol = "doc_id",
      universeLive = mmUniverse,
      build = live => {
        val init = xDocsOf(mmIdsOf(live)).localCheckpoint()
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
          vFramesOf(init).select(col("doc_id"), col("frame"),
            col("fhash")), vid)
        LabelStore.write(
          LabelStore.labelsFor(mmIdsOf(live), xUnionPairsOf(init)), lbl)
      },
      eager = StreamingOps.multimodalRetractBatch(spark, txt, img, aud,
        vid, lbl, maxHamming = 3),
      deferred = StreamingOps.multimodalRetractDeferred(spark, txt, img,
        aud, vid, lbl, maxHamming = 3),
      compactAll = () => stores.foreach { s =>
        StreamingOps.recoverStoreSwap(spark, s)
        Multimodal.frameStoreCompact(spark, s, s"${s}__compact")
        StreamingOps.swapInCompacted(spark, s)
      },
      expected = live => model("xmodal", live) {
        rows(LabelStore.labelsFor(mmIdsOf(live),
          xUnionPairsOf(xDocsOf(mmIdsOf(live)).localCheckpoint())))
      },
      labelRows = () => rows(LabelStore.read(spark, lbl)),
      liveIdsPerStore = () => stores.map(liveIdSet(_, "doc_id")),
      physicalIdsPerStore = () => stores.map(physIdSet(_, "doc_id")))
  }

  test("cross-modal takedown admits an overlapping batch inside its labels->store window and converges (all form pairs)") {
    runFamily(mkXModal _)
  }

  /** The unified handler's WIDEST window: A stranded after the labels
    * AND some of its four store halves (armed past the labels
    * boundary), B admitted there, A retried. The per-store gating must
    * make B's halves and A's remaining halves commute.
    */
  test("cross-modal takedown admits an overlapping batch stranded MID-STORE and converges") {
    overlapScenario(mkXModal _, formA = "eager", formB = "eager",
      armAt = 2, requireLabelsPoint = false)
    overlapScenario(mkXModal _, formA = "deferred", formB = "deferred",
      armAt = 2, requireLabelsPoint = false)
  }
}
