package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** End-to-end contract of [[Engine.curate]]: each stage's postcondition
  * holds on the final corpus, and the whole DAG is deterministic.
  */
class CurationPipelineSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val out = Engine.curate(docs, lang = "en",
    minQuality = 0.05, tokenBudget = 20000L).cache()

  test("pipeline yields a non-empty curated corpus") {
    assert(out.count() > 0)
  }

  test("dedup stage: no two survivors share a fingerprint") {
    assert(out.groupBy("fp").count().filter(col("count") > 1).isEmpty)
  }

  test("redaction stage: no emails or long digit runs survive") {
    assert(out.filter(col("text").rlike("[a-z0-9.]+@[a-z0-9.]+")).isEmpty)
    assert(out.filter(col("text").rlike("[0-9]{6,}")).isEmpty)
  }

  test("gates: language, quality, and token budget all hold") {
    assert(out.filter(col("lang_guess") =!= "en").isEmpty)
    assert(out.filter(col("quality") < 0.05).isEmpty)
    val maxCum = out.agg(max(col("cum_tokens"))).collect()(0).getLong(0)
    assert(maxCum <= 20000L)
    // budget packs best-quality-first: the minimum admitted quality is
    // >= the maximum quality among excluded in-language candidates that
    // didn't fit (greedy order property) — spot-check via ordering
    val ordered = out.orderBy(col("quality").desc).select("cum_tokens").collect()
    assert(ordered.zip(ordered.drop(1)).forall { case (a, b) => a.getLong(0) <= b.getLong(0) })
  }

  test("the DAG is deterministic end-to-end") {
    val again = Engine.curate(docs, lang = "en",
      minQuality = 0.05, tokenBudget = 20000L)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("parallel-input construction of checkpointing pipelines submits only source-open jobs") {
    // qualityRepetition / contamination / shingleNovelty share an
    // expansion via localCheckpoint(eager = false). The lazy flag alone
    // is NOT a zero-jobs guarantee: AQE pre-materializes any shuffle
    // BELOW a checkpoint at construction. The only shuffle that can sit
    // there is Parallelism's CONDITIONAL single-split rebalance — at
    // scale, where the scan is already multi-split, no rebalance is
    // inserted and construction must cost nothing but the parquet
    // footer reads. Pin exactly that: shrink maxPartitionBytes so the
    // local file estimates as many splits (the 100 TB shape), then
    // assert every construction-time job is a source open. A future
    // edit putting an UNCONDITIONAL shuffle below a checkpoint fails
    // here instead of silently resurrecting construction-time work.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val sc = spark.sparkContext
    val offending = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val sentinelSeen = new java.util.concurrent.CountDownLatch(1)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val group = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (group == "ctor-zero-jobs-sentinel") sentinelSeen.countDown()
        else if (group == "ctor-zero-jobs") {
          val names = js.stageInfos.map(_.name)
          // parquet footer/schema-inference reads are source opens, not
          // operator work; anything else is a construction-time job
          if (!names.forall(_.startsWith("parquet at")))
            offending.add(names.mkString("; "))
        }
      }
    }
    val mpbKey = "spark.sql.files.maxPartitionBytes"
    val oldMpb = spark.conf.get(mpbKey)
    spark.conf.set(mpbKey, "8192") // 65 KB input -> ~8 estimated splits >= parallelism
    sc.addSparkListener(listener)
    try {
      val d = "/root/testdata/sf0.001"
      sc.setJobGroup("ctor-zero-jobs", "pipeline constructor under test")
      operators.Pipeline4.qualityRepetition(spark, d)
      operators.Pipeline4.contamination(spark, d)
      operators.Pipeline5.shingleNovelty(spark, d)
      sc.setJobGroup("ctor-zero-jobs-sentinel", "listener-bus flush")
      spark.range(1).count()
      assert(sentinelSeen.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "sentinel job event never delivered")
      assert(offending.isEmpty,
        s"construction ran non-source-open jobs: ${offending.toArray.mkString(" | ")}")
    } finally {
      sc.clearJobGroup()
      sc.removeSparkListener(listener)
      spark.conf.set(mpbKey, oldMpb)
    }
  }

  test("curation facades delegate to the registered library forms") {
    import spark.implicits._
    import graft.operators.{Pipeline10, Similarity}
    val d01 = "/root/testdata/sf0.01"
    val all = Tables.documents(spark, d01)
    val cand = all.filter(col("doc_id") % 97 =!= 0)
    val bench = all.filter(col("doc_id") % 97 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(Engine.decontaminate(cand, bench)) ===
      rows(Pipeline10.decontaminate(spark, d01)))
    assert(rows(Engine.exciseContaminatedSpans(cand, bench)) ===
      rows(Pipeline10.decontaminateSpans(spark, d01)))
    val emb = Tables.embeddings(spark, d01)
    assert(rows(Engine.clusterSample(emb,
        Similarity.seedCentroids(emb, 8), 20, seed = "p96")) ===
      rows(Pipeline10.clusterSample(spark, d01)))
    assert(rows(Engine.lengthBatches(all)) ===
      rows(Pipeline10.lengthBatching(spark, d01)))
    assert(rows(Engine.curriculumPhases(all, 100)) ===
      rows(graft.operators.Pipeline11.curriculumPhases(spark, d01)))
  }

  test("curateClips: every stage equals an independent driver-side pipeline") {
    import spark.implicits._
    import graft.operators.Multimodal
    // exact-dup family {0,160,320}, jitter twin 80, a second family
    // {1,161}, and unrelated scenes 3 and 6
    val ids = Seq(0L, 1L, 3L, 6L, 80L, 160L, 161L, 320L)
    val withVideo = Multimodal.attachVideo(
      ids.toDF("doc_id").withColumn("text", lit("")))
    val got = Engine.curateClips(withVideo)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("frame"),
        r.getAs[Int]("scene"))).toSet

    // independent reference: hashes from the formula, not the decoder
    def frameHashes(id: Long): Vector[Long] = {
      val (w, h, nf) = Multimodal.videoParams(id)
      Vector.tabulate(nf) { f =>
        val base = Multimodal.videoFrameBase(id, f)
        val px = new Array[Byte](w * h * 3)
        for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
          px((y * w + x) * 3 + c) = Multimodal.pixel(base, x, y, c).toByte
        Multimodal.dHash(px, 0, w, h)
      }
    }
    val hs = ids.map(id => id -> frameHashes(id)).toMap
    // stage 1: exact dedup on the full frame-hash sequence, min id wins
    val exact = ids.groupBy(hs).values.map(_.min).toSet
    // stage 2: near-dup union-find among survivors (same nf, aligned max <= 3)
    val surv = exact.toSeq.sorted
    val parent = collection.mutable.Map(surv.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- surv; b <- surv if a < b && hs(a).length == hs(b).length)
      if (hs(a).zip(hs(b)).map { case (x, y) =>
            java.lang.Long.bitCount(x ^ y) }.max <= 3) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    val kept = surv.filter(i => find(i) == i)
    // stage 3: keyframes of the kept clips
    val want = (for {
      id <- kept
      h = hs(id)
      cuts = h.indices.map(f =>
        if (f == 0) 0
        else if (java.lang.Long.bitCount(h(f) ^ h(f - 1)) > 8) 1 else 0)
      scenes = cuts.scanLeft(0)(_ + _).drop(1)
      f <- h.indices if f == 0 || cuts(f) == 1
    } yield (id, f, scenes(f))).toSet
    assert(got === want, "curateClips diverged from the reference pipeline")
    // sanity: the fixture exercised every stage
    assert(!got.exists(_._1 == 160L) && !got.exists(_._1 == 320L),
      "exact stage should have dropped the mod-160 twins")
    assert(kept.size < surv.size || surv.size < ids.size)
    assert(got.exists(_._3 > 0), "no multi-scene clip in the fixture")
  }
}
