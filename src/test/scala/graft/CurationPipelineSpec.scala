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
}
