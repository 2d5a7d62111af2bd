package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.sources.Bucketed

class BucketingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("co-bucketed join plans with zero shuffle exchanges") {
    val left = (0L until 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (0L until 1000L).map(i => (i, i * 2)).toDF("k", "rv")
    Bucketed.writeBucketed(left, "graft_bkt_left", "k", 8)
    Bucketed.writeBucketed(right, "graft_bkt_right", "k", 8)

    // force the shuffle-or-not decision to matter (no broadcast escape)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.coBucketedJoin(spark, "graft_bkt_left", "graft_bkt_right", "k")
      assert(joined.count() === 1000)
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected no Exchange in co-bucketed join, got:\n${joined.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }

  test("bucketed aggregation on the bucket key needs no exchange") {
    val df = (0L until 1000L).map(i => (i % 100, i)).toDF("k", "v")
    Bucketed.writeBucketed(df, "graft_bkt_agg", "k", 8)
    try {
      val agg = spark.table("graft_bkt_agg").groupBy($"k").agg(sum($"v").as("s"))
      assert(agg.count() === 100)
      val shuffles = agg.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected no Exchange in bucketed agg, got:\n${agg.queryExecution.executedPlan}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_agg")
    }
  }

  test("incremental admit against a fingerprint-bucketed base shuffles only the batch") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 2 === 0)
      .withColumn("fp", md5(col("text")))
    Bucketed.writeBucketed(base, "graft_base_fp", "fp", 8)
    val incoming = docs.filter(col("doc_id") % 2 === 1)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val admitted = Engine.admitNew(
        spark.table("graft_base_fp"), incoming, "doc_id", "text",
        baseFpCol = Some("fp"))
      // same rows as the self-contained operator on the raw frames
      val expect = graft.operators.Pipeline5.incrementalDedup(spark, dir)
        .select("doc_id")
      assert(admitted.select("doc_id").exceptAll(expect).isEmpty &&
             expect.exceptAll(admitted.select("doc_id")).isEmpty)
      // only the incoming batch crosses the wire: the bucketed base
      // side plans with NO exchange, so the whole refresh has exactly
      // one (the incoming side's hash shuffle, reused by the window).
      // String-count, not TreeNode.collect: AQE wraps the tree in
      // AdaptiveSparkPlanExec, which collect does not descend into.
      val planStr = admitted.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(planStr).size
      assert(shuffles === 1,
        s"expected 1 exchange (incoming only), got $shuffles:\n$planStr")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS graft_base_fp")
    }
  }

  test("compactBucketed: one file per bucket, identical rows, pruning and co-location intact") {
    val nBuckets = 4
    // a deliberately sliver-heavy write: 8 input partitions × 4 buckets
    val rows = (0L until 2000L).map(i => (s"k$i", i))
    Bucketed.writeBucketed(
      rows.toDF("k", "v").repartition(8), "graft_bkt_compact", "k", nBuckets)
    try {
      def files(): Seq[java.io.File] = {
        val loc = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
          "graft_bkt_compact")
        loc.listFiles.toSeq.filter(_.getName.endsWith(".parquet"))
      }
      assert(files().size > nBuckets, "fixture failed to produce sliver files")
      val before = spark.table("graft_bkt_compact").collect().map(_.toSeq).toSet

      Bucketed.compactBucketed(spark, "graft_bkt_compact", "k", nBuckets)

      assert(files().size === nBuckets,
        s"expected exactly $nBuckets files after compaction, got ${files().size}")
      val after = spark.table("graft_bkt_compact").collect().map(_.toSeq).toSet
      assert(after === before, "compaction changed the table contents")
      // bucket pruning survives: an equality probe on the bucket key
      // selects 1 of nBuckets
      val probe = spark.table("graft_bkt_compact").filter(col("k") === "k42")
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(probe.queryExecution.executedPlan.toString)
      assert(m.isDefined && m.get.group(1).toInt === 1
        && m.get.group(2).toInt === nBuckets,
        "bucket pruning lost after compaction")
      assert(probe.count() === 1)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_compact")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_compact__compact")
    }
  }
}
