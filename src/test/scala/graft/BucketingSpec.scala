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
}
