// Micro-batch fold pricing: the registered p12x incremental entries
// price corpus/3 slices per batch (so their pins measure ingestion at
// bench scale), but a DEPLOYMENT folds ~1% micro-batches — and the
// operative claim in every maintenance scaladoc is that one fold's
// latency is the per-action JOB FLOOR, not the data. This probe makes
// that a measured number: publish 90% of the sf corpus into the live
// text stores, then drive TEN ~1%-of-corpus batches through the real
// maintenance handler (gate → fold → staged ingest → merge →
// compaction trigger), timing each delivery; finally time ONE
// from-scratch weight refresh of the union corpus — the alternative a
// deployment without the live store pays per refresh. Results are
// recorded in BASELINE.md's "Micro-batch fold pricing" section.
// One-off audit tool (not a registered query).
// Run: sbt "runMain graft.tools.MicroBatchProbe" [nBatches] [mult]
// `mult` self-unions the published corpus (ids remapped — the
// ScaleProbe device) so the crossover is visible in one run: the fold
// is FLAT in corpus size (job floor + batch-bounded work) while the
// from-scratch refresh is LINEAR in it.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, LabelStore, Pipeline13}
import graft.streaming.StreamingOps

object MicroBatchProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.nonEmpty) args(0).toInt else 10
    val mult = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    // published corpus: everything outside the nBatches arrival classes,
    // self-unioned `mult`x with disjoint id ranges (the ScaleProbe device)
    val pub0 = docs.filter(pmod(col("doc_id"), lit(100L)) >= nBatches.toLong)
    val pub = (0 until mult).map(i =>
        pub0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 100000000L)))
      .reduce(_ unionByName _).localCheckpoint()
    val nPub = pub.count()
    def tmp(t: String) = java.nio.file.Files
      .createTempDirectory(s"graft_mbp_$t").toString
    val store = tmp("lsh"); val stage = tmp("stage"); val labels = tmp("lbl")
    val t0 = System.nanoTime()
    Dedup.lshStoreWrite(
      Dedup.lshSignatureRows(pub, "doc_id", "text"), store)
    LabelStore.write(
      Dedup.dedupClusters(pub, "doc_id",
        Dedup.minhashLshPairs(pub, "doc_id", "text")), labels)
    println(f"[microbatch] publish n=$nPub build=${(System.nanoTime() - t0) / 1e9}%.2fs")
    val times = (0 until nBatches).map { i =>
      val batch = docs
        .filter(pmod(col("doc_id"), lit(100L)) === i.toLong)
        .localCheckpoint()
      val n = batch.count()
      val t1 = System.nanoTime()
      StreamingOps.dedupMaintainBatch(spark, store, labels, stage)(
        batch, i.toLong).count()
      val sec = (System.nanoTime() - t1) / 1e9
      println(f"[microbatch] batch=$i n_docs=$n fold=$sec%.2fs")
      sec
    }.sorted
    println(f"[microbatch] per-batch fold min=${times.head}%.2fs " +
      f"median=${times(times.size / 2)}%.2fs max=${times.last}%.2fs")
    // the no-live-store alternative: one from-scratch weight refresh of
    // the union corpus (scan → shingle → minhash → LSH → contraction)
    val union = pub.unionByName(
      docs.filter(pmod(col("doc_id"), lit(100L)) < nBatches.toLong))
    val t2 = System.nanoTime()
    Pipeline13.softDedupWeightsOf(
      Dedup.dedupClusters(union, "doc_id",
        Dedup.minhashLshPairs(union, "doc_id", "text"))).count()
    println(f"[microbatch] from-scratch union refresh " +
      f"${(System.nanoTime() - t2) / 1e9}%.2fs")
    spark.stop()
  }
}
