// Scale probe: substantiate the stored-index pruning claims at a data
// size where parquet overhead stops dominating. Self-unions the sf0.1
// tables ~10x (ids remapped to stay unique), builds the three at-rest
// layouts (p41 IVF embedding store, p49 IVF-PQ code store, p50 bucketed
// posting store), then measures what one probe ACTUALLY reads — task
// input bytes from the Spark metrics bus — against the store's on-disk
// total. One-off audit tool (not a registered query); results are
// recorded in BASELINE.md's scale section.
// Run: sbt "runMain graft.tools.ScaleProbe" [mult]
package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pipeline6, Similarity}

object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 10
    val base = "/tmp/graft_scaleprobe"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      // plain plan tree so scan metrics are reachable by a simple
      // collect — DPP works with or without AQE
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // ---- inputs: sf0.1 self-unioned `mult`x with disjoint id ranges ----
    def xN(df: DataFrame, idCol: String): DataFrame =
      (0 until mult).map(i =>
        df.withColumn(idCol, col(idCol) + lit(i.toLong * 100000000L)))
        .reduce(_ unionByName _)

    val emb0 = graft.Tables.embeddings(spark, dir)
    val docs0 = graft.Tables.documents(spark, dir)
    val emb = xN(emb0.select(col("vec_id"), col("embedding")), "vec_id")
    val docs = xN(docs0.select(col("doc_id"), col("text")), "doc_id")

    // models from the base corpus, BEFORE the listener attaches (their
    // collects must not pollute the probe's byte counts)
    val cents = Similarity.seedCentroids(emb0, 8)
    val cb = Pipeline6.pqCodebook(emb0)
    // the query side must be a SCAN WITH A SELECTIVE PREDICATE: Spark's
    // PartitionPruning rule only inserts a DPP filter when the probe
    // side looks filtered (a bare LocalRelation never qualifies — the
    // first run of this tool measured exactly that: full-store reads).
    // Registered queries probe with emb.filter(vec_id < 5); mirror that
    // against a tiny dedicated parquet so the probe-side scan cost is
    // negligible in the byte counts.
    emb0.filter(col("vec_id") < 5).write.parquet(s"$base/queries")
    // ONE query for the ratio lines: a BATCH of queries prunes to the
    // UNION of every query's probed cells (one scan serves all), which
    // hides the per-query nProbe/nCells read the claims are about
    val queries = spark.read.parquet(s"$base/queries").filter(col("vec_id") === 0)

    // ---- build the three stores ----
    val ivfPath = s"$base/ivf"
    val pqPath = s"$base/ivfpq"
    val lexTable = "scaleprobe_postings"
    // build, then compact to the steady-state layout (one file per cell
    // — the Maintenance contract): a 32-task build writes 32 slivers
    // per cell, and per-file footer overhead would swamp the byte
    // ratios this tool exists to measure
    Similarity.ivfWrite(emb, cents, s"$ivfPath.raw")
    graft.sources.Maintenance.compactPartitioned(spark, s"$ivfPath.raw", ivfPath, "cell")
    Pipeline6.ivfPqWrite(cents, cb, emb, s"$pqPath.raw")
    graft.sources.Maintenance.compactPartitioned(spark, s"$pqPath.raw", pqPath, "cell")
    Pipeline6.postingsWrite(docs, lexTable, nBuckets = 8)
    graft.sources.Bucketed.compactBucketed(spark, lexTable, "term", 8)

    def dirStats(p: String): (Long, Long) = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var files = 0L; var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) { files += 1; bytes += f.getLen }
      }
      (files, bytes)
    }

    // ---- measure: task-level input bytes for one warm probe ----
    val read = new AtomicLong
    val recs = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          read.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
          recs.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
        }
    }
    def measure(name: String, storePath: String)(probe: => DataFrame): Unit = {
      probe.collect() // warm: listing caches, codegen, broadcast
      spark.sparkContext.addSparkListener(listener)
      read.set(0L); recs.set(0L)
      val df = probe
      val n = df.collect().length
      Thread.sleep(1500) // metrics bus drains async
      spark.sparkContext.removeSparkListener(listener)
      val (files, bytes) = dirStats(storePath)
      // authoritative per-scan numbers: the scan node's own metrics —
      // filesSize/numFiles are POST-dynamic-pruning; their static twins
      // (present when DPP applied) are the pre-pruning totals
      val scanFacts = df.queryExecution.executedPlan
        .collectWithSubqueries {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(_.toString.contains(storePath)) =>
            val m = f.metrics
            val dyn = (m.get("numFiles").map(_.value), m.get("filesSize").map(_.value))
            val stat = (m.get("staticFilesNum").map(_.value), m.get("staticFilesSize").map(_.value))
            f"files=${dyn._1.getOrElse(-1L)}/${stat._1.getOrElse(-1L)} " +
              f"scan_bytes=${dyn._2.getOrElse(-1L)}/${stat._2.getOrElse(-1L)} " +
              f"rows_out=${m.get("numOutputRows").map(_.value).getOrElse(-1L)}"
        }.mkString("; ")
      val plan = df.queryExecution.executedPlan.toString
      val pruneFacts = Seq(
        "SelectedBucketsCount: (\\d+ out of \\d+)".r.findFirstMatchIn(plan).map("buckets " + _.group(1)),
        if (plan.contains("dynamicpruningexpression")) Some("DPP") else None).flatten.mkString(", ")
      println(f"[scaleprobe] $name rows=$n fs_bytes_read=${read.get()} records_read=${recs.get()} " +
        f"store_files=$files store_bytes=$bytes [$pruneFacts] [$scanFacts]")
    }

    measure("p41_ivf_stored", ivfPath) {
      Similarity.ivfTopKStored(spark, ivfPath, queries, cents, k = 10, nProbe = 2)
    }
    measure("p49_ivfpq_stored", pqPath) {
      Pipeline6.ivfPqTopKStored(spark, pqPath, queries, cents, cb, k = 10, nProbe = 2)
    }
    measure("p50_bm25_stored", s"$base/warehouse/$lexTable") {
      Pipeline6.bm25TopKStored(spark, lexTable, k = 20)
    }
    // cross-store comparison: the PQ store's absolute probe cost
    val (_, ivfBytes) = dirStats(ivfPath)
    val (_, pqBytes) = dirStats(pqPath)
    println(f"[scaleprobe] store_shrink ivf_bytes=$ivfBytes pq_bytes=$pqBytes " +
      f"factor=${ivfBytes.toDouble / pqBytes}%.1f")

    // ---- frame-signature store: slivered vs compacted probe cost ----
    // simulate the streaming path's layout: 12 per-batch appends into
    // the band directories (the frameMergeStaged shape — many small
    // files, rows unsorted within each), probe, then compact with
    // Multimodal.frameStoreCompact (one band_v-sorted file per band)
    // and probe again. The delta is what compaction buys the p100 path.
    import graft.operators.Multimodal
    val framePath = s"$base/frames.raw"
    val frameCompacted = s"$base/frames"
    val vdocs = xN(docs0.select(col("doc_id")), "doc_id")
    val frames = Multimodal.decodeVideoFrames(Multimodal.attachVideo(vdocs))
      .select(col("doc_id"), col("frame"), col("fhash"))
    for (i <- 0 until 12)
      graft.sources.Partitioned.appendBy(
        Multimodal.bandFrames(
            frames.filter(pmod(col("doc_id"), lit(12)) === i))
          .withColumn("ingest_batch", lit(i.toLong)),
        framePath, "band_i")
    val frameQs = (0L to 4L).map(id =>
      (id, Multimodal.walkVideo(id, Multimodal.videoBytes(id)).head._4))
    measure("p100_frame_probe_slivered", framePath) {
      Multimodal.frameProbeStored(spark, framePath, frameQs, maxHamming = 3)
    }
    // 128 KB row groups at probe scale: each compacted band file is
    // only ~0.6 MB, so the production default (1 MB) would leave one
    // group per band and nothing for the pushed filter to skip — this
    // keeps the groups-per-band ratio a real-scale store gets from
    // the default
    Multimodal.frameStoreCompact(spark, framePath, frameCompacted,
      rowGroupBytes = 128 << 10)
    measure("p100_frame_probe_compacted", frameCompacted) {
      Multimodal.frameProbeStored(spark, frameCompacted, frameQs, maxHamming = 3)
    }

    // ---- text LSH store: slivered vs compacted probe cost ----
    // the same streaming-shaped layout for the p111 path: 12 per-batch
    // appends of band-signature rows (lshMergeStaged's shape), probe,
    // compact with Dedup.lshStoreCompact, probe again
    val lshPath = s"$base/lsh.raw"
    val lshCompacted = s"$base/lsh"
    val sigRows = Dedup.lshSignatureRows(docs, "doc_id", "text")
      .localCheckpoint() // one signature pass feeds all 12 appends
    for (i <- 0 until 12)
      graft.sources.Partitioned.appendBy(
        sigRows.filter(pmod(col("doc_id"), lit(12)) === i)
          .withColumn("ingest_batch", lit(i.toLong)),
        lshPath, "band")
    val lshQs = Dedup.lshSignatureRows(
        docs0.filter(col("doc_id") < 5), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    measure("p111_lsh_probe_slivered", lshPath) {
      Dedup.lshProbeStored(spark, lshPath, lshQs)
    }
    Dedup.lshStoreCompact(spark, lshPath, lshCompacted,
      rowGroupBytes = 128 << 10)
    measure("p111_lsh_probe_compacted", lshCompacted) {
      Dedup.lshProbeStored(spark, lshCompacted, lshQs)
    }
    spark.stop()
  }
}
