// Takedown pricing: every retraction scaladoc claims a cost shape.
// The banded/term-bucketed stores pay a FULL rewrite per takedown
// batch — a doc's signature/posting rows scatter across every
// partition, so the cost is the STORE's size and deployments batch
// takedowns (measured here: ~linear in the store via the ScaleProbe
// self-union device). The id-locatable layouts (doc_id-bucketed
// shingle sidecar, IVF cells) retract PRUNED — the cost is the
// AFFECTED partitions' size, not the store's and not the batch's
// (measured here directly: the same-sized takedown batch priced twice,
// once scattered across every partition, once co-located in ONE — the
// co-located form must cost ~1/partitions of the scattered one, which
// is the whole 100 TB argument: with thousands of cells/buckets a
// bounded takedown touches a vanishing store fraction).
// Results recorded in BASELINE.md's "Takedown pricing" section.
// One-off audit tool (not a registered query).
// Run: sbt "runMain graft.tools.TakedownProbe" [mult]
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, LabelStore, Pipeline6, Similarity}
import graft.sources.Maintenance
import graft.streaming.StreamingOps

object TakedownProbe {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs0 = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    def tmp(t: String) = java.nio.file.Files
      .createTempDirectory(s"graft_tdp_$t").toString
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // ---- full-rewrite paths: ~linear in the store (takedowns batch) ----
    Seq(1, mult).foreach { m =>
      // store grows m-x (disjoint id ranges); the takedown batch stays
      // the BASE 1% class — fixed work arriving at a growing store
      val docs = (0 until m).map(i =>
          docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 100000000L)))
        .reduce(_ unionByName _).localCheckpoint()
      val rm = docs0.filter(pmod(col("doc_id"), lit(100L)) === 7L)
        .select(col("doc_id")).localCheckpoint()
      val lsh = tmp("lsh"); val lbl = tmp("lbl")
      Dedup.lshStoreWrite(Dedup.lshSignatureRows(docs, "doc_id", "text"), lsh)
      LabelStore.write(Dedup.dedupClusters(docs, "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text")), lbl)
      val tDedup = timed {
        StreamingOps.dedupRetractBatch(spark, lsh, lbl)(rm)
      }
      val pt = s"graft_tdp_postings_$m"
      Pipeline6.postingsWrite(docs, pt, nBuckets = 8)
      val tLex = timed {
        StreamingOps.lexicalRetractBatch(spark, pt, nBuckets = 8,
          retractId = -2L)(rm)
      }
      // the DEFERRED lexical twin on an identical store: stats row +
      // zone append only (compaction triggers disabled) — the p141
      // O(batch) claim, measured against the eager rewrite at the
      // same store size
      val ptD = s"graft_tdp_postings_d_$m"
      Pipeline6.postingsWrite(docs, ptD, nBuckets = 8)
      val tLexDefer = timed {
        StreamingOps.lexicalRetractDeferred(spark, ptD, nBuckets = 8,
          retractId = -2L, compactMaxFiles = 0)(rm)
      }
      // the DEFERRED twin on an identical store pair: label half +
      // tombstone append only — the O(batch) claim, measured against
      // the eager rewrite at the same store size
      val lshD = tmp("lshD"); val lblD = tmp("lblD")
      Dedup.lshStoreWrite(Dedup.lshSignatureRows(docs, "doc_id", "text"), lshD)
      LabelStore.write(Dedup.dedupClusters(docs, "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text")), lblD)
      val tDefer = timed {
        StreamingOps.dedupRetractDeferred(spark, lshD, lblD)(rm)
      }
      println(f"[takedown/full] mult=$m docs=${docs.count()} " +
        f"retracted=${rm.count()} dedup_rewrite=$tDedup%.2fs " +
        f"dedup_deferred=$tDefer%.2fs lexical_rewrite=$tLex%.2fs " +
        f"lexical_deferred=$tLexDefer%.2fs")
    }

    // ---- deferred READ-TAX curve: probe latency vs tombstone-zone
    // size (queued takedown batches since the last compaction) on the
    // text LSH store, the video frame store and the posting store —
    // the zone-count trigger's bound made visible. Batches queue ids
    // the probes never match (disjoint range), so latency deltas are
    // pure anti-join tax, not result-size drift.
    {
      val lshR = tmp("lshR")
      Dedup.lshStoreWrite(Dedup.lshSignatureRows(docs0, "doc_id", "text"), lshR)
      val probeSigs = Dedup.lshSignatureRows(
        docs0.limit(200), "doc_id", "text")
        .localCheckpoint()
      val frames = graft.operators.Multimodal.decodeVideoFrames(
          graft.operators.Multimodal.attachVideo(docs0))
        .select(col("doc_id"), col("frame"), col("n_frames"), col("fhash"))
        .localCheckpoint()
      val frmR = tmp("frmR")
      graft.operators.Multimodal.frameStoreWrite(
        frames.select(col("doc_id"), col("frame"), col("fhash")), frmR)
      val probeClips = frames.filter(col("doc_id") < 200).localCheckpoint()
      val ptR = "graft_tdp_postings_tax"
      Pipeline6.postingsWrite(docs0, ptR, nBuckets = 8)
      def lshProbe(): Unit =
        Dedup.lshProbeStoredDF(spark, lshR, probeSigs).count()
      def frmProbe(): Unit =
        graft.operators.Multimodal.videoNearDupStored(
          spark, frmR, probeClips, maxHamming = 3).count()
      def bm25Probe(): Unit =
        Pipeline6.bm25TopKStored(spark, ptR, k = 20).count()
      val zones = Seq(0, 1, 4, 16)
      var queued = 0
      val rows = zones.map { z =>
        while (queued < z) {
          val ids = Seq.tabulate(50)(j =>
            900000000L + queued.toLong * 1000L + j).toDF("doc_id")
          Maintenance.tombstoneAppend(spark, lshR, ids, "doc_id")
          Maintenance.tombstoneAppend(spark, frmR, ids, "doc_id")
          Maintenance.tombstoneAppend(spark,
            graft.sources.Bucketed.tableLocation(spark, ptR), ids, "doc_id")
          queued += 1
        }
        lshProbe(); frmProbe(); bm25Probe() // warm
        val tL = Seq.fill(3)(timed(lshProbe())).min
        val tF = Seq.fill(3)(timed(frmProbe())).min
        val tB = Seq.fill(3)(timed(bm25Probe())).min
        f"zone=$z lsh_probe=$tL%.2fs frame_probe=$tF%.2fs bm25_probe=$tB%.2fs"
      }
      rows.foreach(r => println(s"[takedown/readtax] $r"))
    }

    // ---- pruned paths: cost follows AFFECTED partitions, not batch ----
    // the same-sized takedown twice: scattered (ids = 7 mod 100 — every
    // residue class, so every bucket holds one) vs co-located (ids = 7
    // mod 16 thinned 1/6 to match the count — ONE bucket of 16)
    val scattered = docs0.filter(pmod(col("doc_id"), lit(100L)) === 7L)
      .select(col("doc_id")).localCheckpoint()
    val clustered = docs0
      .filter(pmod(col("doc_id"), lit(16L)) === 7L &&
        pmod(floor(col("doc_id") / 16L), lit(6L)) === 0L)
      .select(col("doc_id")).localCheckpoint()
    def sidecarRetract(rm: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val side = tmp("side")
      Dedup.shingleStoreWrite(
        Dedup.shingleSidecarRows(docs0, "doc_id", "text"), side)
      val t = timed {
        Maintenance.removePrunedRows(spark, side, rm,
          "doc_id", "bucket", Some("doc_id"))
      }
      (t, rm.count())
    }
    val (tScat, nScat) = sidecarRetract(scattered)
    val (tClus, nClus) = sidecarRetract(clustered)
    println(f"[takedown/pruned] sidecar scattered n=$nScat " +
      f"(16/16 buckets) $tScat%.2fs vs co-located n=$nClus " +
      f"(1/16 buckets) $tClus%.2fs")

    // IVF cells: co-located = one cell's own members (cells are
    // content-derived, so the co-located case is a real one — a model
    // version's vectors land together), scattered = same count spread
    val emb0 = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val cents = Similarity.seedCentroids(emb0, 8)
    def ivfRetract(rm: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val ivf = tmp("ivf")
      Similarity.ivfWrite(emb0, cents, ivf)
      val t = timed { Maintenance.removeIvfRows(spark, ivf, rm) }
      (t, rm.count())
    }
    val cellOf = Similarity.assignCells(cents, emb0)
      .select(col("vec_id"), col("cell")).localCheckpoint()
    val oneCell = cellOf.filter(col("cell") === 0)
      .filter(pmod(col("vec_id"), lit(8L)) === 1L).select(col("vec_id"))
    val nOne = oneCell.count()
    val scatteredV = cellOf
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("cell")).orderBy(col("vec_id"))))
      .filter(col("rn") <= (nOne / 8L + 1L)).select(col("vec_id"))
    val (tVOne, nVOne) = ivfRetract(oneCell)
    val (tVScat, nVScat) = ivfRetract(scatteredV)
    println(f"[takedown/pruned] ivf co-located n=$nVOne (1/8 cells) " +
      f"$tVOne%.2fs vs scattered n=$nVScat (8/8 cells) $tVScat%.2fs")

    // ---- deferred VECTOR family (p151): the takedown itself is one
    // zone append — O(batch) — vs the eager cell-pruned rewrite of the
    // SAME batch above; and the stored ANN probe's read tax vs queued
    // zone size (disjoint ids, so deltas are pure anti-join tax)
    {
      val ivfD = tmp("ivfD")
      Similarity.ivfWrite(emb0, cents, ivfD)
      val tVDefer = timed {
        Maintenance.tombstoneAppend(spark, ivfD, scatteredV, "vec_id")
      }
      println(f"[takedown/deferred] ivf deferred n=$nVScat " +
        f"zone_append=$tVDefer%.2fs (eager pruned rewrite of the same " +
        f"batch: $tVScat%.2fs)")
      val ivfZ = tmp("ivfZ")
      Similarity.ivfWrite(emb0, cents, ivfZ)
      val qs = emb0.filter(col("vec_id") < 200).localCheckpoint()
      def vProbe(): Unit =
        Similarity.ivfTopKStored(spark, ivfZ, qs, cents, k = 10,
          nProbe = 2).count()
      var queued = 0
      val rows = Seq(0, 1, 4, 16).map { z =>
        while (queued < z) {
          Maintenance.tombstoneAppend(spark, ivfZ,
            Seq.tabulate(50)(j => 900000000L + queued.toLong * 1000L + j)
              .toDF("vec_id"), "vec_id")
          queued += 1
        }
        vProbe() // warm
        f"zone=$z ivf_probe=${Seq.fill(3)(timed(vProbe())).min}%.2fs"
      }
      rows.foreach(r => println(s"[takedown/readtax] $r"))
    }
    spark.stop()
  }
}
