package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Pipeline operators, batch 14: the MAINTENANCE layer of the decision
  * devices batch 13 introduced — incremental cluster/weight upkeep
  * (p123: the live label store folded batch by batch, proved
  * append-equals-rebuild against p118's from-scratch oracle), the
  * trained-coarse-quantizer ANN tuning curve (p124: p116's table with
  * a Lloyd-trained, integer-frozen centroid method beside the seed
  * method, so the curve shows what training the quantizer buys at
  * equal read cost), and soft dedup generalized to a second modality
  * (p125: p118's weight device over p91's VIDEO clusters with the
  * frame-mass yield table — the label-table genericity claim turned
  * into a differential check).
  */
object Pipeline14 {

  /** Ingestion batches of the registered incremental entry — enough to
    * exercise a store-then-merge (batch 2 can connect two clusters
    * created by batches 0/1) and a later-smaller-minimum rewrite
    * (mod-split ids interleave, so a component's true minimum
    * routinely arrives AFTER other members).
    */
  private val IncBatches = 3

  /** p123: INCREMENTAL soft-dedup weights — p118's output produced by
    * the LIVE maintenance path instead of a corpus rescan: the corpus
    * arrives as [[IncBatches]] deterministic slices (`doc_id mod 3` —
    * the id interleave makes canonical minima arrive late, exercising
    * the component-rewrite path); each slice's near-dup evidence is
    * the within-batch LSH candidates PLUS the published-corpus gate
    * verdicts against the live signature store (`Dedup
    * .lshProbeStoredDF` — exactly what `textDedupGateBatch` feeds a
    * deployment), and [[LabelStore.update]] folds it with one
    * union-find step on the affected components only. The final
    * weights come from [[LabelStore.weightsFromStore]] — the label
    * table alone, no corpus scan.
    *
    * The oracle is p118's VERBATIM (from-scratch clusters over the
    * union corpus): hash-matching it is the append-equals-rebuild
    * proof — k incremental folds land bit-identically on the
    * from-scratch contraction, the `ivfAppend` spec discipline
    * applied to cluster labels.
    *
    * Scale shape: per batch, one batch-sized signature pipeline
    * (shared between the probe rows and the within-batch pairs — one
    * execution, two consumers), one store probe that prunes to the
    * queried bands, a mini contraction over batch ids + affected
    * canonicals, and a bucket-pruned label rewrite; the corpus is
    * never rescanned — the whole point. Priced as the ingestion op it
    * is: each rep pays the full 3-batch fold from scratch.
    */
  def incrementalSoftDedup(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val labelPath = java.nio.file.Files
      .createTempDirectory("graft_inc_labels_").toString
    val lshPath = java.nio.file.Files
      .createTempDirectory("graft_inc_lsh_").toString
    for (i <- 0 until IncBatches) {
      val batch = docs
        .filter(pmod(col("doc_id"), lit(IncBatches.toLong)) === i.toLong)
      // ONE execution of the scan→shingle→minhash pipeline per batch,
      // shared by the signature rows (store + probe) and the
      // within-batch candidate pairs
      val banded = Dedup.minhashBands(
          Dedup.minhash(batch, "doc_id", "text",
            n = PipelineQueries.ShingleN, numHashes = 16),
          numHashes = 16, bands = 4)
        .localCheckpoint(eager = false)
      val sigRows = Dedup.sigRowsFromBands(banded)
      val within = Dedup.lshPairsFromBands(banded)
      if (i == 0) {
        LabelStore.write(Dedup.dedupClusters(batch, "doc_id", within),
          labelPath)
        Dedup.lshStoreWrite(sigRows, lshPath)
      } else {
        // gate verdicts: batch ↔ published candidate pairs (batch ids
        // are new by the mod split, so no self-hit filtering is owed)
        val cross = Dedup.lshProbeStoredDF(s, lshPath, sigRows)
          .select(col("qid").as("d1"), col("doc_id").as("d2"))
        LabelStore.update(s, labelPath, batch.select(col("doc_id")),
          within.union(cross))
        graft.sources.Partitioned.appendBy(
          sigRows.withColumn("ingest_batch", lit(i.toLong)),
          lshPath, "band")
      }
    }
    LabelStore.weightsFromStore(s, labelPath).orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p123_incremental_soft_dedup" -> (incrementalSoftDedup _),
  )

  val oracles: Map[String, String] = Map(
    // p118's from-scratch oracle VERBATIM — the append-equals-rebuild
    // differential: the incremental path must land bit-identically on
    // the full-corpus contraction
    "p123_incremental_soft_dedup" -> Pipeline13.softDedupWeightsOracle,
  )
}
