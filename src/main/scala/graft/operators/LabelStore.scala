package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The LIVE soft-dedup label store — the persisted `(doc_id,
  * canonical)` cluster-label table that lets a streaming deployment
  * keep p118's sampling weights CURRENT without ever rescanning the
  * corpus. The batch path (p20/p118) recomputes cluster labels from
  * the full corpus; the streaming gates already detect arriving
  * near-dups (`textDedupGateBatch` verdicts carry (doc_id, dup_of)
  * candidate pairs against everything published), and this store is
  * where those verdicts FOLD: per ingested batch, [[update]] runs one
  * union-find step on the affected components only, and
  * [[weightsFromStore]] refreshes p118's weights from the label table
  * alone. The `ivfAppend` append-equals-rebuild discipline applied to
  * cluster labels: ingesting k batches incrementally hash-matches the
  * from-scratch contraction on the union corpus (p123's differential
  * oracle proves it end to end).
  *
  * Layout discipline (the at-rest store family's): hive-partitioned by
  * `lb = doc_id mod` [[LabelBuckets]] — rows never change partition
  * (doc ids are immutable), so an update's dynamic partition overwrite
  * can never strand stale rows in a bucket it did not rewrite — SORTED
  * by `canonical` within each file (components cluster into row
  * groups, so the update's affected-row probe skips groups via parquet
  * min/max), small row groups.
  *
  * Scale shape of one [[update]]: everything the step touches is
  * batch- or component-bounded except two label-TABLE-bounded reads
  * (the endpoint-label lookup and the affected-bucket probe) — the
  * label table is ~16 bytes/doc, three orders of magnitude smaller
  * than the corpus it indexes, and that is the entire point: the
  * from-scratch alternative repays the full corpus scan + shingle +
  * MinHash pipeline every refresh. The mini-graph contraction runs on
  * batch ids + affected canonicals only, and the rewrite touches only
  * buckets holding an affected row or a new batch row.
  */
object LabelStore {

  /** Bucket count of the label layout. 16 matches the test-scale
    * sidecar; a 100 TB deployment raises it (buckets are the rewrite
    * granularity) — the value is a write-time choice read back from
    * the layout, so readers never hardcode it.
    */
  val LabelBuckets = 16

  /** Persist an initial `(doc_id, canonical)` label table — typically
    * `Dedup.dedupClusters` output for the first corpus slice.
    */
  def write(labels: DataFrame, path: String,
            nBuckets: Int = LabelBuckets): Unit =
    labels.select(col("doc_id"), col("canonical"))
      .withColumn("lb", pmod(col("doc_id"), lit(nBuckets)).cast("int"))
      .repartition(col("lb"))
      .sortWithinPartitions(col("lb"), col("canonical"), col("doc_id"))
      .write.mode("overwrite").partitionBy("lb")
      .option("parquet.block.size", 1 << 20)
      .parquet(path)

  /** The live label table, `(doc_id, canonical)`. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("doc_id"), col("canonical"))

  /** p118's sampling weights refreshed FROM THE STORE — one window
    * count on the canonical key over the label table (the registered
    * p118 tail), no corpus scan anywhere.
    */
  def weightsFromStore(spark: SparkSession, path: String): DataFrame =
    Pipeline13.softDedupWeightsOf(read(spark, path))

  /** Fold ONE ingested batch into the live label table: `batchIds` are
    * the arriving documents (new to the store — the shared ingest
    * contract), `pairs` the batch's near-dup evidence as (d1, d2) id
    * pairs — the union of the within-batch candidate pairs
    * (`Dedup.minhashLshPairs` on the batch) and the published-corpus
    * gate verdicts (`textDedupGateBatch` / `lshProbeStoredDF`:
    * batch id ↔ stored id). One union-find step on the affected
    * components only:
    *
    *  1. endpoint labels: stored endpoints resolve to their current
    *     canonical (one label-table join), batch endpoints to
    *     themselves;
    *  2. the MINI graph — edges mapped through those labels, nodes =
    *     batch ids + affected canonicals — contracts with the
    *     registered min-label device (`Dedup.dedupClusters`): an old
    *     canonical is its component's minimum, so the mini contraction
    *     yields exactly the union graph's per-component minima;
    *  3. rewrite: components whose canonical changed remap via a
    *     broadcast join over ONLY the buckets holding an affected or
    *     new row; dynamic partition overwrite leaves every other
    *     bucket byte-identical.
    *
    * Batches must fold serially (one maintenance scheduler), like
    * every staged merge here.
    */
  def update(spark: SparkSession, path: String, batchIds: DataFrame,
             pairs: DataFrame, nBuckets: Int = LabelBuckets): Unit = {
    val p = pairs.select(col("d1"), col("d2")).localCheckpoint()
    val batch = batchIds.select(col("doc_id")).localCheckpoint()
    val ends = p.select(col("d1").as("doc_id"))
      .union(p.select(col("d2").as("doc_id"))).distinct()
    // current labels of the pair endpoints: canonical when stored,
    // self when arriving. The join is label-table-bounded; `stored`
    // distinguishes the two cases for the remap below.
    val lbl = ends.join(read(spark, path), Seq("doc_id"), "left")
      .select(col("doc_id"), col("canonical").isNotNull.as("stored"),
        coalesce(col("canonical"), col("doc_id")).as("lbl"))
      .localCheckpoint()
    val e = p
      .join(lbl.select(col("doc_id").as("d1"), col("lbl").as("l1")), Seq("d1"))
      .join(lbl.select(col("doc_id").as("d2"), col("lbl").as("l2")), Seq("d2"))
      .select(col("l1").as("d1"), col("l2").as("d2"))
      .filter(col("d1") =!= col("d2"))
    val nodes = batch.union(lbl.select(col("lbl").as("doc_id"))).distinct()
    val mini = Dedup.dedupClusters(nodes, "doc_id", e).localCheckpoint()
    // canonical-to-canonical remap of the merged components (an old
    // canonical keeps itself unless this batch connected it to a
    // smaller minimum)
    val remap = lbl.filter(col("stored"))
      .select(col("lbl").as("doc_id")).distinct()
      .join(mini, Seq("doc_id"))
      .filter(col("canonical") =!= col("doc_id"))
      .select(col("doc_id").as("__old"), col("canonical").as("__new"))
      .localCheckpoint()
    val batchRows = batch.join(mini, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical"), col("doc_id")).as("canonical"))
      .localCheckpoint()
    // buckets to rewrite: those holding a remapped row (one pushed
    // broadcast-join probe over the store — canonical-sorted row
    // groups make it skip) plus those receiving a batch row
    val lb = pmod(col("doc_id"), lit(nBuckets)).cast("int")
    val affected = spark.read.parquet(path)
      .join(broadcast(remap.select(col("__old").as("canonical"))),
        Seq("canonical"))
      .select(col("lb").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSet ++
      batchRows.select(lb.as("lb")).distinct()
        .collect().map(_.getInt(0)).toSet
    val bks = affected.toSeq.sorted
    if (bks.isEmpty) return
    val existing = spark.read.parquet(path)
      .filter(col("lb").isin(bks: _*))
      .join(broadcast(remap), col("canonical") === col("__old"), "left")
      .select(col("doc_id"),
        coalesce(col("__new"), col("canonical")).as("canonical"))
    existing.unionByName(batchRows)
      // materialize BEFORE the write: the output path is also the
      // input path, and the overwrite must not consume the files it is
      // replacing (Spark's self-overwrite check rejects the lazy plan)
      .localCheckpoint()
      .withColumn("lb", lb)
      .repartition(col("lb"))
      .sortWithinPartitions(col("lb"), col("canonical"), col("doc_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("lb")
      .option("parquet.block.size", 1 << 20)
      .parquet(path)
  }
}
