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
  * batch- or component-bounded except the affected-bucket probe, one
  * label-TABLE-bounded read (the endpoint-label lookup prunes to the
  * endpoints' buckets under the probe-literal bound; oversized
  * evidence degrades to a table join) — and the label table is
  * ~16 bytes/doc, three orders of magnitude smaller than the corpus it
  * indexes, which is the entire point: the from-scratch alternative
  * repays the full corpus scan + shingle + MinHash pipeline every
  * refresh. The mini-graph contraction runs on the pair EVIDENCE only
  * (driver union-find under a 4M-edge bound, distributed min-label
  * above it), and the rewrite touches only buckets holding an affected
  * row or a new batch row.
  */
object LabelStore {

  /** Bucket count of the label layout. 16 matches the test-scale
    * sidecar; a 100 TB deployment raises it (buckets are the rewrite
    * granularity) — the value is a write-time choice read back from
    * the layout, so readers never hardcode it.
    */
  val LabelBuckets = 16

  /** Persist an initial `(doc_id, canonical)` label table — typically
    * `Dedup.dedupClusters` output for the first corpus slice. The
    * bucket count lands beside the data in `_meta` (underscore paths
    * are invisible to parquet readers of the store itself), so
    * [[update]] reads the writer's choice back instead of trusting a
    * caller to repeat it — a silently mismatched modulus would
    * misroute lookups and batch rows without any error.
    */
  def write(labels: DataFrame, path: String,
            nBuckets: Int = LabelBuckets): Unit =
    Prof.labeled(labels.sparkSession, "ls.write") {
    labels.select(col("doc_id"), col("canonical"))
      .withColumn("lb", pmod(col("doc_id"), lit(nBuckets)).cast("int"))
      .repartition(col("lb"))
      .sortWithinPartitions(col("lb"), col("canonical"), col("doc_id"))
      .write.mode("overwrite").partitionBy("lb")
      .option("parquet.block.size", 1 << 20)
      .parquet(path)
    labels.sparkSession.range(1)
      .select(lit(nBuckets).as("n_buckets"))
      .write.mode("overwrite").parquet(s"$path/_meta")
    // keep the per-JVM memo coherent with the layout just written: a
    // re-write of an existing path with a different bucket count would
    // otherwise leave later update/recover calls on the stale modulus —
    // the exact misrouting the _meta readback exists to prevent
    bucketsMemo.put(path, nBuckets)
    }

  /** The layout's bucket count, read back from `_meta` — memoized per
    * path (the update path is action-latency-bound, and the count is a
    * write-time constant): the [[IndexStores]] staleness contract —
    * paths are not reused for different layouts within one JVM.
    */
  private val bucketsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private def bucketsOf(spark: SparkSession, path: String): Int =
    bucketsMemo.computeIfAbsent(path,
      _ => spark.read.parquet(s"$path/_meta").head().getInt(0)).intValue

  /** The update's durable staging directory (sibling of the store). */
  private def stageDirOf(path: String) =
    new org.apache.hadoop.fs.Path(s"$path$StageSuffix")
  private val StageSuffix = "__updstage"
  /** Marker created only after the stage write commits — the
    * [[graft.streaming.StreamingOps.idempotentParquetBatch]] own-marker
    * discipline (survives `marksuccessfuljobs=false`).
    */
  private val StagedMarker = "_GRAFT_STAGED"
  /** Affected-bucket manifest of a [[remove]] stage (absent on
    * [[update]] stages): dynamic partition overwrite can only REWRITE
    * partitions present in the staged data, never delete one, so a
    * removal that empties a bucket records the full intended bucket
    * set here and [[applyStageAndPrune]] deletes the intended-empty
    * ones — idempotently, so crash replay stays correct.
    */
  private val BucketManifest = "_GRAFT_BUCKETS"

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The DEDICATED torn-read failure class of [[requireClean]] — a TYPE,
    * not a message substring, so the reader-retry contract
    * ([[graft.sources.Maintenance.retryOnSwap]] classifies this as
    * swap-transient) cannot silently decouple from a reworded error
    * text. Extends IllegalArgumentException so callers that matched the
    * old `require` failure keep working.
    */
  final class TornReadException(message: String)
    extends IllegalArgumentException(message)

  /** Fail loudly on a leftover update stage: the store may be
    * half-rewritten (a crash mid-overwrite), and silently reading or
    * re-folding over it would compound the damage. [[recover]] heals.
    *
    * The stage dir also exists for the DURATION of a healthy fold, and
    * a concurrent reader cannot tell the two apart — deliberately so:
    * a dynamic partition overwrite is not snapshot-isolated, so a read
    * overlapping a fold could silently mix old and new buckets; the
    * loud error turns that torn read into a retry. Readers that must
    * overlap folds serialize through the same maintenance scheduler
    * (the shared contract); between folds reads are free.
    */
  private def requireClean(spark: SparkSession, path: String): Unit = {
    val stage = stageDirOf(path)
    if (fsOf(spark, stage).exists(stage))
      throw new TornReadException(
        s"label store $path has an update stage ($stage): either a fold " +
          "is IN FLIGHT (retry after it completes — reads overlapping a " +
          "fold would not be snapshot-consistent anyway) or a previous " +
          "update CRASHED mid-overwrite (run LabelStore.recover(path))")
  }

  /** Repair a store whose [[update]] crashed mid-flight. Three cases,
    * decided by what the crash left behind:
    *
    *  - no stage dir → nothing to do (returns false);
    *  - stage dir WITHOUT the committed marker → the crash happened
    *    mid-stage-write, so the store itself was never touched: drop
    *    the stage and the whole (deterministic) update simply re-runs;
    *  - stage dir WITH the marker → the stage holds the COMPLETE
    *    intended content of every affected bucket, so re-applying the
    *    dynamic partition overwrite from it is idempotent whether the
    *    crash hit before, during or after the original overwrite —
    *    replay it, then drop the stage.
    *
    * DedupSpec kills an update between stage and overwrite and proves
    * recovery lands content-identical to the uninterrupted update.
    */
  def recover(spark: SparkSession, path: String): Boolean = {
    val stage = stageDirOf(path)
    val fs = fsOf(spark, stage)
    if (!fs.exists(stage)) return false
    if (fs.exists(new org.apache.hadoop.fs.Path(stage, StagedMarker)))
      // the prune step is a no-op for update stages (no manifest), so
      // one replay path heals both stage kinds
      applyStageAndPrune(spark, path, bucketsOf(spark, path))
    fs.delete(stage, true)
    true
  }

  /** [[recover]] then [[update]] — the maintenance handlers' spelling:
    * a fold that died mid-overwrite must not wedge every later
    * delivery behind the fail-loud dirty-stage check when the staged
    * content IS the exact intended store state; healing first is the
    * operational contract (folds are serial, so the stage can only be
    * this store's own previous update). Direct [[update]] keeps the
    * fail-loud behavior for callers that want to inspect first.
    */
  def recoverAndUpdate(spark: SparkSession, path: String,
                       batchIds: DataFrame, pairs: DataFrame): Unit = {
    recover(spark, path)
    update(spark, path, batchIds, pairs)
  }

  /** The live label table, `(doc_id, canonical)`. */
  def read(spark: SparkSession, path: String): DataFrame = {
    requireClean(spark, path)
    spark.read.parquet(path).select(col("doc_id"), col("canonical"))
  }

  /** p118's sampling weights refreshed FROM THE STORE — one window
    * count on the canonical key over the label table (the registered
    * p118 tail), no corpus scan anywhere.
    */
  def weightsFromStore(spark: SparkSession, path: String): DataFrame =
    Pipeline13.softDedupWeightsOf(read(spark, path))

  /** Edge bound of the driver union-find fast path: 4M edges ≈ 64 MB
    * of longs on the driver — comfortably a "model-sized" collect (the
    * probe-batch discipline), far above any sane micro-batch's pair
    * evidence. Above it the contraction falls back to the distributed
    * min-label device with identical output.
    */
  private[graft] val MaxDriverEdges = 4000000L

  /** Endpoint bound of [[stageUpdate]]'s fully-driver-resolved fold:
    * up to this many evidence endpoints the endpoint-label lookup is
    * collected (2M × ~16 B ≈ 32 MB — the same model-sized-collect
    * class as [[MaxDriverEdges]]' 64 MB). Within
    * [[Dedup.MaxProbeLiterals]] the lookup scan prunes by literal ids
    * (row-group skip); between the two bounds it prunes by bucket and
    * broadcast-joins the endpoint set (one job either way). Above it
    * the fold degrades to the distributed path.
    */
  private[graft] val MaxDriverEndpoints = 2000000

  /** Min-label connected components of an edge list, labeling ONLY the
    * nodes that appear in an edge (isolated ids are the caller's
    * left-join-coalesce-self case — excluding them keeps the
    * contraction's cost bounded by the EVIDENCE, not the batch: a
    * micro-batch is mostly pairless singletons that would otherwise
    * ride every contraction round). Two paths, spec-pinned identical:
    *
    *  - edge sets within [[MaxDriverEdges]] collect and fold through a
    *    path-compressed union-find that always points the larger root
    *    at the smaller, so each component's final root IS its minimum
    *    id — microseconds against the distributed loop's
    *    per-round job floor (the measured 3–4 s of p123's update);
    *  - larger sets run the registered `Dedup.dedupClusters` min-label
    *    loop over the edge-involved nodes.
    */
  /** Path-compressed min-root union-find over a driver-resident edge
    * list: always points the larger root at the smaller, so every
    * component's final root IS its minimum id. Returns id → min-root
    * for exactly the edge-involved nodes. Shared by [[contractEdges]]'
    * fast path and [[stageUpdate]]'s fully-driver-resolved fold.
    */
  private[graft] def unionFindMin(edges: Iterator[(Long, Long)]): java.util.HashMap[Long, Long] = {
    val parent = new java.util.HashMap[Long, Long]()
    def root(x0: Long): Long = {
      var x = x0
      while (parent.get(x) != x) {
        parent.put(x, parent.get(parent.get(x)))
        x = parent.get(x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      parent.putIfAbsent(a, a)
      parent.putIfAbsent(b, b)
      val (ra, rb) = (root(a), root(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val out = new java.util.HashMap[Long, Long](parent.size())
    parent.keySet().forEach { id => out.put(id, root(id)) }
    out
  }

  private[graft] def contractEdges(e: DataFrame,
                                   maxDriverEdges: Long = MaxDriverEdges): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val ec = e.select(col("d1"), col("d2")).localCheckpoint(eager = false)
    // ONE sizing-and-fetching job: collect at most bound+1 rows — the
    // overflow row alone routes to the distributed path (which reads
    // the checkpoint, so nothing recomputes), and the common path
    // skips a separate count action
    val arr = Prof.labeled(spark, "ls.contract") { ec.limit(
      math.min(maxDriverEdges + 1, Int.MaxValue.toLong).toInt).collect() }
    if (arr.length <= maxDriverEdges) {
      val mini = unionFindMin(
        arr.iterator.map(r => (r.getLong(0), r.getLong(1))))
      val out = new Array[(Long, Long)](mini.size())
      var i = 0
      mini.forEach { (id, rt) => out(i) = (id, rt); i += 1 }
      out.toSeq.toDF("doc_id", "canonical")
    } else {
      val nodes = ec.select(col("d1").as("doc_id"))
        .union(ec.select(col("d2").as("doc_id"))).distinct()
      Dedup.dedupClusters(nodes, "doc_id", ec)
    }
  }

  /** Labels of a document set under its own pair evidence — the
    * initial-build twin of [[update]]: contraction over the
    * edge-involved nodes, everything else labeled itself.
    */
  def labelsFor(ids: DataFrame, pairs: DataFrame): DataFrame =
    ids.select(col("doc_id"))
      .join(contractEdges(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical"), col("doc_id")).as("canonical"))

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
    * IDEMPOTENT under at-least-once redelivery (`foreachBatch`'s
    * contract): batch ids already present in the store keep their
    * stored row (an anti-join against the affected buckets drops the
    * replayed copy — the stored label is never older than the replay's
    * self-label), and replayed evidence contracts to edges the store
    * already satisfies, so a re-folded batch rewrites its buckets
    * content-identically instead of appending duplicate conflicting
    * rows. DedupSpec pins fold∘fold = fold.
    *
    * Batches must fold serially (one maintenance scheduler), like
    * every staged merge here.
    */
  def update(spark: SparkSession, path: String, batchIds: DataFrame,
             pairs: DataFrame): Unit = {
    if (stageUpdate(spark, path, batchIds, pairs)) {
      applyStage(spark, path, bucketsOf(spark, path))
      val stage = stageDirOf(path)
      fsOf(spark, stage).delete(stage, true)
    }
  }

  /** The read-and-stage half of [[update]]: computes the affected
    * buckets' complete intended content and lands it DURABLY in the
    * stage dir (marker after commit), without touching the store.
    * Returns false when the fold is a no-op (no affected buckets).
    * Package-visible so the crash-recovery spec can kill an update
    * exactly between stage and overwrite.
    */
  private[graft] def stageUpdate(spark: SparkSession, path: String,
                                 batchIds: DataFrame,
                                 pairs: DataFrame,
                                 maxFoldEdges: Long = MaxDriverEdges): Boolean = {
    requireClean(spark, path)
    // the layout's OWN bucket count — never a caller-supplied modulus
    // (a mismatch would silently misroute lookups and batch rows)
    val nBuckets = bucketsOf(spark, path)
    import spark.implicits._
    val p = pairs.select(col("d1"), col("d2")).localCheckpoint(eager = false)
    val batch = batchIds.select(col("doc_id")).localCheckpoint(eager = false)
    // ONE evidence job: collect the raw pair evidence under the driver
    // union-find bound — the array yields the edges AND their endpoint
    // set (no separate endpoint-distinct job), and the checkpoint
    // materializes here so nothing downstream re-runs the evidence
    // pipeline. The fold is action-latency-bound, not data-bound: when
    // the evidence fits these model-sized bounds (every sane
    // micro-batch; the pair list is three orders of magnitude smaller
    // than the corpus it indexes), the endpoint-label mapping, the
    // mini-graph contraction and the canonical remap all resolve ON
    // THE DRIVER — replacing the previous ends-distinct, label-join
    // and edge-mapping executions (each a separate AQE execution with
    // its own checkpoint and shuffle stages) with local hash maps.
    // Oversized evidence degrades to the distributed path below with
    // identical output.
    val rawEdges = Prof.labeled(spark, "ls.evidence") {
      p.limit(math.min(maxFoldEdges + 1, Int.MaxValue.toLong).toInt)
        .collect()
    }
    val endIdSet: java.util.HashSet[Long] =
      if (rawEdges.length <= maxFoldEdges) {
        val s = new java.util.HashSet[Long](rawEdges.length * 2)
        rawEdges.foreach { r => s.add(r.getLong(0)); s.add(r.getLong(1)) }
        s
      } else null
    // (miniRel, remap, batchRows): the contracted mini graph as a local
    // relation, the canonical-to-canonical remap of merged components,
    // and the arriving batch's label rows
    val (remap, batchRows) =
      if (endIdSet != null && endIdSet.size <= MaxDriverEndpoints) {
        // ---- fully driver-resolved fold ----
        val endIds = {
          val a = new Array[Long](endIdSet.size)
          var i = 0
          val it = endIdSet.iterator()
          while (it.hasNext) { a(i) = it.next(); i += 1 }
          a
        }
        // endpoint labels, bucket-pruned: the literal id set is a
        // literal partition set (pmod matches the writer's bucket
        // expression even for hypothetical negative ids), so the
        // lookup reads endpoint buckets, not the table
        val bks0 = endIds.map(i => (((i % nBuckets) + nBuckets) % nBuckets).toInt)
          .distinct.sorted
        val lookupRows =
          if (bks0.isEmpty) Array.empty[org.apache.spark.sql.Row]
          else if (endIds.length <= Dedup.MaxProbeLiterals)
            Prof.labeled(spark, "ls.lookup") {
              spark.read.parquet(path)
                .filter(col("lb").isin(bks0.toIndexedSeq: _*) &&
                  col("doc_id").isin(endIds.toIndexedSeq: _*))
                .select(col("doc_id"), col("canonical")).collect()
            }
          else Prof.labeled(spark, "ls.lookup") {
            // beyond the literal bound (an unbounded Catalyst IN list
            // is its own plan-size hazard): bucket-prune the scan and
            // broadcast the endpoint set instead — one job either way
            spark.read.parquet(path)
              .filter(col("lb").isin(bks0.toIndexedSeq: _*))
              .join(broadcast(endIds.toSeq.toDF("doc_id")), Seq("doc_id"))
              .select(col("doc_id"), col("canonical")).collect()
          }
        val lblMap = new java.util.HashMap[Long, Long](lookupRows.length * 2)
        lookupRows.foreach(r => lblMap.put(r.getLong(0), r.getLong(1)))
        def lblOf(x: Long): Long =
          if (lblMap.containsKey(x)) lblMap.get(x) else x
        // mini graph over mapped labels: stored endpoints resolve to
        // their current canonical, batch endpoints to themselves
        val mini = unionFindMin(rawEdges.iterator
          .map(r => (lblOf(r.getLong(0)), lblOf(r.getLong(1))))
          .filter(t => t._1 != t._2))
        // canonical-to-canonical remap of the merged components (an
        // old canonical keeps itself unless this batch connected it to
        // a smaller minimum)
        val remapBuf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        val oldCanon = new java.util.HashSet[Long](lblMap.values())
        oldCanon.forEach { c =>
          val n = mini.getOrDefault(c, c)
          if (n != c) remapBuf += ((c, n))
        }
        val miniBuf = {
          val a = new Array[(Long, Long)](mini.size())
          var i = 0
          mini.forEach { (id, rt) => a(i) = (id, rt); i += 1 }
          a
        }
        val miniRel = miniBuf.toSeq.toDF("doc_id", "canonical")
        (remapBuf.toSeq.toDF("__old", "__new"),
          batch.join(miniRel, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("canonical"), col("doc_id")).as("canonical")))
      } else {
        // ---- distributed fallback (oversized evidence) ----
        val ends = p.select(col("d1").as("doc_id"))
          .union(p.select(col("d2").as("doc_id"))).distinct()
          .localCheckpoint(eager = false)
        val endIds = Prof.labeled(spark, "ls.endpoints") { ends
          .limit(Dedup.MaxProbeLiterals + 1).collect().map(_.getLong(0)) }
        val lookup =
          if (endIds.length <= Dedup.MaxProbeLiterals) {
            val bks = endIds.map(i => (((i % nBuckets) + nBuckets) % nBuckets).toInt)
              .distinct.sorted
            if (bks.isEmpty) read(spark, path).limit(0)
            else spark.read.parquet(path)
              .filter(col("lb").isin(bks.toIndexedSeq: _*) &&
                col("doc_id").isin(endIds.toIndexedSeq: _*))
              .select(col("doc_id"), col("canonical"))
          } else read(spark, path)
        val lbl = ends.join(lookup, Seq("doc_id"), "left")
          .select(col("doc_id"), col("canonical").isNotNull.as("stored"),
            coalesce(col("canonical"), col("doc_id")).as("lbl"))
          .localCheckpoint(eager = false)
        val e = p
          .join(lbl.select(col("doc_id").as("d1"), col("lbl").as("l1")), Seq("d1"))
          .join(lbl.select(col("doc_id").as("d2"), col("lbl").as("l2")), Seq("d2"))
          .select(col("l1").as("d1"), col("l2").as("d2"))
          .filter(col("d1") =!= col("d2"))
        // contract only the EVIDENCE (edge-involved nodes): pairless
        // batch docs and untouched canonicals label themselves through
        // the left-join coalesces below
        val mini = contractEdges(e)
        (lbl.filter(col("stored"))
          .select(col("lbl").as("doc_id")).distinct()
          .join(mini, Seq("doc_id"))
          .filter(col("canonical") =!= col("doc_id"))
          .select(col("doc_id").as("__old"), col("canonical").as("__new"))
          .localCheckpoint(eager = false),
          batch.join(mini, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("canonical"), col("doc_id")).as("canonical"))
            .localCheckpoint(eager = false))
      }
    // buckets to rewrite: those holding a remapped row (one pushed
    // broadcast-join probe over the store — canonical-sorted row
    // groups make it skip) plus those receiving a batch row
    val lb = pmod(col("doc_id"), lit(nBuckets)).cast("int")
    val affected = Prof.labeled(spark, "ls.affected") {
      spark.read.parquet(path)
        .join(broadcast(remap.select(col("__old").as("canonical"))),
          Seq("canonical"))
        .select(col("lb").cast("int"))
        .unionByName(batchRows.select(lb.as("lb")))
        .distinct()
        .collect().map(_.getInt(0)).toSet
    }
    val bks = affected.toSeq.sorted
    if (bks.isEmpty) return false
    // no checkpoint: both consumers (the remap and the anti-join) read
    // it inside the ONE stage-write execution, and a bucket-pruned
    // parquet scan re-runs cheaper than a checkpoint's own execution +
    // block write (the store cannot change underneath — it is only
    // rewritten by applyStage, after this staging completes)
    val affectedRows = spark.read.parquet(path)
      .filter(col("lb").isin(bks: _*))
    val existing = affectedRows
      .join(broadcast(remap), col("canonical") === col("__old"), "left")
      .select(col("doc_id"),
        coalesce(col("__new"), col("canonical")).as("canonical"))
    // idempotency anti-join: a replayed batch's ids are already stored
    // (in their own — affected — buckets, since bucket is a pure id
    // function), and the STORED row wins: it carries every merge since
    // the first fold, where the replay's self-label would regress it.
    // New ids pass through untouched — one broadcast-sized anti-join
    // (batch-bounded) per fold buys at-least-once safety.
    val newRows = batchRows
      .join(affectedRows.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // DURABLE staging before the self-overwrite: the rewritten rows
    // land as files in a sibling stage dir first, and the dynamic
    // partition overwrite reads THOSE — not executor-memory checkpoint
    // blocks whose loss mid-overwrite (lineage truncated, inputs being
    // replaced) would leave the store half-rewritten with no recompute
    // path. Crash before the marker: the store is untouched and the
    // whole update re-runs (it is deterministic); crash after it: the
    // stage holds the complete intended content of every affected
    // bucket and [[recover]] replays the overwrite. The stage is
    // removed on success.
    val stage = stageDirOf(path)
    val fs = fsOf(spark, stage)
    Prof.labeled(spark, "ls.stage") {
      existing.unionByName(newRows)
        .write.mode("overwrite").parquet(stage.toString)
    }
    fs.create(new org.apache.hadoop.fs.Path(stage, StagedMarker), true).close()
    true
  }

  /** The overwrite half of [[update]]: replay the staged buckets into
    * the store via dynamic partition overwrite — deterministic and
    * idempotent (re-applying an applied stage rewrites the same
    * buckets with the same bytes), which is what makes [[recover]]
    * correct at any crash point past the stage marker.
    */
  /** Schema-explicit stage read: a removal that empties every affected
    * bucket stages ZERO rows (no part files at all), where schema
    * inference would fail — the content is still meaningful (the prune
    * step deletes the intended-empty buckets).
    */
  private def readStage(spark: SparkSession, path: String) =
    spark.read.schema("doc_id BIGINT, canonical BIGINT")
      .parquet(stageDirOf(path).toString)

  private def applyStage(spark: SparkSession, path: String,
                         nBuckets: Int): Unit =
    Prof.labeled(spark, "ls.apply") { readStage(spark, path)
      .withColumn("lb", pmod(col("doc_id"), lit(nBuckets)).cast("int"))
      .repartition(col("lb"))
      .sortWithinPartitions(col("lb"), col("canonical"), col("doc_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("lb")
      .option("parquet.block.size", 1 << 20)
      .parquet(path) }

  /** [[applyStage]] plus the removal stages' emptied-bucket prune:
    * delete every bucket the manifest intends but the staged data does
    * not populate (a dynamic overwrite cannot empty a partition — it
    * would silently keep the removed rows). Deletes are idempotent, so
    * the combined replay stays crash-safe at any point past the marker.
    */
  private def applyStageAndPrune(spark: SparkSession, path: String,
                                 nBuckets: Int): Unit = {
    applyStage(spark, path, nBuckets)
    val manifest =
      new org.apache.hadoop.fs.Path(stageDirOf(path), BucketManifest)
    val fs = fsOf(spark, manifest)
    if (fs.exists(manifest)) {
      val intended = spark.read.parquet(manifest.toString)
        .collect().map(_.getInt(0)).toSet
      val present = readStage(spark, path)
        .select(pmod(col("doc_id"), lit(nBuckets)).cast("int").as("lb"))
        .distinct().collect().map(_.getInt(0)).toSet
      (intended -- present).toSeq.sorted.foreach { b =>
        val dir = new org.apache.hadoop.fs.Path(s"$path/lb=$b")
        fs.delete(dir, true)
      }
    }
  }

  /** REMOVE documents from the live label table — the retraction path
    * (takedown, license withdrawal: a real LLM-corpus operation the
    * grow-only fold cannot express, because deleting a member can
    * SPLIT a component and union-find state carries no edges to split
    * by). Drops the removed rows and recontracts the affected
    * components from `evidence`, leaving every other bucket
    * byte-identical.
    *
    * EVIDENCE-SOURCE CONTRACT: `evidence` must be (d1, d2) near-dup
    * pairs covering at least the SURVIVING members of the components
    * the removed docs belong to — the same relation the folds consumed.
    * The maintained signature stores answer it without a corpus
    * rescan: [[Dedup.lshPairsFromStore]] (text), the banded
    * frame/fingerprint probes (video/audio), or the τ-probe (vectors),
    * restricted to the member ids; passing the FULL store-derived pair
    * relation is always safe — edges touching removed docs or docs
    * outside the affected components are filtered out here (by the
    * fold invariant a true evidence edge never crosses components, so
    * the filter only drops edges that were already redundant).
    * Supplying PARTIAL evidence (fewer pairs than were folded) splits
    * components conservatively — survivors whose connecting pairs are
    * missing relabel as singletons; it never invents a merge.
    *
    * Steps: (1) removed rows resolve to their canonicals (bucket-pruned
    * under the probe-literal bound); (2) ALL member rows of those
    * components load via one broadcast canonical probe
    * (canonical-sorted row groups skip); (3) survivors = members minus
    * removed recontract under the filtered evidence
    * ([[contractEdges]] — evidence-bounded, like every fold);
    * (4) the affected buckets (exactly those holding a member row)
    * rewrite via the staged overwrite, with the bucket manifest so a
    * bucket whose every row was removed is DELETED, not silently kept
    * (dynamic overwrite cannot empty a partition). Removing ids absent
    * from the store is a no-op. Same durability contract as
    * [[update]]: staged, marker after commit, [[recover]] heals any
    * crash window; removals serialize with folds through the one
    * maintenance scheduler.
    *
    * DedupSpec pins remove-equals-rebuild: the post-removal store
    * hash-matches the from-scratch contraction of the surviving corpus
    * — including the component-split and emptied-bucket cases — and a
    * crash between stage and overwrite recovers content-identically.
    *
    * Degenerate corner, out of contract: removing EVERY stored document
    * leaves a store with no parquet files at all, which [[read]] cannot
    * schema-infer — an emptied corpus is a rebuild-from-nothing
    * ([[write]]), not a maintenance state.
    */
  def remove(spark: SparkSession, path: String, removeIds: DataFrame,
             evidence: DataFrame): Unit = {
    if (stageRemove(spark, path, removeIds, evidence)) {
      applyStageAndPrune(spark, path, bucketsOf(spark, path))
      val stage = stageDirOf(path)
      fsOf(spark, stage).delete(stage, true)
    }
  }

  /** The read-and-stage half of [[remove]] — package-visible so the
    * crash spec can kill a removal between stage and overwrite.
    * Returns false when nothing to do (no removed id is stored).
    */
  private[graft] def stageRemove(spark: SparkSession, path: String,
                                 removeIds: DataFrame,
                                 evidence: DataFrame): Boolean = {
    requireClean(spark, path)
    val nBuckets = bucketsOf(spark, path)
    val rm = removeIds.select(col("doc_id")).distinct()
      .localCheckpoint(eager = false)
    // the removed rows' canonicals — bucket-pruned when the removal set
    // fits the probe-literal bound (the update endpoint-lookup device)
    val rmIds = rm.limit(Dedup.MaxProbeLiterals + 1).collect()
      .map(_.getLong(0))
    val rmRows =
      if (rmIds.length <= Dedup.MaxProbeLiterals) {
        val rb = rmIds.map(i => (((i % nBuckets) + nBuckets) % nBuckets).toInt)
          .distinct.sorted
        if (rb.isEmpty) read(spark, path).limit(0)
        else spark.read.parquet(path)
          .filter(col("lb").isin(rb.toIndexedSeq: _*) &&
            col("doc_id").isin(rmIds.toIndexedSeq: _*))
          .select(col("doc_id"), col("canonical"))
      } else spark.read.parquet(path).join(rm, Seq("doc_id"))
        .select(col("doc_id"), col("canonical"))
    val affC = rmRows.select(col("canonical")).distinct()
      .localCheckpoint(eager = false)
    // every row of the affected components, wherever it lives (bucket
    // is an id function, members spread across buckets)
    val members = spark.read.parquet(path)
      .join(broadcast(affC), Seq("canonical"))
      .select(col("doc_id"), col("lb").cast("int").as("lb"))
      .localCheckpoint(eager = false)
    val bks = members.select(col("lb")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (bks.isEmpty) return false
    val survivors = members.select(col("doc_id"))
      .join(rm, Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = false)
    // evidence restricted to surviving members — the defensive filter
    // of the evidence-source contract
    val e = evidence.select(col("d1"), col("d2"))
      .join(survivors.select(col("doc_id").as("d1")), Seq("d1"))
      .join(survivors.select(col("doc_id").as("d2")), Seq("d2"))
    val relabeled = labelsFor(survivors, e)
    val untouched = spark.read.parquet(path)
      .filter(col("lb").isin(bks: _*))
      .join(broadcast(affC), Seq("canonical"), "left_anti")
      .select(col("doc_id"), col("canonical"))
    val stage = stageDirOf(path)
    val fs = fsOf(spark, stage)
    untouched.unionByName(relabeled)
      .write.mode("overwrite").parquet(stage.toString)
    import spark.implicits._
    bks.toDF("lb").repartition(1).write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(stage, BucketManifest).toString)
    fs.create(new org.apache.hadoop.fs.Path(stage, StagedMarker), true).close()
    true
  }
}
