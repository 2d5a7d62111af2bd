package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators: the file-layout jobs every long-lived
  * 100 TB table needs between queries.
  *
  * The reference's analog is its static chunk layout + `chunksinfo.txt`
  * metadata (`/root/reference/chunksinfo.txt:1-6`, `server.go:376-391`):
  * a hand-maintained file manifest with per-chunk key ranges. These
  * operators produce the same two artifacts — a right-sized file layout
  * and a per-file min/max index — as Spark jobs over any parquet table.
  */
object Maintenance {

  /** Out-of-place compaction of a small-files table: rewrite `src` to
    * `dst` with ~`targetRowsPerFile` rows per output file, clustered
    * by `sortCol` (range-partitioned, so file min/max ranges don't
    * overlap and stay skippable). Out-of-place is the safe pattern at
    * scale — readers keep using `src` until the atomic catalog/path
    * swap; nothing here blocks the table.
    */
  def compact(spark: SparkSession, src: String, dst: String,
              targetRowsPerFile: Long, sortCol: String): Long = {
    val df = spark.read.parquet(src)
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(dst)
    n
  }

  /** Out-of-place compaction of a HIVE-PARTITIONED layout — e.g. the
    * IVF cell store after many `Similarity.ivfAppend` ingest batches,
    * or a day-partitioned event log: rewrites `src` to `dst` keeping
    * the directory structure (and with it every partition-pruning
    * property) intact, collapsing each partition value's accumulated
    * small files. One hash shuffle on the partition column co-locates
    * each value on one task, so each directory comes out as one file;
    * pass `extraFiles > 1` to spread mega-partitions over that many
    * files instead. Same out-of-place safety contract as [[compact]]:
    * readers stay on `src` until the atomic path swap.
    */
  def compactPartitioned(spark: SparkSession, src: String, dst: String,
                         partCol: String, extraFiles: Int = 1): Unit = {
    // tombstone-aware like [[compactPartitionedSorted]]: the public
    // tombstoneAppend is store-agnostic, so a zone CAN land on a store
    // compacted through this path (the IVF layouts) — a rewrite that
    // kept the queued rows while the caller's swap retired the zone
    // would silently resurrect deferred takedowns. No zone →
    // passthrough, one fs.exists.
    val df = minusTombstones(spark, src, spark.read.parquet(src))
    val parted =
      if (extraFiles <= 1) df.repartition(col(partCol))
      else df.repartition(col(partCol), pmod(spark_partition_id(), lit(extraFiles)))
    parted.write.mode("overwrite").partitionBy(partCol).parquet(dst)
  }

  /** [[compactPartitioned]] for SORTED index stores: one file per
    * partition value, rows SORTED by `sortCol` within it, with small
    * row groups — the at-rest signature-store discipline (video frame
    * store, audio segment store, text LSH store all delegate here).
    * Plain [[compactPartitioned]] folds sliver files but leaves rows
    * unsorted, so every row group's min/max on the probe key spans the
    * whole key space and the stored probe's pushed `IN (…)` filter
    * skips nothing; this pass re-establishes the writer's sort. Row
    * groups are deliberately small because group size is the probe's
    * read-amplification floor (measured: BASELINE.md's frame/LSH store
    * probes). Same out-of-place safety contract as [[compact]].
    */
  def compactPartitionedSorted(spark: SparkSession, src: String, dst: String,
                               partCol: String, sortCol: String,
                               rowGroupBytes: Int = 1 << 20): Unit =
    // tombstone-aware: a compaction is exactly when DEFERRED takedowns
    // ([[tombstoneAppend]]) get applied physically — the rewrite drops
    // the tombstoned rows, and since the zone is not part of the data
    // files it is not copied to `dst`, so after the caller's swap the
    // applied tombstones evaporate with the old store copy
    minusTombstones(spark, src, spark.read.parquet(src))
      .repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write.mode("overwrite").partitionBy(partCol)
      .option("parquet.block.size", rowGroupBytes)
      .parquet(dst)

  /** DEFERRED takedown for the full-rewrite store family: the banded
    * signature stores pay a full rewrite per eager retraction
    * ([[removePartitionedRows]] — band values are content-derived, so
    * every partition holds a retracted doc's rows; TakedownProbe
    * measures the linear term). A tombstone makes the takedown itself
    * O(batch): the retracted ids land append-only in an
    * underscore-prefixed zone INSIDE the store path (invisible to
    * parquet discovery, like `_model`), every tombstone-aware reader
    * anti-joins them out (the probes and pair derivations — withdrawn
    * content stops matching IMMEDIATELY), and the physical rewrite
    * rides the NEXT scheduled compaction for free
    * ([[compactPartitionedSorted]] drops the rows; the swap retires
    * the zone with the old copy). The zone stays bounded by the
    * takedowns since the last compaction — the same bound the
    * broadcast anti-join relies on.
    */
  private def tombstoneZone(path: String) = s"$path/_graft_tombstones"

  /** Queue ids for deferred removal. Ids already queued are not
    * re-appended (the zone cannot grow under replay); duplicates would
    * be harmless to readers anyway (anti-join semantics). `idCol`
    * names the store's id column and is RECORDED by the zone itself
    * (its one column), so readers and compactors never restate it —
    * a zone and its store cannot disagree on the key.
    */
  def tombstoneAppend(spark: SparkSession, path: String,
                      removeIds: DataFrame, idCol: String): Unit = {
    // materialized (localCheckpoint) so the emptiness check below and
    // the written rows see the SAME set — the API does not force
    // removeIds to be deterministic, and a caller frame that differed
    // between the two evaluations would otherwise desynchronize the
    // zone-file count from the queued-batch count. Takedown batches
    // are broadcast-bounded by contract, so the checkpoint is tiny.
    val fresh = (tombstones(spark, path) match {
      case Some(ts) =>
        require(ts.columns.sameElements(Array(idCol)),
          s"tombstoneAppend: zone of $path is keyed by " +
            s"${ts.columns.mkString(",")}, not $idCol")
        removeIds.select(col(idCol)).distinct()
          .join(broadcast(ts), Seq(idCol), "left_anti")
      case None => removeIds.select(col(idCol)).distinct()
    }).localCheckpoint()
    // skip the append when nothing is genuinely new (pure replay /
    // already-queued batch): an empty part-file would still count
    // against the zone-file compaction triggers, so crash-retries
    // could fire a full compaction early for no pending work. The
    // coalesce(1) keeps the other half of the triggers' premise true —
    // ONE file per append, so the zone's file count IS the queued-batch
    // count (a multi-partition anti-join output would otherwise land
    // one file per partition and fire the compaction after a single
    // large batch); takedown batches are broadcast-bounded by contract,
    // so one writer task is the right shape anyway
    if (!fresh.isEmpty)
      fresh.coalesce(1).write.mode("append").parquet(tombstoneZone(path))
  }

  /** The pending tombstone set, if any — a 1-column frame whose column
    * NAME is the store's id column (written by [[tombstoneAppend]]).
    */
  def tombstones(spark: SparkSession, path: String): Option[DataFrame] = {
    val z = new org.apache.hadoop.fs.Path(tombstoneZone(path))
    val fs = z.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(z) &&
        fs.listStatus(z).exists(_.getPath.getName.endsWith(".parquet")))
      Some(spark.read.parquet(z.toString).distinct())
    else None
  }

  /** Anti-join a store scan (or any frame carrying the store's id
    * column) against the store's pending tombstones — the one spelling
    * every tombstone-aware reader uses. The join key comes from the
    * ZONE's own schema, so a reader can never filter on the wrong
    * column; a frame that lacks it fails loudly. No zone → the frame
    * passes through untouched (zero cost on the common path); the zone
    * is bounded by takedowns-since-last-compaction, so it broadcasts.
    */
  def minusTombstones(spark: SparkSession, path: String,
                      rows: DataFrame): DataFrame =
    tombstones(spark, path) match {
      case Some(ts) =>
        val idCol = ts.columns.head
        require(rows.columns.contains(idCol),
          s"minusTombstones: frame lacks the zone's id column $idCol")
        rows.join(broadcast(ts), Seq(idCol), "left_anti")
      case None => rows
    }

  /** REMOVE documents from a partitioned+sorted signature store — the
    * store half of the retraction path ([[graft.operators.LabelStore
    * .remove]] handles the label half): a retracted document's
    * signature rows must leave the store too, or future gate probes
    * keep matching withdrawn content and — worse — the label fold's
    * endpoint lookup finds no stored label for the retracted id and
    * treats it as NEW, silently resurrecting it as a cluster member
    * (the reappearance hazard the composed
    * `StreamingOps.dedupRetractBatch` spec pins).
    *
    * Rewrite-then-swap with the retracted ids anti-joined away,
    * preserving the layout contract end to end: partition column,
    * within-file sort (the probes' pushed-filter row-group skip),
    * small row groups, and `ingest_batch` (the staged merges'
    * exactly-once presence probe). A signature row's band values are
    * id-independent, so a removal necessarily touches every partition
    * — this is a full store rewrite, which is why deployments batch
    * takedowns; the swap uses the shared checked-rename device
    * ([[graft.streaming.StreamingOps.swapInCompacted]]) so a crash at
    * any point heals via `recoverStoreSwap`.
    */
  def removePartitionedRows(spark: SparkSession, path: String,
                            removeIds: DataFrame, idCol: String,
                            partCol: String, sortCol: String,
                            rowGroupBytes: Int = 1 << 20): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(s"${path}__compact")
    fs.delete(dst, true)
    fs.delete(new org.apache.hadoop.fs.Path(s"${path}__precompact"), true)
    // also apply any PENDING deferred tombstones: the swap below
    // retires the zone with the old copy, so leaving their rows in the
    // rewrite would silently resurrect previously-deferred takedowns
    minusTombstones(spark, path, spark.read.parquet(path))
      .join(broadcast(removeIds.select(col(idCol)).distinct()),
        Seq(idCol), "left_anti")
      .repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write.mode("overwrite").partitionBy(partCol)
      .option("parquet.block.size", rowGroupBytes)
      .parquet(dst.toString)
    graft.CrashPoints.hit("removePartitionedRows.staged")
    graft.streaming.StreamingOps.swapInCompacted(spark, path)
  }

  /** REMOVE vectors from an IVF cell layout — the CELL-PRUNED
    * retraction: unlike the banded signature stores (where a
    * document's rows land in every band partition, forcing
    * [[removePartitionedRows]]'s full rewrite), a vector's rows live
    * in exactly ONE cell, so a takedown rewrites only the cells that
    * actually hold a retracted id: one pruned semi-join finds them,
    * a dynamic partition overwrite rewrites them without their
    * retracted rows, and cells the overwrite would leave EMPTY are
    * deleted explicitly (a dynamic overwrite cannot empty a partition
    * — the LabelStore.remove lesson). At 100 TB this is the
    * difference between rewriting nProbe-sized slices and rewriting
    * the index.
    *
    * Durability: the kept rows ride a localCheckpoint through the
    * self-overwrite, and the whole operation is IDEMPOTENT — a crash
    * mid-overwrite leaves some affected cells rewritten (complete and
    * correct) and others untouched, and a RE-RUN of the same
    * retraction converges (already-clean cells no longer list as
    * affected). Serialize with folds through the one maintenance
    * scheduler, like every store mutation here.
    */
  def removeIvfRows(spark: SparkSession, path: String,
                    removeIds: DataFrame,
                    idCol: String = "vec_id"): Boolean =
    removePrunedRows(spark, path, removeIds, idCol, partCol = "cell",
      sortCol = None)

  /** The GENERAL pruned retraction over any hive-partitioned store
    * whose affected partitions are row-locatable: [[removeIvfRows]]'
    * device with the partition column as a parameter — one pruned
    * semi-join finds the partitions actually holding a retracted row,
    * a dynamic partition overwrite rewrites ONLY those (optionally
    * re-sorted so a pushed-filter layout keeps its row-group skip),
    * and partitions the overwrite would leave EMPTY are deleted
    * explicitly. Serves the IVF cell layouts (`partCol = "cell"`) and
    * the doc_id-bucketed shingle SIDECAR (`partCol = "bucket"`,
    * `sortCol = Some("doc_id")` — bucket is `doc_id mod n`, so a
    * takedown rewrites at most |retracted ids| buckets, never the
    * store). The banded signature stores CANNOT use it — band values
    * are content-derived, every partition holds a retracted doc's rows
    * — which is what [[removePartitionedRows]]' full rewrite is for.
    *
    * Same idempotence contract as the IVF form: a crash mid-overwrite
    * leaves some affected partitions rewritten (complete and correct)
    * and others untouched; the re-run converges because clean
    * partitions no longer list as affected. Takedown batches are
    * bounded (the retraction-queue contract), so the id set
    * broadcasts.
    */
  def removePrunedRows(spark: SparkSession, path: String,
                       removeIds: DataFrame, idCol: String,
                       partCol: String, sortCol: Option[String],
                       rowGroupBytes: Int = 1 << 20): Boolean = {
    val rm = broadcast(removeIds.select(col(idCol)).distinct())
    val affected = spark.read.parquet(path)
      .join(rm, Seq(idCol), "left_semi")
      .select(col(partCol)).distinct()
      .collect().map(_.get(0))
    if (affected.isEmpty) return false
    val kept0 = spark.read.parquet(path)
      .filter(col(partCol).isin(affected.toIndexedSeq: _*))
      .join(rm, Seq(idCol), "left_anti")
    val kept = sortCol.fold(kept0)(sc => kept0
        .repartition(col(partCol))
        .sortWithinPartitions(col(partCol), col(sc)))
      .localCheckpoint()
    val keptParts = kept.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSet
    kept.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("parquet.block.size", rowGroupBytes)
      .partitionBy(partCol)
      .parquet(path)
    graft.CrashPoints.hit("removePrunedRows.overwrite")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (affected.toSet -- keptParts).foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$partCol=$c"), true)
    }
    true
  }

  /** Reader-side RETRY for the store-swap windows — the concurrency
    * contract for probes that do NOT serialize through the one
    * maintenance scheduler: every swap device here is rename-based
    * (the hive stores' `swapInCompacted` rename pair, the bucketed
    * tables' DROP→RENAME, the label store's staged overwrite), so a
    * reader racing a swap can transiently observe (a) the store path
    * or table MISSING for one resolution (between the two renames /
    * between DROP and RENAME), (b) file-level FileNotFound mid-scan
    * when its resolved file list predates the swap and the old copy's
    * deletion wins the race, or (c) the label store's fail-loud
    * dirty-stage error for the DURATION of a fold (deliberate — a
    * dynamic partition overwrite is not snapshot-isolated, so the loud
    * error is what turns a torn read into a retry). All three are
    * TRANSIENT by construction — a swap either completes or heals, and
    * every complete state serves consistent reads — so the correct
    * reader behavior is bounded retry, never fallback logic. What a
    * retried read can NEVER observe is partial state: renames are
    * atomic per directory, the replacement is complete before the
    * first rename, and the label store errors rather than serving a
    * half-overwritten bucket set (SwapRaceSpec races a tight probe
    * loop against repeated swaps on all three devices and asserts
    * every read is exact).
    *
    * Bounded: rethrows after `attempts`; only the three transient
    * classes retry, anything else propagates immediately.
    */
  def retryOnSwap[T](attempts: Int = 8, backoffMs: Long = 50)(
      body: => T): T = {
    def transient(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(12).exists {
        case _: java.io.FileNotFoundException => true
        // only the NOT-FOUND analysis classes are swap-transient — a
        // blanket AnalysisException match would retry a permanent
        // error (missing column, bad function) to exhaustion before
        // surfacing it
        case e: org.apache.spark.sql.AnalysisException =>
          val ec = Option(e.getCondition).getOrElse("")
          ec.contains("TABLE_OR_VIEW_NOT_FOUND") ||
            ec.contains("PATH_NOT_FOUND") ||
            ec.contains("UNABLE_TO_INFER_SCHEMA")
        // the label store's torn-read refusal is a dedicated TYPE
        // (thrown for the duration of a fold), so this classification
        // cannot decouple from a reworded message
        case _: graft.operators.LabelStore.TornReadException => true
        case _ => false
      }
    var attempt = 0
    while (true) {
      try return body
      catch {
        case t: Throwable if attempt < attempts - 1 && transient(t) =>
          attempt += 1; Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Per-file statistics manifest: (file, rows, min, max) of `keyCol`
    * for every parquet file of the table — the file-skipping index the
    * reference keeps in `chunksinfo.txt`, derived instead of
    * hand-maintained. One distributed pass; `input_file_name()` keys
    * the aggregation so partials combine map-side per file.
    */
  def fileStats(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
           min(col(keyCol)).as("lo"),
           max(col(keyCol)).as("hi"))

  /** Which files can serve `lo <= key <= hi`? The pruning decision the
    * reference makes in `getRequiredChunks` (`server.go:399-411`),
    * over the derived manifest. Parquet readers do this internally;
    * materializing it makes layout quality observable and testable.
    */
  def filesInRange(stats: DataFrame, lo: Any, hi: Any): DataFrame =
    stats.filter(lit(lo) <= col("hi") && lit(hi) >= col("lo"))

  /** WHEN to compact — the trigger half of the compaction story (the
    * payoff half is measured per store in BASELINE.md): one row per
    * hive-partition value of a [[compactPartitionedSorted]]-style
    * store, carrying the two layout-health signals a maintenance
    * scheduler keys on and a `compact` recommendation:
    *
    *  - `n_files`: streamed ingestion (`StreamingOps.*MergeStaged`)
    *    appends one sliver file per batch; past `maxFiles` the footer/
    *    open overhead dominates small probes.
    *  - `n_overlapping`: files whose `keyCol` min/max range overlaps an
    *    earlier file's — the signal that row-group/file skipping is
    *    degraded (a freshly compacted partition's single sorted file
    *    trivially has 0; every unsorted append spans the whole key
    *    space and overlaps everything). Computed per partition by the
    *    classic sweep: sort files by `lo`, a file overlaps if its `lo`
    *    does not exceed the running max of earlier files' `hi`.
    *
    * Runs entirely on the per-file stats manifest ([[fileStats]]: one
    * distributed pass whose shuffle is file-count-sized), so the plan
    * costs a manifest aggregation, never a data rewrite. Deployments
    * run it on the maintenance schedule and feed `compact = true`
    * partitions to the matching compactor
    * ([[compactPartitionedSorted]] / `frameStoreCompact` /
    * `lshStoreCompact`).
    */
  def compactionPlan(spark: SparkSession, path: String, partCol: String,
                     keyCol: String, maxFiles: Int = 1): DataFrame = {
    val stats = fileStats(spark, path, keyCol)
      .withColumn(partCol,
        regexp_extract(col("file"), java.util.regex.Pattern.quote(partCol) +
          "=([^/]+)", 1))
      // a store that is not hive-partitioned by partCol (or a
      // misspelled column) extracts '' for every file; failing loudly
      // beats silently collapsing the table into one '' partition and
      // recommending a single bogus compaction
      .withColumn(partCol,
        when(col(partCol) === "",
          raise_error(concat(lit(s"compactionPlan: file "), col("file"),
            lit(s" does not match the $partCol=<value> hive layout"))))
          .otherwise(col(partCol)))
    planFromStats(stats, partCol, maxFiles)
  }

  /** [[compactionPlan]] for BUCKETED tables (`Bucketed.writeBucketed` /
    * the p50 posting store): the same two layout-health signals and
    * `compact` recommendation, grouped by the table's BUCKET id — the
    * store family the hive planner cannot see (bucket identity lives
    * in the file NAME, `part-…_<bucket>.c000…`, not in a directory).
    * Streamed lexical merges (`StreamingOps.lexicalMergeStaged`) append
    * one sliver file per bucket per batch, the measured 19× probe
    * pathology (BASELINE.md); this is the trigger that decides when to
    * pay [[Bucketed.compactBucketed]]. Same manifest-only cost: one
    * file-keyed aggregate, never a data rewrite.
    */
  def compactionPlanBucketed(spark: SparkSession, table: String,
                             keyCol: String, maxFiles: Int = 1): DataFrame = {
    val stats = spark.table(table)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
           min(col(keyCol)).as("lo"),
           max(col(keyCol)).as("hi"))
      .withColumn("bucket",
        regexp_extract(col("file"), "_(\\d+)\\.c000", 1))
      // same fail-loudly contract as the hive planner: a file that
      // does not carry the bucket suffix is not a bucketed layout
      .withColumn("bucket",
        when(col("bucket") === "",
          raise_error(concat(lit("compactionPlanBucketed: file "),
            col("file"), lit(" has no _<bucket>.c000 suffix"))))
          .otherwise(col("bucket").cast("int")))
    planFromStats(stats, "bucket", maxFiles)
  }

  /** The shared recommendation tail: per `partCol` value of a per-file
    * stats manifest, file count, rows, the overlap sweep (sort files
    * by `lo`; a file overlaps when its `lo` does not exceed the
    * running max of earlier files' `hi`) and the compact verdict.
    */
  private def planFromStats(stats: DataFrame, partCol: String,
                            maxFiles: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(partCol)).orderBy(col("lo"), col("file"))
      .rowsBetween(Window.unboundedPreceding, -1)
    stats
      .withColumn("__pmax", max(col("hi")).over(w))
      .withColumn("__ov",
        when(col("__pmax").isNotNull && col("lo") <= col("__pmax"), 1L)
          .otherwise(0L))
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("n_files"), sum(col("rows")).as("rows"),
           sum(col("__ov")).as("n_overlapping"))
      .withColumn("compact",
        col("n_files") > maxFiles || col("n_overlapping") > 0)
      .orderBy(col(partCol))
  }
}
