package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table source/sink: the persistent form of co-located joins.
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key means every subsequent join/aggregation on that key runs
  * WITHOUT a shuffle — the exchange that dominates large-join cost at
  * 100 TB is paid once at write time and amortized over every read.
  * This is the Spark-native successor of the reference's static
  * range-partitioned chunk layout (`chunksinfo.txt`): partitioning
  * metadata lives in the catalog and the planner proves co-partitioning
  * instead of trusting a filename convention.
  *
  * BucketingSpec asserts the join plan of two co-bucketed tables
  * contains no shuffle exchange.
  */
object Bucketed {

  /** Persist `df` bucketed+sorted by `key` into `n` buckets as a
    * catalog table (parquet under the session warehouse dir).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, n: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(n, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket key. With equal
    * bucket counts the planner reads both sides pre-partitioned and
    * plans a sort-merge join with zero Exchange nodes.
    */
  def coBucketedJoin(spark: SparkSession, left: String, right: String,
                     key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Compact a bucketed table to ONE file per bucket. A write from an
    * m-task frame leaves up to m×n sliver files (each task writes every
    * bucket it holds rows for) and streamed ingest batches append more
    * — `tools.ScaleProbe` measured the per-file footer reads of a
    * 256-sliver posting store inflating probe bytes well past the
    * pruned-bucket fraction. Repartitioning to n partitions ON THE
    * BUCKET COLUMN aligns task boundaries with bucket boundaries (the
    * repartition hash and the bucket-layout hash are the same
    * murmur3-pmod), so the rewrite emits exactly one file per bucket —
    * and the bucket spec, and with it every pruning/co-location
    * property, is re-declared identically.
    *
    * Rewrite-then-swap, not in-place: Spark refuses to overwrite a
    * table from its own scan, and readers keep the old layout until
    * the swap. A crash between the drop and the rename leaves
    * `<table>__compact` complete on disk and `table` absent — re-run
    * recovery is one `ALTER TABLE RENAME`, and the source table is
    * untouched until its replacement is fully written.
    */
  /** The table's storage location from the catalog — where a bucketed
    * store's underscore-prefixed sidecars (the deferred-takedown
    * tombstone zone) live, invisible to table scans exactly like the
    * hive stores' `_model`/`_graft_tombstones` paths.
    *
    * CONTRACT: valid for MANAGED tables mutated through this module's
    * own devices — the catalog resolves a managed name to
    * `<warehouse>/<name>` and both swap devices here restore exactly
    * that name (and invalidate the entry at their DROP anyway, belt
    * and braces). A writer that dropped a table and recreated it at a
    * DIFFERENT location (an `path`-option external table, or a changed
    * database resolution mid-session) outside these devices must call
    * [[invalidateLocation]] or the stale mapping would serve the old
    * directory's tombstone zone.
    */
  def tableLocation(spark: SparkSession, table: String): String = {
    // key on the QUALIFIED lowercase identifier: a bare name resolves
    // against the session's current database, so two databases' tables
    // sharing a name must not share a cache slot (the zone would be
    // read under the wrong store), and the catalog itself is
    // case-insensitive
    val qualified =
      if (table.contains(".")) table.toLowerCase
      else s"${spark.catalog.currentDatabase.toLowerCase}.${table.toLowerCase}"
    locationCache.computeIfAbsent(
      spark.conf.get("spark.sql.warehouse.dir") + "#" + qualified,
      _ => describeLocation(spark, table))
  }

  /** Location lookups are cached per (warehouse, table): a managed
    * table's directory is `<warehouse>/<name>` and the rename-based
    * swap ([[compactBucketed]]'s DROP→RENAME) restores exactly that
    * name, so the mapping is stable for the table's whole life — while
    * the uncached form paid a `DESCRIBE FORMATTED` driver round-trip on
    * EVERY stored-probe read (three posting-probe families call this on
    * their hot path, where the eager path paid nothing).
    */
  private val locationCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Drop `table`'s cached location — called by both swap devices at
    * their DROP TABLE (the one point where the name→directory mapping
    * could in principle change hands), and the escape hatch of the
    * [[tableLocation]] contract for external writers that recreate a
    * same-named table at a different location.
    */
  def invalidateLocation(spark: SparkSession, table: String): Unit = {
    val qualified =
      if (table.contains(".")) table.toLowerCase
      else s"${spark.catalog.currentDatabase.toLowerCase}.${table.toLowerCase}"
    locationCache.remove(
      spark.conf.get("spark.sql.warehouse.dir") + "#" + qualified)
  }

  private def describeLocation(spark: SparkSession, table: String): String = {
    import org.apache.spark.sql.functions.col
    spark.sql(s"DESCRIBE FORMATTED $table")
      .filter(col("col_name") === "Location").head().getString(1)
  }

  /** TOMBSTONE-AWARE: a compaction is exactly when deferred takedowns
    * ([[Maintenance.tombstoneAppend]] into the table directory's zone)
    * get applied physically — the rewrite anti-joins the queued ids
    * away ([[Maintenance.minusTombstones]]; no zone → passthrough), and
    * since the replacement is a fresh table directory the zone retires
    * with the old copy at the DROP. Leaving the queued rows in would
    * silently resurrect previously-deferred takedowns the moment the
    * swap deleted their zone. Mutations (appends, takedowns,
    * compactions) serialize through the one maintenance scheduler, so
    * no tombstone lands between the rewrite's read and the DROP.
    */
  def compactBucketed(spark: SparkSession, table: String, key: String,
                      n: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val tmp = s"${table}__compact"
    // heal a PREVIOUS compaction's crashed swap before dropping the tmp
    // table: in the DROP→RENAME crash window the live table is gone and
    // `__compact` is the ONLY surviving copy — deleting it here would be
    // permanent data loss, not cleanup
    recoverBucketedSwap(spark, table)
    require(spark.catalog.tableExists(table),
      s"compactBucketed: $table does not exist (and no crashed swap to heal)")
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    writeBucketed(
      Maintenance.minusTombstones(spark, tableLocation(spark, table),
          spark.table(table))
        .repartition(n, col(key)), tmp, key, n)
    graft.CrashPoints.hit("bucketedSwap.staged")
    spark.sql(s"DROP TABLE $table")
    invalidateLocation(spark, table)
    graft.CrashPoints.hit("bucketedSwap.dropped")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** REMOVE rows from a bucketed table by id — the takedown rewrite of
    * the term-bucketed posting store: a document's posting rows scatter
    * across every term bucket (bucket identity is the TERM, not the
    * doc), so unlike the doc-bucketed/cell-partitioned stores there is
    * no pruned form — this is a full staged rewrite with the retracted
    * ids anti-joined away, re-declaring the bucket spec (and with it
    * every pruning/co-location property) and landing one file per
    * bucket ([[compactBucketed]]'s alignment device, so a retraction
    * doubles as a compaction). Same DROP→RENAME swap and
    * [[recoverBucketedSwap]]-healed crash window as the compactor;
    * deployments batch takedowns for exactly this reason. Retraction
    * sets are takedown-batch-sized by contract, so the id frame
    * broadcasts.
    */
  def removeBucketedRows(spark: SparkSession, table: String, key: String,
                         n: Int, removeIds: DataFrame,
                         idCol: String): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val tmp = s"${table}__compact"
    recoverBucketedSwap(spark, table)
    require(spark.catalog.tableExists(table),
      s"removeBucketedRows: $table does not exist (and no crashed swap to heal)")
    // the bucket spec is load-bearing (every pruning/co-location
    // property keys on it) and the catalog already records it — a
    // caller restating the wrong count must fail loudly, not silently
    // re-bucket the live store under later readers
    val catalogN = spark.sql(s"DESCRIBE FORMATTED $table")
      .filter(col("col_name") === "Num Buckets")
      .collect().headOption.map(_.getString(1).trim.toInt)
    require(catalogN.contains(n),
      s"removeBucketedRows: $table is bucketed into ${catalogN.orNull}, " +
        s"caller said $n — refusing to rewrite with a different spec")
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    // also apply any PENDING deferred tombstones (the
    // removePartitionedRows discipline): the DROP below retires the
    // zone with the old table directory, so leaving their rows in the
    // rewrite would silently resurrect previously-deferred takedowns
    writeBucketed(
      Maintenance.minusTombstones(spark, tableLocation(spark, table),
          spark.table(table))
        .join(broadcast(removeIds.select(col(idCol)).distinct()),
          Seq(idCol), "left_anti")
        .repartition(n, col(key)),
      tmp, key, n)
    graft.CrashPoints.hit("bucketedSwap.staged")
    spark.sql(s"DROP TABLE $table")
    invalidateLocation(spark, table)
    graft.CrashPoints.hit("bucketedSwap.dropped")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** Heal the DROP→RENAME window of [[compactBucketed]]: a crash
    * between the two statements leaves `table` absent with its COMPLETE
    * replacement still registered as `table__compact` (saveAsTable only
    * registers the tmp table after its write commits, so an existing
    * tmp is never partial when the live table is gone) — finishing the
    * rename restores the store. Called by [[compactIfDueBucketed]], the
    * streamed lexical merge, and [[compactBucketed]] itself on entry,
    * so a crashed compaction can never wedge the pipeline behind a
    * missing table — or let a direct re-compaction DROP the sole
    * surviving copy.
    */
  def recoverBucketedSwap(spark: SparkSession, table: String): Boolean = {
    val tmp = s"${table}__compact"
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp)) {
      spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
      true
    } else false
  }

  /** The bucketed twin of the hive-store compaction trigger
    * (`StreamingOps.compactIfDue`): when any BUCKET of the table holds
    * more than `maxFiles` data files, pay [[compactBucketed]]. The
    * check is a catalog lookup plus one directory listing — bucket
    * identity lives in the file NAME (`…_<bucket>.c000…`), so file
    * counts per bucket come straight off the listing, no data read and
    * no stats pass (`Maintenance.compactionPlanBucketed` stays the
    * scheduled-audit tool that also measures key-range overlap). This
    * is the trigger for the BASELINE-measured 19× sliver pathology of
    * the streamed posting store.
    */
  /** `maxTombstoneFiles` is the DEFERRED-takedown half of the trigger
    * (the `StreamingOps.compactIfDue` twin): each
    * [[Maintenance.tombstoneAppend]] lands at most one file in the
    * table directory's zone, so the zone's FILE count bounds the
    * takedowns queued since the last compaction — past the bound the
    * compaction (tombstone-aware since [[compactBucketed]] routes
    * through `minusTombstones`; the zone retires with the old table
    * dir) is due even when no bucket has accumulated slivers, keeping
    * the readers' broadcast anti-join tax bounded. Listing-only, like
    * the sliver check; `maxFiles <= 0` disables BOTH triggers.
    */
  def compactIfDueBucketed(spark: SparkSession, table: String, key: String,
                           n: Int, maxFiles: Int,
                           maxTombstoneFiles: Int = 16): Boolean = {
    // heal first, even when the trigger is disabled: a PREVIOUS run's
    // crashed swap must not wedge this one behind a missing table
    recoverBucketedSwap(spark, table)
    if (maxFiles <= 0) return false
    val loc = tableLocation(spark, table)
    val root = new org.apache.hadoop.fs.Path(loc)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    val zone = new org.apache.hadoop.fs.Path(s"$loc/_graft_tombstones")
    val zoneDue = maxTombstoneFiles > 0 && fs.exists(zone) &&
      fs.listStatus(zone)
        .count(_.getPath.getName.endsWith(".parquet")) > maxTombstoneFiles
    val bucketOf = "_(\\d+)\\.c000".r
    val counts = fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      // data files only — the local FS keeps .crc sidecars whose names
      // also carry the bucket suffix and would double every count
      .filter(n => !n.startsWith(".") && n.endsWith(".parquet"))
      .flatMap(n => bucketOf.findFirstMatchIn(n).map(_.group(1)))
      .groupBy(identity).view.mapValues(_.size)
    if (!zoneDue && !counts.exists(_._2 > maxFiles)) return false
    compactBucketed(spark, table, key, n)
    true
  }
}
