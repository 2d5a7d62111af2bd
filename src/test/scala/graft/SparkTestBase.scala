package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (spinning one per suite
  * costs ~5s each; state is session-scoped and tests only read).
  */
trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.session
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession.builder()
    // local[4, 2]: 4 task slots, 2 task attempts — retries on, so
    // FailureRecoverySpec can prove lineage recompute (the intentional
    // divergence from the reference's lossy failure handling, SURVEY Q6).
    .master("local[4, 2]")
    .appName("graft-test")
    // keep bucketed scans (and with them bucket PRUNING) even when no
    // downstream operator wants the bucket partitioning — Spark's
    // DisableUnnecessaryBucketedScan rule only weighs shuffle savings,
    // not the pruning a selective bucket-key predicate (phrase/BM25
    // term lookups) depends on
    .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
}
