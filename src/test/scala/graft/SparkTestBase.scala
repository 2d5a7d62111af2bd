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
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
}
