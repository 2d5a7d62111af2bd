package graft

import org.apache.spark.TaskContext
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The reference counts a dead worker's partition as a miss and can
  * answer `notfound` for a password that exists
  * (`/root/reference/server.go:331-358` — task dropped, never
  * rescheduled). This engine intentionally diverges: Spark reschedules
  * the failed task and recomputes its partition from lineage, so a
  * transient worker failure changes NOTHING about the answer. These
  * tests inject a first-attempt task failure and assert exact results
  * (the test session runs `local[4, 2]` so a second attempt exists).
  */
class FailureRecoverySpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // Fails the FIRST attempt of partition 0 in whatever stage evaluates
  // it; the retry (attemptNumber 1) passes. asNondeterministic keeps
  // the optimizer from collapsing or reordering the call.
  private def flaky = udf((x: Long) => {
    val tc = TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() == 0)
      throw new RuntimeException("injected worker failure")
    x
  }).asNondeterministic()

  test("aggregate survives an injected task failure with the exact answer") {
    val docs = Tables.documents(spark, dir)
    val expected = docs.agg(count(lit(1)), sum(col("doc_id"))).head()
    val got = docs.withColumn("doc_id", flaky(col("doc_id")))
      .agg(count(lit(1)), sum(col("doc_id"))).head()
    assert(got.getLong(0) === expected.getLong(0))
    assert(got.getLong(1) === expected.getLong(1))
  }

  test("iterative BFS survives an injected failure mid-loop with exact distances") {
    // The loop materializes each round via localCheckpoint; a task
    // failure inside a round must recompute from lineage, not corrupt
    // the visited set or drop a frontier layer. The flaky edge column
    // fails the first attempt of partition 0 of whatever stage first
    // evaluates the edge frame.
    val clean = operators.Relational8.incidentEdges(spark, dir)
    val expected = operators.Relational8
      .bfsDistances(clean, spark.range(1).select(lit(0L).as("node")), 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val flakyEdges = clean.withColumn("src", flaky(col("src")))
    val got = operators.Relational8
      .bfsDistances(flakyEdges, spark.range(1).select(lit(0L).as("node")), 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === expected,
      "a transient failure inside the BFS loop changed the distances")
  }

  test("existence query survives an injected failure (no false notfound)") {
    // The reference's exact failure mode: the scanned partition dies,
    // the verdict counter treats it as a miss. Here the needle's row is
    // flaky-scanned and must still be found.
    val docs = Tables.documents(spark, dir)
      .withColumn("doc_id", flaky(col("doc_id")))
    val needle = Tables.documents(spark, dir)
      .orderBy(col("doc_id")).select(col("text")).head().getString(0)
    assert(!docs.filter(col("text") === needle).isEmpty,
      "transient task failure produced a false notfound — reference quirk Q6")
  }
}
