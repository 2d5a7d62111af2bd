package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.udf

/** O12 / quirk Q5: the reference sends `stop` to workers when a client
  * vanishes, but the worker never handles it — an abandoned scan runs
  * to completion and its verdict mutates freed state
  * (`/root/reference/server.go:95`, `slave.go:188` — only `abort` is
  * checked). The Spark mapping is job-group cancellation: tasks are
  * interrupted and the job ends promptly with a cancellation error.
  * This spec proves the mapping actually cancels a running scan.
  */
class CancellationSpec extends AnyFunSuite with SparkTestBase {

  test("cancelJobGroup stops an in-flight scan promptly") {
    val sc = spark.sparkContext
    // each row sleeps: without cancellation this action needs ~100 x
    // 200ms / 4 cores = 5+ seconds; the test asserts it dies far sooner.
    // (No driver-side latch in the closure — task closures are
    // serialized even in local mode, so the tasks would count down a
    // copy. Job start is observed via the status tracker instead.)
    val slow = udf((x: Long) => { Thread.sleep(200); x }).asNondeterministic()

    // The slow UDF sits BEFORE the repartition: under AQE this action
    // is several jobs (shuffle materialization, then the final agg),
    // and cancelJobGroup only kills ACTIVE jobs — with the sleep in the
    // post-shuffle stage a cancel could land in the gap after the fast
    // shuffle job finished and before the slow job was submitted,
    // cancelling nothing (observed as a rare full-suite flake). With
    // the sleep in the FIRST stage, whichever job the wait loop
    // observes is the slow one.
    val job = Future {
      sc.setJobGroup("graft-cancel-test", "cancellation spec",
        interruptOnCancel = true)
      try spark.range(100)
        .select(slow(org.apache.spark.sql.functions.col("id")).as("x"))
        .repartition(4)
        .agg(org.apache.spark.sql.functions.sum("x")).collect()
      finally sc.clearJobGroup()
    }

    // Wait for THIS group's job, not just any active job: suites share
    // one SparkSession and sbt may interleave them, so a concurrent
    // suite's job would otherwise satisfy the wait before ours is even
    // submitted — the cancel then fires into an empty group and the
    // scan completes normally (observed as a rare full-suite flake).
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    def groupJobs() = sc.statusTracker.getJobIdsForGroup("graft-cancel-test")
    while (groupJobs().isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(groupJobs().nonEmpty, "job never started")
    val t0 = System.nanoTime()
    sc.cancelJobGroup("graft-cancel-test")
    val err = intercept[Exception] { Await.result(job, 60.seconds) }
    val elapsed = (System.nanoTime() - t0) / 1e9
    val msg = Option(err.getMessage).getOrElse("") + err.getClass.getName
    assert(msg.toLowerCase.contains("cancel"),
      s"expected a cancellation error, got: $err")
    assert(elapsed < 30.0, s"cancellation took ${elapsed}s")
  }
}
