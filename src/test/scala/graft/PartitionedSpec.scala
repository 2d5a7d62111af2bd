package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Partitioned

class PartitionedSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("day-partition filter prunes non-matching directories before read") {
    val rows = for (d <- 1 to 5; i <- 1 to 10) yield
      (d * 100L + i, Timestamp.valueOf(f"2024-03-0$d 12:00:$i%02d"), i.toLong)
    val df = rows.toDF("event_id", "ts", "user_id")
    val path = Files.createTempDirectory("events_part").toString
    Partitioned.writeEventsByDay(df, path)

    val pruned = Partitioned.readDays(spark, path, "2024-03-02", "2024-03-03")
    val qe = pruned.queryExecution
    assert(qe.executedPlan.executeCollect().length === 20)
    // pruning happens at file-listing time: the executed scan read
    // exactly the files under the two matching day directories
    val scan = qe.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val expectedFiles = Seq("2024-03-02", "2024-03-03").map { d =>
      new java.io.File(s"$path/day=$d").listFiles.count(_.getName.endsWith(".parquet"))
    }.sum
    assert(expectedFiles > 0)
    assert(scan.metrics("numFiles").value === expectedFiles)
    assert(qe.executedPlan.toString.contains("PartitionFilters"))
  }
}
