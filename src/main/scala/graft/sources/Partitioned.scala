package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-partitioned parquet layout — the engine's general-purpose form
  * of the reference's range-partitioned chunk directory (SURVEY.md §1.2,
  * `chunksinfo.txt`): partition values live in directory names, Catalyst
  * prunes directories from the listing before any byte is read
  * (`PruneFileSourcePartitions`), and within a partition files split
  * across executors. At 100 TB, a day-partitioned event log makes every
  * time-bounded query scan only its days.
  */
object Partitioned {

  /** Write events day-partitioned (`day=YYYY-MM-DD/` directories). */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("day", to_date(col("ts")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("day")
      .parquet(path)

  /** Read with a partition filter — prunes at file-listing time. */
  def readDays(spark: SparkSession, path: String, from: String, to: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("day") >= from && col("day") <= to)
}
