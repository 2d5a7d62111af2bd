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

  /** Write hive-partitioned by an arbitrary (already materialized)
    * column — the general form of [[writeEventsByDay]] used by index
    * layouts like the IVF cell store (`Similarity.ivfWrite`): one
    * directory per value, so any equi-predicate or equi-join on the
    * column prunes whole directories from the listing before a byte
    * is read.
    */
  def writeBy(df: DataFrame, path: String, column: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(column).parquet(path)

  /** Append into an existing hive-partitioned layout: new files land
    * inside the matching value directories, untouched partitions are
    * left as-is — the incremental-ingest form of [[writeBy]]. Small
    * appended files accumulate; compact with [[Maintenance]] when the
    * per-partition file count grows.
    *
    * Clusters by the partition column first (guide §6): a partitioned
    * write opens one parquet writer per (task × partition value), so an
    * un-clustered micro-batch append from an N-partition frame pays
    * N × |values| writer inits and litters the store with N × |values|
    * sliver files — which every later probe of the store then re-lists
    * and re-opens. One tiny shuffle per append keeps it at ≤|values|
    * files; the 100 TB case wants the same clustering (it is the
    * many-small-files fix, not a local-mode tweak).
    */
  def appendBy(df: DataFrame, path: String, column: String): Unit =
    df.repartition(col(column))
      .write.mode(SaveMode.Append).partitionBy(column).parquet(path)
}
