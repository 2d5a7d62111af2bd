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
}
