package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-supplied parquet tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory (e.g. `/root/testdata/sf0.01`)
  * so the same code runs at any SF. At cluster scale these would be catalog
  * tables; here they are bare parquet paths. Column pruning + predicate
  * pushdown reach the parquet scan because every reader below is a plain
  * `spark.read.parquet` DataFrame — no RDD detours.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read it as raw nanos (legacy conf) and truncate to a proper
    * microsecond TimestampType — same floor-truncation DuckDB applies when
    * casting TIMESTAMP_NS to TIMESTAMP, so oracles line up exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Every table, as (name → loader); `events` goes through its
    * nanos-safe reader, so this is the ONLY correct way to enumerate.
    */
  val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region" -> (region _), "nation" -> (nation _), "customer" -> (customer _),
    "supplier" -> (supplier _), "part" -> (part _), "orders" -> (orders _),
    "lineitem" -> (lineitem _), "events" -> (events _),
    "documents" -> (documents _), "embeddings" -> (embeddings _))

  def names: Seq[String] = loaders.keys.toSeq.sorted
}
