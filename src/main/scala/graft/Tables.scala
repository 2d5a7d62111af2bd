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
  /** events.ts has shipped as two parquet generations: TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects — read as raw nanos via the
    * legacy conf and floor-truncate to micros, same truncation DuckDB
    * applies casting TIMESTAMP_NS to TIMESTAMP) and plain TIMESTAMP(MICROS)
    * without UTC adjustment (arrives as TIMESTAMP_NTZ — cast to the session
    * TimestampType; sessions run UTC, so wall-clock instants are unchanged).
    * Dispatch on the READ schema so both generations yield one canonical
    * microsecond TimestampType and every downstream oracle lines up.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case _                => col("ts")
    }
    raw.withColumn("ts", ts)
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
