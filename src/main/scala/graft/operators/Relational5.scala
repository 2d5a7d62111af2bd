package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational surface, batch 5: time-series resample/gap-fill with
  * forward fill, and ordered funnel analysis over the event stream.
  */
object Relational5 {

  /** Hourly resample of the event stream per type, with gap filling:
    * missing hours appear with n=0 and the hourly mean forward-filled
    * from the last observed hour. The spine (all hours × all types) is
    * generated, not scanned — `sequence()` over the global [min,max]
    * hour exploded against the distinct-type dim, then left-joined to
    * the per-(type,hour) aggregate. Scale shape: the raw scan reduces
    * FIRST (one shuffle to (type,hour) partials); the spine join and
    * the forward-fill window run on post-aggregate data (hours×types
    * rows, ~10⁻⁴ of input), so the per-type window partition is cheap
    * even though a type is a coarse key.
    */
  def q45GapFill(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    // Quantize per row (floor(v*1e4): pure IEEE mult+floor, identical
    // on any engine), sum exact integers, divide once: the filled mean
    // is bit-deterministic — no double round()/decimal cast, whose
    // half-boundary behavior is representation-dependent.
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"),
           sum(floor(col("value") * 10000).cast("long")).as("sv"))
      .withColumn("avg_v",
        floor(col("sv").cast("double") / col("n")).cast("double") / 10000.0)
    val bounds = ev.agg(
      date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
      .crossJoin(broadcast(ev.select(col("event_type")).distinct()))
    val ff = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("avg_v"), ignoreNulls = true).over(ff).as("ff_avg"))
      .orderBy(col("event_type"), col("h"))
  }

  val q45Oracle: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |         count(*) AS n,
      |         floor(CAST(CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
      |                    AS DOUBLE) / count(*)) / 10000 AS avg_v
      |  FROM events GROUP BY 1, 2),
      |bounds AS (
      |  SELECT date_trunc('hour', min(ts)) AS lo,
      |         date_trunc('hour', max(ts)) AS hi FROM events),
      |spine AS (
      |  SELECT t.event_type, g.h
      |  FROM (SELECT DISTINCT event_type FROM events) t
      |  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      |              FROM bounds) g)
      |SELECT s.event_type, s.h,
      |       coalesce(n, 0) AS n,
      |       last_value(avg_v IGNORE NULLS) OVER (
      |         PARTITION BY s.event_type ORDER BY s.h
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_avg
      |FROM spine s LEFT JOIN hourly USING (event_type, h)
      |ORDER BY s.event_type, s.h""".stripMargin

  /** Ordered funnel: users who did view → click → purchase in strict
    * timestamp order, with per-stage reach counts and median
    * view→purchase latency for full converters. Each stage is a
    * per-user MIN over a filtered scan joined to the previous stage's
    * frontier — three shuffles on user_id (AQE reuses the exchange),
    * no per-user event-list materialization, so a power user with 10⁶
    * events costs the same as one with 10.
    */
  def q46Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("ts")).as("t3"))
    s1.join(s2.select(col("user_id").as("u2")), col("user_id") === col("u2"), "left")
      .join(s3.select(col("user_id").as("u3"), col("t1").as("tt1"), col("t3")),
        col("user_id") === col("u3"), "left")
      .agg(
        count(col("user_id")).as("n_view"),
        count(col("u2")).as("n_click"),
        count(col("u3")).as("n_purchase"),
        round(percentile(
          unix_timestamp(col("t3")) - unix_timestamp(col("tt1")),
          lit(0.5)).cast("double"), 0).as("median_latency_s"))
  }

  val q46Oracle: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, s1.t1, min(e.ts) AS t2
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1
      |  GROUP BY 1, 2),
      |s3 AS (
      |  SELECT e.user_id, s2.t1, min(e.ts) AS t3
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |  GROUP BY 1, 2)
      |SELECT count(s1.user_id) AS n_view,
      |       count(s2.user_id) AS n_click,
      |       count(s3.user_id) AS n_purchase,
      |       round(CAST(median(CAST(floor(epoch(s3.t3)) AS BIGINT)
      |                         - CAST(floor(epoch(s3.t1)) AS BIGINT)) AS DOUBLE), 0)
      |         AS median_latency_s
      |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_gapfill" -> (q45GapFill _),
    "q46_funnel"  -> (q46Funnel _),
  )

  val oracles: Map[String, String] = Map(
    "q45_gapfill" -> q45Oracle,
    "q46_funnel"  -> q46Oracle,
  )
}
