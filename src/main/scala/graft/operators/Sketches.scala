package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sketch-backed approximate aggregates — the 100 TB answer when exact
  * distinct counts / percentiles would shuffle every value: HLL++ and
  * t-digest-style sketches are FIXED-SIZE, merge associatively across
  * partitions (map-side partial = one sketch per partition, reduce =
  * sketch merge), and trade bounded relative error for a shuffle that
  * no longer scales with cardinality.
  *
  * Spark's implementations are deterministic for a given input, but
  * algorithm-specific — DuckDB's approx functions estimate differently,
  * so these register as rows-only queries (no SQL oracle); SketchesSpec
  * pins the error envelope against exact twins instead.
  */
object Sketches {

  /** ONE sketch precision for every HLL surface of the engine — batch
    * (q61, [[slidingDistinctHll]]) and streaming
    * (`StreamingOps.slidingUserActivity`) share it, so a dashboard
    * mixing batch backfill and streaming tail reads consistent
    * numbers. 2^12 registers = published standard error
    * 1.04/sqrt(2^12) ~ 1.6 %.
    *
    * Parity caveat, measured: estimates from the two paths are NOT
    * bit-equal on identical data — DataSketches HLL is path-dependent
    * below the error floor (the hourly partials union exact sparse
    * coupons, a direct whole-window sketch densifies earlier), ~1.3 %
    * apart on a 900-user test set. SketchesSpec pins agreement within
    * 2x the configured standard error, which fails loudly if either
    * path stops using this constant.
    */
  val LgConfigK = 12

  /** Per-group approximate distinct counts + approximate percentile
    * next to their exact twins (the exact columns double as the spec's
    * ground truth and would be the first thing dropped at real scale).
    */
  def approxStats(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("apx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(5000)).as("apx_median"),
        percentile(col("l_extendedprice"), lit(0.5)).as("exact_median"))
      .orderBy(col("l_returnflag"))

  /** q62: approximate heavy hitters over the corpus vocabulary — the
    * SpaceSaving sketch ([[org.apache.spark.sql.graftext.HeavyHitters]])
    * with a 64-counter budget, cut to the top 15 terms with their
    * (cnt, err) bars. The exact twin (p22/q36 shapes) must first
    * aggregate one row per DISTINCT term; the sketch's buffer is
    * capacity-bounded BEFORE the shuffle, so at 100 TB the reduce side
    * sees capacity × partitions counters regardless of vocabulary
    * size. Rows-only (order-sensitive sketch, q61 precedent);
    * SketchesSpec pins the bounds against the exact counts and the
    * top-rank set across repartitionings.
    */
  def heavyHitters(s: SparkSession, d: String): DataFrame = {
    val hh = org.apache.spark.sql.graftext.HeavyHitters.heavyHitters(
      col("term"), capacity = 64)
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
      .agg(hh.as("sketch"))
      .select(posexplode(col("sketch")).as(Seq("rank", "hit")))
      .filter(col("rank") < 15)
      .select(col("rank"), col("hit.term").as("term"),
              col("hit.cnt").as("cnt"), col("hit.err").as("err"))
      .orderBy(col("rank"))
  }

  /** Sliding-window distinct users by HLL sketch — the corpus-scale
    * path q58's scaladoc promises (Relational7.scala): exact sliding
    * distinct is not decomposable, so the exact form expands every
    * EVENT to its <=3 window positions and shuffles 3x the stream.
    * HLL sketches DO merge, which restructures the whole computation:
    *
    *  1. one hash shuffle of the raw stream, by hour — with map-side
    *     partials, each (partition, hour) contributes one FIXED-SIZE
    *     (2^lgK bytes) sketch, so reduce-side volume scales with
    *     partitions x hours, not events;
    *  2. the x3 window expansion then runs on the HOURLY table (one
    *     row per clock hour — thousands of rows for years of data) and
    *     the per-window union merges 3 sketches per row.
    *
    * At 100 TB the exact form shuffles 3x10^12 rows; this shuffles the
    * stream once and then works on data whose size is calendar-bounded.
    * lgConfigK = 12 gives a published standard error of 1.04/sqrt(2^12)
    * ~ 1.6%; SketchesSpec pins |approx-exact|/exact < 5% (~3 sigma)
    * against the exact q58 twin, and that n_events (decomposable, so
    * carried exactly) matches to the row. Rows-only: DataSketches HLL
    * estimates are deterministic but algorithm-specific — DuckDB's
    * approx_count_distinct estimates differently, so no SQL oracle.
    */
  def slidingDistinctHll(s: SparkSession, d: String): DataFrame =
    slidingDistinctHllOf(events(s, d))

  /** Frame-parameterized core of [[slidingDistinctHll]] — also driven
    * by the batch/streaming parity spec against
    * `StreamingOps.slidingUserActivity` on identical data.
    */
  def slidingDistinctHllOf(ev: DataFrame): DataFrame = {
    val hourly = ev
      .select(expr("unix_micros(ts) DIV 3600000000").as("h"), col("user_id"))
      .groupBy(col("h"))
      .agg(hll_sketch_agg(col("user_id"), lit(LgConfigK)).as("sk"),
           count(lit(1)).as("n_events"))
    hourly
      .select(explode(sequence(col("h"), col("h") + 2)).as("eh"),
              col("sk"), col("n_events"))
      .groupBy(col("eh"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_users_approx"),
           sum(col("n_events")).as("n_events"))
      .orderBy(col("eh"))
  }
}
