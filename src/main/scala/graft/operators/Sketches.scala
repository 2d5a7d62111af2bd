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
}
