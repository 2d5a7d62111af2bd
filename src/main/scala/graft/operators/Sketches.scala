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

  /** Sub-bucket bits of the q67 log-histogram: 5 bits = 32 sub-buckets
    * per octave, worst-case relative error 2⁻⁶ ≈ 1.6 % at the bucket's
    * lower bound. Values below 2⁶ get exact unit buckets.
    */
  private val QSubBits = 5
  private val QPcts = Seq(50, 95, 99)

  /** q67: DDSketch-style log-histogram quantiles — per group, the
    * {50,95,99}th percentiles of `l_extendedprice` estimated from a
    * relative-error-bounded logarithmic histogram, with the WHOLE
    * sketch oracle-checkable: unlike HLL/SpaceSaving (q61/q62, order-
    * sensitive → rows-only), this sketch's state is a bucket→count
    * vector — a pure set aggregate, identical under any update or
    * merge order — and the bucket function is pure integer bit
    * arithmetic (cents → binary length → top sub-bits; no log() whose
    * last ulp could straddle a boundary between engines), so the
    * estimates hash-match DuckDB exactly.
    *
    * This is THE percentile plan that survives 100 TB: the exact form
    * must globally sort (or at least shuffle one row per value) per
    * group, while the histogram folds map-side into ≤ 64·2⁵ counters
    * per group regardless of row count, merges by addition, and the
    * quantile extraction is a window over the model-sized histogram.
    * Error contract: every estimate is the true value's bucket lower
    * bound, so est ≤ truth < est·(1+2⁻⁵) — SketchesSpec pins the
    * envelope against the exact percentile twin.
    */
  def quantileSketch(s: SparkSession, d: String): DataFrame =
    quantileSketchOf(
      lineitem(s, d).select(col("l_returnflag").as("flag"),
        floor(col("l_extendedprice") * 100).cast("long").as("c")),
      QPcts)

  /** Library entry: per-`flag` log-histogram percentiles of positive
    * long `c`. `pcts` are integer percents.
    */
  def quantileSketchOf(vals: DataFrame, pcts: Seq[Int]): DataFrame = {
    val s = vals.sparkSession
    import s.implicits._
    val nSub = 1 << QSubBits
    val lb = when(col("c") < nSub * 2, col("c"))
      .otherwise(expr(
        s"shiftleft($nSub + (shiftright(c, length(bin(c)) - ${QSubBits + 1}) " +
        s"& ${nSub - 1}), length(bin(c)) - ${QSubBits + 1})"))
    val hist = vals.select(col("flag"), lb.as("lb"))
      .groupBy(col("flag"), col("lb")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("flag")).orderBy(col("lb"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("flag"))))
    cum.crossJoin(pcts.toDF("pct"))
      .filter(col("cum") >= expr("(n * pct + 99) DIV 100"))
      .groupBy(col("flag"), col("pct"))
      .agg(min(col("lb")).as("est_cents"))
      .select(col("flag"), col("pct").cast("int").as("pct"), col("est_cents"))
      .orderBy(col("flag"), col("pct"))
  }

  val quantileSketchOracle: String = {
    val nSub = 32; val sb = 6
    s"""WITH v AS (SELECT l_returnflag AS flag,
       |                  CAST(floor(l_extendedprice * 100) AS BIGINT) AS c
       |           FROM lineitem),
       |b AS (SELECT flag,
       |             CASE WHEN c < ${nSub * 2} THEN c
       |                  ELSE (($nSub + ((c >> (length(bin(c)) - $sb))
       |                                  & ${nSub - 1}))
       |                        << (length(bin(c)) - $sb)) END AS lb
       |      FROM v),
       |h AS (SELECT flag, lb, count(*) AS cnt FROM b GROUP BY flag, lb),
       |cum AS (SELECT flag, lb, cnt,
       |               sum(cnt) OVER (PARTITION BY flag ORDER BY lb) AS cum,
       |               sum(cnt) OVER (PARTITION BY flag) AS n
       |        FROM h),
       |p AS (SELECT unnest([${QPcts.mkString(", ")}]) AS pct)
       |SELECT flag, CAST(pct AS INTEGER) AS pct,
       |       CAST(min(lb) AS BIGINT) AS est_cents
       |FROM cum CROSS JOIN p
       |WHERE cum >= (n * pct + 99) // 100
       |GROUP BY flag, pct
       |ORDER BY flag, pct""".stripMargin
  }
}
