package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Join, LeafNode, LogicalPlan, Repartition, RepartitionByExpression, Sort, Union, Window, Range => LogicalRange}

/** Plan-static parallelism decisions, shared by every operator family
  * that fronts a CPU-heavy per-row stage (similarity banding, shingle
  * expansion, payload encoding).
  *
  * The decision NEVER touches `.rdd`: under AQE that materializes the
  * physical plan and eagerly runs any upstream shuffle/broadcast stages
  * at operator-construction time, work that is then thrown away because
  * the operator re-executes from the logical plan (no cross-execution
  * exchange reuse). SimilaritySpec pins the zero-jobs-at-construction
  * property.
  */
private[graft] object Parallelism {

  /** Static split-count estimate from the optimized LOGICAL plan.
    *
    * Underestimates on purpose: a low estimate only adds a repartition
    * of data that is small anyway; an overestimate would leave a big
    * single-split input one-core. File-scan leaves estimate
    * `bytes / maxPartitionBytes`; Range/Repartition carry their split
    * counts statically.
    *
    * Shuffle-producing operators (Aggregate / Join / Deduplicate /
    * Sort / Window, and `repartition(expr)` with no explicit count) are
    * AQE-coalescible: partition coalescing (on by default) can collapse
    * their post-shuffle side to a handful of partitions whenever the
    * data came out SMALL, so the child's split count is not a lower
    * bound for them. But a constant 1 would be wrong in the other
    * direction — a corpus-sized join/aggregate output (high-cardinality
    * dedup of a 100 TB corpus) is NOT coalesced, is already
    * well-partitioned, and must pass through untouched. So they
    * estimate from plan statistics, mirroring AQE's own coalescing
    * rule: `ceil(stats.sizeInBytes / advisoryPartitionSize)` clamped to
    * `[1, numShufflePartitions]` — a small post-shuffle frame still
    * gets the cheap fan-out repartition, a big one passes through
    * (through the shuffle's own partition-count ceiling — see
    * [[coalescedShuffleEstimate]] for the join-stats correction and
    * the clamp rationale). Size-only stats of Aggregate/Sort/Window
    * are child-proportional, erring toward pass-through, never toward
    * re-shuffling big data. `coalesce(n)` caps at the child's estimate
    * (its actual partition count is `min(n, child)`).
    */
  def estimateSplits(plan: LogicalPlan, spark: SparkSession): BigInt =
    plan match {
      case r: LogicalRange =>
        BigInt(r.numSlices.getOrElse(spark.sparkContext.defaultParallelism))
      case r: Repartition if r.shuffle => BigInt(r.numPartitions)
      case r: Repartition => // coalesce: never raises parallelism
        BigInt(r.numPartitions).min(estimateSplits(r.child, spark))
      case r: RepartitionByExpression if r.optNumPartitions.isDefined =>
        BigInt(r.optNumPartitions.get)
      case p @ (_: Aggregate | _: Join | _: Deduplicate | _: Sort |
                _: Window | _: RepartitionByExpression) =>
        coalescedShuffleEstimate(p, spark)
      case u: Union => u.children.map(estimateSplits(_, spark)).sum
      case l: LeafNode =>
        val maxSplit = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
        ((l.stats.sizeInBytes + maxSplit - 1) / maxSplit).max(BigInt(1))
      case other if other.children.nonEmpty =>
        other.children.map(estimateSplits(_, spark)).max
      case _ => BigInt(1)
    }

  /** Post-AQE-coalescing split estimate for a shuffle-producing node:
    * how many advisory-sized partitions its estimated output fills,
    * never more than the shuffle produced. Pure plan metadata
    * (size-only stats fold leaf file sizes) — no job runs.
    *
    * Join stats need a correction: the size-only visitor estimates an
    * inner join as the PRODUCT of its children, so a tiny⋈tiny join
    * would be misclassified as huge and lose the fan-out repartition
    * the policy exists to provide. FK-shaped joins (the ones fed to
    * these operators) output on the order of their inputs, so the join
    * estimate is capped at the children's summed size — tiny inputs
    * stay tiny (fan-out), a 100 TB side keeps the estimate huge
    * (pass-through).
    *
    * The numShufflePartitions clamp is the true ceiling, not an
    * approximation: a shuffle produces at most that many partitions,
    * so when a session runs numShufflePartitions below the cluster's
    * parallelism, a corpus-sized shuffle output genuinely IS
    * under-partitioned for a CPU-heavy downstream stage and the
    * re-shuffle this triggers is deliberate, not gratuitous.
    */
  private def coalescedShuffleEstimate(p: LogicalPlan, spark: SparkSession): BigInt = {
    val advisory = BigInt(spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val bytes = p match {
      case j: Join => j.stats.sizeInBytes.min(j.children.map(_.stats.sizeInBytes).sum)
      case other   => other.stats.sizeInBytes
    }
    val byStats = (bytes + advisory - 1) / advisory
    byStats.max(BigInt(1)).min(BigInt(spark.sessionState.conf.numShufflePartitions))
  }

  /** Round-robin repartition ONLY when the input has fewer estimated
    * splits than the session's parallelism. The local test parquet is a
    * single row-group (1 split), so CPU-heavy downstream work would
    * otherwise run one-core; an already-parallel input — the 100 TB
    * case, where the scan yields thousands of splits — passes through
    * untouched, avoiding a gratuitous full shuffle.
    */
  def ensureParallel(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    if (estimateSplits(df.queryExecution.optimizedPlan, spark) < p)
      df.repartition(p)
    else df
  }
}
