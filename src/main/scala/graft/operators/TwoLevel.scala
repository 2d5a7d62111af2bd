package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level global ordering primitives: global row_number / cumulative
  * sum over (shardCol, tieCols...) WITHOUT a single-partition window.
  *
  * Scheme: shard = shardCol DIV W, with W derived from max(shardCol) so
  * the shard count stays ~`shards` at any data size. The shard key is
  * monotone in the sort order and equal keys never straddle shards, so
  * per-shard windows (parallel, one per shard) plus a broadcast
  * shard-offset table (whose own window runs over <= shards+1 rows —
  * data-size independent) compose to EXACTLY the global window's
  * answer. Identity with the naive formulation and invariance to the
  * shuffle partition count are pinned by Batch7Spec / InvarianceSpec.
  *
  * Requires shardCol non-negative integral (ids, counts, quantized
  * scores). Cost: one broadcast scalar pass + one hash shuffle on the
  * shard key; nothing global anywhere.
  */
object TwoLevel {

  private def sharded(df: DataFrame, shardCol: String, shards: Int)
    : DataFrame = {
    val stats = df.agg((expr(s"max($shardCol) DIV $shards") + 1).as("__w"))
    // Precondition enforced IN the plan, not silently: a null or
    // negative shard key would otherwise vanish through the offsets
    // join (null never equi-joins) or zero out W — raise_error makes
    // the violation fail the job loudly instead of dropping rows.
    df.crossJoin(broadcast(stats))
      .withColumn("__shard",
        when(col(shardCol).isNull || col(shardCol) < 0,
          raise_error(lit(s"TwoLevel: $shardCol must be non-negative and " +
            "non-null")).cast("long"))
        .otherwise(expr(s"$shardCol DIV __w")))
      .drop("__w")
  }

  private def orderCols(shardCol: String, tieCols: Seq[String]): Seq[Column] =
    (shardCol +: tieCols).map(col)

  /** Append `outCol` = global row_number over (shardCol, tieCols...). */
  def withGlobalRank(df: DataFrame, shardCol: String, tieCols: Seq[String],
                     outCol: String, shards: Int = 96): DataFrame = {
    val inShard = Window.partitionBy(col("__shard"))
      .orderBy(orderCols(shardCol, tieCols): _*)
    val prior = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = sharded(df, shardCol, shards)
      .withColumn("__rn", row_number().over(inShard))
    val offsets = local.groupBy(col("__shard"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(prior), lit(0L)))
      .select(col("__shard"), col("__off"))
    local.join(broadcast(offsets), "__shard")
      .withColumn(outCol, col("__off") + col("__rn"))
      .drop("__shard", "__rn")
  }

  /** Append `outCol` = global running sum of `valueCol` (current row
    * inclusive) over (shardCol, tieCols...).
    */
  def withGlobalCumsum(df: DataFrame, shardCol: String, tieCols: Seq[String],
                       valueCol: String, outCol: String,
                       shards: Int = 96): DataFrame = {
    val inShard = Window.partitionBy(col("__shard"))
      .orderBy(orderCols(shardCol, tieCols): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prior = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = sharded(df, shardCol, shards)
      .withColumn("__cum", sum(col(valueCol).cast("long")).over(inShard))
    val offsets = local.groupBy(col("__shard"))
      .agg(sum(col(valueCol).cast("long")).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(prior), lit(0L)))
      .select(col("__shard"), col("__off"))
    local.join(broadcast(offsets), "__shard")
      .withColumn(outCol, col("__off") + col("__cum"))
      .drop("__shard", "__cum")
  }
}
