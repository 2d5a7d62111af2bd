package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level global ordering primitives: global row_number / cumulative
  * sum over a total order WITHOUT a single-partition window.
  *
  * Scheme: a bounded-cardinality integral shard key that is monotone in
  * the sort order (equal order keys never straddling shards) splits the
  * global window into per-shard windows (parallel, one per shard) plus a
  * broadcast shard-offset table whose own window runs over <= shards
  * rows — data-size independent. The composition is EXACTLY the global
  * window's answer. Identity with the naive formulation and invariance
  * to the shuffle partition count are pinned by Batch7Spec /
  * InvarianceSpec.
  *
  * Two API levels:
  *  - the string-column forms ([[withGlobalRank]] / [[withGlobalCumsum]])
  *    derive the shard key themselves (`shardCol DIV W`, W from
  *    max(shardCol)) and enforce their non-negative/non-null
  *    precondition in-plan via raise_error;
  *  - the expert `*By` forms take an arbitrary caller-built shard
  *    Column and sort direction — the monotonicity contract is then the
  *    caller's to uphold (see [[withGlobalCumsumBy]]).
  *
  * Cost either way: one broadcast scalar pass (string forms only) + one
  * hash shuffle on the shard key; nothing global anywhere.
  */
object TwoLevel {

  /** Internal scratch columns added to the caller's frame. A caller
    * column with one of these names would be silently replaced by
    * `withColumn` (corrupting both the data and the shard join), so
    * every entry point rejects such inputs loudly instead.
    */
  private val ReservedCols = Seq("__shard", "__loc", "__w", "__off", "__t")

  private def requireNoReserved(df: DataFrame): DataFrame = {
    val clash = df.columns.filter(ReservedCols.contains)
    require(clash.isEmpty,
      s"TwoLevel: input carries reserved internal column(s) " +
        s"${clash.mkString(", ")} — rename them before calling " +
        s"(reserved: ${ReservedCols.mkString(", ")})")
    df
  }

  private def sharded(df0: DataFrame, shardCol: String, shards: Int)
    : DataFrame = {
    val df = requireNoReserved(df0)
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

  /** Guard an expert-supplied shard key: a null would silently drop the
    * row through the offsets equi-join, so fail the job instead.
    */
  private def guardedShard(shardExpr: Column): Column =
    when(shardExpr.isNull,
      raise_error(lit("TwoLevel: shard expression must be non-null"))
        .cast("long"))
      .otherwise(shardExpr)

  /** Core: df already carries `__shard`; compose the per-shard window
    * with the broadcast offset table. `descending = true` accumulates
    * offsets from the HIGHEST shard down (for windows ordered
    * descending on the sharded quantity).
    */
  private def compose(local: DataFrame, perShard: Column, shardTotal: Column,
                      outCol: String, descending: Boolean): DataFrame = {
    val shardOrder = if (descending) col("__shard").desc else col("__shard").asc
    // single-partition window over <= shards rows — data-size independent
    val prior = Window.orderBy(shardOrder)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = local.withColumn("__loc", perShard)
    val offsets = withLocal.groupBy(col("__shard"))
      .agg(shardTotal.as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(prior), lit(0L)))
      .select(col("__shard"), col("__off"))
    withLocal.join(broadcast(offsets), "__shard")
      .withColumn(outCol, col("__off") + col("__loc"))
      .drop("__shard", "__loc")
  }

  private def orderCols(shardCol: String, tieCols: Seq[String]): Seq[Column] =
    (shardCol +: tieCols).map(col)

  /** Append `outCol` = global row_number over (shardCol, tieCols...). */
  def withGlobalRank(df: DataFrame, shardCol: String, tieCols: Seq[String],
                     outCol: String, shards: Int = 96): DataFrame = {
    val inShard = Window.partitionBy(col("__shard"))
      .orderBy(orderCols(shardCol, tieCols): _*)
    compose(sharded(df, shardCol, shards),
      perShard = row_number().over(inShard).cast("long"),
      shardTotal = count(lit(1)),
      outCol = outCol, descending = false)
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
    compose(sharded(df, shardCol, shards),
      perShard = sum(col(valueCol).cast("long")).over(inShard),
      shardTotal = sum(col(valueCol).cast("long")),
      outCol = outCol, descending = false)
  }

  /** Expert form: global row_number over an arbitrary `order`, sharded
    * by a caller-built key. Contract as in [[withGlobalCumsumBy]].
    */
  def withGlobalRankBy(df: DataFrame, shardExpr: Column, order: Seq[Column],
                       outCol: String, descending: Boolean = false)
    : DataFrame = {
    val inShard = Window.partitionBy(col("__shard")).orderBy(order: _*)
    compose(requireNoReserved(df).withColumn("__shard", guardedShard(shardExpr)),
      perShard = row_number().over(inShard).cast("long"),
      shardTotal = count(lit(1)),
      outCol = outCol, descending = descending)
  }

  /** Expert form: global running sum of `value` (current row inclusive)
    * over an arbitrary `order` (descending orders welcome), sharded by a
    * caller-built key.
    *
    * CONTRACT (caller's to uphold — it cannot be checked with one cheap
    * plan predicate): `shardExpr` must be integral, non-null, of bounded
    * cardinality (~shards values), MONOTONE along `order` — rows later
    * in the order never map to a shard that sorts earlier — with
    * `descending` saying which way shard ids run (`true` = the order's
    * first rows carry the HIGHEST shard ids), and rows with equal order
    * keys must map to the same shard. A violation silently mis-orders;
    * prefer the string-column forms when they fit (they enforce their
    * precondition in-plan). Null shard keys DO fail loudly.
    */
  def withGlobalCumsumBy(df: DataFrame, shardExpr: Column, order: Seq[Column],
                         value: Column, outCol: String,
                         descending: Boolean = false): DataFrame = {
    val inShard = Window.partitionBy(col("__shard")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    compose(requireNoReserved(df).withColumn("__shard", guardedShard(shardExpr)),
      perShard = sum(value.cast("long")).over(inShard),
      shardTotal = sum(value.cast("long")),
      outCol = outCol, descending = descending)
  }
}
