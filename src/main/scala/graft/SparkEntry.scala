package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-style pricing summary: scan→filter→partial/final agg→sort,
    * the engine's bread-and-butter pipeline.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Relational2.queries ++
      operators.Relational3.queries ++ operators.Relational4.queries ++
      operators.Relational5.queries ++ operators.Relational6.queries ++
      operators.Relational7.queries ++ operators.Relational8.queries ++
      operators.PipelineQueries.queries ++ operators.Pipeline2.queries ++
      operators.Pipeline3.queries ++ operators.Pipeline4.queries ++
      operators.Pipeline5.queries ++ operators.Pipeline6.queries ++
      operators.Pipeline7.queries ++ operators.Pipeline8.queries ++
      operators.Pipeline9.queries ++ operators.Pipeline10.queries ++
      operators.Pipeline11.queries ++ operators.Pipeline12.queries ++
      operators.Pipeline13.queries ++ operators.Pipeline14.queries ++
      operators.Pipeline15.queries ++ operators.Pipeline16.queries ++
      operators.Pipeline17.queries ++ operators.Pipeline18.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.Relational2.oracles ++
      operators.Relational3.oracles ++ operators.Relational4.oracles ++
      operators.Relational5.oracles ++ operators.Relational6.oracles ++
      operators.Relational7.oracles ++ operators.Relational8.oracles ++
      operators.PipelineQueries.oracles ++ operators.Pipeline2.oracles ++
      operators.Pipeline3.oracles ++ operators.Pipeline4.oracles ++
      operators.Pipeline5.oracles ++ operators.Pipeline6.oracles ++
      operators.Pipeline7.oracles ++ operators.Pipeline8.oracles ++
      operators.Pipeline9.oracles ++ operators.Pipeline10.oracles ++
      operators.Pipeline11.oracles ++ operators.Pipeline12.oracles ++
      operators.Pipeline13.oracles ++ operators.Pipeline14.oracles ++
      operators.Pipeline15.oracles ++ operators.Pipeline16.oracles ++
      operators.Pipeline17.oracles ++ operators.Pipeline18.oracles
}
