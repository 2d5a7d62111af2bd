package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline operators, batch 12 (round 9): index-quality metrics and
  * the remaining cross-modal/serving compositions — the ANN recall
  * report a user tunes nProbe/codebooks against, audio containment,
  * and the phase-ordered training release manifest.
  */
object Pipeline12 {

  /** k and the query-batch size shared by every ranked path below
    * (the p09/p13/p41/p49/p55 geometry: probes are vec_id < 5, top-10).
    */
  private val RecallK = 10
  private val RecallQueries = 5

  /** p104: the ANN RECALL@k report — overlap between the EXACT top-k
    * (p09's brute-force ranking) and each approximate path's top-k,
    * per query and summarized per method (`qid = -1` rows carry the
    * whole-batch totals). THE first table a user tuning an ANN index
    * reads: p13/p41 measure what the IVF probe fan-out loses, p49 adds
    * PQ quantization loss on top, p55 shows how much the refine stage
    * buys back. The p41 row doubles as a layout proof: the stored
    * path's recall must equal the in-memory p13's exactly.
    *
    * Engine shape: reuses the four REGISTERED ranked paths verbatim
    * (same stores, same models — the memoized index contract), so the
    * metric is composition-priced; the overlap itself is an integer
    * set-intersection join on (qid, cid) — model-sized frames
    * throughout (queries × k rows). The oracle recomputes all four
    * rankings via their own registered oracle SQL as derived tables,
    * so a drift in ANY ingredient surfaces twice: in its own entry and
    * here.
    */
  def annRecall(s: SparkSession, d: String): DataFrame = {
    val exact = PipelineQueries.simTopK(s, d)
      .select(col("qid").cast("int").as("qid"), col("cid"))
    val methods: Seq[(String, DataFrame)] = Seq(
      "ivf" -> PipelineQueries.simIvf(s, d),
      "ivf_stored" -> PipelineQueries.simIvfStored(s, d),
      "ivfpq" -> Pipeline6.ivfPqStored(s, d),
      "ivfpq_refine" -> Pipeline6.ivfPqRefined(s, d))
    val um = methods.map { case (m, df) =>
      df.select(lit(m).as("method"), col("qid").cast("int").as("qid"),
        col("cid"))
    }.reduce(_ unionByName _)
    import s.implicits._
    val grid = methods.map(_._1).toDF("method")
      .crossJoin(broadcast(exact.select(col("qid")).distinct()))
    val hits = um.join(exact, Seq("qid", "cid"))
      .groupBy(col("method"), col("qid")).agg(count(lit(1)).as("n_hits"))
    val per = grid.join(hits, Seq("method", "qid"), "left")
      .select(col("method"), col("qid"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
    val mean = per.groupBy(col("method"))
      .agg(sum(col("n_hits")).as("n_hits"))
      .select(col("method"), lit(-1).as("qid"), col("n_hits"))
    per.unionByName(mean)
      .withColumn("recall", round(col("n_hits") /
        when(col("qid") === -1, lit((RecallQueries * RecallK).toDouble))
          .otherwise(lit(RecallK.toDouble)), 4))
      .orderBy(col("method"), col("qid"))
  }

  /** The four registered ranking oracles, composed as derived tables —
    * no logic is re-derived here; recall is pure (qid, cid) set
    * intersection over their outputs.
    */
  val annRecallOracle: String =
    s"""WITH exact AS (
       |  SELECT CAST(qid AS INTEGER) AS qid, cid
       |  FROM (${PipelineQueries.simTopKOracle}) x),
       |ivf_r AS (SELECT qid, cid FROM (${PipelineQueries.simIvfOracle}) x),
       |pq_r AS (SELECT qid, cid FROM (${Pipeline6.ivfPqStoredOracle}) x),
       |rf_r AS (SELECT qid, cid FROM (${Pipeline6.ivfPqRefinedOracle}) x),
       |um AS (
       |  SELECT 'ivf' AS method, qid, cid FROM ivf_r
       |  UNION ALL SELECT 'ivf_stored', qid, cid FROM ivf_r
       |  UNION ALL SELECT 'ivfpq', qid, cid FROM pq_r
       |  UNION ALL SELECT 'ivfpq_refine', qid, cid FROM rf_r),
       |grid AS (
       |  SELECT m.method, q.qid
       |  FROM (SELECT DISTINCT method FROM um) m
       |  CROSS JOIN (SELECT DISTINCT qid FROM exact) q),
       |h AS (
       |  SELECT u.method, CAST(u.qid AS INTEGER) AS qid, count(*) AS n_hits
       |  FROM um u JOIN exact e ON e.qid = u.qid AND e.cid = u.cid
       |  GROUP BY 1, 2),
       |per AS (
       |  SELECT g.method, g.qid,
       |         CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits
       |  FROM grid g LEFT JOIN h ON h.method = g.method AND h.qid = g.qid)
       |SELECT method, qid, n_hits,
       |       round(n_hits / ${RecallK}.0, 4) AS recall
       |FROM per
       |UNION ALL
       |SELECT method, CAST(-1 AS INTEGER) AS qid,
       |       CAST(sum(n_hits) AS BIGINT) AS n_hits,
       |       round(sum(n_hits) / ${RecallQueries * RecallK}.0, 4) AS recall
       |FROM per GROUP BY method
       |ORDER BY method, qid""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p104_ann_recall" -> (annRecall _),
  )

  val oracles: Map[String, String] = Map(
    "p104_ann_recall" -> annRecallOracle,
  )
}
