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

  /** Segment length of the registered audio-containment query: 64
    * samples (8 ms at the fixture's 8 kHz) — a multiple of 16 (equal
    * fingerprint sub-windows) that divides every fixture track length
    * (n = 256 + (id%5)·64), so the registered corpus has no dropped
    * tails and segment counts span 4–8.
    */
  private val AudioSegLen = 64

  /** p105: trim-robust AUDIO containment over the corpus — the audio
    * twin of p99 (a jingle inside a longer track), built from
    * [[Multimodal.decodeWaveSegments]]'s segment-local fingerprints
    * and [[Multimodal.audioContainment]]'s banded anchor + window
    * verify. As with p99, this corpus's instances are the equal-length
    * twins at offset 0 (ids 160 apart byte-identical, ids 80 apart
    * phase-jittered; different lengths imply different envelopes, so
    * no cross-length trims exist in the fixture) — true head/middle
    * trims are exercised by the hand-sliced-payload spec
    * (MultimodalSpec), while the oracle here is the full
    * all-pairs-all-offsets scan, proving the banded path against brute
    * force at corpus scale.
    */
  def audioContainmentQuery(s: SparkSession, d: String): DataFrame =
    Multimodal.audioContainment(
        Multimodal.decodeWaveSegments(
          Multimodal.attachWave(graft.Tables.documents(s, d)), AudioSegLen),
        maxHamming = 3)
      .orderBy(col("short_id"), col("long_id"), col("offset"))

  /** Segment-parametric mirror of Pipeline8's whole-track fingerprint
    * CTEs: same generator formula, same four-profile 60-bit fold, but
    * windows are LOCAL to each 64-sample segment (w = (t mod 64) ∕ 4)
    * and crossings reset at segment starts — the engine's
    * segment-local contract, then the p99-style all-offsets scan.
    */
  val audioContainmentOracle: String = {
    val L = AudioSegLen
    s"""WITH ${Pipeline8.waveDocsCte},
       |sm AS (SELECT doc_id, t // $L AS seg, (t % $L) // ${L / 16} AS w,
       |              ${Pipeline8.waveSampleSql("t")} AS s,
       |              CASE WHEN t % $L >= 1 THEN
       |                ${Pipeline8.waveSampleSql("t - 1")} END AS sp
       |       FROM wd, unnest(range(0, (n // $L) * $L)) tt(t)),
       |en AS (SELECT doc_id, seg, w,
       |              sum(abs(s)) AS e, max(abs(s)) AS m,
       |              sum(CASE WHEN sp IS NOT NULL AND sp * s < 0
       |                       THEN 1 ELSE 0 END) AS z,
       |              sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS p
       |       FROM sm GROUP BY doc_id, seg, w),
       |fp AS (SELECT a.doc_id, a.seg,
       |              CAST(sum(
       |                (CASE WHEN b.e > a.e
       |                      THEN CAST(1 AS BIGINT) << CAST(a.w AS INT) ELSE 0 END) +
       |                (CASE WHEN b.m > a.m
       |                      THEN CAST(1 AS BIGINT) << CAST(15 + a.w AS INT) ELSE 0 END) +
       |                (CASE WHEN b.z > a.z
       |                      THEN CAST(1 AS BIGINT) << CAST(30 + a.w AS INT) ELSE 0 END) +
       |                (CASE WHEN b.p > a.p
       |                      THEN CAST(1 AS BIGINT) << CAST(45 + a.w AS INT) ELSE 0 END)
       |              ) AS BIGINT) AS sfp
       |       FROM en a JOIN en b
       |         ON a.doc_id = b.doc_id AND a.seg = b.seg AND b.w = a.w + 1
       |       GROUP BY a.doc_id, a.seg),
       |segs AS (SELECT doc_id, CAST(n // $L AS INTEGER) AS nseg FROM wd),
       |cand AS (
       |  SELECT s.doc_id AS sid, s.nseg AS nfs, l.doc_id AS lid, o.off
       |  FROM segs s JOIN segs l
       |    ON l.doc_id <> s.doc_id AND l.nseg >= s.nseg,
       |  LATERAL unnest(range(0, l.nseg - s.nseg + 1)) o(off)),
       |agg AS (
       |  SELECT c.sid, c.lid, c.off, c.nfs,
       |         count(*) AS n_aligned,
       |         max(bit_count(xor(a.sfp, b.sfp))) AS mh
       |  FROM cand c
       |  JOIN fp a ON a.doc_id = c.sid
       |  JOIN fp b ON b.doc_id = c.lid AND b.seg = a.seg + c.off
       |  GROUP BY c.sid, c.lid, c.off, c.nfs)
       |SELECT sid AS short_id, lid AS long_id,
       |       CAST(off AS INTEGER) AS offset,
       |       CAST(mh AS INTEGER) AS max_hamming
       |FROM agg WHERE n_aligned = nfs AND mh <= 3
       |ORDER BY short_id, long_id, "offset"""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p104_ann_recall" -> (annRecall _),
    "p105_audio_containment" -> (audioContainmentQuery _),
  )

  val oracles: Map[String, String] = Map(
    "p104_ann_recall" -> annRecallOracle,
    "p105_audio_containment" -> audioContainmentOracle,
  )
}
