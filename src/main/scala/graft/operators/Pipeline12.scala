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

  /** Geometry of the registered release plan — the same values as its
    * three registered ingredients (p103 phases of 100, p101 16-token
    * buckets × 8-doc batches over 8 batch shards, p75 64-doc seeded
    * shards under the shared release seed), so a user can line the
    * composed table up against each ingredient's own entry row by row.
    */
  private val PlanPhaseSize = 100
  private val PlanQuantum = 16
  private val PlanBatchDocs = 8
  private val PlanShardSize = 64
  private val PlanShardSeed = "graft-shard-7"

  /** p106: the PHASE-ORDERED TRAINING RELEASE plan — one row per
    * document carrying every coordinate a trainer consumes: its
    * curriculum `phase` (p103: when to train on it), its
    * `(bucket, batch_shard, batch_idx)` batching coordinates (p101:
    * which padded batch it rides in), and its `store_shard` (p75:
    * which seeded shard file holds it). Pure composition of three
    * green devices joined on doc_id; the three rank structures are
    * INDEPENDENT by design — curriculum orders by difficulty, batching
    * by length, storage by seeded hash — which is exactly what a
    * curriculum trainer wants (each phase still reads hash-mixed
    * shards and length-tight batches).
    *
    * Scale shape: three TwoLevel/sharded-window devices (no
    * single-partition sort anywhere — each ingredient's own
    * contract) + two doc-keyed joins. Sort-free library entry:
    * [[releasePlanOf]].
    */
  def releasePlan(s: SparkSession, d: String): DataFrame =
    releasePlanOf(graft.Tables.documents(s, d), PlanPhaseSize, PlanQuantum,
        PlanBatchDocs, PlanShardSize, PlanShardSeed)
      .orderBy(col("doc_id"))

  def releasePlanOf(docs: DataFrame, phaseSize: Int, quantum: Int,
                    batchDocs: Int, shardSize: Int, seed: String): DataFrame = {
    val phases = Pipeline11.curriculumPhasesOf(docs, phaseSize)
      .select(col("doc_id"), col("phase"))
    val batches = Pipeline10.lengthBatchingOf(docs, quantum, batchDocs)
      .withColumnRenamed("shard", "batch_shard")
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        col("batch_shard"), col("batch_idx"))
    val shards = Pipeline8.seededShards(docs, "doc_id", shardSize, seed)
      .select(col("doc_id"), col("shard").as("store_shard"))
    phases.join(batches, Seq("doc_id")).join(shards, Seq("doc_id"))
      .select(col("doc_id"), col("phase"), col("n_tokens"), col("bucket"),
        col("batch_shard"), col("batch_idx"), col("store_shard"))
  }

  /** APPEND form of the release plan — the p81 discipline applied to
    * the whole composition: `base` documents keep EXACTLY the
    * coordinates [[releasePlanOf]] assigned them (a daily ingest must
    * not rewrite yesterday's phases, batches or shards), while `inc`
    * documents rank only among themselves and extend each structure's
    * tail — curriculum phases continue after the base's last rank,
    * batch indices continue within each (bucket, batch_shard) group,
    * store shards fill from the base's last position. The documented
    * stability/mixing trade-off: appended docs mix only among
    * themselves; re-run the full plan when a remix is worth a
    * republish. Batch9Spec pins the frozen-base property.
    */
  def releasePlanAppendOf(base: DataFrame, inc: DataFrame, phaseSize: Int,
                          quantum: Int, batchDocs: Int, shardSize: Int,
                          seed: String): DataFrame = {
    val nb = base.agg(count(lit(1)).as("__nb"))
    // curriculum: inc ranks continue after the base's nb-th rank
    val phB = Pipeline11.curriculumPhasesOf(base, phaseSize)
      .select(col("doc_id"), col("phase"))
    val phI = Pipeline11.curriculumPhasesOf(inc, phaseSize)
      .crossJoin(broadcast(nb))
      .select(col("doc_id"),
        expr(s"CAST((rank + __nb - 1) DIV $phaseSize AS INT)").as("phase"))
    // batching: inc rows rank within (bucket, batch_shard) after the
    // base group's count — group tallies are bounded (buckets × 8) and
    // broadcast
    val btB = Pipeline10.lengthBatchingOf(base, quantum, batchDocs)
      .withColumnRenamed("shard", "batch_shard")
    val groupCounts = btB.groupBy(col("bucket"), col("batch_shard"))
      .agg(count(lit(1)).as("__ng"))
    val btI = Pipeline10.lengthBatchingOf(inc, quantum, batchDocs)
      .withColumnRenamed("shard", "batch_shard")
      .withColumn("__rn",
        expr("(batch_idx * " + batchDocs + ") + " +
          s"(row_number() OVER (PARTITION BY bucket, batch_shard, batch_idx " +
          "ORDER BY n_tokens DESC, doc_id) - 1)"))
      .join(broadcast(groupCounts), Seq("bucket", "batch_shard"), "left")
      .withColumn("batch_idx",
        expr(s"CAST((__rn + coalesce(__ng, 0)) DIV $batchDocs AS INT)"))
    val batchCols = Seq("doc_id", "n_tokens", "bucket", "batch_shard",
      "batch_idx").map(col)
    // storage: the p81 seeded-rank offset
    val shB = Pipeline8.seededShards(base, "doc_id", shardSize, seed)
      .select(col("doc_id"), col("shard").as("store_shard"))
    val shI = Pipeline8.seededShards(inc, "doc_id", shardSize, seed)
      .crossJoin(broadcast(nb))
      .select(col("doc_id"),
        expr(s"CAST((__rn + __nb - 1) DIV $shardSize AS INT)")
          .as("store_shard"))
    val planB = phB.join(btB.select(batchCols: _*), Seq("doc_id"))
      .join(shB, Seq("doc_id"))
    val planI = phI.join(btI.select(batchCols: _*), Seq("doc_id"))
      .join(shI, Seq("doc_id"))
    planB.unionByName(planI)
      .select(col("doc_id"), col("phase"), col("n_tokens"), col("bucket"),
        col("batch_shard"), col("batch_idx"), col("store_shard"))
  }

  val releasePlanOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |diff AS (
       |  SELECT doc_id,
       |         CAST(1000000 * count(DISTINCT term) // count(*) AS BIGINT)
       |           AS diversity_q
       |  FROM toks GROUP BY doc_id),
       |ph AS (
       |  SELECT doc_id,
       |         CAST((row_number() OVER (ORDER BY diversity_q DESC, doc_id)
       |               - 1) // $PlanPhaseSize AS INTEGER) AS phase
       |  FROM diff),
       |tk AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |bi AS (
       |  SELECT doc_id, n_tokens, bucket, batch_shard,
       |         CAST((row_number() OVER (PARTITION BY bucket, batch_shard
       |                ORDER BY n_tokens DESC, doc_id) - 1) // $PlanBatchDocs
       |              AS INTEGER) AS batch_idx
       |  FROM (SELECT doc_id, n_tokens,
       |               ((n_tokens + ${PlanQuantum - 1}) // $PlanQuantum)
       |                 * $PlanQuantum AS bucket,
       |               CAST(doc_id % 8 AS INTEGER) AS batch_shard
       |        FROM tk)),
       |sh AS (
       |  SELECT doc_id,
       |         CAST((row_number() OVER (
       |                ORDER BY md5('$PlanShardSeed:' || doc_id), doc_id)
       |               - 1) // $PlanShardSize AS INTEGER) AS store_shard
       |  FROM documents)
       |SELECT d.doc_id, ph.phase, bi.n_tokens, bi.bucket, bi.batch_shard,
       |       bi.batch_idx, sh.store_shard
       |FROM documents d
       |JOIN ph USING (doc_id) JOIN bi USING (doc_id) JOIN sh USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p104_ann_recall" -> (annRecall _),
    "p105_audio_containment" -> (audioContainmentQuery _),
    "p106_release_plan" -> (releasePlan _),
  )

  val oracles: Map[String, String] = Map(
    "p104_ann_recall" -> annRecallOracle,
    "p105_audio_containment" -> audioContainmentOracle,
    "p106_release_plan" -> releasePlanOracle,
  )
}
