package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Pipeline operators, batch 10: the VIDEO modality — raw-PPM-stream
  * clips decoded to per-frame perceptual signatures, temporal
  * near-duplicate pairs, and the video edge set folded into the
  * cross-modal dedup union (p85). Completes the modality suite: text
  * (hash families), images (P6 + dHash), audio (RIFF/PCM + profile
  * fingerprint), video (frame walk + aligned dHash distance).
  *
  * Reference scope note: the reference engine (server.go/slave.go)
  * carries no media handling at all — this whole file is the
  * training-data-pipeline extension surface the brief asks for,
  * expressed with the devices the still-image modality already
  * established (codec boundary in `mapPartitions`, signatures not
  * blobs in shuffles, banded pair generation, formula-derived
  * oracles).
  */
object Pipeline10 {

  /** DuckDB CTE: each document's clip geometry — width, height, frame
    * count, and frame-0 scene phase, mirroring
    * [[Multimodal.videoParams]]/[[Multimodal.videoFrameBase]].
    */
  private[operators] val videoDocsCte =
    """vd AS (SELECT doc_id,
      |              CAST(32 + (doc_id % 4) * 8 AS BIGINT) AS w,
      |              CAST(24 + (doc_id % 5) * 8 AS BIGINT) AS h,
      |              CAST(2 + (doc_id % 8) % 3 AS INTEGER) AS nf,
      |              29 * (doc_id % 16) + ((doc_id // 80) % 2) AS base0
      |       FROM documents)""".stripMargin

  /** DuckDB CTE (expects `vd`): per-(doc, frame) dHash re-derived from
    * the pixel formula with the frame's phase `base0 + 37·f` — the
    * exact mirror of the decoder's per-frame [[Multimodal.dHash]].
    */
  private[operators] val videoFhashCte = {
    val xi = "((i * w) // 11)"
    val xn = "(((i + 1) * w) // 11)"
    val yj = "((j * h) // 6)"
    val g = (x: String) =>
      PipelineQueries.graySql(x, yj)
        .replace("base", "(base0 + 37 * (f // 2) + (f % 2))")
    s"""vh AS (
       |  SELECT doc_id, nf, f,
       |         CAST(sum(CASE WHEN ${g(xn)} > ${g(xi)}
       |                       THEN CAST(1 AS BIGINT) << CAST(j * 10 + i AS INT)
       |                       ELSE 0 END) AS BIGINT) AS fhash
       |  FROM vd, unnest(range(0, nf)) tf(f),
       |       unnest(range(0, 10)) ti(i), unnest(range(0, 6)) tj(j)
       |  GROUP BY doc_id, nf, f)""".stripMargin
  }

  /** p89: decode every clip to per-frame geometry + dHash rows. The
    * differential proof of the video decoder: the engine side walks
    * real bytes (headers parsed, pixel blocks hashed); the oracle
    * re-derives every cell from the generator formula — agreement
    * means the encode→stream→walk→hash round trip is exact.
    *
    * Scale shape: decode is map-side inside the codec boundary; the
    * only shuffled rows are (doc, frame) signatures — 8-byte hashes,
    * never blobs. Frame explosion multiplies row count, not bytes.
    */
  def videoDecode(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeVideoFrames(Multimodal.attachVideo(documents(s, d)))
      .select(col("doc_id"), col("frame"), col("n_frames"),
              col("width"), col("height"), col("fhash"))
      .orderBy(col("doc_id"), col("frame"))

  val videoDecodeOracle: String =
    s"""WITH $videoDocsCte,
       |$videoFhashCte
       |SELECT vd.doc_id, CAST(f AS INTEGER) AS frame, vd.nf AS n_frames,
       |       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       |       fhash
       |FROM vd JOIN vh ON vd.doc_id = vh.doc_id
       |ORDER BY vd.doc_id, f""".stripMargin

  /** p90: temporal near-duplicate clips — same frame count, every
    * aligned frame within Hamming ≤ 3. The fixture family makes this
    * non-trivial exactly like p59/p79: ids 160 apart are byte-identical
    * (max_hamming 0) and ids 80 apart carry the ±1 jitter whose
    * per-frame dHash drifts only at mod-256 wrap crossings.
    *
    * Scale shape: frame-0 banding (lossless at radius 3 by pigeonhole)
    * generates candidates; verification joins only candidate pairs'
    * frame rows keyed on (doc, frame) — never all-pairs, never blobs.
    * The oracle is the brute-force all-pairs aligned-max scan over
    * formula-derived hashes, sharing no blocking logic with the
    * engine.
    */
  def videoNearDup(s: SparkSession, d: String): DataFrame =
    Multimodal.videoNearDupPairs(
        Multimodal.decodeVideoFrames(
          Multimodal.attachVideo(documents(s, d))),
        maxHamming = 3)
      .orderBy(col("d1"), col("d2"))

  val videoNearDupOracle: String =
    s"""WITH $videoDocsCte,
       |$videoFhashCte
       |SELECT a.doc_id AS d1, b.doc_id AS d2, a.nf AS n_frames,
       |       CAST(max(bit_count(xor(a.fhash, b.fhash))) AS INTEGER)
       |         AS max_hamming
       |FROM vh a JOIN vh b
       |  ON b.doc_id > a.doc_id AND b.nf = a.nf AND b.f = a.f
       |GROUP BY a.doc_id, b.doc_id, a.nf
       |HAVING max(bit_count(xor(a.fhash, b.fhash))) <= 3
       |ORDER BY d1, d2""".stripMargin

  /** p91: temporal video dedup CLUSTERS — the p90 near-dup relation
    * resolved to canonical labels with the O(log n) contraction, the
    * clip twin of p60 (images) and the audio cluster path. The
    * retention decision a curation pipeline actually makes: not "these
    * two clips look alike" but "keep exactly one representative per
    * clip family".
    *
    * Scale shape — exact-first, the order a real dedup pipeline runs:
    * byte-identical clips (same ordered frame-hash sequence) collapse
    * to STAR edges first (K−1 edges per K-copy family, the p85 text
    * device), and the banded near-dup pair stage runs only among the
    * family REPRESENTATIVES. The clusters are provably identical to
    * contracting the full p90 relation — identical clips have
    * identical frame hashes, so a ≈ b implies every a-twin ≈ every
    * b-twin and one representative pair plus the stars closes the same
    * components — but the pair stage's input shrinks by the family
    * width (~31× at sf0.1, where the full relation is ~141 k pairs)
    * and at 100 TB, where boilerplate families are 10⁶ wide, it is the
    * difference between a finishing and a dead job. The oracle is
    * still the FULL all-pairs relation plus recursive closure.
    */
  def videoDedupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val frames = Multimodal.decodeVideoFrames(Multimodal.attachVideo(docs))
      .select(col("doc_id"), col("frame"), col("n_frames"), col("fhash"))
      .localCheckpoint()
    videoClusterLabelsOf(docs, frames).orderBy(col("doc_id"))
  }

  /** The label half of p91 over an already-decoded (and materialized)
    * frame table — split out so a composition that needs the frames
    * TWICE (p125's yield table reads per-clip frame mass beside the
    * cluster labels) decodes once; identical plan to the fused form.
    */
  private[operators] def videoClusterLabelsOf(docs: DataFrame,
                                              frames: DataFrame): DataFrame = {
    val fams = Multimodal.exactClipFamilies(frames).localCheckpoint()
    val starEdges = fams.filter(col("rep") < col("doc_id"))
      .select(col("rep").as("d1"), col("doc_id").as("d2"))
    val repFrames = frames
      .join(fams.filter(col("rep") === col("doc_id")).select(col("doc_id")),
        Seq("doc_id"))
    val repPairs = Multimodal.videoNearDupPairs(repFrames, maxHamming = 3)
      .select(col("d1"), col("d2"))
    Dedup.dedupClustersLogN(docs, "doc_id", starEdges.union(repPairs))
  }

  /** The p91 label CTE chain (expects RECURSIVE; yields `lab` =
    * (doc_id, canonical)) — shared by the p91 oracle and the p125
    * video soft-dedup composition, the `clusterLabelCtes` precedent.
    */
  /** The pair-relation PREFIX of the p91 chain (everything up to `vp`)
    * — split out so the post-retraction oracles can close over a
    * SURVIVOR-restricted copy of the same pair relation (the
    * restriction commutes at the pair level — the aligned-frame
    * relation is pairwise — but NOT through the closure, where
    * connectivity via a retracted clip must break).
    */
  private[operators] val videoPairCtes: String =
    s"""$videoDocsCte,
       |$videoFhashCte,
       |vp AS (SELECT a.doc_id AS d1, b.doc_id AS d2
       |       FROM vh a JOIN vh b
       |         ON b.doc_id > a.doc_id AND b.nf = a.nf AND b.f = a.f
       |       GROUP BY a.doc_id, b.doc_id
       |       HAVING max(bit_count(xor(a.fhash, b.fhash))) <= 3)""".stripMargin

  private[operators] val videoClusterLabelCtes: String =
    s"""$videoPairCtes,
       |e AS (SELECT d1 AS a, d2 AS b FROM vp UNION SELECT d2, d1 FROM vp),
       |r AS (SELECT a, b FROM e
       |      UNION SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |comp AS (SELECT a AS doc_id, min(b) AS mn FROM r GROUP BY a),
       |lab AS (
       |  SELECT d.doc_id,
       |         CAST(coalesce(least(c.doc_id, c.mn), d.doc_id) AS BIGINT)
       |           AS canonical
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)""".stripMargin

  val videoDedupClustersOracle: String =
    s"""WITH RECURSIVE $videoClusterLabelCtes
       |SELECT doc_id, canonical FROM lab ORDER BY doc_id""".stripMargin

  /** Cut threshold of the registered scene-cut query: the fixture's
    * within-scene step (+1 phase) flips only wrap-straddling dHash
    * samples (measured max 6 bits over sf0.01's 500 clips) while the
    * cross-scene step (+37) flips a wide band (measured min 10), so 8
    * sits mid-gap — MultimodalSpec pins the gap itself. Geometry-
    * parametric like every perceptual radius in this library — real
    * footage tunes τ on a labeled clip sample.
    */
  private[graft] val CutTau = 8

  /** p92: scene-cut detection — the consecutive-frame dHash distance
    * per clip, emitting the frames whose distance to their predecessor
    * exceeds τ. THE canonical video curation primitive: cuts segment a
    * clip into scenes, scenes drive keyframe selection (sample one
    * frame per scene, not per clip), and cut-rate is a quality signal
    * (slideshow vs static footage). All-integer (positions, XOR,
    * popcount), so the oracle is a full differential mirror.
    *
    * Scale shape: decode is the map-side codec boundary; the lag runs
    * in ONE window keyed by clip over frame rows that are already
    * (doc, frame, 8-byte hash) — the shuffle moves signatures, never
    * pixels, and a clip's frames are a few rows, so no key is ever
    * heavy.
    */
  def sceneCuts(s: SparkSession, d: String): DataFrame =
    sceneCutsOf(
        Multimodal.decodeVideoFrames(Multimodal.attachVideo(documents(s, d))),
        CutTau)
      .orderBy(col("doc_id"), col("frame"))

  /** Library entry behind p92: cuts of a decoded frame frame
    * (`doc_id, frame, fhash`), any threshold. Sort-free.
    */
  def sceneCutsOf(frames: DataFrame, tau: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame"))
    frames
      .select(col("doc_id"), col("frame"), col("fhash"))
      .withColumn("ph", lag(col("fhash"), 1).over(w))
      .filter(col("ph").isNotNull)
      .select(col("doc_id"), col("frame"),
        bit_count(col("fhash").bitwiseXOR(col("ph"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") > tau)
  }

  val sceneCutsOracle: String =
    s"""WITH $videoDocsCte,
       |$videoFhashCte,
       |lagged AS (
       |  SELECT doc_id, f, fhash,
       |         lag(fhash) OVER (PARTITION BY doc_id ORDER BY f) AS ph
       |  FROM vh)
       |SELECT doc_id, CAST(f AS INTEGER) AS frame,
       |       CAST(bit_count(xor(fhash, ph)) AS INTEGER) AS hamming
       |FROM lagged
       |WHERE ph IS NOT NULL AND bit_count(xor(fhash, ph)) > $CutTau
       |ORDER BY doc_id, frame""".stripMargin

  /** p93: keyframe selection — ONE representative frame per scene (the
    * first frame of the clip plus the first frame after every p92
    * cut), each labeled with its scene index (running cut count). This
    * is how video becomes training data: downstream image pipelines
    * (p59 dedup, caption/embedding extraction) run on keyframes, not
    * on every frame — the scene segmentation IS the sampling rate.
    * Composes p92 in one window pass; all-integer, full oracle.
    */
  def keyframes(s: SparkSession, d: String): DataFrame =
    keyframesOf(
        Multimodal.decodeVideoFrames(Multimodal.attachVideo(documents(s, d))),
        CutTau)
      .select(col("doc_id"), col("frame"), col("scene"))
      .orderBy(col("doc_id"), col("frame"))

  /** Library entry behind p93: keyframes of a decoded frame frame,
    * any threshold; keeps the keyframe's `fhash` so the output feeds
    * image-pipeline stages directly. Sort-free. (The per-clip kernel
    * twin — zero shuffles, for streams — is
    * [[Multimodal.decodeVideoKeyframes]].)
    */
  def keyframesOf(frames: DataFrame, tau: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame"))
    frames
      .select(col("doc_id"), col("frame"), col("fhash"))
      .withColumn("ph", lag(col("fhash"), 1).over(w))
      .withColumn("cut",
        when(col("ph").isNull, lit(0))
          .otherwise((bit_count(col("fhash").bitwiseXOR(col("ph"))) > tau)
            .cast("int")))
      .withColumn("scene", sum(col("cut")).over(w).cast("int"))
      .filter(col("ph").isNull || col("cut") === 1)
      .select(col("doc_id"), col("frame"), col("scene"), col("fhash"))
  }

  val keyframesOracle: String =
    s"""WITH $videoDocsCte,
       |$videoFhashCte,
       |lg AS (
       |  SELECT doc_id, f, fhash,
       |         lag(fhash) OVER (PARTITION BY doc_id ORDER BY f) AS ph
       |  FROM vh),
       |ct AS (
       |  SELECT doc_id, f,
       |         CASE WHEN ph IS NULL THEN 0
       |              WHEN bit_count(xor(fhash, ph)) > $CutTau THEN 1
       |              ELSE 0 END AS cut,
       |         ph IS NULL AS first
       |  FROM lg),
       |sc AS (
       |  SELECT doc_id, f, cut, first,
       |         sum(cut) OVER (PARTITION BY doc_id ORDER BY f) AS scene
       |  FROM ct)
       |SELECT doc_id, CAST(f AS INTEGER) AS frame,
       |       CAST(scene AS INTEGER) AS scene
       |FROM sc WHERE first OR cut = 1
       |ORDER BY doc_id, frame""".stripMargin

  /** Contamination rule of the registered query: a document is dropped
    * when ≥ 5 % of its distinct 3-gram shingles appear in the
    * benchmark set — the published decontamination rule (GPT-3
    * appendix C / Llama's n-gram variant) as an EXACT integer
    * cross-multiplication, no float ratio anywhere. Shingle width is
    * corpus-parametric: published rules use 8–13-gram shingles on real
    * prose; this corpus's short synthetic sentences only overlap at
    * 3-grams (measured: 16/494 dropped at 3, zero at 5 — the 5-gram
    * rule would be a dead gate here).
    */
  private val DecontPct = 5
  private[graft] val DecontShingleN = 3

  /** p94: fuzzy benchmark decontamination — the DECISION TABLE p30's
    * overlap report stops short of. p30 counts shared shingles for the
    * docs that have any; the published drop rule needs three more
    * things: each doc's TOTAL distinct shingles (the denominator),
    * zero-hit docs (the kept majority — absent rows are not a
    * verdict), and the threshold comparison itself. Output: one row
    * per candidate doc with (n_shingles, n_hit, contaminated), the
    * audit artifact a release pipeline stores next to the drop list.
    *
    * Scale shape: the benchmark index is DISTINCT bench shingle hashes
    * — benchmark suites are model-sized, so it broadcasts and the
    * corpus-side membership probe is map-side (the p30 device); the
    * only corpus-keyed shuffles are the distinct-shingle expansion and
    * the doc roll-up. Same md5-free xxhash64 shingle-key trick as p30:
    * the oracle counts distinct STRINGS, the engine distinct HASHES —
    * equal short of a 64-bit collision.
    */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    decontaminateOf(docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        n = DecontShingleN, pct = DecontPct)
      .orderBy(col("doc_id"))
  }

  /** Library entry behind p94: the decision table of `docs` against an
    * arbitrary benchmark frame (same doc_id/text shape), any shingle
    * width and threshold percent. Sort-free.
    */
  def decontaminateOf(docs: DataFrame, benchDocs: DataFrame,
                      n: Int, pct: Int): DataFrame =
    decontaminateAgainstIndex(docs, benchShingleIndex(benchDocs, n), n, pct)

  /** The benchmark's frozen shingle-hash index `(ng)` — build it ONCE
    * per deployment (benchmarks are frozen by definition) and pass it
    * to [[decontaminateAgainstIndex]] / the streaming admission gate;
    * deriving it per micro-batch would pay the explode + distinct per
    * arriving batch for a frame that never changes.
    */
  def benchShingleIndex(benchDocs: DataFrame,
                        n: Int = DecontShingleN): DataFrame =
    Dedup.shinglePairs(benchDocs, "doc_id", "text", n)
      .select(xxhash64(col("ngram")).as("ng")).distinct()

  /** [[decontaminateOf]] against a precomputed [[benchShingleIndex]];
    * `n` must be the width the index was built with.
    */
  def decontaminateAgainstIndex(docs: DataFrame, benchNg: DataFrame,
                                n: Int, pct: Int): DataFrame = {
    val sh = Dedup.shinglePairs(docs, "doc_id", "text", n)
      .select(col("doc_id"), xxhash64(col("ngram")).as("ng"))
      .distinct()
    val bench = benchNg.select(col("ng")).withColumn("hit", lit(1))
    val agg = sh
      .join(broadcast(bench), Seq("ng"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hit"))
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contaminated",
        col("n_shingles") > 0 &&
          col("n_hit") * 100 >= lit(pct) * col("n_shingles"))
  }

  val decontaminateOracle: String =
    s"""WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, ngram FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(w)-1),
       |                 i -> array_to_string(w[i:i+2], ' '))) AS ngram
       |  FROM ws)),
       |bench AS (SELECT DISTINCT ngram FROM sh WHERE doc_id % 97 = 0),
       |agg AS (
       |  SELECT c.doc_id, count(*) AS n_shingles,
       |         count(b.ngram) AS n_hit
       |  FROM sh c LEFT JOIN bench b USING (ngram)
       |  WHERE c.doc_id % 97 <> 0
       |  GROUP BY c.doc_id)
       |SELECT d.doc_id,
       |       CAST(coalesce(n_shingles, 0) AS BIGINT) AS n_shingles,
       |       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       |       coalesce(n_shingles, 0) > 0 AND
       |         coalesce(n_hit, 0) * 100 >= $DecontPct * coalesce(n_shingles, 0)
       |         AS contaminated
       |FROM documents d LEFT JOIN agg USING (doc_id)
       |WHERE d.doc_id % 97 <> 0
       |ORDER BY d.doc_id""".stripMargin

  /** p95: span-level contamination EXCISION — the surgical variant of
    * p94's drop rule (the Lee et al. "deduplicate-text-datasets" move
    * applied to decontamination): instead of discarding a document
    * whose shingles overlap the benchmark, remove exactly the token
    * positions covered by a benchmark-matching 3-gram occurrence and
    * keep the rest. Emits (doc_id, n_tokens, n_removed, clean_text)
    * for every candidate doc — the repair table; a doc with zero hits
    * passes through verbatim, a fully-contaminated doc survives as an
    * empty string (an explicit verdict, not an absent row).
    *
    * Plan: ONE doc-keyed shuffle does everything — the positional
    * trigram build (two leads), the coverage explode, the anti-join
    * back to token positions, and the ordered re-aggregation all share
    * the doc_id partitioning; the benchmark index rides in as the p94
    * broadcast. Token surgery is exact integer position arithmetic,
    * so the rebuilt string is oracle-exact (DuckDB mirrors with
    * `string_agg(... ORDER BY pos)`).
    */
  def decontaminateSpans(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    exciseSpansOf(docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0))
      .orderBy(col("doc_id"))
  }

  /** Library entry behind p95: span surgery of `docs` against an
    * arbitrary benchmark frame. Trigram width fixed (the covered-span
    * arithmetic is width-specific); sort-free.
    */
  def exciseSpansOf(docs: DataFrame, benchDocs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    def triFromToks(t: DataFrame): DataFrame = t
      .withColumn("t1", lead(col("term"), 1).over(w))
      .withColumn("t2", lead(col("term"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("pos"),
        xxhash64(concat_ws(" ", col("term"), col("t1"), col("t2"))).as("ng"))
    def toksOf(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    val toks = toksOf(docs)
      .localCheckpoint(eager = false) // feeds the trigram pass + the anti-join
    val tri = triFromToks(toks)
    val bench = triFromToks(toksOf(benchDocs)).select(col("ng")).distinct()
    val covered = tri
      .join(broadcast(bench), Seq("ng"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + 2)).as("pos"))
      .distinct()
    val agg = toks
      .join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(pos, term)))," +
               " x -> x.term)")).as("clean_text"))
    docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long")
        .as("n_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  val decontaminateSpansOracle: String =
    s"""WITH ws AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
       |tri AS (SELECT doc_id, i - 1 AS pos,
       |               array_to_string(w[i:i+2], ' ') AS ngram
       |        FROM ws, unnest(range(1, len(w)-1)) t(i)),
       |bench AS (SELECT DISTINCT ngram FROM tri WHERE doc_id % 97 = 0),
       |cov AS (SELECT DISTINCT t.doc_id, t.pos + o.o AS pos
       |        FROM tri t JOIN bench b USING (ngram),
       |             unnest(range(0, 3)) o(o)
       |        WHERE t.doc_id % 97 <> 0),
       |toks AS (SELECT doc_id, i - 1 AS pos, w[i] AS term
       |         FROM ws, unnest(range(1, len(w)+1)) t(i)
       |         WHERE doc_id % 97 <> 0),
       |clean AS (SELECT tk.doc_id, tk.pos, tk.term
       |          FROM toks tk LEFT JOIN cov
       |            ON cov.doc_id = tk.doc_id AND cov.pos = tk.pos
       |          WHERE cov.doc_id IS NULL),
       |agg AS (SELECT doc_id, count(*) AS n_kept,
       |               string_agg(term, ' ' ORDER BY pos) AS clean_text
       |        FROM clean GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |       CAST(len(string_split(d.text, ' ')) - coalesce(n_kept, 0)
       |            AS BIGINT) AS n_removed,
       |       coalesce(clean_text, '') AS clean_text
       |FROM documents d LEFT JOIN agg USING (doc_id)
       |WHERE d.doc_id % 97 <> 0
       |ORDER BY d.doc_id""".stripMargin

  /** Per-cell cap of the registered cluster-balanced sample. */
  private val SamplePerCell = 20

  /** p96: cluster-balanced sampling — at most `SamplePerCell` vectors
    * per IVF cell, chosen by a deterministic seeded hash order within
    * the cell. THE diversity-sampling device of embedding-era curation
    * (SemDeDup/DBSCAN-prune pipelines sample per cluster, not
    * globally): a global uniform sample keeps the corpus's topic skew
    * — the dominant cluster dominates the sample — while a per-cell
    * cap yields a topic-balanced subset with bounded size
    * `nCells · k`. Hash order (the p75 md5 seed device, mirrored
    * bytewise in both engines) makes the within-cell choice unbiased
    * by id while staying reproducible and append-stable for ids
    * already sampled.
    *
    * Scale shape: cell assignment is the shared p13 map-only broadcast
    * argmax; ONE cell-keyed window ranks; the output is model-sized.
    */
  def clusterSample(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    clusterSampleOf(emb, Similarity.seedCentroids(emb, 8),
        k = SamplePerCell, seed = "p96")
      .orderBy(col("cell"), col("vec_id"))
  }

  /** Library entry behind p96: a per-cell-capped sample of `emb`
    * against an arbitrary centroid model, seeded order. Sort-free.
    */
  def clusterSampleOf(emb: DataFrame, cents: Array[(Int, Seq[Float])],
                      k: Int, seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cell"))
      .orderBy(md5(concat(lit(s"$seed:"), col("vec_id").cast("string"))),
        col("vec_id"))
    Similarity.assignCells(cents, emb)
      .select(col("vec_id"), col("cell"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
  }

  val clusterSampleOracle: String = {
    val ccos = PipelineQueries.duckCos("e.embedding", "c.ce")
    s"""WITH cents AS (
       |  SELECT vec_id AS ccid, embedding AS ce FROM embeddings
       |  WHERE vec_id < 8),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.ccid AS cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                ORDER BY $ccos DESC, c.ccid) AS rn
       |    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
       |r AS (
       |  SELECT vec_id, cell,
       |         row_number() OVER (PARTITION BY cell
       |              ORDER BY md5(concat('p96:', CAST(vec_id AS VARCHAR))),
       |                       vec_id) AS rnk
       |  FROM assign)
       |SELECT vec_id, CAST(cell AS INTEGER) AS cell, CAST(rnk AS INTEGER) AS rnk
       |FROM r WHERE rnk <= $SamplePerCell
       |ORDER BY cell, vec_id""".stripMargin
  }

  /** p97: cross-modal frame probe — given query IMAGE signatures (the
    * first frames of clips 0–4 here; in production, any dHashed image
    * set), find every clip frame within Hamming ≤ 3: "which videos
    * contain this picture", the copy-detection probe that links the
    * image and video pipelines. Uses the two-table banded probe
    * ([[Multimodal.perceptualProbe]]) — both sides band on 4×15 bits,
    * lossless at radius 3, never queries × frames.
    */
  def frameProbe(s: SparkSession, d: String): DataFrame = {
    val frames = Multimodal.decodeVideoFrames(
        Multimodal.attachVideo(documents(s, d)))
      .select(col("doc_id"), col("frame"), col("fhash"))
      .localCheckpoint(eager = false) // feeds both probe sides
    val qs = frames.filter(col("doc_id") < 5 && col("frame") === 0)
      .select(col("doc_id").as("qid"), col("fhash").as("qhash"))
    Multimodal.perceptualProbe(qs,
        frames.withColumnRenamed("fhash", "dhash"), maxHamming = 3)
      .orderBy(col("qid"), col("doc_id"), col("frame"))
  }

  val frameProbeOracle: String =
    s"""WITH $videoDocsCte,
       |$videoFhashCte,
       |q AS (SELECT doc_id AS qid, fhash AS qhash FROM vh
       |      WHERE doc_id < 5 AND f = 0)
       |SELECT qid, v.doc_id, CAST(v.f AS INTEGER) AS frame,
       |       CAST(bit_count(xor(qhash, v.fhash)) AS INTEGER) AS hamming
       |FROM q JOIN vh v ON bit_count(xor(qhash, v.fhash)) <= 3
       |ORDER BY qid, v.doc_id, v.f""".stripMargin

  /** p99: trim-robust clip containment over the corpus — every
    * (short, long, offset) where one clip's whole frame sequence sits
    * as a contiguous window of another within Hamming ≤ 3 per frame
    * ([[Multimodal.clipContainment]]). On this corpus the relation's
    * instances are the equal-length twins at offset 0 (the fixture has
    * no cross-clip trims — true head/middle trims are exercised by the
    * hand-sliced-payload spec); the oracle is the full
    * all-pairs-all-offsets scan, so the banded anchor + window-verify
    * path is proven against brute force at corpus scale, not just on
    * the spec's fixture.
    */
  def clipContainmentQuery(s: SparkSession, d: String): DataFrame =
    Multimodal.clipContainment(
        Multimodal.decodeVideoFrames(Multimodal.attachVideo(documents(s, d))),
        maxHamming = 3)
      .orderBy(col("short_id"), col("long_id"), col("offset"))

  val clipContainmentOracle: String =
    s"""WITH $videoDocsCte,
       |$videoFhashCte,
       |clips AS (SELECT DISTINCT doc_id, nf FROM vh),
       |cand AS (
       |  SELECT s.doc_id AS sid, s.nf AS nfs, l.doc_id AS lid, o.off
       |  FROM clips s JOIN clips l
       |    ON l.doc_id <> s.doc_id AND l.nf >= s.nf,
       |  LATERAL unnest(range(0, l.nf - s.nf + 1)) o(off)),
       |agg AS (
       |  SELECT c.sid, c.lid, c.off, c.nfs,
       |         count(*) AS n_aligned,
       |         max(bit_count(xor(a.fhash, b.fhash))) AS mh
       |  FROM cand c
       |  JOIN vh a ON a.doc_id = c.sid
       |  JOIN vh b ON b.doc_id = c.lid AND b.f = a.f + c.off
       |  GROUP BY c.sid, c.lid, c.off, c.nfs)
       |SELECT sid AS short_id, lid AS long_id,
       |       CAST(off AS INTEGER) AS offset,
       |       CAST(mh AS INTEGER) AS max_hamming
       |FROM agg WHERE n_aligned = nfs AND mh <= 3
       |ORDER BY short_id, long_id, "offset"""".stripMargin

  /** p100: the STORED frame probe — p97 answered from the at-rest
    * banded signature store ([[Multimodal.frameStoreWrite]]) instead
    * of a fresh decode: partition pruning on `band_i` plus a pushed
    * `band_v IN (…)` row-group filter, query hashes as plan literals
    * (a probe batch is model-sized — the centroid/posting-term
    * precedent; here the 5 hashes are collected once from a 5-doc
    * decode). Same oracle as p97: the layout must be
    * semantics-preserving. Store memoized per JVM under the shared
    * [[IndexStores]] contract (and its documented dataset-directory
    * staleness assumption).
    */
  def frameProbeStored(s: SparkSession, d: String): DataFrame = {
    val store = IndexStores.of("frame_store", d) { p =>
      Multimodal.frameStoreWrite(
        Multimodal.decodeVideoFrames(Multimodal.attachVideo(documents(s, d)))
          .select(col("doc_id"), col("frame"), col("fhash")), p)
    }
    val qs = Multimodal.decodeVideoFrames(
        Multimodal.attachVideo(documents(s, d).filter(col("doc_id") < 5)))
      .filter(col("frame") === 0)
      .select(col("doc_id"), col("fhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    Multimodal.frameProbeStored(s, store, qs, maxHamming = 3)
      .orderBy(col("qid"), col("doc_id"), col("frame"))
  }

  /** Batch size and length-bucket quantum of the registered query. */
  private val BatchDocs = 8
  private val LenQuantum = 16

  /** p101: length-bucketed batching — assign documents to fixed-size
    * inference/training batches WITHIN length buckets (token count
    * rounded up to the next multiple of 16), so every batch pads to
    * its bucket width instead of to the corpus maximum. THE serving-
    * side padding-waste lever: batching by arrival order pads every
    * sequence to the longest in the batch (waste ∝ length variance);
    * bucketing first bounds the waste per row by the quantum. Output:
    * each doc's bucket, its batch coordinates, and its exact pad
    * waste — the audit table a batcher's cost model reads.
    *
    * Scale shape: the p31 sharding device — batches are formed within
    * (bucket, shard = doc_id % 8), so the per-key window sorts
    * corpus/|buckets|/8 rows and no bucket becomes a single heavy key;
    * more shards = more parallelism, batch coordinates stay stable
    * under any shard count because they are derived, not assigned.
    * All-integer.
    */
  def lengthBatching(s: SparkSession, d: String): DataFrame =
    lengthBatchingOf(documents(s, d), LenQuantum, BatchDocs)
      .orderBy(col("doc_id"))

  /** Library entry behind p101: batch assignment of any (doc_id, text)
    * frame at any quantum/batch size. Sort-free.
    */
  def lengthBatchingOf(docs: DataFrame, quantum: Int,
                       batchDocs: Int): DataFrame =
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket",
        expr(s"((n_tokens + ${quantum - 1}) DIV $quantum) * $quantum"))
      .withColumn("shard", (col("doc_id") % 8).cast("int"))
      .withColumn("batch_idx",
        expr(s"CAST((row_number() OVER (PARTITION BY bucket, shard " +
             s"ORDER BY n_tokens DESC, doc_id) - 1) DIV $batchDocs AS INT)"))
      .withColumn("pad_waste", col("bucket") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("bucket"), col("shard"),
        col("batch_idx"), col("pad_waste"))

  val lengthBatchingOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, n_tokens,
       |         ((n_tokens + ${LenQuantum - 1}) // $LenQuantum) * $LenQuantum
       |           AS bucket,
       |         CAST(doc_id % 8 AS INTEGER) AS shard
       |  FROM t)
       |SELECT doc_id, n_tokens, bucket, shard,
       |       CAST((row_number() OVER (PARTITION BY bucket, shard
       |              ORDER BY n_tokens DESC, doc_id) - 1) // $BatchDocs
       |            AS INTEGER) AS batch_idx,
       |       bucket - n_tokens AS pad_waste
       |FROM b ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p89_video_decode"   -> (videoDecode _),
    "p90_video_near_dup" -> (videoNearDup _),
    "p91_video_clusters" -> (videoDedupClusters _),
    "p92_scene_cuts"     -> (sceneCuts _),
    "p93_keyframes"      -> (keyframes _),
    "p94_decontaminate"  -> (decontaminate _),
    "p95_decontaminate_spans" -> (decontaminateSpans _),
    "p96_cluster_sample" -> (clusterSample _),
    "p99_clip_containment" -> (clipContainmentQuery _),
    "p100_frame_probe_stored" -> (frameProbeStored _),
    "p101_length_batching" -> (lengthBatching _),
    "p97_frame_probe"    -> (frameProbe _),
  )

  val oracles: Map[String, String] = Map(
    "p89_video_decode"   -> videoDecodeOracle,
    "p90_video_near_dup" -> videoNearDupOracle,
    "p91_video_clusters" -> videoDedupClustersOracle,
    "p92_scene_cuts"     -> sceneCutsOracle,
    "p93_keyframes"      -> keyframesOracle,
    "p94_decontaminate"  -> decontaminateOracle,
    "p95_decontaminate_spans" -> decontaminateSpansOracle,
    "p96_cluster_sample" -> clusterSampleOracle,
    "p99_clip_containment" -> clipContainmentOracle,
    "p100_frame_probe_stored" -> frameProbeOracle,
    "p101_length_batching" -> lengthBatchingOracle,
    "p97_frame_probe"    -> frameProbeOracle,
  )
}
