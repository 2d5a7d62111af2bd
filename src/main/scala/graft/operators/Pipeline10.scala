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
      PipelineQueries.graySql(x, yj).replace("base", "(base0 + 37 * f)")
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p89_video_decode"   -> (videoDecode _),
    "p90_video_near_dup" -> (videoNearDup _),
  )

  val oracles: Map[String, String] = Map(
    "p89_video_decode"   -> videoDecodeOracle,
    "p90_video_near_dup" -> videoNearDupOracle,
  )
}
