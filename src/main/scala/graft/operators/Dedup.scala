package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis._

/** Document deduplication operators for the training-data pipeline:
  * exact, canonical-fingerprint, exact n-gram Jaccard, MinHash+LSH and
  * SimHash near-dup detection.
  *
  * Design constraints honored throughout:
  *  - NO UDFs: every hash is a Catalyst builtin (md5 / xxhash64 /
  *    bit ops), so the scan→shingle→hash pipeline is one codegen span.
  *  - Cross-engine reproducibility: the randomized parts of MinHash /
  *    SimHash are derandomized through md5, which any engine computes
  *    identically — that is what makes the DuckDB differential oracle
  *    possible (and makes results stable across cluster re-runs).
  *  - Scale: nothing materializes O(n²). Near-dup operators go through
  *    an inverted index (shared shingle) or an LSH band join, the
  *    standard 100 TB-corpus shapes. Known skew hazards are in each
  *    Scaladoc.
  */
object Dedup {

  /** Exact dedup: keep the first (min id) row per identical text.
    * Scale: single hash shuffle on the text key; Spark's partial
    * aggregation dedups within partitions before shuffling. For very
    * long texts group by md5(text) instead to shrink shuffle keys —
    * semantics identical modulo md5 collisions.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Fingerprint dedup: canonical form = sorted distinct token set.
    * Catches word-order and repetition variants that exact dedup misses.
    */
  def byFingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, shingle) pairs — the inverted-index input shared by
    * the Jaccard and MinHash paths.
    */
  def shinglePairs(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
                explode(shingles(col(textCol), n)).as("ngram"))

  /** Exact n-gram Jaccard near-dup pairs (doc1 < doc2, similarity >=
    * threshold).
    *
    * Scale shape: inverted-index self-join — only documents sharing at
    * least one shingle ever meet, so the candidate set is sparse, not
    * O(n²). Hazard: ultra-frequent shingles ("stop shingles") create
    * quadratic hot keys; at corpus scale drop shingles with document
    * frequency above a cap before the join (one extra groupBy), which
    * only removes candidates that share boilerplate. AQE skew-join
    * handles residual imbalance.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val sh = shinglePairs(docs, idCol, textCol, n).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.ngram") === col("b.ngram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    val jac = col("c").cast("double") /
      (col("s1.n_sh") + col("s2.n_sh") - col("c"))
    inter
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .filter(jac >= threshold)
      .select(col("d1"), col("d2"), round(jac, 4).as("jaccard"))
  }

  /** Wide MinHash signatures: one row per doc, one column `mh<i>` per
    * hash function, where `mh<i> = min(md5(i || '|' || shingle))`. md5
    * is a strong enough mixer that the k salted copies behave as k
    * independent permutations (the classic MinHash requirement), while
    * staying a pure codegen'd builtin.
    *
    * Scale shape: computing the k mins as k parallel aggregates (instead
    * of exploding k rows per shingle) keeps the pre-shuffle row count at
    * docs×shingles and lets map-side partial aggregation collapse it to
    * one row per doc per partition — the shuffle carries docs×k small
    * strings, independent of corpus token count. (The exploded variant
    * benchmarked 11s at sf0.1 vs ~2s for this one.)
    */
  def minhash(docs: DataFrame, idCol: String, textCol: String,
              n: Int, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map { i =>
      min(md5(concat(lit(s"$i|"), col("ngram")))).as(s"mh$i")
    }
    shinglePairs(docs, idCol, textCol, n)
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: concatenate each band's minhashes (in hash-index
    * order) into one signature string, one row per (doc, band); docs
    * colliding on any (band, sig) are candidate near-dups.
    *
    * Scale: the candidate join is a plain hash join on (band, sig) —
    * shuffle O(docs × bands), never O(n²). Giant duplicate clusters
    * produce hot band keys; the distinct() after the join keeps output
    * bounded and AQE splits skewed partitions.
    */
  def minhashBands(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val r = numHashes / bands
    val sigs = (0 until bands).map { b =>
      concat((b * r until (b + 1) * r).map(i => col(s"mh$i")): _*)
    }
    sig.select(col("doc_id"), posexplode(array(sigs: _*)).as(Seq("band", "sig")))
  }

  /** Candidate near-dup pairs from MinHash LSH (doc1 < doc2). */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 5, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val b = minhashBands(minhash(docs, idCol, textCol, n, numHashes), numHashes, bands)
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** Number of simhash bits (60 = 15 hex chars of md5, fits a signed
    * long in every engine — deliberately under 64 so the oracle can use
    * a plain BIGINT hex cast).
    */
  val SimhashBits = 60

  /** Per-document 60-bit SimHash over tokens (with multiplicity):
    * bit j of the signature is the sign of the sum over tokens of
    * (2·bit_j(md5(token)) − 1). Computed as 60 parallel aggregates —
    * one shuffle keyed by doc_id, map-side partial aggregation keeps
    * the shuffle proportional to docs, not tokens.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = docs.select(col(idCol).as("doc_id"),
        explode(words(col(textCol))).as("word"))
      .withColumn("h", conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until SimhashBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"s$j")
    }
    val sim = (0 until SimhashBits).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    tokens.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, found
    * via 4×15-bit band blocking (a pair within Hamming distance 3 of a
    * 60-bit signature must agree exactly on at least one of 4 bands —
    * pigeonhole), then exact Hamming verification. Same LSH-join scale
    * shape as MinHash: no O(n²) stage.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val s = simhash(docs, idCol, textCol)
    val banded = s.withColumn("band_i", explode(sequence(lit(0), lit(3))))
      .withColumn("band_v", expr("shiftright(simhash, 15 * band_i) & 32767"))
    val ham = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
    banded.as("a").join(banded.as("b"),
        col("a.band_i") === col("b.band_i") && col("a.band_v") === col("b.band_v") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(ham <= maxHamming)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"), ham.as("hamming"))
      .distinct()
  }
}
