package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Pipeline operators, batch 9: pseudo-relevance feedback — the
  * query-expansion loop that closes the retrieval stack (seed query →
  * feedback docs → expansion terms → expanded query), RM3 re-expressed
  * with an all-integer scoring model so the DATA-DEPENDENT expansion
  * term set stays oracle-exact.
  */
object Pipeline9 {

  /** Seed terms (p45's pinned BM25 vocabulary family), feedback-set /
    * expansion / result sizes of the registered query.
    */
  private val SeedTerms = Seq("merge", "stream", "vector")
  private val FbDocs = 10
  private val ExpTerms = 5
  private val TopK = 10

  /** p80: RM3-style pseudo-relevance-feedback search. Round 1 ranks
    * the corpus for the seed query; the top-`fbDocs` results become
    * the feedback set; the `expTerms` heaviest non-seed terms of that
    * set (by summed tf, ties by term) expand the query; round 2 ranks
    * for the union. This is the classic recall lever of lexical
    * retrieval — vocabulary mismatch ("stream" misses docs that say
    * "window batch flow") is bridged by terms the engine itself
    * discovered in the seed query's neighborhood.
    *
    * Scoring model: quantized-idf weighted tf — `w(t) = (N·1000) DIV
    * df(t)`, `score(d) = Σ_t tf(d,t)·w(t)` — EXACT integer arithmetic
    * end to end. This is deliberate: p45's float BM25 keeps its oracle
    * honest by folding a FIXED term list in a fixed order, a device a
    * data-dependent expansion set cannot use; quantized idf keeps the
    * idf shape (rare terms weigh ~N/df more) while making both rounds,
    * the tie-broken feedback cut, and the expansion argmax bit-exact
    * across engines — rank fidelity is what PRF needs from round 1,
    * not BM25's saturation curve. (Swap [[Pipeline6]] BM25 in for the
    * final ranking when serving, the composition point documented
    * there.)
    *
    * Scale shape: ONE corpus tokenize + one (doc, term)-keyed tf
    * aggregation — the same table the stored inverted index (p50)
    * materializes, which is the at-rest composition: both scoring
    * passes are term-keyed probes that broadcast their term sets
    * (seed, then seed ∪ expansion — both tiny by construction), the
    * feedback cut is a bounded TakeOrdered, and the expansion
    * aggregation runs over only the feedback docs' rows (broadcast
    * semi-join on `fbDocs` ids). Document-frequency weights are a
    * vocab-bounded table joined by term. Nothing corpus-wide happens
    * twice.
    */
  def rm3Search(s: SparkSession, d: String): DataFrame =
    rm3SearchOf(documents(s, d), SeedTerms, FbDocs, ExpTerms, TopK)

  /** Library entry: PRF search over any (doc_id, text) frame. */
  def rm3SearchOf(docs: DataFrame, seed: Seq[String], fbDocs: Int,
                  expTerms: Int, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // tf: the posting table (one corpus shuffle; = the p50 store)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val n = docs.agg(count(lit(1)).as("n"))
    val w = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("term"), expr("CAST(n * 1000 DIV df AS BIGINT)").as("w"))
      .localCheckpoint(eager = false)
    def score(terms: DataFrame): DataFrame =
      tf.join(broadcast(terms), Seq("term"))
        .join(w, Seq("term"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf") * col("w")).as("score"))
    val seedDf = seed.toDF("term")
    val fb = score(seedDf)
      .orderBy(col("score").desc, col("doc_id")).limit(fbDocs)
      .select(col("doc_id"))
    val expansion = tf.join(broadcast(fb), Seq("doc_id"))
      .filter(!col("term").isInCollection(seed))
      .groupBy(col("term")).agg(sum(col("tf")).as("t"))
      .orderBy(col("t").desc, col("term")).limit(expTerms)
      .select(col("term"))
    val expanded = seedDf.union(expansion)
    score(expanded)
      .orderBy(col("score").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("score"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))).cast("int"))
      .select(col("rank"), col("doc_id"), col("score"))
      .orderBy(col("rank"))
  }

  val rm3Oracle: String = {
    val seedList = SeedTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT count(*) AS n FROM documents),
       |w AS (SELECT term, CAST(n * 1000 // df AS BIGINT) AS w
       |      FROM dft CROSS JOIN n),
       |seed AS (SELECT unnest([$seedList]) AS term),
       |s0 AS (SELECT tf.doc_id, sum(tf.tf * w.w) AS score
       |       FROM tf JOIN seed USING (term) JOIN w ON w.term = tf.term
       |       GROUP BY tf.doc_id),
       |fb AS (SELECT doc_id FROM s0 ORDER BY score DESC, doc_id LIMIT $FbDocs),
       |ex AS (SELECT tf.term FROM tf JOIN fb USING (doc_id)
       |       WHERE tf.term NOT IN (SELECT term FROM seed)
       |       GROUP BY tf.term
       |       ORDER BY sum(tf.tf) DESC, tf.term LIMIT $ExpTerms),
       |qterms AS (SELECT term FROM seed UNION SELECT term FROM ex),
       |s1 AS (SELECT tf.doc_id, CAST(sum(tf.tf * w.w) AS BIGINT) AS score
       |       FROM tf JOIN qterms USING (term) JOIN w ON w.term = tf.term
       |       GROUP BY tf.doc_id)
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
       |         AS rank,
       |       doc_id, score
       |FROM (SELECT * FROM s1 ORDER BY score DESC, doc_id LIMIT $TopK)
       |ORDER BY rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p80_rm3_expand" -> (rm3Search _),
  )

  val oracles: Map[String, String] = Map(
    "p80_rm3_expand" -> rm3Oracle,
  )
}
