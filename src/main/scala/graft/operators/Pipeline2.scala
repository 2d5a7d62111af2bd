package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Pipeline operators, batch 2: corpus-relative term weighting
  * (TF-IDF) and exact per-stratum sampling — the curation steps that
  * need corpus-global statistics, not just per-row functions.
  */
object Pipeline2 {

  /** TF-IDF top-3 terms per document. The doc-term matrix is one
    * explode+groupBy (shuffle carries (doc,term,tf) triples); document
    * frequency is a second aggregate over the matrix's term column —
    * at scale the term dictionary is orders of magnitude smaller than
    * the corpus, so the df side of the tf⋈df join broadcasts. The
    * top-3 window runs on the weighted matrix partitioned by doc_id
    * (fine-grained key, no skew). Scores are rounded to 6 digits
    * before ranking so cross-engine libm drift in ln() cannot flip an
    * ordering; residual ties break on the term itself.
    */
  def tfIdf(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val terms = docs.select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3 && col("doc_id") < 100)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"), col("tfidf"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val tfIdfOracle: String =
    """WITH terms AS (
      |  SELECT doc_id, t.term
      |  FROM documents,
      |       unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
      |  WHERE len(t.term) > 0),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |         round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      |  FROM scored)
      |SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, term, tf, df, tfidf
      |FROM ranked WHERE rnk <= 3 AND doc_id < 100
      |ORDER BY doc_id, rnk""".stripMargin

  /** Exact stratified sample: 20 documents per (lang, source) stratum,
    * chosen by md5(doc_id) order — deterministic, reproducible, and
    * uniform within each stratum. One shuffle on the stratum key; the
    * rank window scans each stratum once. At extreme stratum skew the
    * same semantics are available through the bounded-heap
    * [[graftext.TopK]] aggregate (q36) which never materializes a
    * stratum's full ordering.
    */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .orderBy(col("lang"), col("source"), col("rn"))
  }

  val stratifiedSampleOracle: String =
    """SELECT doc_id, lang, source, CAST(rn AS INTEGER) AS rn
      |FROM (
      |  SELECT doc_id, lang, source, row_number() OVER (
      |    PARTITION BY lang, source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 20
      |ORDER BY lang, source, rn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p22_tfidf"             -> (tfIdf _),
    "p23_stratified_sample" -> (stratifiedSample _),
  )

  val oracles: Map[String, String] = Map(
    "p22_tfidf"             -> tfIdfOracle,
    "p23_stratified_sample" -> stratifiedSampleOracle,
  )
}
