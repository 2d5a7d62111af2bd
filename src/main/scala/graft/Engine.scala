package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators._
import graft.operators.WordlistSearch.ChunkRange

/** The engine's public facade — every capability in one place.
  *
  * A user of the reference system (`afx07/optimal-bruteforce-hadoop`)
  * interacts with: a wordlist layout, one existence query, and the
  * cluster machinery around it. [[Engine.exists]] is that query;
  * everything else is the extended surface (relational operators live
  * in `SparkEntry.queries`; the data-pipeline operators are exposed
  * here as composable functions over caller DataFrames).
  */
object Engine {

  // ---- reference-parity core (SURVEY.md §2 O1–O6) ----

  /** Q_ref(password): pruned, short-circuiting existence query. */
  def exists(spark: SparkSession, wordlistBase: String,
             ranges: Seq[ChunkRange], password: String): Boolean =
    WordlistSearch.exists(spark, wordlistBase, ranges, password)

  /** All matches with file provenance (the per-chunk verdict as data). */
  def find(spark: SparkSession, wordlistBase: String,
           ranges: Seq[ChunkRange], password: String): DataFrame =
    WordlistSearch.find(spark, wordlistBase, ranges, password)

  // ---- dedup ----

  def dedupExact(docs: DataFrame, id: String, text: String): DataFrame =
    Dedup.exact(docs, id, text)
  def dedupFingerprint(docs: DataFrame, id: String, text: String): DataFrame =
    Dedup.byFingerprint(docs, id, text)
  def nearDupJaccard(docs: DataFrame, id: String, text: String,
                     n: Int = 5, threshold: Double = 0.8): DataFrame =
    Dedup.ngramJaccardPairs(docs, id, text, n, threshold)
  def nearDupMinhash(docs: DataFrame, id: String, text: String): DataFrame =
    Dedup.minhashLshPairs(docs, id, text)
  def nearDupSimhash(docs: DataFrame, id: String, text: String,
                     maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairs(docs, id, text, maxHamming)
  def dedupClusters(docs: DataFrame, id: String, pairs: DataFrame): DataFrame =
    Dedup.dedupClusters(docs, id, pairs)

  // ---- similarity search ----

  def topKExact(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    Similarity.bruteForceTopK(corpus, queries, k)
  def topKLsh(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    Similarity.signLshTopK(corpus, queries, k)
  def topKIvf(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    Similarity.ivfTopK(corpus, queries, k)
  def embeddingNearDups(corpus: DataFrame, threshold: Double): DataFrame =
    Similarity.nearDupPairs(corpus, threshold)

  // ---- text analysis (Column functions, composable in any select) ----

  val text: graft.functions.TextAnalysis.type = graft.functions.TextAnalysis
  val vectors: graft.functions.VectorOps.type = graft.functions.VectorOps

  // ---- multimodal ----

  def attachBinary(docs: DataFrame): DataFrame = Multimodal.attachBinary(docs)
  def inspectBinary(withBin: DataFrame): DataFrame = Multimodal.inspect(withBin)
  def frameSample(withBin: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    Multimodal.frameSample(withBin, stride, maxFrames)
  def decode(spark: SparkSession, withBin: DataFrame): DataFrame =
    Multimodal.decodeStub(spark, withBin)

  // ---- streaming ----

  val streams: graft.streaming.StreamingOps.type = graft.streaming.StreamingOps

  // ---- custom aggregates / expressions ----

  def topkAgg(c: Column, k: Int): Column =
    org.apache.spark.sql.graftext.TopK.topk(c, k)
  def vecDot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot(a, b)

  /** Register the SQL functions (vec_dot, ...) on a caller-owned
    * session built without `spark.sql.extensions=graft.GraftExtensions`.
    */
  def registerSql(spark: SparkSession): Unit =
    org.apache.spark.sql.graftext.ColumnBridge.registerFunctions(spark)

  // ---- SQL front door ----

  /** Register every test-data table of `dir` as a temp view (plus the
    * graft SQL functions), making the whole engine reachable from SQL
    * strings. Views are lazy — nothing is scanned until queried.
    */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    registerSql(spark)
    Tables.loaders.foreach { case (n, load) =>
      load(spark, dir).createOrReplaceTempView(n)
    }
  }

  /** One-call SQL entry point over the registered tables. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(query)
  }
}
