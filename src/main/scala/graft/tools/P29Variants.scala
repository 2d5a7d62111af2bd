package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextAnalysis._

/** Scratch experiment harness for p29_quality_repetition plan variants.
  * Kept checked-in so the measured decision is reproducible.
  * Usage: runMain graft.tools.P29Variants [sfDir] [reps]
  */
object P29Variants {

  /** Variant A (the pre-round-4 implementation): two lean string-keyed
    * explode branches, each re-splitting the text. Kept inline so the
    * measured comparison stays runnable.
    */
  def current(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val wc = docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
    val ws = wc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"), count(lit(1)).as("n_distinct"),
           max(col("c")).as("top_word"))
    val bc = docs.select(col("doc_id"),
        explode(wordNgrams(col("text"), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
    val bs = bc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram"))
    ws.join(bs, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        col("top_word"), col("n_bigrams"), col("top_bigram"),
        floor(lit(1e6) * (lit(1) - col("n_distinct").cast("double") / col("n_words")))
          .as("dup_word_q"),
        floor(lit(1e6) * col("top_bigram").cast("double") / col("n_bigrams"))
          .as("top_bigram_q"))
      .orderBy(col("doc_id"))
  }

  /** Variant B: same two branches, but the per-term groupBy keys on
    * xxhash64(term) instead of the string — output is hash-free (pure
    * counts), so bucket identity is all the shuffle needs.
    */
  def hashed(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val wc = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy(col("doc_id"), xxhash64(col("w")).as("h"))
      .agg(count(lit(1)).as("c"))
    val ws = wc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"), count(lit(1)).as("n_distinct"),
           max(col("c")).as("top_word"))
    val bc = docs.select(col("doc_id"),
        explode(wordNgrams(col("text"), 2)).as("b"))
      .groupBy(col("doc_id"), xxhash64(col("b")).as("h"))
      .agg(count(lit(1)).as("c"))
    val bs = bc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram"))
    ws.join(bs, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        col("top_word"), col("n_bigrams"), col("top_bigram"),
        floor(lit(1e6) * (lit(1) - col("n_distinct").cast("double") / col("n_words")))
          .as("dup_word_q"),
        floor(lit(1e6) * col("top_bigram").cast("double") / col("n_bigrams"))
          .as("top_bigram_q"))
      .orderBy(col("doc_id"))
  }

  /** Variant C (ADOPTED, round 4): split once, localCheckpoint the
    * (doc_id, words) table, derive both branches from the materialized
    * array — now the production implementation. Measured 3.4x faster
    * than A at sf0.1 (1.65 s -> 0.49 s warm); B was a wash.
    */
  def splitOnce(s: SparkSession, d: String): DataFrame =
    graft.operators.Pipeline4.qualityRepetition(s, d)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val variants = Seq("current" -> (current _), "hashed" -> (hashed _),
      "splitOnce" -> (splitOnce _))
    // cross-check identical results first
    val base = current(spark, sfDir).collect().map(_.toString)
    for ((n, f) <- variants.drop(1)) {
      val v = f(spark, sfDir).collect().map(_.toString)
      println(s"[p29x] $n identical=${v.sameElements(base)}")
    }
    for (r <- 1 to reps; (n, f) <- variants) {
      val t0 = System.nanoTime()
      f(spark, sfDir).count()
      println(f"[p29x] $n rep$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
