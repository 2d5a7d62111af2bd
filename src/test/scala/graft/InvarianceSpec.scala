package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineQueries, Pipeline4, Relational7}

/** Shuffle-partition-count invariance: the two-level rank/cumsum
  * rewrites and the sharded packers derive every output value
  * arithmetically (offsets, ranks, bins), so the answer must be
  * byte-identical whatever parallelism the cluster happens to run at.
  * A dependence on spark.sql.shuffle.partitions here would mean a
  * nondeterministic result at scale — the worst failure mode, because
  * it passes any single-configuration test.
  */
class InvarianceSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private val names =
    Seq("q57_global_rank", "p19_token_budget", "p31_pack_sequences",
        "p32_mix_rebalance",
        // batch-13 decision layer: order-free integer folds over the
        // contraction/training devices — any partitioning must agree
        "p118_soft_dedup", "p119_calibration", "p120_soft_dedup_sample",
        "p121_token_yield", "p122_threshold_curve")

  test("TwoLevel fails loudly on a negative shard key instead of dropping rows") {
    import spark.implicits._
    val bad = Seq((1L, -5L), (2L, 3L)).toDF("id", "k")
    val ex = intercept[Exception] {
      graft.operators.TwoLevel.withGlobalRank(bad, "k", Seq("id"), "rn")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("non-negative")),
      s"expected the TwoLevel precondition error, got: $ex")
  }

  test("reserved internal column names are rejected, not silently overwritten") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // "__shard" here is CALLER data; withColumn would silently replace it
    val clash = Seq((1L, 0L, 99L), (2L, 1L, 98L)).toDF("id", "k", "__shard")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.TwoLevel.withGlobalRank(clash, "k", Seq("id"), "rn")
    }
    assert(e1.getMessage.contains("__shard"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.TwoLevel.withGlobalCumsumBy(
        clash.withColumnRenamed("__shard", "__loc"),
        col("k"), Seq(col("id")), col("id"), "cs")
    }
    assert(e2.getMessage.contains("__loc"))
  }

  test("expert descending cumsum equals the naive global window and is partition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val df = (1L to 500L).map(i => (i, rnd.nextInt(20) - 10, rnd.nextInt(100).toLong))
      .toDF("id", "q", "v")
    val naive = df.withColumn("cum", sum($"v").over(
      Window.orderBy($"q".desc, $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // shard key = q itself: integral (negatives allowed here), 20 values,
    // non-increasing along the q-desc order, ties share a shard
    def two(s: org.apache.spark.sql.SparkSession) = {
      val d = s.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
      graft.operators.TwoLevel.withGlobalCumsumBy(d, col("q"),
        Seq(col("q").desc, col("id")), col("v"), "cum", descending = true)
    }
    val base = two(spark).select("id", "q", "v", "cum")
    assert(base.exceptAll(naive.select("id", "q", "v", "cum")).isEmpty &&
           naive.select("id", "q", "v", "cum").exceptAll(base).isEmpty,
      "expert two-level cumsum diverges from the naive global window")
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    val other = two(alt).select("id", "q", "v", "cum")
    assert(base.exceptAll(other).isEmpty && other.exceptAll(base).isEmpty,
      "expert two-level cumsum differs between 4 and 7 shuffle partitions")
  }

  test("expert form fails loudly on a null shard key instead of dropping rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bad = Seq((1L, Some(3L), 5L), (2L, None, 7L)).toDF("id", "k", "v")
    val ex = intercept[Exception] {
      graft.operators.TwoLevel.withGlobalCumsumBy(bad, col("k"),
        Seq(col("k"), col("id")), col("v"), "cum").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("non-null")),
      s"expected the TwoLevel null-shard error, got: $ex")
  }

  test("two-level/sharded operators are invariant to shuffle partition count") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    names.foreach { n =>
      val base = SparkEntry.queries(n)(spark, dir)
      val other = SparkEntry.queries(n)(alt, dir)
      assert(base.exceptAll(other).isEmpty && other.exceptAll(base).isEmpty,
        s"$n differs between 4 and 7 shuffle partitions")
    }
  }
}
