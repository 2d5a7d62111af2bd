package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Parallelism

/** Pins the stats-aware split estimate for shuffle-producing operators:
  * a SMALL post-shuffle frame (the AQE-coalesced case) still triggers
  * the cheap fan-out repartition, while a BIG one — the 100 TB deduped
  * corpus fed to a downstream operator family — passes through
  * untouched instead of paying a gratuitous full re-shuffle.
  */
class ParallelismSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"

  private def withAdvisory[A](bytes: Long)(body: => A): A = {
    val old = spark.conf.getOption(advisoryKey)
    spark.conf.set(advisoryKey, bytes.toString)
    try body
    finally old match {
      case Some(v) => spark.conf.set(advisoryKey, v)
      case None    => spark.conf.unset(advisoryKey)
    }
  }

  // high-cardinality aggregate over a real file scan: size-only stats
  // keep it roughly corpus-sized, the shape AQE does NOT coalesce
  private def bigDerived = spark.read.parquet(s"$dir/lineitem.parquet")
    .groupBy($"l_orderkey", $"l_linenumber")
    .agg(sum($"l_quantity").as("qty"))

  test("corpus-sized aggregate output passes through ensureParallel un-repartitioned") {
    // advisory of 1 KiB makes the estimated output fill >= numShufflePartitions
    // advisory-sized partitions, i.e. the frame is 'big' relative to the target
    withAdvisory(1024) {
      val est = Parallelism.estimateSplits(bigDerived.queryExecution.optimizedPlan, spark)
      assert(est >= spark.sparkContext.defaultParallelism,
        s"big derived frame estimated only $est splits")
      val out = Parallelism.ensureParallel(bigDerived.toDF())
      assert(!out.queryExecution.optimizedPlan.toString.contains("Repartition"),
        "big post-shuffle frame was gratuitously re-shuffled")
    }
  }

  test("small aggregate output still fans out (the AQE-coalesced case)") {
    // default advisory (64 MiB) dwarfs the sf0.001 aggregate: estimate 1
    val est = Parallelism.estimateSplits(bigDerived.queryExecution.optimizedPlan, spark)
    assert(est === BigInt(1), s"small derived frame estimated $est splits")
    val out = Parallelism.ensureParallel(bigDerived.toDF())
    assert(out.queryExecution.optimizedPlan.toString.contains("Repartition"),
      "small post-shuffle frame no longer rebalanced before CPU-heavy work")
  }

  test("estimate honors explicit repartition counts and caps coalesce at the child") {
    val base = spark.range(0, 1000, 1, 8).toDF("id")
    assert(Parallelism.estimateSplits(
      base.repartition(16, $"id").queryExecution.optimizedPlan, spark) === BigInt(16))
    assert(Parallelism.estimateSplits(
      base.coalesce(2).queryExecution.optimizedPlan, spark) === BigInt(2))
    // repartition(expr) with no count is AQE-coalescible -> stats-bounded,
    // never above numShufflePartitions
    val noCount = base.repartition($"id")
    val est = Parallelism.estimateSplits(noCount.queryExecution.optimizedPlan, spark)
    assert(est >= 1 && est <= spark.sessionState.conf.numShufflePartitions)
  }

  test("a tiny join output still fans out (size-only join stats are a product, not a size)") {
    // SizeInBytesOnlyStatsPlanVisitor estimates inner joins as the
    // PRODUCT of child sizes; uncorrected, two tiny inputs would read
    // as huge, dodge the fan-out repartition, and leave the CPU-heavy
    // downstream stage as parallel as the (coalesced) join output
    val joined = spark.read.parquet(s"$dir/supplier.parquet")
      .join(spark.read.parquet(s"$dir/nation.parquet"),
            $"s_nationkey" === $"n_nationkey")
    val est = Parallelism.estimateSplits(joined.queryExecution.optimizedPlan, spark)
    assert(est === BigInt(1), s"tiny join misestimated as $est splits")
    assert(Parallelism.ensureParallel(joined.toDF())
      .queryExecution.optimizedPlan.toString.contains("Repartition"),
      "tiny join output no longer rebalanced before CPU-heavy work")
  }

  test("the estimate is clamped to [1, numShufflePartitions] under a tiny advisory") {
    withAdvisory(1) { // degenerate: every byte its own partition
      val est = Parallelism.estimateSplits(bigDerived.queryExecution.optimizedPlan, spark)
      assert(est === BigInt(spark.sessionState.conf.numShufflePartitions))
    }
  }
}
