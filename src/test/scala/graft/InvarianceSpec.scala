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
        "p32_mix_rebalance")

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
