package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** End-to-end contract of [[Engine.curate]]: each stage's postcondition
  * holds on the final corpus, and the whole DAG is deterministic.
  */
class CurationPipelineSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val out = Engine.curate(docs, lang = "en",
    minQuality = 0.05, tokenBudget = 20000L).cache()

  test("pipeline yields a non-empty curated corpus") {
    assert(out.count() > 0)
  }

  test("dedup stage: no two survivors share a fingerprint") {
    assert(out.groupBy("fp").count().filter(col("count") > 1).isEmpty)
  }

  test("redaction stage: no emails or long digit runs survive") {
    assert(out.filter(col("text").rlike("[a-z0-9.]+@[a-z0-9.]+")).isEmpty)
    assert(out.filter(col("text").rlike("[0-9]{6,}")).isEmpty)
  }

  test("gates: language, quality, and token budget all hold") {
    assert(out.filter(col("lang_guess") =!= "en").isEmpty)
    assert(out.filter(col("quality") < 0.05).isEmpty)
    val maxCum = out.agg(max(col("cum_tokens"))).collect()(0).getLong(0)
    assert(maxCum <= 20000L)
    // budget packs best-quality-first: the minimum admitted quality is
    // >= the maximum quality among excluded in-language candidates that
    // didn't fit (greedy order property) — spot-check via ordering
    val ordered = out.orderBy(col("quality").desc).select("cum_tokens").collect()
    assert(ordered.zip(ordered.drop(1)).forall { case (a, b) => a.getLong(0) <= b.getLong(0) })
  }

  test("the DAG is deterministic end-to-end") {
    val again = Engine.curate(docs, lang = "en",
      minQuality = 0.05, tokenBudget = 20000L)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }
}
