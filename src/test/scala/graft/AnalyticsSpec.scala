package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Pipeline2, Pipeline3, Relational5}

/** Semantic invariants of the analytics batch (q45–q49, p22–p26) that
  * the value-hash oracle can't express: monotonicity, completeness,
  * and error-bound properties.
  */
class AnalyticsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("funnel stage counts are monotonically non-increasing") {
    val r = Relational5.q46Funnel(spark, dir).collect().head
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v, $c, $p")
    assert(v > 0)
  }

  test("gap-fill spine is dense: every (type, hour) slot exactly once") {
    val df = Relational5.q45GapFill(spark, dir)
    val perType = df.groupBy("event_type").count().collect()
    val counts = perType.map(_.getLong(1)).toSet
    assert(counts.size === 1, s"types have differing hour counts: $counts")
    assert(df.groupBy("event_type", "h").count().filter(col("count") > 1).isEmpty)
  }

  test("winsorized values never leave the [lo, hi] band") {
    val bad = Pipeline3.winsorize(spark, dir)
      .filter(col("v_w") < col("lo") || col("v_w") > col("hi"))
    assert(bad.isEmpty)
  }

  test("profiler: null + present partition the row count; distinct <= present") {
    Pipeline3.profile(spark, dir).collect().foreach { r =>
      val (n, nNull, nd) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nNull >= 0 && nNull <= n)
      assert(nd <= n - nNull, s"${r.getString(0)}: distinct $nd > present ${n - nNull}")
    }
  }

  test("int8 quantization: elements reconstruct within 1/scale") {
    // |x - q/scale| < 1/scale for floor quantization, and q in [-128, 127].
    import spark.implicits._
    val checked = Tables.embeddings(spark, dir).filter(col("vec_id") < 50)
      .withColumn("scale",
        lit(127.0) / aggregate(transform(col("embedding"), x => abs(x)),
          lit(0.0d), (acc, x) => greatest(acc, x.cast("double"))))
      .select(explode(col("embedding")).as("x"), col("scale"))
      .select(floor(col("x").cast("double") * col("scale")).as("q"),
        col("x").cast("double").as("x"), col("scale"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val (q, x, s) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      assert(q >= -128 && q <= 127, s"q=$q out of int8 range")
      assert(math.abs(x - q / s) <= 1.0 / s + 1e-12, s"reconstruction error: x=$x q=$q s=$s")
    }
  }

  test("tf-idf ranks are 1..k per document with no gaps") {
    val byDoc = Pipeline2.tfIdf(spark, dir)
      .groupBy("doc_id").agg(collect_list(col("rnk")).as("rs")).collect()
    assert(byDoc.nonEmpty)
    byDoc.foreach { r =>
      val rs = r.getList[Int](1)
      assert((1 to rs.size).toSeq === (0 until rs.size).map(rs.get(_).toInt).sorted)
    }
  }

  test("stratified sample takes at most 20 per stratum, deterministically") {
    val a = Pipeline2.stratifiedSample(spark, dir)
    val b = Pipeline2.stratifiedSample(spark, dir)
    assert(a.groupBy("lang", "source").count().filter(col("count") > 20).isEmpty)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
