package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite with SparkTestBase {

  test("sketch estimates stay inside their error envelopes vs exact twins") {
    val rows = Sketches.approxStats(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (apxN, exactN) = (r.getAs[Long]("apx_parts"), r.getAs[Long]("exact_parts"))
      assert(math.abs(apxN - exactN).toDouble / exactN < 0.1,
        s"HLL off: $apxN vs $exactN")
      val (apxM, exactM) = (r.getAs[Double]("apx_median"), r.getAs[Double]("exact_median"))
      assert(math.abs(apxM - exactM) / exactM < 0.05,
        s"approx median off: $apxM vs $exactM")
    }
  }
}
