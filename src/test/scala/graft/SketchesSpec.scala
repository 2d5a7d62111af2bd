package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational7, Sketches}

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

  test("sliding-distinct HLL stays inside its envelope vs the exact q58 twin") {
    val d = "/root/testdata/sf0.1"
    val exact = Relational7.q58SlidingDistinct(spark, d).collect()
      .map(r => r.getAs[Long]("eh") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_events"))).toMap
    val apx = Sketches.slidingDistinctHll(spark, d).collect()
    // identical window-position set, exact event counts to the row
    assert(apx.map(_.getAs[Long]("eh")).toSet === exact.keySet)
    apx.foreach { r =>
      val eh = r.getAs[Long]("eh")
      val (exUsers, exEvents) = exact(eh)
      assert(r.getAs[Long]("n_events") === exEvents, s"eh=$eh n_events drift")
      val a = r.getAs[Long]("n_users_approx")
      // lgConfigK=12: sigma ~ 1.6%; 5% is ~3 sigma
      assert(math.abs(a - exUsers).toDouble / exUsers < 0.05,
        s"eh=$eh: approx $a vs exact $exUsers outside the 5% envelope")
    }
  }
}
