package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Relational7, Sketches}
import graft.streaming.StreamingOps

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

  test("batch and streaming sliding HLL agree within sketch error on identical data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a spread of users/hours wide enough that a precision mismatch
    // between the two paths would actually show up in the estimates
    val rnd = new scala.util.Random(42)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val evs = (0 until 4000).map { i =>
      StreamingOps.Event(i.toLong,
        new java.sql.Timestamp(base + rnd.nextInt(12) * 3600000L + rnd.nextInt(3600000)),
        rnd.nextInt(900).toLong, "e", 1.0)
    }
    val ms = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.slidingUserActivity(ms.toDF())
      .writeStream.format("memory").queryName("hll_parity").outputMode("complete")
      .start()
    try {
      ms.addData(evs); q.processAllAvailable()
      // streaming windows [start, start+3h) keyed to the batch label:
      // eh = hour(start) + 2 labels the window covering [eh-2, eh]
      val stream = spark.table("hll_parity")
        .select((expr("unix_micros(w_start) DIV 3600000000") + 2).as("eh"),
                $"n_users_approx", $"n_events")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = Sketches.slidingDistinctHllOf(evs.toDF())
        .collect().map(r => r.getAs[Long]("eh") ->
          (r.getAs[Long]("n_users_approx"), r.getAs[Long]("n_events"))).toMap
      assert(stream.keySet === batch.keySet, "window sets diverge")
      // estimates are path-dependent below the error floor (hourly
      // sparse unions vs direct window sketches), so parity means:
      // within 2x the shared precision's standard error of each other.
      // A precision drift in either path (LgConfigK no longer shared)
      // blows past this deterministic, seeded bound.
      val tol = 2 * 1.04 / math.sqrt(1 << Sketches.LgConfigK)
      batch.foreach { case (eh, (bUsers, bEvents)) =>
        val (sUsers, sEvents) = stream(eh)
        assert(sEvents === bEvents, s"eh=$eh event counts diverge")
        assert(math.abs(sUsers - bUsers).toDouble / bUsers <= tol,
          s"eh=$eh: streaming $sUsers vs batch $bUsers — beyond 2x sketch error; " +
          "did one path stop using Sketches.LgConfigK?")
      }
    } finally q.stop()
  }

  test("q67: log-histogram quantiles bound the exact percentile from below within 2^-5") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val est = operators.Sketches.quantileSketch(spark, d).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val exact = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"),
           expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").as("p95"),
           expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)").as("p99"))
      .collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val flag = r.getString(0)
      Seq(50 -> r.getDouble(1), 95 -> r.getDouble(2), 99 -> r.getDouble(3))
        .foreach { case (p, truthPrice) =>
          val truthCents = math.floor(truthPrice * 100).toLong
          val e = est((flag, p))
          // the estimate is the truth's bucket lower bound
          assert(e <= truthCents, s"$flag p$p: est $e above truth $truthCents")
          assert(truthCents < e + (e >> 5) + 1,
            s"$flag p$p: est $e more than 2^-5 below truth $truthCents")
        }
    }
  }

  test("q67: the histogram state is order-free — repartitioned input gives identical output") {
    val d = "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions._
    val base = operators.Sketches.quantileSketch(spark, d).collect().toSeq
    val shuffled = operators.Sketches.quantileSketchOf(
      Tables.lineitem(spark, d).select(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * 100).cast("long").as("c"))
        .repartition(7), Seq(50, 95, 99))
      .collect().toSeq
    assert(base.map(_.toString) === shuffled.map(_.toString))
  }

  test("heavy hitters: SpaceSaving bounds hold vs exact counts, top ranks repartition-stable") {
    import spark.implicits._
    import org.apache.spark.sql.graftext.HeavyHitters.heavyHitters
    // Zipf-ish skew: term t_i appears ~N/i times, plus a long tail of
    // singletons to force evictions at capacity 16
    val rows = (1 to 20).flatMap(i => Seq.fill(400 / i)(s"t$i")) ++
      (0 until 600).map(i => s"tail$i")
    val df = rows.toDF("term")
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def summary(d: org.apache.spark.sql.DataFrame) =
      d.agg(heavyHitters($"term", 16).as("s"))
        .select(explode($"s").as("h"))
        .select($"h.term", $"h.cnt", $"h.err")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = summary(df)
    assert(got.length === 16)
    got.foreach { case (t, cnt, err) =>
      val truth = exact(t)
      assert(cnt >= truth, s"$t: estimate $cnt below true count $truth")
      assert(cnt - err <= truth, s"$t: lower bound ${cnt - err} above true $truth")
    }
    // the unambiguous heavy hitters (true count far above the eviction
    // floor) must survive: t1..t5 have counts 400..80 vs N/cap ~ 100
    val kept = got.map(_._1).toSet
    (1 to 4).foreach(i => assert(kept.contains(s"t$i"), s"lost heavy hitter t$i"))
    // merge path: a different partitioning must keep the same top ranks
    val got8 = summary(df.repartition(8))
    assert(got8.map(_._1).take(4).toSet === got.map(_._1).take(4).toSet,
      "top-4 terms unstable across partitionings")
    got8.foreach { case (t, cnt, err) =>
      val truth = exact(t)
      assert(cnt >= truth && cnt - err <= truth,
        s"$t: merged-path bounds violated ($cnt, $err, true $truth)")
    }
    // exact regime: capacity >= distinct terms degenerates to exact
    // counting with zero error
    val small = Seq("a", "b", "a", "c", "a", "b").toDF("term")
    val ex = summary(small.repartition(3))
    assert(ex.toSeq === Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }
}
