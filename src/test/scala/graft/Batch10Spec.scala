package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Pipeline11, Pipeline13}

/** Round-10 batch-13 operators (soft-dedup weights, calibration
  * bands): pins the mass-conservation / partition / cross-device
  * consistency properties the row-level oracles cannot see.
  */
class Batch10Spec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // ---- p118 soft-dedup down-weighting ----

  test("p118: one row per document, weight = 1e6 div cluster size") {
    val docs = Tables.documents(spark, dir)
    val v = Pipeline13.softDedupWeights(spark, dir).collect()
    assert(v.length === docs.count())
    assert(v.map(_.getLong(0)).distinct.length === v.length)
    v.foreach { r =>
      val (size, w) = (r.getAs[Long]("cluster_size"), r.getAs[Long]("weight_ppm"))
      assert(size >= 1L)
      assert(w === 1000000L / size)
    }
  }

  test("p118: each cluster carries ~one document-equivalent of mass") {
    val v = Pipeline13.softDedupWeights(spark, dir).collect()
    val byCluster = v.groupBy(_.getAs[Long]("canonical"))
    // the corpus must actually exercise the interesting case
    assert(byCluster.exists(_._2.length >= 2),
      "no near-dup cluster of size >= 2 in the test corpus")
    byCluster.foreach { case (c, rows) =>
      val size = rows.head.getAs[Long]("cluster_size")
      assert(rows.length === size, s"cluster $c size column disagrees")
      val mass = rows.map(_.getAs[Long]("weight_ppm")).sum
      // sum of size copies of (1e6 div size): exactly 1e6 minus the
      // integer-division remainder, which is < size
      assert(mass <= 1000000L && mass > 1000000L - size,
        s"cluster $c mass $mass outside (1e6 - size, 1e6]")
    }
    // singleton (the overwhelmingly common case) keeps full weight
    val singles = byCluster.filter(_._2.length == 1)
    assert(singles.nonEmpty)
    singles.foreach { case (_, rows) =>
      assert(rows.head.getAs[Long]("weight_ppm") === 1000000L)
    }
  }

  // ---- p119 calibration bands ----

  test("p119: bands partition the corpus and the counts are consistent") {
    val docs = Tables.documents(spark, dir)
    val v = Pipeline13.calibrationBands(spark, dir).collect()
    assert(v.map(_.getAs[Long]("n_docs")).sum === docs.count())
    v.foreach { r =>
      val (n, ok, acc) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_correct"), r.getAs[Long]("acc_ppm"))
      assert(n >= 1L && ok >= 0L && ok <= n)
      assert(acc === 1000000L * ok / n)
    }
    // band ids are unique and sorted (the display contract)
    val bands = v.map(_.getAs[Long]("band"))
    assert(bands.toSeq === bands.sorted.toSeq)
    assert(bands.distinct.length === bands.length)
    // the banding must separate the two prediction sides, or the
    // table degenerates to a single global row
    assert(bands.exists(_ < 0) && bands.exists(_ > 0),
      "prediction split collapsed to one side — banding is vacuous")
  }

  // ---- p120 soft-dedup epoch sampling ----

  test("p120: singletons drawn every epoch, duplicates thinned, draws deterministic") {
    val w = Pipeline13.softDedupWeights(spark, dir).collect()
    val s1 = Pipeline13.softDedupSample(spark, dir).collect()
    val byEpoch = s1.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet === (0L until 4L).toSet)
    // full-weight documents are admitted unconditionally (draw < 1e6
    // always) — soft dedup must never lose unduplicated data
    val singles = w.filter(_.getAs[Long]("weight_ppm") == 1000000L)
      .map(_.getLong(0)).toSet
    byEpoch.values.foreach { rows =>
      assert(singles.subsetOf(rows.map(_.getAs[Long]("doc_id")).toSet))
    }
    // and the duplicated mass is actually thinned somewhere
    assert(s1.length < 4 * w.length,
      "no duplicate was ever dropped — the sampler is not down-weighting")
    // keyed-md5 draws: a second run reproduces the epoch lists exactly
    val s2 = Pipeline13.softDedupSample(spark, dir).collect()
    assert(s1.map(_.toSeq).toSeq === s2.map(_.toSeq).toSeq)
  }

  // ---- p121 effective token yield ----

  test("p121: totals fold the whole corpus; effective mass never exceeds raw") {
    val y = Pipeline13.tokenYield(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
    assert(y.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // raw tokens agree with the registered p08 counter, summed
    val p08 = operators.PipelineQueries.textTokens(spark, dir).collect()
    assert(y.map(_.getAs[Long]("raw_tokens")).sum ===
      p08.map(_.getAs[Int]("ws_tokens").toLong).sum)
    y.foreach { r =>
      assert(r.getAs[Long]("eff_tokens_micro") <=
        1000000L * r.getAs[Long]("raw_tokens"))
      assert(r.getAs[Long]("eff_ratio_ppm") <= 1000000L)
    }
    // the duplication tax must be visible somewhere, or the report is
    // indistinguishable from a raw count
    assert(y.exists(_.getAs[Long]("eff_ratio_ppm") < 1000000L),
      "no source shows any down-weighting — yield degenerated to raw counts")
  }

  // ---- p122 threshold operating curve ----

  test("p122: cumulative counts are exact prefix sums of the p119 bands") {
    val curve = Pipeline13.thresholdCurve(spark, dir).collect()
    // rows arrive band-ascending (display contract); the curve itself
    // is defined band-descending — walk it that way
    val desc = curve.sortBy(-_.getAs[Long]("band"))
    val bands = desc.map(_.getAs[Long]("band"))
    assert(bands.distinct.length === bands.length)
    // tp/fp are cumulative-from-the-top: non-decreasing as the
    // threshold lowers, and each row's arithmetic is exact
    desc.sliding(2).foreach {
      case Array(hi, lo) =>
        assert(lo.getAs[Long]("tp") >= hi.getAs[Long]("tp"))
        assert(lo.getAs[Long]("fp") >= hi.getAs[Long]("fp"))
      case _ =>
    }
    val pAll = desc.last.getAs[Long]("tp")
    desc.foreach { r =>
      val (tp, fp) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"))
      assert(r.getAs[Long]("precision_ppm") === 1000000L * tp / (tp + fp))
      assert(r.getAs[Long]("recall_ppm") === 1000000L * tp / pAll)
    }
    // the loosest threshold admits the whole corpus: tp+fp = n_docs,
    // recall = 100 %
    val docs = Tables.documents(spark, dir)
    assert(desc.last.getAs[Long]("tp") + desc.last.getAs[Long]("fp")
      === docs.count())
    assert(desc.last.getAs[Long]("recall_ppm") === 1000000L)
    // per-band increments of (tp+fp) must reproduce p119's n_docs —
    // the two tables are independent spellings of one banding
    val p119 = Pipeline13.calibrationBands(spark, dir).collect()
      .map(r => r.getAs[Long]("band") -> r.getAs[Long]("n_docs")).toMap
    val increments = desc.indices.map { i =>
      val tot = desc(i).getAs[Long]("tp") + desc(i).getAs[Long]("fp")
      val prev = if (i == 0) 0L
        else desc(i - 1).getAs[Long]("tp") + desc(i - 1).getAs[Long]("fp")
      bands(i) -> (tot - prev)
    }.toMap
    assert(increments === p119)
    // the curve must offer a real trade-off, not one degenerate point
    assert(curve.length >= 2, "banding collapsed to a single threshold")
  }

  test("p119: totals agree with the registered p102 audit table") {
    val audit = Pipeline11.perceptronQuality(spark, dir).collect()
    val v = Pipeline13.calibrationBands(spark, dir).collect()
    assert(v.map(_.getAs[Long]("n_docs")).sum === audit.length)
    assert(v.map(_.getAs[Long]("n_correct")).sum ===
      audit.count(_.getAs[Boolean]("correct")))
  }
}
