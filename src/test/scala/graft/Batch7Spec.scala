package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pipeline4, Pipeline5, PipelineQueries, Relational6, Relational7}

/** Semantic identities of the round-2 batches: each distributed
  * rewrite (salting, envelope prefilter, two-level rank/cumsum,
  * star-contraction components) must produce EXACTLY the rows of its
  * naive single-shuffle/single-partition formulation — the rewrites
  * change the physical shape, never the relation.
  */
class Batch7Spec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q52: salt-replicated join equals the plain join") {
    val salted = Relational6.q52SaltedJoin(spark, dir)
    val plain = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
             .cast("long")).as("rev_c"),
           count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q53: envelope-prefiltered join equals the plain filtered join") {
    val got = Relational6.q53SemiJoinReduction(spark, dir)
    val dim = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val plain = Tables.lineitem(spark, dir)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
             .cast("long")).as("rev_c"),
           count(lit(1)).as("n"))
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
  }

  test("q57: two-level rank equals the global-window row_number") {
    val twoLevel = Relational7.q57GlobalRank(spark, dir)
      .select(col("doc_id"), col("rn"))
    val w = Window.orderBy(col("n_chars"), col("doc_id"))
    val naive = Tables.documents(spark, dir)
      .select(col("doc_id"), row_number().over(w).cast("long").as("rn"))
    assert(twoLevel.exceptAll(naive).isEmpty && naive.exceptAll(twoLevel).isEmpty)
  }

  test("p19: sharded token-budget cumsum equals the global-window cumsum") {
    val twoLevel = PipelineQueries.tokenBudget(spark, dir)
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = Tables.documents(spark, dir)
      .select(col("doc_id"),
              graft.functions.TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens").cast("long")).over(w))
      .filter(col("cum_tokens") <= 3000)
    assert(twoLevel.exceptAll(naive).isEmpty && naive.exceptAll(twoLevel).isEmpty)
  }

  test("p33: star-contraction labels equal min-label-propagation labels") {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 5, numHashes = 16, bands = 4)
    val logn = Dedup.dedupClustersLogN(docs, "doc_id", pairs)
    val prop = Dedup.dedupClusters(docs, "doc_id", pairs)
    assert(logn.exceptAll(prop).isEmpty && prop.exceptAll(logn).isEmpty)
  }

  test("q54: every surviving event gap exceeds the debounce threshold") {
    val out = Relational7.q54Debounce(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val g = r.getLong(3); g == -1L || g > 5000000L
    })
  }

  test("p34: novelty counts are consistent and bounded") {
    val rows = Pipeline5.shingleNovelty(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, u, q) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(u >= 0 && u <= n)
      assert(q >= 0 && q <= 1000000L)
      if (n > 0) assert(q === math.floor(1e6 * u.toDouble / n).toLong)
    }
  }

  test("p35: admitted batch has no base fingerprint and no internal dupes") {
    val docs = Tables.documents(spark, dir)
    val baseFps = docs.filter(col("doc_id") % 2 === 0)
      .select(md5(col("text")).as("fp"))
    val out = Pipeline5.incrementalDedup(spark, dir)
    assert(out.join(baseFps, Seq("fp"), "left_semi").isEmpty,
      "a surviving doc's fingerprint exists in the base snapshot")
    val fps = out.select("fp").collect().map(_.getString(0))
    assert(fps.length === fps.distinct.length, "duplicate fp admitted")
  }

  test("p36: provenance merge partitions the corpus exactly") {
    val docs = Tables.documents(spark, dir)
    val merged = Pipeline5.provenanceMerge(spark, dir)
    val total = docs.count()
    val copies = merged.agg(sum(col("n_copies"))).head().getLong(0)
    assert(copies === total, s"n_copies sum $copies != corpus size $total")
    val canon = merged.select("canonical_id").collect().map(_.getLong(0))
    assert(canon.length === canon.distinct.length)
  }

  test("p38: chunks reassemble to the original document exactly") {
    // stride 80 / width 100: the non-overlapping prefix (80 chars) of
    // every chunk except the last, plus the full last chunk, must
    // concatenate back to the document byte-for-byte.
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = Pipeline5.chunkOverlap(spark, dir).collect()
      .groupBy(_.getLong(0))
    assert(chunks.size === docs.size)
    chunks.foreach { case (id, rows) =>
      val ordered = rows.sortBy(_.getLong(1)).map(_.getString(3))
      val rebuilt = ordered.dropRight(1).map(_.take(80)).mkString + ordered.last
      assert(rebuilt === docs(id), s"doc $id did not reassemble")
    }
  }

  test("q55: moments satisfy variance >= 0 and Pearson kurtosis bound") {
    val rows = Relational7.q55Moments(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getDouble(r.fieldIndex("variance"))
      val sk = r.getDouble(r.fieldIndex("skew"))
      val ku = r.getDouble(r.fieldIndex("kurt"))
      assert(v >= 0.0, s"negative variance $v")
      // for any distribution: kurtosis >= skewness^2 + 1
      assert(ku >= sk * sk + 1.0 - 1e-9, s"kurt $ku < skew^2+1 (${sk * sk + 1})")
    }
  }

  test("q56: division returns exactly the customers covering every priority") {
    val o = Tables.orders(spark, dir)
    val total = o.select(col("o_orderpriority")).distinct().count()
    val direct = o.groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderpriority")).as("k"))
      .filter(col("k") === total).select(col("o_custkey"))
    val got = Relational7.q56Division(spark, dir).select(col("o_custkey"))
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty)
  }

  test("q58: every trailing-3h window dominates its own hour's distinct count") {
    val perHour = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) DIV 3600000000").as("eh"), col("user_id"))
      .groupBy(col("eh")).agg(countDistinct(col("user_id")).as("u1"))
    val windows = Relational7.q58SlidingDistinct(spark, dir)
    val viol = windows.join(perHour, Seq("eh"))
      .filter(col("n_users") < col("u1"))
    assert(viol.isEmpty, "a 3h window counted fewer users than its last hour alone")
  }

  test("Engine.asofJoin reproduces the q32 as-of join rows") {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val got = Engine.asofJoin(clicks, purchases, "user_id", "ts")
      .filter(col("asof").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
              col("asof.ts").as("purchase_ts"),
              col("asof.value").as("purchase_value"))
    val expect = graft.operators.Relational3.q32AsofJoin(spark, dir)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("Engine.rangeJoin reproduces the q33 lookback counts") {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val pairs = Engine.rangeJoin(clicks,
      ev.select(col("user_id"), col("ts")), "user_id", "ts", "ts", 600L)
    val counts = pairs.groupBy(col("event_id")).agg(count(lit(1)).as("n"))
    val got = clicks.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts"),
              coalesce(col("n"), lit(0L)).as("n_prev_10m"))
    val expect = graft.operators.Relational3.q33RangeJoin(spark, dir)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("Engine.bloomPrefilter: no false negatives, real reduction, join-identical") {
    val li = Tables.lineitem(spark, dir)
    val dim = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val pre = Engine.bloomPrefilter(li, "l_orderkey", dim, "o_orderkey")
    // superset of true matches (no false negatives)
    val trueMatches = li.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(trueMatches.exceptAll(pre).isEmpty,
      "bloom dropped a fact row whose key IS in the dim (false negative)")
    // selective enough to matter
    val (nFact, nPre) = (li.count(), pre.count())
    assert(nPre < nFact, s"no reduction: $nPre of $nFact")
    // prefilter-then-join equals the plain join
    val plain = li.join(dim, col("l_orderkey") === col("o_orderkey"))
    val reduced = pre.join(dim, col("l_orderkey") === col("o_orderkey"))
    assert(reduced.exceptAll(plain).isEmpty && plain.exceptAll(reduced).isEmpty)
  }

  /** Sequential word-level BPE — shares no code with the distributed
    * trainer: explicit index-scan merge (continue at i+2), mutable
    * bigram counting, minBy tie-break.
    */
  private def refBpe(freqs: Seq[(String, Long)], k: Int): Seq[(Int, String, String, String, Long)] = {
    var words = freqs.map { case (w, f) => (w.split("").toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (sym, f) =>
        var i = 0
        while (i + 1 < sym.length) {
          val p = (sym(i), sym(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        val fused = l + r
        out += ((rank, l, r, fused, n))
        words = words.map { case (sym, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < sym.length) {
            if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) { b += fused; i += 2 }
            else { b += sym(i); i += 1 }
          }
          (b.result(), f)
        }
        rank += 1
      }
    }
    out.toSeq
  }

  test("p69: hand-checked BPE merge sequence, including a same-symbol run") {
    import spark.implicits._
    val docs = Seq((0L, "aaab aaab"), (1L, "aaab ab")).toDF("doc_id", "text")
    val got = Pipeline5.bpeMerges(docs, k = 12).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // aaab×3, ab×1: (a,a) 6 beats (a,b) 4; then (a,b) 4; then (aa,ab) 3;
    // then every word is one symbol and training exhausts early
    assert(got.toSeq === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 4L),
      (3, "aa", "ab", "aaab", 3L)))
  }

  test("p69: distributed BPE merges equal the sequential reference on the corpus") {
    val docs = Tables.documents(spark, dir)
    val freqs = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val want = refBpe(freqs, 8)
    val got = Pipeline5.bpeMerges(docs, k = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq === want, "distributed BPE diverged from the sequential reference")
  }

  test("p32: rebalance keeps exactly ceil(n/5) per stratum") {
    val kept = Pipeline4.mixRebalance(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("k"), max(col("n_strat")).as("n"))
      .collect()
    assert(kept.nonEmpty)
    kept.foreach { r =>
      val (k, n) = (r.getLong(2), r.getLong(3))
      assert(k === (n + 4) / 5, s"stratum kept $k of $n")
    }
  }
}
