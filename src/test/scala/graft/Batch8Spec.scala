package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Pipeline5, Pipeline7}

/** Pipeline batch-7 operators (tokenizer application + corpus quality
  * models): each distributed form is pinned against an independent
  * sequential implementation sharing no code, plus the plan-shape and
  * corpus-precondition guards its oracle relies on.
  */
class Batch8Spec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Sequential BPE encoder — index-scan merge with continue-at-i+2,
    * shares nothing with the fold-based distributed form.
    */
  private def seqEncode(text: String, rules: Seq[(String, String)]): Seq[String] =
    text.split(" ").toSeq.flatMap { w =>
      var sym: Vector[String] = w.split("").toVector
      rules.foreach { case (l, r) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) { b += (l + r); i += 2 }
          else { b += sym(i); i += 1 }
        }
        sym = b.result()
      }
      sym
    }

  test("p70: distributed BPE encode equals the sequential encoder on the corpus") {
    val docs = Tables.documents(spark, dir)
    val got = Pipeline7.bpeEncode(docs, Pipeline7.BpeRules)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    val texts = docs.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, t) =>
      val want = seqEncode(t, Pipeline7.BpeRules)
      val (n, enc) = got(id)
      assert(enc === want.mkString(" "), s"doc $id encoding diverged")
      assert(n === want.size, s"doc $id token count diverged")
    }
  }

  test("p70: same-symbol-run fold semantics (aaaa under g->g-style rule)") {
    import spark.implicits._
    val docs = Seq((0L, "aaaa aaa gggg")).toDF("doc_id", "text")
    val got = Pipeline7.bpeEncode(docs, Seq("a" -> "a", "g" -> "g")).collect()(0)
    // left-to-right non-overlap: aaaa -> [aa, aa]; aaa -> [aa, a];
    // gggg -> [gg, gg]
    assert(got.getString(2) === "aa aa aa a gg gg")
    assert(got.getInt(1) === 6)
  }

  test("p70: oracle precondition — corpus text is free of the wrap chars and double spaces") {
    // the DuckDB oracle wraps symbols in chr(1)/chr(2) and both sides
    // split words on single spaces; this guard is the device's licence
    val bad = Tables.documents(spark, dir)
      .filter(col("text").contains("") || col("text").contains("") ||
              col("text").contains("  ") || col("text").startsWith(" ") ||
              col("text").endsWith(" "))
      .count()
    assert(bad === 0L)
  }

  test("p70: encoding with p69's trained merge table composes (train -> deploy round trip)") {
    val docs = Tables.documents(spark, dir)
    val trained = Pipeline5.bpeMerges(docs, k = 6)
      .collect().map(r => r.getString(1) -> r.getString(2)).toSeq
    assert(trained.nonEmpty)
    val got = Pipeline7.bpeEncode(docs, trained)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .collect().take(100).foreach { r =>
        val want = seqEncode(r.getString(1), trained).mkString(" ")
        assert(got(r.getLong(0)) === want, s"doc ${r.getLong(0)} trained-table encoding diverged")
      }
  }

  test("p71: distributed perplexity equals an independent sequential bigram LM") {
    val texts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // sequential model: mutable maps, token-at-a-time — no Spark, no SQL
    val c12 = scala.collection.mutable.Map[(String, String), Long]()
    val c1 = scala.collection.mutable.Map[String, Long]()
    val vocab = scala.collection.mutable.Set[String]()
    texts.foreach { case (_, t) =>
      val ws = t.split(" ")
      vocab ++= ws
      ws.sliding(2).filter(_.length == 2).foreach { p =>
        c12((p(0), p(1))) = c12.getOrElse((p(0), p(1)), 0L) + 1
        c1(p(0)) = c1.getOrElse(p(0), 0L) + 1
      }
    }
    val v = vocab.size
    val want = texts.map { case (id, t) =>
      val bgs = t.split(" ").sliding(2).filter(_.length == 2).toSeq
      val s = bgs.map(p => -math.log((c12((p(0), p(1))) + 0.5) / (c1(p(0)) + 0.5 * v))).sum
      id -> (bgs.size.toLong, BigDecimal(s / bgs.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = operators.Pipeline7.perplexity(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (id, (n, x)) =>
      assert(got(id)._1 === n, s"doc $id bigram count diverged")
      assert(math.abs(got(id)._2 - x) < 5e-4, s"doc $id xent ${got(id)._2} vs $x")
    }
  }

  test("p71: round-boundary margin of the unrounded scores is measured, not assumed") {
    // the oracle compares round(xent, 4); the float licence is that no
    // unrounded score sits within reorder-error distance (~1e-12) of a
    // rounding boundary — measure the actual minimum
    val docs = Tables.documents(spark, dir)
    val model = operators.Pipeline7.lmTrain(docs)
    val v = docs.select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t"))).collect()(0).getLong(0)
    val margins = operators.Pipeline7.perplexityScore(docs, model, v)
      .select((abs(col("xent") * 1e4 - round(col("xent") * 1e4, 0))).as("m"))
      .agg(min(col("m"))).collect()(0).getDouble(0)
    assert(margins > 1e-6, f"min round-boundary margin $margins%.2e too thin")
  }

  test("p71: held-out scoring falls back finitely on unseen bigrams and contexts") {
    import spark.implicits._
    val train = Seq((0L, "a b a b c")).toDF("doc_id", "text")
    val model = operators.Pipeline7.lmTrain(train)
    // "c z" unseen bigram AND unseen context z; "a b" seen
    val test = Seq((1L, "a b z q")).toDF("doc_id", "text")
    val got = operators.Pipeline7.perplexityScore(test, model, 3L).collect()(0)
    assert(got.getLong(1) === 3L)
    val x = got.getDouble(2)
    assert(!x.isNaN && !x.isInfinite && x > 0, s"held-out xent must be finite, got $x")
    // hand-check: P(b|a)=(2+.5)/(2+1.5), P(z|b) unseen bigram seen ctx
    // =(0+.5)/(2+1.5), P(q|z) unseen ctx =.5/1.5
    val want = -(math.log(2.5 / 3.5) + math.log(0.5 / 3.5) + math.log(0.5 / 1.5)) / 3
    assert(math.abs(x - want) < 1e-12)
  }

  test("p72: distributed DSIR weights equal an independent sequential implementation") {
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val B = 1024
    def bucket(w: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(7)
      (java.lang.Long.parseLong(hex, 16) % B).toInt
    }
    val ct = new Array[Long](B); val cs = new Array[Long](B)
    var nt = 0L; var ns = 0L
    rows.foreach { case (_, lang, t) =>
      t.split(" ").foreach { w =>
        val b = bucket(w)
        cs(b) += 1; ns += 1
        if (lang == "en") { ct(b) += 1; nt += 1 }
      }
    }
    val lr = Array.tabulate(B)(b =>
      math.log((ct(b) + 0.5) / (nt + 0.5 * B)) - math.log((cs(b) + 0.5) / (ns + 0.5 * B)))
    val want = rows.map { case (id, _, t) =>
      val ws = t.split(" ")
      id -> BigDecimal(ws.map(w => lr(bucket(w))).sum / ws.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = operators.Pipeline7.dsirWeights(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (id, w) =>
      assert(math.abs(got(id) - w) < 5e-4, s"doc $id logw ${got(id)} vs $w")
    }
  }

  test("p72: the signal points at the target — en documents average a higher weight") {
    val byLang = operators.Pipeline7.dsirWeights(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang") === "en").agg(avg(col("logw")).as("w"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"target-domain docs must outweigh the rest: $byLang")
  }

  test("p72: scoring joins broadcast — the only corpus-keyed shuffle is the doc roll-up") {
    val plan = operators.Pipeline7.dsirWeights(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"B-bounded ratio model must broadcast:\n$plan")
  }

  test("p73: no two kept cell-mates are within tau (the guarantee), and no over-drop") {
    // sf0.01: the corpus actually has pairs above the demo threshold,
    // so both directions of the invariant are exercised non-trivially
    val d01 = "/root/testdata/sf0.01"
    val res = operators.Pipeline7.semDedup(spark, d01)
    val emb = Tables.embeddings(spark, d01)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = res.collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(rows.exists(!_._3), "demo threshold must produce drops at sf0.01")
    val byCell = rows.groupBy(_._2)
    byCell.values.foreach { cell =>
      val kept = cell.filter(_._3).map(_._1)
      for (i <- kept.indices; j <- 0 until i)
        assert(cos(emb(kept(i)), emb(kept(j))) < 0.4,
          s"kept pair ${kept(j)},${kept(i)} within tau")
      val ids = cell.map(_._1).toSet
      cell.filterNot(_._3).foreach { case (v, _, _) =>
        assert(ids.exists(u => u < v && cos(emb(u), emb(v)) >= 0.4),
          s"vector $v dropped without a lower-id witness")
      }
    }
  }

  test("p73: on tight duplicate groups, exactly the lowest id of each group survives") {
    import spark.implicits._
    // ids 0..7: one-hot centroid seeds. ids 8..19: 3 groups x 4
    // near-copies of diag(e_{2g}, e_{2g+1}) — cos 0.707 to any
    // centroid (below tau, so seeds are never witnesses), ~1 within
    // the group; the e_{2g} bias sends every copy to cell 2g
    val seeds = (0 until 8).map(i =>
      (i.toLong, Seq.tabulate(8)(j => if (j == i) 1.0f else 0.0f), 0))
    val groups = for (g <- 0 until 3; c <- 0 until 4) yield
      ((8 + g * 4 + c).toLong, Seq.tabulate(8) { j =>
        if (j == 2 * g) 1.0f + 0.001f * (c + 1)
        else if (j == 2 * g + 1) 1.0f else 0.0f }, g + 1)
    val emb = (seeds ++ groups).toDF("vec_id", "embedding", "label")
    val cents = operators.Similarity.seedCentroids(emb, 8)
    val dropped = operators.Pipeline7.semDedupOf(emb, cents, 0.95)
      .filter(!col("kept")).collect().map(_.getLong(0)).toSet
    assert(dropped === Set(9L, 10L, 11L, 13L, 14L, 15L, 17L, 18L, 19L),
      "each duplicate group must keep exactly its lowest id")
  }

  test("p70: encode is map-only — no exchange in the plan") {
    val plan = Pipeline7.bpeEncode(Tables.documents(spark, dir), Pipeline7.BpeRules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"tokenization must never shuffle:\n$plan")
  }
}
