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

  test("p70: encode is map-only — no exchange in the plan") {
    val plan = Pipeline7.bpeEncode(Tables.documents(spark, dir), Pipeline7.BpeRules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"tokenization must never shuffle:\n$plan")
  }
}
