package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis._

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  val df = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "el perro y el gato de la casa"),
    (2L, "ab"),                       // shorter than any ngram
    (3L, "x y x y x")
  ).toDF("doc_id", "text")

  def one(c: org.apache.spark.sql.Column, id: Long = 0L) =
    df.filter($"doc_id" === id).select(c).head()

  test("word ngrams: count, content, short-doc empty") {
    val grams = one(wordNgrams($"text", 3)).getSeq[String](0)
    assert(grams.length === 7) // 9 words -> 7 trigrams
    assert(grams.head === "the quick brown" && grams.last === "the lazy dog")
    assert(one(wordNgrams($"text", 3), 2L).getSeq[String](0).isEmpty)
  }

  test("shingles dedupe repeated ngrams") {
    val sh = one(shingles($"text", 2), 3L).getSeq[String](0)
    assert(sh.sorted === Seq("x y", "y x")) // 4 bigrams, 2 distinct
  }

  test("stopword counting with multiplicity") {
    assert(one(stopwordCount(words($"text"), enStop)).getInt(0) === 2) // the, the
    assert(one(stopwordCount(words($"text"), esStop), 1L).getInt(0) === 5) // el, y, el, de, la
  }

  test("langGuess argmax with fixed tie preference") {
    val r = df.select($"doc_id", langGuess(
      stopwordCount(words($"text"), enStop), stopwordCount(words($"text"), esStop),
      stopwordCount(words($"text"), deStop), stopwordCount(words($"text"), frStop)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r(0L) === "en" && r(1L) === "es")
    assert(r(2L) === "en") // all-zero scores tie-break to en
  }

  test("token counts: whitespace vs bpe-ish vs chars/4") {
    val t = Seq((0L, "don't stop me now")).toDF("doc_id", "text")
    val r = t.select(wsTokenCount($"text"), bpeTokenCount($"text"),
      charEstTokenCount($"text")).head()
    assert(r.getInt(0) === 4)
    // don + ' + t + stop + me + now = 6 bpe-ish tokens
    assert(r.getInt(1) === 6)
    assert(r.getLong(2) === 5) // ceil(17/4)
  }

  test("fingerprint is order- and repetition-invariant; rollingHash is not") {
    val t = Seq((0L, "a b c"), (1L, "c b a a"), (2L, "a b d")).toDF("doc_id", "text")
    val fps = t.select(fingerprint($"text")).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
    val rhs = t.select(rollingHash($"text")).collect().map(_.getLong(0))
    assert(rhs(0) != rhs(1)) // order-sensitive
  }

  test("avg word len / quality are plain deterministic arithmetic") {
    val r = df.filter($"doc_id" === 0L)
      .select(avgWordLen($"text"), qualityScore($"text")).head()
    assert(math.abs(r.getDouble(0) - 35.0 / 9) < 1e-12)
    // quality = min(1, 9/100) - 0.5 * (2/9)
    assert(math.abs(r.getDouble(1) - (0.09 - 0.5 * 2.0 / 9)) < 1e-12)
  }
}
