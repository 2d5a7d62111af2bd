package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables._

/** Typed Dataset surface: the same engine driven through case-class
  * `Encoder`s and an `Aggregator[IN, BUF, OUT]` — the public typed API
  * (vs the Catalyst-internal TypedImperativeAggregate used by TopK).
  * Aggregators get the same partial/merge two-phase execution as
  * builtin aggregates, so the corpus-stats pass shuffles one small
  * buffer per group per partition.
  */
object TypedStats {

  case class Doc(doc_id: Long, text: String)

  case class CorpusBuf(nDocs: Long, nTokens: Long, nChars: Long, maxTokens: Long)

  case class CorpusStats(lang_len: Long, n_docs: Long, n_tokens: Long,
                         avg_chars: Double, max_tokens: Long)

  /** Corpus statistics as a typed Aggregator: token/char tallies with
    * exact integer arithmetic (order-independent, oracle-safe).
    */
  val corpusAgg: Aggregator[Doc, CorpusBuf, CorpusBuf] =
    new Aggregator[Doc, CorpusBuf, CorpusBuf] {
      def zero: CorpusBuf = CorpusBuf(0L, 0L, 0L, 0L)
      def reduce(b: CorpusBuf, d: Doc): CorpusBuf = {
        val toks = d.text.split(" ").length.toLong
        CorpusBuf(b.nDocs + 1, b.nTokens + toks, b.nChars + d.text.length,
          math.max(b.maxTokens, toks))
      }
      def merge(a: CorpusBuf, b: CorpusBuf): CorpusBuf =
        CorpusBuf(a.nDocs + b.nDocs, a.nTokens + b.nTokens,
          a.nChars + b.nChars, math.max(a.maxTokens, b.maxTokens))
      def finish(b: CorpusBuf): CorpusBuf = b
      def bufferEncoder: Encoder[CorpusBuf] = Encoders.product[CorpusBuf]
      def outputEncoder: Encoder[CorpusBuf] = Encoders.product[CorpusBuf]
    }

  /** Per-bucket corpus stats, grouped by first-word length (a cheap
    * deterministic stratifier) through the typed groupByKey path.
    */
  def corpusStatsByLen(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[Doc] = documents(s, d).select(col("doc_id"), col("text")).as[Doc]
    ds.groupByKey(doc => doc.text.takeWhile(_ != ' ').length.toLong)
      .agg(corpusAgg.toColumn.name("stats"))
      .map { case (k, b) =>
        CorpusStats(k, b.nDocs, b.nTokens,
          math.rint(b.nChars.toDouble / b.nDocs * 10000) / 10000, b.maxTokens)
      }
      .toDF()
      .orderBy(col("lang_len"))
  }

  val corpusStatsOracle: String =
    """SELECT CAST(length(string_split(text, ' ')[1]) AS BIGINT) AS lang_len,
      | count(*) AS n_docs,
      | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      | round(CAST(sum(length(text)) AS DOUBLE) / count(*), 4) AS avg_chars,
      | CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
      |FROM documents GROUP BY lang_len ORDER BY lang_len""".stripMargin
}
