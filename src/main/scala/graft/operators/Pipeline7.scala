package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Pipeline operators, batch 7: the tokenizer-application and
  * corpus-quality-model stages that sit between curation (batches 1–6)
  * and the training loop — BPE encoding with a fixed merge table,
  * n-gram language-model perplexity scoring, and DSIR-style importance
  * weighting against a target domain.
  */
object Pipeline7 {

  // ---- BPE encoding with a fixed merge table (p70) ----

  /** The published merge table of the registered query: a fixed,
    * ordered list of BPE merge rules, exactly the artifact a trained
    * tokenizer ships (GPT-2's `merges.txt` is this table at 50k rules).
    * Training produces it once ([[Pipeline5.bpeMerges]], p69); encoding
    * applies it everywhere, so the registered encode uses a FIXED table
    * — corpus-independent, the way a real tokenizer is deployed — and a
    * spec pins that encoding with a trained table gives the same result
    * as the sequential reference encoder. Rules chain deliberately
    * (a+b→ab, t+ab→tab, tab+le→table) and include a same-symbol rule
    * (g+g) to keep the left-to-right non-overlap semantics honest.
    */
  val BpeRules: Seq[(String, String)] = Seq(
    "a" -> "b", "t" -> "ab", "l" -> "e", "tab" -> "le", "g" -> "g",
    "h" -> "a", "s" -> "h", "ha" -> "sh", "r" -> "o", "ro" -> "w")

  /** One BPE merge pass: fuse every left-to-right non-overlapping
    * (l, r) adjacency in `arr` into the single symbol l+r. The fold
    * carry re-checks the fused symbol, which reproduces the sequential
    * algorithm's continue-past-the-merge scan exactly (the p69 device;
    * the same-symbol-run case is spec-pinned there and here).
    */
  private def fuseRule(l: String, r: String, arr: Column): Column =
    aggregate(arr, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Encode every document with an ordered BPE merge table: per word,
    * start from the character split and apply each rule in rank order
    * as one fold pass. Tokens are emitted space-joined (symbols are
    * substrings of space-free words, so the joint is unambiguous).
    *
    * Scale shape: map-only — the merge table is a plan-time constant
    * (rules become literal fold expressions, the broadcast-model
    * contract taken to its limit: the model ships inside the plan), so
    * encoding shuffles nothing and pipelines into whatever consumes
    * the tokens (p31 packing, p53 id-encoding). This is the shape that
    * matters at 100 TB: tokenization is the single widest map of a
    * training-data pipeline and must never be the shuffle.
    */
  def bpeEncode(docs: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    val enc = transform(split(col("text"), " "), w => {
      val chars: Column = split(w, "")
      val merged = rules.foldLeft(chars) { case (a, (l, r)) => fuseRule(l, r, a) }
      array_join(merged, " ")
    })
    docs.select(col("doc_id"), array_join(enc, " ").as("bpe_text"))
      .select(col("doc_id"),
        size(split(col("bpe_text"), " ")).as("n_tokens"),
        col("bpe_text"))
  }

  /** p70: encode `documents` with the fixed merge table. The orderBy is
    * the oracle-hash contract; the library entry ([[bpeEncode]]) is
    * sort-free.
    */
  def bpeEncodeQuery(s: SparkSession, d: String): DataFrame =
    bpeEncode(documents(s, d), BpeRules).orderBy(col("doc_id"))

  /** The oracle applies the SAME rule table through a DIFFERENT device:
    * symbols are wrapped as chr(1)·sym·chr(2) and each rule is one SQL
    * `replace` of the wrapped adjacency — string replace is
    * left-to-right non-overlapping and resumes AFTER the replacement,
    * which is exactly the fold-carry semantics, while the wrapping
    * makes partial-symbol matches impossible (a spec pins that the
    * corpus contains neither control char). Independent mechanisms
    * agreeing is the point of the differential.
    */
  val bpeEncodeOracle: String = {
    val wrapped = BpeRules.foldLeft(
      "array_to_string(list_transform(regexp_split_to_array(w, ''), " +
        "c -> chr(1)||c||chr(2)), '')") { case (inner, (l, r)) =>
      s"replace($inner, chr(1)||'$l'||chr(2)||chr(1)||'$r'||chr(2), " +
        s"chr(1)||'$l$r'||chr(2))"
    }
    s"""WITH enc AS (
       |  SELECT doc_id,
       |         array_to_string(list_transform(string_split(text, ' '),
       |           w -> rtrim(replace(replace($wrapped,
       |                  chr(1), ''), chr(2), ' '))), ' ') AS bpe_text
       |  FROM documents)
       |SELECT doc_id,
       |       CAST(len(string_split(bpe_text, ' ')) AS INTEGER) AS n_tokens,
       |       bpe_text
       |FROM enc ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p70_bpe_encode" -> (bpeEncodeQuery _),
  )

  val oracles: Map[String, String] = Map(
    "p70_bpe_encode" -> bpeEncodeOracle,
  )
}
