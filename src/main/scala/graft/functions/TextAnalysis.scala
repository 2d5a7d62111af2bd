package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline operators.
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * codegen'd Catalyst expressions, no UDFs — so whole-stage codegen spans
  * the full scan→analyze pipeline and the operators scale linearly with
  * input splits (no shuffle is introduced by any function in this object).
  *
  * The document model is the driver's `documents` table: `text` is
  * space-separated tokens (FIXTURES.md §B).
  */
object TextAnalysis {

  /** Tokenize on single spaces (the corpus guarantees single-space
    * separation; for messy corpora swap in `split(c, "\\s+")`).
    */
  def words(c: Column): Column = split(c, " ")

  /** Word-level n-grams as space-joined strings, empty array when the
    * document has fewer than n words. The `sequence` guard matters:
    * sequence(0, negative) would produce a descending range, not empty.
    */
  def wordNgrams(c: Column, n: Int): Column = {
    val ws = words(c)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + 1, lit(n)), " "))
    ).otherwise(array().cast("array<string>"))
  }

  /** Distinct shingle set — the dedup unit for MinHash / Jaccard. */
  def shingles(c: Column, n: Int): Column = array_distinct(wordNgrams(c, n))

  // --- language-ID by stopword evidence (n-gram/stopword heuristic) ---

  val enStop = Seq("the", "a", "of", "and", "to", "in", "is")
  val esStop = Seq("el", "la", "de", "los", "y", "que", "un")
  val deStop = Seq("der", "die", "und", "das", "ein", "nicht")
  val frStop = Seq("le", "les", "et", "des", "une", "dans")

  /** Count of tokens belonging to a stopword list (with multiplicity). */
  def stopwordCount(wordsCol: Column, stops: Seq[String]): Column =
    size(filter(wordsCol, w => w.isin(stops: _*)))

  /** Language guess = argmax of per-language stopword evidence, fixed
    * preference order en > es > de > fr on ties (must match the oracle's
    * CASE chain exactly).
    */
  def langGuess(sEn: Column, sEs: Column, sDe: Column, sFr: Column): Column =
    when(sEn >= sEs && sEn >= sDe && sEn >= sFr, "en")
      .when(sEs >= sDe && sEs >= sFr, "es")
      .when(sDe >= sFr, "de")
      .otherwise("fr")

  /** [[langGuess]] straight from a text column — THE one composition
    * of the four stopword counts, shared by `Engine.curate`, the SQL
    * `lang_guess` function and the specs (a fifth language or a
    * tie-break change lands everywhere at once). The registered p07
    * keeps its explicit form because it also OUTPUTS the four counts.
    */
  def langGuessOf(c: Column): Column = {
    val w = words(c)
    langGuess(stopwordCount(w, enStop), stopwordCount(w, esStop),
      stopwordCount(w, deStop), stopwordCount(w, frStop))
  }

  // --- quality scoring ---

  /** Characters net of separators / word count. */
  def avgWordLen(c: Column): Column = {
    val nw = size(words(c))
    length(regexp_replace(c, " ", "")).cast("double") / nw
  }

  /** Ratio of English stopwords to total tokens. */
  def stopwordRatio(c: Column): Column =
    stopwordCount(words(c), enStop).cast("double") / size(words(c))

  /** Scalar quality score in [0,1]: length evidence minus stopword
    * saturation. Deterministic arithmetic only (oracle-parity safe).
    */
  def qualityScore(c: Column): Column = {
    val nw = size(words(c)).cast("double")
    least(lit(1.0), nw / lit(100.0)) - lit(0.5) * stopwordRatio(c)
  }

  // --- token counting ---

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column = size(words(c))

  /** BPE-ish subword estimate: alnum runs + leftover symbols, the common
    * pre-tokenizer shape. Codegen'd regexp, no UDF.
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0)))

  /** chars/4 heuristic estimate used for budget planning. */
  def charEstTokenCount(c: Column): Column =
    ceil(length(c).cast("double") / lit(4.0)).cast("long")

  // --- fingerprinting ---

  /** Canonical-form document fingerprint (sorted distinct token set,
    * md5) — the key for fuzzy-exact dedup: word order and repetition
    * insensitive.
    */
  def fingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(words(c))), " "))

  /** Rolling polynomial hash over tokens (order-sensitive fingerprint;
    * pure fold, no shuffle). Word hashes are md5-derived 28-bit values
    * so any engine reproduces them; the accumulator stays below 2^30 so
    * the multiply never exceeds 2^50 — safe under ANSI overflow
    * checking (and DuckDB's checked BIGINT arithmetic).
    */
  def rollingHash(c: Column): Column = {
    val m = lit(1073741824L) // 2^30
    aggregate(words(c), lit(0L),
      (acc, w) => pmod(acc * lit(1000003L) +
        conv(substring(md5(w), 1, 7), 16, 10).cast("long"), m))
  }
}
