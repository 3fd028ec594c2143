package graft.tokenize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The tokenizer contract everything hangs on (SURVEY.md §7.2).
  *
  * Semantics mirror the only tokenizer the reference exhibits
  * (reference `app.py:844-858`): lowercase + hyphen/underscore
  * normalization, split on non-alphanumeric runs, drop tokens of
  * length <= 2, drop the reference's stop-word list (copied verbatim
  * from `app.py:847-855`).
  *
  * The same spec exists in three forms that MUST stay identical:
  *   1. [[tokenize]]     — pure Scala (used by the exact-BM25 oracle
  *                         and by query analysis)
  *   2. [[tokensCol]]    — Catalyst column expression (codegen-able,
  *                         used by the distributed index build)
  *   3. duckdbTokensSql  — ANSI-ish SQL fragment for the DuckDB
  *                         correctness oracle (see SparkEntry)
  */
object Tokenizer {

  /** Stop words, verbatim from reference `app.py:847-855`. */
  val StopWords: Set[String] = Set(
    "a", "an", "the", "of", "in", "on", "at", "to", "for", "with", "by",
    "and", "or", "but", "is", "are", "was", "were", "be", "been", "being",
    "have", "has", "had", "do", "does", "did", "will", "would", "should",
    "could", "may", "might", "must", "can", "this", "that", "these", "those",
    "as", "from", "into", "onto", "upon", "about", "above", "below", "between",
    "among", "during", "through", "throughout", "within", "without", "against",
    "prospective", "randomized", "controlled", "trial", "study", "studies",
    "effect", "effects", "comparison", "comparing", "treatment", "treatments")

  /** Sorted for deterministic literal-array construction. */
  val StopWordsSorted: Array[String] = StopWords.toArray.sorted

  val SplitPattern = "[^a-z0-9]+"
  val MinLen = 3 // keep tokens with length > 2 (reference: `len(w) > 2`)

  private val splitRe = SplitPattern.r

  /** Pure-Scala tokenizer. tf = count of a term within the result;
    * dl = result length.
    */
  def tokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    splitRe
      .split(text.toLowerCase)
      .filter(t => t.length >= MinLen && !StopWords.contains(t))
  }

  /** Column-expression tokenizer — identical semantics to [[tokenize]],
    * stays inside whole-stage codegen (no UDF).
    *
    * Stop-word membership is `isin` (an `In` predicate), NOT
    * `array_contains(<literal array>, t)`: constant folding does not
    * descend into higher-order-function lambdas, so the literal-array
    * form rebuilds the 60-element array once per token of every
    * document (the known trap in CLAUDE.md / memory) — measured ~2x
    * the whole tokenize cost at the gate SFs.
    */
  def tokensCol(text: Column): Column =
    filter(
      split(lower(text), SplitPattern),
      t => length(t) >= lit(MinLen) && !t.isin(StopWordsSorted: _*))

  /** SQL stop-list literal, usable in both Spark SQL and DuckDB. */
  def stopListSql: String =
    StopWordsSorted.map(w => s"'$w'").mkString("(", ",", ")")

  /** Form 3 of the contract: the DuckDB token-list fragment over a
    * text expression — split/min-length/stop-list built from the SAME
    * constants as [[tokenize]]/[[tokensCol]], so the 3-way contract
    * has one SQL source (oracles interpolate this instead of copying
    * the pattern inline).
    */
  def duckdbTokensSql(textExpr: String): String =
    s"list_filter(regexp_split_to_array(lower($textExpr), '$SplitPattern'), " +
      s"x -> length(x) >= $MinLen AND x NOT IN $stopListSql)"

  /** Length-filter-only variant (no stop list) — the dedup /
    * fingerprint / KMV paths tokenize without stop-word removal
    * (matching `Dedup.shingles` / `TextOps.fingerprint`).
    */
  def duckdbTokensLenOnlySql(textExpr: String): String =
    s"list_filter(regexp_split_to_array(lower($textExpr), '$SplitPattern'), " +
      s"x -> length(x) >= $MinLen)"
}
