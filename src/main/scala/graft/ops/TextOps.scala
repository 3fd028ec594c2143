package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Text-analysis operators for training-data pipelines: quality
  * scoring, token counting, document fingerprinting, language ID.
  */
object TextOps {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0)).cast("long")

  /** BPE-ish subword count: alpha runs, digit runs, and isolated
    * non-space symbols each count as one token.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Quality metrics (reference-style heuristics: length, stop-word
    * ratio, mean word length, uppercase/punctuation ratios).
    */
  def qualityMetrics(df: DataFrame, id: Column, text: Column): DataFrame = {
    val ws = filter(split(text, "\\s+"), t => length(t) > 0)
    val stops = array(Tokenizer.StopWordsSorted.map(lit): _*)
    df.select(
      id.as("id"),
      length(text).cast("long").as("n_chars"),
      size(ws).cast("long").as("n_ws_tokens"),
      round(size(filter(ws, t => array_contains(stops, lower(t)))).cast("double") /
        greatest(size(ws), lit(1)), 6).as("stopword_ratio"),
      round(length(regexp_replace(text, "[^A-Z]", "")).cast("double") /
        greatest(length(text), lit(1)), 6).as("upper_ratio"),
      round(length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") /
        greatest(length(text), lit(1)), 6).as("punct_ratio"),
      round(aggregate(ws, lit(0.0), (acc, t) => acc + length(t)) /
        greatest(size(ws), lit(1)), 6).as("mean_word_len"))
  }

  /** Content fingerprint: md5 over the sorted distinct token set —
    * whitespace/word-order insensitive near-exact dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(
      filter(split(lower(text), Tokenizer.SplitPattern),
        t => length(t) >= Tokenizer.MinLen)))))

  /** Rolling polynomial hash (Rabin-Karp, base 131 mod the Mersenne
    * prime 2^31-1; intermediate products stay < 2^40, overflow-free)
    * over the raw text — pure Scala, used for chunk fingerprints.
    */
  def rollingHash(s: String): Long = {
    val Mod = 2147483647L
    val Base = 131L
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * Base + s.charAt(i).toLong) % Mod
      i += 1
    }
    h
  }

  /** Language-ID profiles: most-frequent stop words per language
    * (n-gram/marker heuristic; compact on purpose — this is the
    * classic "guess by function words" identifier).
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "des", "une", "que", "dans"),
    "es" -> Seq("el", "los", "las", "es", "no", "una", "que", "por", "con", "para"),
    "it" -> Seq("il", "che", "di", "non", "per", "una", "sono", "con", "del", "gli"))

  /** Marker-word language ID over a column: language with the highest
    * marker hit count, 'und' (undetermined) when nothing matches.
    * Pure column expression — no UDF.
    */
  def langIdCol(text: Column): Column = {
    val ws = split(lower(text), "[^\\p{L}]+")
    val scores = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(
        size(filter(ws, t => array_contains(array(markers.map(lit): _*), t))).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Pure-Scala twin of [[langIdCol]] for tests. */
  def langId(text: String): String = {
    val toks = "[^\\p{L}]+".r.split(text.toLowerCase).filter(_.nonEmpty)
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      (toks.count(markers.contains), lang)
    }
    val best = scored.max
    if (best._1 > 0) best._2 else "und"
  }
}
