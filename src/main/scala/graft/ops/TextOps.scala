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
    // isin, not array_contains(<literal array>): see Tokenizer.tokensCol
    df.select(
      id.as("id"),
      length(text).cast("long").as("n_chars"),
      size(ws).cast("long").as("n_ws_tokens"),
      round(size(filter(ws, t => lower(t).isin(Tokenizer.StopWordsSorted: _*)))
        .cast("double") /
        greatest(size(ws), lit(1)), 6).as("stopword_ratio"),
      round(length(regexp_replace(text, "[^A-Z]", "")).cast("double") /
        greatest(length(text), lit(1)), 6).as("upper_ratio"),
      round(length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") /
        greatest(length(text), lit(1)), 6).as("punct_ratio"),
      round(aggregate(ws, lit(0.0), (acc, t) => acc + length(t)) /
        greatest(size(ws), lit(1)), 6).as("mean_word_len"))
  }

  /** Raw-word split for repetition analysis: same alphanumeric-run
    * split as the index tokenizer ([[Tokenizer.SplitPattern]]) but
    * with NO length floor and NO stop-word removal — repetition
    * signals must see every word (a doc spamming "the the the ..."
    * would look clean to the stop-filtered tokenizer). Exposed beside
    * its DuckDB twin ([[repetitionWordsSql]]) — the engine-portable
    * pair pattern; change both together.
    */
  def repetitionWords(text: Column): Column =
    filter(split(lower(text), Tokenizer.SplitPattern), t => length(t) >= 1)

  /** DuckDB twin of [[repetitionWords]]. */
  def repetitionWordsSql(textExpr: String): String =
    s"list_filter(regexp_split_to_array(lower($textExpr), " +
      s"'${Tokenizer.SplitPattern}'), x -> length(x) >= 1)"

  /** Gopher-style repetition metrics per document — the standard
    * pretraining quality filters for degenerate/templated text
    * (Rae et al. 2021 "Scaling Language Models", Table A1):
    *
    *   - `distinct_ratio`        type-token ratio (low = repetitive)
    *   - `top_token_fraction`    share of the most frequent word
    *   - `top_bigram_fraction`   share of the most frequent adjacent
    *                             word pair (denominator n-1 pairs)
    *   - `max_run`               longest run of one word repeated
    *                             back-to-back
    *
    * Plan, chosen for the 100 TB shape: ONE posexplode of the word
    * array feeds all four signals — per-(doc, word) counts for the
    * token stats, a `lead` window for bigrams, and the gaps-and-
    * islands trick (pos − row_number within (doc, word) is constant
    * along a run) for max_run. Everything shuffles on the doc id (or
    * (doc, word)) — no per-row O(n²) higher-order scans, no global
    * ordering, and per-doc window state is O(1), so a single
    * pathological document bounds a task, never the stage.
    */
  def repetitionMetrics(df: DataFrame, id: Column, text: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(id.as("id"), repetitionWords(text).as("toks"))
    val tok = base.select(col("id"), posexplode(col("toks")).as(Seq("pos", "tok")))
    val byPos = Window.partitionBy("id").orderBy("pos")
    val byTok = Window.partitionBy("id", "tok").orderBy("pos")
    val en = tok
      .withColumn("nxt", lead("tok", 1).over(byPos))
      .withColumn("isl", col("pos") - row_number().over(byTok))
    val tokAgg = en.groupBy("id", "tok").agg(count(lit(1)).as("cf"))
      .groupBy("id").agg(
        sum("cf").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("cf").as("top_cf"))
    val biAgg = en.filter(col("nxt").isNotNull)
      .groupBy("id", "tok", "nxt").agg(count(lit(1)).as("bcf"))
      .groupBy("id").agg(max("bcf").as("top_bigram_cf"))
    val runAgg = en.groupBy("id", "tok", "isl").agg(count(lit(1)).as("run"))
      .groupBy("id").agg(max("run").as("max_run"))
    // left joins + guards: a doc with 0 words has no exploded rows at
    // all, one with 1 word has no bigram row; ANSI mode makes an
    // unguarded 0-denominator a hard error, not a NULL
    base.select(col("id"))
      .join(tokAgg, Seq("id"), "left")
      .join(biAgg, Seq("id"), "left")
      .join(runAgg, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(col("n_tokens") > 0,
          round(col("n_distinct").cast("double") / col("n_tokens").cast("double"), 6))
          .otherwise(lit(0.0)).as("distinct_ratio"),
        when(col("n_tokens") > 0,
          round(col("top_cf").cast("double") / col("n_tokens").cast("double"), 6))
          .otherwise(lit(0.0)).as("top_token_fraction"),
        when(col("n_tokens") > 1,
          round(col("top_bigram_cf").cast("double") /
            (col("n_tokens") - 1).cast("double"), 6))
          .otherwise(lit(0.0)).as("top_bigram_fraction"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
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

  /** PII redaction patterns, applied in this order (email before the
    * bare-number rules so an address's digits don't get half-eaten).
    * RE2-safe (no backrefs/lookarounds) so the same strings run
    * unchanged in DuckDB's regexp engine — the engine-portable pair:
    * [[redact]] / [[redactSql]] and [[piiCounts]] / count fragments
    * must change together.
    */
  val RedactRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d{3}[- ]?\\d{3}[- ]?\\d{4}" -> "<PHONE>",
    "\\d{6,}" -> "<NUM>")

  /** Redact PII-shaped spans (emails, IPv4s, phone-shaped and long
    * digit runs) with typed placeholders — the standard pretraining
    * scrub. Pure column expression (codegen'd regexp_replace chain).
    */
  def redact(text: Column): Column =
    RedactRules.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** DuckDB twin of [[redact]] — note the 'g' flag: DuckDB's
    * regexp_replace is first-match-only by default, Spark's is
    * replace-all.
    */
  def redactSql(textExpr: String): String =
    RedactRules.foldLeft(textExpr) { case (e, (pat, tag)) =>
      s"regexp_replace($e, '$pat', '$tag', 'g')"
    }

  /** Per-rule match counts (what a pipeline actually monitors), same
    * pre-redaction text both engines. Column names: n_email, n_ip,
    * n_phone, n_num.
    */
  def piiCounts(text: Column): Seq[Column] =
    RedactRules.map { case (pat, tag) =>
      val name = "n_" + tag.stripPrefix("<").stripSuffix(">").toLowerCase
      size(regexp_extract_all(text, lit(pat), lit(0))).cast("long").as(name)
    }

  /** DuckDB twins of [[piiCounts]] (SELECT-list fragments). */
  def piiCountsSql(textExpr: String): Seq[String] =
    RedactRules.map { case (pat, tag) =>
      val name = "n_" + tag.stripPrefix("<").stripSuffix(">").toLowerCase
      s"len(regexp_extract_all($textExpr, '$pat'))::BIGINT AS $name"
    }

  /** Sliding-window chunking for context-length-bounded training/RAG:
    * the word stream cut into `size`-word windows advancing by
    * `size - overlap`, final partial window kept. Pure per-row column
    * math (sequence + slice inside one posexplode) — the explode is
    * the only fan-out, there is no join or shuffle at all, so the
    * operator is embarrassingly parallel at any corpus size. Word
    * split = [[repetitionWords]] (same DuckDB twin). Chunk count for
    * n > 0 words: 1 + ceil(max(0, n - size) / (size - overlap)),
    * exact integer arithmetic in both engines; n = 0 emits nothing.
    */
  def slidingChunks(
      df: DataFrame, id: Column, text: Column,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    val base = df.select(id.as("id"), repetitionWords(text).as("toks"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("toks")).cast("long"))
      .filter(col("n") > 0)
    base.select(
      col("id"), col("n"),
      posexplode(transform(
        sequence(lit(0L),
          floor((greatest(col("n") - size, lit(0L)) + (step - 1)) / step).cast("long")),
        i => concat_ws(" ",
          slice(col("toks"), (i * step + 1).cast("int"), lit(size)))))
        .as(Seq("chunk_idx", "chunk")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"),
        wsTokenCount(col("chunk")).as("chunk_words"))
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
    *
    * Marker counting is one codegen'd `regexp_count` per language
    * (alternation bounded by non-letter lookarounds), not a
    * split + higher-order filter: the HOF form is interpreted
    * per-token and was the whole cost of q_lang_id. Equivalence with
    * the split-token formulation: the split pattern `[^\p{L}]+`
    * makes token boundaries exactly the non-letter characters, which
    * is what the lookarounds assert, so matches are precisely the
    * tokens equal to a marker (pinned against the pure-Scala twin in
    * OpsSpec, including digit-boundary and accent cases).
    */
  def langIdCol(text: Column): Column = {
    val lt = lower(text)
    val scores = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(
        regexp_count(lt,
          lit("(?<!\\p{L})(?:" + markers.mkString("|") + ")(?!\\p{L})")).as("score"),
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
