package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Entity-resolution cascade (reference `app.py:694-782`): match a
  * pasted/parsed citation against the canonical corpus by trying
  * progressively fuzzier keys, each stage consuming only the rows the
  * previous stages failed to match:
  *
  *   1. exact identifier        (reference: exact PMID, `:714-722`)
  *   2. normalized string key   (reference: normalized DOI / exact
  *                               normalized title, `:724-747`)
  *   3. fuzzy token overlap     (reference: fuzzy title >=0.4 and
  *                               author+year fallbacks, `:749-782`,
  *                               thresholds `:744,896`)
  *
  * Stage 3 is a shared-token EQUI-JOIN prefilter (explode distinct
  * tokens, join on token, count intersections) — never a cross join —
  * so the pair space scales with token-match fan-out, not |Q|x|C|.
  * Every stage picks exactly one best match per query row
  * deterministically.
  */
object EntityResolution {

  /** Reference-string field extraction (reference `app.py:530-567`):
    * numeric id (6-10 digits), DOI-shaped token, parenthesized year,
    * quoted title, leading author segment (text before the first
    * period — the reference's `authors` field from pasted citation
    * lines). Missing fields extract as ''.
    */
  def parseCitation(c: Column): Column = struct(
    regexp_extract(c, "\\b(\\d{6,10})\\b", 1).as("ref_id"),
    regexp_extract(c, "\\b(10\\.\\d{3,6}/[^\\s,;]+)", 1).as("doi"),
    regexp_extract(c, "\\(((?:19|20)\\d{2})\\)", 1).as("year"),
    regexp_extract(c, "\"([^\"]+)\"", 1).as("title"),
    regexp_extract(c, "^([^.]+)\\.", 1).as("authors"))

  /** Normalized DOI key (reference `app.py:707-710`: strip + lower;
    * the `doi:` prefix strip is already done by [[parseCitation]]'s
    * extraction regex, which starts matching at `10.`).
    */
  def normDoi(c: Column): Column = lower(trim(c))

  /** Engine-portable string normalization for stage-2 keys. */
  def normKey(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Distinct meaningful tokens for the stage-3 overlap join. */
  def tokenSet(c: Column): Column = array_distinct(Tokenizer.tokensCol(c))

  /** Cascade resolve.
    *
    * @param queries (qid, exact_key, norm_key, tk: array<string>)
    * @param catalog (cid, exact_key, norm_key, tk: array<string>)
    * @return (qid, cid, method, score) — one row per matched query;
    *         unmatched queries are absent (join with "left" outside if
    *         a not-found marker is wanted)
    */
  def resolveCascade(
      queries: DataFrame,
      catalog: DataFrame,
      minInter: Int = 3,
      minOverlap: Double = 0.4): DataFrame = {
    val q = queries.select(col("qid"), col("exact_key"), col("norm_key"), col("tk"))
    val c = catalog.select(col("cid"),
      col("exact_key").as("c_exact"), col("norm_key").as("c_norm"),
      col("tk").as("c_tk"))

    def pickOne(matches: DataFrame, order: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(order: _*)
      matches.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }

    // stage 1: exact identifier (empty keys never join)
    val s1 = pickOne(
      q.filter(length(col("exact_key")) > 0)
        .join(c.filter(length(col("c_exact")) > 0),
          col("exact_key") === col("c_exact"))
        .select(col("qid"), col("cid")),
      Seq(col("cid").asc))
      .withColumn("method", lit("exact_id")).withColumn("score", lit(1.0))

    // stage 2: normalized string key, unmatched rows only
    val r1 = q.join(s1.select("qid"), Seq("qid"), "left_anti")
    val s2 = pickOne(
      r1.filter(length(col("norm_key")) > 0)
        .join(c.filter(length(col("c_norm")) > 0),
          col("norm_key") === col("c_norm"))
        .select(col("qid"), col("cid")),
      Seq(col("cid").asc))
      .withColumn("method", lit("norm_key")).withColumn("score", lit(1.0))

    // stage 3: fuzzy token overlap with equi-join prefilter
    val r2 = r1.join(s2.select("qid"), Seq("qid"), "left_anti")
    val qTok = r2.select(col("qid"), size(col("tk")).as("qsz"),
      explode(col("tk")).as("tok"))
    val cTok = c.select(col("cid"), explode(col("c_tk")).as("tok"))
    val inter = qTok.join(cTok, "tok")
      .groupBy(col("qid"), col("qsz"), col("cid"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("overlap", col("inter").cast("double") / col("qsz"))
      .filter(col("inter") >= minInter && col("overlap") >= minOverlap)
    val s3 = pickOne(
      inter.select(col("qid"), col("cid"), col("overlap")),
      Seq(col("overlap").desc, col("cid").asc))
      .withColumn("method", lit("fuzzy_overlap"))
      .withColumn("score", col("overlap")).drop("overlap")

    s1.unionByName(s2).unionByName(s3)
      .select(col("qid"), col("cid"), col("method"), col("score"))
  }

  /** Full five-stage cascade — the reference's complete fallback chain
    * (`app.py:694-782`):
    *
    *   1. exact id        — PMID equality (`:698-704`)
    *   2. normalized DOI  — equi-join on [[normDoi]] keys (`:706-717`)
    *   3. exact norm title— equi-join on [[normKey]] keys (`:723-729`)
    *   4. fuzzy title     — token-overlap >= `minOverlap` (0.4,
    *                        `:731-748`), equi-join prefilter on shared
    *                        tokens (never a cross join)
    *   5. author + year   — reference `:751-782`: pub_year equality
    *                        plus an authors-prefix match, then either a
    *                        title token overlap >= `ayOverlap` (0.3,
    *                        `:770-775`) or, with no title, a UNIQUE
    *                        (author, year) candidate (`:777-780`).
    *                        Two deliberate tightenings for scale: the
    *                        reference's `authors LIKE '%prefix%'`
    *                        containment becomes prefix-KEY equality so
    *                        the stage stays an equi-join, and the
    *                        first-10-words cap on the overlap sets (a
    *                        SQLite-era micro-optimization) is dropped —
    *                        overlap is pair-local array_intersect over
    *                        the full distinct-token sets, never a
    *                        second join.
    *
    * @param queries (qid, exact_key, doi_key, norm_key, author_key,
    *                year, tk)
    * @param catalog (cid, exact_key, doi_key, norm_key, author_key,
    *                year, tk)
    * @return (qid, cid, method, score), one row per matched query
    */
  def resolveCascadeFull(
      queries: DataFrame,
      catalog: DataFrame,
      minInter: Int = 3,
      minOverlap: Double = 0.4,
      ayOverlap: Double = 0.3): DataFrame = {
    val q = queries.select(col("qid"), col("exact_key"), col("doi_key"),
      col("norm_key"), col("author_key"), col("year"), col("tk"))
    val c = catalog.select(col("cid"),
      col("exact_key").as("c_exact"), col("doi_key").as("c_doi"),
      col("norm_key").as("c_norm"), col("author_key").as("c_author"),
      col("year").as("c_year"), col("tk").as("c_tk"))

    def pickOne(matches: DataFrame, order: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(order: _*)
      matches.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }
    def keyStage(in: DataFrame, qKey: String, cKey: String, method: String): DataFrame =
      pickOne(
        in.filter(length(col(qKey)) > 0)
          .join(c.filter(length(col(cKey)) > 0), col(qKey) === col(cKey))
          .select(col("qid"), col("cid")),
        Seq(col("cid").asc))
        .withColumn("method", lit(method)).withColumn("score", lit(1.0))
    def residual(in: DataFrame, matched: DataFrame): DataFrame =
      in.join(matched.select("qid"), Seq("qid"), "left_anti")

    val s1 = keyStage(q, "exact_key", "c_exact", "exact_id")
    val r1 = residual(q, s1)
    val s2 = keyStage(r1, "doi_key", "c_doi", "doi")
    val r2 = residual(r1, s2)
    val s3 = keyStage(r2, "norm_key", "c_norm", "norm_key")
    val r3 = residual(r2, s3)

    // stage 4: fuzzy token overlap with equi-join prefilter
    val qTok = r3.select(col("qid"), size(col("tk")).as("qsz"),
      explode(col("tk")).as("tok"))
    val cTok = c.select(col("cid"), explode(col("c_tk")).as("tok"))
    val inter = qTok.join(cTok, "tok")
      .groupBy(col("qid"), col("qsz"), col("cid"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("overlap", col("inter").cast("double") / col("qsz"))
      .filter(col("inter") >= minInter && col("overlap") >= minOverlap)
    val s4 = pickOne(
      inter.select(col("qid"), col("cid"), col("overlap")),
      Seq(col("overlap").desc, col("cid").asc))
      .withColumn("method", lit("fuzzy_overlap"))
      .withColumn("score", col("overlap")).drop("overlap")
    val r4 = residual(r3, s4)

    // stage 5: (author_key, year) equi-join; title token overlap
    // decides when a title exists, else the match must be unique
    val ay = r4.filter(length(col("author_key")) > 0 && length(col("year")) > 0)
      .join(c.filter(length(col("c_author")) > 0),
        col("author_key") === col("c_author") && col("year") === col("c_year"))
      .withColumn("ov",
        when(size(col("tk")) > 0,
          size(array_intersect(col("tk"), col("c_tk")))
            .cast("double") / size(col("tk")))
          .otherwise(lit(0.0)))
      .withColumn("ncand", count(lit(1)).over(Window.partitionBy(col("qid"))))
      .filter(
        (size(col("tk")) > 0 && col("ov") >= ayOverlap) ||
          (size(col("tk")) === 0 && col("ncand") === 1))
    val s5 = pickOne(
      ay.select(col("qid"), col("cid"), col("ov")),
      Seq(col("ov").desc, col("cid").asc))
      .withColumn("method", lit("author_year"))
      .withColumn("score", col("ov")).drop("ov")

    s1.unionByName(s2).unionByName(s3).unionByName(s4).unionByName(s5)
      .select(col("qid"), col("cid"), col("method"), col("score"))
  }
}
