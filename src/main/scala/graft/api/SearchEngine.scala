package graft.api

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{SegmentIO, Varbyte}
import graft.index.SegmentIO.PostingBlock
import graft.model._
import graft.query.{Bm25, Wand}
import graft.tokenize.Tokenizer

/** Query-side facade mirroring the reference's
  * `SemanticSearchEngine.search` lifecycle (`src/search_engine.py:141-360`;
  * SURVEY §3.1):
  *
  *   parse → dictionary lookup (segment selection via term-pushdown
  *   scans) → per-shard posting traversal (block-max WAND / posting
  *   intersection) → distributed top-k' merge → broadcast metadata
  *   join → residual filters (ts range / role / tool, applied
  *   post-retrieval with 5x over-fetch exactly like the reference,
  *   `src/search_engine.py:198-212,247-289`) → truncate k → 4-dp
  *   score rounding (`:281`) → keyword boost/penalize rescoring
  *   (`:362-461`) → match statistics (`:324-339`).
  *
  * Loaded segment metadata (stats, per-shard norms lineage) is cached
  * across queries, the analog of the reference's lazy index init
  * (`src/search_engine.py:48-70`).
  */
class SearchEngine(spark: SparkSession, indexDir: String) {
  import spark.implicits._

  val MaxTopK = 10000 // reference MAX_TOP_K, config/config.py:271
  val OverFetchFactor = 5 // reference search_k = top_k * 5

  lazy val stats: SegmentIO.IndexStats = SegmentIO.readStats(indexDir)

  /** Retrieval core: BM25 top-k as (doc_id, score) — exact scores,
    * no rounding (rounding is an output-boundary contract only).
    */
  def retrieve(
      queryText: String,
      k: Int,
      minScore: Double = 0.0,
      conjunctive: Boolean = false): DataFrame = {
    val qTerms: Array[String] = Tokenizer.tokenize(queryText).distinct.sorted
    val empty = spark.emptyDataset[(Long, Double)].toDF("doc_id", "score")
    if (qTerms.isEmpty) return empty

    // dictionary lookup — term-IN predicate pushes into the parquet scan
    val dictRows = SegmentIO.readDict(spark, indexDir)
      .filter($"term".isin(qTerms.toSeq: _*)).collect()
    val n = stats.numDocs
    val termMeta: Map[String, (Double, Double)] = dictRows.map { d =>
      val idf = Bm25.idf(n, d.df)
      d.term -> (idf, Bm25.boundScore(idf, d.max_tf, d.min_dl, stats.avgdl))
    }.toMap
    val present = qTerms.filter(termMeta.contains)
    if (present.isEmpty) return empty
    if (conjunctive && present.length < qTerms.length) return empty // AND with a zero-df term

    val postings = SegmentIO.readPostings(spark, indexDir)
      .filter($"term".isin(present.toSeq: _*))

    // locals only — the task closure must not capture `this`
    val avgdl = stats.avgdl
    val metaLocal = termMeta
    val presentLocal = present
    val kLocal = math.min(k, MaxTopK)
    val minScoreLocal = minScore
    val conjLocal = conjunctive
    val pageSizeLocal = stats.normsPageSize
    val dpsLocal = stats.docsPerShard
    val dirLocal = indexDir

    // Only the term-pruned postings shuffle; each shard's task reads
    // its OWN norms/shard=N partition dir directly (no job, no
    // shuffle) and caches the decoded pages executor-locally across
    // queries — at 10⁹ docs the old per-query norms cogroup
    // re-shuffled ~GBs of dl bytes per query, the distributed path's
    // scale-killer.
    val hits = postings
      .groupByKey(_.shard)
      .flatMapGroups { (shard: Int, blocks: Iterator[PostingBlock]) =>
        // two-level dl lookup: page = (doc - shardBase) / pageSize,
        // then in-page offset — no array or row ever scales with
        // shard size, and no Long difference is narrowed to Int
        // before the page division
        val dlArrs = SegmentIO.shardDlPages(dirLocal, shard)
        if (dlArrs.isEmpty) Iterator.empty
        else {
          val shardBase = shard.toLong * dpsLocal
          val byTerm = blocks.toArray.groupBy(_.term)
          val cursors = presentLocal.flatMap { t =>
            byTerm.get(t).map { bs =>
              val (idf, maxScore) = metaLocal(t)
              new Wand.TermCursor(t, idf, maxScore, bs, avgdl)
            }
          }
          if (cursors.isEmpty || (conjLocal && cursors.length < presentLocal.length))
            Iterator.empty
          else {
            val dl = (d: Long) => {
              val rel = d - shardBase
              dlArrs((rel / pageSizeLocal).toInt)((rel % pageSizeLocal).toInt)
            }
            val res =
              if (conjLocal)
                Wand.topKConjunctive(cursors, dl, avgdl, kLocal, minScoreLocal)
              else
                Wand.topKDisjunctive(cursors, dl, avgdl, kLocal, minScoreLocal)
            res.iterator
          }
        }
      }
      .toDF("doc_id", "score")

    // distributed top-k merge: per-shard heaps → TakeOrderedAndProject
    hits.orderBy(desc("score"), asc("doc_id")).limit(kLocal)
  }

  /** Round half-up to 4 dp — the output contract of the reference
    * result row (`src/search_engine.py:281`); matches Spark's
    * `round()` semantics.
    */
  def round4(x: Double): Double =
    new JBigDecimal(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  def search(spec: QuerySpec): SearchResponse = {
    val t0 = System.nanoTime()
    // validation-mode preset (reference config/config.py:282-287)
    val k = if (spec.validationMode) 5000 else spec.topK
    val minScore = if (spec.validationMode) 0.0 else spec.minScore
    val hasResidual = spec.tsAfter.nonEmpty || spec.tsBefore.nonEmpty ||
      spec.roles.nonEmpty || spec.tools.nonEmpty
    // over-fetch policy Q3 (reference src/search_engine.py:198-212);
    // reranking widens the candidate pool and drops the threshold to 0
    // (reference :208 and F1)
    val kPrime = math.min(
      if (hasResidual || spec.rerank) k * OverFetchFactor else k, MaxTopK)
    val effMinScore = if (spec.rerank) 0.0 else minScore

    val hits = retrieve(spec.text, kPrime, effMinScore, spec.conjunctive)

    // metadata join J1: broadcast the candidate set against the doc store
    val docs = SegmentIO.readDocs(spark, indexDir)
    var joined = docs.join(broadcast(hits), "doc_id")

    // residual filters F2/F3 — post-retrieval, like the reference
    spec.tsAfter.foreach(a => joined = joined.filter($"ts" >= lit(a)))
    spec.tsBefore.foreach(b => joined = joined.filter($"ts" <= lit(b)))
    if (spec.roles.nonEmpty)
      joined = joined.filter(lower($"role").isin(spec.roles.map(_.toLowerCase): _*))
    if (spec.tools.nonEmpty)
      joined = joined.filter(lower($"tool").isin(spec.tools.map(_.toLowerCase): _*))

    // secondary rerank Q7 (proximity bonus) reorders the over-fetched
    // candidates BEFORE truncation (reference src/reranker.py:316-318)
    val ordered =
      if (spec.rerank) graft.query.Rerank(joined, spec.text)
      else joined.orderBy(desc("score"), asc("doc_id"))

    // truncate to k (Q5), THEN round to 4 dp (F6) and boost (Q8) —
    // the reference's exact staging (SURVEY §3.1 ordering contract)
    val truncated = ordered
      .limit(k)
      .withColumn("score", round($"score", 4))

    val boosted = applyKeywordRanking(truncated, spec.boostTerms,
      spec.penalizeTerms, spec.boostWeight, spec.penaltyWeight)

    val includeSet = spec.includeKeys.toSet
    // final ordering: boost re-sorts by adjusted score (reference
    // :457); otherwise rerank order survives (reference :316-318)
    val finalSort =
      if (spec.rerank && spec.boostTerms.isEmpty && spec.penalizeTerms.isEmpty)
        Seq(round($"rerank_score", 3).desc, $"score".desc, $"doc_id".asc)
      else Seq(desc("score"), asc("doc_id"))
    val rows = boosted
      .orderBy(finalSort: _*)
      .select("doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "score")
      .collect()
      .map { r =>
        val key = (r.getString(1), r.getInt(2))
        SearchHit(r.getLong(0), r.getString(1), r.getInt(2), r.getString(3),
          r.getString(4), r.getTimestamp(5), r.getDouble(6),
          includeSet.contains(key))
      }

    val ms =
      if (includeSet.nonEmpty) {
        val found = rows.map(h => (h.conv_id, h.turn_idx)).toSet
        val matched = (found intersect includeSet).size.toLong
        val missed = (includeSet diff found).size.toLong
        val newCand = (found diff includeSet).size.toLong
        Some(MatchStats(matched, missed, newCand, includeSet.size.toLong,
          round4(matched.toDouble / includeSet.size)))
      } else None

    SearchResponse(spec.text, rows.length, rows.toIndexedSeq, ms,
      (System.nanoTime() - t0) / 1e6)
  }

  /** Keyword boost/penalize rescoring — exact port of the reference's
    * diminishing-returns formula (`src/search_engine.py:420-444`):
    * adj = score ± w * min(matches,3) * 0.7^max(0, matches-1), where a
    * match is a lowercase substring hit in the document text. Pure
    * column math (codegen), applied to the already-truncated top-k.
    */
  def applyKeywordRanking(
      df: DataFrame,
      boostTerms: Seq[String],
      penalizeTerms: Seq[String],
      boostWeight: Double,
      penaltyWeight: Double): DataFrame = {
    val bTerms = boostTerms.map(_.toLowerCase.trim).filter(_.nonEmpty)
    val pTerms = penalizeTerms.map(_.toLowerCase.trim).filter(_.nonEmpty)
    if (bTerms.isEmpty && pTerms.isEmpty) return df
    def matchCount(terms: Seq[String]) =
      size(filter(array(terms.map(lit): _*), t => contains(lower(col("text")), t)))
    def adjustment(terms: Seq[String], w: Double) =
      if (terms.isEmpty) lit(0.0)
      else {
        val m = matchCount(terms)
        when(m > 0,
          lit(w) * least(m, lit(3)).cast("double") *
            pow(lit(0.7), greatest(m - 1, lit(0)).cast("double")))
          .otherwise(lit(0.0))
      }
    df.withColumn("original_score", col("score"))
      .withColumn("score",
        col("score") + adjustment(bTerms, boostWeight) - adjustment(pTerms, penaltyWeight))
  }
}
