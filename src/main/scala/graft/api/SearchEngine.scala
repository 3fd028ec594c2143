package graft.api

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{SegmentIO, Varbyte}
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

  /** Driver-resident dictionary cache, term → Some((idf, maxScore,
    * shard list)) / None for a confirmed zero-df term — the analog of
    * the reference's resident in-RAM index
    * (`src/search_engine.py:48-70`). Only terms actually queried are
    * cached (bounded: whole-cache eviction like SegmentIO's dl
    * cache), so repeat queries skip the dictionary job entirely.
    *
    * Freshness: idf derives from the `stats` snapshot, and BOTH are
    * keyed to the segment's mutation generation (bumped by every
    * in-place mutation path — append, recovery, compaction — via
    * `SegmentIO.invalidateDlCache`). A query after an append sees the
    * new stats, new dictionary entries, and the new shard routing
    * lists; without this an appended shard would be invisible to a
    * live engine forever (the executor dl cache already invalidated,
    * the driver caches did not).
    */
  private val dictCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[(Double, Double, Seq[Int])]]
  private val MaxCachedTerms = 262144

  @volatile private var statsSnapshot: SegmentIO.IndexStats = _
  @volatile private var gen: Long = -1L
  private def ensureFresh(): Unit = {
    val g = SegmentIO.generation(indexDir)
    if (statsSnapshot == null || g != gen) synchronized {
      if (statsSnapshot == null || g != gen) {
        dictCache.clear()
        statsSnapshot = SegmentIO.readStats(indexDir)
        gen = g
      }
    }
  }
  def stats: SegmentIO.IndexStats = { ensureFresh(); statsSnapshot }

  private def termMetaFor(terms: Array[String]): Map[String, (Double, Double, Seq[Int])] = {
    ensureFresh() // MUST lead: a fully-cached term set would otherwise
    // never consult `stats` and serve stale entries across a mutation
    val fetchGen = gen // generation the fetch below is valid under
    //
    // snapshot-then-merge: the return value is assembled from LOCAL
    // maps only, never re-read from the shared cache — a whole-cache
    // eviction below (or a concurrent generation clear) between the
    // snapshot and the return would otherwise null out entries for
    // terms that were present a moment ago
    val snap: Map[String, Option[(Double, Double, Seq[Int])]] =
      terms.flatMap(t => Option(dictCache.get(t)).map(t -> _)).toMap
    val missing = terms.filterNot(snap.contains)
    val fetched: Map[String, Option[(Double, Double, Seq[Int])]] =
      if (missing.isEmpty) Map.empty
      else {
        if (dictCache.size > MaxCachedTerms) dictCache.clear()
        // term-IN predicate pushes into the (term-sorted) parquet scan
        val found = SegmentIO.readDict(spark, indexDir)
          .filter($"term".isin(missing.toSeq: _*)).collect()
          .map { d =>
            val idf = Bm25.idf(stats.numDocs, d.df)
            d.term ->
              (idf, Bm25.boundScore(idf, d.max_tf, d.min_dl, stats.avgdl), d.shards)
          }.toMap
        val entries = missing.map(t => t -> found.get(t)).toMap
        // stale-reinsert guard: a mutation (append/compaction) may have
        // advanced the segment generation AFTER ensureFresh cleared the
        // cache and BEFORE this fetch completed — inserting then would
        // pin pre-mutation idf/bound/routing values past the clear.
        // The entries still serve THIS query (computed under fetchGen's
        // consistent snapshot); they just must not outlive it.
        if (SegmentIO.generation(indexDir) == fetchGen)
          entries.foreach { case (t, v) => dictCache.put(t, v) }
        entries
      }
    (snap ++ fetched).collect { case (t, Some(v)) => t -> v }
  }

  /** Routing from the dictionary's per-term shard lists (v6): OR
    * queries visit the union of their terms' shards, AND queries only
    * the intersection (a conjunctive match lives in one doc, hence one
    * shard holding every term) — a rare-term query on a 10⁴-shard
    * corpus schedules a handful of tasks, not 10⁴. An EMPTY list is
    * the dense-term sentinel ("all shards",
    * IndexBuilder.DenseRoutingFraction): it expands to the full shard
    * range — a superset of the true set, so union and intersection
    * routing both stay sound (an extra shard just yields no cursors
    * for that term).
    */
  private def routeFor(
      present: Array[String],
      termMeta: Map[String, (Double, Double, Seq[Int])],
      conjunctive: Boolean): Array[Int] = {
    val allShards: Seq[Int] = 0 until stats.numShards
    def routeOf(t: String): Seq[Int] = {
      val s = termMeta(t)._3
      if (s.isEmpty) allShards else s
    }
    if (present.isEmpty) Array.empty
    else if (conjunctive)
      present.map(t => routeOf(t).toSet).reduce(_ intersect _).toArray.sorted
    else present.flatMap(routeOf).distinct.sorted
  }

  /** The shard set a query would fan out to — one task per element in
    * [[retrieve]]. Exposed for routing probes (RouteProbe evidences
    * rare-vs-dense fan-out at high shard counts with exactly the
    * serving path's routing).
    */
  def routedShards(queryText: String, conjunctive: Boolean = false): Array[Int] = {
    val qTerms = Tokenizer.tokenize(queryText).distinct.sorted
    if (qTerms.isEmpty) return Array.empty
    val termMeta = termMetaFor(qTerms)
    val present = qTerms.filter(termMeta.contains)
    if (conjunctive && present.length < qTerms.length) return Array.empty
    routeFor(present, termMeta, conjunctive)
  }

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

    val termMeta = termMetaFor(qTerms)
    val present = qTerms.filter(termMeta.contains)
    if (present.isEmpty) return empty
    if (conjunctive && present.length < qTerms.length) return empty // AND with a zero-df term

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

    // Shard fan-out with NO scan stage and NO shuffle: one task per
    // ROUTED shard, each opening only its own postings/shard=N
    // (parquet page skip on the query terms) and norms/shard=N dirs —
    // the Lucene shard-replica serving model. The whole query is a
    // single one-stage job: per-shard WAND top-k heaps merge on the
    // driver via TakeOrderedAndProject. The former formulation
    // (corpus-wide term-pruned scan + groupByKey(shard)) paid a scan
    // stage + a shuffle wave per query; at 10⁹ docs the scan's
    // file-listing and task scheduling alone dominate the actual
    // per-term page reads.
    //
    val routed: Array[Int] = routeFor(present, termMeta, conjLocal)
    if (routed.isEmpty) return empty

    // spark.range with one partition per routed shard keeps the
    // fan-out inside the Dataset API (no RDD): partition i's single
    // row indexes into the routed-shard array
    val routedLocal = routed
    val hits = spark.range(0, routed.length, 1, routed.length)
      .flatMap { i =>
        val shard = routedLocal(i.toInt)
        val blocks = SegmentIO.readShardPostings(dirLocal, shard, presentLocal)
        // two-level dl lookup: page = (doc - shardBase) / pageSize,
        // then in-page offset — no array or row ever scales with
        // shard size, and no Long difference is narrowed to Int
        // before the page division
        val dlArrs = SegmentIO.shardDlPages(dirLocal, shard)
        if (blocks.isEmpty || dlArrs.isEmpty) Iterator.empty
        else {
          val shardBase = shard.toLong * dpsLocal
          val byTerm = blocks.groupBy(_.term)
          val cursors = presentLocal.flatMap { t =>
            byTerm.get(t).map { bs =>
              val (idf, maxScore, _) = metaLocal(t)
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

    // distributed top-k merge: per-shard heaps → TakeOrderedAndProject
    hits.toDF("doc_id", "score")
      .orderBy(desc("score"), asc("doc_id")).limit(kLocal)
  }

  /** Round half-up to 4 dp — the output contract of the reference
    * result row (`src/search_engine.py:281`); matches Spark's
    * `round()` semantics.
    */
  def round4(x: Double): Double =
    new JBigDecimal(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  /** Bounded hit set → doc-store rows, with the serving path's
    * pushdown shape: the hits are driver-resident (≤ MaxTopK by
    * construction), so shard-isin + doc_id-range predicates reach the
    * docs scan — shard dirs prune at the partition level, the id range
    * at the row-group/page level (docs files are doc_id-sorted), and
    * the local-relation broadcast join refines exactly. A broadcast
    * hash join alone would prune nothing: at 10⁹ docs that full scan
    * is a per-query corpus-sized read.
    */
  private def docsForHits(hitRows: Array[(Long, Double)]): DataFrame = {
    val docs = SegmentIO.readDocs(spark, indexDir)
    if (hitRows.isEmpty)
      docs.join(broadcast(spark.emptyDataset[(Long, Double)]
        .toDF("doc_id", "score")), "doc_id")
    else {
      val hitShards = hitRows.map(_._1 / stats.docsPerShard).distinct.toSeq
      val (minId, maxId) = (hitRows.map(_._1).min, hitRows.map(_._1).max)
      docs.filter($"shard".isin(hitShards: _*) && $"doc_id".between(minId, maxId))
        .join(broadcast(hitRows.toSeq.toDF("doc_id", "score")), "doc_id")
    }
  }

  /** Index-backed BM25 top-k as (caller-keyed id, exact score) — the
    * serving-side retriever for hybrid fusion ([[graft.ops.Hybrid]]
    * step 1) and any consumer keyed by an id recoverable from conv_id
    * (e.g. a documents corpus indexed via `Corpus.documentsAsTurns`,
    * inverted by `Corpus.docIdFromConv`). Routed WAND retrieve
    * (rank-and-score-identical to the exhaustive oracle —
    * EngineParitySpec, HybridServeSpec), then the BOUNDED hit set maps
    * internal→caller ids through the segment docs table with
    * [[docsForHits]]'s pushdown join. Ordered (score desc, id asc);
    * scores exact (rounding is an output-boundary contract).
    *
    * @param idFromConv column mapping the segment's conv_id back to
    *                   the caller's id space
    */
  def retrieveMapped(
      queryText: String,
      k: Int,
      idFromConv: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      minScore: Double = 0.0,
      conjunctive: Boolean = false): Array[(Long, Double)] = {
    val hitRows = retrieve(queryText, k, minScore, conjunctive)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    if (hitRows.isEmpty) Array.empty
    else docsForHits(hitRows)
      .select(idFromConv(col("conv_id")).as("id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, sc) => (-sc, id) }
  }

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

    // candidate set is bounded (kPrime ≤ MaxTopK), so land it on the
    // driver first: docsForHits then pushes shard + doc_id-range
    // predicates into the doc-store scan instead of scanning the whole
    // docs table per query.
    val hitRows = retrieve(spec.text, kPrime, effMinScore, spec.conjunctive)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    var joined = docsForHits(hitRows)

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
