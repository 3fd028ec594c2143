package graft.model

import java.sql.Timestamp

/** One conversation turn — the engine's document unit.
  * Analog of one `articles` row in the reference
  * (`src/pubmed_downloader.py:55-70`); key `(conv_id, turn_idx)`
  * plays the role of `pmid`. Shape fixed by BASELINE.json:input_hint.
  */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Docs-table row: external key <-> dense internal doc id + BM25 doc
  * length. Analog of the reference's pmid_index.json positional map
  * (`src/vector_index.py:60-76`).
  */
case class DocRow(
    doc_id: Long,
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    ts: Timestamp,
    dl: Int)

/** A query, mirroring SemanticSearchEngine.search's parameter surface
  * (`src/search_engine.py:141-154`): query text, top-k, min score,
  * date-range and categorical filters, known-relevant set, keyword
  * boost/penalize, validation-mode preset.
  */
case class QuerySpec(
    text: String,
    topK: Int = 10,
    minScore: Double = 0.0,
    tsAfter: Option[Timestamp] = None,
    tsBefore: Option[Timestamp] = None,
    roles: Seq[String] = Nil,
    tools: Seq[String] = Nil,
    includeKeys: Seq[(String, Int)] = Nil,
    boostTerms: Seq[String] = Nil,
    penalizeTerms: Seq[String] = Nil,
    boostWeight: Double = 0.15,
    penaltyWeight: Double = 0.15,
    conjunctive: Boolean = false,
    rerank: Boolean = false,
    validationMode: Boolean = false)

/** One ranked hit (reference result row, `src/search_engine.py:270-283`). */
case class SearchHit(
    doc_id: Long,
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    ts: Timestamp,
    score: Double,
    is_match: Boolean)

/** Recall/match statistics (`src/search_engine.py:324-339`). */
case class MatchStats(
    matched: Long,
    missed: Long,
    newCandidates: Long,
    totalIncluded: Long,
    recall: Double)

/** Full query response (`src/search_engine.py:343-360`). */
case class SearchResponse(
    query: String,
    totalResults: Int,
    hits: Seq[SearchHit],
    stats: Option[MatchStats],
    searchTimeMs: Double)
