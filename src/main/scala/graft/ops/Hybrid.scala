package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.query.OracleEngine

/** Hybrid keyword + semantic retrieval — the reference's own stated
  * roadmap item (`SEMANTIC_SEARCH_IMPROVEMENTS.md`: combine BM25
  * keyword scores with embedding similarity; unimplemented there).
  *
  * Contract (deterministic, oracle-replayable):
  *   1. BM25 top-N over (id, text) — exhaustive scoring with the
  *      engine's exact formulas and lexicographic per-term fold
  *      (same contract as [[graft.query.OracleEngine]]);
  *   2. cosine top-N against a probe vector over (id, vec);
  *   3. full-outer join of the two TOP LISTS (fusion happens over the
  *      retrieved lists, never the corpora — the standard serving
  *      shape: each side's top-N is collected to the fusion node, the
  *      way any hybrid serving layer merges ranker outputs);
  *   4. min-max normalize each side over its own list
  *      (max == min → 1.0; missing from a list → 0.0);
  *   5. fused = alpha·bm25_norm + (1-alpha)·cos_norm, top-k by
  *      (fused desc, id asc).
  */
object Hybrid {

  /** Exhaustive BM25 scores over an arbitrary (id, text) relation —
    * a thin wrapper over [[OracleEngine.scoreAllKeyed]] (the ONE copy
    * of the bit-exactness-critical BM25 pipeline; the transcript
    * corpus calls it keyed (conv_id, turn_idx), this one by id).
    */
  def bm25ScoreAll(
      docs: DataFrame, id: Column, text: Column, queryText: String,
      statsKey: Option[String] = None): DataFrame =
    OracleEngine.scoreAllKeyed(
      docs.select(id.as("id"), text.as("doc_text")),
      Seq("id"), col("doc_text"), queryText, statsKey = statsKey)
      .select(col("id"), col("score"))

  /** @param docs   (id, text) corpus for the keyword side
    * @param emb    (id, vec) corpus for the semantic side
    * @param probeId id of the query vector within `emb`
    * @return (id, bm25_norm, cos_norm, fused) top-k rows
    */
  def hybridTopK(
      docs: DataFrame, id: Column, text: Column,
      emb: DataFrame, embId: Column, vec: Column,
      queryText: String, probeId: Long,
      alpha: Double, n: Int, k: Int,
      statsKey: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // the two top lists land on the driver (bounded by n — this IS
    // the fusion node's input in any serving topology), then fuse as
    // local relations: no corpus recompute per fusion-side reference
    val bmRows: Array[(Long, Double)] =
      bm25ScoreAll(docs, id, text, queryText, statsKey)
        .orderBy(desc("score"), asc("id")).limit(n)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val probe = emb.filter(embId === probeId).select(vec.as("pvec"))
    val vRows: Array[(Long, Double)] =
      emb.select(embId.as("id"), vec.as("vec"))
        .filter($"id" =!= probeId)
        .crossJoin(broadcast(probe))
        .select($"id", Similarity.cosine($"vec", $"pvec").as("cos"))
        .orderBy(desc("cos"), asc("id")).limit(n)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))

    def norm(s: Column, mn: Double, mx: Double): Column =
      when(s.isNull, lit(0.0))
        .when(lit(mx > mn), (s - lit(mn)) / lit(mx - mn))
        .otherwise(lit(1.0))
    val (bMin, bMax) =
      if (bmRows.isEmpty) (0.0, 0.0)
      else (bmRows.map(_._2).min, bmRows.map(_._2).max)
    val (cMin, cMax) =
      if (vRows.isEmpty) (0.0, 0.0)
      else (vRows.map(_._2).min, vRows.map(_._2).max)

    bmRows.toSeq.toDF("id", "bm25")
      .join(vRows.toSeq.toDF("id", "cos"), Seq("id"), "full_outer")
      .select($"id",
        norm($"bm25", bMin, bMax).as("bm25_norm"),
        norm($"cos", cMin, cMax).as("cos_norm"))
      .withColumn("fused",
        lit(alpha) * $"bm25_norm" + lit(1.0 - alpha) * $"cos_norm")
      .orderBy(desc("fused"), asc("id"))
      .limit(k)
  }
}
