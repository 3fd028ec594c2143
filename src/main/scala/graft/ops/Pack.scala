package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: lay documents end-to-end in
  * a canonical order (ascending id) and cut the token stream into
  * fixed-budget bins — each bin is one training sequence's worth of
  * data. A document's bin is decided by its global token START
  * offset, i.e. the exclusive prefix sum of token counts in id order.
  *
  * The naive formulation — `sum(n) OVER (ORDER BY id)` — is a global
  * single-partition window: a scale-killer (every row funnels through
  * one task). This implementation is the classic two-level
  * distributed prefix sum, fully declarative:
  *
  *   1. chunk = id div chunkSize — a deterministic coarse grouping
  *      (NOT the physical partitioning, so results are
  *      partition-count-invariant);
  *   2. within-chunk cumulative sums run as parallel per-chunk
  *      windows;
  *   3. chunk totals aggregate to ONE ROW PER CHUNK — the only
  *      global-ordered window runs over this tiny relation (at 10¹²
  *      docs and chunkSize 2²⁰ that is ~10⁶ rows, a single-task
  *      triviality), then broadcast-joins back.
  *
  * Offsets, and therefore bins, are identical to the naive global
  * window by associativity of addition — the PackSpec invariance test
  * pins this against a one-partition reference and across chunkSize
  * choices.
  *
  * Cost note: the (id, n) projection is consumed twice (per-chunk
  * windows + chunk totals). The projection is 16 bytes/row, so the
  * second scan is trivial UNLESS `nTokens` is computed from raw text
  * in the same plan — at 100 TB, feed this operator a materialized
  * token-count table (the corpus-stats build already produces per-doc
  * dl) rather than a tokenize-on-read expression, or persist the
  * projection.
  */
object Pack {

  /** @param df       input relation
    * @param id       unique non-negative integral doc id (the packing
    *                 order)
    * @param nTokens  per-doc token count
    * @param budget   tokens per bin (e.g. the model context length)
    * @param chunkSize ids per prefix-sum chunk; any value ≥ 1 yields
    *                 identical output — size it so corpus/chunkSize
    *                 stays driver-friendly (default 2²⁰)
    * @return (id, n, gstart, bin): token count, global exclusive
    *         start offset, and bin = gstart div budget
    */
  def packSequences(
      df: DataFrame,
      id: Column,
      nTokens: Column,
      budget: Long,
      chunkSize: Long = 1L << 20): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    val base = df
      .select(id.cast("long").as("id"), nTokens.cast("long").as("n"))
      .withColumn("chunk", expr(s"id div $chunkSize"))
    // parallel per-chunk running sums (inclusive, then minus n below)
    val wIn = Window.partitionBy(col("chunk")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = base.withColumn("cum_in", sum(col("n")).over(wIn))
    // one row per chunk; the only globally-ordered window is over this
    val wOff = Window.orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("chunk"))
      .agg(sum(col("n")).as("ctot"))
      .withColumn("coff", coalesce(sum(col("ctot")).over(wOff), lit(0L)))
      .select(col("chunk"), col("coff"))
    withCum.join(broadcast(offsets), "chunk")
      .withColumn("gstart", col("coff") + col("cum_in") - col("n"))
      .withColumn("bin", expr(s"gstart div $budget"))
      .select(col("id"), col("n"), col("gstart"), col("bin"))
  }

  /** Per-bin packing summary (the shape a sequence writer consumes):
    * how many docs landed in each bin, their token mass, and the id
    * span — bins are contiguous id ranges by construction.
    */
  def binSummary(packed: DataFrame): DataFrame =
    packed.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_tokens"),
        min(col("id")).as("first_id"),
        max(col("id")).as("last_id"))
}
