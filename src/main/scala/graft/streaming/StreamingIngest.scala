package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.model.Turn

/** Streaming ingestion surface.
  *
  * The reference is strictly batch + request/response (SURVEY §2.8);
  * its incremental corpus growth is an append + re-embed of the
  * not-yet-indexed anti-join (`src/embedding_generator.py:150-168`,
  * `find_and_add_papers.py:187-217`). The streaming-native analog:
  * new turns arrive on a stream, land in a staging corpus via
  * foreachBatch (exactly-once per micro-batch id), and index builds
  * run as periodic compactions over the staged corpus — the same
  * stage functions as the batch path, which is what keeps resume
  * semantics identical.
  */
object StreamingIngest {

  /** Micro-batch append of incoming turns into a staging corpus.
    * Batch ids make re-delivered batches idempotent (the staging
    * write is per-batch-id partitioned, overwritten on replay —
    * the streaming analog of the reference's idempotent upsert,
    * `src/pubmed_downloader.py:321-326`).
    */
  def stageTurns(stream: Dataset[Turn], stagingDir: String): DataStreamWriter[Turn] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$stagingDir/_checkpoints")
      .foreachBatch { (batch: Dataset[Turn], batchId: Long) =>
        batch.write.mode("overwrite")
          .parquet(s"$stagingDir/batches/batch_id=$batchId")
      }

  /** Read every staged batch back as one corpus (input to the normal
    * batch IndexBuilder — compaction = re-index of staging).
    *
    * MERGE semantics keyed on (conv_id, turn_idx): a re-delivered,
    * possibly CHANGED turn replaces the earlier version — keep-latest-
    * batch wins (the reference's `INSERT OR REPLACE ... (pmid)` upsert,
    * `src/pubmed_downloader.py:321-326`). The window partitions by the
    * key, so dedup work is per-key, never a global sort.
    */
  def stagedCorpus(spark: SparkSession, stagingDir: String): Dataset[Turn] = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"conv_id", $"turn_idx")
      .orderBy(desc("batch_id"), desc("ts"), desc("xxh"))
    spark.read.parquet(s"$stagingDir/batches")
      .withColumn("xxh", xxhash64($"role", $"text", $"tool")) // deterministic tiebreak
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[Turn]
  }

  /** Watermarked tumbling-window turn statistics per role — the
    * stateful-aggregation surface (event-time, late-data tolerant).
    */
  def windowedTurnStats(stream: Dataset[Turn], window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("role"))
      .agg(count(lit(1)).as("n_turns"),
        sum(length(col("text"))).as("n_chars"))
      .select(col("w.start").as("window_start"), col("role"),
        col("n_turns"), col("n_chars"))
}
