package graft.query

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Turn
import graft.tokenize.Tokenizer

/** Exhaustive DataFrame BM25 path (SURVEY §2.4 Q2 "oracle path"):
  * score-all via tokenize → explode → join query terms →
  * groupBy(doc).sum → TakeOrderedAndProject top-k. Fully
  * Catalyst-optimized (hash aggs, broadcast of the tiny query-term
  * side, whole-stage codegen), the role the reference's exhaustive
  * `IndexFlatIP` scan plays (`src/vector_index.py:78`).
  *
  * Per-doc scores fold per-term contributions in lexicographic term
  * order (array_sort + aggregate) so results are bit-reproducible and
  * comparable across engines (SURVEY §7.5).
  */
object OracleEngine {

  /** idf column mirroring [[Bm25.idf]]. */
  def idfCol(numDocs: Long, df: Column): Column =
    log((lit(numDocs.toDouble) - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))

  /** @return (conv_id, turn_idx, score, n_match) top-k rows */
  def topK(
      spark: SparkSession,
      turns: Dataset[Turn],
      queryText: String,
      k: Int,
      conjunctive: Boolean = false,
      minScore: Double = 0.0): DataFrame = {
    import spark.implicits._
    val qTerms = Tokenizer.tokenize(queryText).distinct.sorted.toSeq
    if (qTerms.isEmpty)
      return spark.emptyDataset[(String, Int, Double)].toDF("conv_id", "turn_idx", "score")

    val toks = turns
      .select($"conv_id", $"turn_idx", Tokenizer.tokensCol($"text").as("tokens"))
      .withColumn("dl", size($"tokens"))

    val statRow = toks.agg(count(lit(1)), sum($"dl")).collect()(0)
    val n = statRow.getLong(0)
    val totalTokens = if (statRow.isNullAt(1)) 0L else statRow.getLong(1)
    val avgdl = if (n == 0) 0.0 else totalTokens.toDouble / n

    val tf = toks
      .select($"conv_id", $"turn_idx", $"dl", explode($"tokens").as("term"))
      .groupBy($"conv_id", $"turn_idx", $"dl", $"term")
      .agg(count(lit(1)).cast("int").as("tf"))
      .filter($"term".isin(qTerms: _*))

    val dfT = tf.groupBy($"term").agg(count(lit(1)).as("df"))

    val contrib = tf
      .join(broadcast(dfT), "term")
      .withColumn("contrib",
        idfCol(n, $"df") *
          ($"tf" * lit(Bm25.K1 + 1.0) /
            ($"tf" + lit(Bm25.K1) *
              (lit(1.0 - Bm25.B) + lit(Bm25.B) * $"dl" / lit(avgdl)))))

    val scored = contrib
      .groupBy($"conv_id", $"turn_idx")
      .agg(
        aggregate(
          array_sort(collect_list(struct($"term", $"contrib"))),
          lit(0.0),
          (acc, x) => acc + x.getField("contrib")).as("score"),
        count(lit(1)).as("n_match"))

    val filtered =
      (if (conjunctive) scored.filter($"n_match" === qTerms.length) else scored)
        .filter($"score" >= lit(minScore))

    filtered
      .orderBy(desc("score"), asc("conv_id"), asc("turn_idx"))
      .limit(k)
      .select($"conv_id", $"turn_idx", $"score")
  }
}
