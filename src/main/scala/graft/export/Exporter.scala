package graft.export

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

import graft.model.SearchResponse

/** Result-export surface (SURVEY §2.1 S11/S12 + §2.2 F7). */
object Exporter {

  /** NaN/±Inf → null across floating-point columns — the reference's
    * JSON sanitization boundary (`app.py:87-106`) as column math.
    */
  def sanitize(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case DoubleType | FloatType =>
          d.withColumn(f.name,
            when(isnan(col(f.name)) || col(f.name) === Double.PositiveInfinity ||
              col(f.name) === Double.NegativeInfinity, lit(null))
              .otherwise(col(f.name)))
        case _ => d
      }
    }

  /** Search response → flat DataFrame (the CSV row shape of the
    * reference's export, `src/search_engine.py:463-502`).
    */
  def responseFrame(spark: SparkSession, resp: SearchResponse): DataFrame = {
    import spark.implicits._
    resp.hits.zipWithIndex
      .map { case (h, i) =>
        (i + 1, h.conv_id, h.turn_idx, h.role, h.tool, h.ts, h.score,
          if (h.is_match) "Included" else "Not Screened")
      }
      .toDF("rank", "conv_id", "turn_idx", "role", "tool", "ts", "score",
        "screening_decision")
  }

  /** Write a result frame as a single headered CSV file. */
  def writeCsv(df: DataFrame, path: String): Unit =
    sanitize(df).coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
}
