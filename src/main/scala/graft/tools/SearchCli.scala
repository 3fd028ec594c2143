package graft.tools

import org.apache.spark.sql.SparkSession

import graft.api.SearchEngine
import graft.model.QuerySpec

/** spark-submit query runner — the engine analog of the reference's
  * smoke entry point (`src/search_engine.py:609-636`).
  *
  * Usage: SearchCli <indexDir> <query...> [--k N] [--min-score S]
  *          [--and] [--boost t1,t2] [--penalize t1,t2] [--role r]
  */
object SearchCli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SearchCli <indexDir> <query...> [--k N] ...")
    val dir = args(0)
    var k = 10
    var minScore = 0.0
    var conjunctive = false
    var boost: Seq[String] = Nil
    var penalize: Seq[String] = Nil
    var roles: Seq[String] = Nil
    val queryWords = scala.collection.mutable.ArrayBuffer[String]()
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "--k" => k = args(i + 1).toInt; i += 1
        case "--min-score" => minScore = args(i + 1).toDouble; i += 1
        case "--and" => conjunctive = true
        case "--boost" => boost = args(i + 1).split(",").toSeq; i += 1
        case "--penalize" => penalize = args(i + 1).split(",").toSeq; i += 1
        case "--role" => roles = args(i + 1).split(",").toSeq; i += 1
        case w => queryWords += w
      }
      i += 1
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-search")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = new SearchEngine(spark, dir)
    val resp = engine.search(QuerySpec(queryWords.mkString(" "), topK = k,
      minScore = minScore, conjunctive = conjunctive, roles = roles,
      boostTerms = boost, penalizeTerms = penalize))
    println(s"query: '${resp.query}'  hits: ${resp.totalResults}  " +
      f"time: ${resp.searchTimeMs}%.1f ms")
    resp.hits.zipWithIndex.foreach { case (h, rank) =>
      println(f"${rank + 1}%3d. ${h.score}%9.4f  doc=${h.doc_id}%-8d " +
        s"${h.conv_id}/${h.turn_idx}  role=${h.role}")
    }
    spark.stop()
  }
}
