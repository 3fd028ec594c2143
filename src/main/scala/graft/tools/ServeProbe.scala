package graft.tools

import org.apache.spark.sql.SparkSession

import graft.api.SearchEngine
import graft.gen.QuerySet

/** Dev probe: distributed-path (SearchEngine.retrieve) latency over
  * the reference query set against an existing index dir — the
  * spark_p50/p95 measurement from Bench, standalone, so serving
  * changes can be measured without a rebuild.
  * Usage: runMain graft.tools.ServeProbe <indexDir> [reps]
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = QuerySet.referenceQueries
    val eng = new SearchEngine(spark, dir)
    eng.retrieve(qs.head.text, qs.head.k).collect() // warmup (norms cache)
    val lat = (1 to reps).flatMap { _ =>
      qs.map { q =>
        val t0 = System.nanoTime()
        eng.retrieve(q.text, q.k, q.minScore, q.conjunctive).collect()
        (System.nanoTime() - t0) / 1e6
      }
    }.sorted
    def pct(p: Double) = lat(((lat.size - 1) * p).round.toInt)
    println(f"[serve] n=${lat.size} p50=${pct(0.5)}%.2f ms p95=${pct(0.95)}%.2f ms " +
      f"p99=${pct(0.99)}%.2f ms max=${lat.last}%.2f ms")
    spark.stop()
  }
}
