package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time named SparkEntry queries against an sf dir.
  * Usage: runMain graft.tools.QueryTimer <sfDir> <query>...
  * Each query runs twice (cold, warm); prints both.
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"[qt] $n rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
      }
    }
    spark.stop()
  }
}
