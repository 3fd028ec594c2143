package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Dev probe: plan + per-rep wall time for the multi-table LSH ANN
  * query (the slowest driver-gate query in r02). Usage:
  * runMain graft.tools.AnnProbe <sfDir> [reps]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def q = {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      Similarity.lshCosinePairsMulti(emb, col("vec_id"), col("embedding"),
        dim = 64, tables = 4, planesPerTable = 6, tau = 0.4, maxBucketSize = 200)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .orderBy("id_a", "id_b")
    }
    q.explain("formatted")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = q.count()
      println(f"[ann] rep$r: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
