package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Dev probe: cumulative timing of each minhashDedup stage. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](n: String)(f: => T): T = {
      val a = System.nanoTime(); val r = f
      println(f"[mh] $n: ${(System.nanoTime() - a) / 1e9}%.3f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      t("exploded-nodistinct.count")(
        Dedup.shingles(docs, col("doc_id"), col("text"), 2, distinct = false).count())
      t("exploded-nohash.count")(
        docs.select(col("doc_id").as("id"),
          filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) >= 3).as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(col("id"), explode(transform(sequence(lit(0), size(col("tk")) - 2),
            i => concat_ws(" ", element_at(col("tk"), i + 1), element_at(col("tk"), i + 2))))
            .as("s")).count())
      val sh = Dedup.shingles(docs, col("doc_id"), col("text"), 2)
      t("shingles.count")(sh.count())
      val sig = Dedup.minhashSignatures(sh, 16)
      t("sig.count")(sig.count())
      val cand = Dedup.lshCandidates(sig, 16, 4, dedupPairs = false)
      t("cand.count")(cand.count())
      val full = Dedup.minhashDedup(docs, col("doc_id"), col("text"), 2, 16, 4, 0.2)
      t("full.count")(full.count())
    }
    spark.stop()
  }
}
