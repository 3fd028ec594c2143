package graft.tools

import org.apache.spark.sql.SparkSession

import graft.gen.TranscriptGen
import graft.index.IndexBuilder
import graft.model.Turn

/** Dev probe: build-throughput scaling measurement under EXACT Bench
  * conditions (staged parquet corpus, /dev/shm scratch, zstd shuffle,
  * cacheInput=false). Usage:
  *   runMain graft.tools.BuildProbe [convs] [coresCsv] [reps]
  */
object BuildProbe {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-buildprobe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_PARQUET_CODEC", "zstd"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def freshDir(tag: String): String = {
    val d = s"/dev/shm/graft-probe-$tag"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete()
    }
    rm(new java.io.File(d))
    d
  }

  def main(args: Array[String]): Unit = {
    val convs = if (args.length > 0) args(0).toLong else 20000L
    val coresList = (if (args.length > 1) args(1) else "2,8,32").split(",").map(_.toInt)
    val reps = if (args.length > 2) args(2).toInt else 2

    val corpusPath = freshDir("corpus")
    val s0 = session(32)
    TranscriptGen.corpus(s0, convs).write.mode("overwrite").parquet(corpusPath)
    val n = s0.read.parquet(corpusPath).count()
    s0.stop()

    val cfg0 = IndexBuilder.Config(blockSize = 128, numShards = 32,
      docsPerShard = Some(math.max(1L, (n + 31) / 32)), cacheInput = false,
      postingsGroups = sys.env.getOrElse("SPARK_GRAFT_PGROUPS", "1").toInt)
    // full-size warm build (JIT + page pools)
    locally {
      val s = session(32)
      import s.implicits._
      IndexBuilder.build(s, s.read.parquet(corpusPath).as[Turn],
        freshDir("warm"), cfg0.copy(numPartitions = 32))
      s.stop()
    }
    coresList.foreach { cores =>
      (1 to reps).foreach { rep =>
        val s = session(cores)
        import s.implicits._
        val t0 = System.nanoTime()
        val st = IndexBuilder.build(s, s.read.parquet(corpusPath).as[Turn],
          freshDir(s"idx$cores-$rep"), cfg0.copy(numPartitions = cores))
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[bp] cores=$cores rep=$rep time=$t%.2f thru=${st.numDocs / t}%.0f")
        s.stop()
      }
    }
  }
}
