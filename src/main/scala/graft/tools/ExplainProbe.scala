package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.SegmentIO
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    println("=== postings scan with term filter ===")
    SegmentIO.readPostings(spark, dir)
      .filter($"term".isin("t00001", "t00002"))
      .explain("formatted")
    println("=== dictionary lookup ===")
    SegmentIO.readDict(spark, dir).filter($"term".isin("t00001")).explain("formatted")
    println("=== docs metadata join: shard+range pruned, LocalRelation broadcast ===")
    // the search() join shape: shard isin prunes partition dirs,
    // doc_id range prunes row groups (docs are doc_id-sorted), the
    // broadcast local relation refines exactly with no extra job
    val hits = Seq((1L, 0.5), (2L, 0.4)).toDF("doc_id", "score")
    val stats = SegmentIO.readStats(dir)
    val shards = Seq(1L, 2L).map(_ / stats.docsPerShard).distinct
    SegmentIO.readDocs(spark, dir)
      .filter($"shard".isin(shards: _*) && $"doc_id".between(1L, 2L))
      .join(broadcast(hits), "doc_id")
      .select("conv_id", "turn_idx", "score").explain("formatted")
    // optional second arg: a persisted IVF dir — shows that the probe
    // path's static cid IN (...) predicate reaches the lists scan as a
    // PartitionFilter (directory-level pruning of non-probed lists)
    if (args.length > 1) {
      val ivfDir = args(1)
      println("=== IVF probe scan: cid partition filter ===")
      val (assigned, _) = graft.ops.Similarity.ivfRead(spark, ivfDir)
      assigned.filter($"cid".isin(0L, 25L)).explain("formatted")
    }
    spark.stop()
  }
}
