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
    println("=== docs metadata join with broadcast hits ===")
    val hits = Seq((1L, 0.5), (2L, 0.4)).toDF("doc_id", "score")
    SegmentIO.readDocs(spark, dir).join(broadcast(hits), "doc_id")
      .select("conv_id", "turn_idx", "score").explain("formatted")
    spark.stop()
  }
}
