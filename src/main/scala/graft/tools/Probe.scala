package graft.tools
import org.apache.spark.sql.SparkSession
import graft.gen.TranscriptGen
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def t[T](n: String)(f: => T): T = { val a = System.nanoTime(); val r = f; println(f"[probe] $n: ${(System.nanoTime()-a)/1e9}%.2f s"); r }
    val c = TranscriptGen.corpus(spark, 50000)
    t("gen count")(c.count())
    t("gen count2")(c.count())
    val cached = c.persist()
    t("persist+count")(cached.count())
    t("cached count")(cached.count())
    val sorted = cached.repartitionByRange(32, $"conv_id", $"turn_idx").sortWithinPartitions($"conv_id", $"turn_idx")
    t("sort+count")(sorted.count())
    val rdd = t("zipWithIndex (eager count job)")(sorted.rdd.zipWithIndex())
    t("zip map count")(rdd.map { case (turn, i) => (i, graft.tokenize.Tokenizer.tokenize(turn.text).length) }.count())
    t("tokenize only via DF")(cached.selectExpr("size(split(lower(text), '[^a-z0-9]+')) as n").agg(Map("n"->"sum")).collect())
    spark.stop()
  }
}
