package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import graft.ops.{Hashing, Pack}

/** Plan-shape audit for the training-pipeline ops: asserts (not just
  * prints) the properties that make them scale —
  *
  *  - KmvSketch aggregates map-side: the physical plan must contain a
  *    partial-mode ObjectHashAggregate (each map task ships at most k
  *    longs per group) before the final merge;
  *  - Pack.packSequences contains exactly TWO window operators — the
  *    parallel per-chunk cumulative sum (window spec keyed by chunk)
  *    and the single-task offset window over the one-row-per-chunk
  *    aggregate — and joins offsets back by BROADCAST (never a
  *    corpus-sized shuffle join).
  *
  * Run: `sbt -batch "runMain graft.tools.PipelinePlanProbe"`.
  */
object PipelinePlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = (0L until 100000L)
      .map(i => (i, s"w${i % 997} w${(i * 31) % 997} w${(i * 7) % 97}",
        if (i % 5 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")

    // ---- KMV: partial (map-side) + final object-hash aggregation
    val kmv = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .select(col("lang"), Hashing.hash32(col("term")).as("h"))
      .groupBy("lang").agg(KmvSketch.mins(col("h"), 64).as("m"))
    val kplan = kmv.queryExecution.executedPlan.toString
    val nObjAgg = "ObjectHashAggregate".r.findAllMatchIn(kplan).size
    val partial = kplan.contains("partial_kmv_sketch")
    println(s"[kmv] ObjectHashAggregate nodes=$nObjAgg partial=$partial")
    assert(nObjAgg >= 2 && partial,
      "kmv_sketch must run as partial (map-side) + final ObjectHashAggregate")
    val res = kmv.collect()
    assert(res.forall(_.getSeq[Long](1).size == 64), "sketches at capacity")

    // ---- Pack: two windows (chunk-keyed + tiny offsets), broadcast join
    val packed = Pack.packSequences(docs, col("doc_id"),
      length(col("text")).cast("long"), budget = 4096, chunkSize = 4096)
    val pplan = packed.queryExecution.executedPlan.toString
    val nWindow = "\\bWindow\\b".r.findAllMatchIn(pplan).size
    val chunkKeyed = pplan.contains("windowspecdefinition(chunk")
    val bcast = pplan.contains("BroadcastHashJoin")
    println(s"[pack] Window nodes=$nWindow chunkKeyedSpec=$chunkKeyed broadcastJoin=$bcast")
    assert(nWindow == 2,
      s"expected exactly 2 window operators (per-chunk + offsets), got $nWindow")
    assert(chunkKeyed, "the corpus-sized window must be partitioned by chunk")
    assert(bcast, "offsets must join back by broadcast")
    val nBins = Pack.binSummary(packed).count()
    println(s"[pack] bins=$nBins over 100k docs (chunkSize 4096 → 25 chunks)")
    assert(nBins > 0)

    println("[pipeline-plan-probe] ALL ASSERTIONS PASSED")
    spark.stop()
  }
}
