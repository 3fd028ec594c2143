package graft

import graft.gen.{QuerySet, TranscriptGen}
import graft.index.IndexBuilder
import graft.query.LocalIndex

/** Query-phrasing regression harness — the port of the reference's
  * `diagnose_semantic_search.py:189-261` sweep: retrieve with four
  * phrasings of the needle-5 document's topic (LONG / SHORT /
  * KEYWORDS / NATURAL) and assert the known-relevant doc ranks in the
  * top 10 under EVERY phrasing — the reference's own quality bar
  * (`SEMANTIC_SEARCH_IMPROVEMENTS.md:5-10,269-271`; their doc started
  * at rank #1929 before tuning). Runs on the in-RAM serving model
  * (LocalIndex), which EngineParitySpec proves rank-identical to the
  * distributed path and the exact oracle.
  */
class PhrasingSpec extends SparkSpec {

  val NumConvs = 300

  lazy val indexDir: String = {
    val dir = tempDir("graft-phrasing-idx")
    IndexBuilder.build(spark, TranscriptGen.corpus(spark, NumConvs), dir,
      IndexBuilder.Config(blockSize = 16, numShards = 8, numPartitions = 8))
    dir
  }

  test("known-relevant doc ranks top-10 under every phrasing variant") {
    val li = new LocalIndex(spark, indexDir)
    // resolve the target's doc_id from the docs table (conv 5, turn 0)
    import org.apache.spark.sql.functions.col
    val targetId = graft.index.SegmentIO.readDocs(spark, indexDir)
      .filter(col("conv_id") === QuerySet.phrasingTargetConv && col("turn_idx") === 0)
      .select("doc_id").collect()(0).getLong(0)

    val ranks = QuerySet.phrasingSweep.map { case (kind, text) =>
      val hits = li.retrieve(text, 2000)
      val rank = hits.indexWhere(_._1 == targetId) + 1 // 0 → not found
      assert(rank >= 1, s"[$kind] target doc absent from top 2000")
      kind -> rank
    }
    info(ranks.map { case (k, r) => s"$k=#$r" }.mkString("phrasing ranks: ", ", ", ""))
    ranks.foreach { case (kind, rank) =>
      assert(rank <= 10, s"[$kind] target doc rank #$rank exceeds the top-10 bar")
    }
  }
}
