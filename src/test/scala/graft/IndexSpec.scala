package graft

import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen
import graft.index.{IndexBuilder, SegmentIO}

/** Index-layer invariants (SURVEY §5.2/5.5/5.6): per-turn text
  * equality, checkpoint resume, salted-build identity.
  */
class IndexSpec extends SparkSpec {

  val NumConvs = 120

  private def postingsContent(dir: String): Set[(Int, String, Int, Int, Long, Long, Seq[Byte], Seq[Byte], Int, Double, Long)] =
    SegmentIO.readPostings(spark, dir).collect().map { b =>
      (b.shard, b.term, b.block_id, b.n, b.first_doc, b.last_doc,
        b.doc_bytes.toSeq, b.tf_bytes.toSeq, b.block_max_tf, b.block_max_tfnorm,
        b.sum_tf)
    }.toSet

  private def build(salts: Int): String = {
    val dir = tempDir(s"graft-idx-s$salts")
    IndexBuilder.build(spark, TranscriptGen.corpus(spark, NumConvs), dir,
      IndexBuilder.Config(blockSize = 8, numShards = 4, numPartitions = 8, salts = salts))
    dir
  }

  lazy val baseDir: String = build(salts = 1)

  test("row-level invariant: per-turn text equality under stable ordering") {
    // reconstruct (conv_id, turn_idx, text) from the docs table and
    // except against the input — must be empty both ways
    // (the reference's len(embeddings)==len(pmids) consistency check,
    // quick_rebuild.py:198-200, made total)
    import spark.implicits._
    val input = TranscriptGen.corpus(spark, NumConvs)
      .select($"conv_id", $"turn_idx", $"text")
    val stored = SegmentIO.readDocs(spark, baseDir)
      .select($"conv_id", $"turn_idx", $"text")
    assert(stored.exceptAll(input).isEmpty && input.exceptAll(stored).isEmpty)
    // doc ids are the exact global rank: dense 0..N-1, ordered like the key
    val docs = SegmentIO.readDocs(spark, baseDir)
      .select($"doc_id", $"conv_id", $"turn_idx")
      .collect().sortBy(_.getLong(0))
    assert(docs.map(_.getLong(0)).toSeq == docs.indices.map(_.toLong))
    val keys = docs.map(r => (r.getString(1), r.getInt(2)))
    assert(keys.toSeq == keys.sortBy(identity).toSeq)
  }

  test("salted build is content-identical to direct build") {
    val saltedDir = build(salts = 4)
    assert(postingsContent(baseDir) == postingsContent(saltedDir),
      "salted sub-posting merge must be block-identical to the direct path")
    assert(SegmentIO.readStats(baseDir).numDocs == SegmentIO.readStats(saltedDir).numDocs)
  }

  test("resume: killed-after-stage-N rebuild is content-identical") {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    val before = postingsContent(baseDir)
    val dictBefore = SegmentIO.readDict(spark, baseDir).collect().toSet

    // simulate a crash between stages: postings + norms lost
    def rmrf(p: Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.foreach(rmrf)
      Files.deleteIfExists(p)
    }
    rmrf(Path.of(SegmentIO.postingsPath(baseDir)))
    rmrf(Path.of(baseDir, "manifest", "_stage_postings.json"))
    rmrf(Path.of(SegmentIO.normsPath(baseDir)))
    rmrf(Path.of(baseDir, "manifest", "_stage_norms.json"))

    IndexBuilder.build(spark, TranscriptGen.corpus(spark, NumConvs), baseDir,
      IndexBuilder.Config(blockSize = 8, numShards = 4, numPartitions = 8))
    assert(postingsContent(baseDir) == before, "resumed postings differ")
    assert(SegmentIO.readDict(spark, baseDir).collect().toSet == dictBefore)
  }

  test("resume skips completed stages (manifest markers)") {
    // re-entering a fully-built index is a no-op: same stats object
    val s1 = SegmentIO.readStats(baseDir)
    val s2 = IndexBuilder.build(spark, TranscriptGen.corpus(spark, NumConvs), baseDir,
      IndexBuilder.Config(blockSize = 8, numShards = 4, numPartitions = 8))
    assert(s1 == s2)
  }

  test("parallelism invariance: docs and postings identical at 2 vs 8 partitions") {
    val dirA = tempDir("graft-idx-p2")
    val dirB = tempDir("graft-idx-p8")
    IndexBuilder.build(spark, TranscriptGen.corpus(spark, NumConvs), dirA,
      IndexBuilder.Config(blockSize = 8, numShards = 4, numPartitions = 2))
    IndexBuilder.build(spark, TranscriptGen.corpus(spark, NumConvs), dirB,
      IndexBuilder.Config(blockSize = 8, numShards = 4, numPartitions = 8))
    assert(postingsContent(dirA) == postingsContent(dirB),
      "N-vs-4N reproducibility: posting content must not depend on parallelism")
  }

  test("block metadata is sound: bounds hold for every block") {
    val stats = SegmentIO.readStats(baseDir)
    SegmentIO.readPostings(spark, baseDir).collect().foreach { b =>
      val ids = graft.index.Varbyte.decodeDeltas(b.doc_bytes, b.n)
      val tfs = graft.index.Varbyte.decodeInts(b.tf_bytes, b.n)
      assert(ids.head == b.first_doc && ids.last == b.last_doc)
      assert(ids.toSeq == ids.sorted.toSeq && ids.distinct.length == ids.length)
      assert(tfs.max <= b.block_max_tf)
      assert(b.n <= stats.blockSize)
    }
  }
}
