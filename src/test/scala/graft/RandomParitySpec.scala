package graft

import graft.gen.TranscriptGen
import graft.index.IndexBuilder
import graft.query.{LocalIndex, LocalOracle}

/** Randomized rank-identity (SURVEY §5.3 "WAND ≡ exhaustive scoring
  * on random corpora"): several seeds × several corpus sizes ×
  * generated queries, engine vs exact oracle. Different seeds shift
  * term skew, tie patterns, and block boundaries.
  */
class RandomParitySpec extends SparkSpec {

  test("rank identity holds across random seeds and corpus shapes") {
    for ((seed, nConvs, blockSize, shards) <- Seq(
        (7L, 60L, 4, 2), (1234L, 150L, 16, 4), (999L, 90L, 7, 3))) {
      val dir = tempDir(s"graft-rand-$seed")
      IndexBuilder.build(spark, TranscriptGen.corpus(spark, nConvs, seed), dir,
        IndexBuilder.Config(blockSize = blockSize, numShards = shards,
          numPartitions = 4))
      val li = new LocalIndex(spark, dir)
      val oracle = LocalOracle.buildCorpus(TranscriptGen.localCorpus(nConvs, seed))

      val rnd = new scala.util.Random(seed)
      val queries = (1 to 12).map { _ =>
        val nTerms = 1 + rnd.nextInt(4)
        val terms = (1 to nTerms).map(_ => TranscriptGen.termOf(rnd.nextInt(800)))
        (terms.mkString(" "), 1 + rnd.nextInt(40), rnd.nextBoolean(),
          if (rnd.nextBoolean()) 0.0 else rnd.nextDouble() * 2)
      }
      for ((text, k, conj, minScore) <- queries) {
        val expected = LocalOracle.topK(oracle, text, k, conj, minScore)
          .map { case (d, s) => (d.docId, s) }
        val got = li.retrieve(text, k, minScore, conj).toIndexedSeq
        assert(got == expected,
          s"[seed=$seed q='$text' k=$k conj=$conj tau=$minScore] mismatch")
      }
    }
  }
}
