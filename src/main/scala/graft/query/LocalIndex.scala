package graft.query

import org.apache.spark.sql.SparkSession

import graft.index.{SegmentIO, Varbyte}
import graft.index.SegmentIO.{DictEntry, PostingBlock}
import graft.tokenize.Tokenizer

/** In-memory serving copy of a segment: the analog of the reference
  * keeping its FAISS index + id map resident in the Flask process
  * (`src/search_engine.py:48-70` lazy init, reused across requests).
  *
  * On a cluster each serving node holds its shard subset in RAM
  * (Lucene/ES model); in this sandbox one JVM holds all shards. The
  * distributed path ([[graft.api.SearchEngine.retrieve]]) stays the
  * source of truth — this class is tested rank-identical to it and
  * to the exact oracle.
  *
  * Memory bound: postings are kept COMPRESSED (delta+varbyte blocks,
  * ~1.5 bytes/posting); blocks decode on demand during traversal.
  */
class LocalIndex(spark: SparkSession, dir: String) {

  val stats: SegmentIO.IndexStats = SegmentIO.readStats(dir)

  val dict: Map[String, DictEntry] =
    SegmentIO.readDict(spark, dir).collect().map(d => d.term -> d).toMap

  /** shard -> (first_doc, decoded dl array) */
  val norms: Map[Int, (Long, Array[Int])] =
    SegmentIO.readNorms(spark, dir).collect()
      .map(n => n.shard -> (n.first_doc, Varbyte.decodeInts(n.dl_bytes, n.n)))
      .toMap

  /** term -> shard -> blocks (block_id-sorted), compressed at rest */
  val postings: Map[String, Map[Int, Array[PostingBlock]]] =
    SegmentIO.readPostings(spark, dir).collect()
      .groupBy(_.term)
      .map { case (t, bs) =>
        t -> bs.groupBy(_.shard).map { case (s, b) => s -> b.sortBy(_.block_id) }
      }

  private val shardIds: Array[Int] = norms.keys.toArray.sorted

  /** BM25 top-k, identical semantics to the distributed retrieve. */
  def retrieve(
      queryText: String,
      k: Int,
      minScore: Double = 0.0,
      conjunctive: Boolean = false): Array[(Long, Double)] = {
    val qTerms = Tokenizer.tokenize(queryText).distinct.sorted
    val present = qTerms.filter(dict.contains)
    if (present.isEmpty || (conjunctive && present.length < qTerms.length))
      return Array.empty
    val n = stats.numDocs
    val meta = present.map { t =>
      val d = dict(t)
      val idf = Bm25.idf(n, d.df)
      t -> (idf, idf * d.max_tfnorm)
    }.toMap
    // shards traverse in parallel (the in-JVM analog of per-executor
    // shard fan-out); per-shard results are deterministic, and the
    // final merge re-sorts, so parallelism cannot affect output
    import scala.collection.parallel.CollectionConverters._
    val all = shardIds.par.flatMap { shard =>
      val (base, dlArr) = norms(shard)
      val cursors = present.flatMap { t =>
        postings(t).get(shard).map { bs =>
          val (idf, ms) = meta(t)
          new Wand.TermCursor(t, idf, ms, bs)
        }
      }
      if (cursors.isEmpty || (conjunctive && cursors.length < present.length))
        Array.empty[(Long, Double)]
      else {
        val dl = (d: Long) => dlArr((d - base).toInt)
        if (conjunctive) Wand.topKConjunctive(cursors, dl, stats.avgdl, k, minScore)
        else Wand.topKDisjunctive(cursors, dl, stats.avgdl, k, minScore)
      }
    }.toArray
    all.sortBy { case (d, s) => (-s, d) }.take(k)
  }
}
