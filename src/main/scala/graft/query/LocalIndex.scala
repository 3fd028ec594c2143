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

  /** shard -> page-indexed decoded dl arrays (two-level lookup:
    * page = (doc - shardBase) / pageSize, then in-page offset).
    */
  val norms: Map[Int, Array[Array[Int]]] =
    SegmentIO.readNorms(spark, dir).collect()
      .groupBy(_.shard)
      .map { case (s, rows) =>
        val arrs = new Array[Array[Int]](rows.map(_.page).max + 1)
        rows.foreach(p => arrs(p.page) = Varbyte.decodeInts(p.dl_bytes, p.n))
        s -> arrs
      }

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
      t -> (idf, Bm25.boundScore(idf, d.max_tf, d.min_dl, stats.avgdl))
    }.toMap
    // shards traverse in parallel (the in-JVM analog of per-executor
    // shard fan-out); per-shard results are deterministic, and the
    // final merge re-sorts, so parallelism cannot affect output
    import scala.collection.parallel.CollectionConverters._
    val pageSize = stats.normsPageSize
    val all = shardIds.par.flatMap { shard =>
      val dlArrs = norms(shard)
      val shardBase = shard.toLong * stats.docsPerShard
      val cursors = present.flatMap { t =>
        postings(t).get(shard).map { bs =>
          val (idf, ms) = meta(t)
          new Wand.TermCursor(t, idf, ms, bs, stats.avgdl)
        }
      }
      if (cursors.isEmpty || (conjunctive && cursors.length < present.length))
        Array.empty[(Long, Double)]
      else {
        val dl = (d: Long) => {
          val rel = d - shardBase
          dlArrs((rel / pageSize).toInt)((rel % pageSize).toInt)
        }
        if (conjunctive) Wand.topKConjunctive(cursors, dl, stats.avgdl, k, minScore)
        else Wand.topKDisjunctive(cursors, dl, stats.avgdl, k, minScore)
      }
    }.toArray
    all.sortBy { case (d, s) => (-s, d) }.take(k)
  }
}
