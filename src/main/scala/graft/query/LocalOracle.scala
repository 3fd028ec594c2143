package graft.query

import graft.model.Turn
import graft.tokenize.Tokenizer

/** Single-threaded exact-BM25 oracle — the ground truth the optimized
  * engine must match rank-identically (SURVEY.md §0 substitution
  * note). Plays the role FAISS's exhaustive `IndexFlatIP` plays in
  * the reference (`src/vector_index.py:78`): a brute-force scorer
  * with no pruning, no compression, no distribution.
  *
  * Determinism contract (SURVEY.md §7.5):
  *  - doc ids = global rank under (conv_id, turn_idx) ordering
  *  - per-doc score = Σ over query terms in LEXICOGRAPHIC order
  *  - ties broken (score desc, doc_id asc)
  */
object LocalOracle {

  final case class Doc(docId: Long, convId: String, turnIdx: Int, tf: Map[String, Int], dl: Int)

  final case class Corpus(docs: IndexedSeq[Doc], df: Map[String, Long], avgdl: Double) {
    def numDocs: Long = docs.length.toLong
  }

  def buildCorpus(turns: Seq[Turn]): Corpus = {
    val sorted = turns.sortBy(t => (t.conv_id, t.turn_idx))
    val docs = sorted.zipWithIndex.map { case (t, i) =>
      val toks = Tokenizer.tokenize(t.text)
      val tf = toks.groupBy(identity).map { case (k, v) => (k, v.length) }
      Doc(i.toLong, t.conv_id, t.turn_idx, tf, toks.length)
    }.toIndexedSeq
    val df = scala.collection.mutable.HashMap.empty[String, Long]
    docs.foreach(d => d.tf.keys.foreach(t => df.update(t, df.getOrElse(t, 0L) + 1)))
    val avgdl =
      if (docs.isEmpty) 0.0 else docs.map(_.dl.toLong).sum.toDouble / docs.length
    Corpus(docs, df.toMap, avgdl)
  }

  /** Exact top-k. conjunctive=true keeps only docs containing ALL
    * query terms (posting-intersection semantics); default is
    * disjunctive (WAND-complete scoring).
    */
  def topK(
      corpus: Corpus,
      queryText: String,
      k: Int,
      conjunctive: Boolean = false,
      minScore: Double = 0.0): IndexedSeq[(Doc, Double)] = {
    val qTerms = Tokenizer.tokenize(queryText).distinct.sorted
    if (qTerms.isEmpty) return IndexedSeq.empty
    val idf = qTerms.map(t =>
      t -> Bm25.idf(corpus.numDocs, corpus.df.getOrElse(t, 0L))).toMap
    val scored = corpus.docs.iterator.flatMap { d =>
      var score = 0.0
      var present = 0
      qTerms.foreach { t =>
        d.tf.get(t) match {
          case Some(tf) =>
            present += 1
            score += idf(t) * Bm25.tfNorm(tf, d.dl, corpus.avgdl)
          case None =>
        }
      }
      val keep = present > 0 && (!conjunctive || present == qTerms.length)
      if (keep && score >= minScore) Some((d, score)) else None
    }.toIndexedSeq
    scored.sortBy { case (d, s) => (-s, d.docId) }.take(k)
  }
}
