package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Stateful streaming exact dedup — the ingest-time twin of the batch
  * `Dedup.exact` / `q_dedup_exact` rule (group by content key, keep
  * one survivor, count the rest). Spark's built-in streaming
  * `dropDuplicates` keeps unbounded state and emits bare rows; this
  * operator additionally reports the running duplicate count per key
  * (the signal a training-data pipeline actually monitors) and pins
  * deterministic in-batch survivor choice.
  *
  * Per-key state is two longs (survivor id, duplicate count) —
  * O(distinct keys), the same bound as any streaming dedup. At
  * 10¹²-doc scale, distinct-key state must be windowed: put a
  * watermark-TTL upstream (dedup within the ingest window) and leave
  * cross-window dedup to the batch operator — this operator covers
  * the ingest window, where re-deliveries and crawler repeats
  * actually cluster.
  *
  * Determinism contract (StreamingSpec-pinned): within a micro-batch
  * the survivor is the MINIMUM doc id (arrival order inside a batch
  * is arbitrary, so the fold sorts first); across batches the
  * survivor is first-arrival (streaming cannot retract an emitted
  * keeper). For a stream delivered in doc-id order the result
  * therefore equals the batch keep-min-id dedup under ANY
  * chronological chunking, and `n_dupes` is chunking-invariant even
  * out of order.
  */
object StreamDedup {

  /** (doc id, content key) — key is typically `md5(text)`. */
  case class KeyedDoc(doc_id: Long, key: String)
  case class DedupState(keeper: Long, nDupes: Long)
  case class KeptDoc(key: String, keep_id: Long, n_dupes: Long)

  def dedupFirst(docs: Dataset[KeyedDoc]): Dataset[KeptDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.key)
      .flatMapGroupsWithState[DedupState, KeptDoc](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val ids = rows.map(_.doc_id).toSeq.sorted
          val st = state.getOption match {
            case None => DedupState(ids.head, ids.size - 1L)
            case Some(s) => s.copy(nDupes = s.nDupes + ids.size)
          }
          state.update(st)
          Iterator.single(KeptDoc(key, st.keeper, st.nDupes))
      }
  }
}
