package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.gen.TranscriptGen
import graft.index.IndexBuilder
import graft.model.Turn
import graft.query.LocalIndex
import graft.streaming.StreamingIngest

/** Structured Streaming surface: staged micro-batch ingest feeding
  * the SAME batch index builder, and watermarked windowed stats.
  */
class StreamingSpec extends SparkSpec {

  test("micro-batch staging -> batch index build -> queryable") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val staging = tempDir("graft-staging")
    val input = MemoryStream[Turn]
    val all = TranscriptGen.localCorpus(40)
    input.addData(all.take(all.size / 2))
    val q1 = StreamingIngest.stageTurns(input.toDS(), staging).start()
    q1.awaitTermination(60000)
    input.addData(all.drop(all.size / 2))
    val q2 = StreamingIngest.stageTurns(input.toDS(), staging).start()
    q2.awaitTermination(60000)

    val staged = StreamingIngest.stagedCorpus(spark, staging)
    assert(staged.count() == all.size)
    // staged corpus == original corpus, row for row
    assert(staged.exceptAll(TranscriptGen.corpus(spark, 40)).isEmpty)

    // compaction: the streaming-staged corpus builds the same index
    val dir = tempDir("graft-stream-idx")
    IndexBuilder.build(spark, staged, dir,
      IndexBuilder.Config(blockSize = 16, numShards = 4, numPartitions = 4))
    val li = new LocalIndex(spark, dir)
    val hits = li.retrieve("needle5alpha needle5beta", 5)
    assert(hits.nonEmpty)
    // rank-identity against the oracle still holds on streamed data
    val oracle = graft.query.LocalOracle.buildCorpus(all)
    val expected = graft.query.LocalOracle.topK(oracle, "needle5alpha needle5beta", 5)
      .map { case (d, s) => (d.docId, s) }
    assert(hits.toSeq == expected)
  }

  test("incremental compaction: staged batches appendBuild into the full-build index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val staging = tempDir("graft-staging-incr")
    val all = TranscriptGen.localCorpus(60)
    // batch boundary at a conv boundary (appendBuild precondition:
    // later keys sort after indexed ones)
    val (a, b) = all.partition(_.conv_id < "c00000040")
    val cfg = IndexBuilder.Config(blockSize = 16, numPartitions = 4,
      docsPerShard = Some(250), normsPageSize = 64)

    val input = MemoryStream[Turn]
    input.addData(a)
    StreamingIngest.stageTurns(input.toDS(), staging).start().awaitTermination(60000)
    val dir = tempDir("graft-incr-idx")
    IndexBuilder.build(spark, StreamingIngest.stagedCorpus(spark, staging), dir, cfg)

    input.addData(b)
    StreamingIngest.stageTurns(input.toDS(), staging).start().awaitTermination(60000)
    // incremental compaction: feed the WHOLE staged corpus — the
    // anti-join inside appendBuild skips everything already indexed
    IndexBuilder.appendBuild(spark,
      StreamingIngest.stagedCorpus(spark, staging), dir, numPartitions = 4)

    val fullDir = tempDir("graft-incr-full")
    IndexBuilder.build(spark, TranscriptGen.corpus(spark, 60), fullDir, cfg)
    def content(d: String) = graft.index.SegmentIO.readPostings(spark, d)
      .collect().map(bk => (bk.shard, bk.term, bk.block_id, bk.doc_bytes.toSeq,
        bk.tf_bytes.toSeq, bk.block_max_tf, bk.block_min_dl, bk.sum_tf)).toSet
    assert(content(dir) == content(fullDir),
      "incremental compaction must equal a full rebuild")
    // and it serves queries
    val li = new LocalIndex(spark, dir)
    assert(li.retrieve("needle5alpha needle5beta", 5).nonEmpty)
  }

  test("out-of-order delivery auto-compacts: queryable and rank-identical") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val staging = tempDir("graft-staging-ooo")
    val all = TranscriptGen.localCorpus(60)
    // LATER convs arrive first, then the earlier ones — the fast
    // append precondition fails and appendBuild must fall back to a
    // full compaction on its own
    val (early, late) = all.partition(_.conv_id < "c00000040")
    val cfg = IndexBuilder.Config(blockSize = 16, numPartitions = 4,
      docsPerShard = Some(250), normsPageSize = 64)

    val input = MemoryStream[Turn]
    input.addData(late)
    StreamingIngest.stageTurns(input.toDS(), staging).start().awaitTermination(60000)
    val dir = tempDir("graft-ooo-idx")
    IndexBuilder.build(spark, StreamingIngest.stagedCorpus(spark, staging), dir, cfg)

    input.addData(early)
    StreamingIngest.stageTurns(input.toDS(), staging).start().awaitTermination(60000)
    IndexBuilder.appendBuild(spark,
      StreamingIngest.stagedCorpus(spark, staging), dir, numPartitions = 4)

    val fullDir = tempDir("graft-ooo-full")
    IndexBuilder.build(spark, TranscriptGen.corpus(spark, 60), fullDir, cfg)
    def content(d: String) = graft.index.SegmentIO.readPostings(spark, d)
      .collect().map(bk => (bk.shard, bk.term, bk.block_id, bk.doc_bytes.toSeq,
        bk.tf_bytes.toSeq, bk.block_max_tf, bk.block_min_dl, bk.sum_tf)).toSet
    assert(content(dir) == content(fullDir),
      "out-of-order compaction must equal a from-scratch build")
    // rank identity on the compacted index
    val li = new LocalIndex(spark, dir)
    val oracle = graft.query.LocalOracle.buildCorpus(all)
    val expected = graft.query.LocalOracle.topK(oracle, "needle5alpha needle5beta", 5)
      .map { case (d, s) => (d.docId, s) }
    assert(li.retrieve("needle5alpha needle5beta", 5).toSeq == expected)
  }

  test("keyed upsert: a re-delivered CHANGED turn replaces, never duplicates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val staging = tempDir("graft-staging-upsert")
    val all = TranscriptGen.localCorpus(5)
    val victim = all.head
    val input = MemoryStream[Turn]
    input.addData(all)
    StreamingIngest.stageTurns(input.toDS(), staging).start().awaitTermination(60000)
    // later batch re-delivers the same (conv_id, turn_idx) with new text
    val revised = victim.copy(text = "revised content entirely different now")
    input.addData(Seq(revised))
    StreamingIngest.stageTurns(input.toDS(), staging).start().awaitTermination(60000)

    val staged = StreamingIngest.stagedCorpus(spark, staging)
    assert(staged.count() == all.size, "upsert must not grow the corpus")
    val rows = staged
      .filter($"conv_id" === victim.conv_id && $"turn_idx" === victim.turn_idx)
      .collect()
    assert(rows.length == 1, "exactly one row per key")
    assert(rows(0).text == revised.text, "latest batch wins")
  }

  test("watermarked windowed aggregation over event time") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Turn]
    val agg = StreamingIngest.windowedTurnStats(input.toDS())
    val q = agg.writeStream.format("memory").queryName("turn_stats")
      .outputMode(OutputMode.Complete).start()
    input.addData(TranscriptGen.localCorpus(10))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM turn_stats").collect()
    q.stop()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_turns")).sum
    assert(total == TranscriptGen.localCorpus(10).size)
    // window starts align to the hour; convs are 1 hour apart
    assert(rows.forall(r => r.getAs[java.sql.Timestamp]("window_start")
      .getTime % 3600000L == 0L))
  }

  test("stateful sessionization (flatMapGroupsWithState) matches the batch gap rule; late events drop+count") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Sessionize
    import Sessionize.{SessionCounts, SessionEvent}

    // 6 users × 20 events; every 5th event jumps >30 min → 4 sessions
    val events = (for {
      u <- 0L until 6L
      i <- 0L until 20L
    } yield SessionEvent(u, i, u * 10 + i * 600 + (i / 5) * 10000)).toVector

    // the batch rule (q_sessionize's window plan) in closed form
    val expected: Map[Long, (Long, Long, Long)] =
      events.groupBy(_.user_id).map { case (u, es) =>
        val sorted = es.sortBy(e => (e.tsSec, e.event_id))
        var last = Long.MinValue
        var n = 0L
        sorted.foreach { e =>
          if (last == Long.MinValue || e.tsSec - last > 1800L) n += 1
          last = e.tsSec
        }
        u -> ((n, es.size.toLong, 0L))
      }
    assert(expected.values.forall(_._1 == 4L), "fixture must produce multi-session users")

    def run(chunks: Seq[Seq[SessionEvent]], name: String): Map[Long, (Long, Long, Long)] = {
      val input = MemoryStream[SessionEvent]
      val q = Sessionize.sessionize(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      q.stop()
      // total processed (events + lates) is monotone per user → its
      // max row is final
      spark.sql(s"SELECT * FROM $name").as[SessionCounts].collect()
        .groupBy(_.user_id)
        .map { case (u, rows) =>
          val f = rows.maxBy(r => r.n_events + r.n_late)
          u -> ((f.n_sessions, f.n_events, f.n_late))
        }
    }

    // chronological chunking (the cross-batch contract) in 3 batches
    val chunked = run(events.sortBy(_.tsSec).grouped(events.size / 3 + 1).toSeq,
      "sess_chunked")
    assert(chunked == expected, "3-batch delivery must equal the batch rule")
    // single-batch delivery: identical — state fold is split-invariant
    val oneShot = run(Seq(events), "sess_oneshot")
    assert(oneShot == expected, "single-batch delivery must equal the batch rule")

    // late event across a batch boundary: dropped + counted, never
    // folded into the gap arithmetic (the pinned policy)
    val late = run(Seq(
      Seq(SessionEvent(99L, 0L, 1000L), SessionEvent(99L, 1L, 2000L)),
      // 1500 regresses the state clock (lastTs=2000) → late; 2000 ties
      // the clock (gap 0, same session) → NOT late; 9000 opens session 2
      Seq(SessionEvent(99L, 2L, 1500L), SessionEvent(99L, 3L, 2000L),
        SessionEvent(99L, 4L, 9000L))), "sess_late")
    assert(late == Map(99L -> ((2L, 4L, 1L))),
      s"late event must drop+count: got $late")
  }

  test("stateful streaming dedup: first-arrival keeper, chunking-invariant dupe counts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamDedup
    import StreamDedup.{KeptDoc, KeyedDoc}

    // 30 docs over 10 content keys: doc i has key h(i % 10)
    val docs = (0L until 30L).map(i => KeyedDoc(i, s"h${i % 10}")).toVector

    def run(chunks: Seq[Seq[KeyedDoc]], name: String): Map[String, (Long, Long)] = {
      val input = MemoryStream[KeyedDoc]
      val q = StreamDedup.dedupFirst(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      q.stop()
      // n_dupes is monotone per key → its max row is final
      spark.sql(s"SELECT * FROM $name").as[KeptDoc].collect()
        .groupBy(_.key)
        .map { case (k, rows) =>
          val f = rows.maxBy(_.n_dupes)
          k -> ((f.keep_id, f.n_dupes))
        }
    }

    // delivered in doc-id order: keeper == batch keep-min-id dedup,
    // under any chronological chunking
    val expected = (0 until 10).map(k => s"h$k" -> ((k.toLong, 2L))).toMap
    assert(run(Seq(docs), "dd_one") == expected)
    assert(run(docs.grouped(7).toSeq, "dd_chunks") == expected,
      "chronological chunking must not change keeper or counts")
    // out-of-order delivery, id-descending across batches: keeper is
    // first-arrival (ids 20..29 land in batch 1, so key h_k keeps
    // 20+k), but n_dupes stays delivery-invariant. A single reversed
    // batch would NOT show this — the in-batch fold sorts by id.
    val reversed = run(docs.reverse.grouped(10).toSeq, "dd_rev")
    assert(reversed == (0 until 10).map(k => s"h$k" -> ((20L + k, 2L))).toMap,
      s"reversed delivery keeps first-arrival keeper: got $reversed")
    assert(reversed.values.map(_._2).toSeq == expected.values.map(_._2).toSeq)
  }
}
