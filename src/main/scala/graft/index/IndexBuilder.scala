package graft.index

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Turn
import graft.query.Bm25
import graft.tokenize.Tokenizer
import SegmentIO._

/** Distributed inverted-index build (BASELINE.json:north_rule; SURVEY
  * §3.2 maps it stage-by-stage onto the reference's
  * `build_complete_system.py` pipeline).
  *
  * Stages — each persisted + manifest-marked, so a killed build
  * resumes at the first incomplete stage (the reference's
  * checkpoint/resume pattern, `src/embedding_generator.py:150-181`):
  *
  *  1. docs       stable docID assignment: global sort on
  *                (conv_id, turn_idx) → rank. Rank is partition-
  *                boundary independent, so any parallelism yields the
  *                same ids (N vs 4N reproducibility, SURVEY §7.5).
  *  2. stats      num_docs / avgdl / total_tokens as aggregations
  *                (the reference's global corpus statistic,
  *                `src/embedding_generator.py:241-276`).
  *  3. dictionary per-term df, cf, max tf-norm (hash agg, map-side
  *                partial).
  *  4. postings   (term, doc_id, tf) → hash-repartition by
  *                (shard, term) → in-partition sort → streaming
  *                block encode (delta+varbyte, block-max). With
  *                cfg.salts > 1, hot terms build as salted
  *                sub-postings merged by a sort-merge shuffle —
  *                byte-identical output (block boundaries are
  *                salt-independent).
  *
  * The index is document-sharded (shard = doc_id / docsPerShard):
  * each shard holds complete postings for its doc range, so query
  * fan-out is per-shard local top-k + driver merge — the layout that
  * scales to many executors without term-granularity hotspots.
  */
object IndexBuilder {

  case class Config(
      blockSize: Int = 128,
      numShards: Int = 32,
      numPartitions: Int = 32,
      salts: Int = 1,
      // cache the input Dataset across the docs stage's multiple
      // passes; disable when the input is already a file-backed table
      // (re-scanning parquet is cheaper than first-touching cache pages)
      cacheInput: Boolean = true)

  /** One salted sub-posting run: a doc-ordered slice of one term's
    * postings within a shard (salt = hash(doc_id) % salts).
    */
  case class SubRun(shard: Int, term: String, salt: Int,
      docIds: Array[Long], tfs: Array[Int], dls: Array[Int])

  /** Column-expression twin of [[Bm25.tfNorm]] — operation order kept
    * identical for bit-equal doubles.
    */
  def tfNormCol(tf: Column, dl: Column, avgdl: Double): Column =
    tf * lit(Bm25.K1 + 1.0) /
      (tf + lit(Bm25.K1) * (lit(1.0 - Bm25.B) + lit(Bm25.B) * dl / lit(avgdl)))

  /** Stage 1: stable doc ids. Two-pass rank (per-partition counts →
    * offsets) via zipWithIndex over the range-partitioned sort — the
    * one place RDD is forced: `row_number()` over an unbounded window
    * would single-partition the corpus (SURVEY §7.5).
    */
  def assignDocIds(
      spark: SparkSession,
      turns: Dataset[Turn],
      numPartitions: Int,
      docsPerShard: Long): Dataset[IndexedTurn] = {
    import spark.implicits._
    val sorted = turns
      .repartitionByRange(numPartitions, $"conv_id", $"turn_idx")
      .sortWithinPartitions($"conv_id", $"turn_idx")
    val rdd = sorted.rdd.zipWithIndex().map { case (t, i) =>
      IndexedTurn(i, t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts,
        Tokenizer.tokenize(t.text).length, (i / docsPerShard).toInt)
    }
    spark.createDataset(rdd)
  }

  /** Raw token occurrences (shard, term, doc_id, dl), one row per
    * occurrence — term frequencies are counted later inside the
    * posting encoder from the sorted stream, so the build has exactly
    * ONE wide shuffle over the token relation.
    *
    * Tokenizer semantics identical to [[Tokenizer.tokensCol]], but
    * the stop-word filter runs on the EXPLODED column as a regular
    * `NOT IN` predicate: Catalyst compiles it to an InSet hash probe,
    * whereas `array_contains(<68-element array literal>, x)` inside a
    * higher-order filter() re-builds the literal array per token —
    * measured 5x slower on the build hot path.
    */
  private def rawTokens(spark: SparkSession, docs: Dataset[IndexedTurn]) = {
    import spark.implicits._
    docs
      .select($"doc_id", $"dl", $"shard",
        explode(split(lower($"text"), Tokenizer.SplitPattern)).as("term"))
      .filter(length($"term") >= Tokenizer.MinLen &&
        !$"term".isin(Tokenizer.StopWordsSorted.toSeq: _*))
  }

  private def timed[T](stage: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[build] $stage: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def build(
      spark: SparkSession,
      turns: Dataset[Turn],
      dir: String,
      cfg: Config = Config()): IndexStats = {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel

    // ---- stage 1: docs ----
    if (!stageDone(dir, "docs")) timed("docs") {
      // the input lineage is walked several times (count, range-
      // partitioner sample, sort, rank) — materialize generated
      // inputs once; file-backed inputs re-scan instead
      val cached =
        if (cfg.cacheInput) turns.persist(StorageLevel.MEMORY_AND_DISK) else turns
      val n = timed("docs.count")(cached.count())
      val docsPerShard = math.max(1L, (n + cfg.numShards - 1) / cfg.numShards)
      val ids = timed("docs.assign")(assignDocIds(spark, cached, cfg.numPartitions, docsPerShard)
        .persist(StorageLevel.MEMORY_AND_DISK))
      timed("docs.write")(ids.write.mode("overwrite").parquet(docsPath(dir)))
      // manifest counts + lineage checksum in ONE job over the
      // pre-write cache (per-shard XOR checksums fold to the global)
      val shardRows = timed("docs.manifest")(ids
        .groupBy("shard")
        .agg(count(lit(1)).as("c"),
          expr("bit_xor(xxhash64(doc_id, conv_id, turn_idx))").as("x"),
          sum($"dl").as("tok"))
        .collect())
      val perShard = shardRows.map(r => (r.get(0).toString, r.getLong(1))).sortBy(_._1).toSeq
      val checksum = shardRows.map(r => if (r.isNullAt(2)) 0L else r.getLong(2))
        .foldLeft(0L)(_ ^ _)
      val totalTokens = shardRows.map(r => if (r.isNullAt(3)) 0L else r.getLong(3)).sum
      val avgdl = if (n == 0) 0.0 else totalTokens.toDouble / n
      writeStats(dir, IndexStats(n, avgdl, totalTokens, cfg.numShards,
        docsPerShard, cfg.blockSize))
      writeManifest(dir, StageManifest("docs", n, n, checksum, perShard))
      ids.unpersist()
      if (cfg.cacheInput) cached.unpersist()
    }
    val docs = readDocs(spark, dir).persist(StorageLevel.MEMORY_AND_DISK)

    // ---- stage 2: corpus statistics (df/cf live in the dictionary;
    // num_docs/avgdl/total_tokens were folded into the docs-stage
    // manifest aggregation — this stage just marks them final) ----
    if (!stageDone(dir, "stats")) timed("stats") {
      val s0 = readStats(dir)
      writeManifest(dir, StageManifest("stats", s0.numDocs, 1, s0.totalTokens, Nil))
    }
    val stats = readStats(dir)

    // ---- stage 3: postings — the build's ONE wide shuffle ----
    if (!stageDone(dir, "postings")) timed("postings") {
      val toks = rawTokens(spark, docs)
      val blocks =
        if (cfg.salts <= 1) encodeDirect(spark, toks, stats, cfg)
        else encodeSalted(spark, toks, stats, cfg)
      // plain parquet; a narrow in-partition re-sort of the (small)
      // block relation restores term order so term-IN predicates
      // prune via row-group stats — no directory explosion
      timed("postings.write")(
        blocks.toDF().sortWithinPartitions("shard", "term", "block_id")
          .write.mode("overwrite").parquet(postingsPath(dir)))
      // manifest agg reads the (compressed, pruned) written parquet —
      // cheaper in fresh memory pages than caching the block relation
      val shardRows = spark.read.parquet(postingsPath(dir))
        .groupBy("shard")
        .agg(count(lit(1)).as("c"),
          expr("bit_xor(xxhash64(term, block_id, first_doc, last_doc))").as("x"))
        .collect()
      val perShard = shardRows.map(r => (r.get(0).toString, r.getLong(1))).sortBy(_._1).toSeq
      val checksum = shardRows.map(r => if (r.isNullAt(2)) 0L else r.getLong(2))
        .foldLeft(0L)(_ ^ _)
      writeManifest(dir, StageManifest("postings", stats.numDocs,
        perShard.map(_._2).sum, checksum, perShard))
    }

    // ---- stage 4: dictionary — tiny agg over block metadata (df =
    // Σ block n, cf = Σ block tf sums, max_tfnorm = max block max) ----
    if (!stageDone(dir, "dictionary")) timed("dictionary") {
      val dict = readPostings(spark, dir)
        .groupBy($"term")
        .agg(sum($"n").cast("long").as("df"), sum($"sum_tf").cast("long").as("cf"),
          max($"block_max_tfnorm").as("max_tfnorm"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      dict.orderBy($"term").write.mode("overwrite").parquet(dictPath(dir))
      // single fused job: row count + lineage checksum
      val m = dict.agg(count(lit(1)),
        expr("bit_xor(xxhash64(term, df, cf))")).collect()(0)
      writeManifest(dir, StageManifest("dictionary", stats.numDocs,
        m.getLong(0), if (m.isNullAt(1)) 0L else m.getLong(1), Nil))
      dict.unpersist()
    }

    // ---- stage 5: per-shard norm arrays (query-time dl lookup) ----
    if (!stageDone(dir, "norms")) timed("norms") {
      val norms = docs
        .select($"shard", $"doc_id", $"dl")
        .as[(Int, Long, Int)]
        .groupByKey(_._1)
        .mapGroups { (shard, rows) =>
          val arr = rows.toArray.sortBy(_._2)
          NormsRow(shard, arr.length, arr.head._2,
            Varbyte.encodeInts(arr.map(_._3)))
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      norms.toDF().write.mode("overwrite").parquet(normsPath(dir))
      val m = norms.toDF().agg(count(lit(1)),
        expr("bit_xor(xxhash64(shard, n, first_doc))")).collect()(0)
      writeManifest(dir, StageManifest("norms", stats.numDocs,
        m.getLong(0), if (m.isNullAt(1)) 0L else m.getLong(1), Nil))
      norms.unpersist()
    }
    docs.unpersist()

    writeSnapshot(dir, Seq("docs", "stats", "dictionary", "postings", "norms"))
    stats
  }

  /** Block-encode one (shard, term) posting group given per-doc
    * (doc_id asc, tf, dl) arrays.
    */
  private def encodeGroup(
      shard: Int,
      term: String,
      docIds: Array[Long],
      tfs: Array[Int],
      dls: Array[Int],
      avgdl: Double,
      blockSize: Int): Seq[PostingBlock] = {
    val out = new ArrayBuffer[PostingBlock]((docIds.length + blockSize - 1) / blockSize)
    var off = 0
    var blockId = 0
    while (off < docIds.length) {
      val n = math.min(blockSize, docIds.length - off)
      val ids = java.util.Arrays.copyOfRange(docIds, off, off + n)
      val tfsB = java.util.Arrays.copyOfRange(tfs, off, off + n)
      var maxTf = 0
      var maxTfNorm = 0.0
      var sumTf = 0L
      var i = 0
      while (i < n) {
        if (tfsB(i) > maxTf) maxTf = tfsB(i)
        sumTf += tfsB(i)
        val tn = Bm25.tfNorm(tfsB(i), dls(off + i), avgdl)
        if (tn > maxTfNorm) maxTfNorm = tn
        i += 1
      }
      out += PostingBlock(term, blockId, n, ids(0), ids(n - 1),
        Varbyte.encodeDeltas(ids), Varbyte.encodeInts(tfsB), maxTf, maxTfNorm,
        sumTf, shard)
      off += n
      blockId += 1
    }
    out.toSeq
  }

  /** Accumulate one (shard, term) run of doc-sorted raw occurrences
    * into per-doc (ids, tfs, dls) — tf counted from consecutive
    * duplicates of the same doc_id.
    */
  private final class RunAcc {
    val ids = new ArrayBuffer[Long](64)
    val tfs = new ArrayBuffer[Int](64)
    val dls = new ArrayBuffer[Int](64)
    def add(docId: Long, dl: Int): Unit = {
      if (ids.nonEmpty && ids(ids.length - 1) == docId)
        tfs(tfs.length - 1) += 1
      else { ids += docId; tfs += 1; dls += dl }
    }
  }

  /** Direct path: hash-repartition raw occurrences by (shard, term)
    * — a group never splits across partitions — then in-partition
    * sort + streaming encode of consecutive groups (tf counted from
    * consecutive duplicate doc ids).
    */
  private def encodeDirect(
      spark: SparkSession,
      toks: org.apache.spark.sql.DataFrame,
      stats: IndexStats,
      cfg: Config): Dataset[PostingBlock] = {
    import spark.implicits._
    // sort with a hash-leading key: long compares instead of string
    // compares dominate the 10^8-row sort; `term` stays in the key
    // only to disambiguate hash collisions (grouping, not order,
    // is what the encoder needs)
    // floor the shuffle width: at very low core counts a per-core
    // partition count would make multi-GB per-task sorts (tasks just
    // queue instead; output content is partition-invariant — tested)
    val shuffleParts = math.max(cfg.numPartitions, 16)
    val sorted = toks
      .withColumn("thash", xxhash64($"term"))
      .repartition(shuffleParts, $"shard", $"term")
      .sortWithinPartitions($"shard", $"thash", $"term", $"doc_id")
      .select($"shard", $"term", $"doc_id", $"dl")
      .as[(Int, String, Long, Int)]
    val avgdl = stats.avgdl
    val blockSize = stats.blockSize
    sorted.mapPartitions { it =>
      new Iterator[PostingBlock] {
        private val in = it.buffered
        private var pending: Iterator[PostingBlock] = Iterator.empty
        private def fill(): Unit = {
          while (!pending.hasNext && in.hasNext) {
            val (shard, term, _, _) = in.head
            val acc = new RunAcc
            while (in.hasNext && in.head._1 == shard && in.head._2 == term) {
              val (_, _, d, l) = in.next()
              acc.add(d, l)
            }
            pending = encodeGroup(shard, term, acc.ids.toArray, acc.tfs.toArray,
              acc.dls.toArray, avgdl, blockSize).iterator
          }
        }
        def hasNext: Boolean = { fill(); pending.hasNext }
        def next(): PostingBlock = { fill(); pending.next() }
      }
    }
  }

  /** Salted path for hot terms (north rule: "salted-key skew
    * handling"): sub-aggregate per (shard, term, salt = hash(doc_id)
    * % salts), then merge sub-postings with a sort-merge shuffle.
    * Block boundaries are applied only after the merge, so output is
    * byte-identical to the direct path (SURVEY §7.5).
    */
  private def encodeSalted(
      spark: SparkSession,
      toks: org.apache.spark.sql.DataFrame,
      stats: IndexStats,
      cfg: Config): Dataset[PostingBlock] = {
    import spark.implicits._
    val shuffleParts = math.max(cfg.numPartitions, 16)
    val salted = toks
      .withColumn("salt", pmod(xxhash64($"doc_id"), lit(cfg.salts)).cast("int"))
      .withColumn("thash", xxhash64($"term"))
      .repartition(shuffleParts, $"shard", $"term", $"salt")
      .sortWithinPartitions($"shard", $"thash", $"term", $"salt", $"doc_id")
      .select($"shard", $"term", $"salt", $"doc_id", $"dl")
      .as[(Int, String, Int, Long, Int)]

    // sub-posting runs: one (shard, term, salt) = one sorted run
    val runs = salted.mapPartitions { it =>
      val in = it.buffered
      new Iterator[SubRun] {
        def hasNext: Boolean = in.hasNext
        def next(): SubRun = {
          val (shard, term, salt, _, _) = in.head
          val acc = new RunAcc
          while (in.hasNext && in.head._1 == shard &&
            in.head._2 == term && in.head._3 == salt) {
            val (_, _, _, d, l) = in.next()
            acc.add(d, l)
          }
          SubRun(shard, term, salt, acc.ids.toArray, acc.tfs.toArray, acc.dls.toArray)
        }
      }
    }

    val avgdl = stats.avgdl
    val blockSize = stats.blockSize
    runs
      .groupByKey(r => (r.shard, r.term))
      .flatMapGroups { (key: (Int, String), rs: Iterator[SubRun]) =>
        val (shard, term) = key
        // k-way merge of disjoint sorted runs by doc_id
        val runList = rs.toArray
        val total = runList.map(_.docIds.length).sum
        val ids = new Array[Long](total)
        val tfs = new Array[Int](total)
        val dls = new Array[Int](total)
        val heads = Array.fill(runList.length)(0)
        var w = 0
        while (w < total) {
          var best = -1
          var bestDoc = Long.MaxValue
          var i = 0
          while (i < runList.length) {
            if (heads(i) < runList(i).docIds.length &&
              runList(i).docIds(heads(i)) < bestDoc) {
              bestDoc = runList(i).docIds(heads(i)); best = i
            }
            i += 1
          }
          ids(w) = runList(best).docIds(heads(best))
          tfs(w) = runList(best).tfs(heads(best))
          dls(w) = runList(best).dls(heads(best))
          heads(best) += 1
          w += 1
        }
        encodeGroup(shard, term, ids, tfs, dls, avgdl, blockSize).iterator
      }
  }
}
