package graft.index

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Turn
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
  *                The corpus is tokenized HERE, exactly once — the
  *                token array is carried in the docs table and the
  *                postings stage explodes it instead of re-tokenizing.
  *  2. stats      num_docs / avgdl / total_tokens as aggregations
  *                (the reference's global corpus statistic,
  *                `src/embedding_generator.py:241-276`).
  *  3. postings   carried tokens → hash-repartition by (shard, term)
  *                → in-partition sort → streaming block encode
  *                (delta+varbyte, avgdl-independent (max_tf, min_dl)
  *                block bounds). With cfg.salts > 1, hot terms build
  *                as salted sub-postings merged by a sort-merge
  *                shuffle — byte-identical output. With
  *                cfg.postingsGroups = G > 1, shards build and COMMIT
  *                in G independent jobs (dynamic partition overwrite
  *                of the shard dirs each job owns), so a crash loses
  *                at most one group and resume re-runs only
  *                not-yet-committed groups (G = numShards gives
  *                per-shard commit granularity).
  *  4. dictionary per-term df, cf, max_tf, min_dl (hash agg over
  *                block metadata, map-side partial).
  *  5. norms      per-(shard, page) doc-length arrays, page size
  *                cfg.normsPageSize — no row ever scales with shard
  *                or corpus size.
  *
  * The index is document-sharded (shard = doc_id / docsPerShard):
  * each shard holds complete postings for its doc range, so query
  * fan-out is per-shard local top-k + driver merge — the layout that
  * scales to many executors without term-granularity hotspots. With
  * Config.docsPerShard set, shards are FIXED-SIZE and the shard count
  * grows with the corpus (the 100 TB layout, and the precondition for
  * [[appendBuild]] producing output content-identical to a full
  * rebuild).
  */
object IndexBuilder {

  case class Config(
      blockSize: Int = 128,
      numShards: Int = 32,
      // fixed-size-shard mode: docsPerShard pinned, shard count grows
      // with the corpus — append-stable (appendBuild requires it for
      // full-rebuild equivalence)
      docsPerShard: Option[Long] = None,
      numPartitions: Int = 32,
      salts: Int = 1,
      normsPageSize: Int = 1 << 20,
      // shard-group commit granularity for the postings stage
      postingsGroups: Int = 1,
      // cache the input Dataset across the docs stage's multiple
      // passes; disable when the input is already a file-backed table
      // (re-scanning parquet is cheaper than first-touching cache pages)
      cacheInput: Boolean = true)

  /** One salted sub-posting run: a doc-ordered slice of one term's
    * postings within a shard (salt = hash(doc_id) % salts).
    */
  case class SubRun(shard: Int, term: String, salt: Int,
      docIds: Array[Long], tfs: Array[Int], dls: Array[Int])

  /** Stage 1: stable doc ids. Two-pass rank (per-partition counts →
    * offsets) via zipWithIndex over the range-partitioned sort — the
    * one place RDD is forced: `row_number()` over an unbounded window
    * would single-partition the corpus (SURVEY §7.5). Tokenizes each
    * turn exactly once and carries the array.
    *
    * @param baseId id of the first assigned doc (used by appendBuild
    *               to continue the id space after the existing corpus)
    */
  def assignDocIds(
      spark: SparkSession,
      turns: Dataset[Turn],
      numPartitions: Int,
      docsPerShard: Long,
      baseId: Long = 0L): Dataset[IndexedTurnTk] = {
    import spark.implicits._
    val sorted = turns
      .repartitionByRange(numPartitions, $"conv_id", $"turn_idx")
      .sortWithinPartitions($"conv_id", $"turn_idx")
    val rdd = sorted.rdd.zipWithIndex().map { case (t, i0) =>
      val i = baseId + i0
      val tk = Tokenizer.tokenize(t.text)
      IndexedTurnTk(i, t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts,
        tk.length, (i / docsPerShard).toInt, tk)
    }
    spark.createDataset(rdd)
  }

  /** Raw token occurrences (shard, term, doc_id, dl, tfinc), one row
    * per occurrence, exploded from the token array carried in the docs
    * table — the corpus text is never re-tokenized. Term frequencies
    * are folded later inside the posting encoder from the sorted
    * stream (tfinc sums over equal doc ids), so the build has exactly
    * ONE wide shuffle over the token relation.
    */
  private def rawTokens(spark: SparkSession, docs: Dataset[IndexedTurnTk]) = {
    import spark.implicits._
    docs
      .select($"doc_id", $"dl", $"shard", explode($"tk").as("term"))
      .withColumn("tfinc", lit(1))
  }

  private def timed[T](stage: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[build] $stage: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  /** Shard-dir-partitioned postings write. Dynamic partition overwrite
    * = only the shard dirs present in `blocks` are replaced, which is
    * what makes group commits and boundary-shard append rewrites
    * possible without touching other shards' files.
    */
  private def writePostings(dir: String, blocks: Dataset[PostingBlock]): Unit =
    blocks.toDF()
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "term", "block_id")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .parquet(postingsPath(dir))

  /** Paged norms for the given docs slice, written with dynamic
    * partition overwrite (append rebuilds only shards >= boundary).
    */
  private def writeNorms(
      spark: SparkSession,
      dir: String,
      docs: Dataset[(Int, Long, Int)], // (shard, doc_id, dl)
      docsPerShard: Long,
      pageSize: Int): Unit = {
    import spark.implicits._
    val dps = docsPerShard
    val p = pageSize
    docs
      .groupByKey { case (s, d, _) => (s, ((d - s.toLong * dps) / p).toInt) }
      .mapGroups { (key: (Int, Int), rows: Iterator[(Int, Long, Int)]) =>
        val arr = rows.toArray.sortBy(_._2)
        NormsRow(key._1, key._2, arr.length, arr.head._2,
          Varbyte.encodeInts(arr.map(_._3)))
      }
      .toDF()
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "page")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .parquet(normsPath(dir))
  }

  /** Dictionary = tiny agg over block metadata (df = Σ block n, cf =
    * Σ block tf sums, (max_tf, min_dl) = the term's global score-bound
    * inputs). Derived, so append just re-runs it.
    */
  private def writeDictionary(spark: SparkSession, dir: String, numDocs: Long): Unit = {
    import spark.implicits._
    val dict = readPostings(spark, dir)
      .groupBy($"term")
      .agg(sum($"n").cast("long").as("df"), sum($"sum_tf").cast("long").as("cf"),
        max($"block_max_tf").cast("int").as("max_tf"),
        min($"block_min_dl").cast("int").as("min_dl"))
    dict.orderBy($"term").write.mode("overwrite").parquet(dictPath(dir))
    val m = spark.read.parquet(dictPath(dir)).agg(count(lit(1)),
      expr("bit_xor(xxhash64(term, df, cf))")).collect()(0)
    writeManifest(dir, StageManifest("dictionary", numDocs,
      m.getLong(0), if (m.isNullAt(1)) 0L else m.getLong(1), Nil))
  }

  /** Overall postings manifest: per-shard counts + lineage checksum
    * over the written (compressed, pruned) parquet.
    */
  private def writePostingsManifest(spark: SparkSession, dir: String, numDocs: Long): Unit = {
    val shardRows = spark.read.parquet(postingsPath(dir))
      .groupBy("shard")
      .agg(count(lit(1)).as("c"),
        expr("bit_xor(xxhash64(term, block_id, first_doc, last_doc))").as("x"))
      .collect()
    val perShard = shardRows.map(r => (r.get(0).toString, r.getLong(1))).sortBy(_._1).toSeq
    val checksum = shardRows.map(r => if (r.isNullAt(2)) 0L else r.getLong(2))
      .foldLeft(0L)(_ ^ _)
    writeManifest(dir, StageManifest("postings", numDocs,
      perShard.map(_._2).sum, checksum, perShard))
  }

  private def writeNormsManifest(spark: SparkSession, dir: String, numDocs: Long): Unit = {
    val m = spark.read.parquet(normsPath(dir)).agg(count(lit(1)),
      expr("bit_xor(xxhash64(shard, page, n, first_doc))")).collect()(0)
    writeManifest(dir, StageManifest("norms", numDocs,
      m.getLong(0), if (m.isNullAt(1)) 0L else m.getLong(1), Nil))
  }

  def build(
      spark: SparkSession,
      turns: Dataset[Turn],
      dir: String,
      cfg: Config = Config()): IndexStats = {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel

    // ---- stage 1: docs (the single tokenize pass) ----
    if (!stageDone(dir, "docs")) timed("docs") {
      // the input lineage is walked several times (count, range-
      // partitioner sample, sort, rank) — materialize generated
      // inputs once; file-backed inputs re-scan instead
      val cached =
        if (cfg.cacheInput) turns.persist(StorageLevel.MEMORY_AND_DISK) else turns
      val n = timed("docs.count")(cached.count())
      val docsPerShard = cfg.docsPerShard.getOrElse(
        math.max(1L, (n + cfg.numShards - 1) / cfg.numShards))
      val numShards = math.max(1L, (n + docsPerShard - 1) / docsPerShard).toInt
      val ids = timed("docs.assign")(
        assignDocIds(spark, cached, cfg.numPartitions, docsPerShard)
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
      writeStats(dir, IndexStats(n, avgdl, totalTokens, numShards,
        docsPerShard, cfg.blockSize, cfg.normsPageSize))
      writeManifest(dir, StageManifest("docs", n, n, checksum, perShard))
      ids.unpersist()
      if (cfg.cacheInput) cached.unpersist()
    }
    val docs = readDocsTk(spark, dir).persist(StorageLevel.MEMORY_AND_DISK)

    // ---- stage 2: corpus statistics (df/cf live in the dictionary;
    // num_docs/avgdl/total_tokens were folded into the docs-stage
    // manifest aggregation — this stage just marks them final) ----
    if (!stageDone(dir, "stats")) timed("stats") {
      val s0 = readStats(dir)
      writeManifest(dir, StageManifest("stats", s0.numDocs, 1, s0.totalTokens, Nil))
    }
    val stats = readStats(dir)

    // ---- stage 3: postings — the build's ONE wide shuffle, in
    // cfg.postingsGroups independently-committed shard groups ----
    if (!stageDone(dir, "postings")) timed("postings") {
      val groups = math.max(1, cfg.postingsGroups)
      // a group marker is only trustworthy while its committed data
      // exists: if the postings dir is gone (wiped, not crashed),
      // every group must redo
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(postingsPath(dir))))
        (0 until groups).foreach(g =>
          java.nio.file.Files.deleteIfExists(manifestPath(dir, s"postings_g$g")))
      (0 until groups).foreach { g =>
        if (!stageDone(dir, s"postings_g$g")) timed(s"postings.group$g") {
          val toksAll = rawTokens(spark, docs)
          val toks =
            if (groups == 1) toksAll
            else toksAll.filter(pmod($"shard", lit(groups)) === g)
          val blocks =
            if (cfg.salts <= 1) encodeDirect(spark, toks, stats, cfg)
            else encodeSalted(spark, toks, stats, cfg)
          timed(s"postings.write$g")(writePostings(dir, blocks))
          writeManifest(dir, StageManifest(s"postings_g$g", stats.numDocs, 0L, 0L, Nil))
        }
      }
      writePostingsManifest(spark, dir, stats.numDocs)
    }

    // ---- stage 4: dictionary ----
    if (!stageDone(dir, "dictionary")) timed("dictionary") {
      writeDictionary(spark, dir, stats.numDocs)
    }

    // ---- stage 5: per-(shard, page) norm arrays (query-time dl) ----
    if (!stageDone(dir, "norms")) timed("norms") {
      writeNorms(spark, dir,
        docs.select($"shard", $"doc_id", $"dl").as[(Int, Long, Int)],
        stats.docsPerShard, stats.normsPageSize)
      writeNormsManifest(spark, dir, stats.numDocs)
    }
    docs.unpersist()

    writeSnapshot(dir, Seq("docs", "stats", "dictionary", "postings", "norms"))
    stats
  }

  /** Incremental append (reference `src/embedding_generator.py:225-239`
    * vstack-append + `find_and_add_papers.py:187-217` not-yet-indexed
    * anti-join): index only the new turns, touching exactly the shard
    * dirs the new doc ids land in.
    *
    *  - delta = anti-join of the incoming turns against the indexed
    *    doc keys; no-op if empty.
    *  - precondition: every delta key sorts AFTER the existing max
    *    (conv_id, turn_idx) — doc_id = global sort rank, so an
    *    out-of-order key would renumber existing docs; the caller must
    *    full-rebuild in that case (enforced with a clear error).
    *  - delta doc ids continue the id space (baseId = old numDocs);
    *    docsPerShard is pinned from the existing stats, so shard
    *    assignment is stable and only shards >= the boundary shard
    *    change.
    *  - the boundary shard (partially filled by the old corpus) is
    *    re-encoded from its decoded old postings + the delta tokens;
    *    all-new shards encode from delta tokens alone. Dynamic
    *    partition overwrite replaces exactly those shard dirs.
    *  - dictionary is a derived agg → recomputed; norms rebuild for
    *    shards >= boundary only; stats/manifests refresh.
    *
    * Output is content-identical to a full build over the union when
    * the full build uses the same fixed docsPerShard (tested in
    * IndexSpec) — possible because no stored metadata depends on
    * avgdl (segment format v3 invariant).
    */
  def appendBuild(
      spark: SparkSession,
      newTurns: Dataset[Turn],
      dir: String,
      numPartitions: Int = 32): IndexStats = {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel

    val stats0 = readStats(dir)
    val oldKeys = readDocs(spark, dir).select($"conv_id", $"turn_idx")
    val delta = newTurns
      .join(oldKeys, Seq("conv_id", "turn_idx"), "left_anti")
      .as[Turn]
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nd = delta.count()
    if (nd == 0) { delta.unpersist(); return stats0 }

    // precondition: append-only key space
    val maxOld = oldKeys.agg(max(struct($"conv_id", $"turn_idx"))).collect()(0)
      .getStruct(0)
    val minNew = delta.agg(min(struct($"conv_id", $"turn_idx"))).collect()(0)
      .getStruct(0)
    val ok = maxOld == null ||
      minNew.getString(0) > maxOld.getString(0) ||
      (minNew.getString(0) == maxOld.getString(0) &&
        minNew.getInt(1) > maxOld.getInt(1))
    require(ok,
      s"appendBuild: new keys must sort after the indexed corpus " +
        s"(min new = ${minNew}, max indexed = ${maxOld}); " +
        "out-of-order keys would renumber existing doc ids — full rebuild required")

    val dps = stats0.docsPerShard
    val oldN = stats0.numDocs
    val deltaIds = assignDocIds(spark, delta, numPartitions, dps, baseId = oldN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("append.docs")(deltaIds.write.mode("append").parquet(docsPath(dir)))

    val aggRow = deltaIds.agg(sum($"dl")).collect()(0)
    val deltaTokens = if (aggRow.isNullAt(0)) 0L else aggRow.getLong(0)
    val newN = oldN + nd
    val totalTokens = stats0.totalTokens + deltaTokens
    val stats1 = stats0.copy(
      numDocs = newN,
      avgdl = if (newN == 0) 0.0 else totalTokens.toDouble / newN,
      totalTokens = totalTokens,
      numShards = math.max(1L, (newN + dps - 1) / dps).toInt)

    // ---- postings: delta tokens + (if partially filled) the decoded
    // boundary shard, re-encoded together ----
    val boundary = (oldN / dps).toInt
    val boundaryPartial = oldN % dps != 0
    val deltaToks = rawTokens(spark, deltaIds)
    val input =
      if (!boundaryPartial) deltaToks
      else {
        val dlB = readDocs(spark, dir)
          .filter($"shard" === boundary && $"doc_id" < oldN)
          .select($"doc_id", $"dl")
        val decoded = readPostings(spark, dir)
          .filter($"shard" === boundary)
          .flatMap { b =>
            val ids = Varbyte.decodeDeltas(b.doc_bytes, b.n)
            val tfs = Varbyte.decodeInts(b.tf_bytes, b.n)
            ids.indices.iterator.map(i => (b.term, ids(i), tfs(i)))
          }
          .toDF("term", "doc_id", "tf")
        decoded.join(dlB, "doc_id")
          .select($"doc_id", $"dl", lit(boundary).as("shard"), $"term",
            $"tf".as("tfinc"))
          .union(deltaToks.select($"doc_id", $"dl", $"shard", $"term", $"tfinc"))
      }
    val cfg1 = Config(blockSize = stats0.blockSize, numPartitions = numPartitions,
      normsPageSize = stats0.normsPageSize)
    val blocks = encodeDirect(spark, input, stats1, cfg1)
    timed("append.postings")(writePostings(dir, blocks))
    writePostingsManifest(spark, dir, newN)

    // ---- dictionary: derived agg, recompute ----
    timed("append.dictionary")(writeDictionary(spark, dir, newN))

    // ---- norms: rebuild shards >= boundary from the docs table ----
    timed("append.norms")(writeNorms(spark, dir,
      readDocs(spark, dir).filter($"shard" >= boundary)
        .select($"shard", $"doc_id", $"dl").as[(Int, Long, Int)],
      dps, stats0.normsPageSize))
    writeNormsManifest(spark, dir, newN)

    // ---- stats + docs manifest refresh ----
    writeStats(dir, stats1)
    val shardRows = readDocs(spark, dir)
      .groupBy("shard")
      .agg(count(lit(1)).as("c"),
        expr("bit_xor(xxhash64(doc_id, conv_id, turn_idx))").as("x"))
      .collect()
    val perShard = shardRows.map(r => (r.get(0).toString, r.getLong(1))).sortBy(_._1).toSeq
    val checksum = shardRows.map(r => if (r.isNullAt(2)) 0L else r.getLong(2))
      .foldLeft(0L)(_ ^ _)
    writeManifest(dir, StageManifest("docs", newN, newN, checksum, perShard))
    writeManifest(dir, StageManifest("stats", newN, 1, totalTokens, Nil))
    writeSnapshot(dir, Seq("docs", "stats", "dictionary", "postings", "norms"))

    deltaIds.unpersist()
    delta.unpersist()
    stats1
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
      blockSize: Int): Seq[PostingBlock] = {
    val out = new ArrayBuffer[PostingBlock]((docIds.length + blockSize - 1) / blockSize)
    var off = 0
    var blockId = 0
    while (off < docIds.length) {
      val n = math.min(blockSize, docIds.length - off)
      val ids = java.util.Arrays.copyOfRange(docIds, off, off + n)
      val tfsB = java.util.Arrays.copyOfRange(tfs, off, off + n)
      var maxTf = 0
      var minDl = Int.MaxValue
      var sumTf = 0L
      var i = 0
      while (i < n) {
        if (tfsB(i) > maxTf) maxTf = tfsB(i)
        if (dls(off + i) < minDl) minDl = dls(off + i)
        sumTf += tfsB(i)
        i += 1
      }
      out += PostingBlock(term, blockId, n, ids(0), ids(n - 1),
        Varbyte.encodeDeltas(ids), Varbyte.encodeInts(tfsB), maxTf, minDl,
        sumTf, shard)
      off += n
      blockId += 1
    }
    out.toSeq
  }

  /** Accumulate one (shard, term) run of doc-sorted rows into per-doc
    * (ids, tfs, dls) — tf summed over consecutive rows of the same
    * doc_id (raw occurrences carry tfinc=1; decoded append inputs
    * carry their pre-counted tf).
    */
  private final class RunAcc {
    val ids = new ArrayBuffer[Long](64)
    val tfs = new ArrayBuffer[Int](64)
    val dls = new ArrayBuffer[Int](64)
    def add(docId: Long, dl: Int, tfinc: Int): Unit = {
      if (ids.nonEmpty && ids(ids.length - 1) == docId)
        tfs(tfs.length - 1) += tfinc
      else { ids += docId; tfs += tfinc; dls += dl }
    }
  }

  /** Direct path: hash-repartition raw occurrences by (shard, term)
    * — a group never splits across partitions — then in-partition
    * sort + streaming encode of consecutive groups.
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
      .select($"shard", $"term", $"doc_id", $"dl", $"tfinc")
      .as[(Int, String, Long, Int, Int)]
    val blockSize = stats.blockSize
    sorted.mapPartitions { it =>
      new Iterator[PostingBlock] {
        private val in = it.buffered
        private var pending: Iterator[PostingBlock] = Iterator.empty
        private def fill(): Unit = {
          while (!pending.hasNext && in.hasNext) {
            val (shard, term, _, _, _) = in.head
            val acc = new RunAcc
            while (in.hasNext && in.head._1 == shard && in.head._2 == term) {
              val (_, _, d, l, tf) = in.next()
              acc.add(d, l, tf)
            }
            pending = encodeGroup(shard, term, acc.ids.toArray, acc.tfs.toArray,
              acc.dls.toArray, blockSize).iterator
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
      .select($"shard", $"term", $"salt", $"doc_id", $"dl", $"tfinc")
      .as[(Int, String, Int, Long, Int, Int)]

    // sub-posting runs: one (shard, term, salt) = one sorted run
    val runs = salted.mapPartitions { it =>
      val in = it.buffered
      new Iterator[SubRun] {
        def hasNext: Boolean = in.hasNext
        def next(): SubRun = {
          val (shard, term, salt, _, _, _) = in.head
          val acc = new RunAcc
          while (in.hasNext && in.head._1 == shard &&
            in.head._2 == term && in.head._3 == salt) {
            val (_, _, _, d, l, tf) = in.next()
            acc.add(d, l, tf)
          }
          SubRun(shard, term, salt, acc.ids.toArray, acc.tfs.toArray, acc.dls.toArray)
        }
      }
    }

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
        encodeGroup(shard, term, ids, tfs, dls, blockSize).iterator
      }
  }
}
