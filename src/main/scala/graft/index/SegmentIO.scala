package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Segment layout on disk (SURVEY.md §1.3 — the Spark-native analog
  * of the reference's {embeddings.npy, pmid_index.json,
  * faiss_index.bin} artifact set, `src/vector_index.py:37-43`):
  *
  * {{{
  * <dir>/
  *   docs/        parquet, partitionBy(shard) dirs, doc_id-sorted
  *                within files (text + dl; tokens are NOT stored —
  *                they live only in the build process, see
  *                [[IndexedTurnTk]])
  *   dictionary/  parquet, term-sorted: term, df, cf, max_tf,
  *                min_dl, shards (v5 routing list)
  *   postings/    parquet, partitionBy(shard) dirs, (term, block_id)-
  *                sorted within files — a shard dir is the unit of
  *                overwrite for append/resume
  *   norms/       parquet, partitionBy(shard), one row per fixed-size
  *                doc-id page
  *   stats.json   num_docs, avgdl, total_tokens, shards, block size,
  *                norms page size
  *   manifest/    per-stage JSON manifests (lineage + resume markers)
  * }}}
  *
  * Format v5 invariant: NOTHING on disk depends on corpus-level
  * statistics (avgdl) — block/dictionary metadata store raw (max_tf,
  * min_dl) bounds and the avgdl-dependent BM25 upper bounds are
  * derived at query time. This is what makes incremental append
  * sound: adding documents changes avgdl, which would invalidate any
  * stored tf-norm, but never invalidates (max_tf, min_dl).
  *
  * "Iceberg-style": no Iceberg runtime jar ships in /opt/spark/jars,
  * so the snapshot/manifest metadata layer is written explicitly
  * (SURVEY.md §1.3 Iceberg note); the directory convention stays
  * catalog-compatible.
  */
object SegmentIO {

  /** Docs-table row (doc store + BM25 norms). Text is retained so
    * query-time keyword boost / penalize (reference
    * `src/search_engine.py:362-461`) needs no second source.
    */
  case class IndexedTurn(
      doc_id: Long,
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: String,
      ts: Timestamp,
      dl: Int,
      shard: Int)

  /** Build-side docs row: [[IndexedTurn]] plus the token array. A
    * fresh build hands the docs-stage dataset (tokens included) to
    * the postings stage, whose pass re-runs only the rank+tokenize
    * map over reused sort-shuffle files; a resumed build reconstructs
    * `tk` lazily from the stored text. The array is never written to
    * parquet — carrying it through the docs write was measured 3-5x
    * more expensive than the tokenize it saves (and persisting it in
    * the block cache costs more in serialized page faults than the
    * re-run map — see BASELINE.md round-2 notes).
    */
  case class IndexedTurnTk(
      doc_id: Long,
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: String,
      ts: Timestamp,
      dl: Int,
      shard: Int,
      tk: Array[String])

  /** One compressed posting block (block size cfg.blockSize docs):
    * delta+varbyte doc ids, varbyte tfs, block-max metadata for WAND.
    * (block_max_tf, block_min_dl) give the avgdl-independent score
    * upper bound idf * tfNorm(max_tf, min_dl, avgdl) at query time —
    * tfNorm is monotone increasing in tf and decreasing in dl, so the
    * bound dominates every member doc's contribution.
    */
  case class PostingBlock(
      term: String,
      block_id: Int,
      n: Int,
      first_doc: Long,
      last_doc: Long,
      doc_bytes: Array[Byte],
      tf_bytes: Array[Byte],
      block_max_tf: Int,
      block_min_dl: Int,
      sum_tf: Long,
      shard: Int)

  /** Per-term stats; (max_tf, min_dl) bound the term's score the same
    * way block metadata does, globally. `shards` (v5, sentinel v6) is
    * the sorted list of shards holding at least one posting for the
    * term — the query router's shard-pruning structure: a query
    * schedules tasks only for the union (OR) / intersection (AND) of
    * its terms' shard lists instead of fanning out to every shard of
    * a 10⁴-shard corpus. An EMPTY list is the v6 dense-term sentinel,
    * meaning "all shards" (IndexBuilder.DenseRoutingFraction) — it
    * keeps dictionary rows and the driver's term cache
    * O(fraction × numShards) bounded instead of letting common terms
    * carry full 10⁴-entry arrays.
    */
  case class DictEntry(term: String, df: Long, cf: Long, max_tf: Int, min_dl: Int,
      shards: Seq[Int])

  /** One fixed-size page of the per-shard doc-length (BM25 norm)
    * array: doc ids within a page are contiguous
    * [first_doc, first_doc + n), so dl lookup is a two-level index
    * (page = (doc - shardBase) / pageSize, then array offset). Pages
    * keep every row O(pageSize) regardless of shard size — no row
    * scales with the corpus, and no (doc - base) difference ever has
    * to fit an Int across more than one page.
    */
  case class NormsRow(shard: Int, page: Int, n: Int, first_doc: Long,
      dl_bytes: Array[Byte])

  case class IndexStats(
      numDocs: Long,
      avgdl: Double,
      totalTokens: Long,
      numShards: Int,
      docsPerShard: Long,
      blockSize: Int,
      normsPageSize: Int)

  def docsPath(dir: String) = s"$dir/docs"
  def normsPath(dir: String) = s"$dir/norms"
  def dictPath(dir: String) = s"$dir/dictionary"
  def postingsPath(dir: String) = s"$dir/postings"
  def statsPath(dir: String): Path = Paths.get(dir, "stats.json")
  def manifestDir(dir: String): Path = Paths.get(dir, "manifest")

  // ---- stats ----

  def writeStats(dir: String, s: IndexStats): Unit = {
    Files.createDirectories(Paths.get(dir))
    val json =
      s"""{"num_docs":${s.numDocs},"avgdl":${s.avgdl},"total_tokens":${s.totalTokens},""" +
        s""""num_shards":${s.numShards},"docs_per_shard":${s.docsPerShard},""" +
        s""""block_size":${s.blockSize},"norms_page_size":${s.normsPageSize}}"""
    Files.write(statsPath(dir), json.getBytes(StandardCharsets.UTF_8))
  }

  def readStats(dir: String): IndexStats = {
    val json = new String(Files.readAllBytes(statsPath(dir)), StandardCharsets.UTF_8)
    def f(k: String): String =
      s""""$k":([-0-9.eE]+)""".r.findFirstMatchIn(json).get.group(1)
    IndexStats(f("num_docs").toLong, f("avgdl").toDouble, f("total_tokens").toLong,
      f("num_shards").toInt, f("docs_per_shard").toLong, f("block_size").toInt,
      f("norms_page_size").toInt)
  }

  // ---- per-stage manifests: lineage + resume markers ----
  // Analog of the reference's JSON checkpoints
  // (`src/embedding_generator.py:116-132`): a stage whose manifest is
  // present and checksum-consistent is skipped on re-run; resume =
  // "anti-join of done stages" at stage granularity, with
  // per-partition (shard) row counts recorded for lineage.

  case class StageManifest(
      stage: String,
      inputRows: Long,
      outputRows: Long,
      checksum: Long,
      perPartRows: Seq[(String, Long)])

  def manifestPath(dir: String, stage: String): Path =
    manifestDir(dir).resolve(s"_stage_$stage.json")

  def writeManifest(dir: String, m: StageManifest): Unit = {
    Files.createDirectories(manifestDir(dir))
    val parts = m.perPartRows
      .map { case (k, v) => s"""{"part":"$k","rows":$v}""" }
      .mkString("[", ",", "]")
    val json =
      s"""{"stage":"${m.stage}","input_rows":${m.inputRows},"output_rows":${m.outputRows},""" +
        s""""checksum":${m.checksum},"partitions":$parts}"""
    Files.write(manifestPath(dir, m.stage), json.getBytes(StandardCharsets.UTF_8))
  }

  def stageDone(dir: String, stage: String): Boolean =
    Files.exists(manifestPath(dir, stage))

  /** Append-in-progress marker: written before an appendBuild's first
    * mutation, cleared after its snapshot commit. Presence on entry
    * means a torn append — the retry prunes the uncommitted rows
    * instead of silently absorbing them (doc ids must stay dense and
    * consistent with stats.numDocs).
    */
  def appendMarkerPath(dir: String): Path =
    manifestDir(dir).resolve("_append_inprogress")
  def writeAppendMarker(dir: String): Unit = {
    Files.createDirectories(manifestDir(dir))
    Files.write(appendMarkerPath(dir), "1".getBytes(StandardCharsets.UTF_8))
  }
  def clearAppendMarker(dir: String): Unit =
    Files.deleteIfExists(appendMarkerPath(dir))
  def appendInProgress(dir: String): Boolean =
    Files.exists(appendMarkerPath(dir))

  /** Per-shard row counts straight from parquet footers (driver-side
    * metadata reads, ~1 ms per file — no Spark job). Works on any
    * partitionBy(shard) table dir.
    */
  def shardRowCounts(path: String): Seq[(String, Long)] = {
    val base = new java.io.File(path)
    val dirs = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("shard="))
    val conf = new org.apache.hadoop.conf.Configuration()
    dirs.map { d =>
      val rows = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet")).map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum
      (d.getName.stripPrefix("shard="), rows)
    }.sortBy(_._1).toSeq
  }

  def readManifestChecksum(dir: String, stage: String): Option[Long] = {
    if (!stageDone(dir, stage)) None
    else {
      val json = new String(Files.readAllBytes(manifestPath(dir, stage)), StandardCharsets.UTF_8)
      """"checksum":(-?\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
    }
  }

  /** Snapshot manifest tying the whole segment together. */
  def writeSnapshot(dir: String, stages: Seq[String]): Unit = {
    val json = stages.map(s => s""""$s"""").mkString(
      s"""{"format":"graft-segment-v1","stages":[""", ",", "]}")
    Files.write(Paths.get(dir, "snapshot.json"), json.getBytes(StandardCharsets.UTF_8))
  }

  /** Order-independent content checksum of a DataFrame: XOR-fold of
    * xxhash64 over all columns (no overflow under ANSI mode,
    * deterministic under any row order).
    */
  def contentChecksum(df: DataFrame): Long = {
    val row = df
      .select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)").as("c"))
      .collect()(0)
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  // ---- readers ----

  def readDocs(spark: SparkSession, dir: String): Dataset[IndexedTurn] = {
    import spark.implicits._
    // shard is a partition-directory column — cast pins its type
    spark.read.parquet(docsPath(dir))
      .select(col("doc_id"), col("conv_id"), col("turn_idx"), col("role"),
        col("text"), col("tool"), col("ts"), col("dl"),
        col("shard").cast("int").as("shard"))
      .as[IndexedTurn]
  }

  /** Build-side reader: reconstructs the token array from the stored
    * text (the resume path's single tokenize).
    */
  def readDocsTk(spark: SparkSession, dir: String): Dataset[IndexedTurnTk] = {
    import spark.implicits._
    spark.read.parquet(docsPath(dir))
      .select(col("doc_id"), col("conv_id"), col("turn_idx"), col("role"),
        col("text"), col("tool"), col("ts"), col("dl"),
        col("shard").cast("int").as("shard"),
        graft.tokenize.Tokenizer.tokensCol(col("text")).as("tk"))
      .as[IndexedTurnTk]
  }

  def readDict(spark: SparkSession, dir: String): Dataset[DictEntry] = {
    import spark.implicits._
    spark.read.parquet(dictPath(dir)).as[DictEntry]
  }

  /** Direct read of ONE shard's norms pages straight from its
    * `norms/shard=N` partition directory — plain parquet-hadoop reads,
    * no Spark job, no shuffle. This is the query path's norms access:
    * each shard's WAND task opens only its own shard dir (the
    * partitionBy(shard) layout IS the pruning), so a query never
    * shuffles or scans the corpus-wide norms relation. Runs on
    * executors; the segment directory must be executor-visible (it is
    * by construction — the index was written by Spark to shared
    * storage).
    */
  def readShardNorms(dir: String, shard: Int): Array[NormsRow] = {
    val conf = sharedHadoopConf
    val p = new org.apache.hadoop.fs.Path(s"${normsPath(dir)}/shard=$shard")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Array.empty
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).flatMap { st =>
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), st.getPath)
        .withConf(conf)
        .build()
      try {
        Iterator.continually(reader.read()).takeWhile(_ != null).map { g =>
          NormsRow(shard, g.getInteger("page", 0), g.getInteger("n", 0),
            g.getLong("first_doc", 0), g.getBinary("dl_bytes", 0).getBytes)
        }.toArray
      } finally reader.close()
    }
  }

  /** Executor-local decoded dl-page cache, keyed (indexDir, shard):
    * the serving analog of a Lucene node keeping its shard's norms
    * resident across queries. Decoded pages cost 4 bytes/doc, so an
    * executor caching S shards of d docs holds 4·S·d bytes (e.g. 256
    * shards × 1M docs = 1 GB) — bounded by the crude whole-cache
    * eviction below, and in a real deployment by shard-to-executor
    * affinity (each executor only ever serves its shard subset).
    */
  private val dlCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Int]]]()
  private val MaxCachedShards = 4096

  /** Drop cached pages for a segment whose norms were rewritten in
    * place (append/compaction) — called by the builder. Complete in
    * local[*] mode where executors share the driver JVM (all tests /
    * bench / driver runs); a multi-JVM cluster deployment serves
    * immutable snapshot dirs instead of mutating a live segment, so
    * rewrites there arrive as new paths.
    */
  private[graft] def invalidateDlCache(dir: String): Unit = {
    dlCache.keySet.removeIf(_.startsWith(s"$dir#"))
    // every in-place mutation path (append, torn-append recovery,
    // compaction, rebuild) funnels through this call, so it doubles as
    // the segment's change signal: driver-side caches (SearchEngine's
    // dictionary/stats snapshot) re-validate against the generation
    dirGeneration.merge(dir, java.lang.Long.valueOf(1L),
      (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue))
  }

  /** Monotonic per-dir mutation counter, bumped by
    * [[invalidateDlCache]]. 0 for a never-mutated dir.
    */
  private val dirGeneration =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]
  private[graft] def generation(dir: String): Long =
    Option(dirGeneration.get(dir)).map(_.longValue).getOrElse(0L)

  /** Shared read-only Hadoop conf for the task-side direct parquet
    * reads: `new Configuration()` re-parses the XML default resources
    * on every call — a real per-call cost on the per-query serving
    * path (one readShardPostings per routed shard per query).
    */
  private[graft] lazy val sharedHadoopConf =
    new org.apache.hadoop.conf.Configuration()

  private[graft] def shardDlPages(dir: String, shard: Int): Array[Array[Int]] = {
    if (dlCache.size > MaxCachedShards) dlCache.clear()
    dlCache.computeIfAbsent(s"$dir#$shard", _ => {
      val pages = readShardNorms(dir, shard)
      if (pages.isEmpty) Array.empty
      else {
        val arrs = new Array[Array[Int]](pages.map(_.page).max + 1)
        pages.foreach(p => arrs(p.page) = Varbyte.decodeInts(p.dl_bytes, p.n))
        arrs
      }
    })
  }

  /** Direct read of ONE shard's postings for a fixed term set,
    * straight from its `postings/shard=N` partition dir — the postings
    * analog of [[readShardNorms]]. The term equality filter is handed
    * to parquet-hadoop ([[org.apache.parquet.filter2.predicate.FilterApi]]),
    * which skips non-matching row groups AND pages via the column
    * index (files are (term, block_id)-sorted, so a query's terms
    * cluster in a handful of pages) and record-filters the rest. This
    * is what lets a query schedule ONE task per shard with no
    * corpus-wide scan stage and no shuffle: each task opens only its
    * own shard dir, reads only its query-term pages.
    */
  def readShardPostings(dir: String, shard: Int, terms: Array[String]): Array[PostingBlock] = {
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
    import org.apache.parquet.io.api.Binary
    if (terms.isEmpty) return Array.empty
    val conf = sharedHadoopConf
    val p = new org.apache.hadoop.fs.Path(s"${postingsPath(dir)}/shard=$shard")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Array.empty
    val pred: FilterPredicate = terms
      .map(t => FilterApi.eq(FilterApi.binaryColumn("term"),
        Binary.fromString(t)): FilterPredicate)
      .reduce(FilterApi.or)
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).flatMap { st =>
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), st.getPath)
        .withConf(conf)
        .withFilter(FilterCompat.get(pred))
        .build()
      try {
        Iterator.continually(reader.read()).takeWhile(_ != null).map { g =>
          PostingBlock(
            g.getBinary("term", 0).toStringUsingUTF8,
            g.getInteger("block_id", 0), g.getInteger("n", 0),
            g.getLong("first_doc", 0), g.getLong("last_doc", 0),
            g.getBinary("doc_bytes", 0).getBytes,
            g.getBinary("tf_bytes", 0).getBytes,
            g.getInteger("block_max_tf", 0), g.getInteger("block_min_dl", 0),
            g.getLong("sum_tf", 0), shard)
        }.toArray
      } finally reader.close()
    }
  }

  def readNorms(spark: SparkSession, dir: String): Dataset[NormsRow] = {
    import spark.implicits._
    spark.read.parquet(normsPath(dir))
      .select(col("shard").cast("int").as("shard"), col("page"), col("n"),
        col("first_doc"), col("dl_bytes"))
      .as[NormsRow]
  }

  def readPostings(spark: SparkSession, dir: String): Dataset[PostingBlock] = {
    import spark.implicits._
    // shard comes back as a partition-directory column — cast pins the
    // type regardless of partition-inference settings
    spark.read.parquet(postingsPath(dir))
      .select(col("term"), col("block_id"), col("n"), col("first_doc"),
        col("last_doc"), col("doc_bytes"), col("tf_bytes"),
        col("block_max_tf"), col("block_min_dl"), col("sum_tf"),
        col("shard").cast("int").as("shard"))
      .as[PostingBlock]
  }
}
