package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import graft.ops.{Dedup, Hashing, HeavyHitters, Pack, Sampling, Similarity}

/** Training-pipeline operators added in round 4: KMV distinct sketch,
  * deterministic hash split/sampling, sequence packing, embedding
  * near-dup. Each test pins the property the driver-gate DuckDB twin
  * relies on (determinism / partition invariance / closed-form
  * reference equivalence).
  */
class PipelineOpsSpec extends SparkSpec {

  // ------------------------------------------------------------- KMV

  test("kmv: below k the sketch IS the distinct set and the estimate is exact") {
    import spark.implicits._
    val df = (1 to 30).map(i => (i % 10).toLong).toDF("h")
    val row = df.agg(KmvSketch.mins(col("h"), 16).as("m"))
      .select(col("m"), KmvSketch.estimate(col("m"), 16).as("e"))
      .head()
    assert(row.getSeq[Long](0) == (0L until 10L))
    assert(row.getDouble(1) == 10.0)
  }

  test("kmv: bounded state, sorted output, partition-invariant, matches sort-limit oracle") {
    import spark.implicits._
    val k = 64
    val hashed = (1 to 5000).map(i => s"tok$i").toDF("t")
      .select(Hashing.hash32(col("t")).as("h"))
    def sketch(parts: Int): Seq[Long] =
      hashed.repartition(parts).agg(KmvSketch.mins(col("h"), k))
        .head().getSeq[Long](0)
    val s1 = sketch(1)
    val s8 = sketch(8)
    assert(s1 == s8, "sketch must not depend on partitioning")
    assert(s1.size == k)
    assert(s1 == s1.sorted)
    // the de-sketched reference: k smallest distinct hashes
    val oracle = hashed.distinct().orderBy("h").limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == oracle)
    // estimator sanity: k=64 → ~12.5% stderr; 40% is a safe assert band
    val est = hashed.agg(KmvSketch.mins(col("h"), k).as("m"))
      .select(KmvSketch.estimate(col("m"), k)).head().getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.4, s"estimate $est too far from 5000")
  }

  test("kmv: dedups within and across partials (duplicates never evict)") {
    import spark.implicits._
    // 8 distinct values, each repeated 100x, k=8 → all survive exactly once
    val df = (1 to 800).map(i => (i % 8).toLong * 1000L).toDF("h").repartition(7)
    val m = df.agg(KmvSketch.mins(col("h"), 8)).head().getSeq[Long](0)
    assert(m == (0L until 8L).map(_ * 1000L))
  }

  // ------------------------------------------------ sampling / split

  test("split assignment is total, deterministic, and fraction-faithful") {
    import spark.implicits._
    val ids = (0L until 20000L).toDF("id")
    val counts = ids
      .select(Sampling.splitAssign(col("id"), 9000, 500).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 20000L)
    // hash32 is uniform: 90/5/5 ± 1.5 percentage points at n=20000
    assert(math.abs(counts("train") / 20000.0 - 0.90) < 0.015)
    assert(math.abs(counts("val") / 20000.0 - 0.05) < 0.015)
    assert(math.abs(counts("test") / 20000.0 - 0.05) < 0.015)
    // deterministic: re-evaluation identical under different partitioning
    val a = ids.select(col("id"), Sampling.splitAssign(col("id"), 9000, 500).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = ids.repartition(13)
      .select(col("id"), Sampling.splitAssign(col("id"), 9000, 500).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("hash samples are nested: fraction 0.1 ⊆ fraction 0.3 under one salt") {
    import spark.implicits._
    val ids = (0L until 5000L).toDF("id")
    val s10 = ids.filter(Sampling.hashSample(col("id"), 0.1))
      .collect().map(_.getLong(0)).toSet
    val s30 = ids.filter(Sampling.hashSample(col("id"), 0.3))
      .collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s30))
    assert(math.abs(s10.size / 5000.0 - 0.1) < 0.02)
    assert(math.abs(s30.size / 5000.0 - 0.3) < 0.02)
  }

  test("mixture sampling: allowlist strata, per-stratum fractions, nested growth") {
    import spark.implicits._
    val rows = (0L until 8000L).map(i => (i, if (i % 2 == 0) "en" else "rare"))
    val df = rows.toDF("id", "lang")
    val bp = Map("en" -> 2500, "rare" -> 10000)
    val kept = df.filter(graft.ops.Sampling.mixtureSample(col("id"), col("lang"), bp))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("rare") == 4000L, "bp=10000 keeps the whole stratum")
    assert(math.abs(kept("en") / 4000.0 - 0.25) < 0.03)
    // absent stratum keeps nothing
    val none = df.filter(graft.ops.Sampling.mixtureSample(col("id"), col("lang"),
      Map("other" -> 10000))).count()
    assert(none == 0L)
    // growing a stratum's share only ADDS documents (same salt)
    val at25 = df.filter(graft.ops.Sampling.mixtureSample(col("id"), col("lang"), bp))
      .select("id").collect().map(_.getLong(0)).toSet
    val at60 = df.filter(graft.ops.Sampling.mixtureSample(col("id"), col("lang"),
      bp.updated("en", 6000))).select("id").collect().map(_.getLong(0)).toSet
    assert(at25.subsetOf(at60))
  }

  // ------------------------------------------------------ packing

  test("packSequences equals the naive global window and is chunk/partition-invariant") {
    import spark.implicits._
    // sparse ids (packing must follow id order, not density), varied sizes
    val docs = (0 until 500)
      .map(i => (i.toLong * 7 + (i % 3), (i % 97 + 1).toLong))
      .toDF("id", "n")
    def packed(chunkSize: Long, parts: Int): Seq[(Long, Long, Long, Long)] =
      Pack.packSequences(docs.repartition(parts), col("id"), col("n"),
          budget = 256, chunkSize = chunkSize)
        .orderBy("id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // chunkSize larger than the id space = exactly the naive global prefix sum
    val reference = packed(Long.MaxValue, 1)
    assert(packed(64L, 8) == reference)
    assert(packed(7L, 3) == reference)
    // closed-form invariants of the reference itself
    val byId = reference.sortBy(_._1)
    assert(byId.head._3 == 0L, "first doc starts at offset 0")
    byId.sliding(2).foreach { case Seq((_, n1, g1, _), (_, _, g2, _)) =>
      assert(g2 == g1 + n1, "offsets are the exclusive prefix sum")
    case _ => ()
    }
    assert(byId.map(_._4) == byId.map(_._4).sorted, "bins nondecreasing in id")
    reference.foreach { case (_, n, g, bin) => assert(bin == g / 256) }
  }

  test("binSummary bins carry contiguous id ranges and conserve tokens") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, (i % 50 + 10))).toDF("id", "n")
    val packed = Pack.packSequences(docs, col("id"), col("n"), budget = 512)
    val bins = Pack.binSummary(packed).orderBy("bin").collect()
    val totalTokens = docs.agg(sum("n")).head().getLong(0)
    assert(bins.map(_.getLong(2)).sum == totalTokens)
    assert(bins.map(_.getLong(1)).sum == 300L)
    // id ranges tile without overlap
    bins.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3))
      case _ => ()
    }
  }

  // ------------------------------------------- embedding near-dup

  test("embeddingNearDup = greedy min-id rollup of the verified LSH pairs") {
    import spark.implicits._
    val dim = 8
    // three exact clone families + distinct background vectors
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(d => math.sin(seed * 31 + d * 7).toFloat)
    val rows = (0 until 40).map { i =>
      val family = if (i % 10 == 0) 0 else if (i % 10 == 5) 1 else i + 100
      (i.toLong, vec(family))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.lshCosinePairsMulti(emb, col("vec_id"), col("embedding"),
        dim, tables = 4, planesPerTable = 3, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty, "clone families must collide")
    val nd = Dedup.embeddingNearDup(emb, col("vec_id"), col("embedding"),
        dim, tables = 4, planesPerTable = 3, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val expected = pairs.groupBy(_._2).map { case (b, ps) =>
      (b, ps.map(_._1).min, ps.size.toLong)
    }.toSet
    assert(nd.toSet == expected)
    // every clone family keeps its lowest id and drops the rest
    val dropped = nd.map(_._1).toSet
    assert(!dropped.contains(0L), "id 0 has no smaller neighbor, never drops")
    assert(Set(10L, 20L, 30L, 15L, 25L, 35L).subsetOf(dropped))
  }

  // ------------------------------------------------- IVF append

  test("ivfAppend: append ≡ assign-all under fixed centroids, idempotent, probe-parity") {
    import spark.implicits._
    def vec(i: Int): Seq[Float] =
      (0 until 8).map(d => ((i * 31 + d * 17) % 13 - 6).toFloat / 7f)
    val all = (0 until 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val first = all.filter(col("vec_id") < 20)
    val rest = all.filter(col("vec_id") >= 20)

    val dir = tempDir("ivf-append")
    Similarity.ivfWrite(first, col("vec_id"), col("embedding"), stride = 8L, dir)
    val appended = Similarity.ivfAppend(spark, dir, rest,
      col("vec_id"), col("embedding"))
    assert(appended == 20L)

    // lists after append == one-shot assignment of the full corpus
    // against the SAME stored centroids
    val (lists, cents) = Similarity.ivfRead(spark, dir)
    val got = lists.select(col("id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Similarity.ivfAssign(all, col("vec_id"), col("embedding"), cents)
      .select(col("id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.size == 40)

    // re-running the same append is a no-op (torn-append recovery story)
    assert(Similarity.ivfAppend(spark, dir, rest,
      col("vec_id"), col("embedding")) == 0L)
    assert(spark.read.parquet(s"$dir/lists").count() == 40L)

    // the pruned serving path over the appended index equals the
    // in-memory path over the full assignment
    val probes = all.filter(col("vec_id") < 2)
      .select(col("vec_id").as("pid"), col("embedding").as("pvec"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("pid"), col("id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val served = rows(Similarity.ivfTopKPruned(spark, dir, probes, nProbe = 2, k = 5))
    val inMem = rows(Similarity.ivfTopKAssigned(
      Similarity.ivfAssign(all, col("vec_id"), col("embedding"), cents),
      cents, probes, nProbe = 2, k = 5))
    assert(served == inMem && served.nonEmpty)

    // empty batch: no write, no count change
    assert(Similarity.ivfAppend(spark, dir, all.filter(col("vec_id") < 0),
      col("vec_id"), col("embedding")) == 0L)
    assert(spark.read.parquet(s"$dir/lists").count() == 40L)
  }

  // ------------------------------------------- heavy hitters (sketch)

  test("heavy hitters sketch: equals exact top-k over support, ub bounds cf, partition-invariant") {
    import spark.implicits._
    // 2 strata; 5 heavy terms (60..100 occurrences each) over a
    // 400-term singleton tail — the tail must prune at the bucket
    // stage without ever perturbing a surviving term's exact count
    val heavies = Seq("alpha" -> 100, "beta" -> 90, "gamma" -> 80,
      "delta" -> 70, "epsilon" -> 60)
    val rows = for {
      st <- Seq("a", "b")
      (t, n) <- heavies ++ (1 to 400).map(i => s"tail$i" -> 1)
      _ <- 1 to n
    } yield (st, t)
    val terms = rows.toDF("stratum", "term")

    def run(parts: Int) = HeavyHitters.sketchTopK(
        terms.repartition(parts), col("stratum"), col("term"),
        buckets = 256, support = 50L, k = 5)
      .select(col("stratum"), col("rank"), col("term"), col("cf"), col("ub"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sortBy(x => (x._1, x._2)).toSeq

    val got = run(1)
    assert(got == run(13), "sketch result must not depend on partitioning")
    // ub is the term's bucket count: >= its own cf always
    assert(got.forall { case (_, _, _, cf, ub) => ub >= cf })
    // no false negatives + exact counts: equals the exact top-k
    // restricted to cf >= support
    val exact = terms.groupBy("stratum", "term").agg(count(lit(1)).as("cf"))
      .filter(col("cf") >= 50)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("stratum")).orderBy(desc("cf"), asc("term"))))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getString(0), r.getInt(3), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got.map(x => (x._1, x._2, x._3, x._4)) == exact)
    assert(got.size == 10) // both strata fully ranked
  }

  // --------------------------------------- dedup chain semantics

  test("embeddingNearDup chain a~b~c: greedy drop, keep_id may itself be dropped") {
    import spark.implicits._
    val dim = 8
    // a ⟂ c, b = (a+c)/√2: cos(a,b) = cos(b,c) ≈ 0.707 ≥ τ=0.5,
    // cos(a,c) = 0 < τ — the canonical chain
    val a = Array.tabulate(dim)(d => if (d == 0) 1f else 0f)
    val c = Array.tabulate(dim)(d => if (d == 1) 1f else 0f)
    val b = Array.tabulate(dim)(d => (a(d) + c(d)) / math.sqrt(2).toFloat)
    val emb = Seq((1L, a.toSeq), (2L, b.toSeq), (3L, c.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.lshCosinePairsMulti(emb, col("vec_id"),
        col("embedding"), dim, tables = 4, planesPerTable = 1, tau = 0.5)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)),
      s"planted chain must survive LSH candidacy exactly, got $pairs")

    val nd = Dedup.embeddingNearDup(emb, col("vec_id"), col("embedding"),
        dim, tables = 4, planesPerTable = 1, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // b and c BOTH drop; c's keep_id is b — itself a dropped doc
    // (greedy policy, pinned); survivor set = docs with no row = {a}
    assert(nd == Map(2L -> 1L, 3L -> 2L))

    // clusterIds over the same pairs closes the chain: one component
    val cl = Dedup.clusterIds(
        Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("clusterIds: multi-component min labels, deep-path convergence, round-bound failure") {
    import spark.implicits._
    // path 1-…-6 (diameter 5) + pair 10-11 + triangle 20-21-22
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
    val pairs = edges.toDF("id_a", "id_b")
    val got = Dedup.clusterIds(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = ((1L to 6L).map(_ -> 1L) ++ Seq(10L -> 10L, 11L -> 10L) ++
      (20L to 22L).map(_ -> 20L)).toMap
    assert(got == want)
    // partition-invariance: labels are mins over sets
    assert(Dedup.clusterIds(pairs.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap == want)
    // a round bound below what compression needs must throw, never
    // return silently-partial clusters
    intercept[IllegalArgumentException] {
      Dedup.clusterIds(pairs, maxRounds = 2).collect()
    }
  }

  test("clusterIds: path compression resolves a 100-vertex chain within the default bound") {
    import spark.implicits._
    // diameter 99: plain min-label propagation needs 99 rounds and
    // would blow the default maxRounds=20 — pointer jumping must get
    // there in O(log 99) ≈ 7-12 rounds
    val chain = (1L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.clusterIds(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (1L to 100L).map(_ -> 1L).toMap)
  }

  test("clusterIds: deep chain (diameter 1499) — constant-size plans per round") {
    import spark.implicits._
    // ~13 compression rounds. This depth is the deterministic tripwire
    // for the lineage trap: the compression self-join doubles the
    // LOGICAL plan per round unless each round truncates lineage
    // (localCheckpoint) — under persist-only, round 13 would carry a
    // ~2^13-node plan and OOM in Catalyst/AQE plan-string work long
    // before the data (1,500 rows) mattered.
    val chain = (1L until 1500L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.clusterIds(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 1500 && got.values.forall(_ == 1L))
  }
}
