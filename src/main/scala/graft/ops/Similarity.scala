package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine top-k as the exactness baseline, and
  * random-hyperplane LSH bucketing as the scale path (candidates
  * drop from O(n²) to per-bucket joins; recall tunable by planes).
  *
  * All math is promoted to double with a FIXED left-to-right fold so
  * results are bit-reproducible across engines (same contract as the
  * BM25 score fold, SURVEY §7.5).
  */
object Similarity {

  /** Σ a[i]*b[i] with sequential fold (both arrays cast to double). */
  def dot(va: Column, vb: Column): Column =
    aggregate(zip_with(va, vb, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(va: Column, vb: Column): Column =
    dot(va, vb) / (norm(va) * norm(vb))

  /** Brute-force cosine top-k against one probe vector (broadcast
    * single-row cross join → score-all → TakeOrderedAndProject).
    */
  def cosineTopK(emb: DataFrame, id: Column, vec: Column, probeId: Long, k: Int): DataFrame = {
    val probe = emb.filter(id === probeId)
      .select(vec.as("probe_vec"))
    emb.select(id.as("id"), vec.as("vec"))
      .filter(col("id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("id"), cosine(col("vec"), col("probe_vec")).as("cos"))
      .orderBy(desc("cos"), asc("id"))
      .limit(k)
  }

  /** k-NN join: top-k neighbors for each probe row (window ranking
    * over the candidate cross product; probes must be a small set —
    * broadcast side).
    */
  def knnJoin(emb: DataFrame, id: Column, vec: Column, probeMaxId: Long, k: Int): DataFrame = {
    val probes = emb.filter(id < probeMaxId).select(id.as("pid"), vec.as("pvec"))
    val cands = emb.select(id.as("id"), vec.as("vec"))
    val scored = cands
      .join(broadcast(probes), col("id") =!= col("pid"))
      .select(col("pid"), col("id"), cosine(col("vec"), col("pvec")).as("cos"))
    val w = Window.partitionBy(col("pid")).orderBy(desc("cos"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component — engine-
    * portable (same formula emitted in the DuckDB oracle):
    * plane(j)[d] = ((1103515245*(j*dim+d) + 12345) % 65536) / 65536 - 0.5
    */
  def planeComponent(j: Int, dim: Int): Column => Column = d =>
    ((lit(1103515245L) * (lit(j.toLong * dim) + d) + lit(12345L)) % lit(65536L))
      .cast("double") / lit(65536.0) - lit(0.5)

  /** Random-hyperplane LSH bucket id: `planes` sign bits of
    * plane-projections packed into a long. Vectors in the same bucket
    * are near-duplicate candidates (verify with [[cosine]]).
    */
  def lshBucket(vec: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, d) => x.cast("double") * planeComponent(j, dim)(d)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN via LSH: bucket join → exact cosine verify ≥ tau. The scale
    * path for embedding near-dup (SURVEY prompt: IVF/LSH variant).
    */
  def lshCosinePairs(
      emb: DataFrame,
      id: Column,
      vec: Column,
      dim: Int,
      planes: Int = 8,
      tau: Double = 0.8): DataFrame = {
    val b = emb.select(id.as("id"), vec.as("vec"),
      lshBucket(vec, dim, planes).as("bucket"))
    b.as("l").join(b.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        cosine(col("l.vec"), col("r.vec")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Multi-table banded LSH — the version that survives 10⁹ vectors:
    *
    *  - `tables` independent hash tables (disjoint plane sets), so
    *    recall is 1-(1-p^planes)^tables instead of a single table's
    *    p^planes — more planes per table (smaller buckets) without
    *    giving up recall;
    *  - per-(table, bucket) self-joins only — the pair space is
    *    Σ bucket², never n²;
    *  - `maxBucketSize` drops degenerate hot buckets (near-constant
    *    vector regions) before they can quadratically explode a join,
    *    the same stop-guard idea as `Dedup.ngramJaccardJoin`'s
    *    maxShingleDf.
    *
    * Pairs colliding in several tables dedup through `distinct`
    * before the exact-cosine verify.
    */
  def lshCosinePairsMulti(
      emb: DataFrame,
      id: Column,
      vec: Column,
      dim: Int,
      tables: Int = 4,
      planesPerTable: Int = 6,
      tau: Double = 0.4,
      maxBucketSize: Int = 10000): DataFrame = {
    // plane index g = tbl*planesPerTable + j explodes into ROWS, so the
    // projection expression stays small (a tables*planes-wide
    // expression tree was measured to cost seconds of driver-side
    // codegen compilation per query); the bucket reassembles with one
    // tiny aggregation. plane(g)[d] mirrors planeComponent exactly.
    val nPlanes = tables * planesPerTable
    val g = col("g")
    val planeOfG = (d: Column) =>
      ((lit(1103515245L) * (g * lit(dim.toLong) + d) + lit(12345L)) % lit(65536L))
        .cast("double") / lit(65536.0) - lit(0.5)
    val powers = array((0 until planesPerTable).map(j => lit(1L << j)): _*)
    val proj = aggregate(
      zip_with(col("vec"), sequence(lit(0), lit(dim - 1)),
        (x, d) => x.cast("double") * planeOfG(d)),
      lit(0.0), (acc, x) => acc + x)
    // (id, tbl, bucket) is consumed by four plan branches (bucket
    // sizing, both join sides, pruning); persisting the tiny relation
    // stops the projections from re-evaluating once per branch
    val entries = emb
      .select(id.as("id"), vec.as("vec"),
        explode(sequence(lit(0), lit(nPlanes - 1))).as("g"))
      .select(col("id"), (g / lit(planesPerTable)).cast("int").as("tbl"),
        when(proj > 0,
          element_at(powers, pmod(g, lit(planesPerTable)).cast("int") + 1))
          .otherwise(lit(0L)).as("bit"))
      .groupBy(col("id"), col("tbl"))
      .agg(sum(col("bit")).cast("long").as("bucket"))
      .persist()
    // hot-bucket cap as a windowed count over the (tbl, bucket)
    // partitions: one exchange instead of an aggregate + semi-join
    // pair; partitions are bucket-sized, never corpus-sized
    val pruned = entries
      .withColumn("bsz",
        count(lit(1)).over(Window.partitionBy(col("tbl"), col("bucket"))))
      .filter(col("bsz") <= maxBucketSize)
      .select(col("id"), col("tbl"), col("bucket"))
    val cand = pruned.as("l")
      .join(pruned.as("r"),
        col("l.tbl") === col("r.tbl") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val vecs = emb.select(id.as("id"), vec.as("vec"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        cosine(col("vec_a"), col("vec_b")).as("cos"))
      .filter(col("cos") >= tau)
  }
}
