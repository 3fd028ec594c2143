package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting — the
  * reproducibility primitive of a training-data pipeline: membership
  * depends only on (salt, key), never on partitioning, executor
  * count, or row order, so a 100 TB run and its 1 GB debug replay
  * select the SAME rows, appends never reshuffle earlier assignments,
  * and train/val/test splits stay stable across rebuilds. (Spark's
  * `df.sample` is seeded per-partition — repartitioning changes the
  * sample — which is exactly what this avoids.)
  *
  * All derivations go through one engine-portable micro-bucket:
  * hash32(salt ':' key) mod 10000 (basis points), replayed verbatim
  * by the DuckDB oracle via [[Hashing.hash32Sql]].
  */
object Sampling {

  /** Stable bucket in [0, 10000) from (salt, key). Narrow per-row
    * expression — no shuffle, no state; pushes through any plan.
    */
  def bucket10k(key: Column, salt: String): Column =
    pmod(Hashing.hash32(concat(lit(salt + ":"), key.cast("string"))), lit(10000L))

  def bucket10kSql(keyExpr: String, salt: String): String =
    s"${Hashing.hash32Sql(s"'$salt:' || ($keyExpr)::VARCHAR")} % 10000"

  /** Keep-predicate sampling `fraction` (rounded to basis points) of
    * keys. Deterministic: same (salt, key) always decides the same way.
    */
  def hashSample(key: Column, fraction: Double, salt: String = "smp"): Column = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    bucket10k(key, salt) < lit(math.round(fraction * 10000))
  }

  /** Train/val/test assignment by basis points (e.g. 9000/500 →
    * 90% / 5% / 5%): a total, disjoint, deterministic labeling.
    */
  def splitAssign(
      key: Column,
      trainBp: Int,
      valBp: Int,
      salt: String = "split"): Column = {
    require(trainBp >= 0 && valBp >= 0 && trainBp + valBp <= 10000,
      s"basis points must satisfy 0 <= train + val <= 10000, got $trainBp/$valBp")
    val b = bucket10k(key, salt)
    when(b < trainBp, lit("train"))
      .when(b < trainBp + valBp, lit("val"))
      .otherwise(lit("test"))
  }

  def splitAssignSql(keyExpr: String, trainBp: Int, valBp: Int,
      salt: String = "split"): String = {
    val b = bucket10kSql(keyExpr, salt)
    s"""CASE WHEN $b < $trainBp THEN 'train'
       |     WHEN $b < ${trainBp + valBp} THEN 'val'
       |     ELSE 'test' END""".stripMargin
  }

  /** Mixture sampling: a per-stratum keep fraction (basis points) —
    * how a pretraining data mixture downsamples over-represented
    * sources/languages while keeping rare ones whole. Strata absent
    * from the map keep nothing (explicit-allowlist semantics).
    * Deterministic per (salt, key) like every sampler here, so the
    * mixture is stable under appends and re-runs; per-stratum samples
    * are nested across fraction changes (same salt), so growing a
    * stratum's share only ADDS documents.
    */
  def mixtureSample(
      key: Column,
      stratum: Column,
      fractionsBp: Map[String, Int],
      salt: String = "mix"): Column = {
    fractionsBp.values.foreach(bp =>
      require(bp >= 0 && bp <= 10000, s"basis points must be in [0,10000], got $bp"))
    val thr = fractionsBp.foldLeft(lit(0)) { case (acc, (s, bp)) =>
      when(stratum === s, lit(bp)).otherwise(acc)
    }
    bucket10k(key, salt) < thr
  }

  def mixtureSampleSql(
      keyExpr: String,
      stratumExpr: String,
      fractionsBp: Map[String, Int],
      salt: String = "mix"): String = {
    val whens = fractionsBp.toSeq.sortBy(_._1)
      .map { case (s, bp) => s"WHEN '$s' THEN $bp" }.mkString(" ")
    s"${bucket10kSql(keyExpr, salt)} < (CASE $stratumExpr $whens ELSE 0 END)"
  }
}
