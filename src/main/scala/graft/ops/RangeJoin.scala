package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: pair every point row with every
  * interval row of the same key whose [start, end] window contains
  * the point's timestamp — the attribution/containment primitive
  * (e.g. "clicks within the hour before each purchase").
  *
  * Plan, chosen for the 100 TB shape: Spark executes the naive
  * `p.key = i.key AND p.ts BETWEEN i.start AND i.end` as a key
  * equi-join whose output explodes to |points-per-key| ×
  * |intervals-per-key| pairs BEFORE the range predicate filters —
  * quadratic per key. This implementation buckets time into
  * fixed-width cells: each point lands in exactly one bucket, each
  * interval is exploded to the (few) buckets it overlaps, and the
  * join becomes an equi-join on (key, bucket) followed by the exact
  * range predicate. Join fan-out is bounded by true-matches +
  * same-bucket near-misses; the interval explode factor is
  * ⌈len/width⌉ + 1. Because a point has exactly ONE bucket and an
  * interval emits each overlapped bucket ONCE, every true match
  * surfaces exactly once — no post-join dedup pass.
  *
  * Size `bucketWidthSec` near the typical interval length: too small
  * inflates the interval explode, too large inflates near-miss pairs.
  * Skewed hot (key, bucket) cells are ordinary equi-join skew — AQE's
  * skew-join split handles them without operator changes.
  *
  * Bound semantics: inclusive on both ends (`start ≤ ts ≤ end`).
  * Sub-second timestamps are handled exactly: bucketing floors the
  * MICROSECOND epoch, and the predicate compares the original
  * timestamp columns, so bucket granularity never changes results
  * (JoinOpsSpec pins width-invariance).
  */
object RangeJoin {

  /** @param points         point rows (all columns kept)
    * @param intervals      interval rows (all columns kept; names must
    *                       not clash with points')
    * @param keyCols        equi-join key column names (both sides)
    * @param ts             points' timestamp column name
    * @param start          intervals' window start column name
    * @param end            intervals' window end column name (≥ start)
    * @param bucketWidthSec time-bucket width in seconds
    * @return inner join: one row per (point, containing interval)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      ts: String,
      start: String,
      end: String,
      bucketWidthSec: Long): DataFrame = {
    require(keyCols.nonEmpty, "pointInInterval needs at least one key column")
    require(bucketWidthSec > 0, s"bucketWidthSec must be positive, got $bucketWidthSec")
    val widthUs = bucketWidthSec * 1000000L
    // cast: tolerate TIMESTAMP_NTZ inputs (unix_micros requires TZ).
    // The session-TZ-dependent epoch only shifts BUCKET boundaries —
    // the exact predicate below compares the original columns, so
    // results are timezone-independent (width-invariance is pinned
    // by JoinOpsSpec for the same reason)
    def bucketOf(c: Column): Column = floor(unix_micros(c.cast("timestamp")) / widthUs)

    val p = points.withColumn("_rj_bucket", bucketOf(col(ts)))
    val i = intervals.withColumn(
      "_rj_bucket",
      explode(sequence(bucketOf(col(start)), bucketOf(col(end)))))

    val pointCols = points.columns.toSeq
    val intervalCols = intervals.columns.toSeq
    val clash = intervalCols.intersect(pointCols).filterNot(keyCols.contains)
    require(clash.isEmpty, s"column name clash between sides: $clash")

    p.join(i, keyCols :+ "_rj_bucket")
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .select((keyCols ++ pointCols.filterNot(keyCols.contains) ++
        intervalCols.filterNot(keyCols.contains)).map(col): _*)
  }
}
