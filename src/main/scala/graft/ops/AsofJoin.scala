package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-event) join: for every left row, attach the single
  * right row with the same key and the greatest right timestamp ≤ the
  * left timestamp (backward, default) or the smallest ≥ it (forward)
  * — inclusive, nulls when no right row qualifies, optional tolerance
  * window — the time-series primitive Spark lacks natively (DuckDB:
  * `ASOF LEFT JOIN`, Pandas: `merge_asof`).
  *
  * Plan, chosen for the 100 TB shape: the naive formulation is a
  * range join (`l.key = r.key AND r.ts <= l.ts` + a per-left argmax),
  * which Spark executes as a broadcast-nested-loop or a key-equi join
  * that EXPLODES to |left-per-key| × |right-per-key| pairs before the
  * argmax prunes them. This implementation is the classic union-scan
  * instead: tag both sides, sort each key's timeline once, and let a
  * running `last(..., ignoreNulls)` window carry the latest right
  * payload forward onto every left row. Exactly ONE shuffle (on the
  * key) and one sort — the same cost as a plain equi-join — with O(1)
  * window state per row and zero pair explosion, so per-key cost is
  * O((|L|+|R|) log) regardless of how the two sides interleave.
  *
  * The right payload rides in a single struct column: `last` with
  * ignoreNulls looks THROUGH nulls, so carrying columns individually
  * would tear a right row whose own field is legitimately null
  * (each column would latch its most recent NON-NULL value,
  * potentially from different right rows). The struct is non-null per
  * right row even when every field inside is null, so the carried
  * payload is always one coherent right row.
  *
  * Tie semantics: a right row AT the left timestamp matches
  * (inclusive, = DuckDB's `ON l.ts >= r.ts`); the right side sorts
  * before the left at equal timestamps to realize this. Precondition:
  * (key, rightTs) must be unique within `right` — with duplicates the
  * "latest" right row is ill-defined in every engine (DuckDB picks
  * arbitrarily); this implementation would pick the last in the
  * union's sort order, which is not guaranteed stable across runs.
  */
object AsofJoin {

  /** @param left    rows to enrich (all columns kept)
    * @param right   timeline to look up (all non-key columns attached;
    *                names must not clash with left's)
    * @param keyCols equi-join key column names (present on both sides)
    * @param leftTs  left timestamp column name
    * @param rightTs right timestamp column name (unique per key)
    * @param direction "backward" (default: latest right at-or-before
    *                leftTs — DuckDB `ON l.ts >= r.ts`, pandas
    *                merge_asof default) or "forward" (earliest right
    *                at-or-after — `ON l.ts <= r.ts`); both inclusive.
    *                Forward is the same union scan over the reversed
    *                timeline: order by (ts DESC, side), so the running
    *                `last` carries the nearest FOLLOWING right row.
    * @param toleranceUs optional match window in microseconds: a
    *                matched right row farther than this from leftTs is
    *                nulled out (pandas merge_asof `tolerance`) — a
    *                projection-time guard, not a plan change.
    * @return left columns + right's non-key columns from the matched
    *         row (null when no right row qualifies)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    toleranceUs.foreach(t => require(t >= 0, s"negative tolerance $t"))
    val rightPayload = right.columns.filterNot(keyCols.contains).toSeq
    val leftPayload =
      left.columns.filterNot(c => keyCols.contains(c) || c == leftTs).toSeq
    val clash = rightPayload.intersect(left.columns.toSeq)
    require(clash.isEmpty, s"column name clash between sides: $clash")

    // null-timestamp rows never match: DuckDB ASOF and pandas
    // merge_asof both exclude them, and under the union-scan ordering
    // a null rightTs would sort nulls-first and latch as a bogus
    // 'nearest' match (ADVICE r5). Left rows with null ts keep their
    // no-match (null payload) row via the left-side filter below —
    // dropping them entirely would change the output row set, so they
    // stay, and sorting them to one end is harmless once no null
    // right row can latch. Right rows with null ts are dropped.
    val right0 = right.filter(col(rightTs).isNotNull)
    // one tagged relation: (keys, sort ts, side, left cols, packed
    // right payload). side 0 (right) < 1 (left) makes equal-ts right
    // rows visible to the left row — the inclusive bound.
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("_asof_ts"), lit(1).as("_asof_side")) ++
        leftPayload.map(col) :+
        lit(null).cast(structType(right, rightPayload)).as("_asof_r"): _*)
    val taggedRight = right0.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("_asof_ts"), lit(0).as("_asof_side")) ++
        leftPayload.map(c => lit(null).cast(leftSchema(left, c)).as(c)) :+
        struct(rightPayload.map(col): _*).as("_asof_r"): _*)

    val tsOrder =
      if (direction == "backward") col("_asof_ts").asc else col("_asof_ts").desc
    val timeline = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedLeft.unionByName(taggedRight)
      .withColumn("_asof_hit", last(col("_asof_r"), ignoreNulls = true).over(timeline))
      .filter(col("_asof_side") === 1)
      // a null leftTs can never match (it has no position on the
      // timeline — in forward mode it would otherwise latch whatever
      // right row the nulls-last ordering parks it behind)
      .withColumn("_asof_hit",
        when(col("_asof_ts").isNotNull, col("_asof_hit")))
    val gated = toleranceUs match {
      case None => matched
      case Some(tol) =>
        // cast: tolerate TIMESTAMP_NTZ (unix_micros requires TZ); the
        // DIFFERENCE of two same-zone epochs is zone-independent
        matched.withColumn("_asof_hit",
          when(abs(unix_micros(col("_asof_ts").cast("timestamp")) -
            unix_micros(col(s"_asof_hit.$rightTs").cast("timestamp"))) <= tol,
            col("_asof_hit")))
    }
    gated.select(
      keyCols.map(col) ++
        Seq(col("_asof_ts").as(leftTs)) ++
        leftPayload.map(col) ++
        rightPayload.map(c => col(s"_asof_hit.$c").as(c)): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))

  private def leftSchema(df: DataFrame, c: String) = df.schema(c).dataType
}
