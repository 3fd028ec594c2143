package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-event) join: for every left row, attach the
  * single right row with the same key and the greatest right
  * timestamp ≤ the left timestamp (inclusive), or nulls when no right
  * row precedes it — the time-series primitive Spark lacks natively
  * (DuckDB: `ASOF LEFT JOIN`, Pandas: `merge_asof`).
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
    * @return left columns + right's non-key columns from the matched
    *         row (null when no right row at-or-before leftTs)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    val rightPayload = right.columns.filterNot(keyCols.contains).toSeq
    val leftPayload =
      left.columns.filterNot(c => keyCols.contains(c) || c == leftTs).toSeq
    val clash = rightPayload.intersect(left.columns.toSeq)
    require(clash.isEmpty, s"column name clash between sides: $clash")

    // one tagged relation: (keys, sort ts, side, left cols, packed
    // right payload). side 0 (right) < 1 (left) makes equal-ts right
    // rows visible to the left row — the inclusive bound.
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("_asof_ts"), lit(1).as("_asof_side")) ++
        leftPayload.map(col) :+
        lit(null).cast(structType(right, rightPayload)).as("_asof_r"): _*)
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("_asof_ts"), lit(0).as("_asof_side")) ++
        leftPayload.map(c => lit(null).cast(leftSchema(left, c)).as(c)) :+
        struct(rightPayload.map(col): _*).as("_asof_r"): _*)

    val timeline = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("_asof_hit", last(col("_asof_r"), ignoreNulls = true).over(timeline))
      .filter(col("_asof_side") === 1)
      .select(
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
