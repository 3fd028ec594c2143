package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AsofJoin, RangeJoin, TextOps}

/** As-of join, bucketed range join, and repetition metrics — each
  * pinned against a naive reference implementation plus the edge
  * semantics the DuckDB gate twins rely on (inclusive bounds, null
  * payload coherence, bucket-width invariance, ANSI-safe guards).
  */
class JoinOpsSpec extends SparkSpec {

  private def ts(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, timestamp_seconds(col(c))))

  // ------------------------------------------------------ as-of join

  test("asof: inclusive bound, pre-first nulls, latest-right pick") {
    import spark.implicits._
    val left = ts(Seq((1L, 0L, "l0"), (1L, 5L, "l5"), (1L, 10L, "l10"),
      (2L, 3L, "m3")).toDF("k", "t", "ltag"), "t")
    val right = ts(Seq((1L, 1L, "r1"), (1L, 5L, "r5"), (1L, 9L, "r9"),
      (3L, 0L, "x")).toDF("k", "rt", "rtag"), "rt")
    val rows = AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt")
      .select("k", "ltag", "rtag").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> Option(r.getString(2))).toMap
    assert(rows((1L, "l0")).isEmpty, "no right row at or before t=0")
    assert(rows((1L, "l5")).contains("r5"), "equal timestamps match (inclusive)")
    assert(rows((1L, "l10")).contains("r9"), "latest preceding right wins")
    assert(rows((2L, "m3")).isEmpty, "key with no right rows gets nulls")
    assert(rows.size == 4, "every left row survives exactly once")
  }

  test("asof: a right row's own null field is carried, not looked through") {
    import spark.implicits._
    val left = ts(Seq((1L, 10L)).toDF("k", "t"), "t")
    val right = ts(Seq((1L, 1L, Some(7.0)), (1L, 9L, Option.empty[Double]))
      .toDF("k", "rt", "v"), "rt")
    val row = AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt")
      .select("v", "rt").head()
    assert(row.isNullAt(0),
      "matched row (rt=9) has v=null; ignoreNulls must not latch rt=1's 7.0")
    assert(row.getTimestamp(1).getTime == 9000L,
      "the matched row itself is the latest one")
  }

  test("asof: equals the naive per-left argmax and is partition-invariant") {
    import spark.implicits._
    // deterministic interleaved timelines, unique (k, rt) on the right
    val left = ts((1 to 200).map(i => ((i % 7).toLong, (i * 13 % 211).toLong, i))
      .toDF("k", "t", "lid"), "t")
    val right = ts((1 to 150).map(j => ((j % 7).toLong, (j * 29 % 223).toLong, j))
      .distinct.toDF("k", "rt", "rid"), "rt")
      .groupBy("k", "rt").agg(min("rid").as("rid")) // enforce unique (k, rt)
    val naive = left.join(right, left("k") === right("k") && col("rt") <= col("t"), "left")
      .withColumn("rk", row_number().over(
        Window.partitionBy(left("k"), col("lid")).orderBy(col("rt").desc_nulls_last)))
      .filter(col("rk") === 1)
      .select(left("k"), col("lid"), col("rid"))
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (if (r.isNullAt(2)) -1 else r.getInt(2)))
      .toMap
    val expected = key(naive)
    val got = key(AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt")
      .select("k", "lid", "rid"))
    assert(got == expected)
    val got1 = key(AsofJoin.asofJoin(left.repartition(1), right.repartition(8),
      Seq("k"), "t", "rt").select("k", "lid", "rid"))
    assert(got1 == expected, "result must not depend on partitioning")
  }

  test("asof: forward direction picks the nearest following row, inclusive") {
    import spark.implicits._
    val left = ts(Seq((1L, 2L, "l2"), (1L, 7L, "l7"), (1L, 10L, "l10"))
      .toDF("k", "t", "ltag"), "t")
    val right = ts(Seq((1L, 3L, "a"), (1L, 7L, "b"), (1L, 9L, "c"))
      .toDF("k", "rt", "rtag"), "rt")
    val rows = AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt",
      direction = "forward")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // mirrors DuckDB `ASOF LEFT JOIN ... ON l.ts <= r.ts`
    assert(rows("l2").contains("a"))
    assert(rows("l7").contains("b"), "equal timestamps match (inclusive)")
    assert(rows("l10").isEmpty, "no right row at or after t=10")
  }

  test("asof: null timestamps never match, on either side, in both directions") {
    import spark.implicits._
    // right row with null rt must not latch as anyone's match; left
    // rows with null t survive with a null payload (DuckDB ASOF /
    // pandas merge_asof semantics — ADVICE r5)
    val left = ts(Seq((1L, Some(5L), "l5"), (1L, Option.empty[Long], "lnull"))
      .toDF("k", "t", "ltag"), "t")
    val right = ts(Seq((1L, Some(1L), "r1"), (1L, Option.empty[Long], "rnull"))
      .toDF("k", "rt", "rtag"), "rt")
    for (dir <- Seq("backward", "forward")) {
      val rows = AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt",
          direction = dir)
        .select("ltag", "rtag").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      val want = if (dir == "backward") Some("r1") else None
      assert(rows("l5") == want, s"$dir: null-ts right row must not latch")
      assert(rows("lnull").isEmpty, s"$dir: null-ts left row matches nothing")
      assert(rows.size == 2, s"$dir: every left row survives exactly once")
    }
  }

  test("asof: tolerance nulls out a match farther than the window") {
    import spark.implicits._
    val left = ts(Seq((1L, 100L, "near"), (1L, 500L, "far")).toDF("k", "t", "ltag"), "t")
    val right = ts(Seq((1L, 90L, 1.5)).toDF("k", "rt", "v"), "rt")
    val rows = AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt",
      toleranceUs = Some(60L * 1000000L))
      .select("ltag", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows("near").contains(1.5), "10 s gap inside the 60 s window")
    assert(rows("far").isEmpty, "410 s gap outside the window is nulled, not kept")
  }

  // ------------------------------------------------------ range join

  test("range: inclusive bounds on both ends, exactly-once matches") {
    import spark.implicits._
    val pts = ts(Seq((1L, 0L, "p0"), (1L, 5L, "p5"), (1L, 10L, "p10"),
      (1L, 11L, "p11")).toDF("k", "pt", "ptag"), "pt")
    val iv = ts(Seq((1L, 0L, 10L, "w")).toDF("k", "ws", "we", "wtag"), "ws", "we")
    val out = RangeJoin.pointInInterval(pts, iv, Seq("k"), "pt", "ws", "we", 3L)
      .select("ptag").collect().map(_.getString(0)).sorted.toSeq
    assert(out == Seq("p0", "p10", "p5"),
      "start and end are inclusive; outside point excluded; no duplicates " +
        "even though the interval spans 4 buckets at width 3")
  }

  test("range: bucket width never changes results; equals the naive join") {
    import spark.implicits._
    val pts = ts((1 to 300).map(i => ((i % 5).toLong, (i * 17 % 509).toLong, i))
      .toDF("k", "pt", "pid"), "pt")
    val iv = ts((1 to 60).map(j => ((j % 5).toLong, (j * 37 % 450).toLong, j))
      .map { case (k, s, j) => (k, s, s + (j % 40).toLong, j) }
      .toDF("k", "ws", "we", "iid"), "ws", "we")
    val naive = pts.join(iv, Seq("k"))
      .filter(col("pt") >= col("ws") && col("pt") <= col("we"))
      .select("k", "pid", "iid")
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    val expected = key(naive)
    for (w <- Seq(1L, 7L, 64L, 3600L)) {
      val got = key(RangeJoin.pointInInterval(pts, iv, Seq("k"),
        "pt", "ws", "we", w).select("k", "pid", "iid"))
      assert(got == expected, s"bucket width $w diverged")
    }
  }

  // ---------------------------------------------- repetition metrics

  test("repetition: hand-computed metrics, ANSI-safe degenerate docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the the the cat"),   // run of 3, top bigram "the the" 2/3
      (1L, "one"),               // single word: no bigram, guard the n-1 denom
      (2L, "--- ;;; !!!"),       // zero words: all-null aggregates
      (3L, "a b a b a b")        // alternation: max_run 1, bigram 3/5
    ).toDF("doc_id", "text")
    val m = TextOps.repetitionMetrics(docs, col("doc_id"), col("text"))
      .orderBy("id").collect()
    // doc 0: n=4 d=2 top=3 bigram 2/3 run 3
    assert(m(0).getLong(1) == 4L)
    assert(m(0).getDouble(2) == 0.5)
    assert(m(0).getDouble(3) == 0.75)
    assert(m(0).getDouble(4) == math.BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(m(0).getLong(5) == 3L)
    // doc 1: one token — bigram fraction must be 0, not a div-by-zero
    assert(m(1).getLong(1) == 1L && m(1).getDouble(4) == 0.0 && m(1).getLong(5) == 1L)
    // doc 2: no words at all
    assert(m(2).getLong(1) == 0L && m(2).getDouble(2) == 0.0 &&
      m(2).getDouble(3) == 0.0 && m(2).getDouble(4) == 0.0 && m(2).getLong(5) == 0L)
    // doc 3: 6 tokens, 2 distinct, top 3/6, bigram "a b" 3/5, run 1
    assert(m(3).getLong(1) == 6L)
    assert(m(3).getDouble(2) == math.BigDecimal(2.0 / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(m(3).getDouble(3) == 0.5)
    assert(m(3).getDouble(4) == 0.6)
    assert(m(3).getLong(5) == 1L)
  }

  test("repetition: partition-invariant over the documents-style corpus") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, (0 to (i % 9).toInt).map(j => s"w${(i + j) % 5}").mkString(" ")))
      .toDF("doc_id", "text")
    def key(parts: Int) =
      TextOps.repetitionMetrics(docs.repartition(parts), col("doc_id"), col("text"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
        .toMap
    assert(key(1) == key(8))
  }
}
