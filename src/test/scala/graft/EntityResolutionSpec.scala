package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.EntityResolution

/** Stage-5 (author + year) semantics of the full cascade, planted
  * case by planted case — these mirror the reference's
  * `app.py:751-782` author-containment block and its
  * `if not found and len(rows) == 1` fallback, plus the two
  * documented divergences (token-boundary containment; full-token-set
  * overlap). The driver-gate query exercises the same paths against
  * DuckDB at corpus scale; this spec pins each rule in isolation.
  */
class EntityResolutionSpec extends SparkSpec {

  private def q(rows: Seq[(Long, String, String, Seq[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("qid", "author_key", "year", "tk")
      .select(col("qid"), lit("").as("exact_key"), lit("").as("doi_key"),
        lit("").as("norm_key"), col("author_key"), col("year"), col("tk"))
  }
  private def c(rows: Seq[(Long, String, String, Seq[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("cid", "author_key", "year", "tk")
      .select(col("cid"), lit("").as("exact_key"), lit("").as("doi_key"),
        lit("").as("norm_key"), col("author_key"), col("year"), col("tk"))
  }
  private def resolve(qs: DataFrame, cs: DataFrame): Map[Long, (Long, Double)] =
    EntityResolution.resolveCascadeFull(qs, cs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap

  private val title = Seq("alpha", "beta", "gamma", "delta")

  test("containment: bare last name matches its fuller catalog form; equality need not hold") {
    val res = resolve(
      q(Seq((1L, "berg", "2020", title))),
      c(Seq((10L, "van der berg j", "2020", title))))
    assert(res(1L)._1 == 10L)
  }

  test("containment is token-order insensitive (documented widening vs LIKE)") {
    val res = resolve(
      q(Seq((1L, "j berg", "2020", title))),
      c(Seq((10L, "berg j", "2020", title))))
    assert(res(1L)._1 == 10L)
  }

  test("containment is token-boundary (documented tightening vs LIKE): berg != bergman") {
    // titles share nothing, so the fuzzy stage stays silent and the
    // only possible path is author+year — which must NOT fire
    val res = resolve(
      q(Seq((1L, "berg", "2020", Seq("qq1", "qq2", "qq3")))),
      c(Seq((10L, "bergman j", "2020", title))))
    assert(!res.contains(1L))
  }

  test("a missing citation token blocks the match (subset, not overlap)") {
    val res = resolve(
      q(Seq((1L, "van der berg", "2020", Seq("qq1", "qq2", "qq3")))),
      c(Seq((10L, "berg j", "2020", title))))
    assert(!res.contains(1L))
  }

  test("unique-candidate fallback fires when a title exists but fails the overlap") {
    // reference app.py: `if not found and len(rows) == 1` — no
    // qsz==0 precondition
    val res = resolve(
      q(Seq((1L, "berg j", "2020", Seq("zz1", "zz2", "zz3", "zz4")))),
      c(Seq((10L, "berg j", "2020", title))))
    assert(res(1L) == (10L, 0.0))
  }

  test("failing title with MULTIPLE candidates matches nothing") {
    val res = resolve(
      q(Seq((1L, "berg j", "2020", Seq("zz1", "zz2", "zz3", "zz4")))),
      c(Seq((10L, "berg j", "2020", title), (11L, "berg j", "2020", Seq("eps")))))
    assert(!res.contains(1L))
  }

  test("overlap >= 0.3 picks the passing candidate; year must match; fuzzy stage stays silent") {
    // |q.tk| = 10; shares 2 tokens with c10 (stage-4 inter < 3, stage-5
    // ov = 0.2 < 0.3) and 3 with c11 (stage-4 overlap 0.3 < 0.4 so the
    // fuzzy stage is silent, stage-5 ov = 0.3 passes); c12 has the
    // right author but the wrong year
    val qtk = (1 to 10).map(i => s"t$i")
    val res = resolve(
      q(Seq((1L, "berg j", "2020", qtk))),
      c(Seq(
        (10L, "berg j", "2020", Seq("t1", "t2", "x1", "x2")),
        (11L, "berg j", "2020", Seq("t1", "t2", "t3", "x3")),
        (12L, "berg j", "1999", Seq("t1", "t2", "y1", "y2")))))
    assert(res(1L) == (11L, 0.3))
  }
}
