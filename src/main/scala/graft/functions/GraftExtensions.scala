package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for the native vector kernels, so
  * `spark.sql("SELECT cosine_sim(a, b)")` and
  * `lsh_buckets(vec, dim, tables, planes)` work next to the Column
  * API (the standard `SparkSessionExtensions` injection point —
  * enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(fn: String, e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(a, b) takes two array<float> args")
        CosineSim(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "lsh_buckets(vec, dim, tables, planes) takes four args")
        LshBuckets(args(0), intLit("lsh_buckets", args(1), "dim"),
          intLit("lsh_buckets", args(2), "tables"),
          intLit("lsh_buckets", args(3), "planes"))
      }))
    // aggregate functions resolve unwrapped: the analyzer's function
    // resolution wraps a bare AggregateFunction in AggregateExpression
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_sketch(hash, k) takes two args")
        KmvSketch(args(0), intLit("kmv_sketch", args(1), "k"))
      }))
  }
}
