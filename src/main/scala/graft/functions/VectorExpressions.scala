package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for the vector kernels (SURVEY §2
  * similarity family). Both stay inside whole-stage codegen: doGenCode
  * emits a single static call into [[VectorMath]] per row, vs one
  * interpreted lambda dispatch per array element for the equivalent
  * `aggregate`/`zip_with` formulation (measured ~1000× on the
  * 4-table×6-plane×64-dim LSH projection).
  */

/** cos(a, b) over two array<float> columns. Null if either side is.
  * Inputs are PINNED to array<float>: the kernel reads 4-byte floats
  * positionally, so an array<double> slipping through analysis
  * unchanged would read garbage half-words under codegen. With
  * ImplicitCastInputTypes the analyzer inserts an explicit
  * array<double> → array<float> cast instead (values stay correct at
  * float precision), and non-castable inputs fail analysis.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // null even for non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true

  // null-element or length-mismatched inputs yield NULL, matching the
  // former aggregate/zip_with formulation (zip_with pads the shorter
  // side with nulls → null sum) and DuckDB's list arithmetic — the
  // kernels themselves would read null slots as 0.0f
  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val bb = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (aa.numElements() != bb.numElements() ||
      VectorMath.hasNullElement(aa) || VectorMath.hasNullElement(bb)) null
    else VectorMath.cosine(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements() ||
         |    graft.functions.VectorMath.hasNullElement($a) ||
         |    graft.functions.VectorMath.hasNullElement($b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VectorMath.cosine($a, $b);
         |}
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** array<long> of per-table LSH buckets for an array<float> vector
  * (see [[VectorMath.lshBuckets]] for the plane contract).
  */
case class LshBuckets(child: Expression, dim: Int, tables: Int, planes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  // a vector with null elements or fewer than `dim` components cannot
  // be bucketed faithfully (the kernel would read null/missing slots
  // as 0.0f and emit real-looking partial-projection buckets) → NULL
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val vv = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (vv.numElements() < dim || VectorMath.hasNullElement(vv)) null
    else VectorMath.lshBuckets(vv, dim, tables, planes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v.numElements() < $dim ||
         |    graft.functions.VectorMath.hasNullElement($v)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VectorMath.lshBuckets($v, $dim, $tables, $planes);
         |}
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object VectorExpressions {
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def lshBuckets(vec: Column, dim: Int, tables: Int, planes: Int): Column =
    GraftColumnBridge.column(LshBuckets(
      GraftColumnBridge.expression(vec), dim, tables, planes))
}
