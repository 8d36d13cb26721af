package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.Shims

/** Custom Catalyst expression: double-precision dot product of two
  * float/double array columns.
  *
  * Why a native Expression and not `zip_with`+`aggregate`: Spark's
  * higher-order functions are interpreted (no whole-stage codegen) and box
  * every element through a lambda variable; for a 64-dim dot product inside
  * a pairwise join that's the difference between a tight 64-iteration
  * primitive loop and ~200 allocations per row. `doGenCode` below emits the
  * loop directly into the generated stage, so vector math rides inside
  * WholeStageCodegen like any arithmetic — the preference order of
  * SURVEY.md §4.3(b): custom codegen'd Expression before mapPartitions.
  *
  * Null/length semantics: null if either side is null; mismatched lengths
  * dot only the common prefix (callers control schemas).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $x.$lGet($i)) * ((double) $y.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Custom Catalyst expression: double-precision squared L2 distance of
  * two float/double array columns — Σ(xᵢ−yᵢ)², the codegen'd fast phase
  * of nearest-centroid assignment (see [[DotProduct]]'s rationale for
  * why a native Expression beats `zip_with`+`aggregate`; the
  * difference-then-square form avoids the catastrophic cancellation of
  * the |x|²−2x·y+|y|² expansion, so the result's RELATIVE error stays
  * ~n·2⁻⁵² and an epsilon-margin argmin over it is sound).
  *
  * Null/length semantics deliberately MATCH the interpreted
  * `aggregate(zip_with(...))` decimal form this is the fast phase of
  * (NOT [[DotProduct]]'s common-prefix rule): null if either side is
  * null, if the lengths differ (zip_with pads with null), or if ANY
  * element is null — so a degenerate vector falls through a two-phase
  * argmin's null comparison to the exact branch instead of being
  * scored from garbage slot reads.
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sq_dist requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ((double) $x.$lGet($i)) - ((double) $y.$rGet($i));
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Column API for [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    Shims.column(DotProduct(Shims.expression(a), Shims.expression(b)))

  /** Column API for [[SqDist]]. */
  def sqDist(a: Column, b: Column): Column =
    Shims.column(SqDist(Shims.expression(a), Shims.expression(b)))

  /** L2 norm via the same codegen'd loop. */
  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))

  /** Fast cosine similarity (plain double arithmetic, codegen'd). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
