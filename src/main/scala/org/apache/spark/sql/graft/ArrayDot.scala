package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Sequential (index-order) dot product of two same-length arrays — the
  * inner kernel of every embedding operator (cosine top-k, IVF
  * probe-refine, SRP/near-dup verify, quantized coarse scoring).
  *
  * Versus `aggregate(zip_with(a, b, _*_), 0, _+_)`: higher-order
  * functions never participate in whole-stage codegen and allocate a
  * lambda frame per element; these expressions are a tight primitive
  * loop inside the generated code. The accumulation order and operations
  * are IDENTICAL to the HOF form (acc + a(i)*b(i), left to right,
  * starting from zero), so every score stays bit-for-bit equal to the
  * DuckDB oracles' `list_sum(list_transform(...))` — this is a plan
  * upgrade, not a semantics change.
  *
  * Callers pass same-length arrays with no null elements (embedding
  * vectors); on mismatched lengths the result is NULL — exactly what the
  * HOF form returns (`zip_with` pads the shorter side with nulls and the
  * sum propagates them), so a corrupt/ragged vector surfaces as null
  * instead of a plausible-looking prefix score.
  */
case class DoubleArrayDot(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_array_dot"
  // NULL on ragged inputs (see scaladoc) even when both children are
  // non-nullable
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleArrayDot =
    copy(left = newLeft, right = newRight)
}

/** As [[DoubleArrayDot]] for long arrays (the quantized integer kernels:
  * IVF coarse scoring, centroid assignment). Overflow wraps exactly like
  * Java long multiplication/addition — the same semantics the HOF form
  * and the BIGINT oracles have at these magnitudes.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"
  // NULL on ragged inputs (see scaladoc) even when both children are
  // non-nullable
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Integer squared L2 distance Σ(a(i)-b(i))² of two long arrays — the
  * k-means assignment / PQ encode kernel. Same accumulation order as
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0, _+_)` (exact
  * integer arithmetic, so this is a plan upgrade, not a semantics
  * change — oracles are unaffected).
  */
case class LongArraySqDist(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_sq_dist"
  // NULL on ragged inputs (see scaladoc) even when both children are
  // non-nullable
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArraySqDist =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  def doubleDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DoubleArrayDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def longDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      LongArrayDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def longSqDist(a: Column, b: Column): Column =
    ExpressionUtils.column(
      LongArraySqDist(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
