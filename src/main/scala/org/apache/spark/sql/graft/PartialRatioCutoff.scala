/** Hosted under org.apache.spark.sql.* deliberately: Catalyst's
  * AbstractDataType and the classic Column<->Expression bridge
  * (ExpressionUtils) are private[sql], and a subpackage is the standard
  * extension-library pattern for native expressions (no Spark internals
  * are modified — this file only USES them).
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Fuzz

/** The reference's verify scorer (/root/reference/src/heurFuzz.py:106-112)
  * as a native Catalyst expression: lowercase both sides, partial_ratio,
  * score cutoff in double domain, uint8-style rounding.
  *
  * Versus the UDF form: no ScalaUDF encoder/closure wrapper, participates
  * in whole-stage codegen (the generated code calls the static scorer
  * directly on the operands), and null handling is the standard
  * null-intolerant fast path. The scorer itself is the same audited
  * `Fuzz.partialRatioCutoff` — one implementation, two surfaces.
  */
case class PartialRatioCutoff(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "partial_ratio_cutoff"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Fuzz.partialRatioCutoff(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString,
      c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.Fuzz.partialRatioCutoff($a.toString(), $b.toString(), $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PartialRatioCutoff =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Boolean predicate form of the cutoff scorer: semantically
  * `partial_ratio_cutoff(a, b, c) > 0`, but the underlying scan
  * early-exits the moment any alignment window clears the cutoff
  * (Fuzz.partialRatioAtLeast) instead of computing the exact maximum a
  * filter would immediately discard. Installed by the optimizer rule
  * below — user code writes the natural comparison and gets this.
  */
case class PartialRatioAtLeast(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "partial_ratio_at_least"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Fuzz.partialRatioAtLeast(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString,
      c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.Fuzz.partialRatioAtLeast($a.toString(), $b.toString(), $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PartialRatioAtLeast =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Optimizer rule: a threshold comparison on the cutoff scorer is a pure
  * predicate — the exact score is discarded — so rewrite it to the
  * early-exit boolean expression. Sound because the scorer's output is
  * either 0 or a rounded score >= cutoff (nothing in between):
  * `prc(a,b,c) > k` for any 0 <= k < c, and `prc(a,b,c) >= k` for any
  * 1 <= k <= c, are both exactly "some window clears c". Comparisons
  * that keep the score (projections, argmax orderings) never match the
  * pattern and are untouched.
  */
object FoldPartialRatioCutoffPredicate extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThan(PartialRatioCutoff(a, b, c @ Literal(cv: Int, IntegerType)),
          Literal(k: Int, IntegerType)) if cv >= 1 && k >= 0 && k < cv =>
      PartialRatioAtLeast(a, b, c)
    case GreaterThanOrEqual(PartialRatioCutoff(a, b, c @ Literal(cv: Int, IntegerType)),
          Literal(k: Int, IntegerType)) if k >= 1 && k <= cv =>
      PartialRatioAtLeast(a, b, c)
    case LessThan(Literal(k: Int, IntegerType),
          PartialRatioCutoff(a, b, c @ Literal(cv: Int, IntegerType)))
        if cv >= 1 && k >= 0 && k < cv =>
      PartialRatioAtLeast(a, b, c)
    case LessThanOrEqual(Literal(k: Int, IntegerType),
          PartialRatioCutoff(a, b, c @ Literal(cv: Int, IntegerType)))
        if k >= 1 && k <= cv =>
      PartialRatioAtLeast(a, b, c)
  }
}

/** Karp-Rabin rolling k-gram hashes as a codegen'd unary expression:
  * array<long> of the polynomial hash of every k-length char window,
  * computed in O(n) (O(1) per position — see graft.functions.RollingHash
  * for the recurrence and modulus choice). The SQL-expressible naive
  * recompute (fold per window) is O(n*k); this is the fingerprinting
  * primitive a 100 TB corpus pass wants codegen'd and linear.
  */
case class RollingKgramHashes(child: Expression, k: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(k >= 1, s"k-gram width must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_kgram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    RollingKgramHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.RollingKgramHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): RollingKgramHashes =
    copy(child = newChild)
}

object RollingKgramHashes {
  /** Static bridge shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(graft.functions.RollingHash.hashes(s.toString, k))
}

/** Distinct winnowing fingerprints of the rolling k-gram hashes (the
  * MOSS document-fingerprint set; graft.functions.RollingHash.winnow):
  * one O(n) pass with a monotonic deque. The declarative alternative —
  * `transform(sequence(...), i -> array_min(slice(hs, i, w)))` — is
  * O(n·w) of interpreted HOF lambdas plus a w-element array allocation
  * PER POSITION, measured 142 s vs ~2 s at sf0.1. Same winnowing
  * guarantee documented on the Scala function; values reproduced by the
  * oracle's naive per-window list_min recompute.
  */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(k >= 1 && w >= 1, s"k-gram width and window must be >= 1, got k=$k w=$w")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowing_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowingFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WinnowingFingerprints.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprints =
    copy(child = newChild)
}

object WinnowingFingerprints {
  /** Static bridge shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(graft.functions.RollingHash.winnow(s.toString, k, w))
}

/** Winnowing fingerprints packed with their first-occurrence position,
  * `(fp << 32) | pos` (graft.functions.RollingHash.winnowWithPos) — the
  * MOSS match-EVIDENCE variant: the position lets the near-dup join
  * report the overlapping region extent in each document, not just a
  * shared count. Same O(n) single pass as [[WinnowingFingerprints]].
  */
case class WinnowingFingerprintPos(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(k >= 1 && w >= 1, s"k-gram width and window must be >= 1, got k=$k w=$w")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowing_fingerprint_pos"

  override protected def nullSafeEval(input: Any): Any =
    WinnowingFingerprintPos.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WinnowingFingerprintPos.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprintPos =
    copy(child = newChild)
}

object WinnowingFingerprintPos {
  /** Static bridge shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(graft.functions.RollingHash.winnowWithPos(s.toString, k, w))
}

/** Column-level entry points for the custom expressions (usable without
  * any session registration).
  */
object GraftFunctions {
  def partialRatioCutoff(a: Column, b: Column, cutoff: Int): Column =
    ExpressionUtils.column(
      PartialRatioCutoff(
        ExpressionUtils.expression(a),
        ExpressionUtils.expression(b),
        Literal(cutoff)))

  def rollingKgramHashes(text: Column, k: Int): Column =
    ExpressionUtils.column(RollingKgramHashes(ExpressionUtils.expression(text), k))

  def winnowingFingerprints(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowingFingerprints(ExpressionUtils.expression(text), k, w))

  def winnowingFingerprintPos(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowingFingerprintPos(ExpressionUtils.expression(text), k, w))
}

/** SparkSessionExtensions wiring: exposes `partial_ratio_cutoff(a, b, c)`
  * to SQL. Install via `.withExtensions(new GraftExtensions)` (GraftSession
  * does) or `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.registration)
    ext.injectFunction(GraftExtensions.rollingRegistration)
    ext.injectFunction(GraftExtensions.winnowRegistration)
    ext.injectOptimizerRule(_ => FoldPartialRatioCutoffPredicate)
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
  }
}

object GraftExtensions {
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("partial_ratio_cutoff"),
    new ExpressionInfo(classOf[PartialRatioCutoff].getName, "partial_ratio_cutoff"),
    (children: Seq[Expression]) => {
      if (children.length != 3)
        throw new IllegalArgumentException(
          s"partial_ratio_cutoff requires 3 arguments (a, b, cutoff); got ${children.length}")
      PartialRatioCutoff(children(0), children(1), children(2))
    })

  /** `rolling_kgram_hashes(text, k)` for SQL callers — k must be an
    * integer literal (it parameterizes the generated code).
    */
  val rollingRegistration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_kgram_hashes"),
    new ExpressionInfo(classOf[RollingKgramHashes].getName, "rolling_kgram_hashes"),
    (children: Seq[Expression]) => {
      if (children.length != 2)
        throw new IllegalArgumentException(
          s"rolling_kgram_hashes requires 2 arguments (text, k); got ${children.length}")
      val k = children(1) match {
        case Literal(i: Int, org.apache.spark.sql.types.IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"rolling_kgram_hashes k must be an integer literal; got $other")
      }
      RollingKgramHashes(children(0), k)
    })

  val winnowRegistration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnowing_fingerprints"),
    new ExpressionInfo(classOf[WinnowingFingerprints].getName, "winnowing_fingerprints"),
    (children: Seq[Expression]) => {
      if (children.length != 3)
        throw new IllegalArgumentException(
          s"winnowing_fingerprints requires 3 arguments (text, k, w); got ${children.length}")
      def intLit(e: Expression, name: String): Int = e match {
        case Literal(i: Int, org.apache.spark.sql.types.IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"winnowing_fingerprints $name must be an integer literal; got $other")
      }
      WinnowingFingerprints(children(0), intLit(children(1), "k"), intLit(children(2), "w"))
    })

  /** Imperative per-session registration for sessions that were built
    * WITHOUT `.withExtensions` (e.g. a host application's session):
    * idempotently installs the same functions the extension injects.
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    for ((id, info, builder) <- Seq(registration, rollingRegistration, winnowRegistration))
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    // the predicate-folding rule, for sessions built without
    // .withExtensions (experimental.extraOptimizations is the public
    // per-session hook for exactly this)
    if (!spark.experimental.extraOptimizations.contains(FoldPartialRatioCutoffPredicate))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FoldPartialRatioCutoffPredicate
    // the as-of planner strategy, same public per-session hook
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
  }
}
