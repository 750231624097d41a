package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays (float or double), with
  * whole-stage codegen.
  *
  * Why a custom Catalyst expression (SURVEY.md §4.3(b) preference order):
  * the composed form `aggregate(zip_with(a, b, ...), 0d, ...)` is a
  * HigherOrderFunction — interpreted closure per element, an allocated
  * intermediate array per row, and a codegen fence around the whole
  * stage. For ANN workloads (rows × dims element ops) that is the hot
  * path. This expression emits a tight primitive loop inside whole-stage
  * codegen: no allocation, no virtual calls.
  *
  * Semantics are IDENTICAL to the composed form: elements promoted to
  * double, products accumulated left-to-right in one double accumulator —
  * so results stay bit-equal to the DuckDB `list_reduce` oracle.
  *
  * Null handling mirrors the composed form exactly: null array -> null;
  * any null ELEMENT poisons the whole sum to null (like acc + null); and
  * arrays of UNEQUAL length -> null, because zip_with pads the shorter
  * side with nulls and those pad-nulls poison the fold. Matching all three
  * is what lets [[graft.optimizer.FoldDotProduct]] substitute this
  * expression for the interpreted pattern unconditionally.
  */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "dot_f"
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lt = elemType(left).get
    val rt = elemType(right).get
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, side: Expression): String = elemType(side).get match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
        int $n = $a.numElements();
        double $acc = 0.0;
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        }
        for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) {
            ${ev.isNull} = true;
          } else {
            $acc += ${get(a, left)} * ${get(b, right)};
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF = copy(newLeft, newRight)
}

/** Native EXACT dot product over two integer arrays (int or long), with
  * whole-stage codegen and a long accumulator.
  *
  * This is the kernel of the scalar-quantized ANN path
  * ([[graft.queries.Sim]] `q_sim_quant_topk`): int8 codes are stored as
  * Spark integral arrays, their dot product is exact 64-bit integer
  * arithmetic (codes are bounded by ±127, so |acc| ≤ dims·127² — no
  * overflow until dims ~10¹⁴), and the resulting similarity is
  * bit-identical across engines because no float rounding participates
  * until one final sqrt/division per pair.
  *
  * Same null contract as [[DotF]] (and the composed
  * `aggregate(zip_with(...))` form): null array → null, null element →
  * null, unequal lengths → null.
  */
case class DotL(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "dot_l"
  override def dataType: DataType = LongType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int|bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lt = elemType(left).get
    val rt = elemType(right).get
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lt == IntegerType) x.getInt(i).toLong else x.getLong(i)
      val yv = if (rt == IntegerType) y.getInt(i).toLong else y.getLong(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, side: Expression): String = elemType(side).get match {
        case IntegerType => s"(long) $arr.getInt($i)"
        case _ => s"$arr.getLong($i)"
      }
      s"""
        int $n = $a.numElements();
        long $acc = 0L;
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        }
        for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) {
            ${ev.isNull} = true;
          } else {
            $acc += ${get(a, left)} * ${get(b, right)};
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotL = copy(newLeft, newRight)
}
