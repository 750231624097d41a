package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels callable from generated Java (Scala objects emit static
  * forwarders, so `Md5LongUtil.compute(...)` resolves in codegen'd code).
  */
object Md5LongUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Value of the first 15 hex digits of md5(s) — i.e. the top 60 bits of
    * the digest — as a non-negative long. Identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)` / DuckDB
    * `CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)`.
    */
  def compute(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (digest(i) & 0xffL); i += 1 }
    acc >>> 4 // first 15 hex chars = top 60 of the first 64 bits
  }
}

/** `md5_long(s)`: BIGINT of the first 15 hex digits of md5(s).
  *
  * Why a custom expression (SURVEY.md §4.3(b)): the portable idiom
  * `CAST(conv(substring(md5(s),1,15),16,10) AS BIGINT)` materializes a
  * 32-char hex string per value, substrings it, and re-parses it through
  * base-conversion string math — on the exploded shingle stream of the
  * MinHash pipeline that is the per-row hot loop. This computes the same
  * value digest-direct: one MD5, eight byte shifts, no strings.
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def prettyName: String = "md5_long"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5LongUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5LongUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(newChild)
}

/** `count_in(arr, 'a', 'b', ...)`: number of elements of a string array
  * equal to any of the given literal strings (null elements never match —
  * same as the `size(filter(arr, x -> x = 'a' OR ...))` idiom, where a
  * null comparison yields null and the filter drops the element).
  *
  * Why: the filter-HOF idiom runs an interpreted closure per element and
  * allocates the filtered array; stop-word scoring over a 100 TB corpus
  * runs this per document. This is a codegen'd counting loop over the
  * membership set with no allocation.
  */
case class CountIn(child: Expression, values: Seq[String]) extends UnaryExpression {

  override def prettyName: String = "count_in"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> first argument, got ${t.simpleString}")
  }

  @transient private lazy val set: Array[UTF8String] =
    values.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getUTF8String(i)
        var j = 0
        while (j < set.length) {
          if (set(j).equals(v)) { cnt += 1; j = set.length }
          else j += 1
        }
      }
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val setRef = ctx.addReferenceObj("countInSet", set, "org.apache.spark.unsafe.types.UTF8String[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val cnt = ctx.freshName("cnt")
      s"""
        int $n = $a.numElements();
        int $cnt = 0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            org.apache.spark.unsafe.types.UTF8String $v = $a.getUTF8String($i);
            for (int $j = 0; $j < $setRef.length; $j++) {
              if ($setRef[$j].equals($v)) { $cnt++; break; }
            }
          }
        }
        ${ev.value} = $cnt;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CountIn =
    copy(child = newChild)
}

/** SQL-name → builder registry for the engine's native expressions, shared
  * by [[graft.GraftExtensions]] (session extension path) and
  * `Tables.ensureFunctions` (host-provided-session path).
  */
object Natives {
  private def str(e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"count_in membership values must be string literals, got $other")
  }

  /** (name, implementing class, builder) — the class feeds ExpressionInfo
    * so DESCRIBE FUNCTION attributes each function to its own Expression.
    */
  val all: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("dot_f", classOf[DotF], exprs => DotF(exprs(0), exprs(1))),
    ("dot_l", classOf[DotL], exprs => DotL(exprs(0), exprs(1))),
    ("md5_long", classOf[Md5Long], exprs => Md5Long(exprs(0))),
    ("count_in", classOf[CountIn], exprs => CountIn(exprs.head, exprs.tail.map(str))))
}
