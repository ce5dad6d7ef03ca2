package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `vector_l2sq(a, b)` — exact-integer squared L2 distance
  * Σ (a[i] − b[i])² over two ARRAY<BIGINT>s, as a native codegen'd
  * `Expression` (the [[VectorDot]] pattern applied to the quantizer's
  * other hot kernel).
  *
  * Why it exists: the composed form
  * `aggregate(zip_with(a, b, (x, c) => (x−c)·(x−c)), 0L, +)` is a
  * HIGHER-ORDER expression — Catalyst interprets the lambda per
  * element with boxed NamedLambdaVariables and a materialized
  * intermediate array, and the IVF data-fit quantizer evaluates it
  * (corpus rows × nlist centroids) times per Lloyd step. This compiles
  * to a bare subtract-multiply-accumulate loop inside whole-stage
  * codegen.
  *
  * Semantics are IDENTICAL to the composed form: 64-bit integer
  * arithmetic (wrap-on-overflow exactly like the lambda's long math),
  * and integer addition is associative so the fold order cannot
  * matter. Null array → null; length mismatch → null (the composed
  * form reaches null through a padded element, same outcome). Array
  * elements are non-null by the quantized-embedding construction. */
case class VectorL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ok(left) || !ok(right))
      TypeCheckResult.TypeCheckFailure(
        s"vector_l2sq needs ARRAY<BIGINT> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) return null
    var acc = 0L
    var i = 0
    val n = aa.numElements()
    while (i < n) {
      val d = aa.getLong(i) - bb.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val dv = ctx.freshName("d")
    ev.copy(code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = ${leftGen.isNull} || ${rightGen.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          int $n = ${leftGen.value}.numElements();
          if ($n != ${rightGen.value}.numElements()) {
            ${ev.isNull} = true;
          } else {
            for (int $i = 0; $i < $n; $i++) {
              long $dv = ${leftGen.value}.getLong($i)
                - ${rightGen.value}.getLong($i);
              ${ev.value} += $dv * $dv;
            }
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorL2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_l2sq"
}

object VectorL2Sq {
  /** Register `vector_l2sq` for SQL and `call_function` use (the
    * [[VectorDot]] registration pattern). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_l2sq",
      exprs => VectorL2Sq(exprs(0), exprs(1)),
      "built-in")
}
