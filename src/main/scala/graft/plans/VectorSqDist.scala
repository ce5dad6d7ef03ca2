package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `vector_sqdist(a, b)` — squared L2 distance ‖a − b‖² as a native
  * codegen'd `Expression`, [[VectorDot]]'s sibling for the PQ family
  * (sub-vector → codebook-entry distances run PqM × PqK times per row
  * in encoding and in every ADC LUT build).
  *
  * Semantics are BIT-IDENTICAL to the composed
  * `aggregate(zip_with(a, b, (x, c) => (x−c)·(x−c)), 0.0, +)` left
  * fold it replaces: `acc + d·d` with `d = (double) a[i] − (double)
  * b[i]` in index order, so the pinned explicit SQL sums in the PQ
  * oracles keep matching exactly. Sides may be ARRAY<FLOAT> or
  * ARRAY<DOUBLE> independently; null array or length mismatch → null;
  * elements non-null by the embeddings contract.
  */
case class VectorSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isEmpty || elemType(right).isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"vector_sqdist needs ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  @inline private def get(a: ArrayData, t: DataType, i: Int): Double =
    t match {
      case FloatType => a.getFloat(i).toDouble
      case _         => a.getDouble(i)
    }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) return null
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    var acc = 0.0
    var i = 0
    val n = aa.numElements()
    while (i < n) {
      val dxy = get(aa, ta, i) - get(bb, tb, i)
      acc += dxy * dxy
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    def getter(v: String, t: DataType, i: String): String = t match {
      case FloatType => s"((double) $v.getFloat($i))"
      case _         => s"$v.getDouble($i)"
    }
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val d = ctx.freshName("d")
    ev.copy(code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = ${leftGen.isNull} || ${rightGen.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          int $n = ${leftGen.value}.numElements();
          if ($n != ${rightGen.value}.numElements()) {
            ${ev.isNull} = true;
          } else {
            for (int $i = 0; $i < $n; $i++) {
              double $d =
                ${getter(leftGen.value.toString, elemType(left).get, i)}
                  - ${getter(rightGen.value.toString, elemType(right).get, i)};
              ${ev.value} += $d * $d;
            }
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorSqDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_sqdist"
}

object VectorSqDist {
  /** Register `vector_sqdist` for SQL and `call_function` use (the
    * [[BloomMightContain]] registration pattern). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_sqdist",
      exprs => VectorSqDist(exprs(0), exprs(1)),
      "built-in")
}
