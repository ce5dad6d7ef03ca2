package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `vector_dot(a, b)` — the embedding dot product as a native
  * codegen'd `Expression` (the (b)-tier extension shape, like
  * [[BloomMightContain]]).
  *
  * Why it exists: the composed form `aggregate(zip_with(a, b, (x, y) =>
  * x*y), 0.0, +)` is a HIGHER-ORDER expression — Catalyst interprets
  * the lambda per element (no whole-stage codegen, boxed
  * NamedLambdaVariables, a materialized intermediate product array),
  * and the vectors family evaluates it millions of times per query.
  * This expression compiles to a bare fused-multiply loop over the
  * two `ArrayData`s inside whole-stage codegen: no lambda dispatch, no
  * intermediate array, no boxing.
  *
  * Semantics are BIT-IDENTICAL to the composed form it replaces: a
  * left-to-right fold `acc + (double) a[i] * (double) b[i]` from 0.0 in
  * index order — so every DuckDB oracle that pins the explicit
  * left-associated 64-term SQL sum keeps matching exactly. Each side
  * may be ARRAY<FLOAT> or ARRAY<DOUBLE> independently (embeddings are
  * float, literal hyperplane/centroid tables are double). Null array →
  * null; length mismatch → null (the composed zip_with form would
  * yield null through a padded element, same outcome). Array elements
  * are non-null by the embeddings contract.
  */
case class VectorDot(left: Expression, right: Expression)
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
        s"vector_dot needs ARRAY<FLOAT|DOUBLE> inputs, got " +
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
      acc += get(aa, ta, i) * get(bb, tb, i)
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
              ${ev.value} +=
                ${getter(leftGen.value.toString, elemType(left).get, i)}
                  * ${getter(rightGen.value.toString, elemType(right).get, i)};
            }
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

object VectorDot {
  /** Register `vector_dot` for SQL and `call_function` use (the
    * [[BloomMightContain]] registration pattern). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot",
      exprs => VectorDot(exprs(0), exprs(1)),
      "built-in")
}
