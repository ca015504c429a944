package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native integer dot product over two `array<long>` or `array<int>`
  * columns (element type read from the child schema; int inputs accumulate
  * into long).
  *
  * The pairwise scoring in X1/X2 (embedding dedup, cosine top-k) runs once
  * per *candidate pair* — the hot path of the similarity family. Spark's
  * higher-order functions (`aggregate(zip_with(...))`) evaluate their
  * lambdas interpreted, per element, with an allocated intermediate array
  * per pair; at |corpus|^2 pairs that dominates the whole benchmark. This
  * expression is a tight primitive loop with full `doGenCode`, so the
  * scoring stays inside WholeStageCodegen with zero allocation. Int
  * quantization additionally halves the bytes copied per joined pair.
  *
  * Null semantics: null if either array is null (BinaryExpression default);
  * mismatched lengths score over the common prefix.
  */
case class DotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  private def elemIsInt(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (xi, yi) = (elemIsInt(left), elemIsInt(right))
    var sum = 0L
    var i = 0
    while (i < n) {
      val xv = if (xi) x.getInt(i).toLong else x.getLong(i)
      val yv = if (yi) y.getInt(i).toLong else y.getLong(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val getA = if (elemIsInt(left)) s"(long) $a.getInt($i)" else s"$a.getLong($i)"
      val getB = if (elemIsInt(right)) s"(long) $b.getInt($i)" else s"$b.getLong($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $sum = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $sum += $getA * $getB;
        }
        ${ev.value} = $sum;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** dot_long(a, b): exact integer dot product of quantized vectors. */
  def dot_long(a: Column, b: Column): Column =
    GraftBridge.column(DotLong(GraftBridge.expression(a), GraftBridge.expression(b)))
}
