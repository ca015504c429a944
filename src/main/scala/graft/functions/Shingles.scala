package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** n-token shingles of an `array<string>` as a native expression.
  *
  * The declarative form — `transform(sequence(...), i => concat_ws(" ",
  * element_at(ts, i), ...))` — evaluates an interpreted lambda tree per
  * shingle; profiling showed it dominating the whole near-dup family
  * (5.5 s of an 8 s query at sf0.1). This is one tight loop over the
  * token array with direct UTF8String concatenation: same output, ~10x
  * cheaper, and the cost is per *document* row (thousands), so the
  * CodegenFallback projection boundary is immaterial.
  */
case class Shingles(child: Expression, n: Int, separator: String = " ")
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  private val space = UTF8String.fromString(separator)

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        val parts = new Array[UTF8String](2 * n - 1)
        var k = 0
        while (k < n) {
          parts(2 * k) = arr.getUTF8String(i + k)
          if (k < n - 1) parts(2 * k + 1) = space
          k += 1
        }
        out(i) = UTF8String.concat(parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Shingles {
  def shingles(tokens: Column, n: Int): Column =
    GraftBridge.column(Shingles(GraftBridge.expression(tokens), n))

  /** n consecutive elements joined by an arbitrary separator — e.g.
    * "\n" for line-span windows ([[graft.ops.C4.spanDedup]]).
    */
  def shingles(tokens: Column, n: Int, separator: String): Column =
    GraftBridge.column(Shingles(GraftBridge.expression(tokens), n, separator))
}
