package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Length of the longest common subsequence of two TOKEN arrays — the
  * kernel of ROUGE-L (Lin 2004 §3.2 computes LCS over word sequences,
  * not characters). Native for the same reason as
  * [[DupGramCoveredChars]]: the DP needs O(|a|·|b|) probes into both
  * arrays with a left-neighbor carry, which higher-order-function
  * lambdas evaluate interpreted with per-probe re-evaluation; here it
  * is the classic two-row integer DP, row-local, no allocation beyond
  * the two rows.
  */
case class TokenLcs(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "token_lcs"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) 0L
    else {
      val bt = new Array[UTF8String](m)
      var j = 0
      while (j < m) { bt(j) = b.getUTF8String(j); j += 1 }
      var prev = new Array[Int](m + 1)
      var curr = new Array[Int](m + 1)
      var i = 0
      while (i < n) {
        val ai = a.getUTF8String(i)
        j = 0
        while (j < m) {
          curr(j + 1) =
            if (ai == bt(j)) prev(j) + 1
            else math.max(prev(j + 1), curr(j))
          j += 1
        }
        val t = prev; prev = curr; curr = t
        i += 1
      }
      prev(m).toLong
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object TokenLcs {
  def tokenLcs(a: Column, b: Column): Column =
    GraftBridge.column(TokenLcs(GraftBridge.expression(a),
      GraftBridge.expression(b)))
}
