package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Characters of word positions covered by any duplicated n-gram
  * (Gopher Table A1's "duplicate n-gram char fraction" numerator):
  * positions covered by one or more n-grams that occur more than once
  * in the document, each position's word chars counted ONCE.
  *
  * Native for the same reason as [[Shingles]]: the declarative form
  * needs per-position probes into computed arrays (`element_at(sorted,
  * i)` / `element_at(words, p)` inside higher-order-function lambdas),
  * and interpreted lambda evaluation re-evaluates the probed array's
  * whole expression tree per probe — O(m²)–O(m³) per document, which
  * hangs on exactly the highly repetitive 10⁴-word pages this filter
  * exists to catch. This is one O(m·n) loop per row: gram hash-count,
  * a boolean coverage mark, one length sum.
  */
case class DupGramCoveredChars(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "gram size must be >= 1")

  override def dataType: DataType = LongType
  override def prettyName: String = "dup_gram_covered_chars"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val w = arr.numElements()
    if (w < n) 0L
    else {
      val m = w - n + 1
      // textual grams, word-boundary joined — identical equality to the
      // oracle's array_to_string(ws[i:i+n-1], ' ')
      val grams = new Array[UTF8String](m)
      var i = 0
      while (i < m) {
        val parts = new Array[UTF8String](2 * n - 1)
        var k = 0
        while (k < n) {
          parts(2 * k) = arr.getUTF8String(i + k)
          if (k < n - 1) parts(2 * k + 1) = space
          k += 1
        }
        grams(i) = UTF8String.concat(parts: _*)
        i += 1
      }
      val counts = new java.util.HashMap[UTF8String, Int](m * 2)
      i = 0
      while (i < m) {
        counts.merge(grams(i), 1, (a, b) => a + b)
        i += 1
      }
      val covered = new Array[Boolean](w)
      i = 0
      while (i < m) {
        if (counts.get(grams(i)) > 1) {
          var k = i
          while (k < i + n) { covered(k) = true; k += 1 }
        }
        i += 1
      }
      var sum = 0L
      var j = 0
      while (j < w) {
        if (covered(j)) sum += arr.getUTF8String(j).numChars()
        j += 1
      }
      sum
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DupGramCoveredChars {
  def dupGramCoveredChars(words: Column, n: Int): Column =
    GraftBridge.column(DupGramCoveredChars(GraftBridge.expression(words), n))
}
