package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Characters of the most frequent n-gram's occurrences (Gopher Table
  * A1's "top n-gram char fraction" numerator): occurrence count of the
  * most frequent n-gram — ties to the lexicographically smallest gram
  * (binary UTF-8 order, the same collation the previous array_sort fold
  * and the DuckDB oracle's ORDER BY use) — times the gram's word chars
  * (separators excluded).
  *
  * Native like [[DupGramCoveredChars]]: the declarative form was an
  * interpreted fold over array_sort whose comparator lambda is
  * evaluated per comparison — the dominant cost of the x67/x68 bench
  * profile. One hash-count pass + one max scan per row, O(m·n).
  */
case class TopGramChars(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "gram size must be >= 1")

  override def dataType: DataType = LongType
  override def prettyName: String = "top_gram_chars"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val w = arr.numElements()
    if (w < n) 0L
    else {
      val m = w - n + 1
      val counts = new java.util.HashMap[UTF8String, Int](m * 2)
      var i = 0
      while (i < m) {
        val parts = new Array[UTF8String](2 * n - 1)
        var k = 0
        while (k < n) {
          parts(2 * k) = arr.getUTF8String(i + k)
          if (k < n - 1) parts(2 * k + 1) = space
          k += 1
        }
        counts.merge(UTF8String.concat(parts: _*), 1, (a, b) => a + b)
        i += 1
      }
      var bestCount = 0
      var bestGram: UTF8String = null
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > bestCount ||
          (c == bestCount && e.getKey.compareTo(bestGram) < 0)) {
          bestCount = c
          bestGram = e.getKey
        }
      }
      // gram word chars = chars of the joined gram minus the n-1
      // separators
      bestCount.toLong * (bestGram.numChars() - (n - 1)).toLong
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TopGramChars {
  def topGramChars(words: Column, n: Int): Column =
    GraftBridge.column(TopGramChars(GraftBridge.expression(words), n))
}
