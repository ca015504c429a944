package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-pair clipped n-gram match counts for ALL orders 1..maxN in one
  * row-local pass: out[n-1] = Σ_grams min(count_hyp, count_ref) — the
  * numerator lane of BLEU, ROUGE-N, and chrF.
  *
  * This exists because clipping is defined PER PAIR (Papineni et al.
  * 2002 §2.1), which makes the whole computation row-local: the
  * explode → (pair, n, gram) count → hash-join formulation shuffles a
  * row per GRAM occurrence (the dominant exchange of the metric family
  * at scale — chrF alone is ~maxN·chars rows per side), where this
  * expression shuffles NOTHING — the downstream group-by exchanges
  * maxN integers per pair. Gram identity is the same separator-joined
  * string [[Shingles]] builds, so the counts equal the join
  * formulation's and the oracle's bit-for-bit.
  */
case class ClippedGramMatches(left: Expression, right: Expression,
                              maxN: Int, separator: String)
    extends BinaryExpression with CodegenFallback {

  require(maxN >= 1 && maxN <= 8, s"maxN $maxN out of range [1, 8]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "clipped_gram_matches"

  private val sep = UTF8String.fromString(separator)

  private def gram(arr: ArrayData, i: Int, n: Int): UTF8String =
    if (n == 1) arr.getUTF8String(i)
    else {
      val parts = new Array[UTF8String](2 * n - 1)
      var k = 0
      while (k < n) {
        parts(2 * k) = arr.getUTF8String(i + k)
        if (k < n - 1) parts(2 * k + 1) = sep
        k += 1
      }
      UTF8String.concat(parts: _*)
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val h = l.asInstanceOf[ArrayData]
    val f = r.asInstanceOf[ArrayData]
    val out = new Array[Any](maxN)
    var n = 1
    while (n <= maxN) {
      val hm = h.numElements() - n + 1
      val fm = f.numElements() - n + 1
      var m = 0L
      if (hm > 0 && fm > 0) {
        val counts = new java.util.HashMap[UTF8String, Int](hm * 2)
        var i = 0
        while (i < hm) {
          counts.merge(gram(h, i, n), 1, (a, b) => a + b)
          i += 1
        }
        i = 0
        while (i < fm) {
          val g = gram(f, i, n)
          val c = counts.get(g)
          if (c != null && c > 0) {
            counts.put(g, c - 1)
            m += 1L
          }
          i += 1
        }
      }
      out(n - 1) = m
      n += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object ClippedGramMatches {
  def clippedGramMatches(hyp: Column, ref: Column, maxN: Int,
                         separator: String = " "): Column =
    GraftBridge.column(ClippedGramMatches(GraftBridge.expression(hyp),
      GraftBridge.expression(ref), maxN, separator))
}
