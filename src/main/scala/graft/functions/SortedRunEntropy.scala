package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The micro-nat run-entropy sum over a SORTED `array<string>`:
  * Σ_runs round(ln(run)·run·10⁶) as BIGINT, where `run` is the length
  * of each maximal run of equal adjacent elements — the per-run
  * product-round seam of [[graft.ops.TextAnalysis.charEntropy]] /
  * `digramEntropy`, as a native one-pass expression.
  *
  * The declarative form was an interpreted `aggregate` fold allocating
  * a 3-field struct per ELEMENT (HOF lambdas evaluate interpreted, no
  * codegen) — the dominant x129/x136 bench cost after the array inputs
  * were already staged as columns. This is one tight loop with a
  * counter; same output, no per-element allocation.
  *
  * SEAM PARITY (spec-pinned by the property test in
  * SortedRunEntropySpec): `ln` is `StrictMath.log` — bytecode-verified
  * to be what Spark's `Log` expression calls — and the round is
  * `BigDecimal.valueOf(x).setScale(0, HALF_UP)`, Spark's `Round(x, 0)`
  * double path, so the kernel is bit-identical to the fold it
  * replaces (and therefore to the DuckDB oracle's relational twin).
  * Empty arrays sum to 0; the input must already be sorted (runs are
  * adjacency-based, exactly like the fold over `array_sort`).
  */
case class SortedRunEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_run_entropy"

  private def term(run: Long): Long =
    JBigDecimal.valueOf(StrictMath.log(run.toDouble) * run.toDouble * 1e6)
      .setScale(0, RoundingMode.HALF_UP).doubleValue().toLong

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var s = 0L
    var run = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val x = arr.getUTF8String(i)
      if (run > 0L && x == prev) run += 1L
      else {
        if (run > 0L) s += term(run)
        run = 1L
      }
      prev = x
      i += 1
    }
    if (run > 0L) s += term(run)
    s
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SortedRunEntropy {
  def sortedRunEntropy(sorted: Column): Column =
    GraftBridge.column(SortedRunEntropy(GraftBridge.expression(sorted)))
}
