package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature vector of a shingle array in ONE pass — X1 scale path.
  *
  * Semantics are exactly the portable SQL family the DuckDB oracle
  * recomputes: sig i = min over shingles s of the (i%4)-th 8-hex-char
  * lane of md5((i/4) + "|" + s). The declarative form — 16 separate
  * `min(substring(md5(concat(...))))` aggregates over the exploded
  * shingle table — re-evaluates concat+md5 machinery per aggregate and
  * keeps 16 string-min states per group; profiling put it at 2.3 s of
  * the 3.7 s x1_minhash_lsh at sf0.1. Here each digest is computed once
  * per shingle in a tight loop, lanes are compared as unsigned ints
  * (fixed-width lowercase hex orders identically), and the row is
  * per *document*, so no shuffle happens at all: signatures come
  * straight out of the scan stage.
  */
case class MinHashSigs(child: Expression, numSigs: Int)
    extends UnaryExpression with CodegenFallback {

  require(numSigs >= 1, "numSigs must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  private val numSeeds = (numSigs + 3) / 4

  // MessageDigest is stateful and NOT thread-safe; one expression instance
  // can be evaluated from several threads (reused plan fragments,
  // driver-side eval), so the digest lives in a ThreadLocal — same
  // discipline as Spark's own hash expressions.
  @transient private lazy val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    (0 until numSeeds).map(g => s"$g|".getBytes("UTF-8")).toArray

  override protected def nullSafeEval(v: Any): Any = {
    val md = this.md.get()
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) return null // no shingles -> no signature (doc too short)
    val mins = Array.fill(numSigs)(0xffffffffL)
    var i = 0
    while (i < len) {
      val sBytes = arr.getUTF8String(i).getBytes
      var g = 0
      while (g < numSeeds) {
        md.reset()
        md.update(seedPrefixes(g))
        md.update(sBytes)
        val h = md.digest() // 16 bytes = 4 unsigned 32-bit lanes
        var l = 0
        while (l < 4 && g * 4 + l < numSigs) {
          val lane = ((h(l * 4) & 0xffL) << 24) | ((h(l * 4 + 1) & 0xffL) << 16) |
            ((h(l * 4 + 2) & 0xffL) << 8) | (h(l * 4 + 3) & 0xffL)
          val idx = g * 4 + l
          if (lane < mins(idx)) mins(idx) = lane
          l += 1
        }
        g += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m =>
      UTF8String.fromString(f"$m%08x"): Any))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSigs {
  def minhash_sigs(shingles: Column, numSigs: Int): Column =
    GraftBridge.column(MinHashSigs(GraftBridge.expression(shingles), numSigs))
}
