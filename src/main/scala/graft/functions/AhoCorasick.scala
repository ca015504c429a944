package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching (Aho & Corasick 1975): ONE pass
  * over the text finds every pattern of the set, against the K·len
  * cost of per-pattern `contains` — the difference between a 20-phrase
  * demo and a 10⁴-phrase production blocklist (C4's badwords filter,
  * contamination canaries, licensing strings) at corpus scale.
  *
  * The automaton (trie + BFS failure links + output sets merged along
  * the fail chain) is built ONCE per executor from the pattern list
  * baked into the expression — a bounded plan artifact, same
  * discipline as the Bloom bitmap (truly huge lists would move to a
  * broadcast variable; the loud cap marks that seam). Matching is
  * codepoint-by-codepoint with no backtracking: O(len + hits).
  */
private[graft] final class AcAutomaton(patterns: Seq[String]) extends Serializable {
  // nodes as growable parallel arrays; goto maps are per-node hash maps
  // (pattern alphabets are tiny relative to text)
  private val gotoMaps = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val outs = mutable.ArrayBuffer(List.empty[Int])
  private var fails: Array[Int] = _

  patterns.zipWithIndex.foreach { case (p, id) =>
    var s = 0
    p.foreach { c =>
      s = gotoMaps(s).getOrElseUpdate(c, {
        gotoMaps += mutable.HashMap.empty[Char, Int]
        outs += Nil
        gotoMaps.size - 1
      })
    }
    outs(s) = id :: outs(s)
  }
  locally { // BFS failure links; merge output sets along the fail chain
    fails = new Array[Int](gotoMaps.size)
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).valuesIterator.foreach { s => fails(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoMaps(u).foreach { case (c, v) =>
        var f = fails(u)
        while (f != 0 && !gotoMaps(f).contains(c)) f = fails(f)
        fails(v) = gotoMaps(f).get(c).filter(_ != v).getOrElse(0)
        outs(v) = outs(v) ++ outs(fails(v))
        queue += v
      }
    }
  }

  /** Distinct ids of patterns occurring in `text`, ascending. */
  def search(text: String): Array[Int] = {
    val hit = new java.util.BitSet(outs.size)
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (s != 0 && !gotoMaps(s).contains(c)) s = fails(s)
      s = gotoMaps(s).getOrElse(c, 0)
      var o = outs(s)
      while (o.nonEmpty) { hit.set(o.head); o = o.tail }
      i += 1
    }
    val res = new Array[Int](hit.cardinality())
    var b = hit.nextSetBit(0)
    var k = 0
    while (b >= 0) { res(k) = b; k += 1; b = hit.nextSetBit(b + 1) }
    res
  }
}

/** Distinct matched pattern ids for each text row, ascending. The
  * pattern list must be sorted and duplicate-free so ids ARE
  * lexicographic ranks — the property downstream uses to map ids back
  * to phrases deterministically.
  */
case class AhoCorasickHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.nonEmpty, "pattern list must be non-empty")
  require(patterns.forall(_.nonEmpty),
    "empty-string pattern: the automaton would never report it, " +
      "silently diverging from contains(text, '') = true")
  require(patterns.size <= 100000,
    s"${patterns.size} patterns: beyond 100k move the list to a broadcast")
  require(patterns.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
    "patterns must be strictly sorted (ids are lexicographic ranks)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "aho_corasick_hits"

  @transient private lazy val ac = new AcAutomaton(patterns)

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(ac.search(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object AhoCorasickHits {
  def ahoCorasickHits(text: Column, patterns: Seq[String]): Column =
    GraftBridge.column(AhoCorasickHits(GraftBridge.expression(text), patterns))
}
