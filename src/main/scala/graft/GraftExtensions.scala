package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotLong, MinHashSigs, MisraGries, RandomId, Shingles}

/** SQL registration of the engine's native expressions.
  *
  * Production sessions use the extensions hook:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  * }}}
  * An already-running session (where `getOrCreate` would silently ignore
  * `withExtensions`) can register imperatively:
  * {{{
  *   GraftExtensions.register(spark)
  * }}}
  * Either way: `spark.sql("SELECT random_id(8), dot_long(a,b), shingles(ts,3)")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("random_id"),
      new ExpressionInfo(classOf[RandomId].getName, "random_id"),
      (args: Seq[Expression]) => args match {
        case Seq(len) => RandomId(intLit(len, "length"), 0L)
        case Seq(len, seed) => RandomId(intLit(len, "length"), intLit(seed, "seed").toLong)
        case _ => throw new IllegalArgumentException("random_id(length[, seed])")
      }),
    (FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotLong].getName, "dot_long"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotLong(a, b)
        case _ => throw new IllegalArgumentException("dot_long(a, b)")
      }),
    (FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(ts, n) => Shingles(ts, intLit(n, "n"))
        case _ => throw new IllegalArgumentException("shingles(tokens, n)")
      }),
    (FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (args: Seq[Expression]) => args match {
        case Seq(sh, n) => MinHashSigs(sh, intLit(n, "numSigs"))
        case _ => throw new IllegalArgumentException("minhash_sigs(shingles, numSigs)")
      }),
    (FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (args: Seq[Expression]) => args match {
        case Seq(c, kExpr) =>
          MisraGries(c, intLit(kExpr, "k")).toAggregateExpression()
        case _ => throw new IllegalArgumentException("misra_gries(col, k)")
      }))

  /** Imperative registration into a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
