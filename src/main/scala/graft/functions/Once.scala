package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper flagged nondeterministic — an optimizer *barrier*.
  *
  * Catalyst's predicate pushdown substitutes deterministic project
  * expressions into filter conditions. For a cheap expression that's free;
  * for `from_json` it duplicated the parse FIVE times per row in the
  * adapter pipeline (4 references in the A3 validity predicate + 1 in the
  * explode input), and JsonToStructs evaluates interpreted, so no
  * common-subexpression elimination rescues it. Wrapping the parse in
  * `once(...)` keeps it materialized in its own Project: downstream
  * operators reference the column, and the payload is parsed exactly once.
  *
  * Evaluation is a pure pass-through (same value, null, and codegen as the
  * child) — only the `deterministic` flag changes planning.
  */
case class Once(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "once"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Once {
  def once(c: Column): Column = GraftBridge.column(Once(GraftBridge.expression(c)))
}
