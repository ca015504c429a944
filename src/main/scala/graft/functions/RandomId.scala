package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** T2 — per-message random ID: N uppercase-alphanumeric chars (36-char
  * alphabet), the reference's message id (`/root/reference/
  * data_processor.go:24-38`, default length 8, alphabet [0-9A-Z] from
  * crypto/rand).
  *
  * Implemented as a native nondeterministic Catalyst expression WITH
  * `doGenCode` (modeled on Spark's own `Rand`): the id assignment sits on
  * the streaming hot path — every ingested message gets one — so it must
  * stay inside WholeStageCodegen rather than fall back to interpreted eval
  * or a Scala UDF. Seeded per (seed + partitionIndex) like `Rand`, so task
  * retries regenerate the same ids within a partition.
  */
case class RandomId(length: Int, seed: Long)
    extends LeafExpression with Nondeterministic {

  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "random_id"

  @transient private var rng: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(seed + partitionIndex)

  override protected def evalInternal(input: InternalRow): Any = {
    val chars = new Array[Byte](length)
    var i = 0
    while (i < length) {
      chars(i) = RandomId.Alphabet.charAt(rng.nextInt(36)).toByte
      i += 1
    }
    UTF8String.fromBytes(chars)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rngTerm = ctx.addMutableState("java.util.Random", "randomIdRng")
    ctx.addPartitionInitializationStatement(
      s"$rngTerm = new java.util.Random(${seed}L + partitionIndex);")
    val bytes = ctx.freshName("idBytes")
    val i = ctx.freshName("i")
    ev.copy(code = code"""
      byte[] $bytes = new byte[$length];
      for (int $i = 0; $i < $length; $i++) {
        $bytes[$i] = (byte) "${RandomId.Alphabet}".charAt($rngTerm.nextInt(36));
      }
      final UTF8String ${ev.value} = UTF8String.fromBytes($bytes);""",
      isNull = FalseLiteral)
  }
}

object RandomId {
  val Alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  /** Column-API surface: `df.withColumn("mid", random_id(8))`. */
  def random_id(length: Int = 8, seed: Long = 0L): Column =
    org.apache.spark.sql.GraftBridge.column(RandomId(length, seed))
}
