package graft.streaming

import graft.SparkSpec
import graft.ops.Sample
import org.apache.spark.sql.DataFrame

/** X57 streaming form: greedy cross-batch admission in arrival order
  * (hash order within a batch), spent budget refuses later batches,
  * replay idempotent, single batch equals the batch operator.
  */
class TokenBudgetStreamSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  private def admittedSet(statePath: String): Set[(Long, Long, Long)] =
    TokenBudgetStream.admitted(spark, statePath, "doc_id")
      .as[(Long, Long, Long)].collect().toSet

  // docs with i%5+1 tokens each
  private def mk(ids: Range): Seq[(Long, String)] =
    ids.map(i => (i.toLong,
      (0 to (i % 5)).map(j => s"t$j").mkString(" ")))

  test("a single batch equals the batch operator exactly") {
    val statePath = tmpDir("tb-stream-single")
    val rows = mk(1 to 50)
    TokenBudgetStream.applyBatch(statePath, "doc_id", "text", 40L, "s")(
      df(rows: _*), 0L)
    val batch = Sample.tokenBudget(df(rows: _*), "doc_id", "text", 40L, "s")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(admittedSet(statePath) === batch)
  }

  test("arrival order spends the budget; later batches see what remains; replay idempotent") {
    val statePath = tmpDir("tb-stream-multi")
    val apply = TokenBudgetStream.applyBatch(
      statePath, "doc_id", "text", 90L, "s") _
    val b0 = mk(1 to 20)
    val b1 = mk(21 to 40)

    apply(df(b0: _*), 0L)
    val after0 = admittedSet(statePath)
    val b0Batch = Sample.tokenBudget(df(b0: _*), "doc_id", "text", 90L, "s")
      .as[(Long, Long, Long)].collect().toSet
    assert(after0 === b0Batch)
    val spent0 = after0.toSeq.map(_._2).sum

    apply(df(b1: _*), 1L)
    val after1 = admittedSet(statePath)
    // batch 1's admissions are ITS batch-operator prefix under the
    // remaining budget, shifted by batch 0's spend
    val b1Expected =
      if (spent0 >= 90L) Set.empty[(Long, Long, Long)]
      else Sample.tokenBudget(df(b1: _*), "doc_id", "text",
          90L - spent0, "s")
        .as[(Long, Long, Long)].collect()
        .map { case (id, n, cum) => (id, n, cum + spent0) }.toSet
    assert(after1 === after0 ++ b1Expected)
    // the greedy guarantee holds globally: every admitted row's prior
    // cumulative is under budget, and total reaches it
    assert(after1.forall(_._3 < 90L))
    assert(after1.toSeq.map(_._2).sum >= 90L)

    // replay: identical prior spend, identical partitions
    apply(df(b1: _*), 1L)
    assert(admittedSet(statePath) === after1)
  }

  test("an exhausted budget refuses every later batch") {
    val statePath = tmpDir("tb-stream-full")
    val apply = TokenBudgetStream.applyBatch(
      statePath, "doc_id", "text", 10L, "s") _
    apply(df(mk(1 to 20): _*), 0L)
    val n0 = admittedSet(statePath).size
    assert(n0 > 0)
    apply(df(mk(21 to 40): _*), 1L)
    assert(admittedSet(statePath).size === n0)
  }
}
