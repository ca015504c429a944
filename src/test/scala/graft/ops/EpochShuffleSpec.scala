package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X70 epoch shuffle: the two-pass (prefix-group offsets + partitioned
  * rank) decomposition equals the naive per-shard global window, the
  * order is a pure function of (key, seed), and positions are dense.
  */
class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 500L).toDF("doc_id")

  test("two-pass decomposition equals the naive per-shard window") {
    val got = Sample.epochShuffle(docs, "doc_id", numShards = 8, seed = "e1")
    val naive = docs
      .withColumn("h", md5(concat(col("doc_id").cast("string"), lit("e1"))))
      .withColumn("shard",
        (conv(substring(col("h"), 1, 2), 16, 10).cast("int") % 8).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
        .cast("long") - 1L)
      .select("doc_id", "shard", "pos")
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("positions are dense 0..n-1 within every shard; all rows assigned") {
    val out = Sample.epochShuffle(docs, "doc_id", numShards = 4, seed = "x")
      .cache()
    assert(out.count() === 500L)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"),
        countDistinct("pos").as("nd"))
      .collect()
    assert(perShard.nonEmpty)
    perShard.foreach { r =>
      assert(r.getAs[Long]("mn") === 0L)
      assert(r.getAs[Long]("mx") === r.getAs[Long]("n") - 1)
      assert(r.getAs[Long]("nd") === r.getAs[Long]("n"))
    }
    out.unpersist()
  }

  test("deterministic under the seed; a different seed reorders") {
    val a = Sample.epochShuffle(docs, "doc_id", 8, "s1")
    val b = Sample.epochShuffle(docs, "doc_id", 8, "s1")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val c = Sample.epochShuffle(docs, "doc_id", 8, "s2")
    // same rows, different assignment for at least one doc
    assert(a.join(c, Seq("doc_id", "shard", "pos")).count() < 500L)
  }

  test("numShards = 1 is a total order; out-of-range shard counts refuse") {
    val one = Sample.epochShuffle(docs.limit(50), "doc_id", 1, "z")
    assert(one.select(countDistinct("shard")).as[Long].head() === 1L)
    assert(one.select(max("pos")).as[Long].head() === 49L)
    intercept[IllegalArgumentException](
      Sample.epochShuffle(docs, "doc_id", 0))
    intercept[IllegalArgumentException](
      Sample.epochShuffle(docs, "doc_id", 257))
  }
}
