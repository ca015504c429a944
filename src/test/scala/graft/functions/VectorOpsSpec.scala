package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the native DotLong / Shingles expressions (the oracle
  * covers the happy path end-to-end).
  */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_long: exact integer dot product, null-safe, prefix on mismatch") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),        // 4+10+18 = 32
      (Seq(1000L, -1000L), Seq(1000L, 1000L))     // 1e6 - 1e6 = 0
    ).toDF("a", "b")
    val got = df.select(VectorOps.dot_long($"a", $"b").as("d")).as[Long].collect()
    assert(got.toSeq === Seq(32L, 0L))
    // null input -> null out
    val n = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(VectorOps.dot_long($"a", $"b")).collect().head
    assert(n.isNullAt(0))
    // length mismatch scores the common prefix
    val p = Seq((Seq(2L, 3L, 9L), Seq(10L, 10L))).toDF("a", "b")
      .select(VectorOps.dot_long($"a", $"b").as("d")).as[Long].collect()
    assert(p.head === 50L)
    // interpreted eval agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val i = df.select(VectorOps.dot_long($"a", $"b").as("d")).as[Long].collect()
      assert(i.toSeq === Seq(32L, 0L))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("shingles: sliding windows, short and exact-length inputs") {
    val df = Seq(
      Seq("a", "b", "c", "d"), // 2 shingles of 3
      Seq("a", "b", "c"),      // exactly 1
      Seq("a", "b"),           // too short -> empty
      Seq.empty[String]
    ).toDF("ts")
    val got = df.select(Shingles.shingles($"ts", 3).as("s")).as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq("a b c"))
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq.empty)
  }

  test("shingles matches the declarative HOF formulation") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val ts = split($"text", " ")
    val hof = docs.select($"doc_id", transform(sequence(lit(1), size(ts) - 2), i =>
      concat_ws(" ", element_at(ts, i), element_at(ts, i + 1), element_at(ts, i + 2))).as("s"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    val native = docs.select($"doc_id", Shingles.shingles(ts, 3).as("s"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    assert(hof.toSeq === native.toSeq)
  }
}
