package graft.ops

import graft.SparkSpec

/** X27 SCD2 history build: run collapsing, tie resolution by the
  * tie-breaker column, one-version keys, and the single-exchange plan
  * shape the class doc promises.
  */
class CdcSpec extends SparkSpec {

  import spark.implicits._

  test("attribute runs collapse into versions with half-open intervals") {
    val got = Cdc.scd2(
      Seq(("k1", 1, 1, "A"), ("k1", 2, 2, "A"), ("k1", 3, 3, "B"),
        ("k1", 4, 4, "A")).toDF("k", "ts", "tie", "attr"),
      "k", "attr", "ts", "tie")
      .orderBy("version")
      .select("version", "attr", "valid_from", "valid_to", "n_rows", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]), r.getLong(4), r.getInt(5)))
    assert(got.toSeq === Seq(
      (1L, "A", 1, Some(3), 2L, 0), // 2-row run, closed by B's start
      (2L, "B", 3, Some(4), 1L, 0),
      (3L, "A", 4, None, 1L, 1))) // reappearing attr = NEW version, current
  }

  test("a key that never changes yields exactly one open version") {
    val got = Cdc.scd2(
      Seq(("k2", 10, 1, "X"), ("k2", 20, 2, "X"), ("k2", 30, 3, "X"))
        .toDF("k", "ts", "tie", "attr"),
      "k", "attr", "ts", "tie").collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(1) === 1L) // version
    assert(r.getString(2) === "X")
    assert(r.getInt(3) === 10) // valid_from
    assert(r.isNullAt(4)) // valid_to open
    assert(r.getLong(5) === 3L)
    assert(r.getInt(6) === 1)
  }

  test("equal timestamps are ordered by the tie-breaker column") {
    val got = Cdc.scd2(
      Seq(("k3", 5, 2, "B"), ("k3", 5, 1, "A")).toDF("k", "ts", "tie", "attr"),
      "k", "attr", "ts", "tie")
      .orderBy("version")
      .select("version", "attr", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]), r.getInt(4)))
    // tie=1 (A) sorts first: A is version 1, closed at the SAME ts by B
    assert(got.toSeq === Seq(
      (1L, "A", 5, Some(5), 0),
      (2L, "B", 5, None, 1)))
  }

  test("applyChanges over the full change stream equals scd2's current rows") {
    // the two halves of CDC must agree: materializing the latest row per
    // key (apply) gives exactly the open (is_current) version of the
    // history build, for any change stream
    val changes = Seq(
      ("k1", 1, 1, "A"), ("k1", 3, 3, "B"), ("k1", 2, 2, "A"),
      ("k2", 5, 1, "X"),
      ("k3", 4, 1, "P"), ("k3", 4, 2, "Q")) // tie on ts
    val df = changes.toDF("k", "ts", "tie", "attr")
    val current = Cdc.scd2(df, "k", "attr", "ts", "tie")
      .filter($"is_current" === 1)
      .select("k", "attr").as[(String, String)].collect().toSet
    val emptySnap = Seq.empty[(String, Int, Int, String, String)]
      .toDF("k", "ts", "tie", "attr", "op")
    val applied = Cdc.applyChanges(emptySnap,
      df.withColumn("op", org.apache.spark.sql.functions.lit("U")),
      "k", "ts", "tie", "op")
      .select("k", "attr").as[(String, String)].collect().toSet
    assert(applied === current)
    assert(applied === Set("k1" -> "B", "k2" -> "X", "k3" -> "Q"))
  }

  test("the whole history build costs exactly one exchange") {
    val plan = Cdc.scd2(
      Seq(("k1", 1, 1, "A"), ("k1", 2, 2, "B"), ("k2", 1, 1, "C"))
        .toDF("k", "ts", "tie", "attr"),
      "k", "attr", "ts", "tie")
      .queryExecution.executedPlan.toString
    val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges === 1,
      s"change-window, run-agg and interval-lead must share one key exchange:\n$plan")
  }
}
