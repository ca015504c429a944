package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions. Uses the imperative
  * path because the suite-shared session may already exist (getOrCreate
  * ignores withExtensions on an active session — same reason the
  * imperative path exists for users).
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("random_id / dot_long / shingles callable from SQL") {
    GraftExtensions.register(spark)
    val id = spark.sql("SELECT random_id(8) AS mid").collect().head.getString(0)
    assert(id.matches("^[0-9A-Z]{8}$"))
    val d = spark.sql("SELECT dot_long(array(1L,2L), array(3L,4L)) AS d")
      .collect().head.getLong(0)
    assert(d === 11L)
    val sh = spark.sql("SELECT shingles(array('a','b','c'), 2) AS s")
      .collect().head.getSeq[String](0)
    assert(sh === Seq("a b", "b c"))
    // minhash_sigs agrees with the declarative lane formula
    val sig0 = spark.sql("SELECT minhash_sigs(array('a b c'), 16)[0] AS s0")
      .collect().head.getString(0)
    val expected = spark.sql("SELECT substring(md5('0|a b c'), 1, 8) AS e")
      .collect().head.getString(0)
    assert(sig0 === expected)
    // misra_gries aggregates from SQL: dominant value reported first
    val hh = spark.sql(
      "SELECT misra_gries(t, 2) AS hh FROM VALUES ('a'),('a'),('a'),('b'),('c') AS v(t)")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(hh.head.getString(0) === "a")
    // non-string input fails at analysis time, not as a per-task
    // ClassCastException mid-job
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT misra_gries(t, 2) FROM VALUES (1L),(2L) AS v(t)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("extensions hook injects the same function set") {
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ===
      Seq("dot_long", "minhash_sigs", "misra_gries", "random_id", "shingles"))
  }
}
