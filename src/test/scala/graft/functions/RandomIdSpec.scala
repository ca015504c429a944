package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** T2 — id shape, alphabet, and retry-determinism (seed + partition). */
class RandomIdSpec extends SparkSpec {
  import spark.implicits._

  test("ids are N uppercase-alphanumeric chars (36-char alphabet)") {
    val ids = spark.range(1000).select(RandomId.random_id(8).as("mid"))
      .as[String].collect()
    assert(ids.forall(_.matches("^[0-9A-Z]{8}$")))
    // crypto-rand-ish spread: essentially no collisions at this scale
    assert(ids.distinct.length > 990)
  }

  test("length parameter respected (data_processor.go:35-38 default 8)") {
    val ids = spark.range(10).select(RandomId.random_id(12).as("mid")).as[String].collect()
    assert(ids.forall(_.length == 12))
  }

  test("same seed + partitioning regenerates identical ids (task retry safety)") {
    def run() = spark.range(0, 100, 1, numPartitions = 4)
      .select(RandomId.random_id(8, seed = 7L).as("mid")).as[String].collect().toSeq
    assert(run() === run())
  }

  test("expression survives both codegen and interpreted eval") {
    val withCodegen = spark.range(5).select(RandomId.random_id(8, 3L).as("m")).as[String].collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = spark.range(5).select(RandomId.random_id(8, 3L).as("m")).as[String].collect()
      assert(withCodegen.forall(_.matches("^[0-9A-Z]{8}$")))
      assert(interpreted.forall(_.matches("^[0-9A-Z]{8}$")))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
