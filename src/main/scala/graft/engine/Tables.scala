package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
  * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). We flip the documented
  * escape hatch `spark.sql.legacy.parquet.nanosAsLong` and floor-divide to
  * microseconds — the same truncation DuckDB applies when it reads nanos
  * into its native micro-precision TIMESTAMP, so the two engines agree to
  * the microsecond.
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events with `ts` normalized to a microsecond TimestampType column. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "embeddings")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "lineitem")

  def orders(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "orders")

  def customer(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "customer")
}
