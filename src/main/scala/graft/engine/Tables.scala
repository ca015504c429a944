package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events.parquet` has shipped `ts` in two physical forms across data
  * generations: INT64 TIMESTAMP(NANOS) (which Spark's parquet reader
  * rejects — [PARQUET_TYPE_ILLEGAL] — so we flip the documented escape
  * hatch `spark.sql.legacy.parquet.nanosAsLong` and floor-divide to
  * microseconds) and native TIMESTAMP(MICROS) without UTC adjustment
  * (which Spark reads as TIMESTAMP_NTZ). Both normalize to the same
  * session-zone micro-precision TimestampType here: the session runs in
  * UTC, so the NTZ→TZ cast re-labels the identical instant, and the nanos
  * floor-divide is the same truncation DuckDB applies reading nanos into
  * its micro-precision TIMESTAMP — the two engines agree to the
  * microsecond either way.
  */
object Tables {

  /** Redistribute a freshly-scanned frame when the scan produced fewer
    * splits than the session's parallelism. The driver's tables are
    * single-file / single-row-group parquet, and parquet only splits at
    * row-group boundaries — so without this EVERY scan-side computation
    * (JSON parse, shingling, hashing) runs on one core no matter how many
    * the session has. One cheap round-robin exchange after the scan buys
    * full-width compute; on a production table with many files/row groups
    * the branch is a no-op. (The monolithic-input mitigation; the 100 TB
    * fix is writing sources with sane row-group sizes in the first place.)
    */
  def balanced(spark: SparkSession, df: DataFrame): DataFrame = {
    // Width follows the DATA, capped by the session: at ~128 KB of scan
    // bytes per task the per-task scheduling cost stays amortized on tiny
    // inputs while big inputs still fan out to every core.
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val bySize = (bytes / (128L * 1024)).min(BigInt(Int.MaxValue)).toInt
    val target = math.min(bySize, spark.sparkContext.defaultParallelism)
    // tiny frames (dimension tables) stay un-exchanged — they broadcast
    if (target >= 2 && df.rdd.getNumPartitions < target) df.repartition(target)
    else df
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    balanced(spark, spark.read.parquet(s"$sfDir/$name.parquet"))

  /** events with `ts` normalized to a microsecond TimestampType column.
    *
    * Requires a UTC session: the NTZ→TZ cast below re-labels the same
    * instant ONLY when spark.sql.session.timeZone is UTC (any other zone
    * would silently shift every NTZ timestamp and diverge from the
    * DuckDB oracle), so the precondition is enforced here rather than
    * trusted to the caller.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"events() requires spark.sql.session.timeZone=UTC (got $tz): the " +
        "TIMESTAMP_NTZ generation is re-labeled, not converted")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // INT64 nanos generation
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ generation; session tz is UTC (asserted), same instant
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case other =>
        sys.error(s"events.parquet ts has unexpected type $other — known " +
          "generations are INT64(NANOS), TIMESTAMP(MICROS), TIMESTAMP_NTZ")
    }
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
