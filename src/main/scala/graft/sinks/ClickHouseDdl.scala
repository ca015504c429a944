package graft.sinks

import graft.engine.JsonInference

/** K1 — DDL auto-create synthesis (`/root/reference/data_dbstore.go:122-147`).
  *
  * The reference issues `CREATE DATABASE/TABLE IF NOT EXISTS` against
  * ClickHouse with a MergeTree engine keyed on the materialized
  * `collect_date`. Both DDL dialects are synthesized here from the
  * inferred schema: the ClickHouse form for a production JDBC sink, and a
  * Spark-catalog form where `collect_date` is an explicit derived column
  * with `PARTITIONED BY (collect_date)` standing in for the MergeTree
  * date key (SURVEY §2.4 K1). At 100 TB, date partitioning keeps both
  * ingestion (append-only daily partitions) and typical time-ranged reads
  * (partition pruning) linear.
  */
object ClickHouseDdl {

  def createDatabase(db: String): String =
    s"CREATE DATABASE IF NOT EXISTS $db"

  /** Raw table — `data_dbstore.go:127-133`. */
  def createRawTableClickHouse(db: String, table: String): String =
    s"""CREATE TABLE IF NOT EXISTS $db.$table (
       |  mid String, topic String, payload String,
       |  collect_datetime DateTime,
       |  collect_date Date MATERIALIZED toDate(collect_datetime)
       |) ENGINE = MergeTree(collect_date, (mid, topic, collect_date), 8192)""".stripMargin

  /** Adapter table with the inferred columns — `data_dbstore.go:138-142`;
    * column list is the A6 DDL fragment (golden transcript readme.txt:40).
    */
  def createAdapterTableClickHouse(db: String, table: String,
                                   inf: JsonInference.Inferred): String =
    s"""CREATE TABLE IF NOT EXISTS $db.$table (
       |  mid String${JsonInference.ddlFragment(inf)},
       |  collect_datetime DateTime,
       |  collect_date Date MATERIALIZED toDate(collect_datetime)
       |) ENGINE = MergeTree(collect_date, (mid, collect_date), 8192)""".stripMargin

  /** The LIVE sinks' raw-table DDL: same columns as the reference's
    * (`data_dbstore.go:127-133`), but ENGINE = ReplacingMergeTree keyed
    * on the message identity — a deliberate deviation from the
    * reference's plain MergeTree, because the live sinks deliver
    * at-least-once on micro-batch replay (no batch_id partition to
    * overwrite, unlike the parquet system of record) and ReplacingMergeTree
    * is ClickHouse's own idiom for converging replayed duplicates: the
    * background merge keeps one row per ORDER BY key, and `SELECT ...
    * FINAL` guarantees the deduplicated view before merges complete.
    * The reference-exact MergeTree DDL above remains the K1 golden
    * surface; this variant is what [[ClickHouseHttpSink.ensureTables]]
    * and [[ClickHouseNativeSink.ensureTables]] execute.
    */
  def createRawTableReplacing(db: String, table: String): String =
    s"""CREATE TABLE IF NOT EXISTS $db.$table (
       |  mid String, topic String, payload String,
       |  collect_datetime DateTime,
       |  collect_date Date MATERIALIZED toDate(collect_datetime)
       |) ENGINE = ReplacingMergeTree PARTITION BY collect_date ORDER BY (mid, topic)""".stripMargin

  /** Adapter-table twin of [[createRawTableReplacing]]. The adapter fans
    * one message into multiple records, so `mid` alone would collapse
    * them; the replacing key is `(mid, every inferred column)` — the
    * full record identity. A replayed batch regenerates byte-identical
    * records, so replays converge to one row each; two genuinely
    * IDENTICAL records inside one message also collapse (a documented
    * edge the parquet system of record does not share — its batch_id
    * overwrite keeps both).
    */
  def createAdapterTableReplacing(db: String, table: String,
                                  inf: JsonInference.Inferred): String =
    s"""CREATE TABLE IF NOT EXISTS $db.$table (
       |  mid String${JsonInference.ddlFragment(inf)},
       |  collect_datetime DateTime,
       |  collect_date Date MATERIALIZED toDate(collect_datetime)
       |) ENGINE = ReplacingMergeTree PARTITION BY collect_date ORDER BY (mid, ${inf.sortedKeys.mkString(", ")})""".stripMargin

  /** Spark-catalog equivalents: derived `collect_date` column + parquet
    * partitioning replaces the MATERIALIZED MergeTree key.
    */
  def createRawTableSpark(db: String, table: String, location: String): String =
    s"""CREATE TABLE IF NOT EXISTS $db.$table (
       |  mid STRING, topic STRING, payload STRING,
       |  collect_datetime TIMESTAMP, collect_date DATE
       |) USING parquet PARTITIONED BY (collect_date) LOCATION '$location'""".stripMargin

  def createAdapterTableSpark(db: String, table: String, location: String,
                              inf: JsonInference.Inferred): String = {
    val cols = inf.sortedKeys.map { k =>
      val t = inf.leafTypes(k) match {
        case org.apache.spark.sql.types.DoubleType  => "DOUBLE"
        case org.apache.spark.sql.types.BooleanType => "BOOLEAN"
        case _                                      => "STRING"
      }
      s"$k $t"
    }.mkString(", ")
    s"""CREATE TABLE IF NOT EXISTS $db.$table (
       |  mid STRING, $cols,
       |  collect_datetime TIMESTAMP, collect_date DATE
       |) USING parquet PARTITIONED BY (collect_date) LOCATION '$location'""".stripMargin
  }
}
