package graft.sinks

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.DataFrame

/** K4/K5 production form — batched JDBC inserts inside `foreachBatch`.
  *
  * The reference drains its deque into one prepared-statement transaction
  * per flush (`/root/reference/data_dbstore.go:336-421`). Spark's JDBC
  * writer gives the same shape distributed: each partition opens one
  * connection, inserts its rows in `batchsize` groups, commits once — the
  * time-half of the commit policy comes from the streaming trigger, the
  * size-half from `batchsize`.
  *
  * ClickHouse specifics (DSN options, MergeTree DDL from
  * [[ClickHouseDdl]]) ride on the same call — only the URL/driver change;
  * tests exercise the full path against embedded Derby, the JDBC engine
  * that ships with Spark.
  */
object JdbcSink {

  /** Execute DDL (CREATE DATABASE/TABLE IF NOT EXISTS ...) on the target. */
  def executeDdl(url: String, ddl: String, props: Properties = new Properties()): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.execute(ddl) finally st.close()
    } finally conn.close()
  }

  /** Append a micro-batch. `batchSize` mirrors the reference's
    * DBObjectItemsSize=64 (`data_dbstore.go:18`) — rows per INSERT batch
    * within each partition's single transaction.
    */
  def appendBatch(df: DataFrame, url: String, table: String,
                  batchSize: Int = 64, props: Properties = new Properties()): Unit = {
    val p = new Properties()
    p.putAll(props)
    p.setProperty("batchsize", batchSize.toString)
    df.write.mode("append").jdbc(url, table, p)
  }

  /** foreachBatch-shaped dual JDBC writer (raw + adapter tables), the
    * production analog of Pump.writeBatch's parquet sinks.
    */
  def dualWriter(url: String, rawTable: String, adapterTable: String,
                 batchSize: Int = 64)(
      raw: DataFrame, adapter: DataFrame): Unit = {
    appendBatch(raw, url, rawTable, batchSize)
    appendBatch(adapter, url, adapterTable, batchSize)
  }
}
