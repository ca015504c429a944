package graft.sinks

import java.io.OutputStream
import java.net.{HttpURLConnection, URL, URLEncoder}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** ClickHouse-speaking batched writer over the HTTP interface — the
  * live form of the K4/K5 sink (`/root/reference/data_dbstore.go:336-421`:
  * one prepared-statement transaction per queue drain, 64-row statement
  * batches; `:70-148`: the DSN carries scheme/host/port/username/
  * compress and the store auto-creates database + both MergeTree
  * tables on connect).
  *
  * Spark-first shape: `appendBatch` runs `foreachPartition`, so EVERY
  * executor posts its own partition's rows directly — there is no
  * driver-side funnel, and a 1000-executor job becomes 1000 parallel
  * HTTP inserts, which is exactly how ClickHouse ingestion scales
  * horizontally. Rows are chunked `batchSize` per POST (the
  * reference's statement-batch knob, DBObjectItemsSize=64
  * `data_dbstore.go:18`; production ClickHouse wants 10k+ per insert,
  * so that is the default here). `compress=true` parity is a gzip
  * request body. A non-200 response THROWS with the server's error
  * text — under `foreachBatch` Spark retries the task/batch, which is
  * the Spark-idiomatic form of the reference's failed-commit counter
  * loop (it counts and drops; an exactly-once parquet/JDBC sink path
  * exists beside this one for pipelines that cannot drop).
  */
object ClickHouseHttpSink {

  /** Connection config, DSN parity (`data_dbstore.go:85`). Serializable:
    * it is captured by executor-side closures.
    */
  final case class Endpoint(url: String, user: String = "",
                            password: String = "",
                            compress: Boolean = true) extends Serializable

  /** Execute a statement (DDL or any row-less SQL). Driver-side. */
  def exec(ep: Endpoint, sql: String): Unit =
    post(ep, None, sql.getBytes(StandardCharsets.UTF_8), gzip = false)

  /** Run a query, returning the raw response body (FORMAT JSONEachRow
    * lines for SELECTs). Driver-side; test/check usage.
    */
  def query(ep: Endpoint, sql: String): String =
    post(ep, None, sql.getBytes(StandardCharsets.UTF_8), gzip = false)

  /** Create database + raw/adapter tables, the reference's connect-time
    * bootstrap (`data_dbstore.go:122-147`) — with ReplacingMergeTree in
    * place of the reference's plain MergeTree, so the at-least-once
    * micro-batch replays this sink delivers converge to one row per
    * message instead of accumulating duplicates (see
    * [[ClickHouseDdl.createRawTableReplacing]]).
    */
  def ensureTables(ep: Endpoint, db: String, rawTable: String,
                   adapterTable: String,
                   inf: graft.engine.JsonInference.Inferred): Unit = {
    exec(ep, ClickHouseDdl.createDatabase(db))
    exec(ep, ClickHouseDdl.createRawTableReplacing(db, rawTable))
    exec(ep, ClickHouseDdl.createAdapterTableReplacing(db, adapterTable, inf))
  }

  /** Append a DataFrame to `table`: each partition posts its rows in
    * `batchSize`-row JSONEachRow chunks, in parallel across executors.
    */
  def appendBatch(df: DataFrame, ep: Endpoint, table: String,
                  batchSize: Int = 10000): Unit = {
    val schema = df.schema
    val names = schema.fieldNames.toSeq
    val insertSql = s"INSERT INTO $table (${names.mkString(", ")}) " +
      "FORMAT JSONEachRow"
    df.foreachPartition { (rows: Iterator[Row]) =>
      val mapper = new ObjectMapper()
      rows.grouped(batchSize).foreach { chunk =>
        val body = new StringBuilder
        chunk.foreach { r =>
          val o = mapper.createObjectNode()
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            if (r.isNullAt(i)) o.putNull(f.name)
            else f.dataType match {
              case StringType => o.put(f.name, r.getString(i))
              case IntegerType => o.put(f.name, r.getInt(i))
              case LongType => o.put(f.name, r.getLong(i))
              case ShortType => o.put(f.name, r.getShort(i).toInt)
              case ByteType => o.put(f.name, r.getByte(i).toInt)
              case DoubleType => o.put(f.name, r.getDouble(i))
              case FloatType => o.put(f.name, r.getFloat(i))
              case BooleanType => o.put(f.name, r.getBoolean(i))
              case _: DecimalType => o.put(f.name, r.getDecimal(i))
              case TimestampType =>
                // ClickHouse DateTime literal (second precision, like
                // the reference's collect_datetime), rendered under an
                // EXPLICIT UTC zone — `toLocalDateTime` would use the
                // executor JVM's default zone, silently shifting rows
                // away from the UTC-session parquet system of record on
                // any non-UTC host. CAVEAT (r20 advice): this pins the
                // CLIENT zone only — a bare 'YYYY-MM-DD HH:MM:SS'
                // literal is parsed in the SERVER's timezone, so a
                // non-UTC server still shifts rows unless its column is
                // DateTime('UTC'); only the native sink's epoch-seconds
                // encoding is zone-free end to end. Deployments against
                // a non-UTC server should declare DateTime('UTC') in
                // their DDL (the shipped DDL targets UTC servers — the
                // reference deployment's convention).
                o.put(f.name, r.getTimestamp(i).toInstant
                  .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
                  .format(DateTimeFmt))
              case DateType => o.put(f.name, r.getDate(i).toString)
              case BinaryType =>
                // JSONEachRow cannot carry raw bytes: a UTF-8 String
                // round-trip corrupts arbitrary binary via replacement
                // characters (lossy, silent). Refuse loudly — callers
                // cast/encode upstream (rawProjection casts payload to
                // String); the native-TCP sink's String columns are
                // byte-safe and take binary as-is.
                throw new IllegalArgumentException(
                  s"binary column ${f.name} cannot ride JSONEachRow " +
                    "losslessly - cast to string or base64-encode " +
                    "upstream, or use the native-TCP sink")
              case other => throw new IllegalArgumentException(
                s"unsupported ClickHouse sink type $other for ${f.name}")
            }
          }
          body.append(o.toString).append('\n')
        }
        post(ep, Some(insertSql),
          body.toString.getBytes(StandardCharsets.UTF_8), gzip = ep.compress)
      }
    }
  }

  /** foreachBatch-shaped dual writer (raw + adapter tables) — the HTTP
    * analog of [[JdbcSink.dualWriter]].
    */
  def dualWriter(ep: Endpoint, rawTable: String, adapterTable: String,
                 batchSize: Int = 10000)(
      raw: DataFrame, adapter: DataFrame): Unit = {
    appendBatch(raw, ep, rawTable, batchSize)
    appendBatch(adapter, ep, adapterTable, batchSize)
  }

  private val DateTimeFmt =
    java.time.format.DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss")

  /** One HTTP round-trip. `query` (if set) rides the URL query string
    * and `body` is data; otherwise the body IS the statement. Throws
    * with the server's error text on any non-200.
    */
  private def post(ep: Endpoint, query: Option[String], body: Array[Byte],
                   gzip: Boolean): String = {
    val qs = query.map(q => "?query=" + URLEncoder.encode(q, "UTF-8"))
      .getOrElse("")
    val conn = new URL(ep.url + "/" + qs)
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      if (ep.user.nonEmpty) {
        conn.setRequestProperty("X-ClickHouse-User", ep.user)
        conn.setRequestProperty("X-ClickHouse-Key", ep.password)
      }
      if (gzip) conn.setRequestProperty("Content-Encoding", "gzip")
      val out: OutputStream =
        if (gzip) new GZIPOutputStream(conn.getOutputStream)
        else conn.getOutputStream
      try { out.write(body); out.flush() } finally out.close()
      val status = conn.getResponseCode
      val stream = if (status == 200) conn.getInputStream else conn.getErrorStream
      val text = if (stream == null) "" else {
        try new String(stream.readAllBytes(), StandardCharsets.UTF_8)
        finally stream.close()
      }
      if (status != 200) throw new java.io.IOException(
        s"ClickHouse HTTP $status: ${text.trim}")
      text
    } finally conn.disconnect()
  }
}
