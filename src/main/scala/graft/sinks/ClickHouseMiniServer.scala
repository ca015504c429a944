package graft.sinks

import java.io.{ByteArrayOutputStream, InputStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process stand-in for ClickHouse's HTTP interface — the same role
  * [[graft.sources.mqtt.MqttMiniServer]] plays for EMQX: no ClickHouse
  * ships in this sandbox, so the one-endpoint HTTP protocol (a `POST /`
  * whose query string or body carries SQL, with `INSERT ... FORMAT
  * JSONEachRow` data in the body) is implemented here far enough to
  * exercise the REAL writer path end-to-end: DDL (`CREATE DATABASE/
  * TABLE IF NOT EXISTS`, MergeTree clause parsed and ignored,
  * MATERIALIZED columns computed on insert), batched inserts (gzip
  * `Content-Encoding` honored — the reference DSN's `compress=true`,
  * `data_dbstore.go:85`), `GET /ping` -> `Ok.`, optional user/key auth
  * (`X-ClickHouse-User`/`X-ClickHouse-Key` headers or `user`/
  * `password` query params), and minimal SELECT read-back
  * (`*` / column list / `count()`, `FORMAT JSONEachRow`).
  *
  * Storage is an in-memory row list per table — fidelity is to the
  * PROTOCOL and the writer's observable behavior, not to MergeTree.
  */
class ClickHouseMiniServer(port0: Int = 0,
                           auth: Option[(String, String)] = None) {

  private val mapper = new ObjectMapper()

  private case class Column(name: String, chType: String,
                            materializedFrom: Option[String])
  private case class Table(columns: Seq[Column],
                           replacingKey: Option[Seq[String]]) {
    val rows = new ArrayBuffer[ObjectNode]()
  }

  private val databases = ConcurrentHashMap.newKeySet[String]()
  private val tables = new ConcurrentHashMap[String, Table]()
  @volatile private var failNext: Option[(Int, String)] = None

  private val server = HttpServer.create(new InetSocketAddress(port0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(null)
  server.start()

  def port: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$port"
  def close(): Unit = server.stop(0)

  /** Test hook: the next non-ping request fails with this status/body
    * (exactly-once injection — exercises the writer's error surface). */
  def failNextRequest(status: Int, body: String): Unit =
    failNext = Some((status, body))

  /** Rows currently stored in `db.table` (test inspection). */
  def tableRows(name: String): Seq[Map[String, String]] = {
    val t = tables.get(name)
    if (t == null) Seq.empty
    else t.synchronized {
      t.rows.toSeq.map(o => o.properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
    }
  }

  private def readBody(ex: HttpExchange): Array[Byte] = {
    val enc = Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
    val raw: InputStream = ex.getRequestBody
    val in = if (enc.exists(_.equalsIgnoreCase("gzip"))) new GZIPInputStream(raw) else raw
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map(_.split("&").toSeq
      .map(_.split("=", 2))
      .map(kv => java.net.URLDecoder.decode(kv(0), "UTF-8") ->
        (if (kv.length > 1) java.net.URLDecoder.decode(kv(1), "UTF-8") else ""))
      .toMap).getOrElse(Map.empty)

  private def handle(ex: HttpExchange): Unit = try {
    if (ex.getRequestURI.getPath == "/ping") { respond(ex, 200, "Ok.\n"); return }
    failNext match {
      case Some((status, body)) => failNext = None; respond(ex, status, body); return
      case None =>
    }
    val params = queryParams(ex)
    auth.foreach { case (u, p) =>
      val gu = Option(ex.getRequestHeaders.getFirst("X-ClickHouse-User"))
        .orElse(params.get("user")).getOrElse("default")
      val gp = Option(ex.getRequestHeaders.getFirst("X-ClickHouse-Key"))
        .orElse(params.get("password")).getOrElse("")
      if (gu != u || gp != p) {
        respond(ex, 403, "Code: 516. Authentication failed\n"); return
      }
    }
    val body = readBody(ex)
    // SQL lives in ?query= (body = INSERT data) or in the body itself
    val (sql, data) = params.get("query") match {
      case Some(q) => (q.trim, body)
      case None =>
        val text = new String(body, StandardCharsets.UTF_8)
        // an INSERT with inline data carries rows after FORMAT <name>\n
        val m = InsertRe.pattern.matcher(text)
        if (m.find() && m.end() < text.length)
          (text.substring(0, m.end()).trim,
            text.substring(m.end() + 1).getBytes(StandardCharsets.UTF_8))
        else (text.trim, Array.emptyByteArray)
    }
    execute(sql, data) match {
      case Right(out) => respond(ex, 200, out)
      case Left(err)  => respond(ex, 400, err + "\n")
    }
  } catch {
    case e: Throwable => respond(ex, 500, s"Code: 1000. ${e.getMessage}\n")
  }

  private val CreateDbRe = """(?is)^CREATE\s+DATABASE\s+IF\s+NOT\s+EXISTS\s+([\w.]+)\s*$""".r
  private val CreateTableRe = """(?is)^CREATE\s+TABLE\s+IF\s+NOT\s+EXISTS\s+([\w.]+)\s*\((.*)\)\s*(ENGINE\s*=.*)$""".r
  private val InsertRe = """(?is)INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\))?\s*FORMAT\s+JSONEachRow""".r
  private val SelectRe = """(?is)^SELECT\s+(.*?)\s+FROM\s+([\w.]+)\s*(FINAL)?\s*(?:FORMAT\s+JSONEachRow)?\s*$""".r
  private val ReplacingKeyRe =
    """(?is).*ReplacingMergeTree.*ORDER\s+BY\s+\(?([\w,\s]+?)\)?\s*$""".r

  /** Split a column-definition list on top-level commas only. */
  private def splitCols(s: String): Seq[String] = {
    val out = ArrayBuffer[String]()
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def execute(sql: String, data: Array[Byte]): Either[String, String] =
    sql match {
      case CreateDbRe(db) => databases.add(db); Right("")
      case CreateTableRe(name, colDefs, engine) =>
        val cols = splitCols(colDefs).map { d =>
          val toks = d.split("\\s+")
          val mat = """(?is).*MATERIALIZED\s+toDate\((\w+)\).*""".r
          d match {
            case mat(src) => Column(toks(0), toks(1), Some(src))
            case _        => Column(toks(0), toks(1), None)
          }
        }
        // ReplacingMergeTree: remember the ORDER BY key for FINAL reads
        val key = engine match {
          case ReplacingKeyRe(k) =>
            Some(k.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          case _ => None
        }
        tables.putIfAbsent(name, Table(cols, key)); Right("")
      case InsertRe(name, colList) =>
        val t = tables.get(name)
        if (t == null) Left(s"Code: 60. Table $name does not exist")
        else if ({
          // real ClickHouse refuses INSERTs naming MATERIALIZED columns
          // — enforced here so the writer path is proven against the
          // actual protocol contract, not a lenient fake
          val named = Option(colList).map(_.split(",").map(_.trim).toSet)
            .getOrElse(Set.empty)
          t.columns.exists(c => c.materializedFrom.isDefined && named(c.name))
        }) Left(s"Code: 44. Cannot insert into MATERIALIZED column")
        else {
          val lines = new String(data, StandardCharsets.UTF_8)
            .split("\n").map(_.trim).filter(_.nonEmpty)
          val parsed = lines.map(mapper.readTree(_).asInstanceOf[ObjectNode])
          t.synchronized {
            parsed.foreach { o =>
              t.columns.foreach {
                case Column(n, _, Some(src)) if o.has(src) =>
                  // MATERIALIZED toDate(x): date prefix of the DateTime
                  o.put(n, o.get(src).asText().take(10))
                case _ =>
              }
              t.rows += o
            }
          }
          Right("")
        }
      case SelectRe(sel, name, finalKw) =>
        val t = tables.get(name)
        if (t == null) Left(s"Code: 60. Table $name does not exist")
        else t.synchronized {
          // FINAL over a ReplacingMergeTree key: one row per key, last
          // inserted wins — what real ClickHouse guarantees before the
          // background merge has collapsed the duplicates
          val rows = (finalKw, t.replacingKey) match {
            case (f, Some(key)) if f != null =>
              val seen = scala.collection.mutable
                .LinkedHashMap[Seq[String], ObjectNode]()
              t.rows.foreach { r =>
                seen.put(key.map(k =>
                  if (r.has(k)) r.get(k).asText() else "NULL"), r)
              }
              seen.values.toSeq
            case _ => t.rows.toSeq
          }
          val selTrim = sel.trim
          if (selTrim.equalsIgnoreCase("count()") || selTrim.equalsIgnoreCase("count(*)")) {
            val o = mapper.createObjectNode(); o.put("count()", rows.size)
            Right(o.toString + "\n")
          } else {
            val cols =
              if (selTrim == "*") t.columns.map(_.name)
              else selTrim.split(",").map(_.trim).toSeq
            Right(rows.map { r =>
              val o = mapper.createObjectNode()
              cols.foreach(c => if (r.has(c)) { o.set[JsonNode](c, r.get(c)); () })
              o.toString
            }.mkString("", "\n", "\n"))
          }
        }
      case _ => Left(s"Code: 62. Syntax error (mini-server supports " +
        s"CREATE DATABASE/TABLE IF NOT EXISTS, INSERT ... FORMAT " +
        s"JSONEachRow, SELECT ... FORMAT JSONEachRow): $sql")
    }
}
