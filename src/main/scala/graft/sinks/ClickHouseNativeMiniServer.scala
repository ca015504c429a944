package graft.sinks

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException,
  IOException}
import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

/** In-process native-TCP-protocol counterparty — the port-9000 sibling
  * of [[ClickHouseMiniServer]] (which speaks the HTTP interface), in the
  * same role MqttMiniServer plays for EMQX: no ClickHouse ships in this
  * sandbox, so the protocol the reference's DSN names
  * (`data_dbstore.go:85`, `tcp://host:port`) is implemented here far
  * enough to exercise [[ClickHouseNativeSink]] end-to-end — hello
  * handshake with auth, Query packets with the revision-54058 client
  * info, the INSERT sample-block/data-blocks/empty-terminator dance,
  * MATERIALIZED columns computed on insert AND protocol-refused on
  * explicit insert (real ClickHouse behavior), ReplacingMergeTree key
  * tracking with `SELECT ... FINAL` dedup, Ping/Pong, and Exception
  * packets with real error codes.
  *
  * Storage is an in-memory row list per table — fidelity is to the WIRE
  * PROTOCOL and the writer's observable behavior, not to MergeTree.
  */
class ClickHouseNativeMiniServer(port0: Int = 0,
                                 auth: Option[(String, String)] = None) {
  import ClickHouseWire._

  private case class Column(name: String, chType: String,
                            materializedFrom: Option[String])
  private case class Table(columns: Seq[Column],
                           replacingKey: Option[Seq[String]]) {
    val rows = new ArrayBuffer[Map[String, Any]]()
  }

  private val databases = ConcurrentHashMap.newKeySet[String]()
  private val tables = new ConcurrentHashMap[String, Table]()
  @volatile private var failNext: Option[(Int, String)] = None
  @volatile private var closed = false

  private val server = new ServerSocket(port0)
  private val acceptThread = new Thread(() => acceptLoop(), "ch-native-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  def port: Int = server.getLocalPort
  def close(): Unit = { closed = true; server.close() }

  /** Test hook: the next query fails with this code/message (exactly-once
    * injection — exercises the writer's Exception-packet surface). */
  def failNextQuery(code: Int, message: String): Unit =
    failNext = Some((code, message))

  /** Rows currently stored in `db.table`, rendered to strings the way
    * the HTTP twin renders them (DateTime as `uuuu-MM-dd HH:mm:ss` UTC,
    * Date as ISO) — test inspection.
    */
  def tableRows(name: String): Seq[Map[String, String]] = {
    val t = tables.get(name)
    if (t == null) Seq.empty
    else t.synchronized { t.rows.toSeq.map(_.map { case (k, v) =>
      k -> render(v, t.columns.find(_.name == k).map(_.chType).getOrElse(""))
    }) }
  }

  private def render(v: Any, chType: String): String = (chType, v) match {
    case (_, null) => "NULL"
    case ("DateTime", secs: Long) =>
      java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter
          .ofPattern("uuuu-MM-dd HH:mm:ss"))
    case ("Date", days: Int) => java.time.LocalDate.ofEpochDay(days.toLong).toString
    case (_, b: Array[Byte]) => new String(b, java.nio.charset.StandardCharsets.UTF_8)
    case (_, other) => String.valueOf(other)
  }

  private def acceptLoop(): Unit =
    // `server.isClosed` in the condition (r20 advice): a server socket
    // that died for any reason other than close() would otherwise spin
    // through accept → SocketException forever with `closed` still false
    while (!closed && !server.isClosed) {
      try {
        val s = server.accept()
        val h = new Thread(() => handle(s), "ch-native-conn")
        h.setDaemon(true)
        h.start()
      } catch {
        // a transient accept failure must not silently kill the loop
        // while the server is live — tests would hang on connect
        case _: SocketException => // close() interrupts accept this way
        case _: IOException if !closed =>
          try Thread.sleep(10)
          catch { // preserve the interrupt and stop — don't die mid-loop
            case _: InterruptedException =>
              Thread.currentThread().interrupt(); return
          }
        case _: IOException => // closing
      }
    }

  private def handle(socket: Socket): Unit = {
    socket.setTcpNoDelay(true)
    val in = new BufferedInputStream(socket.getInputStream, 1 << 16)
    val out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)
    try {
      // ---- hello -----------------------------------------------------
      if (readVarint(in) != ClientHello)
        throw new IOException("expected client hello")
      readString(in) // client name
      readVarint(in); readVarint(in) // client version major/minor
      val clientRev = readVarint(in)
      readString(in) // database
      val user = readString(in)
      val password = readString(in)
      val negotiated = math.min(clientRev, Revision)
      val authOk = auth.forall { case (u, p) => user == u && password == p }
      if (!authOk) {
        writeException(out, 516, "DB::Exception",
          s"$user: Authentication failed: password is incorrect")
        out.flush(); return
      }
      writeVarint(out, ServerHello)
      writeString(out, "ClickHouse-graft-mini")
      writeVarint(out, 21L); writeVarint(out, 8L)
      writeVarint(out, Revision)
      if (negotiated >= 54058L) writeString(out, "UTC")
      out.flush()

      // ---- packet loop -------------------------------------------------
      while (true) {
        val packet =
          try readVarint(in)
          catch { case _: EOFException => return }
        packet match {
          case ClientPing =>
            writeVarint(out, ServerPong); out.flush()
          case ClientQuery =>
            readString(in) // query id
            if (negotiated >= 54032L) {
              readUInt8(in) // query kind
              readString(in); readString(in); readString(in) // initial u/q/addr
              readUInt8(in) // interface
              readString(in); readString(in); readString(in) // os/host/client
              readVarint(in); readVarint(in); readVarint(in) // version
            }
            // settings: (name, value) string pairs until the empty name
            var setting = readString(in)
            while (setting.nonEmpty) { readString(in); setting = readString(in) }
            readVarint(in) // stage
            val compression = readVarint(in)
            val sql = readString(in)
            if (compression != 0) {
              writeException(out, 432, "DB::Exception",
                "mini-server supports only uncompressed native blocks")
              out.flush()
            } else runQuery(sql, in, out)
          case other =>
            throw new IOException(s"unexpected client packet $other")
        }
      }
    } catch {
      case _: EOFException | _: SocketException => // client went away
      case e: IOException =>
        try { writeException(out, 1000, "DB::Exception",
          String.valueOf(e.getMessage)); out.flush() }
        catch { case _: IOException => }
    } finally socket.close()
  }

  /** Consume the client's external-tables terminator (blocks until the
    * empty one — our client sends exactly one empty block).
    */
  private def drainClientBlocks(in: BufferedInputStream): Unit = {
    var done = false
    while (!done) {
      readVarint(in) match {
        case ClientData =>
          readString(in)
          if (readBlock(in).rows == 0) done = true
        case other => throw new IOException(
          s"expected client data packet, got $other")
      }
    }
  }

  private val CreateDbRe =
    """(?is)^CREATE\s+DATABASE\s+IF\s+NOT\s+EXISTS\s+([\w.]+)\s*$""".r
  private val CreateTableRe =
    """(?is)^CREATE\s+TABLE\s+IF\s+NOT\s+EXISTS\s+([\w.]+)\s*\((.*)\)\s*(ENGINE\s*=.*)$""".r
  private val InsertRe =
    """(?is)^INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\))?\s*VALUES\s*$""".r
  private val SelectRe =
    """(?is)^SELECT\s+(.*?)\s+FROM\s+([\w.]+)\s*(FINAL)?\s*$""".r
  private val ReplacingKeyRe =
    """(?is).*ReplacingMergeTree.*ORDER\s+BY\s+\(?([\w,\s]+?)\)?\s*$""".r
  private val MatRe = """(?is).*MATERIALIZED\s+toDate\((\w+)\).*""".r

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

  private def runQuery(sql0: String, in: BufferedInputStream,
                       out: BufferedOutputStream): Unit = {
    val sql = sql0.trim
    failNext match {
      case Some((code, msg)) =>
        failNext = None
        // an INSERT client is waiting for the sample block; the
        // exception replaces it — the real server's pre-upload refusal
        drainTrailerIfAny(sql, in)
        writeException(out, code, "DB::Exception", msg); out.flush()
        return
      case None =>
    }
    sql match {
      case CreateDbRe(db) =>
        drainClientBlocks(in)
        databases.add(db)
        endOfStream(out)
      case CreateTableRe(name, colDefs, engine) =>
        drainClientBlocks(in)
        val cols = splitCols(colDefs).map { d =>
          val toks = d.split("\\s+")
          d match {
            case MatRe(src) => Column(toks(0), toks(1), Some(src))
            case _          => Column(toks(0), toks(1), None)
          }
        }
        val key = engine match {
          case ReplacingKeyRe(k) =>
            Some(k.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          case _ => None
        }
        tables.putIfAbsent(name, Table(cols, key))
        endOfStream(out)
      case InsertRe(name, colList) =>
        val t = tables.get(name)
        if (t == null) {
          writeException(out, 60, "DB::Exception",
            s"Table $name does not exist"); out.flush(); return
        }
        val named = Option(colList)
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(t.columns.filter(_.materializedFrom.isEmpty).map(_.name))
        if (t.columns.exists(c =>
            c.materializedFrom.isDefined && named.contains(c.name))) {
          writeException(out, 44, "DB::Exception",
            "Cannot insert column collect_date: MATERIALIZED columns " +
              "cannot be inserted"); out.flush(); return
        }
        // sample block: the named columns with the TABLE's types, 0 rows
        val sampleCols = named.map { n =>
          n -> t.columns.find(_.name == n).map(_.chType).getOrElse("String")
        }
        writeDataPacket(out,
          Block(sampleCols, sampleCols.map(_ => IndexedSeq.empty[Any])),
          clientSide = false)
        out.flush()
        // data blocks until the empty terminator
        var done = false
        while (!done) {
          readVarint(in) match {
            case ClientData =>
              readString(in)
              val b = readBlock(in)
              if (b.rows == 0) done = true
              else t.synchronized {
                val byName = b.columns.map(_._1).zip(b.data).toMap
                (0 until b.rows).foreach { r =>
                  var row = named.map(n => n -> byName.get(n).map(_(r))
                    .getOrElse(null)).toMap
                  t.columns.foreach {
                    case Column(n, _, Some(src)) => row.get(src).foreach {
                      case secs: Long => row = row.updated(n, (secs / 86400L).toInt)
                      case _ =>
                    }
                    case _ =>
                  }
                  t.rows += row
                }
              }
            case other => throw new IOException(
              s"expected INSERT data packet, got $other")
          }
        }
        endOfStream(out)
      case SelectRe(sel, name, finalKw) =>
        drainClientBlocks(in)
        val t = tables.get(name)
        if (t == null) {
          writeException(out, 60, "DB::Exception",
            s"Table $name does not exist"); out.flush(); return
        }
        t.synchronized {
          // FINAL over a ReplacingMergeTree key: one row per key, LAST
          // inserted wins — the guarantee real ClickHouse gives before
          // background merges complete
          val rows0 = t.rows.toSeq
          val rows = (finalKw, t.replacingKey) match {
            case (f, Some(key)) if f != null =>
              val seen = scala.collection.mutable.LinkedHashMap[Seq[String], Map[String, Any]]()
              rows0.foreach { r =>
                seen.put(key.map(k => render(r.getOrElse(k, null),
                  t.columns.find(_.name == k).map(_.chType).getOrElse(""))), r)
              }
              seen.values.toSeq
            case _ => rows0
          }
          val selTrim = sel.trim
          if (selTrim.equalsIgnoreCase("count()") ||
              selTrim.equalsIgnoreCase("count(*)")) {
            writeDataPacket(out, Block(Seq("count()" -> "UInt64"),
              Seq(IndexedSeq(rows.size.toLong))), clientSide = false)
          } else {
            val cols =
              if (selTrim == "*") t.columns.map(c => c.name -> c.chType)
              else selTrim.split(",").map(_.trim).toSeq.map { n =>
                n -> t.columns.find(_.name == n).map(_.chType).getOrElse("String")
              }
            val data = cols.map { case (n, _) =>
              rows.map(_.getOrElse(n, null)).toIndexedSeq
            }
            writeDataPacket(out, Block(cols, data), clientSide = false)
          }
        }
        endOfStream(out)
      case other =>
        drainClientBlocks(in)
        writeException(out, 62, "DB::Exception",
          s"Syntax error (mini-server supports CREATE DATABASE/TABLE IF " +
            s"NOT EXISTS, INSERT ... VALUES, SELECT ... [FINAL]): $other")
        out.flush()
    }
  }

  /** For a failure-injected query: a non-INSERT client has already sent
    * its external-tables terminator; consume it so the stream stays
    * framed. An INSERT client is waiting on the sample block and sends
    * nothing yet.
    */
  private def drainTrailerIfAny(sql: String, in: BufferedInputStream): Unit =
    if (!InsertRe.pattern.matcher(sql.trim).matches()) drainClientBlocks(in)

  private def endOfStream(out: BufferedOutputStream): Unit = {
    writeVarint(out, ServerEndOfStream); out.flush()
  }
}
