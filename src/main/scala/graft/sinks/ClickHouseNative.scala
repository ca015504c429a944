package graft.sinks

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException,
  IOException, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The ClickHouse NATIVE TCP wire protocol (port 9000) — the interface
  * the reference's DSN actually names (`/root/reference/data_dbstore.go:85`:
  * `tcp://host:port?username=...&compress=true`, driven by clickhouse-go's
  * prepared-statement batches, `:336-421`). The HTTP sink beside this one
  * ([[ClickHouseHttpSink]]) is a real ClickHouse interface too, but the
  * shipped INIs say `scheme = tcp`, and closing that last parity gap means
  * speaking the native protocol itself.
  *
  * Everything here is implemented from the PUBLIC protocol description —
  * the official native-protocol docs (clickhouse.com/docs/en/native-protocol:
  * basics/client/server/columns pages) and the constants in ClickHouse's
  * own `src/Core/ProtocolDefines.h` — not from any driver's code.
  *
  * Protocol shape (uncompressed framing):
  *  - varint-length-prefixed UTF-8 strings, ULEB128 varints, little-endian
  *    fixed-width numbers;
  *  - client packets Hello=0 / Query=1 / Data=2 / Cancel=3 / Ping=4,
  *    server packets Hello=0 / Data=1 / Exception=2 / Progress=3 / Pong=4 /
  *    EndOfStream=5 / ProfileInfo=6 / Totals=7 / Extremes=8;
  *  - a Data packet is a (temporary-)table name + one column-oriented
  *    block: block-info field list, #columns, #rows, then per column
  *    (name, type name, raw values with no per-value framing);
  *  - an INSERT runs as: client Query -> server sample Data block (the
  *    table structure) -> client Data blocks -> client empty block ->
  *    server EndOfStream. Any other statement: client Query -> client
  *    empty block (the external-tables terminator) -> server Data*
  *    -> EndOfStream.
  *
  * We speak protocol revision 54058: new enough to carry the client-info
  * section (>= 54032) and the server timezone (>= 54058), old enough that
  * no quota key (54060), version patch (54401), settings-as-strings
  * (54429) or interserver secret (54441) fields enter the layout — real
  * servers negotiate `min(client, server)` revision, so this pins one
  * fixed, documented wire shape.
  *
  * Compression: the protocol's optional block compression is checksummed
  * LZ4 with CityHash128 — neither is available in this dependency-frozen
  * build, so the Query packet declines compression (compression = 0, a
  * first-class protocol option every server accepts). The DSN's
  * `compress=true` is honored on the HTTP interface (gzip bodies); here
  * it is recorded and declined, loudly documented rather than silently
  * half-implemented.
  */
object ClickHouseWire {

  val Revision = 54058L

  // client packet ids
  val ClientHello = 0L
  val ClientQuery = 1L
  val ClientData = 2L
  val ClientPing = 4L

  // server packet ids
  val ServerHello = 0L
  val ServerData = 1L
  val ServerException = 2L
  val ServerProgress = 3L
  val ServerPong = 4L
  val ServerEndOfStream = 5L
  val ServerProfileInfo = 6L
  val ServerTotals = 7L
  val ServerExtremes = 8L

  // ---- primitive IO --------------------------------------------------

  def writeVarint(out: OutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  def readVarint(in: InputStream): Long = {
    var v = 0L; var shift = 0
    while (true) {
      val b = in.read()
      if (b < 0) throw new EOFException("ClickHouse native: stream closed")
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return v
      shift += 7
      if (shift > 63) throw new IOException("varint too long")
    }
    v
  }

  def writeString(out: OutputStream, s: String): Unit =
    writeBytes(out, s.getBytes(StandardCharsets.UTF_8))

  def writeBytes(out: OutputStream, b: Array[Byte]): Unit = {
    writeVarint(out, b.length.toLong); out.write(b)
  }

  def readString(in: InputStream): String =
    new String(readBytesExact(in, readVarint(in).toInt), StandardCharsets.UTF_8)

  def readBytesExact(in: InputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(b, off, n - off)
      if (r < 0) throw new EOFException("ClickHouse native: stream closed")
      off += r
    }
    b
  }

  def writeUInt8(out: OutputStream, v: Int): Unit = out.write(v & 0xff)
  def readUInt8(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException("ClickHouse native: stream closed")
    b
  }

  def writeInt32LE(out: OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  def readInt32LE(in: InputStream): Int = {
    val b = readBytesExact(in, 4)
    (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) |
      ((b(3) & 0xff) << 24)
  }

  def writeInt64LE(out: OutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }
  def readInt64LE(in: InputStream): Long = {
    val b = readBytesExact(in, 8)
    var v = 0L; var i = 0
    while (i < 8) { v |= (b(i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  def writeInt16LE(out: OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  def readInt16LE(in: InputStream): Int = {
    val b = readBytesExact(in, 2)
    (b(0) & 0xff) | ((b(1) & 0xff) << 8)
  }

  // ---- blocks ----------------------------------------------------------

  /** One column-oriented block: parallel (name, ClickHouse type name)
    * headers and per-column value vectors. Values are the wire-level
    * representations: String/Array[Byte] for String, Long epoch-seconds
    * for DateTime, Int epoch-days for Date, Long/Int/Double/Boolean for
    * the numeric types, null for Nullable slots.
    */
  final case class Block(columns: Seq[(String, String)],
                         data: Seq[IndexedSeq[Any]]) {
    def rows: Int = if (data.isEmpty) 0 else data.head.size
  }
  val EmptyBlock: Block = Block(Seq.empty, Seq.empty)

  /** Data packet: packet id + temporary-table name + block. */
  def writeDataPacket(out: OutputStream, block: Block,
                      clientSide: Boolean): Unit = {
    writeVarint(out, if (clientSide) ClientData else ServerData)
    writeString(out, "") // temporary table name (none)
    writeBlock(out, block)
  }

  def writeBlock(out: OutputStream, block: Block): Unit = {
    // BlockInfo: (field 1) is_overflows, (field 2) bucket_num, 0 = end
    writeVarint(out, 1); writeUInt8(out, 0)
    writeVarint(out, 2); writeInt32LE(out, -1)
    writeVarint(out, 0)
    writeVarint(out, block.columns.size.toLong)
    writeVarint(out, block.rows.toLong)
    block.columns.zip(block.data).foreach { case ((name, chType), values) =>
      writeString(out, name)
      writeString(out, chType)
      writeColumn(out, chType, values)
    }
  }

  def readBlock(in: InputStream): Block = {
    // BlockInfo field list (numbered fields until 0)
    var field = readVarint(in)
    while (field != 0) {
      field match {
        case 1 => readUInt8(in)
        case 2 => readInt32LE(in)
        case other => throw new IOException(s"unknown BlockInfo field $other")
      }
      field = readVarint(in)
    }
    val nCols = readVarint(in).toInt
    val nRows = readVarint(in).toInt
    val cols = Vector.newBuilder[(String, String)]
    val data = Vector.newBuilder[IndexedSeq[Any]]
    var i = 0
    while (i < nCols) {
      val name = readString(in)
      val chType = readString(in)
      cols += (name -> chType)
      data += readColumn(in, chType, nRows)
      i += 1
    }
    Block(cols.result(), data.result())
  }

  private val NullableRe = """Nullable\((.+)\)""".r

  def writeColumn(out: OutputStream, chType: String,
                  values: IndexedSeq[Any]): Unit = chType match {
    case NullableRe(inner) =>
      values.foreach(v => writeUInt8(out, if (v == null) 1 else 0))
      // nulls still carry a default-valued slot in the inner stream
      writeColumn(out, inner, values.map(v => if (v == null) defaultOf(inner) else v))
    case "String" => values.foreach {
      case s: String => writeBytes(out, s.getBytes(StandardCharsets.UTF_8))
      case b: Array[Byte] => writeBytes(out, b) // String columns are byte-safe
      case other => writeBytes(out, String.valueOf(other)
        .getBytes(StandardCharsets.UTF_8))
    }
    // zoned variants — DateTime('UTC') etc. — share the epoch-seconds
    // wire encoding; the zone only affects server-side rendering
    case dt if dt == "DateTime" || dt.startsWith("DateTime(") =>
      values.foreach(v => writeInt32LE(out, anyToLong(v).toInt))
    case "Date" => values.foreach(v => writeInt16LE(out, anyToLong(v).toInt))
    case "Int64" | "UInt64" => values.foreach(v => writeInt64LE(out, anyToLong(v)))
    case "Int32" | "UInt32" => values.foreach(v => writeInt32LE(out, anyToLong(v).toInt))
    case "Int16" | "UInt16" => values.foreach(v => writeInt16LE(out, anyToLong(v).toInt))
    case "Int8" | "UInt8" | "Bool" => values.foreach {
      case b: Boolean => writeUInt8(out, if (b) 1 else 0)
      case v => writeUInt8(out, anyToLong(v).toInt)
    }
    case "Float64" => values.foreach(v =>
      writeInt64LE(out, java.lang.Double.doubleToLongBits(anyToDouble(v))))
    case "Float32" => values.foreach(v =>
      writeInt32LE(out, java.lang.Float.floatToIntBits(anyToDouble(v).toFloat)))
    case other => throw new IOException(
      s"unsupported ClickHouse column type on the wire: $other")
  }

  def readColumn(in: InputStream, chType: String,
                 nRows: Int): IndexedSeq[Any] = chType match {
    case NullableRe(inner) =>
      val mask = (0 until nRows).map(_ => readUInt8(in) != 0)
      val vals = readColumn(in, inner, nRows)
      mask.zip(vals).map { case (isNull, v) => if (isNull) null else v }
    // String columns are BYTE vectors in ClickHouse — decode to raw
    // bytes, not a UTF-8 String, so binary payloads round-trip
    // losslessly (use [[asString]] where text is wanted)
    case "String" => (0 until nRows).map(_ =>
      readBytesExact(in, readVarint(in).toInt))
    case dt if dt == "DateTime" || dt.startsWith("DateTime(") =>
      (0 until nRows).map(_ => readInt32LE(in).toLong & 0xffffffffL)
    case "Date" => (0 until nRows).map(_ => readInt16LE(in))
    case "Int64" | "UInt64" => (0 until nRows).map(_ => readInt64LE(in))
    case "Int32" => (0 until nRows).map(_ => readInt32LE(in))
    // unsigned widths decode into the next-wider signed type; signed
    // widths sign-extend — without this a Short of -32768 would read
    // back as 32768
    case "UInt32" => (0 until nRows).map(_ => readInt32LE(in).toLong & 0xffffffffL)
    case "Int16" => (0 until nRows).map(_ => readInt16LE(in).toShort.toInt)
    case "UInt16" => (0 until nRows).map(_ => readInt16LE(in))
    case "Int8" => (0 until nRows).map(_ => readUInt8(in).toByte.toInt)
    case "UInt8" => (0 until nRows).map(_ => readUInt8(in))
    case "Bool" => (0 until nRows).map(_ => readUInt8(in) != 0)
    case "Float64" => (0 until nRows).map(_ =>
      java.lang.Double.longBitsToDouble(readInt64LE(in)))
    case "Float32" => (0 until nRows).map(_ =>
      java.lang.Float.intBitsToFloat(readInt32LE(in)))
    case other => throw new IOException(
      s"unsupported ClickHouse column type on the wire: $other")
  }

  /** Text view of a wire value (String columns decode to raw bytes). */
  def asString(v: Any): String = v match {
    case null => null
    case b: Array[Byte] => new String(b, StandardCharsets.UTF_8)
    case other => String.valueOf(other)
  }

  /** Re-type an outgoing INSERT block to the server's sample-block
    * column types (see [[ClickHouseNativeClient.insert]]): per column
    * matched by name, adopt the server's type when it differs from the
    * client's only by Nullable(...) wrapping. Stripping the wrapper
    * substitutes the inner type's default for null slots; anything else
    * is left for the server to accept or reject under its own rules.
    */
  def adaptToSample(block: Block, sample: Block): Block = {
    if (sample.columns.isEmpty) return block
    def strip(t: String): String = t match {
      case NullableRe(inner) => inner
      case other => other
    }
    val serverType = sample.columns.toMap
    val adapted = block.columns.zip(block.data).map { case ((name, t), vals) =>
      serverType.get(name) match {
        case Some(st) if st != t && strip(st) == strip(t) =>
          val values =
            if (st == strip(st)) // server column is non-nullable
              vals.map(v => if (v == null) defaultOf(st) else v)
            else vals
          ((name, st), values)
        case _ => ((name, t), vals)
      }
    }
    Block(adapted.map(_._1), adapted.map(_._2))
  }

  private def defaultOf(chType: String): Any = chType match {
    case "String" => ""
    case "Float64" | "Float32" => 0.0
    case "Bool" => false
    case _ => 0L
  }

  private def anyToLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case b: Boolean => if (b) 1L else 0L
    case other => throw new IOException(s"not an integral value: $other")
  }

  private def anyToDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case other => throw new IOException(s"not a numeric value: $other")
  }

  /** Exception packet body (server side sends, client side throws). */
  def writeException(out: OutputStream, code: Int, name: String,
                     message: String): Unit = {
    writeVarint(out, ServerException)
    writeInt32LE(out, code)
    writeString(out, name)
    writeString(out, message)
    writeString(out, "") // stack trace
    writeUInt8(out, 0)   // no nested exception
  }

  def readExceptionAndThrow(in: InputStream): Nothing = {
    val code = readInt32LE(in)
    val name = readString(in)
    val message = readString(in)
    readString(in) // stack trace
    val nested = readUInt8(in)
    if (nested != 0) try readExceptionAndThrow(in) catch { case _: IOException => }
    throw new IOException(s"ClickHouse native Code: $code. $name: $message")
  }
}

/** One native-protocol connection: hello handshake at construction,
  * then `execute` (DDL / any row-less statement), `insert` (block
  * upload), and `query` (block read-back). NOT thread-safe — one
  * connection per partition writer, exactly like a pooled driver
  * connection.
  */
final class ClickHouseNativeClient(host: String, port: Int,
                                   database: String = "default",
                                   user: String = "default",
                                   password: String = "",
                                   connectTimeoutMs: Int = 10000,
                                   readTimeoutMs: Int = 60000) extends AutoCloseable {
  import ClickHouseWire._

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
  socket.setSoTimeout(readTimeoutMs)
  socket.setTcpNoDelay(true)
  private val out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)
  private val in = new BufferedInputStream(socket.getInputStream, 1 << 16)

  /** Negotiated revision = min(ours, server's); fixed 54058 here. */
  val (serverName: String, serverRevision: Long) = {
    writeVarint(out, ClientHello)
    writeString(out, "graft-pump")
    writeVarint(out, 0L) // version major
    writeVarint(out, 1L) // version minor
    writeVarint(out, Revision)
    writeString(out, database)
    writeString(out, user)
    writeString(out, password)
    out.flush()
    readVarint(in) match {
      case ServerHello =>
        val name = readString(in)
        readVarint(in); readVarint(in) // server major, minor
        val rev = readVarint(in)
        if (math.min(rev, Revision) >= 54058L) readString(in) // server timezone
        (name, rev)
      case ServerException => readExceptionAndThrow(in)
      case other => throw new IOException(
        s"unexpected packet $other in place of server hello")
    }
  }

  private var queryCounter = 0

  private def sendQuery(sql: String): Unit = {
    queryCounter += 1
    writeVarint(out, ClientQuery)
    writeString(out, s"graft-$queryCounter") // query id
    // client info (revision >= 54032)
    writeUInt8(out, 1) // query kind = initial query
    writeString(out, "") // initial user
    writeString(out, "") // initial query id
    writeString(out, "0.0.0.0:0") // initial address
    writeUInt8(out, 1) // interface = TCP
    writeString(out, System.getProperty("user.name", "graft"))
    writeString(out, "localhost")
    writeString(out, "graft-pump")
    writeVarint(out, 0L); writeVarint(out, 1L); writeVarint(out, Revision)
    writeString(out, "") // settings: empty list terminator
    writeVarint(out, 2L) // stage = complete
    writeVarint(out, 0L) // compression DISABLED (see ClickHouseWire scaladoc)
    writeString(out, sql)
  }

  /** Read server packets until EndOfStream, collecting Data blocks.
    * Progress/ProfileInfo/Totals/Extremes are consumed and dropped;
    * Exception throws with the server's code and text.
    */
  private def drainUntilEndOfStream(): Seq[Block] = {
    val blocks = Seq.newBuilder[Block]
    while (true) {
      readVarint(in) match {
        case ServerData =>
          readString(in) // table name
          val b = readBlock(in)
          if (b.rows > 0) blocks += b
        case ServerTotals | ServerExtremes =>
          readString(in); readBlock(in)
        case ServerException => readExceptionAndThrow(in)
        case ServerProgress =>
          readVarint(in); readVarint(in); readVarint(in) // rows, bytes, total
        case ServerProfileInfo =>
          readVarint(in); readVarint(in); readVarint(in)
          readUInt8(in); readVarint(in); readUInt8(in)
        case ServerEndOfStream => return blocks.result()
        case other => throw new IOException(s"unexpected server packet $other")
      }
    }
    blocks.result()
  }

  /** DDL / any statement that returns no data and uploads none. */
  def execute(sql: String): Unit = {
    sendQuery(sql)
    writeDataPacket(out, EmptyBlock, clientSide = true) // external-tables end
    out.flush()
    drainUntilEndOfStream()
    ()
  }

  /** SELECT read-back: returns the concatenated result blocks. */
  def query(sql: String): Seq[Block] = {
    sendQuery(sql)
    writeDataPacket(out, EmptyBlock, clientSide = true)
    out.flush()
    drainUntilEndOfStream()
  }

  /** INSERT: send the query, receive the server's sample block (the
    * table structure — the protocol's signal to start uploading), send
    * the data block re-typed to the SERVER's declared column types,
    * plus the empty terminator, await EndOfStream.
    *
    * The re-typing is why the protocol sends the sample block at all:
    * the client's Spark-derived types wrap nullable fields in
    * Nullable(...), but the table's DDL may declare the column
    * non-nullable — a real server rejects a Nullable column carrying
    * NULLs into a non-Nullable slot ("cannot insert NULL"). Per column
    * (matched by name) the sample's type is adopted when the two
    * differ only by the Nullable(...) wrapper; stripping it substitutes
    * the inner type's default for null slots (the standard client-side
    * choice), adding it is value-preserving. A genuinely different base
    * type keeps the client's encoding so the server rejects it LOUDLY
    * instead of this client silently re-interpreting bytes.
    */
  def insert(sql: String, block: Block): Unit = {
    sendQuery(sql)
    out.flush()
    // await the sample block (Progress packets may precede it)
    var sample: Block = EmptyBlock
    var sampled = false
    while (!sampled) {
      readVarint(in) match {
        case ServerData =>
          readString(in); sample = readBlock(in); sampled = true
        case ServerProgress => readVarint(in); readVarint(in); readVarint(in)
        case ServerException => readExceptionAndThrow(in)
        case other => throw new IOException(
          s"unexpected server packet $other before INSERT sample block")
      }
    }
    writeDataPacket(out, ClickHouseWire.adaptToSample(block, sample),
      clientSide = true)
    writeDataPacket(out, EmptyBlock, clientSide = true)
    out.flush()
    drainUntilEndOfStream()
    ()
  }

  def ping(): Boolean = {
    writeVarint(out, ClientPing); out.flush()
    var r = readVarint(in)
    while (r == ServerProgress) {
      readVarint(in); readVarint(in); readVarint(in); r = readVarint(in)
    }
    r == ServerPong
  }

  override def close(): Unit = {
    try out.flush() catch { case _: IOException => }
    socket.close()
  }
}

/** The native-protocol form of the live K4/K5 sink — same distributed
  * shape as [[ClickHouseHttpSink]] (`foreachPartition`: every executor
  * drives its own connection, no driver funnel; chunked `batchSize`-row
  * blocks per INSERT), but over port 9000 with column-oriented binary
  * blocks, so the shipped INI's `scheme = tcp` (`pump-plus-emqx-example
  * .ini:25`) works verbatim.
  */
object ClickHouseNativeSink {

  final case class Endpoint(host: String, port: Int,
                            user: String = "default", password: String = "",
                            database: String = "default") extends Serializable

  /** Spark type -> ClickHouse wire type for the insert block. */
  private[sinks] def chTypeOf(f: StructField): String = {
    val base = f.dataType match {
      case StringType => "String"
      case BinaryType => "String" // native String columns are byte-safe
      case LongType => "Int64"
      case IntegerType => "Int32"
      case ShortType => "Int16"
      case ByteType => "Int8"
      case DoubleType => "Float64"
      case FloatType => "Float32"
      case BooleanType => "Bool"
      case TimestampType => "DateTime"
      case DateType => "Date"
      case other => throw new IllegalArgumentException(
        s"unsupported ClickHouse native sink type $other for ${f.name}")
    }
    // DateTime/Date columns in the reference DDL are non-nullable; the
    // writer frames preserve that. Everything else rides Nullable when
    // the Spark schema allows nulls.
    if (f.nullable && base != "DateTime" && base != "Date")
      s"Nullable($base)" else base
  }

  /** Row value -> wire value (see [[ClickHouseWire.Block]] docs).
    * Timestamps become epoch SECONDS — an instant, so the executor
    * JVM's default zone can never shift them (the HTTP sink needs an
    * explicit UTC pin for the same guarantee; binary gets it free).
    */
  private def wireValue(r: Row, i: Int, dt: DataType): Any =
    if (r.isNullAt(i)) null
    else dt match {
      case TimestampType => r.getTimestamp(i).getTime / 1000L
      case DateType => r.getDate(i).toLocalDate.toEpochDay.toInt
      case _ => r.get(i)
    }

  def ensureTables(ep: Endpoint, db: String, rawTable: String,
                   adapterTable: String,
                   inf: graft.engine.JsonInference.Inferred): Unit = {
    val c = new ClickHouseNativeClient(ep.host, ep.port, ep.database,
      ep.user, ep.password)
    try {
      c.execute(ClickHouseDdl.createDatabase(db))
      c.execute(ClickHouseDdl.createRawTableReplacing(db, rawTable))
      c.execute(ClickHouseDdl.createAdapterTableReplacing(db, adapterTable, inf))
    } finally c.close()
  }

  /** Append a DataFrame to `table`: per partition, one connection and
    * one INSERT per `batchSize`-row block. Insert failures THROW (the
    * foreachBatch retry surface), same contract as the HTTP sink.
    */
  def appendBatch(df: DataFrame, ep: Endpoint, table: String,
                  batchSize: Int = 10000): Unit = {
    val schema = df.schema
    val names = schema.fieldNames.toSeq
    val chTypes = schema.fields.map(chTypeOf).toSeq
    val insertSql = s"INSERT INTO $table (${names.mkString(", ")}) VALUES"
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val client = new ClickHouseNativeClient(ep.host, ep.port,
          ep.database, ep.user, ep.password)
        try rows.grouped(batchSize).foreach { chunk =>
          val cols = schema.fields.indices.map { i =>
            val dt = schema.fields(i).dataType
            chunk.map(r => wireValue(r, i, dt)).toIndexedSeq
          }
          client.insert(insertSql,
            ClickHouseWire.Block(names.zip(chTypes).toIndexedSeq, cols))
        } finally client.close()
      }
    }
  }

  /** foreachBatch-shaped dual writer — parity with
    * [[ClickHouseHttpSink.dualWriter]].
    */
  def dualWriter(ep: Endpoint, rawTable: String, adapterTable: String,
                 batchSize: Int = 10000)(
      raw: DataFrame, adapter: DataFrame): Unit = {
    appendBatch(raw, ep, rawTable, batchSize)
    appendBatch(adapter, ep, adapterTable, batchSize)
  }
}
