package graft.server

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

import graft.pg.{PgCompat, Prepared}
import graft.spatial.SpatialFunctions

/** PostgreSQL wire-protocol front end (reference A40-A42:
  * src/server/src/postgres/server.rs, auth.rs, handler.rs): a TCP
  * accept loop, one handler thread per connection, translating SQL text
  * to `spark.sql` and streaming results back as PG text rows.
  *
  * Protocol surface mirrored from the reference:
  * - startup: optional SSLRequest (declined with 'N'), MD5 password
  *   auth when a password is configured (user must be "postgres",
  *   password from GRAFT_PG_PASSWORD — auth.rs:17-18,52,60-110),
  *   trust otherwise; server params server_version/UTF8/ISO,MDY/
  *   integer_datetimes (auth.rs:91-97).
  * - simple query 'Q' with a 1024-row fetch cap (DEFAULT_ROW_LIMIT,
  *   handler.rs:21).
  * - extended protocol: Parse/Bind/Describe/Execute/Sync with $n
  *   parameters bound through [[Prepared]] (handler.rs:78-213).
  * - transaction keywords and SET handled by the parser shims.
  */
final class PgServer(spark: SparkSession, port: Int = 5432,
    password: Option[String] = sys.env.get("GRAFT_PG_PASSWORD")) {

  private val RowLimit = 1024 // reference DEFAULT_ROW_LIMIT
  @volatile private var server: ServerSocket = _
  private val running = new AtomicBoolean(false)

  def start(): Int = {
    PgCompat.registerAll(spark)
    SpatialFunctions.registerAll(spark)
    server = new ServerSocket(port)
    running.set(true)
    val t = new Thread(() => acceptLoop(), "pg-accept")
    t.setDaemon(true)
    t.start()
    server.getLocalPort
  }

  def stop(): Unit = {
    running.set(false)
    if (server != null) server.close()
  }

  private def acceptLoop(): Unit =
    while (running.get()) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), s"pg-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable if !running.get() => /* closing */ }
    }

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val rawOut = new DataOutputStream(sock.getOutputStream)
    val out = new PgWire.Out(rawOut)
    try {
      var (code, params) = PgWire.readStartup(in)
      if (code == 80877103) { // SSLRequest -> decline, client retries plain
        rawOut.writeByte('N'); rawOut.flush()
        val again = PgWire.readStartup(in)
        code = again._1; params = again._2
      }
      if (code == 80877102) return // CancelRequest: ignore
      val user = params.getOrElse("user", "")
      if (!authenticate(in, out, user)) return

      out.parameterStatus("server_version", "10.0")
      out.parameterStatus("client_encoding", "UTF8")
      out.parameterStatus("DateStyle", "ISO, YMD")
      out.parameterStatus("integer_datetimes", "on")
      out.backendKeyData(pid = sock.getPort, secret = 0)
      out.readyForQuery()
      out.flush()

      // extended-protocol session state: prepared statements + portals
      val statements = mutable.Map[String, String]()
      val portals = mutable.Map[String, (String, Seq[Any])]()

      var open = true
      while (open) {
        val m = try PgWire.readMessage(in) catch { case _: EOFException => return }
        m.tag match {
          case 'Q' =>
            val sql = PgWire.cstrings(m.body).headOption.getOrElse("").trim
            if (sql.isEmpty) out.emptyQueryResponse()
            else runQuery(out, sql, Nil, describeOnly = false)
            out.readyForQuery(); out.flush()
          case 'P' => // Parse: name, query, param type oids
            val parts = PgWire.cstrings(m.body)
            statements(parts.head) = parts(1)
            out.parseComplete()
          case 'B' => // Bind: portal, stmt, formats+params (text assumed)
            val (portal, stmt, args) = parseBind(m.body)
            portals(portal) = (statements.getOrElse(stmt, ""), args)
            out.bindComplete()
          case 'D' => // Describe portal/statement
            val kind = m.body(0).toChar
            val name = new String(m.body, 1, m.body.length - 2, UTF_8)
            val sql = if (kind == 'S') statements.getOrElse(name, "")
              else portals.get(name).map(_._1).getOrElse("")
            if (sql.isEmpty) out.noData()
            else describe(out, sql, kind == 'S')
          case 'E' => // Execute portal
            val name = PgWire.cstrings(m.body).head
            portals.get(name) match {
              case Some((sql, args)) if sql.nonEmpty =>
                runQuery(out, sql, args, describeOnly = false, withDescription = false)
              case _ => out.emptyQueryResponse()
            }
          case 'S' => out.readyForQuery(); out.flush()
          case 'C' => // Close
            val kind = m.body(0).toChar
            val name = new String(m.body, 1, m.body.length - 2, UTF_8)
            if (kind == 'S') statements.remove(name) else portals.remove(name)
            out.msg('3')(_ => ()) // CloseComplete
          case 'X' => open = false
          case _   => // Flush('H') and others: just flush
            out.flush()
        }
      }
    } catch {
      case NonFatal(e) =>
        try {
          out.errorResponse("XX000", String.valueOf(e.getMessage))
          out.readyForQuery(); out.flush()
        } catch { case _: Throwable => }
    } finally sock.close()
  }

  private def authenticate(in: DataInputStream, out: PgWire.Out, user: String): Boolean =
    password match {
      case None => out.authenticationOk(); true
      case Some(pass) =>
        if (user != "postgres") { // reference auth.rs:52: fixed user
          out.errorResponse("28000", s"""role "$user" does not exist""")
          out.flush(); return false
        }
        val salt = Array[Byte](0x12, 0x34, 0x56, 0x78)
        out.authenticationMd5(salt); out.flush()
        val m = PgWire.readMessage(in)
        val given = PgWire.cstrings(m.body).head
        val expect = md5Password(user, pass, salt)
        if (given == expect) { out.authenticationOk(); true }
        else {
          out.errorResponse("28P01", s"""password authentication failed for user "$user"""")
          out.flush(); false
        }
    }

  /** PG MD5 scheme: "md5" + md5(md5(password + user) + salt). */
  private def md5Password(user: String, pass: String, salt: Array[Byte]): String = {
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    val md = MessageDigest.getInstance("MD5")
    val inner = hex(md.digest((pass + user).getBytes(UTF_8)))
    md.reset()
    md.update(inner.getBytes(UTF_8)); md.update(salt)
    "md5" + hex(md.digest())
  }

  private def parseBind(body: Array[Byte]): (String, String, Seq[Any]) = {
    val buf = java.nio.ByteBuffer.wrap(body)
    def cstr(): String = {
      val sb = new StringBuilder
      var b = buf.get()
      while (b != 0) { sb += b.toChar; b = buf.get() }
      sb.toString
    }
    val portal = cstr()
    val stmt = cstr()
    val nFormats = buf.getShort
    val formats = Seq.fill(nFormats.toInt)(buf.getShort)
    val nParams = buf.getShort
    val args = (0 until nParams).map { i =>
      val len = buf.getInt
      if (len < 0) null
      else {
        val b = new Array[Byte](len)
        buf.get(b)
        val fmt = if (formats.isEmpty) 0 else formats(i % formats.size)
        if (fmt == 0) new String(b, UTF_8) else b
      }
    }
    (portal, stmt, args)
  }

  private def describe(out: PgWire.Out, sql: String, isStatement: Boolean): Unit =
    try {
      if (isStatement) {
        val n = "\\$(\\d+)".r.findAllMatchIn(sql).map(_.group(1).toInt).maxOption.getOrElse(0)
        out.parameterDescription(Seq.fill(n)(1043)) // untyped -> varchar
      }
      val schema = spark.sql(Prepared.rewrite(sql).replaceAll(":p\\d+", "NULL")).schema
      if (schema.isEmpty) out.noData()
      else out.rowDescription(schema.fields.toSeq.map(f => (f.name, PgWire.pgOid(f.dataType))))
    } catch { case NonFatal(_) => out.noData() }

  private def runQuery(out: PgWire.Out, sql: String, args: Seq[Any],
      describeOnly: Boolean, withDescription: Boolean = true): Unit =
    try {
      val df = if (args.isEmpty) spark.sql(sql) else Prepared.execute(spark, sql, args)
      val schema = df.schema
      if (schema.isEmpty) { // commands (SET, BEGIN, DDL): no result set
        df.collect()
        out.commandComplete(commandTag(sql, 0))
      } else {
        if (withDescription)
          out.rowDescription(schema.fields.toSeq.map(f => (f.name, PgWire.pgOid(f.dataType))))
        var n = 0
        val it = df.limit(RowLimit).toLocalIterator()
        while (it.hasNext) {
          val row = it.next()
          out.dataRow((0 until row.length).map(i => PgWire.encodeValue(row.get(i))))
          n += 1
        }
        out.commandComplete(commandTag(sql, n))
      }
    } catch {
      case NonFatal(e) =>
        out.errorResponse("42601", String.valueOf(e.getMessage).take(800))
    }

  private def commandTag(sql: String, rows: Int): String = {
    val head = sql.trim.split("\\s+").headOption.getOrElse("").toUpperCase
    head match {
      case "SELECT" | "" => s"SELECT $rows"
      case "INSERT"      => s"INSERT 0 $rows"
      case other         => other
    }
  }
}
