package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.PgWireClient

/** The native wire CLIENT under hostile/degenerate servers — the
  * mirror of PgWireFuzzSpec (which fuzzes our server with hostile
  * clients). A federated scan must fail with a clean IOException, not
  * hang a Spark task or leak the connection, when the remote end
  * misbehaves: oversized frame lengths, unknown auth codes, garbage
  * tags mid-result, connection drops mid-row.
  */
class PgWireClientSpec extends GraftSuite {

  /** One-shot scripted server: accepts a single connection, reads the
    * startup message, replies with `script`, closes. */
  private def scriptedServer(script: DataOutputStream => Unit): Int = {
    val ss = new ServerSocket(0)
    val t = new Thread(() => {
      try {
        val s = ss.accept()
        val in = new DataInputStream(s.getInputStream)
        val out = new DataOutputStream(s.getOutputStream)
        val len = in.readInt() // startup frame
        in.skipBytes(len - 4)
        script(out)
        out.flush()
        s.close()
      } catch { case _: Throwable => } finally ss.close()
    })
    t.setDaemon(true)
    t.start()
    ss.getLocalPort
  }

  private def msg(out: DataOutputStream, tag: Char, body: Array[Byte]): Unit = {
    out.writeByte(tag)
    out.writeInt(4 + body.length)
    out.write(body)
  }
  private def i32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array()

  test("unknown auth method fails cleanly, not by hanging") {
    val port = scriptedServer { out =>
      msg(out, 'R', i32(10)) // SCRAM — unsupported by design
    }
    val e = intercept[java.io.IOException](
      new PgWireClient("127.0.0.1", port, "db", "u", "p"))
    assert(e.getMessage.contains("auth"), e.getMessage)
  }

  test("server ErrorResponse during startup surfaces code and message") {
    val port = scriptedServer { out =>
      val body = new java.io.ByteArrayOutputStream()
      def field(t: Char, v: String): Unit = {
        body.write(t); body.write(v.getBytes(UTF_8)); body.write(0)
      }
      field('S', "FATAL"); field('C', "3D000")
      field('M', "database \"db\" does not exist")
      body.write(0)
      msg(out, 'E', body.toByteArray)
    }
    val e = intercept[java.io.IOException](
      new PgWireClient("127.0.0.1", port, "db", "u", "p"))
    assert(e.getMessage.contains("3D000") && e.getMessage.contains("does not exist"),
      e.getMessage)
  }

  test("oversized frame length from the server is rejected, not allocated") {
    val port = scriptedServer { out =>
      msg(out, 'R', i32(0)) // AuthenticationOk
      out.writeByte('Z'); out.writeInt(Int.MaxValue) // hostile length
    }
    // the shared frame reader (PgWire.readMessage) validates claimed
    // lengths before allocating — same guard the server side uses
    val e = intercept[Exception] {
      val c = new PgWireClient("127.0.0.1", port, "db", "u", "p")
      c.close()
    }
    assert(!e.isInstanceOf[OutOfMemoryError])
  }

  test("garbage tag mid-result fails the fetch with a clear error") {
    val port = scriptedServer { out =>
      msg(out, 'R', i32(0))
      msg(out, 'Z', Array('I'.toByte))
      // response to the query: one valid-looking tag the client must
      // reject mid-query ('G' CopyInResponse is never expected here)
      msg(out, 'G', Array[Byte](0, 0, 0))
    }
    val c = new PgWireClient("127.0.0.1", port, "db", "u", "p")
    try {
      c.execute("SELECT 1")
      val e = intercept[java.io.IOException](c.fetchRow())
      assert(e.getMessage.contains("unexpected"), e.getMessage)
    } finally c.close()
  }

  test("connection drop mid-result is an IOException, not a hang or a partial row") {
    val port = scriptedServer { out =>
      msg(out, 'R', i32(0))
      msg(out, 'Z', Array('I'.toByte))
      // RowDescription for one int8 column, then HALF a DataRow
      val rd = new java.io.ByteArrayOutputStream()
      rd.write(Array[Byte](0, 1)) // 1 field
      rd.write("id".getBytes(UTF_8)); rd.write(0)
      rd.write(i32(0)); rd.write(Array[Byte](0, 0)) // table oid, attnum
      rd.write(i32(20)) // int8
      rd.write(Array[Byte](-1, -1)); rd.write(i32(-1)); rd.write(Array[Byte](0, 0))
      msg(out, 'T', rd.toByteArray)
      out.writeByte('D'); out.writeInt(100) // promises 96 body bytes...
      out.write(Array[Byte](0, 1))          // ...delivers 2, then the
      // scripted server closes the socket (mid-frame disconnect)
    }
    val c = new PgWireClient("127.0.0.1", port, "db", "u", "p")
    try {
      c.execute("SELECT id FROM t")
      intercept[java.io.IOException](
        // EOFException extends IOException: truncated frame, not a hang
        while (c.fetchRow() != null) {})
    } finally c.close()
  }
}
