package graft.kv

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** RESP2 wire protocol — the Redis/Valkey serialization protocol (public
  * spec; the reference's valkey connector speaks it through the `valkey`
  * client library, `connectors/valkey/_ValkeyConnector.py:85-110`). Five
  * frame kinds: simple string `+`, error `-`, integer `:`, bulk string `$`
  * (length-prefixed, binary-safe), array `*`. Commands go client→server as
  * arrays of bulk strings.
  */
object Resp {

  sealed trait Reply
  final case class Simple(s: String) extends Reply
  final case class Err(msg: String) extends Reply
  final case class Num(n: Long) extends Reply
  /** `None` is the nil bulk (`$-1`). */
  final case class Bulk(v: Option[String]) extends Reply
  final case class Arr(items: Option[Seq[Reply]]) extends Reply

  private val CRLF = "\r\n".getBytes(UTF_8)

  /** Encode one command (array of bulk strings). Binary-safe: payloads are
    * length-prefixed, so members containing CRLF or any unicode survive. */
  def encode(args: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    out.write(s"*${args.size}".getBytes(UTF_8)); out.write(CRLF)
    args.foreach { a =>
      val b = a.getBytes(UTF_8)
      out.write(s"$$${b.length}".getBytes(UTF_8)); out.write(CRLF)
      out.write(b); out.write(CRLF)
    }
    out.toByteArray
  }

  private def readLine(in: InputStream): String = {
    val sb = new java.io.ByteArrayOutputStream(32)
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new EOFException("connection closed mid-reply")
      sb.write(c); c = in.read()
    }
    if (in.read() != '\n') throw new java.io.IOException("malformed RESP line end")
    new String(sb.toByteArray, UTF_8)
  }

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException("connection closed mid-bulk")
      off += r
    }
    buf
  }

  /** Parse one reply frame. */
  def readReply(in: InputStream): Reply = {
    val t = in.read()
    if (t < 0) throw new EOFException("connection closed")
    val line = readLine(in)
    t.toChar match {
      case '+' => Simple(line)
      case '-' => Err(line)
      case ':' => Num(line.toLong)
      case '$' =>
        val n = line.toInt
        if (n < 0) Bulk(None)
        else {
          val b = readN(in, n)
          if (in.read() != '\r' || in.read() != '\n')
            throw new java.io.IOException("malformed bulk terminator")
          Bulk(Some(new String(b, UTF_8)))
        }
      case '*' =>
        val n = line.toInt
        if (n < 0) Arr(None)
        else Arr(Some(Seq.fill(n)(readReply(in))))
      case c => throw new java.io.IOException(s"unknown RESP type byte '$c'")
    }
  }
}

/** One client connection. NOT thread-safe — callers own one per thread or
  * task (the store opens a connection per Spark partition, the
  * partitioned-JDBC shape). `pipeline` sends N commands before reading N
  * replies — the round-trip amortization that makes bulk ZADD/ZREM from an
  * executor one flush per batch instead of one per row. */
final class RespConn(host: String, port: Int, timeoutMs: Int = 300000)
    extends AutoCloseable {
  private val socket = new Socket(host, port)
  socket.setSoTimeout(timeoutMs)
  socket.setTcpNoDelay(true)
  private val in  = new BufferedInputStream(socket.getInputStream, 1 << 16)
  private val out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)

  def command(args: String*): Resp.Reply = {
    out.write(Resp.encode(args)); out.flush()
    checked(Resp.readReply(in))
  }

  def pipeline(cmds: Seq[Seq[String]]): Seq[Resp.Reply] = {
    cmds.foreach(c => out.write(Resp.encode(c)))
    out.flush()
    cmds.map(_ => checked(Resp.readReply(in)))
  }

  /** Server errors surface as exceptions (the engine's contracts want
    * loud failures, not sentinel replies). */
  private def checked(r: Resp.Reply): Resp.Reply = r match {
    case Resp.Err(m) => throw new java.io.IOException(s"valkey error: $m")
    case ok          => ok
  }

  // ── typed conveniences over the raw frames ─────────────────────────────
  def num(args: String*): Long = command(args: _*) match {
    case Resp.Num(n) => n
    case other => throw new java.io.IOException(s"expected integer reply, got $other")
  }
  def bulk(args: String*): Option[String] = command(args: _*) match {
    case Resp.Bulk(v)   => v
    case Resp.Simple(s) => Some(s)
    case other => throw new java.io.IOException(s"expected bulk reply, got $other")
  }
  def arr(args: String*): Seq[String] = command(args: _*) match {
    case Resp.Arr(Some(items)) => items.map {
      case Resp.Bulk(Some(s)) => s
      case other => throw new java.io.IOException(s"non-bulk array item: $other")
    }
    case Resp.Arr(None) => Seq.empty
    case other => throw new java.io.IOException(s"expected array reply, got $other")
  }

  override def close(): Unit = socket.close()
}

object RespConn {
  /** Bracketed connection for executor tasks. */
  def withConn[A](host: String, port: Int)(f: RespConn => A): A = {
    val c = new RespConn(host, port)
    try f(c) finally c.close()
  }
}
