package graft.kv

import java.net.{ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.mutable

/** In-process RESP2 server implementing the command subset the Valkey
  * instance backend uses — string keys (SET/GET with NX/PX lease
  * semantics) and sorted sets (ZADD/ZRANGEBYSCORE/ZREM/...). Plays the
  * role the reference's `mrsm stack` valkey service plays for its test
  * suite (`tests/connectors.py` builds a `valkey` connector against the
  * stack's server): a real wire-protocol endpoint the client talks to over
  * TCP, so every store test exercises the exact socket path production
  * would. Single-process durability only — it is the dev/test harness, not
  * a Valkey replacement.
  *
  * Concurrency: thread-per-connection; one global state lock (commands are
  * tiny; the engine's write paths serialize on the store lease anyway).
  * Expiry is lazy (checked on access) plus a sweep on SET NX, which is
  * what the lease path needs for a crashed holder's key to age out.
  */
final class MiniValkey(bind: String = "127.0.0.1") {
  import MiniValkey.{Value, VStr, VZSet}

  private val state = mutable.HashMap.empty[String, Value]
  private val lock = new Object

  private val serverSocket = new ServerSocket(0, 128, java.net.InetAddress.getByName(bind))
  private val running = new AtomicBoolean(true)

  def host: String = bind
  def port: Int = serverSocket.getLocalPort

  private val acceptThread = new Thread(() => {
    while (running.get()) {
      try {
        val s = serverSocket.accept()
        val t = new Thread(() => serve(s), s"mini-valkey-conn-${s.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: Throwable if !running.get() => // closing
        case e: Throwable =>
          // a transient accept/thread-create failure must not kill the
          // accept loop — the socket would stay bound but unserviced and
          // every client would hang to its SO_TIMEOUT
          System.err.println(s"[mini-valkey] accept failed, retrying: $e")
          Thread.sleep(50)
      }
    }
  }, "mini-valkey-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  def stop(): Unit = {
    running.set(false)
    serverSocket.close()
  }

  // ── command dispatch ─────────────────────────────────────────────────────

  private def serve(s: Socket): Unit = {
    s.setTcpNoDelay(true)
    val in = new java.io.BufferedInputStream(s.getInputStream, 1 << 16)
    val out = new java.io.BufferedOutputStream(s.getOutputStream, 1 << 16)
    try {
      while (true) {
        val req = Resp.readReply(in)
        val args = req match {
          case Resp.Arr(Some(items)) => items.map {
            case Resp.Bulk(Some(v)) => v
            case other => throw new java.io.IOException(s"bad command frame: $other")
          }
          case other => throw new java.io.IOException(s"bad command frame: $other")
        }
        val reply =
          try lock.synchronized(dispatch(args))
          catch { case e: IllegalArgumentException => Resp.Err(s"ERR ${e.getMessage}") }
        out.write(render(reply))
        // batch flushes: only flush when no further pipelined command is
        // already buffered (keeps pipelined ZADD round-trips to one flush)
        if (in.available() == 0) out.flush()
      }
    } catch { case _: Throwable => /* client gone */ }
    finally s.close()
  }

  private def render(r: Resp.Reply): Array[Byte] = {
    val UTF8 = java.nio.charset.StandardCharsets.UTF_8
    val out = new java.io.ByteArrayOutputStream(64)
    def w(s: String): Unit = out.write(s.getBytes(UTF8))
    r match {
      case Resp.Simple(s) => w(s"+$s\r\n")
      case Resp.Err(m)    => w(s"-$m\r\n")
      case Resp.Num(n)    => w(s":$n\r\n")
      case Resp.Bulk(None) => w("$-1\r\n")
      case Resp.Bulk(Some(v)) =>
        val b = v.getBytes(UTF8)
        w(s"$$${b.length}\r\n"); out.write(b); w("\r\n")
      case Resp.Arr(None) => w("*-1\r\n")
      case Resp.Arr(Some(items)) =>
        w(s"*${items.size}\r\n"); items.foreach(i => out.write(render(i)))
    }
    out.toByteArray
  }

  private def now(): Long = System.currentTimeMillis()

  private def liveStr(key: String): Option[VStr] = state.get(key) match {
    case Some(v: VStr) =>
      if (v.expireAtMs > 0 && v.expireAtMs <= now()) { state.remove(key); None }
      else Some(v)
    case Some(_) => throw new IllegalArgumentException(
      "WRONGTYPE Operation against a key holding the wrong kind of value")
    case None => None
  }

  private def zset(key: String, create: Boolean): Option[VZSet] = state.get(key) match {
    case Some(z: VZSet) => Some(z)
    case Some(_) => throw new IllegalArgumentException(
      "WRONGTYPE Operation against a key holding the wrong kind of value")
    case None =>
      if (!create) None
      else { val z = new VZSet; state(key) = z; Some(z) }
  }

  /** Score bound: `(`-prefixed = exclusive; -inf/+inf sentinels. */
  private def parseBound(s: String): (Double, Boolean) = s match {
    case "-inf" => (Double.NegativeInfinity, true)
    case "+inf" | "inf" => (Double.PositiveInfinity, true)
    case _ if s.startsWith("(") => (s.drop(1).toDouble, false)
    case _ => (s.toDouble, true)
  }

  /** Redis integer-score formatting: integral scores render without ".0"
    * (clients round-trip them as the exact strings they sent). */
  private def fmtScore(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e17) d.toLong.toString
    else d.toString

  private def dispatch(args: Seq[String]): Resp.Reply = {
    require(args.nonEmpty, "empty command")
    val cmd = args.head.toUpperCase
    cmd match {
      case "PING" => Resp.Simple("PONG")
      case "ECHO" => Resp.Bulk(Some(args(1)))
      case "FLUSHALL" | "FLUSHDB" => state.clear(); Resp.Simple("OK")

      case "SET" =>
        val (key, value) = (args(1), args(2))
        var nx = false; var xx = false; var expireAt = 0L
        var i = 3
        while (i < args.size) {
          args(i).toUpperCase match {
            case "NX" => nx = true; i += 1
            case "XX" => xx = true; i += 1
            case "PX" => expireAt = now() + args(i + 1).toLong; i += 2
            case "EX" => expireAt = now() + args(i + 1).toLong * 1000; i += 2
            case o => throw new IllegalArgumentException(s"syntax error near '$o'")
          }
        }
        val existing = liveStr(key)
        if ((nx && existing.isDefined) || (xx && existing.isEmpty)) Resp.Bulk(None)
        else { state(key) = VStr(value, expireAt); Resp.Simple("OK") }

      case "GET" => Resp.Bulk(liveStr(args(1)).map(_.s))

      case "PEXPIRE" =>
        liveStr(args(1)) match {
          case Some(v) =>
            state(args(1)) = VStr(v.s, now() + args(2).toLong); Resp.Num(1L)
          case None => Resp.Num(0L)
        }

      case "DEL" =>
        Resp.Num(args.tail.count(k => state.remove(k).isDefined).toLong)

      case "EXISTS" =>
        Resp.Num(args.tail.count(k => state.get(k) match {
          case Some(v: VStr) => v.expireAtMs == 0 || v.expireAtMs > now()
          case Some(_) => true
          case None => false
        }).toLong)

      case "KEYS" =>
        val rx = java.util.regex.Pattern.quote(args(1))
          .replace("*", "\\E.*\\Q").replace("?", "\\E.\\Q")
        val p = java.util.regex.Pattern.compile(rx)
        Resp.Arr(Some(state.keys.filter(p.matcher(_).matches()).toSeq.sorted
          .map(k => Resp.Bulk(Some(k)))))

      case "ZADD" =>
        val z = zset(args(1), create = true).get
        var added = 0L
        args.drop(2).grouped(2).foreach {
          case Seq(score, member) => if (z.add(member, score.toDouble)) added += 1
          case _ => throw new IllegalArgumentException("syntax error: ZADD pairs")
        }
        Resp.Num(added)

      case "ZCARD" => Resp.Num(zset(args(1), create = false).map(_.scores.size.toLong).getOrElse(0L))

      case "ZSCORE" =>
        Resp.Bulk(zset(args(1), create = false)
          .flatMap(_.scores.get(args(2))).map(fmtScore))

      case "ZREM" =>
        val z = zset(args(1), create = false)
        Resp.Num(z.map(zz => args.drop(2).count(zz.remove).toLong).getOrElse(0L))

      case "ZCOUNT" =>
        Resp.Num(zRangeByScore(args(1), args(2), args(3)).size.toLong)

      case "ZRANGEBYSCORE" =>
        var withScores = false; var off = 0L; var cnt = -1L
        var i = 4
        while (i < args.size) {
          args(i).toUpperCase match {
            case "WITHSCORES" => withScores = true; i += 1
            case "LIMIT" => off = args(i + 1).toLong; cnt = args(i + 2).toLong; i += 3
            case o => throw new IllegalArgumentException(s"syntax error near '$o'")
          }
        }
        var items = zRangeByScore(args(1), args(2), args(3))
        if (off > 0) items = items.drop(off.toInt)
        if (cnt >= 0) items = items.take(cnt.toInt)
        Resp.Arr(Some(items.flatMap { case (score, member) =>
          if (withScores) Seq(Resp.Bulk(Some(member)), Resp.Bulk(Some(fmtScore(score))))
          else Seq(Resp.Bulk(Some(member)))
        }))

      case "ZREMRANGEBYSCORE" =>
        val victims = zRangeByScore(args(1), args(2), args(3)).map(_._2)
        val z = zset(args(1), create = false)
        Resp.Num(z.map(zz => victims.count(zz.remove).toLong).getOrElse(0L))

      case "ZRANGE" =>
        // rank-based, ascending; REV + WITHSCORES suffixes (the store's
        // min/max-score probe is ZRANGE key 0 0 [REV] WITHSCORES)
        val rev = args.drop(4).exists(_.equalsIgnoreCase("REV"))
        val withScores = args.drop(4).exists(_.equalsIgnoreCase("WITHSCORES"))
        zset(args(1), create = false) match {
          case None => Resp.Arr(Some(Seq.empty))
          case Some(z) =>
            import scala.jdk.CollectionConverters._
            val all0 = z.byScore.keySet.asScala.toSeq
            val all = if (rev) all0.reverse else all0
            val n = all.size
            def rank(r: Long): Int =
              (if (r < 0) n + r else r).max(0).min(n.toLong).toInt
            val (lo, hi) = (rank(args(2).toLong), rank(args(3).toLong))
            val slice = if (lo > hi) Seq.empty else all.slice(lo, hi + 1)
            Resp.Arr(Some(slice.flatMap { case (score, member) =>
              if (withScores) Seq(Resp.Bulk(Some(member)), Resp.Bulk(Some(fmtScore(score))))
              else Seq(Resp.Bulk(Some(member)))
            }))
        }

      case other => throw new IllegalArgumentException(s"unknown command '$other'")
    }
  }

  private def zRangeByScore(key: String, minS: String, maxS: String): Seq[(Double, String)] =
    zset(key, create = false) match {
      case None => Seq.empty
      case Some(z) =>
        import scala.jdk.CollectionConverters._
        val (lo, loIncl) = parseBound(minS)
        val (hi, hiIncl) = parseBound(maxS)
        z.byScore.keySet.asScala.iterator
          .dropWhile { case (s, _) => s < lo || (!loIncl && s == lo) }
          .takeWhile { case (s, _) => s < hi || (hiIncl && s == hi) }
          .toSeq
    }
}

object MiniValkey {
  private sealed trait Value
  private final case class VStr(s: String, expireAtMs: Long) extends Value
  /** Sorted set: score order with member-lexicographic tiebreak (the zset
    * ordering contract), plus a member→score map for O(log n) updates. */
  private final class VZSet extends Value {
    val byScore = new java.util.TreeMap[(Double, String), Unit](
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String))
    val scores = mutable.HashMap.empty[String, Double]
    def add(member: String, score: Double): Boolean = {
      val existed = scores.get(member)
      existed.foreach(old => byScore.remove((old, member)))
      scores(member) = score
      byScore.put((score, member), ())
      existed.isEmpty
    }
    def remove(member: String): Boolean = scores.remove(member) match {
      case Some(old) => byScore.remove((old, member)); true
      case None      => false
    }
  }
}
