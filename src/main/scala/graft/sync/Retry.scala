package graft.sync

import scala.util.control.NonFatal

/** Bounded retry with quadratic backoff — the reference retries each chunk
  * sync up to 3 times sleeping `attempt**2` seconds between tries
  * (meerschaum/core/Pipe/_sync.py:333-355). Spark retries *tasks*; this
  * covers the driver-side sequence (diff + storage swap) a task retry
  * cannot, and the diff-based sync is idempotent so a partially applied
  * attempt re-converges on the next one.
  */
object Retry {

  /** Run `body` up to `attempts` times. Returns (result, attemptsUsed,
    * per-attempt error messages). The final failure propagates. */
  def withBackoff[A](attempts: Int, baseSleepMs: Long)(body: => A): (A, Int, Seq[String]) = {
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    var errs = Vector.empty[String]
    var n = 0
    while (true) {
      n += 1
      try return (body, n, errs)
      catch {
        case NonFatal(e) if n < attempts =>
          // class name included: a message-less exception (bare NPE) would
          // otherwise record as "attempt N: null"
          errs :+= s"attempt $n: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
          Thread.sleep(baseSleepMs * n.toLong * n.toLong)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
