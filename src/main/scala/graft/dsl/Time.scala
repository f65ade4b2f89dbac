package graft.dsl

import java.time.Instant
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-axis helpers: half-open bounds, epoch-aligned chunk grids, rounding.
  *
  * Mirrors the reference's begin-inclusive / end-exclusive convention
  * (meerschaum/connectors/sql/_pipes.py:1479-1502) and the chunk-bound grid
  * used for verification / partitioning / parallel sync
  * (meerschaum/core/Pipe/_data.py:728-883).
  *
  * Bounds are plain Catalyst predicates so they prune parquet row groups and
  * partitions; the chunk grid exists for maintenance jobs (verify, backfill,
  * partition-overwrite) where work is dispatched per time window.
  */
object TimeBounds {

  /** begin inclusive, end exclusive; either side optional. Literals are
    * emitted timezone-naive (UTC instant) to match the NTZ time axis. */
  def predicate(dtCol: String, begin: Option[Instant], end: Option[Instant]): Column = {
    def l(ts: Instant) = lit(java.time.LocalDateTime.ofInstant(ts, java.time.ZoneOffset.UTC))
    val b = begin.map(ts => col(dtCol) >= l(ts)).getOrElse(lit(true))
    val e = end.map(ts => col(dtCol) < l(ts)).getOrElse(lit(true))
    b && e
  }

  def apply(df: DataFrame, dtCol: String, begin: Option[Instant], end: Option[Instant]): DataFrame =
    df.where(predicate(dtCol, begin, end))

  /** Integer (epoch) axis variant — the reference supports int datetime axes
    * with a precision unit (meerschaum/utils/dtypes/__init__.py:58-89).
    */
  def predicateEpoch(dtCol: String, begin: Option[Long], end: Option[Long]): Column = {
    val b = begin.map(v => col(dtCol) >= lit(v)).getOrElse(lit(true))
    val e = end.map(v => col(dtCol) < lit(v)).getOrElse(lit(true))
    b && e
  }
}

object ChunkGrid {

  /** Epoch-aligned chunk bounds: when `align`, the grid starts at
    * floor(begin / interval) * interval so chunk boundaries are stable across
    * runs regardless of the queried range (reference `get_chunk_bounds`,
    * meerschaum/core/Pipe/_data.py:728-883). Returns half-open [b, e) pairs
    * covering [begin, end).
    */
  def bounds(begin: Instant, end: Instant, interval: java.time.Duration,
             align: Boolean = true): Seq[(Instant, Instant)] = {
    require(!interval.isZero && !interval.isNegative, "chunk interval must be positive")
    val stepMs  = interval.toMillis
    val beginMs = begin.toEpochMilli
    val endMs   = end.toEpochMilli
    val startMs = if (align) Math.floorDiv(beginMs, stepMs) * stepMs else beginMs
    Iterator.iterate(startMs)(_ + stepMs)
      .takeWhile(_ < endMs)
      .map { b =>
        val lo = math.max(b, beginMs)
        val hi = math.min(b + stepMs, endMs)
        (Instant.ofEpochMilli(lo), Instant.ofEpochMilli(hi))
      }
      .toSeq
  }

  /** Chunk label column for grouping rows into epoch-aligned windows —
    * distributed equivalent of iterating chunk bounds (used by dedup/verify
    * per-chunk work and as a partition column for storage).
    */
  def labelColumn(dtCol: String, interval: String): Column =
    window(col(dtCol), interval).getField("start")
}

object RoundTime {
  /** Round a timestamp down to a unit — reference `round_time`
    * (meerschaum/utils/dtypes/__init__.py:1333-1409). Units as accepted by
    * Spark's `date_trunc`.
    */
  def floor(c: Column, unit: String): Column = date_trunc(unit, c)

  /** Epoch conversion at microsecond precision — reference `datetime_to_int`
    * (meerschaum/utils/dtypes/__init__.py:1094). Matches DuckDB `epoch_us`.
    * NTZ columns are interpreted as UTC (identity under the pinned session
    * zone). */
  def epochMicros(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
}
