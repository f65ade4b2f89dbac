package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.PipeSpec
import graft.storage.PipeStorage
import graft.sync.{SyncEngine, SyncResult}

/** Maintenance operators: verify/backfill, copy, compact, vacuum
  * (reference: meerschaum/core/Pipe/_verify.py:18-470, _copy.py:1-108,
  * _compress.py:13-107, _maintenance.py:1-161).
  */
final case class VerifyResult(chunksChecked: Long, chunksMismatched: Long,
                              resync: SyncResult)

object Maintenance {

  /** Verify a pipe against its source and backfill the differences.
    *
    * The reference loops over chunk bounds and runs one rowcount query + one
    * re-sync per chunk (core/Pipe/_verify.py:146-330) — N round trips. At
    * scale the loop is the bottleneck, so we re-express it as set algebra:
    * ONE windowed rowcount aggregation per side (source, target), a join to
    * locate mismatched chunks, and a single re-sync bounded to exactly those
    * chunks. Same semantics (rowcount-compare first, then sync the diff),
    * O(1) Spark jobs instead of O(chunks).
    *
    * The chunk grid is epoch-aligned tumbling windows of `spec.chunkMinutes`
    * (`window(dt, w)` aligns to the 1970 epoch, matching the reference's
    * aligned `get_chunk_bounds`, core/Pipe/_data.py:728-883).
    */
  def verify(engine: SyncEngine, spec: PipeSpec, source: DataFrame,
             windowMinutes: Option[Long] = None): VerifyResult = {
    val dt = spec.columns.datetime.getOrElse(
      throw new IllegalArgumentException("verify requires a datetime axis"))
    // the COMPARE window is its own knob (reference `verify.chunk_minutes`,
    // config/_default.py:240), independent of the storage chunk width: a
    // finer window bounds the re-sync to the actual damage without forcing
    // finer storage partitions
    val w     = s"${windowMinutes.getOrElse(spec.chunkMinutes)} minutes"
    val store = engine.storage(spec)

    if (!store.exists) {
      val r = engine.sync(spec, source)
      return VerifyResult(0, 0, r)
    }

    def counts(df: DataFrame) = df
      .groupBy(window(col(dt).cast("timestamp"), w).getField("start").as("__chunk"))
      .agg(count(lit(1)).as("__cnt"))

    val src = counts(source).withColumnRenamed("__cnt", "__src_cnt")
    val tgt = counts(store.read).withColumnRenamed("__cnt", "__tgt_cnt")
    val joined = src.join(tgt, Seq("__chunk"), "full_outer")
      .select(col("__chunk"),
        coalesce(col("__src_cnt"), lit(0L)).as("s"),
        coalesce(col("__tgt_cnt"), lit(0L)).as("t"))
      .cache()
    try {
      val total = joined.count()
      val bad   = joined.where(col("s") =!= col("t"))
        .select(col("__chunk")).collect().map(_.getTimestamp(0))
      if (bad.isEmpty) return VerifyResult(total, 0, SyncResult(0, 0))
      // one re-sync bounded to the mismatched chunks (partition-prunable)
      val badSet = bad.map(_.toLocalDateTime).toSet
      val slice = source.where(
        window(col(dt).cast("timestamp"), w).getField("start")
          .cast("timestamp_ntz").isInCollection(badSet))
      val r = engine.sync(spec, slice)
      VerifyResult(total, bad.length, r)
    } finally { joined.unpersist(); () }
  }

  /** Copy a pipe's data (and by extension its spec) to another pipe —
    * reference `copy_to` (core/Pipe/_copy.py:1-108): chunked data copy into
    * the destination. Spark form: one scan → one partitioned write; an
    * existing destination receives an idempotent sync instead.
    */
  def copyTo(engine: SyncEngine, from: PipeSpec, to: PipeSpec): SyncResult = {
    val src = engine.storage(from).read
    engine.sync(to, src)
  }
}
