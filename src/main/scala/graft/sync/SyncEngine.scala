package graft.sync

import java.time.{Duration, LocalDateTime}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.PipeSpec
import graft.dsl.ParamsFilter
import graft.ops.{Dedup, Diff, SchemaEvolution}
import graft.storage.PipeStorage

/** The incremental sync pipeline — the reference's `pipe.sync()`
  * (meerschaum/core/Pipe/_sync.py:40-531) and the read path `get_data`
  * (meerschaum/core/Pipe/_data.py:22-318), re-expressed as one Catalyst plan
  * per phase:
  *
  *   enforce dtypes → autotime → schema evolution →
  *   backtrack read (dt-bounded target slice) →
  *   full-row delta (anti-join on canonical hash) →
  *   unseen/update split on sync keys →
  *   append unseen + upsert update (chunk-scoped rewrite)
  *
  * The backtrack slice is bounded by the batch's own MIN/MAX dt ±1 minute —
  * the reference's heuristic (core/Pipe/_sync.py:860-896) — so the diff join
  * compares the batch against a window, never the whole table; that is what
  * keeps a 100 TB target syncable (the window is broadcast-able in the
  * common case).
  */
final case class SyncResult(inserted: Long, updated: Long) {
  def total: Long = inserted + updated
}

final class SyncEngine(spark: SparkSession, root: String) {

  def storage(spec: PipeSpec): PipeStorage = new PipeStorage(spark, root, spec)

  def sync(spec: PipeSpec, batch0: DataFrame): SyncResult = {
    val store = storage(spec)

    // 1. dtype enforcement (reference core/Pipe/_dtypes.py:19-115)
    var batch = if (spec.enforce) SchemaEvolution.enforceDtypes(batch0, spec.dtypes) else batch0

    // 2. autotime stamping (reference core/Pipe/_sync.py:412-433)
    spec.columns.datetime.foreach { dt =>
      if (spec.autotime && !batch.columns.contains(dt))
        batch = batch.withColumn(dt, current_timestamp().cast("timestamp_ntz"))
    }

    // 3. first sync: create the target outright
    if (!store.exists) {
      val deduped = dedupeBatch(spec, batch)
      val n = deduped.cache().count()
      store.create(deduped)
      deduped.unpersist()
      return SyncResult(inserted = n, updated = 0)
    }

    // 4. schema evolution (unless static)
    val target = store.read
    val (targetAligned, batchAligned) =
      if (spec.static) (target, SchemaEvolution.conform(batch, target.schema))
      else {
        val a = SchemaEvolution.align(target, batch, spec.mixedNumerics)
        if (a.schema != target.schema) {
          store.overwrite(a.existing) // promote/add cols once (tmp+swap write)
          (store.read, a.incoming)    // re-read: old files are gone after swap
        } else (a.existing, a.incoming)
      }

    val keys = syncKeys(spec, batchAligned)

    // 5. upsert mode skips the diff entirely (reference sync_pipe:1921-1935)
    if (spec.upsert) {
      val patch = dedupeBatch(spec, batchAligned).cache()
      val total = patch.count()
      // split reporting: rows whose keys already exist count as updates
      val existingKeys = backtrackSlice(spec, targetAligned, patch)
        .select(keys.map(col): _*).distinct()
      val updated = patch.join(existingKeys, keys, "left_semi").count()
      store.upsert(patch, keys)
      patch.unpersist()
      return SyncResult(inserted = total - updated, updated = updated)
    }

    // 6. diff-then-apply
    val backtrack = backtrackSlice(spec, targetAligned, batchAligned)
    val (unseen, update) = Diff.filterExisting(
      dedupeBatch(spec, batchAligned), backtrack, keys, spec.nullIndices)

    val unseenC = unseen.cache(); val updateC = update.cache()
    val (nIns, nUpd) = (unseenC.count(), updateC.count())
    if (nUpd > 0) store.upsert(updateC, keys)
    if (nIns > 0) store.append(unseenC)
    unseenC.unpersist(); updateC.unpersist()
    SyncResult(nIns, nUpd)
  }

  /** Keys for the unseen/update split; fall back to all columns (pure
    * append-dedup) when the pipe declares no roles. */
  private def syncKeys(spec: PipeSpec, batch: DataFrame): Seq[String] = {
    val declared = spec.columns.syncKeys.filter(batch.columns.contains)
    if (declared.nonEmpty) declared else batch.columns.toSeq
  }

  /** Collapse intra-batch duplicates before diffing (the reference's chunk
    * dedup: one row per key, last occurrence wins). */
  private def dedupeBatch(spec: PipeSpec, batch: DataFrame): DataFrame = {
    val keys = spec.columns.syncKeys.filter(batch.columns.contains)
    if (keys.isEmpty || keys.size == batch.columns.length) batch.distinct()
    else {
      val order = spec.columns.datetime.filter(batch.columns.contains).toSeq
      if (order.isEmpty) batch.dropDuplicates(keys)
      else Dedup.keepLatest(batch, keys, order)
    }
  }

  /** Target slice the diff compares against: rows inside the batch's dt
    * envelope ±1 minute (reference core/Pipe/_sync.py:860-896). Without a dt
    * axis the whole target is the backtrack (small-dimension pipes). */
  private def backtrackSlice(spec: PipeSpec, target: DataFrame, batch: DataFrame): DataFrame =
    spec.columns.datetime.filter(batch.columns.contains) match {
      case Some(dt) =>
        val row = batch.agg(
          min(col(dt)).cast("timestamp_ntz").as("lo"),
          max(col(dt)).cast("timestamp_ntz").as("hi")).head()
        (Option(row.getAs[LocalDateTime]("lo")), Option(row.getAs[LocalDateTime]("hi"))) match {
          case (Some(lo), Some(hi)) =>
            target.where(col(dt) >= lit(lo.minusMinutes(1)) && col(dt) <= lit(hi.plusMinutes(1)))
          case _ => target
        }
      case None => target
    }

  /** Begin bound for the next fetch: newest sync time minus the backtrack
    * window (reference core/Pipe/_fetch.py:144-181). */
  def nextFetchBegin(spec: PipeSpec): Option[LocalDateTime] =
    storage(spec).syncTime(newest = true).map(_.minus(Duration.ofMinutes(spec.backtrackMinutes)))

  /** The read path: projection, half-open time bounds, params DSL, order,
    * limit (reference core/Pipe/_data.py:22-318). */
  def getData(
      spec: PipeSpec,
      select: Seq[String] = Seq.empty,
      omit: Seq[String] = Seq.empty,
      begin: Option[LocalDateTime] = None,
      end: Option[LocalDateTime] = None,
      params: Map[String, Any] = Map.empty,
      orderDesc: Boolean = false,
      limit: Option[Int] = None): DataFrame = {

    var df = storage(spec).read
    spec.columns.datetime.foreach { dt =>
      begin.foreach(b => df = df.where(col(dt) >= lit(b)))
      end.foreach(e => df = df.where(col(dt) < lit(e)))
    }
    if (params.nonEmpty) df = df.where(ParamsFilter.toPredicate(params))
    if (select.nonEmpty) df = df.select(select.map(col): _*)
    if (omit.nonEmpty)   df = df.drop(omit: _*)

    val orderCols = (spec.columns.datetime.toSeq ++
      spec.columns.syncKeys.filterNot(spec.columns.datetime.contains))
      .filter(df.columns.contains)
    if (orderCols.nonEmpty) {
      val ordering = orderCols.map(c => if (orderDesc) col(c).desc else col(c).asc)
      df = df.orderBy(ordering: _*)
    }
    limit.map(df.limit).getOrElse(df)
  }

  def rowCount(spec: PipeSpec,
               begin: Option[LocalDateTime] = None,
               end: Option[LocalDateTime] = None,
               params: Map[String, Any] = Map.empty): Long = {
    var df = storage(spec).read
    spec.columns.datetime.foreach { dt =>
      begin.foreach(b => df = df.where(col(dt) >= lit(b)))
      end.foreach(e => df = df.where(col(dt) < lit(e)))
    }
    if (params.nonEmpty) df = df.where(ParamsFilter.toPredicate(params))
    df.count()
  }
}
