package graft.sources

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.PipeSpec

/** The fetch SPI — the reference's plugin `fetch(pipe, begin, end, **kw)`
  * extension point (meerschaum/core/Pipe/_fetch.py:20-97): any callable that
  * produces the new rows for a sync window. The engine applies the backtrack
  * begin and runs the fetched frame through the normal diff pipeline, so a
  * Source only has to produce rows in [begin, end).
  *
  * Bounds are `Any` because the axis can be a timestamp (`LocalDateTime`) or
  * an integer epoch (`Long`) — mirroring the reference's
  * `Union[datetime, int]` bounds.
  */
trait Source {
  def fetch(spark: SparkSession, spec: PipeSpec,
            begin: Option[Any] = None, end: Option[Any] = None,
            params: Map[String, Any] = Map.empty): DataFrame
}

/** Wrap a plain function as a Source (the plugin-module form). The wrapped
  * function takes no params argument, so caller-supplied params apply as a
  * LOCAL filter on its result — same contract as [[PipeSource]], and the
  * reference passes params kwargs to plugin fetches; silently dropping
  * them would sync unfiltered rows. */
final class FnSource(
    f: (SparkSession, PipeSpec, Option[Any], Option[Any]) => DataFrame) extends Source {
  override def fetch(spark: SparkSession, spec: PipeSpec,
                     begin: Option[Any], end: Option[Any],
                     params: Map[String, Any]): DataFrame = {
    val df = f(spark, spec, begin, end)
    if (params.isEmpty) df
    else df.where(graft.dsl.ParamsFilter.toPredicate(params))
  }
}

/** A pipe as a source for another pipe — the reference's pipe DAG
  * (`parents`, meerschaum/core/Pipe/_attributes.py:783-988) with its
  * parent-predicate pushdown (connectors/sql/_fetch.py:229-342): fetching a
  * window from a parent pipe goes through the storage layer's bounded read,
  * so the bounds prune the parent's chunk directories before any file is
  * opened. Chains of pipes (raw → cleaned → aggregated) sync incrementally
  * end-to-end. `transform` is the derivation (the child's "definition"),
  * applied AFTER the pruned read. */
final class PipeSource(engine: graft.sync.SyncEngine, parent: PipeSpec,
                       transform: DataFrame => DataFrame = identity) extends Source {
  override def fetch(spark: SparkSession, spec: PipeSpec,
                     begin: Option[Any], end: Option[Any],
                     params: Map[String, Any]): DataFrame = {
    var df = engine.storage(parent).readRange(begin, end)
    if (params.nonEmpty) df = df.where(graft.dsl.ParamsFilter.toPredicate(params))
    transform(df)
  }
}

/** Deterministic random time-series generator mirroring the reference's
  * stress plugin (tests/plugins/stress.py:36-100): one row per minute from
  * `begin`, `id` in 1..numIds, `val` in 1..100, bounded by `end` or the row
  * limit. Generated distributed (`spark.range`), never on the driver.
  */
final class StressSource(rows: Long = 1440, numIds: Int = 3,
                         seed: Long = 42L) extends Source {
  override def fetch(spark: SparkSession, spec: PipeSpec,
                     begin: Option[Any], end: Option[Any],
                     params: Map[String, Any]): DataFrame = {
    val dtCol  = spec.columns.datetime.getOrElse("datetime")
    val idCol  = spec.columns.roles.getOrElse("id", "id")
    val valCol = spec.columns.roles.getOrElse("value", "val")
    val start = begin match {
      case Some(d: LocalDateTime) => d
      case _ => LocalDateTime.now(java.time.ZoneOffset.UTC).withNano(0)
    }
    val n = end match {
      case Some(e: LocalDateTime) =>
        math.min(rows, math.max(0L, java.time.Duration.between(start, e).toMinutes))
      case _ => rows
    }
    spark.range(0, n).select(
      expr(s"timestampadd(MINUTE, cast(id as int), TIMESTAMP_NTZ '${start.toString.replace('T', ' ')}')")
        .as(dtCol),
      (floor(rand(seed) * numIds) + 1).cast("long").as(idCol),
      (floor(rand(seed + 1) * 100) + 1).cast("long").as(valCol))
  }
}
