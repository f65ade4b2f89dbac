package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.PipeSpec
import graft.storage.ValkeyStore

/** Valkey as a FETCH source — the reference's `connectors/valkey/_fetch.py
  * :16-75` (a pipe whose upstream is a Valkey table: score-bounded
  * zrangebyscore pull, then the engine's normal diff/sync). The fetched
  * table is one written by [[graft.storage.ValkeyStore]] (the reference
  * reads its own connector's document layout the same way); begin/end map
  * onto the store's score-bounded read, so a bounded fetch never scans the
  * whole set. Caller-supplied params apply as a local filter, the plugin
  * contract shared with [[FnSource]]. */
final class ValkeySource(host: String, port: Int, root: String) extends Source {
  override def fetch(spark: SparkSession, spec: PipeSpec,
                     begin: Option[Any], end: Option[Any],
                     params: Map[String, Any]): DataFrame = {
    val store = new ValkeyStore(spark, host, port, root, spec)
    val df = store.readRange(begin, end, endInclusive = false)
    if (params.isEmpty) df
    else df.where(graft.dsl.ParamsFilter.toPredicate(params))
  }
}

/** Registers [[ValkeySource]] under the reference's connector short name
  * (`valkey:...` connector strings). Config keys: `host`, `port`, `root`. */
final class ValkeyProvider extends SourceProvider {
  override def name = "valkey"
  override def create(config: Map[String, String]): Source =
    new ValkeySource(
      host = config.getOrElse("host", "127.0.0.1"),
      port = config.getOrElse("port",
        throw new IllegalArgumentException("valkey source requires 'port'")).toInt,
      root = config.getOrElse("root", "default"))
}
