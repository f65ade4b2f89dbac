package graft.sync

import org.apache.spark.sql.DataFrame

import graft.catalog.PipeSpec

/** Full-sync override — the reference's plugin `sync(pipe, **kw)` hook,
  * which replaces the engine's sync wholesale when a plugin defines it
  * (meerschaum/core/Pipe/_sync.py:201-261). A strategy receives the engine
  * and may delegate to [[SyncEngine.syncDefault]] for the standard
  * diff-then-apply after custom preprocessing, or take over entirely.
  */
trait SyncStrategy {
  def sync(engine: SyncEngine, spec: PipeSpec, batch: DataFrame): SyncResult
}
