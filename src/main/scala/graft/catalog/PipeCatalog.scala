package graft.catalog

import scala.collection.concurrent.TrieMap

/** Registry of pipes with the reference's key search semantics:
  * include/exclude via `_` prefix and tag OR-groups
  * (meerschaum/connectors/sql/_pipes.py:143-360).
  *
  * The registry is metadata (thousands of entries, not data-plane scale), so
  * it is an in-memory map; [[PipeCatalogStore]] persists it as JSON lines —
  * the Spark analogue of the reference's `pipes` table. Data-plane state
  * lives in [[graft.storage.PipeStorage]].
  */
final class PipeCatalog {

  private val pipes = TrieMap.empty[PipeKeys, PipeSpec]

  def register(spec: PipeSpec): PipeSpec = { pipes.put(spec.keys, spec); spec }
  def edit(spec: PipeSpec): PipeSpec     = register(spec)
  def delete(keys: PipeKeys): Boolean    = pipes.remove(keys).isDefined
  def get(keys: PipeKeys): Option[PipeSpec] = pipes.get(keys)
  def exists(keys: PipeKeys): Boolean    = pipes.contains(keys)
  def all: Seq[PipeSpec]                 = pipes.values.toSeq

  /** Key search: each filter list partitions into includes and `_`-prefixed
    * excludes; empty list = no constraint. `tags` are OR-groups: a pipe
    * matches if it carries any requested tag (and none of the negated). */
  def search(
      connectors: Seq[String] = Seq.empty,
      metrics: Seq[String] = Seq.empty,
      locations: Seq[String] = Seq.empty,
      tags: Seq[String] = Seq.empty): Seq[PipeSpec] = {

    def matches(value: String, filters: Seq[String]): Boolean = {
      if (filters.isEmpty) return true
      val (ex, in) = filters.partition(_.startsWith("_"))
      val inOk = in.isEmpty || in.contains(value)
      val exOk = !ex.map(_.substring(1)).contains(value)
      inOk && exOk
    }

    def tagsMatch(pipeTags: Seq[String]): Boolean = {
      if (tags.isEmpty) return true
      val (ex, in) = tags.partition(_.startsWith("_"))
      val inOk = in.isEmpty || in.exists(pipeTags.contains)
      val exOk = !ex.map(_.substring(1)).exists(pipeTags.contains)
      inOk && exOk
    }

    all.filter { p =>
      matches(p.keys.connector, connectors) &&
      matches(p.keys.metric, metrics) &&
      matches(p.keys.location.getOrElse(""), locations) &&
      tagsMatch(p.tags)
    }.sortBy(p => (p.keys.connector, p.keys.metric, p.keys.location.getOrElse("")))
  }
}
