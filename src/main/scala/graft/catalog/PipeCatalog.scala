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

  /** Resolve parameter inheritance: fold the spec's `references` in order
    * (later overrides earlier), then patch the spec's own values on top —
    * the reference's `get_parameters(apply_symlinks=True)`
    * (core/Pipe/_attributes.py:60-170). A reference cycle falls back to the
    * raw spec, as the reference does after warning. Typed SCALAR fields
    * (upsert, backtrackMinutes, ...) stay the child's own — a typed spec
    * cannot distinguish "unset" from "set to the default"; the mergeable
    * surface is the maps/options (column roles, dtypes, tags, epochUnit,
    * precision, strategy), which covers the reference's primary use
    * (shared column/dtype layouts). */
  def resolve(keys: PipeKeys): Option[PipeSpec] =
    get(keys).map(resolveSpec(_, Set(keys)))

  private def resolveSpec(s: PipeSpec, visited: Set[PipeKeys]): PipeSpec =
    if (s.references.isEmpty) s
    else {
      val bases = s.references.flatMap { rk =>
        if (visited.contains(rk)) None // cycle: contribute nothing
        else get(rk).map(resolveSpec(_, visited + rk))
      }
      if (bases.isEmpty) s
      else inherit(bases.reduceLeft((earlier, later) => inherit(earlier, later)), s)
    }

  /** `child` wins; maps merge entry-wise, tags union. */
  private def inherit(base: PipeSpec, child: PipeSpec): PipeSpec = child.copy(
    columns = ColumnRoles(base.columns.roles ++ child.columns.roles),
    dtypes = base.dtypes ++ child.dtypes,
    tags = (base.tags ++ child.tags).distinct,
    epochUnit = child.epochUnit.orElse(base.epochUnit),
    precision = child.precision.orElse(base.precision),
    strategy = child.strategy.orElse(base.strategy),
    extras = base.extras ++ child.extras)

  /** Children bookkeeping: the pipe's explicit `children` designations plus
    * every registered pipe naming `keys` among its `parents` (reference
    * `children` property, core/Pipe/_attributes.py:851-905). */
  def childrenOf(keys: PipeKeys): Seq[PipeSpec] = {
    val explicit  = get(keys).toSeq.flatMap(_.children).flatMap(get)
    val viaParent = all.filter(_.parents.contains(keys))
    (explicit ++ viaParent).distinctBy(_.keys)
      .sortBy(p => (p.keys.connector, p.keys.metric, p.keys.location.getOrElse("")))
  }

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
