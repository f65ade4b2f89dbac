package graft.catalog

import graft.types.MrsmType

/** A pipe: the reference's four-key identity plus the behavioral parameters
  * our engine honors (reference: meerschaum/core/Pipe/__init__.py:65-88 for
  * keys; parameter semantics cited per field).
  */
final case class PipeKeys(
    connector: String,
    metric: String,
    location: Option[String] = None,
    instance: String = "default") {
  /** Default physical target name (reference derives a table name from the
    * keys — core/Pipe/_attributes.py:990-1054). */
  def targetName: String =
    (Seq(connector, metric) ++ location.toSeq).mkString("_")
      .replaceAll("[^A-Za-z0-9_]", "_")
}

/** Column roles: `datetime` is the time axis, `primary` a sole key; all
  * roles except `value` participate in the sync join key (reference
  * core/Pipe/_attributes.py:196-217, key choice core/Pipe/_sync.py:910-919).
  */
final case class ColumnRoles(roles: Map[String, String] = Map.empty) {
  def datetime: Option[String] = roles.get("datetime")
  def primary: Option[String]  = roles.get("primary")
  /** Join keys for the unseen/update split: `primary` alone when defined,
    * else every role except `value`. */
  def syncKeys: Seq[String] = primary match {
    case Some(pk) => Seq(pk)
    case None     => roles.collect { case (role, c) if role != "value" => c }.toSeq.distinct
  }
}

final case class PipeSpec(
    keys: PipeKeys,
    columns: ColumnRoles = ColumnRoles(),
    dtypes: Map[String, MrsmType] = Map.empty,
    /** native upsert instead of diff-then-insert/update (ref _attributes.py:385-397) */
    upsert: Boolean = false,
    /** stamp ingest time when the dt column is missing (ref _sync.py:412-433) */
    autotime: Boolean = false,
    /** freeze schema — no evolution (ref _attributes.py:401-409) */
    static: Boolean = false,
    /** cast on read/write (ref _attributes.py:474-482) */
    enforce: Boolean = true,
    /** null-safe key joins (ref _attributes.py:490-498) */
    nullIndices: Boolean = false,
    /** int→numeric promotion when floats arrive (ref _attributes.py:506-514) */
    mixedNumerics: Boolean = true,
    /** late-data re-read window (ref config/_default.py:236) */
    backtrackMinutes: Long = 1440,
    /** chunk width for verify/partitioning (ref config/_default.py:240) */
    chunkMinutes: Long = 43200,
    /** integer datetime axis: the epoch precision unit ("second",
      * "millisecond", ...) — ref utils/dtypes/__init__.py:58-89 */
    epochUnit: Option[String] = None,
    tags: Seq[String] = Seq.empty,
    /** override physical target */
    target: Option[String] = None,
    parents: Seq[PipeKeys] = Seq.empty) {
  def targetName: String = target.getOrElse(keys.targetName)
}
