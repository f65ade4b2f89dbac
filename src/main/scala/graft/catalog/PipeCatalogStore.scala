package graft.catalog

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.types.Dtypes

/** Disk persistence for the pipe registry — the Spark analogue of the
  * reference's `pipes` table (meerschaum/connectors/sql/_pipes.py:20-77:
  * keys + a JSON parameters document per pipe). Specs serialize to JSON
  * lines via a flat row form; `strategy` is a runtime object and is
  * deliberately not persisted (the reference's plugin hooks are re-resolved
  * from the plugin registry at load time the same way).
  */
object PipeCatalogStore {

  /** Flat serializable form of a [[PipeSpec]]. */
  final case class SpecRow(
      connector: String, metric: String, location: Option[String], instance: String,
      roles: Map[String, String], dtypes: Map[String, String],
      upsert: Boolean, autotime: Boolean, autoincrement: Boolean,
      isStatic: Boolean, enforce: Boolean, nullIndices: Boolean,
      mixedNumerics: Boolean, backtrackMinutes: Long, chunkMinutes: Long,
      epochUnit: Option[String], tags: Seq[String], target: Option[String],
      parents: Seq[String],
      precisionUnit: Option[String] = None, precisionInterval: Option[Long] = None,
      precisionRound: Option[String] = None,
      references: Seq[String] = Seq.empty, children: Seq[String] = Seq.empty,
      extras: Map[String, String] = Map.empty)

  private def keysToString(k: PipeKeys): String =
    Seq(k.connector, k.metric, k.location.getOrElse(""), k.instance).mkString("")

  private def keysFromString(s: String): PipeKeys = {
    val p = s.split("", -1)
    PipeKeys(p(0), p(1), Option(p(2)).filter(_.nonEmpty), p(3))
  }

  private[graft] def toRow(s: PipeSpec): SpecRow = SpecRow(
    s.keys.connector, s.keys.metric, s.keys.location, s.keys.instance,
    s.columns.roles, s.dtypes.map { case (c, t) => c -> Dtypes.format(t) },
    s.upsert, s.autotime, s.autoincrement, s.static, s.enforce, s.nullIndices,
    s.mixedNumerics, s.backtrackMinutes, s.chunkMinutes, s.epochUnit,
    s.tags, s.target, s.parents.map(keysToString),
    s.precision.map(_.unit), s.precision.map(_.interval), s.precision.map(_.roundTo),
    s.references.map(keysToString), s.children.map(keysToString), s.extras)

  private[graft] def fromRow(r: SpecRow): PipeSpec = PipeSpec(
    keys = PipeKeys(r.connector, r.metric, r.location, r.instance),
    columns = ColumnRoles(r.roles),
    dtypes = r.dtypes.map { case (c, t) => c -> Dtypes.parse(t) },
    upsert = r.upsert, autotime = r.autotime, autoincrement = r.autoincrement,
    strategy = None, static = r.isStatic, enforce = r.enforce,
    nullIndices = r.nullIndices, mixedNumerics = r.mixedNumerics,
    backtrackMinutes = r.backtrackMinutes, chunkMinutes = r.chunkMinutes,
    epochUnit = r.epochUnit, tags = r.tags, target = r.target,
    precision = r.precisionUnit.map(u => graft.dsl.Precision(
      u, r.precisionInterval.getOrElse(1L), r.precisionRound.getOrElse("down"))),
    parents = r.parents.map(keysFromString),
    references = Option(r.references).getOrElse(Seq.empty).map(keysFromString),
    children = Option(r.children).getOrElse(Seq.empty).map(keysFromString),
    extras = Option(r.extras).getOrElse(Map.empty))

  def save(spark: SparkSession, path: String, catalog: PipeCatalog): Unit = {
    import spark.implicits._
    catalog.all.map(toRow).toDS()
      .coalesce(1).write.mode(SaveMode.Overwrite).json(path)
  }

  def load(spark: SparkSession, path: String): PipeCatalog = {
    import spark.implicits._
    val cat = new PipeCatalog()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path))) {
      // explicit schema: JSON omits null/empty fields, so inference would
      // drop always-None Option columns and break the typed read
      val schema = org.apache.spark.sql.Encoders.product[SpecRow].schema
      spark.read.schema(schema).json(path).as[SpecRow]
        .collect().foreach(r => cat.register(fromRow(r)))
    }
    cat
  }
}
