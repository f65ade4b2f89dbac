package graft.sources

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

import graft.catalog.PipeSpec
import graft.dsl.{EpochAxis, ParamsFilter, SqlText}

/** The reference's primary ingest path: a pipe whose `fetch.definition` is a
  * SQL query against a remote database
  * (meerschaum/connectors/sql/_fetch.py:17-369). The definition is wrapped in
  * a derived table with the incremental bounds and params appended OUTSIDE
  * it — `SELECT * FROM (<definition>) WHERE dt >= begin-backtrack AND dt <
  * end AND <params>` — so the REMOTE engine prunes before anything crosses
  * the wire (the reference wraps in a `WITH definition AS` CTE; a derived
  * table is the same semantics and is accepted by every JDBC dialect,
  * including ones without CTE support).
  *
  * Reads go through `spark.read.jdbc`: with both bounds known the read is
  * partitioned on the datetime column (`partitionColumn`/`lowerBound`/
  * `upperBound`/`numPartitions`) so N executors each pull a slice — the
  * Spark-native form of the reference's chunked `pd.read_sql`
  * (connectors/sql/_sql.py). `fetchsize` bounds per-round-trip memory like
  * the reference's 100k-row chunksize (config/_default.py:113).
  *
  * Backtrack subtraction happens driver-side in plain arithmetic (the
  * reference renders per-flavor DATEADD SQL — utils/sql.py:688-869 — purely
  * because it must ship the arithmetic to 13 dialects; we don't).
  */
final class SqlDefinitionSource(
    url: String,
    definition: String,
    props: Map[String, String] = Map.empty,
    numPartitions: Int = 1,
    fetchSize: Int = 10000) extends Source {

  override def fetch(spark: SparkSession, spec: PipeSpec,
                     begin: Option[Any], end: Option[Any],
                     params: Map[String, Any]): DataFrame = {
    val dtCol = spec.columns.datetime
    val conds = Seq.newBuilder[String]
    dtCol.foreach { dt =>
      begin.foreach(b => conds += s"$dt >= ${SqlText.literal(b)}")
      end.foreach(e => conds += s"$dt < ${SqlText.literal(e)}")
    }
    val paramSql = ParamsFilter.toSql(params)
    if (paramSql.nonEmpty) conds += paramSql
    val where = {
      val cs = conds.result()
      if (cs.isEmpty) "" else cs.mkString(" WHERE ", " AND ", "")
    }
    val sub = s"(SELECT * FROM ($definition) graft_defn$where) graft_src"

    var reader: DataFrameReader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", sub)
      .option("fetchsize", fetchSize)
    props.foreach { case (k, v) => reader = reader.option(k, v) }

    (dtCol, begin, end) match {
      case (Some(dt), Some(b), Some(e)) if numPartitions > 1 =>
        reader
          .option("partitionColumn", dt)
          .option("lowerBound", SqlText.boundString(b))
          .option("upperBound", SqlText.boundString(e))
          .option("numPartitions", numPartitions)
          .load()
      case _ => reader.load()
    }
  }
}

/** Backtrack arithmetic shared by engine-driven fetches: the reference's
  * `begin = sync_time - backtrack_minutes` (core/Pipe/_fetch.py:144-181),
  * polymorphic over timestamp and epoch axes. */
object Backtrack {
  def subtract(spec: PipeSpec, bound: Any, minutes: Long): Any = bound match {
    case d: LocalDateTime => d.minusMinutes(minutes)
    case l: Long =>
      val unit = spec.epochUnit.getOrElse("second")
      l - EpochAxis.unitsForMinutes(unit, minutes)
    case other => other
  }
}
