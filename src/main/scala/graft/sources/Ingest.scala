package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.PipeSpec

/** Ingest-side helpers: inline literal frames and datetime parsing —
  * the reference's `df_from_literal` / `parse_simple_lines`
  * (meerschaum/utils/dataframe.py:1746-1795, 2157-2230,
  * utils/misc.py:154-200) and `parse_df_datetimes`
  * (utils/dataframe.py:447-640).
  */
object Ingest {

  /** 1-row frame from a literal value: current UTC time in the pipe's
    * datetime column, the parsed literal in its value column
    * (reference `df_from_literal`). Strings parse as long/double/boolean
    * when they look like one (the reference uses `ast.literal_eval`). */
  def fromLiteral(spark: SparkSession, spec: PipeSpec, literal: String): DataFrame = {
    val dtCol  = spec.columns.datetime.getOrElse("datetime")
    val valCol = spec.columns.roles.getOrElse("value", "value")
    val now = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
    val (v, t) = parseScalar(literal)
    val schema = StructType(Seq(
      StructField(dtCol, TimestampNTZType), StructField(valCol, t)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(now, v)), schema)
  }

  /** Parse "simple lines" text into a frame: each line either a JSON object
    * or `k:v,k2:v2` pairs (reference `parse_simple_lines` + `string_to_dict`).
    * Column type = the widest scalar type that fits every value (long →
    * double → boolean → string). Driver-side by design — inline literals are
    * small command-line payloads, not data files. */
  def fromSimpleLines(spark: SparkSession, text: String): DataFrame = {
    val docs: Seq[Map[String, String]] = text.linesIterator
      .map(_.trim).filter(_.nonEmpty).map(parseLine).toSeq
    require(docs.nonEmpty, "no parseable lines")
    val cols = docs.flatMap(_.keys).distinct
    val types = cols.map { c =>
      val vals = docs.flatMap(_.get(c))
      c -> unifyType(vals.map(parseScalar(_)._2))
    }.toMap
    val schema = StructType(cols.map(c => StructField(c, types(c))))
    val rows = docs.map { d =>
      Row.fromSeq(cols.map { c =>
        d.get(c).map(raw => castTo(raw, types(c))).orNull
      })
    }
    spark.createDataFrame(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }

  private def parseLine(line: String): Map[String, String] =
    if (line.startsWith("{")) {
      // minimal JSON-object parse for flat string/number/bool fields
      val inner = line.stripPrefix("{").stripSuffix("}")
      splitTop(inner).map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") ->
          v.trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap
    } else
      splitTop(line).map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim -> v.trim
      }.toMap

  /** Split on commas not inside quotes. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = false; var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '"' => depth = !depth
      case ',' if !depth => out += s.substring(start, i); start = i + 1
      case _ =>
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def parseScalar(s: String): (Any, DataType) =
    if (s.matches("[+-]?\\d+")) (s.toLong, LongType)
    else if (s.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?")) (s.toDouble, DoubleType)
    else if (s.equalsIgnoreCase("true") || s.equalsIgnoreCase("false"))
      (s.toBoolean, BooleanType)
    else (s, StringType)

  private def unifyType(ts: Seq[DataType]): DataType =
    ts.distinct match {
      case Seq(t)                       => t
      case s if s.forall(t => t == LongType || t == DoubleType) => DoubleType
      case _                            => StringType
    }

  private def castTo(raw: String, t: DataType): Any = t match {
    case LongType    => raw.toLong
    case DoubleType  => raw.toDouble
    case BooleanType => raw.toBoolean
    case _           => raw
  }

  /** Detect datetime-like STRING columns and parse them — the reference's
    * `parse_df_datetimes` scans object columns' first values
    * (utils/dataframe.py:447-640). We sample up to `sampleRows` rows on the
    * driver (bounded, like the reference); a column converts when every
    * sampled non-null value matches an ISO timestamp/date shape. The actual
    * conversion is a codegen'd projection over the full frame. */
  def parseDatetimes(df: DataFrame, sampleRows: Int = 100): DataFrame = {
    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (stringCols.isEmpty) return df
    val sample = df.select(stringCols.map(col).toIndexedSeq: _*).limit(sampleRows).collect()
    val tsRe   = "\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}(:\\d{2}(\\.\\d+)?)?(Z|[+-]\\d{2}:?\\d{2})?"
    val dateRe = "\\d{4}-\\d{2}-\\d{2}"
    val zoneRe = ".*(Z|[+-]\\d{2}:?\\d{2})$"
    sealed trait Kind
    case object Naive extends Kind; case object Aware extends Kind
    case object AsDate extends Kind
    def classify(i: Int): Option[Kind] = {
      val vals = sample.flatMap(r => Option(r.getString(i)))
      if (vals.isEmpty) None
      // a MIXED aware/naive column classifies as Aware, not Naive:
      // to_timestamp parses both (naive values read in the session zone =
      // UTC), while to_timestamp_ntz rejects zone suffixes and would null
      // every aware value in the column
      else if (vals.forall(_.matches(tsRe)))
        Some(if (vals.exists(_.matches(zoneRe))) Aware else Naive)
      else if (vals.forall(_.matches(dateRe))) Some(AsDate)
      else None
    }
    val conversions = stringCols.zipWithIndex.flatMap { case (c, i) =>
      classify(i).map(c -> _)
    }.toMap
    if (conversions.isEmpty) df
    else df.select(df.columns.map { c =>
      conversions.get(c) match {
        // aware strings convert to UTC (session zone) then drop the zone —
        // the reference's coerce-to-UTC-then-store-naive convention
        case Some(Aware)  => to_timestamp(col(c)).cast(TimestampNTZType).as(c)
        case Some(Naive)  => to_timestamp_ntz(col(c)).as(c)
        case Some(AsDate) => to_date(col(c)).as(c)
        case _            => col(c)
      }
    }.toIndexedSeq: _*)
  }
}
