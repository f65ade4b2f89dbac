package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.types.MrsmType

/** Special-column inference: detect `uuid` / `json` / `datetime` / `date` /
  * `bool` / `numeric` semantics hiding in plain string columns — the engine
  * analogue of the reference's dtype detection on object columns
  * (`get_uuid_cols` / `get_json_cols` / `get_datetime_cols` /
  * `get_date_cols` / `get_bool_cols` / `get_numeric_cols`,
  * meerschaum/utils/dataframe.py:642-1234). The reference inspects Python
  * object types; here typed sources hand us strings, so the shape of the
  * VALUES decides: a column is special only when EVERY sampled non-null
  * value matches.
  *
  * Scale notes: one aggregate over a row-limited slice of the batch — the
  * limit is pushed into the scan (LocalLimit per partition), all predicates
  * are codegen'd, and nothing is collected but one row of counters. Columns
  * already carrying a declared dtype are skipped, so steady-state syncs pay
  * nothing once the catalog records the detection.
  */
object SpecialCols {

  private val UuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
  private val DateRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
  private val DatetimeRe =
    "^[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}(:[0-9]{2}(\\.[0-9]+)?)?(Z|[+-][0-9]{2}:?[0-9]{2})?$"
  private val NumericRe = "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
  private val BoolRe = "^(true|false|True|False)$"

  /** Infer special dtypes for undeclared string columns of `df`.
    * Returns only the detections (column → MUuid | MJson); callers merge
    * into the spec's dtypes. `sampleRows` bounds the scan (the reference
    * scans whole pandas frames — frames there are one chunk, so a bounded
    * sample is the honest distributed equivalent).
    */
  def infer(df: DataFrame, declared: Set[String] = Set.empty,
            sampleRows: Int = 10000): Map[String, MrsmType] = {
    val candidates = df.schema.fields
      .filter(f => f.dataType == StringType && !declared.contains(f.name))
      .map(_.name).toSeq
    if (candidates.isEmpty) return Map.empty

    val aggs = candidates.flatMap { c =>
      val v = col(c)
      val first = substring(ltrim(v), 1, 1)
      // object/array JSON text only — scalars ("123", "abc") stay strings,
      // matching the reference's dict/list detection
      val isJson = first.isin("{", "[") && try_parse_json(v).isNotNull
      Seq(
        count(v).as(s"__n_$c"),
        count(when(v.rlike(UuidRe), lit(1))).as(s"__uuid_$c"),
        count(when(isJson, lit(1))).as(s"__json_$c"),
        count(when(v.rlike(DatetimeRe), lit(1))).as(s"__dt_$c"),
        count(when(v.rlike(DateRe), lit(1))).as(s"__date_$c"),
        count(when(v.rlike(NumericRe), lit(1))).as(s"__num_$c"),
        count(when(v.rlike(BoolRe), lit(1))).as(s"__bool_$c"))
    }
    val row = df.limit(sampleRows).agg(aggs.head, aggs.tail: _*).head()

    // precedence mirrors the reference's per-kind scans (most specific
    // shape first — a uuid is never claimed as text, an all-"true" column
    // is bool before numeric could ever match it)
    candidates.flatMap { c =>
      def all(kind: String): Boolean =
        row.getAs[Long](s"__${kind}_$c") == row.getAs[Long](s"__n_$c")
      if (row.getAs[Long](s"__n_$c") == 0L) None
      else if (all("uuid")) Some(c -> (MrsmType.MUuid: MrsmType))
      else if (all("json")) Some(c -> (MrsmType.MJson: MrsmType))
      else if (all("dt"))   Some(c -> (MrsmType.MDatetime(tz = false): MrsmType))
      else if (all("date")) Some(c -> (MrsmType.MDate: MrsmType))
      else if (all("bool")) Some(c -> (MrsmType.MBool: MrsmType))
      else if (all("num"))  Some(c -> (MrsmType.MNumeric(): MrsmType))
      else None
    }.toMap
  }
}
