package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.types.MrsmType

/** Special-column inference: detect `uuid` / `json` semantics hiding in
  * plain string columns, the engine analogue of the reference's dtype
  * detection on object columns (`get_uuid_cols` / `get_json_cols`,
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
        count(when(isJson, lit(1))).as(s"__json_$c"))
    }
    val row = df.limit(sampleRows).agg(aggs.head, aggs.tail: _*).head()

    candidates.flatMap { c =>
      val n    = row.getAs[Long](s"__n_$c")
      val uuid = row.getAs[Long](s"__uuid_$c")
      val json = row.getAs[Long](s"__json_$c")
      if (n == 0L) None
      else if (uuid == n) Some(c -> (MrsmType.MUuid: MrsmType))
      else if (json == n) Some(c -> (MrsmType.MJson: MrsmType))
      else None
    }.toMap
  }
}
