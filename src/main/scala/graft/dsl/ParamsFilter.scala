package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's params filter DSL → Catalyst `Column` predicates.
  *
  * Semantics follow Meerschaum's `build_where`
  * (reference: meerschaum/utils/sql.py:1085-1218) and `query_df`
  * (meerschaum/utils/dataframe.py:1813-2058):
  *
  *   - scalar value            ⇒ `col = v`
  *   - `None`/null             ⇒ `col IS NULL`
  *   - string with `_` prefix  ⇒ negation (`col != v`)
  *   - `"_None"`               ⇒ `col IS NOT NULL`
  *   - list                    ⇒ `col IN (...)`; a null element adds `OR col IS NULL`
  *   - list of `_`-prefixed    ⇒ `col NOT IN (...)`; `_None` element adds `AND col IS NOT NULL`
  *   - mixed include/exclude   ⇒ conjunction of the IN and NOT-IN parts
  *   - map value               ⇒ JSON field equality on a JSON-text column
  *     (each key compared via `get_json_object`)
  *
  * SQL three-valued logic applies (as in the reference's SQL path): a plain
  * exclusion does not match NULLs unless `_None`-style inclusion says so.
  * Everything stays a Catalyst expression — filters compose and push down to
  * the scan, which is what makes this viable on a 100 TB table.
  */
object ParamsFilter {

  /** Marker for an explicit NULL in a params value (Scala `null` also works). */
  case object Null

  /** Typed negation — the Scala-side equivalent of the reference's string
    * `_` prefix, for non-string values (`Not(3L)` ⇒ `col != 3`). */
  final case class Not(value: Any)

  def toPredicate(params: Map[String, Any]): Column =
    params.foldLeft(lit(true)) { case (acc, (key, value)) => acc && forColumn(key, value) }

  def forColumn(name: String, value: Any): Column = value match {
    case null | None | Null  => col(name).isNull
    case Not(null | None | Null) => col(name).isNotNull
    case Not(v)              => col(name) =!= lit(v)
    case m: Map[_, _]        => jsonEquality(name, m.asInstanceOf[Map[String, Any]])
    case vs: Seq[_]          => inList(name, vs)
    case s: String           => scalarPredicate(name, s)
    case v                   => col(name) === lit(v)
  }

  private def scalarPredicate(name: String, s: String): Column =
    if (isNegation(s)) {
      val inner = s.substring(1)
      if (isNullLiteral(inner)) col(name).isNotNull
      else col(name) =!= lit(inner)
    } else if (isNullLiteral(s)) col(name).isNull
    else col(name) === lit(s)

  private def inList(name: String, vs: Seq[Any]): Column = {
    val (exclude, include) = vs.partition {
      case s: String => isNegation(s)
      case Not(_)    => true
      case _         => false
    }
    val (incNulls, incVals) = include.partition {
      case null | None | Null => true
      case s: String          => isNullLiteral(s)
      case _                  => false
    }
    val excStripped = exclude.map {
      case s: String => s.substring(1)
      case Not(v)    => v
    }
    val (excNulls, excVals) = excStripped.partition {
      case null | None | Null => true
      case s: String          => isNullLiteral(s)
      case _                  => false
    }

    val incPred: Option[Column] = (incVals.nonEmpty, incNulls.nonEmpty) match {
      case (true, true)   => Some(col(name).isin(incVals: _*) || col(name).isNull)
      case (true, false)  => Some(col(name).isin(incVals: _*))
      case (false, true)  => Some(col(name).isNull)
      case (false, false) => None
    }
    val excPred: Option[Column] = (excVals.nonEmpty, excNulls.nonEmpty) match {
      case (true, true)   => Some(!col(name).isin(excVals: _*) && col(name).isNotNull)
      case (true, false)  => Some(!col(name).isin(excVals: _*))
      case (false, true)  => Some(col(name).isNotNull)
      case (false, false) => None
    }
    (incPred, excPred) match {
      case (Some(i), Some(e)) => i && e
      case (Some(i), None)    => i
      case (None, Some(e))    => e
      case (None, None)       => lit(true)
    }
  }

  /** JSON-text params: `{'meta': {'k': 'v'}}` matches rows whose JSON column
    * has field `k` equal to `v` (reference compares serialized JSON text;
    * field-wise comparison is the semantic equivalent that still pushes work
    * into codegen'd expressions).
    */
  private def jsonEquality(name: String, m: Map[String, Any]): Column =
    m.foldLeft(lit(true)) { case (acc, (k, v)) =>
      acc && (get_json_object(col(name), s"$$.$k") === lit(v.toString))
    }

  private def isNegation(s: String): Boolean = s.startsWith("_")
  private def isNullLiteral(s: String): Boolean =
    s == "None" || s == "none" || s == "null" || s == "NULL"
}
