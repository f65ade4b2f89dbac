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
    * has field `k` equal to `v` (reference compares serialized JSON text —
    * meerschaum/utils/sql.py:1085-1218; field-wise TYPED comparison is the
    * semantic equivalent that still pushes into codegen'd expressions).
    * Values compare by type — numbers numerically (so 87 matches "87.0"),
    * booleans as booleans, nested maps recurse on the JSON path — instead of
    * `toString` equality, which silently mismatches floats and booleans.
    */
  private def jsonEquality(name: String, m: Map[String, Any]): Column =
    jsonPathEquality(col(name), "$", m)

  private def jsonPathEquality(c: Column, path: String, m: Map[String, Any]): Column =
    m.foldLeft(lit(true)) { case (acc, (k, v)) =>
      val p = s"$path.$k"
      val j = get_json_object(c, p)
      val cmp = v match {
        case null | None | Null => j.isNull
        case b: Boolean         => j.cast("boolean") === lit(b)
        case n @ (_: Long | _: Int | _: Short | _: Byte) =>
          j.cast("double") === lit(n.toString.toDouble)
        case d: Double          => j.cast("double") === lit(d)
        case f: Float           => j.cast("double") === lit(f.toDouble)
        case nested: Map[_, _]  =>
          jsonPathEquality(c, p, nested.asInstanceOf[Map[String, Any]])
        case s                  => j === lit(s.toString)
      }
      acc && cmp
    }

  /** Render the DSL as an ANSI SQL WHERE fragment, for pushdown into a JDBC
    * definition subquery (the reference's `build_where`,
    * meerschaum/utils/sql.py:1085-1218 — one ANSI dialect here; Catalyst and
    * the remote engine handle the rest). Identifiers are emitted bare; values
    * are escaped literals. JSON-map params are not expressible portably and
    * are rejected rather than silently dropped.
    *
    * `ident` renders a column reference (default: bare name, for definition
    * subqueries against externally-owned tables); `lit` renders a value
    * (default: JDBC-escape literals). [[graft.storage.JdbcStore]] passes a
    * dialect-quoting/CLOB-casting `ident` and its dialect's `lit` to push
    * the SAME semantics into a remote `DELETE`.
    */
  def toSql(params: Map[String, Any],
            ident: String => String = identity,
            lit: Any => String = SqlText.literal): String =
    params.toSeq.map { case (k, v) => sqlForColumn(ident(k), v, lit) }
      .filter(_.nonEmpty).mkString(" AND ")

  private def sqlForColumn(name: String, value: Any,
                           lit: Any => String): String = value match {
    case null | None | Null      => s"$name IS NULL"
    case Not(null | None | Null) => s"$name IS NOT NULL"
    case Not(v)                  => s"$name <> ${lit(v)}"
    case _: Map[_, _] => throw new IllegalArgumentException(
      s"JSON-map param '$name' cannot be pushed into a JDBC WHERE clause")
    case vs: Seq[_]   => sqlInList(name, vs, lit)
    case s: String if isNegation(s) =>
      val inner = s.substring(1)
      if (isNullLiteral(inner)) s"$name IS NOT NULL"
      else s"$name <> ${lit(inner)}"
    case s: String if isNullLiteral(s) => s"$name IS NULL"
    case v => s"$name = ${lit(v)}"
  }

  private def sqlInList(name: String, vs: Seq[Any],
                        lit: Any => String): String = {
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
    def inClause(vals: Seq[Any]) = vals.map(lit).mkString("(", ", ", ")")
    val inc = (incVals.nonEmpty, incNulls.nonEmpty) match {
      case (true, true)   => Some(s"($name IN ${inClause(incVals)} OR $name IS NULL)")
      case (true, false)  => Some(s"$name IN ${inClause(incVals)}")
      case (false, true)  => Some(s"$name IS NULL")
      case (false, false) => None
    }
    val exc = (excVals.nonEmpty, excNulls.nonEmpty) match {
      case (true, true)   => Some(s"($name NOT IN ${inClause(excVals)} AND $name IS NOT NULL)")
      case (true, false)  => Some(s"$name NOT IN ${inClause(excVals)}")
      case (false, true)  => Some(s"$name IS NOT NULL")
      case (false, false) => None
    }
    Seq(inc, exc).flatten.mkString(" AND ")
  }

  private def isNegation(s: String): Boolean = s.startsWith("_")
  private def isNullLiteral(s: String): Boolean =
    s == "None" || s == "none" || s == "null" || s == "NULL"
}

/** ANSI SQL literal rendering for values pushed into JDBC subqueries. */
object SqlText {
  def literal(v: Any): String = v match {
    // JDBC escape syntax: every JDBC driver translates {ts '...'} to its
    // native timestamp literal (Derby, for one, rejects ANSI TIMESTAMP '...')
    case d: java.time.LocalDateTime => s"{ts '${tsString(d)}'}"
    case i: java.time.Instant =>
      s"{ts '${tsString(java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC))}'}"
    case t: java.sql.Timestamp => s"{ts '${tsString(t.toLocalDateTime)}'}"
    case d: java.sql.Date      => s"{d '${d.toString}'}"
    case d: java.time.LocalDate => s"{d '${d.toString}'}"
    case n @ (_: Long | _: Int | _: Short | _: Byte) => n.toString
    case n @ (_: Double | _: Float)                  => n.toString
    case b: Boolean                                  => b.toString.toUpperCase
    case s: String => "'" + s.replace("'", "''") + "'"
    case other => throw new IllegalArgumentException(
      s"cannot render SQL literal for ${other.getClass.getName}")
  }

  /** JDBC partition-bound string form (timestamps without the T separator). */
  def boundString(v: Any): String = v match {
    case d: java.time.LocalDateTime => tsString(d)
    case i: java.time.Instant =>
      tsString(java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC))
    case other => other.toString
  }

  private def tsString(d: java.time.LocalDateTime): String = {
    val base = d.toString.replace('T', ' ')
    if (base.length == 16) base + ":00" else base // LocalDateTime drops :00 seconds
  }
}
