package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.{Dtypes, MrsmType}

/** Dynamic-schema reconciliation between the target table and an incoming
  * batch — the Spark form of the reference's ALTER-TABLE-ADD + type
  * promotion on conflict (meerschaum/connectors/sql/_pipes.py:3373-3834,
  * utils/dataframe.py:268-295 `add_missing_cols_to_df`).
  *
  * Produces a unified schema: union of columns; conflicting types resolved
  * by [[Dtypes.promote]] (ints widen, int+float → numeric, incompatible →
  * string); missing columns padded with typed nulls. Both sides are then
  * cast to that schema so downstream joins/unions never hit an analysis
  * mismatch. All casts are Catalyst expressions — schema evolution costs one
  * projection, no extra shuffle.
  */
object SchemaEvolution {

  final case class Aligned(existing: DataFrame, incoming: DataFrame, schema: StructType)

  def unifiedSchema(existing: StructType, incoming: StructType,
                    mixedNumerics: Boolean = true): StructType = {
    val byName = existing.fields.map(f => f.name -> f).toMap
    val merged = existing.fields.map { ef =>
      incoming.fields.find(_.name == ef.name) match {
        case Some(inf) if inf.dataType != ef.dataType =>
          val p = Dtypes.promote(Dtypes.fromSpark(ef.dataType),
                                 Dtypes.fromSpark(inf.dataType), mixedNumerics)
          StructField(ef.name, p.spark, nullable = true)
        case _ => ef.copy(nullable = true)
      }
    } ++ incoming.fields.filterNot(f => byName.contains(f.name)).map(_.copy(nullable = true))
    StructType(merged)
  }

  /** Cast/pad one side to the unified schema, preserving its column order
    * plus appended new columns. */
  def conform(df: DataFrame, unified: StructType): DataFrame = {
    val cols = unified.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  def align(existing: DataFrame, incoming: DataFrame,
            mixedNumerics: Boolean = true): Aligned = {
    val u = unifiedSchema(existing.schema, incoming.schema, mixedNumerics)
    Aligned(conform(existing, u), conform(incoming, u), u)
  }

  /** Enforce declared pipe dtypes on a batch (reference `enforce_dtypes`,
    * meerschaum/utils/dataframe.py:1236-1580): only declared columns are
    * cast; undeclared columns pass through for inference. */
  def enforceDtypes(df: DataFrame, dtypes: Map[String, MrsmType]): DataFrame = {
    if (dtypes.isEmpty) df
    else {
      val cols = df.schema.fields.map { f =>
        dtypes.get(f.name) match {
          case Some(t) if t.spark != f.dataType => col(f.name).cast(t.spark).as(f.name)
          case _                                => col(f.name)
        }
      }
      df.select(cols.toIndexedSeq: _*)
    }
  }
}
