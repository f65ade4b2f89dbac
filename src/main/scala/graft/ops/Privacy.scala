package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy auditing over quasi-identifier (QI) column sets — the
  * k-anonymity / l-diversity checks (Sweeney 2002; Machanavajjhala et al.
  * 2007) a pipeline runs BEFORE releasing or training on user-derived
  * tabular data: an equivalence class (a unique QI combination) smaller
  * than k re-identifies its members, and a class whose sensitive
  * attribute takes fewer than l distinct values leaks that attribute
  * even when the class itself is large.
  *
  * Scale: every report is ONE hash aggregate keyed on the QI tuple
  * (map-side combined), so the corpus collapses to |classes| rows before
  * any further math; the violation lists are capped under a total order
  * (severity, then the QI tuple), so driver-facing output stays bounded
  * no matter how pathological the QI choice is. Counts stay exact longs;
  * the one ratio widens to DECIMAL(38,0) before its ×1e6 micro-scaling
  * so 100 TB row counts cannot wrap a Long.
  *
  * Reference connection: none in Meerschaum — beyond-reference
  * LLM-pipeline surface (SURVEY §2.12).
  */
object Privacy {

  /** Equivalence classes violating k-anonymity: one row per QI class with
    * fewer than k members — the re-identification worklist, most
    * identifying (smallest) classes first, capped at `cap` rows under the
    * deterministic (class_size, QI…) total order. */
  def kAnonymityViolations(df: DataFrame, qiCols: Seq[String], k: Long,
                           cap: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 2 && cap >= 1, "bad k-anonymity parameters")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .where(col("class_size") < k)
      .orderBy(col("class_size") +: qiCols.map(col): _*)
      .limit(cap)
  }

  /** DuckDB oracle replaying [[kAnonymityViolations]]. `qiExprs` maps
    * output column name → SQL expression. */
  def kAnonymityViolationsOracleSql(table: String,
                                    qiExprs: Seq[(String, String)], k: Long,
                                    cap: Int): String = {
    val qi = qiExprs.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    val names = qiExprs.map(_._1).mkString(", ")
    s"""WITH src AS (SELECT $qi FROM $table),
       g AS (SELECT $names, count(*) AS class_size FROM src GROUP BY $names)
       SELECT $names, class_size FROM g WHERE class_size < $k
       ORDER BY class_size, $names LIMIT $cap"""
  }

  /** One-row k-anonymity summary of the full table: row/class totals, how
    * many classes (and rows) sit under k, the smallest class, and the
    * at-risk row fraction in floor-micro-units. */
  def kAnonymitySummary(df: DataFrame, qiCols: Seq[String],
                        k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 2, "bad k-anonymity parameters")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("cs"))
      .agg(sum(col("cs")).as("n_rows"), count(lit(1)).as("n_classes"),
        sum(when(col("cs") < k, lit(1L)).otherwise(lit(0L))).as("n_violating"),
        sum(when(col("cs") < k, col("cs")).otherwise(lit(0L)))
          .as("rows_at_risk"),
        min(col("cs")).as("min_class_size"))
      .select(col("n_rows"), col("n_classes"), col("n_violating"),
        col("rows_at_risk"), col("min_class_size"),
        expr("CAST(rows_at_risk AS DECIMAL(38,0)) * 1000000 div n_rows")
          .cast("long").as("at_risk_micro"))
  }

  /** DuckDB oracle replaying [[kAnonymitySummary]]. */
  def kAnonymitySummaryOracleSql(table: String,
                                 qiExprs: Seq[(String, String)],
                                 k: Long): String = {
    val qi = qiExprs.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    val names = qiExprs.map(_._1).mkString(", ")
    s"""WITH src AS (SELECT $qi FROM $table),
       g AS (SELECT $names, count(*) AS cs FROM src GROUP BY $names)
       SELECT CAST(sum(cs) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_classes,
         CAST(sum(CASE WHEN cs < $k THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
         CAST(sum(CASE WHEN cs < $k THEN cs ELSE 0 END) AS BIGINT)
           AS rows_at_risk,
         CAST(min(cs) AS BIGINT) AS min_class_size,
         CAST(CAST(sum(CASE WHEN cs < $k THEN cs ELSE 0 END) AS HUGEINT)
           * 1000000 // sum(cs) AS BIGINT) AS at_risk_micro
       FROM g"""
  }

  /** Equivalence classes violating l-diversity: QI classes whose sensitive
    * column takes fewer than l distinct values (a size-1000 class all
    * sharing one diagnosis leaks it to anyone who can place a member in
    * the class). Least-diverse first, capped like
    * [[kAnonymityViolations]]. The distinct count is exact — the shuffle
    * key is (QI, sensitive), so the expansion stays one aggregate deep. */
  def lDiversityViolations(df: DataFrame, qiCols: Seq[String],
                           sensitiveCol: String, l: Long,
                           cap: Int): DataFrame = {
    require(qiCols.nonEmpty && l >= 2 && cap >= 1, "bad l-diversity parameters")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .where(col("n_sensitive") < l)
      .orderBy(col("n_sensitive") +: col("class_size") +: qiCols.map(col): _*)
      .limit(cap)
  }

  /** Equivalence classes violating t-CLOSENESS (Li et al. 2007 — the
    * third rung above k-anonymity/l-diversity): a class passes only if
    * its sensitive-attribute distribution stays within `t` of the
    * corpus-wide distribution, here in TOTAL-VARIATION distance
    * TV = ½·Σₛ |p_class(s) − p_corpus(s)| — l-diversity misses the class
    * that has many distinct values but is still 95% one diagnosis.
    *
    * Exactness: TV is a pure integer rational —
    * Σₛ |c_cs·N − g_s·n_c| / (2·n_c·N) — including the absent-value term
    * Σ_{s∉class} g_s·n_c = (N − Σ_{s∈class} g_s)·n_c, so no per-class
    * zero-fill against the sensitive domain ever materializes. Products
    * widen to DECIMAL(38,0) (c·N reaches 10²⁴ at corpus scale).
    *
    * Scale: one (QI, sensitive) aggregate, a join against the
    * |sensitive-domain|-row global table (broadcast — the domain is
    * bounded), one class rollup; worklist capped most-leaking-first
    * under a (TV DESC, QI…) total order. */
  def tClosenessViolations(df: DataFrame, qiCols: Seq[String],
                           sensitiveCol: String, tMicro: Long,
                           cap: Int): DataFrame = {
    require(qiCols.nonEmpty && tMicro >= 0L && tMicro <= 1000000L && cap >= 1,
      "bad t-closeness parameters")
    val qi = qiCols.map(col)
    val cs = df.groupBy((qi :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("c_cs"))
    val nc = cs.groupBy(qi: _*).agg(sum(col("c_cs")).as("class_size"))
    val g = df.groupBy(col(sensitiveCol)).agg(count(lit(1)).as("g_s"))
    val tot = df.agg(count(lit(1)).as("nn"))
    cs.join(broadcast(g), Seq(sensitiveCol))
      .join(nc, qiCols)
      .crossJoin(broadcast(tot))
      .groupBy(qi: _*)
      .agg(max(col("class_size")).as("class_size"),
        sum(expr("abs(CAST(c_cs AS DECIMAL(38,0)) * nn" +
          " - CAST(g_s AS DECIMAL(38,0)) * class_size)")).as("a"),
        sum(col("g_s")).as("g_present"), max(col("nn")).as("nn"))
      .select((qi :+ col("class_size") :+
        expr("CAST((a + (CAST(nn AS DECIMAL(38,0)) - g_present) * class_size)" +
          " * 1000000 div (CAST(2 AS DECIMAL(38,0)) * class_size * nn)" +
          " AS BIGINT)").as("tv_micro")): _*)
      .where(col("tv_micro") > tMicro)
      .orderBy((col("tv_micro").desc +: qi): _*)
      .limit(cap)
  }

  /** DuckDB oracle replaying [[tClosenessViolations]]. */
  def tClosenessViolationsOracleSql(table: String,
                                    qiExprs: Seq[(String, String)],
                                    sensitiveExpr: String, tMicro: Long,
                                    cap: Int): String = {
    val qi = qiExprs.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    val names = qiExprs.map(_._1).mkString(", ")
    s"""WITH src AS (SELECT $qi, $sensitiveExpr AS sens FROM $table),
       cs AS (SELECT $names, sens, CAST(count(*) AS BIGINT) AS c_cs
              FROM src GROUP BY $names, sens),
       nc AS (SELECT $names, CAST(sum(c_cs) AS BIGINT) AS class_size
              FROM cs GROUP BY $names),
       g AS (SELECT sens, CAST(count(*) AS BIGINT) AS g_s
             FROM src GROUP BY sens),
       t AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM src),
       r AS (SELECT $names, max(class_size) AS class_size,
               sum(abs(CAST(c_cs AS HUGEINT) * nn
                 - CAST(g_s AS HUGEINT) * class_size)) AS a,
               CAST(sum(g_s) AS BIGINT) AS g_present, max(nn) AS nn
             FROM cs JOIN g USING (sens) JOIN nc USING ($names), t
             GROUP BY $names),
       v AS (SELECT $names, class_size,
               CAST((a + (CAST(nn AS HUGEINT) - g_present) * class_size)
                 * 1000000 // (CAST(2 AS HUGEINT) * class_size * nn)
                 AS BIGINT) AS tv_micro
             FROM r)
       SELECT $names, class_size, tv_micro FROM v
       WHERE tv_micro > $tMicro
       ORDER BY tv_micro DESC, $names LIMIT $cap"""
  }

  /** DuckDB oracle replaying [[lDiversityViolations]]. */
  def lDiversityViolationsOracleSql(table: String,
                                    qiExprs: Seq[(String, String)],
                                    sensitiveExpr: String, l: Long,
                                    cap: Int): String = {
    val qi = qiExprs.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    val names = qiExprs.map(_._1).mkString(", ")
    s"""WITH src AS (SELECT $qi, $sensitiveExpr AS sens FROM $table),
       g AS (SELECT $names, count(*) AS class_size,
               count(DISTINCT sens) AS n_sensitive
             FROM src GROUP BY $names)
       SELECT $names, class_size, n_sensitive FROM g WHERE n_sensitive < $l
       ORDER BY n_sensitive, class_size, $names LIMIT $cap"""
  }
}
