package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

import graft.functions.TextFns

/** Conversation (SFT / chat) data operators: the supervised-fine-tuning
  * side of a training-data pipeline stores conversations as JSON turn
  * arrays (`[{"role": ..., "content": ...}, ...]` — the de-facto
  * interchange shape). These ops parse, flatten, and gate them at corpus
  * scale: turn explosion for turn-level processing, and the structural
  * validation report (role alternation, empty turns, per-role token
  * budgets) every SFT ingest runs before templates are applied.
  *
  * Scale: parsing is `from_json` on the scan; [[chatTurns]] adds one
  * posexplode (rows ∝ turns); [[chatValidate]] is a PURE PROJECTION —
  * per-row array folds over the parsed turns, zero shuffle, so the gate
  * runs at ingest speed. All counts integral; the SQL oracle replays the
  * identical JSON-path reads.
  */
object Chat {

  private val turnSchema = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  private def parsed(jsonCol: Column): Column = from_json(jsonCol, turnSchema)

  /** Flatten conversations to one row per turn:
    * (id, turn_idx — 1-based, role, content, n_tokens). Malformed JSON
    * parses to null and contributes no rows (the standard quarantine
    * path: count them with [[chatValidate]]'s `parse_ok`). */
  def chatTurns(docs: DataFrame, idCol: String, jsonCol: String): DataFrame =
    docs.select(col(idCol), posexplode(parsed(col(jsonCol)))
        .as(Seq("i", "t")))
      .select(col(idCol), (col("i") + 1).as("turn_idx"),
        col("t.role").as("role"), col("t.content").as("content"),
        TextFns.tokenCount(col("t.content")).cast("long").as("n_tokens"))

  /** Structural validation report, one row per conversation:
    * parse_ok, n_turns, starts_user, ends_assistant,
    * n_role_violations (adjacent turns with the SAME role),
    * n_empty_turns (whitespace-only content),
    * user_tokens / assistant_tokens (whitespace tokens per role —
    * empty content counts 1, the `split` convention both engines share).
    * A failed parse yields (false, 0, false, false, 0, 0, 0, 0). */
  def chatValidate(docs: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val p = parsed(col(jsonCol))
    def report(t: Column): Column = {
      val roles = transform(t, x => x.getField("role"))
      val n = size(t)
      val adjSame = aggregate(sequence(lit(1), n - 1),
        lit(0L), (acc, i) =>
          acc + when(element_at(roles, i) === element_at(roles, i + 1), 1L)
            .otherwise(0L))
      def roleTokens(r: String): Column = aggregate(t, lit(0L), (acc, x) =>
        acc + when(x.getField("role") === r,
          TextFns.tokenCount(x.getField("content")).cast("long")).otherwise(0L))
      struct(
        lit(true).as("parse_ok"),
        n.cast("long").as("n_turns"),
        (element_at(roles, 1) === "user").as("starts_user"),
        (element_at(roles, -1) === "assistant").as("ends_assistant"),
        when(n >= 2, adjSame).otherwise(lit(0L)).as("n_role_violations"),
        aggregate(t, lit(0L), (acc, x) =>
          acc + when(length(trim(x.getField("content"))) === 0, 1L)
            .otherwise(0L)).as("n_empty_turns"),
        roleTokens("user").as("user_tokens"),
        roleTokens("assistant").as("assistant_tokens"))
    }
    val bad = struct(lit(false).as("parse_ok"), lit(0L).as("n_turns"),
      lit(false).as("starts_user"), lit(false).as("ends_assistant"),
      lit(0L).as("n_role_violations"), lit(0L).as("n_empty_turns"),
      lit(0L).as("user_tokens"), lit(0L).as("assistant_tokens"))
    docs.select(col(idCol),
        when(p.isNotNull, report(p)).otherwise(bad).as("r"))
      .select(col(idCol), col("r.*"))
  }

  /** DuckDB oracle replaying [[chatTurns]] over `jsonExpr`. */
  def chatTurnsOracleSql(table: String, idCol: String,
                         jsonExpr: String): String =
    s"""WITH p AS (
         SELECT $idCol, CAST(json_extract($jsonExpr, '$$') AS JSON[]) AS l
         FROM $table),
       t AS (
         SELECT $idCol, j AS turn_idx,
           json_extract_string(l[j], '$$.role') AS role,
           json_extract_string(l[j], '$$.content') AS content
         FROM p, unnest(generate_series(1, len(l))) AS u(j))
       SELECT $idCol, CAST(turn_idx AS INTEGER) AS turn_idx, role, content,
         CAST(len(string_split_regex(trim(content), '\\s+')) AS BIGINT) AS n_tokens
       FROM t ORDER BY $idCol, turn_idx"""

  /** DuckDB oracle replaying [[chatValidate]] over `jsonExpr` (inputs are
    * well-formed by construction in the driver queries, so the parse-fail
    * branch replays as the trivially-true parse_ok). */
  def chatValidateOracleSql(table: String, idCol: String,
                            jsonExpr: String): String =
    s"""WITH p AS (
         SELECT $idCol, CAST(json_extract($jsonExpr, '$$') AS JSON[]) AS l
         FROM $table),
       r AS (
         SELECT $idCol,
           list_transform(l, x -> json_extract_string(x, '$$.role')) AS roles,
           list_transform(l, x -> json_extract_string(x, '$$.content')) AS cs
         FROM p)
       SELECT $idCol, TRUE AS parse_ok,
         CAST(len(roles) AS BIGINT) AS n_turns,
         roles[1] = 'user' AS starts_user,
         roles[len(roles)] = 'assistant' AS ends_assistant,
         CAST(CASE WHEN len(roles) >= 2 THEN len(list_filter(
           generate_series(1, len(roles) - 1), i -> roles[i] = roles[i + 1]))
           ELSE 0 END AS BIGINT) AS n_role_violations,
         CAST(len(list_filter(cs, c -> length(trim(c)) = 0)) AS BIGINT)
           AS n_empty_turns,
         CAST(list_sum(list_transform(generate_series(1, len(roles)), i ->
           CASE WHEN roles[i] = 'user'
             THEN len(string_split_regex(trim(cs[i]), '\\s+')) ELSE 0 END))
           AS BIGINT) AS user_tokens,
         CAST(list_sum(list_transform(generate_series(1, len(roles)), i ->
           CASE WHEN roles[i] = 'assistant'
             THEN len(string_split_regex(trim(cs[i]), '\\s+')) ELSE 0 END))
           AS BIGINT) AS assistant_tokens
       FROM r ORDER BY $idCol"""
}
