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

  /** Render conversations to the training string: every turn becomes
    * `<|role|>` + newline + content, turns joined by newlines — the
    * template step between validation and packing. Pure projection (one
    * transform + concat per row, zero shuffle); output
    * (id, rendered, n_tokens) feeds [[Corpus.chunkDocs]]/packing
    * unchanged. */
  def chatRender(docs: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val t = parsed(col(jsonCol))
    val rendered = concat_ws("\n",
      transform(t, x => concat(lit("<|"), x.getField("role"), lit("|>\n"),
        x.getField("content"))))
    docs.select(col(idCol), rendered.as("rendered"),
      TextFns.tokenCount(rendered).cast("long").as("n_tokens"))
  }

  /** DuckDB oracle replaying [[chatRender]] over `jsonExpr`. */
  def chatRenderOracleSql(table: String, idCol: String,
                          jsonExpr: String): String =
    s"""WITH p AS (
         SELECT $idCol, CAST(json_extract($jsonExpr, '$$') AS JSON[]) AS l
         FROM $table),
       r AS (
         SELECT $idCol, array_to_string(list_transform(l, x ->
           '<|' || json_extract_string(x, '$$.role') || '|>' || chr(10) ||
           json_extract_string(x, '$$.content')), chr(10)) AS rendered
         FROM p)
       SELECT $idCol, rendered,
         CAST(len(string_split_regex(trim(rendered), '\\s+')) AS BIGINT)
           AS n_tokens
       FROM r ORDER BY $idCol"""

  /** Preference-pair (DPO/RLHF) QA report, one row per pair:
    * chosen/rejected token counts, `same_response` (the degenerate pair
    * every preference pipeline must drop), the chosen:rejected length
    * ratio in micro-units (length-bias audit — reward models overfit to
    * "longer wins"), and `n_prompt_dups` (pairs sharing this prompt —
    * near-duplicate prompts leak preference signal across splits).
    *
    * Scale: per-pair columns are a pure projection; the prompt-dup count
    * is ONE md5-keyed aggregate joined back — the only shuffle, carrying
    * (fp, count) pairs. */
  def preferenceChecks(pairs: DataFrame, idCol: String, promptCol: String,
                       chosenCol: String, rejectedCol: String): DataFrame = {
    val base = pairs.select(col(idCol),
      md5(col(promptCol)).as("__fp"),
      TextFns.tokenCount(col(chosenCol)).cast("long").as("chosen_tokens"),
      TextFns.tokenCount(col(rejectedCol)).cast("long").as("rejected_tokens"),
      (col(chosenCol) === col(rejectedCol)).as("same_response"))
    val dups = base.groupBy(col("__fp")).agg(count(lit(1)).as("n_prompt_dups"))
    base.join(dups, Seq("__fp"))
      .select(col(idCol), col("chosen_tokens"), col("rejected_tokens"),
        col("same_response"),
        expr("chosen_tokens * 1000000L div greatest(rejected_tokens, 1L)")
          .as("len_ratio_micro"),
        col("n_prompt_dups"))
  }

  /** DuckDB oracle replaying [[preferenceChecks]] — `promptExpr` /
    * `chosenExpr` / `rejectedExpr` are SQL expressions over `table`. */
  def preferenceChecksOracleSql(table: String, idCol: String,
                                promptExpr: String, chosenExpr: String,
                                rejectedExpr: String): String =
    s"""WITH b AS (
         SELECT $idCol, md5($promptExpr) AS fp,
           CAST(len(string_split_regex(trim($chosenExpr), '\\s+')) AS BIGINT)
             AS chosen_tokens,
           CAST(len(string_split_regex(trim($rejectedExpr), '\\s+')) AS BIGINT)
             AS rejected_tokens,
           $chosenExpr = $rejectedExpr AS same_response
         FROM $table),
       d AS (SELECT fp, count(*) AS n_prompt_dups FROM b GROUP BY fp)
       SELECT b.$idCol, chosen_tokens, rejected_tokens, same_response,
         chosen_tokens * 1000000 // greatest(rejected_tokens, 1)
           AS len_ratio_micro,
         CAST(n_prompt_dups AS BIGINT) AS n_prompt_dups
       FROM b JOIN d USING (fp) ORDER BY b.$idCol"""

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

  /** DuckDB oracle for the turn-level-dedup COMPOSITION
    * ([[chatTurns]] → role filter → keep-first per content): duplicated
    * assistant replies across conversations collapse to their first
    * conversation id plus a copy count. */
  def chatTurnDedupOracleSql(table: String, idCol: String, jsonExpr: String,
                             role: String): String =
    s"""WITH p AS (
         SELECT $idCol, CAST(json_extract($jsonExpr, '$$') AS JSON[]) AS l
         FROM $table),
       t AS (
         SELECT $idCol,
           json_extract_string(l[j], '$$.role') AS role,
           json_extract_string(l[j], '$$.content') AS content
         FROM p, unnest(generate_series(1, len(l))) AS u(j))
       SELECT content, min($idCol) AS first_id,
         CAST(count(*) AS BIGINT) AS n_copies
       FROM t WHERE role = '$role'
       GROUP BY content ORDER BY content"""

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
