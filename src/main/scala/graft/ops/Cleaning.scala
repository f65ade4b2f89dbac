package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Line-level corpus cleaning — the two standard web-text scrubbers that
  * run BEFORE document-level quality filters in every production pipeline:
  *
  *   - the C4 line gates (Raffel et al. 2020 §2.2): keep only lines that
  *     read like prose (terminal punctuation, a minimum word count, no
  *     "javascript" placeholder), and kill pages with code braces or
  *     boilerplate filler ("lorem ipsum");
  *   - per-SOURCE boilerplate detection (the CCNet/RefinedWeb observation
  *     that nav bars, cookie banners and footers repeat across most pages
  *     of one site): a line present in more than a threshold fraction of a
  *     source's documents is template chrome, not content.
  *
  * Both are deliberately separate from [[Corpus.dedupLines]] (global
  * keep-first line dedup): the C4 gates are per-row rules, the boilerplate
  * detector is a per-source frequency rule, and global line dedup is a
  * corpus-wide first-occurrence rule — pipelines chain them.
  */
object Cleaning {

  /** C4 line-level cleaning (Raffel et al. 2020 §2.2). Line gates, all
    * applied to the whitespace-trimmed line:
    *   - ends in terminal punctuation (`.`, `!`, `?`, `"`);
    *   - has at least `minWords` whitespace-separated words;
    *   - does not contain the token "javascript" (case-insensitive).
    * Page gates: at least `minLines` surviving lines, no `{` anywhere
    * (code), no "lorem ipsum" (case-insensitive) anywhere (filler).
    *
    * Output: (id, clean_text, n_lines, n_kept, keep) — the cleaned text is
    * returned even when `keep` is false so audits can diff what the gate
    * would have shipped.
    *
    * Scale: a PURE scan projection — the line split, the lambda filter and
    * the page flags all evaluate per row with ZERO shuffles at any corpus
    * size; at 100 TB this fuses into the scan stage of whatever runs next.
    */
  def c4LineClean(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 5, minLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keptLines = filter(lines, l => {
      val t = trim(l)
      (t.endsWith(".") || t.endsWith("!") || t.endsWith("?") || t.endsWith("\"")) &&
        size(split(t, "\\s+")) >= minWords &&
        !array_contains(split(lower(t), "\\s+"), "javascript")
    })
    docs.select(col(idCol),
        size(lines).cast("long").as("n_lines"),
        array_join(keptLines, "\n").as("clean_text"),
        size(keptLines).cast("long").as("n_kept"),
        (size(keptLines) >= minLines &&
          !contains(lower(col(textCol)), lit("lorem ipsum")) &&
          !contains(col(textCol), lit("{"))).as("keep"))
      .select(col(idCol), col("clean_text"), col("n_lines"), col("n_kept"),
        col("keep"))
  }

  /** DuckDB oracle replaying [[c4LineClean]] over `textExpr` (a SQL
    * expression so callers can synthesize the same multi-line input the
    * Spark query builds). */
  def c4LineCleanOracleSql(table: String, idCol: String, textExpr: String,
                           minWords: Int = 5, minLines: Int = 3): String =
    s"""WITH d AS (SELECT $idCol, $textExpr AS __t FROM $table),
       k AS (SELECT $idCol, __t,
           string_split(__t, chr(10)) AS ls,
           list_filter(string_split(__t, chr(10)), l ->
             (ends_with(trim(l), '.') OR ends_with(trim(l), '!') OR
              ends_with(trim(l), '?') OR ends_with(trim(l), '"')) AND
             len(string_split_regex(trim(l), '\\s+')) >= $minWords AND
             NOT list_contains(string_split_regex(trim(lower(l)), '\\s+'),
               'javascript')) AS kept
         FROM d)
       SELECT $idCol,
         array_to_string(kept, chr(10)) AS clean_text,
         CAST(len(ls) AS BIGINT) AS n_lines,
         CAST(len(kept) AS BIGINT) AS n_kept,
         len(kept) >= $minLines AND
           NOT contains(lower(__t), 'lorem ipsum') AND
           NOT contains(__t, '{') AS keep
       FROM k ORDER BY $idCol"""

  /** Template-line (boilerplate) DETECTION per source: lines of at least
    * `minLineLen` trimmed characters that appear in at least `minDocs`
    * documents AND at least `minFrac` of the source's documents. Each
    * document contributes each distinct line once (a page repeating its own
    * footer twice is repetition, not prevalence). Returns only the flagged
    * rows: (source, line, df, n_docs, df_frac).
    *
    * The prevalence test compares INTEGERS — `df · 1e6 ≥ round(minFrac·1e6)
    * · n_docs` — so the flag replays bit-exactly on any engine.
    *
    * Scale: one (source, line)-keyed hash aggregate with map-side combine
    * (the line text shuffles once; at 100 TB narrow the key to xxhash64 and
    * join text back for the report), plus a broadcast |sources|-row count
    * table. Output ∝ flagged template lines, not corpus size.
    */
  def boilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                       sourceCol: String, minFrac: Double = 0.5,
                       minDocs: Long = 2L, minLineLen: Int = 10): DataFrame = {
    val fracMicro = math.round(minFrac * 1e6)
    val perDocLines = docs.select(col(sourceCol),
        explode(array_distinct(split(col(textCol), "\n"))).as("line"))
      .where(length(trim(col("line"))) >= minLineLen)
    val df = perDocLines.groupBy(col(sourceCol), col("line"))
      .agg(count(lit(1)).as("df"))
    val nDocs = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    df.join(broadcast(nDocs), sourceCol)
      .where(col("df") >= minDocs &&
        col("df") * lit(1000000L) >= lit(fracMicro) * col("n_docs"))
      .select(col(sourceCol), col("line"), col("df"), col("n_docs"),
        (col("df").cast("double") / col("n_docs").cast("double")).as("df_frac"))
  }

  /** Boilerplate REMOVAL: drop every line [[boilerplateLines]] flags for
    * the document's source and reassemble the text in original line order.
    * Output: (id, clean_text, n_kept, n_removed); documents whose every
    * line was template chrome survive with empty text (the downstream
    * length gate kills them — removal itself never drops documents).
    *
    * Scale: the flagged-line table is output-sized (template lines only) →
    * BROADCAST left-anti join against the exploded lines; the only shuffle
    * is the per-document regroup. Detection's aggregate is shared, not
    * recomputed, when callers pass a persisted report in.
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                        sourceCol: String, minFrac: Double = 0.5,
                        minDocs: Long = 2L, minLineLen: Int = 10): DataFrame = {
    val flagged = boilerplateLines(docs, idCol, textCol, sourceCol,
      minFrac, minDocs, minLineLen).select(col(sourceCol), col("line"))
    val pos = docs.select(col(idCol), col(sourceCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val kept = pos.join(broadcast(flagged), Seq(sourceCol, "line"), "left_anti")
    // collect_list state ≤ the doc's own line count — the regroup only ever
    // rebuilds ONE document's text, so the buffer is bounded by the largest
    // single document (the same bound the doc's original text row already
    // imposes on the pipeline), never by the corpus
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(transform(
             array_sort(collect_list(struct(col("pos"), col("line")))),
             s => s.getField("line")), "\n").as("clean_text"),
           count(lit(1)).as("n_kept"))
    docs.select(col(idCol), size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** PII exposure report — the release-gate audit table next to
    * [[graft.functions.TextFns.redactPii]]'s scrubber: per source, how many
    * documents contain email / phone shaped spans and how many total
    * matches exist. Pipelines publish this before AND after redaction (the
    * "after" table must be all zeros).
    *
    * Uses the SAME Java∩RE2-portable patterns the redactor rewrites with,
    * so the report counts exactly what redaction would remove.
    *
    * Scale: codegen'd regexp counting fused into the scan + ONE
    * |sources|-row map-combined aggregate; text never shuffles. */
  def piiReport(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val emails = regexp_count(col(textCol), lit(TextFns.emailPattern))
    val phones = regexp_count(col(textCol), lit(TextFns.phonePattern))
    docs.select(col(sourceCol), emails.cast("long").as("__e"),
        phones.cast("long").as("__p"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__e") > 0, 1L).otherwise(0L)).as("docs_with_email"),
        sum(when(col("__p") > 0, 1L).otherwise(0L)).as("docs_with_phone"),
        sum(col("__e")).as("n_emails"),
        sum(col("__p")).as("n_phones"))
      .withColumn("pii_doc_frac_micro",
        expr("(docs_with_email + docs_with_phone) * 1000000L div n_docs"))
  }

  /** DuckDB oracle replaying [[piiReport]] over `textExpr`. Patterns are
    * injected verbatim (they are Java∩RE2-portable by construction). */
  def piiReportOracleSql(table: String, sourceCol: String,
                         textExpr: String): String = {
    // DuckDB '...' literals are NOT backslash-escape-processed, so the
    // regex backslashes pass through verbatim — only quotes need doubling
    def esc(p: String) = p.replace("'", "''")
    s"""WITH d AS (SELECT $sourceCol,
           len(regexp_extract_all($textExpr, '${esc(TextFns.emailPattern)}')) AS e,
           len(regexp_extract_all($textExpr, '${esc(TextFns.phonePattern)}')) AS p
         FROM $table)
       SELECT $sourceCol,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
         CAST(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
         CAST(sum(e) AS BIGINT) AS n_emails,
         CAST(sum(p) AS BIGINT) AS n_phones,
         (CAST(sum(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT)
          + CAST(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT)) * 1000000
           // CAST(count(*) AS BIGINT) AS pii_doc_frac_micro
       FROM d GROUP BY 1 ORDER BY $sourceCol"""
  }

  /** Checksum-validated payment-card detection (the Luhn mod-10 gate a
    * production PII scrubber runs AFTER the digit-run regex — presidio's
    * CreditCardRecognizer shape): 13–19-digit runs with optional single
    * space/dash separators are candidates; a candidate is a FINDING only
    * if its digits pass Luhn. The checksum cuts the false-positive flood
    * (timestamps, ids, phone numbers) that makes regex-only card
    * detection unusable at corpus scale.
    *
    * Scale: pure scan work — regexp extraction + a per-candidate integer
    * fold (higher-order functions, codegen'd); ONE |sources|-row
    * aggregate; text never shuffles. Exactness: the Luhn sum is integer
    * arithmetic over the digit chars, identical in the oracle. */
  def luhnReport(docs: DataFrame, sourceCol: String,
                 textCol: String): DataFrame = {
    // doubled digit maps to 2d or 2d-9; odd positions (from the right,
    // 1-based) stay as-is — the textbook mod-10 checksum
    def luhnSum(d: org.apache.spark.sql.Column) =
      aggregate(sequence(lit(1), length(d)), lit(0L), (acc, i) => {
        val ch = reverse(d).substr(i, lit(1)).cast("long")
        acc + when(i % 2 === 1, ch)
          .otherwise(when(ch * 2 > 9, ch * 2 - 9).otherwise(ch * 2))
      })
    val cands = transform(
      regexp_extract_all(col(textCol), lit("(?:\\d[ -]?){12,18}\\d"), lit(0)),
      c => regexp_replace(c, "[ -]", ""))
    docs.select(col(sourceCol), cands.as("__cands"))
      .select(col(sourceCol), size(col("__cands")).cast("long").as("__n"),
        size(filter(col("__cands"), d => luhnSum(d) % 10 === 0))
          .cast("long").as("__v"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_candidates"),
        sum(col("__v")).as("n_valid"),
        sum(when(col("__v") > 0, 1L).otherwise(0L)).as("docs_with_card"))
  }

  /** DuckDB oracle replaying [[luhnReport]] over `textExpr`. */
  def luhnReportOracleSql(table: String, sourceCol: String,
                          textExpr: String): String =
    s"""WITH d AS (SELECT $sourceCol,
           list_transform(regexp_extract_all($textExpr, '(?:\\d[ -]?){12,18}\\d'),
             c -> regexp_replace(c, '[ -]', '', 'g')) AS cands
         FROM $table),
       v AS (SELECT $sourceCol, len(cands) AS n,
           len(list_filter(cands, dd ->
             list_sum(list_transform(generate_series(1, length(dd)), i ->
               CASE WHEN i % 2 = 1
                 THEN CAST(substring(reverse(dd), CAST(i AS INT), 1) AS BIGINT)
                 ELSE CASE WHEN CAST(substring(reverse(dd), CAST(i AS INT), 1) AS BIGINT) * 2 > 9
                   THEN CAST(substring(reverse(dd), CAST(i AS INT), 1) AS BIGINT) * 2 - 9
                   ELSE CAST(substring(reverse(dd), CAST(i AS INT), 1) AS BIGINT) * 2 END END))
             % 10 = 0)) AS nv
         FROM d)
       SELECT $sourceCol,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n) AS BIGINT) AS n_candidates,
         CAST(sum(nv) AS BIGINT) AS n_valid,
         CAST(sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_card
       FROM v GROUP BY 1 ORDER BY $sourceCol"""

  /** Per-batch template-line counts for the STORED boilerplate index —
    * the incremental form of [[boilerplateLines]]: each ingest batch
    * appends its own (bucket, source, line, df) rows (distinct-per-doc
    * counting, length floor applied at write); line counts are ADDITIVE,
    * so blind appends + [[boilerplateFold]] ≡ a full rebuild, and the
    * detector re-runs on |index| rows without re-reading any text. The
    * md5 line bucket is the pipe's partition axis: one line's counts
    * always land in one bucket dir. */
  def boilerplateCounts(docs: DataFrame, idCol: String, textCol: String,
                        sourceCol: String, minLineLen: Int = 10,
                        buckets: Int = 16): DataFrame =
    docs.select(col(sourceCol),
        explode(array_distinct(split(col(textCol), "\n"))).as("line"))
      .where(length(trim(col("line"))) >= minLineLen)
      .groupBy(col(sourceCol), col("line"))
      .agg(count(lit(1)).as("df"))
      .withColumn("bucket", Sampling.hashBucket(col("line"), buckets))

  /** Per-batch source document counts (the prevalence denominator),
    * stamped with the batch sequence as the pipe's axis. Additive like the
    * line counts. */
  def sourceDocCounts(docs: DataFrame, sourceCol: String,
                      batch: Long): DataFrame =
    docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("batch", lit(batch))

  /** Fold stored [[boilerplateCounts]] + [[sourceDocCounts]] batches and
    * flag template lines — output identical to [[boilerplateLines]] over
    * the union of every ingested batch. */
  def boilerplateFold(storedCounts: DataFrame, storedDocCounts: DataFrame,
                      sourceCol: String, minFrac: Double = 0.5,
                      minDocs: Long = 2L): DataFrame = {
    val fracMicro = math.round(minFrac * 1e6)
    val df = storedCounts.groupBy(col(sourceCol), col("line"))
      .agg(sum(col("df")).as("df"))
    val nDocs = storedDocCounts.groupBy(col(sourceCol))
      .agg(sum(col("n_docs")).as("n_docs"))
    df.join(broadcast(nDocs), sourceCol)
      .where(col("df") >= minDocs &&
        col("df") * lit(1000000L) >= lit(fracMicro) * col("n_docs"))
      .select(col(sourceCol), col("line"), col("df"), col("n_docs"),
        (col("df").cast("double") / col("n_docs").cast("double")).as("df_frac"))
  }

  /** Shared oracle CTEs: per-source distinct-per-doc line frequencies and
    * the flagged template lines, over `textExpr`. */
  private def boilerplateCtes(table: String, idCol: String, textExpr: String,
                              sourceCol: String, minFrac: Double,
                              minDocs: Long, minLineLen: Int): String = {
    val fracMicro = math.round(minFrac * 1e6)
    s"""d AS (SELECT $idCol, $sourceCol AS src, $textExpr AS __t FROM $table),
       dl AS (SELECT DISTINCT $idCol, src, unnest(string_split(__t, chr(10))) AS line
              FROM d),
       f AS (SELECT src, line, count(*) AS df FROM dl
             WHERE len(trim(line)) >= $minLineLen GROUP BY 1, 2),
       ns AS (SELECT src, count(*) AS n_docs FROM d GROUP BY 1),
       bp AS (SELECT src, line, CAST(df AS BIGINT) AS df, n_docs FROM f JOIN ns USING (src)
              WHERE df >= $minDocs AND df * 1000000 >= $fracMicro * n_docs)"""
  }

  /** DuckDB oracle replaying [[boilerplateLines]]. */
  def boilerplateLinesOracleSql(table: String, idCol: String, textExpr: String,
                                sourceCol: String, minFrac: Double = 0.5,
                                minDocs: Long = 2L, minLineLen: Int = 10): String =
    s"""WITH ${boilerplateCtes(table, idCol, textExpr, sourceCol, minFrac, minDocs, minLineLen)}
       SELECT src AS $sourceCol, line, df, CAST(n_docs AS BIGINT) AS n_docs,
         CAST(df AS DOUBLE) / CAST(n_docs AS DOUBLE) AS df_frac
       FROM bp ORDER BY $sourceCol, line"""

  /** DuckDB oracle replaying [[removeBoilerplate]]. */
  def removeBoilerplateOracleSql(table: String, idCol: String, textExpr: String,
                                 sourceCol: String, minFrac: Double = 0.5,
                                 minDocs: Long = 2L, minLineLen: Int = 10): String =
    s"""WITH ${boilerplateCtes(table, idCol, textExpr, sourceCol, minFrac, minDocs, minLineLen)},
       pos AS (SELECT $idCol, src, j AS pos, ls[j] AS line FROM
                 (SELECT $idCol, src, string_split(__t, chr(10)) AS ls FROM d) x,
                 unnest(generate_series(1, len(ls))) AS u(j)),
       kept AS (SELECT pos.$idCol, pos.pos, pos.line FROM pos
                LEFT JOIN bp ON pos.src = bp.src AND pos.line = bp.line
                WHERE bp.line IS NULL),
       reb AS (SELECT $idCol,
                 array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text,
                 count(*) AS n_kept
               FROM kept GROUP BY 1),
       n AS (SELECT $idCol, len(string_split(__t, chr(10))) AS n_lines FROM d)
       SELECT n.$idCol,
         coalesce(reb.clean_text, '') AS clean_text,
         CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
         CAST(n.n_lines - coalesce(reb.n_kept, 0) AS BIGINT) AS n_removed
       FROM n LEFT JOIN reb USING ($idCol) ORDER BY n.$idCol"""

  /** Per-document language-consistency audit — the code-switching filter
    * multilingual pipelines run before language-bucketed curation (CCNet
    * splits by page-level LID; a page whose LINES disagree is navigation
    * chrome, a boilerplate sandwich, or genuine code-switching, and gets
    * routed to review rather than poisoning one language's bucket).
    *
    * Per non-blank line: [[TextFns.langId]]. Per document: line count,
    * distinct predicted languages, the majority language (ties broken by
    * the lexicographically LARGEST code via a zero-padded count∥lang max
    * key — one string max, engine-portable), and the majority fraction in
    * exact micro-units.
    *
    * Scale: one explode ∝ lines + two map-side-combined aggregates keyed
    * by (id, lang) then id; text leaves the scan only as (id, lang) pairs.
    */
  def langMix(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = docs.select(col(idCol),
        explode(split(col(textCol), "\n")).as("line"))
      .where(length(trim(col("line"))) > 0)
      .select(col(idCol), TextFns.langId(col("line")).as("lang"))
    val perLang = lines.groupBy(col(idCol), col("lang"))
      .agg(count(lit(1)).as("c"))
    perLang.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_lines"),
        count(lit(1)).as("n_langs"),
        max(concat(lpad(col("c").cast("string"), 9, "0"), col("lang")))
          .as("mk"))
      .select(col(idCol), col("n_lines"), col("n_langs"),
        col("mk").substr(lit(10), lit(8)).as("majority_lang"),
        expr("CAST(substring(mk, 1, 9) AS LONG) * 1000000L div n_lines")
          .as("majority_micro"))
  }

  /** The [[TextFns.langId]] CASE chain as a SQL expression over a line
    * column named `line` — shared by the [[langMix]] oracle (and kept in
    * sync with the stopword tables in TextFns). */
  private def langIdCaseSql: String = {
    val langs = TextFns.stopwords.toSeq.sortBy(_._1)
    val hits = langs.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_intersect(string_split_regex(trim(lower(line)), '\\s+'), [$arr])) AS h_$l"
    }.mkString(",\n             ")
    val codes = langs.map(_._1)
    val best = codes.init.zipWithIndex.map { case (l, i) =>
      val rest = codes.drop(i + 1).map(r => s"h_$l >= h_$r").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString("\n             ")
    s"""(SELECT CASE
             WHEN greatest(${codes.map("h_" + _).mkString(", ")}) = 0 THEN 'und'
             $best
             ELSE '${codes.last}' END
           FROM (SELECT $hits) AS __h)"""
  }

  /** DuckDB oracle replaying [[langMix]] over `textExpr`. */
  def langMixOracleSql(table: String, idCol: String, textExpr: String): String =
    s"""WITH lines AS (
         SELECT $idCol, trim(l) AS lt, l AS line
         FROM (SELECT $idCol, unnest(string_split($textExpr, chr(10))) AS l
               FROM $table) x
         WHERE length(trim(l)) > 0),
       lid AS (SELECT $idCol, $langIdCaseSql AS lang FROM lines),
       pl AS (SELECT $idCol, lang, count(*) AS c FROM lid GROUP BY 1, 2),
       agg AS (SELECT $idCol,
                 CAST(sum(c) AS BIGINT) AS n_lines,
                 count(*) AS n_langs,
                 max(lpad(CAST(c AS VARCHAR), 9, '0') || lang) AS mk
               FROM pl GROUP BY 1)
       SELECT $idCol, n_lines, n_langs,
         substring(mk, 10, 8) AS majority_lang,
         CAST(substring(mk, 1, 9) AS BIGINT) * 1000000 // n_lines AS majority_micro
       FROM agg ORDER BY $idCol"""
}
