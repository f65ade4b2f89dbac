package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SentencePiece-style UNIGRAM-LM tokenizer training (Kudo 2018,
  * "Subword Regularization", §3) — the production tokenizer family next
  * to BPE (reference scope: tokenizer artifacts for a 100 TB curation
  * run; the BPE ladder lives in [[Corpus.bpeTrain]]). Deterministic,
  * engine-portable variant of the paper's pipeline:
  *
  *   1. SEED: candidate pieces = the `seedSize` most frequent substrings
  *      (length 1..`pieceMaxLen`) of the corpus vocabulary, occurrence-
  *      weighted by word frequency, UNION all single characters (coverage
  *      guarantee, the paper's "character coverage"). Ties break
  *      lexicographically.
  *   2. EM (`emIters` Viterbi-EM rounds, the paper's hard-EM limit):
  *      E-step Viterbi-segments every DISTINCT word under the current
  *      piece log-probs; M-step re-estimates p(piece) from the
  *      frequency-weighted piece counts, add-one-smoothing single
  *      characters so coverage never dies. The final round prunes to the
  *      top `vocabSize` multi-char pieces (plus all characters) — the
  *      paper's vocabulary-size anneal collapsed to its last step.
  *   3. MODEL: (piece, cnt, logp_micro) with log-probs micro-quantized
  *      (round(ln(cnt/total)·1e6) — exact-long arithmetic everywhere
  *      downstream, the engine's established cross-engine discipline).
  *
  * Viterbi scores/tie-breaks are integer micro log-probs: best score
  * wins, ties prefer the LONGER final piece — deterministic on both
  * engines by construction.
  *
  * Scale: the corpus is touched ONCE (the [[Corpus.vocab]] fit); the
  * seed fit, every EM round, and segmentation all run on the
  * |vocab|-row distinct-word table — corpus-size-INDEPENDENT, the same
  * reason [[Corpus.bpeTrain]] is feasible at 100 TB. Driver state is the
  * bounded model (≤ seedSize + alphabet pieces). Application stamps
  * per-word subword counts onto the corpus by ONE token equi-join
  * ([[Corpus.bpeSegmentCounts]]'s shape). The DP fold is a lambda HOF,
  * which is fine HERE because it runs on the word table, never a corpus
  * scan (the AcExprs native-expression bar applies to per-row corpus
  * kernels).
  *
  * Words longer than `maxTokenLen` are excluded from BOTH training and
  * application (and from the oracle identically): they are URL/noise
  * tail in any real corpus, and a fixed cap keeps the oracle's DP ladder
  * statically sized. The test corpus's longest token is 8, so the
  * default cap of 16 excludes nothing in practice.
  */
object SpUnigram {

  /** OOV-character floor: round(ln(1e-12)·1e6). A character absent from
    * the model (possible only when applying to a corpus the trainer never
    * saw) segments as itself at this log-prob. */
  val UnkMicro: Long = -27631021L

  /** The trained model: (piece, viterbiCount, logpMicro), ordered
    * (cnt desc, piece asc). */
  type Model = Seq[(String, Long, Long)]

  private def logpMicro(counts: Map[String, Long]): Map[String, Long] = {
    val total = counts.values.sum.toDouble
    counts.map { case (p, c) =>
      p -> math.round(math.log(c.toDouble / total) * 1e6)
    }
  }

  /** All substrings of `token` of length `l` (1-based positions,
    * overlapping), as an array column. */
  private def substrings(l: Int): Column =
    expr(s"transform(sequence(1, length(token) - ${l - 1}), " +
      s"j -> substring(token, j, $l))")

  /** Occurrence-weighted substring counts over the distinct-word table:
    * (piece, cnt) for piece lengths 1..`pieceMaxLen`. */
  private def seedCounts(words: DataFrame, pieceMaxLen: Int): DataFrame =
    (1 to pieceMaxLen).map { l =>
      words.where(length(col("token")) >= l)
        .select(explode(substrings(l)).as("piece"), col("freq"))
    }.reduce(_ unionByName _)
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** Viterbi segmentation of `words`' token column under `scores`
    * (piece → logp_micro): adds a `pieces` array<string> column. Forward
    * DP + backtrace as two aggregate folds in one projection; the score
    * map rides as TWO literal nodes (map_from_arrays of typedLits — the
    * centroidScores discipline, no wide literal trees). Candidates at
    * each position are pieces ending there (length 1..`pieceMaxLen`);
    * best integer score wins, ties to the longer piece (array_max over
    * (score, len) structs). Unknown single characters fall back to
    * [[UnkMicro]]. */
  def withSegmentation(words: DataFrame, scores: Map[String, Long],
                       pieceMaxLen: Int): DataFrame = {
    val ks = scores.keys.toArray.sorted
    val vs = ks.map(scores)
    val m = map_from_arrays(typedLit(ks), typedLit(vs))
    val tok = col("token")
    val fwd = aggregate(
      sequence(lit(1), length(tok)),
      struct(array(lit(0L)).as("sc"), array(lit(0)).as("bp")),
      (acc, i) => {
        val cands = (1 to pieceMaxLen).map { l =>
          val piece = tok.substr(i - lit(l - 1), lit(l))
          val lp =
            if (l == 1) coalesce(element_at(m, piece), lit(UnkMicro))
            else element_at(m, piece)
          // guard keeps element_at off index ≤ 0 (CaseWhen branches are
          // lazy); sc(i-l+1) is the best score at position i-l
          val s = when(i >= lit(l), element_at(acc("sc"), i - lit(l) + 1) + lp)
          struct(s.as("s"), lit(l).as("l"))
        }
        val valid = filter(array(cands: _*), c => c("s").isNotNull)
        val best = array_max(valid)
        struct(concat(acc("sc"), array(best("s"))).as("sc"),
          concat(acc("bp"), array(best("l"))).as("bp"))
      })
    val bps = col("__spfwd").getField("bp")
    val bt = aggregate(
      sequence(lit(1), length(tok)),
      struct(length(tok).as("pos"), array().cast("array<string>").as("ps")),
      (acc, _) => {
        val lAt = element_at(bps, acc("pos") + 1)
        when(acc("pos") > lit(0),
          struct((acc("pos") - lAt).as("pos"),
            concat(array(tok.substr(acc("pos") - lAt + 1, lAt)),
              acc("ps")).as("ps")))
          .otherwise(acc)
      })
    words.withColumn("__spfwd", fwd)
      .withColumn("pieces", bt.getField("ps"))
      .drop("__spfwd")
  }

  /** Train the unigram model. Corpus → one vocab fit; then `emIters`
    * Viterbi-EM rounds over the |vocab|-row word table (bounded collects
    * of ≤ seedSize + alphabet piece counts per round). */
  def trainModel(docs: DataFrame, textCol: String, seedSize: Int,
                 pieceMaxLen: Int, emIters: Int, vocabSize: Int,
                 maxTokenLen: Int): Model = {
    require(emIters >= 1, "at least one EM round")
    val words = Corpus.vocab(docs, textCol)
      .where(length(col("token")) <= maxTokenLen)
      .localCheckpoint(true)
    try {
      val subs = seedCounts(words, pieceMaxLen)
        .localCheckpoint(true) // two bounded reads: top-S and the char slice
      val seed = subs.orderBy(col("cnt").desc, col("piece")).limit(seedSize)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val chars = subs.where(length(col("piece")) === 1)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      ApproxDedup.freeCheckpoint(subs)
      val charSet = chars.map(_._1).toSet
      var counts: Map[String, Long] = (seed ++ chars).toMap
      var scores = logpMicro(counts)
      for (t <- 1 to emIters) {
        val cntMap = withSegmentation(words, scores, pieceMaxLen)
          .select(explode(col("pieces")).as("piece"), col("freq"))
          .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        // add-one-smooth every training character (coverage never dies);
        // multi-char pieces keep their raw Viterbi counts (absent = dropped)
        val smoothChars = chars.map { case (c, _) =>
          c -> (cntMap.getOrElse(c, 0L) + 1L) }
        val multi = cntMap.filter { case (p, _) =>
          p.length > 1 && !charSet.contains(p) }
        val keptMulti =
          if (t == emIters)
            multi.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
          else multi.toSeq
        counts = (smoothChars ++ keptMulti).toMap
        scores = logpMicro(counts)
      }
      counts.toSeq.map { case (p, c) => (p, c, scores(p)) }
        .sortBy { case (p, c, _) => (-c, p) }
    } finally ApproxDedup.freeCheckpoint(words)
  }

  /** Vocabulary PRUNING of a trained model — the tokenizer-maintenance
    * step every production vocab goes through before shipping (shrink the
    * embedding table to a smaller V′): keep only the top-`keepMulti`
    * multi-character pieces by (viterbiCount desc, piece asc) — RANK
    * based, so the rule bites identically at any corpus scale where an
    * absolute count threshold would not — while single-character pieces
    * NEVER drop (SentencePiece's required-character rule: segmentation
    * coverage of unseen words must survive the prune). Log-probs
    * renormalize over the surviving counts with the training ln(c/Σc)
    * micro rule, so the pruned model is exactly what training would have
    * scored over that piece set. */
  def pruneModel(model: Model, keepMulti: Int): Model = {
    val multi = model.filter(_._1.length > 1)
      .sortBy { case (p, c, _) => (-c, p) }.take(keepMulti)
    val kept = model.filter(_._1.length == 1) ++ multi
    val lp = logpMicro(kept.map { case (p, c, _) => p -> c }.toMap)
    kept.map { case (p, c, _) => (p, c, lp(p)) }
      .sortBy { case (p, c, _) => (-c, p) }
  }

  /** Oracle for the prune A/B query: train, segment under the full model
    * AND under the pruned+renormalized model, per-doc subword counts side
    * by side. */
  def pruneApplyOracleSql(table: String, idCol: String, textCol: String,
                          seedSize: Int, pieceMaxLen: Int, emIters: Int,
                          vocabSize: Int, maxTokenLen: Int,
                          keepMulti: Int): String =
    s"""WITH RECURSIVE ${trainChain(table, textCol, "t", seedSize,
        pieceMaxLen, emIters, vocabSize, maxTokenLen)},
       awords AS MATERIALIZED (SELECT token, freq FROM twords),
       ${applyChain("a", "tmodel", pieceMaxLen, maxTokenLen)},
       pwords AS MATERIALIZED (SELECT token, freq FROM twords),
       pm0 AS (SELECT piece, cnt FROM tmodel WHERE length(piece) = 1
               UNION ALL
               SELECT piece, cnt FROM (
                 SELECT piece, cnt FROM tmodel WHERE length(piece) > 1
                 ORDER BY cnt DESC, piece LIMIT $keepMulti) km),
       ${scoresCte("pmodel", "pm0")},
       ${applyChain("p", "pmodel", pieceMaxLen, maxTokenLen)},
       atok AS (SELECT $idCol, token FROM (
           SELECT $idCol,
             unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS token
           FROM $table) t
         WHERE length(token) > 0 AND length(token) <= $maxTokenLen)
       SELECT atok.$idCol,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(aseg.n_sub) AS BIGINT) AS n_sub_base,
         CAST(sum(pseg.n_sub) AS BIGINT) AS n_sub_pruned
       FROM atok JOIN aseg ON aseg.token = atok.token
                 JOIN pseg ON pseg.token = atok.token
       GROUP BY 1 ORDER BY atok.$idCol"""

  /** The model as a DataFrame (piece, cnt, logp_micro) — the persistable
    * artifact (one bounded driver-built frame, the OPQ-model shape). */
  def modelDf(spark: org.apache.spark.sql.SparkSession, model: Model): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(model.map { case (p, c, lp) =>
        org.apache.spark.sql.Row(p, c, lp) }.toList, 1),
      StructType(Seq(StructField("piece", StringType),
        StructField("cnt", LongType), StructField("logp_micro", LongType))))
  }

  /** Per-document (n_tokens, n_subwords) under a trained model — the
    * deployment/apply shape: segmentation computed once per DISTINCT
    * word, stamped by one token equi-join. Words the trainer never saw
    * segment through known pieces (characters fall back to [[UnkMicro]]).
    * Tokens longer than `maxTokenLen` are excluded (class doc). */
  def subwordCounts(docs: DataFrame, idCol: String, textCol: String,
                    scores: Map[String, Long], pieceMaxLen: Int,
                    maxTokenLen: Int): DataFrame = {
    val words = Corpus.vocab(docs, textCol)
      .where(length(col("token")) <= maxTokenLen)
      .localCheckpoint(true)
    val segLen = withSegmentation(words, scores, pieceMaxLen)
      .select(col("token"), size(col("pieces")).cast("long").as("n_sub"))
    val out = docs.select(col(idCol),
        explode(graft.functions.TextFns.tokens(lower(col(textCol)))).as("token"))
      .where(length(col("token")) > 0 && length(col("token")) <= maxTokenLen)
      .join(segLen, Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_sub")).as("n_subwords"))
      .localCheckpoint(true)
    ApproxDedup.freeCheckpoint(words)
    out
  }

  /** Fertility report under the unigram tokenizer — the
    * [[Corpus.fertilityReport]] shape (per-group subwords/word and
    * chars/subword in exact micro-units) with SP segmentation, so the two
    * tokenizer families compare row-for-row. */
  /** Constant-group fertility from a PRE-BUILT word-frequency table — the
    * q_tokenizer_ab shape (one literal family label): every corpus
    * occurrence of `token` contributes the same (n_sub, n_ch), so the
    * per-occurrence corpus explode + join of [[fertilityReport]] equals
    * freq-weighted sums over the |vocab|-row table; the corpus is never
    * re-scanned and the vocab fit is shared with the other trainers
    * (Corpus.fertilityFromTrainedState is the BPE/WordPiece twin; both
    * pinned in OptimizationEquivalenceSpec). */
  private[graft] def fertilityFromWords(words0: DataFrame, fam: String,
      groupName: String, scores: Map[String, Long], pieceMaxLen: Int,
      maxTokenLen: Int): DataFrame = {
    val words = words0.where(length(col("token")) <= maxTokenLen)
    // withSegmentation carries every input column through, so freq rides
    // alongside the computed pieces — no self-join against the word table
    withSegmentation(words, scores, pieceMaxLen)
      .select(col("freq"), size(col("pieces")).cast("long").as("n_sub"),
        length(col("token")).cast("long").as("n_ch"))
      .groupBy(lit(fam).as(groupName))
      .agg(sum(col("freq")).as("n_words"),
        sum(col("freq") * col("n_sub")).as("n_subwords"),
        sum(col("freq") * col("n_ch")).as("n_chars"))
      .withColumn("fertility_micro", expr("n_subwords * 1000000L div n_words"))
      .withColumn("chars_per_subword_micro",
        expr("n_chars * 1000000L div n_subwords"))
      .localCheckpoint(true)
  }

  def fertilityReport(docs: DataFrame, textCol: String, groupCol: String,
                      scores: Map[String, Long], pieceMaxLen: Int,
                      maxTokenLen: Int): DataFrame = {
    val words = Corpus.vocab(docs, textCol)
      .where(length(col("token")) <= maxTokenLen)
      .localCheckpoint(true)
    val segLen = withSegmentation(words, scores, pieceMaxLen)
      .select(col("token"), size(col("pieces")).cast("long").as("n_sub"),
        length(col("token")).cast("long").as("n_ch"))
    val out = docs.select(col(groupCol),
        explode(graft.functions.TextFns.tokens(lower(col(textCol)))).as("token"))
      .where(length(col("token")) > 0 && length(col("token")) <= maxTokenLen)
      .join(segLen, Seq("token"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"),
        sum(col("n_ch")).as("n_chars"))
      .withColumn("fertility_micro", expr("n_subwords * 1000000L div n_words"))
      .withColumn("chars_per_subword_micro",
        expr("n_chars * 1000000L div n_subwords"))
      .localCheckpoint(true)
    ApproxDedup.freeCheckpoint(words)
    out
  }

  // ── DuckDB oracle ───────────────────────────────────────────────────────
  //
  // The oracle replays the ENTIRE training chain from the table (like
  // bpeTrainOracleSql — no artifact injection): seed counts, then per EM
  // round a position-ladder DP (one materialized CTE per position; best
  // candidate encoded as score·8+len so max() applies the exact
  // (score, longer-piece) tie-break in one integer) and a linear
  // backtrace over the unique (token, pos) → len table as a recursive
  // CTE. Ladder length is the static `maxTokenLen` cap.

  /** Candidate union for ladder position `i` (1-based): for each piece
    * length l ≤ min(i, P), extend the best at i−l by the piece ending at
    * i. l=1 LEFT-JOINs with the UNK floor (no-op during training — every
    * training character is in the model). */
  private def ladderStep(pfx: String, t: Int, i: Int, pieceMaxLen: Int,
                         scoresCte: String): String = {
    val arms = (1 to math.min(i, pieceMaxLen)).map { l =>
      val joinKind = if (l == 1) "LEFT JOIN" else "JOIN"
      val lp = if (l == 1) s"coalesce(m.logp_micro, $UnkMicro)" else "m.logp_micro"
      s"""SELECT d.token, (d.s + $lp) * 8 + $l AS cand
          FROM ${pfx}d${t}_${i - l} d $joinKind $scoresCte m
            ON m.piece = substring(d.token, ${i - l + 1}, $l)
          WHERE length(d.token) >= $i"""
    }.mkString("\n          UNION ALL\n          ")
    s"""${pfx}d${t}_$i AS MATERIALIZED (
         SELECT token, (k - ((k % 8) + 8) % 8) // 8 AS s,
           CAST(((k % 8) + 8) % 8 AS BIGINT) AS l
         FROM (SELECT token, max(cand) AS k FROM (
          $arms) c GROUP BY token) g)"""
  }

  /** One EM round `t` over `wordsCte` scored by `scoresCte`: ladder +
    * backtrace + frequency-weighted piece counts → `${pfx}cnt$t`. */
  private def emRound(pfx: String, t: Int, wordsCte: String, scoresCte: String,
                      pieceMaxLen: Int, maxTokenLen: Int): String = {
    val d0 =
      s"""${pfx}d${t}_0 AS (SELECT token, CAST(0 AS BIGINT) AS s,
           CAST(0 AS BIGINT) AS l FROM $wordsCte)"""
    val ladder = (1 to maxTokenLen)
      .map(i => ladderStep(pfx, t, i, pieceMaxLen, scoresCte))
    val dall =
      s"""${pfx}dall$t AS (${(1 to maxTokenLen).map(i =>
        s"SELECT token, CAST($i AS BIGINT) AS pos, l FROM ${pfx}d${t}_$i")
        .mkString("\n         UNION ALL ")})"""
    val bt =
      s"""${pfx}bt$t AS (
         SELECT token, CAST(length(token) AS BIGINT) AS pos,
           CAST([] AS VARCHAR[]) AS ps
         FROM $wordsCte
         UNION ALL
         SELECT b.token, b.pos - d.l,
           list_prepend(substring(b.token,
             CAST(b.pos - d.l + 1 AS INT), CAST(d.l AS INT)), b.ps)
         FROM ${pfx}bt$t b JOIN ${pfx}dall$t d
           ON d.token = b.token AND d.pos = b.pos
         WHERE b.pos > 0)"""
    val cnt =
      s"""${pfx}cnt$t AS (
         SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
           SELECT unnest(b.ps) AS piece, w.freq
           FROM ${pfx}bt$t b JOIN $wordsCte w USING (token)
           WHERE b.pos = 0) g
         GROUP BY 1)"""
    (Seq(d0) ++ ladder ++ Seq(dall, bt, cnt)).mkString(",\n       ")
  }

  /** Renormalized scores CTE from a counts CTE. */
  private def scoresCte(name: String, fromCte: String): String =
    s"""$name AS (SELECT piece, cnt,
         CAST(round(ln(CAST(cnt AS DOUBLE) /
           (SELECT CAST(sum(cnt) AS DOUBLE) FROM $fromCte)) * 1000000.0)
           AS BIGINT) AS logp_micro
       FROM $fromCte)"""

  /** The full training chain: CTEs ending in `${pfx}model`
    * (piece, cnt, logp_micro). */
  private[graft] def trainChain(table: String, textCol: String, pfx: String,
                                seedSize: Int, pieceMaxLen: Int, emIters: Int,
                                vocabSize: Int, maxTokenLen: Int): String = {
    val subsArms = (1 to pieceMaxLen).map { l =>
      s"""SELECT unnest(list_transform(generate_series(1, length(token) - ${l - 1}),
            j -> substring(token, j, $l))) AS piece, freq
          FROM ${pfx}words WHERE length(token) >= $l"""
    }.mkString("\n         UNION ALL\n         ")
    val head =
      s"""${pfx}words AS MATERIALIZED (
         SELECT token, CAST(count(*) AS BIGINT) AS freq FROM (
           SELECT unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS token
           FROM $table) t
         WHERE length(token) > 0 AND length(token) <= $maxTokenLen
         GROUP BY 1),
       ${pfx}subs AS MATERIALIZED (
         SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         $subsArms) g GROUP BY 1),
       ${pfx}sel0 AS (
         -- DISTINCT over UNION ALL, not UNION: under WITH RECURSIVE,
         -- DuckDB (1.0) treats ANY CTE containing UNION as a recursive
         -- base/step split and skips the set-dedupe even without
         -- self-reference, duplicating every char row
         SELECT DISTINCT piece, cnt FROM (
           SELECT piece, cnt FROM (
             SELECT piece, cnt FROM ${pfx}subs
             ORDER BY cnt DESC, piece LIMIT $seedSize) s
           UNION ALL
           SELECT piece, cnt FROM ${pfx}subs WHERE length(piece) = 1) u),
       ${scoresCte(s"${pfx}s0", s"${pfx}sel0")}"""
    val rounds = (1 to emIters).map { t =>
      val em = emRound(pfx, t, s"${pfx}words", s"${pfx}s${t - 1}",
        pieceMaxLen, maxTokenLen)
      val prune =
        if (t == emIters)
          s"""${pfx}sel$t AS (
             SELECT c.piece, coalesce(n.cnt, 0) + 1 AS cnt
             FROM (SELECT piece FROM ${pfx}sel0 WHERE length(piece) = 1) c
             LEFT JOIN ${pfx}cnt$t n USING (piece)
             UNION ALL
             SELECT piece, cnt FROM (
               SELECT piece, cnt FROM ${pfx}cnt$t WHERE length(piece) > 1
               ORDER BY cnt DESC, piece LIMIT $vocabSize) kept)"""
        else
          s"""${pfx}sel$t AS (
             SELECT c.piece, coalesce(n.cnt, 0) + 1 AS cnt
             FROM (SELECT piece FROM ${pfx}sel0 WHERE length(piece) = 1) c
             LEFT JOIN ${pfx}cnt$t n USING (piece)
             UNION ALL
             SELECT piece, cnt FROM ${pfx}cnt$t WHERE length(piece) > 1)"""
      s"$em,\n       $prune,\n       ${scoresCte(s"${pfx}s$t", s"${pfx}sel$t")}"
    }.mkString(",\n       ")
    s"$head,\n       $rounds,\n       ${pfx}model AS (SELECT * FROM ${pfx}s$emIters)"
  }

  /** Oracle for the TRAIN query: the model table itself. */
  def trainOracleSql(table: String, textCol: String, seedSize: Int,
                     pieceMaxLen: Int, emIters: Int, vocabSize: Int,
                     maxTokenLen: Int): String =
    s"""WITH RECURSIVE ${trainChain(table, textCol, "u", seedSize, pieceMaxLen,
        emIters, vocabSize, maxTokenLen)}
       SELECT piece, cnt, logp_micro FROM umodel
       ORDER BY cnt DESC, piece"""

  /** Segmentation ladder over `${pfx}words` under a MODEL cte, ending in
    * `${pfx}seg` (token, n_sub). */
  private def applyChain(pfx: String, modelCte: String, pieceMaxLen: Int,
                         maxTokenLen: Int): String = {
    val em = emRound(pfx, 0, s"${pfx}words", modelCte, pieceMaxLen, maxTokenLen)
    // emRound's cnt CTE is unused here but harmless; seg reads the backtrace
    s"""$em,
       ${pfx}seg AS (SELECT token, CAST(len(ps) AS BIGINT) AS n_sub
         FROM ${pfx}bt0 WHERE pos = 0)"""
  }

  /** Oracle for the cross-APPLY query: train on `trainTable`, segment
    * `applyTable`, per-doc token/subword counts. */
  def applyOracleSql(trainTable: String, applyTable: String, idCol: String,
                     textCol: String, seedSize: Int, pieceMaxLen: Int,
                     emIters: Int, vocabSize: Int, maxTokenLen: Int): String =
    s"""WITH RECURSIVE ${trainChain(trainTable, textCol, "t", seedSize,
        pieceMaxLen, emIters, vocabSize, maxTokenLen)},
       awords AS MATERIALIZED (
         SELECT token, CAST(count(*) AS BIGINT) AS freq FROM (
           SELECT unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS token
           FROM $applyTable) t
         WHERE length(token) > 0 AND length(token) <= $maxTokenLen
         GROUP BY 1),
       ${applyChain("a", "tmodel", pieceMaxLen, maxTokenLen)},
       atok AS (SELECT $idCol, token FROM (
           SELECT $idCol,
             unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS token
           FROM $applyTable) t
         WHERE length(token) > 0 AND length(token) <= $maxTokenLen)
       SELECT atok.$idCol,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(aseg.n_sub) AS BIGINT) AS n_subwords
       FROM atok JOIN aseg ON aseg.token = atok.token
       GROUP BY 1 ORDER BY atok.$idCol"""

  /** Oracle for the FERTILITY query: train + segment the same table,
    * per-group integer micro ratios ([[Corpus.fertilityReportOracleSql]]'s
    * shape). */
  def fertilityOracleSql(table: String, textCol: String, groupCol: String,
                         seedSize: Int, pieceMaxLen: Int, emIters: Int,
                         vocabSize: Int, maxTokenLen: Int): String =
    s"""WITH RECURSIVE ${trainChain(table, textCol, "t", seedSize,
        pieceMaxLen, emIters, vocabSize, maxTokenLen)},
       awords AS MATERIALIZED (SELECT token, freq FROM twords),
       ${applyChain("a", "tmodel", pieceMaxLen, maxTokenLen)},
       aseg2 AS (SELECT token, n_sub, CAST(length(token) AS BIGINT) AS n_ch
                 FROM aseg),
       atok AS (SELECT $groupCol, token FROM (
           SELECT $groupCol,
             unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS token
           FROM $table) t
         WHERE length(token) > 0 AND length(token) <= $maxTokenLen)
       SELECT atok.$groupCol,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(aseg2.n_sub) AS BIGINT) AS n_subwords,
         CAST(sum(aseg2.n_ch) AS BIGINT) AS n_chars,
         CAST(sum(aseg2.n_sub) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
           AS fertility_micro,
         CAST(sum(aseg2.n_ch) AS BIGINT) * 1000000 // CAST(sum(aseg2.n_sub) AS BIGINT)
           AS chars_per_subword_micro
       FROM atok JOIN aseg2 ON aseg2.token = atok.token
       GROUP BY 1 ORDER BY atok.$groupCol"""
}
