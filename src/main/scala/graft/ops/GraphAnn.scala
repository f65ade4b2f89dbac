package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Graph-based ANN — the navigable-neighbor-graph family (HNSW, Malkov &
  * Yashunin 2018; DiskANN/Vamana, Subramanya et al. 2019) re-expressed for
  * a shared-nothing engine, completing the ANN story next to the
  * quantization ladder (IVF/SQ8/PQ/IVF+PQ/OPQ/ITQ in
  * [[SimilaritySearch]]).
  *
  * The sequential-insertion hierarchy of the papers does not distribute;
  * what does is the part production systems actually serve from — a
  * bounded-degree neighbor graph probed by best-first beam search:
  *
  *   - **Build**: candidate pairs come from IVF cell COHORTS (each vector
  *     joins its `nProbeBuild` nearest cells — the FAISS coarse quantizer
  *     reused as the NN-descent seed), scored by exact cosine, and pruned
  *     to each node's top-`m` neighbors. A SELF-edge per node co-locates
  *     the node's own vector with its adjacency — DiskANN's layout trick,
  *     which makes the probe read index rows ONLY.
  *   - **Additive under blind-append**: per-batch top-`m` lists are
  *     mergeable (top-m(A ∪ B) = top-m(top-m(A) ∪ top-m(B))), so
  *     incremental batches append their candidate lists and the fold —
  *     per-src top-`m` at read — equals a full rebuild. Cross-batch
  *     navigability comes from emitting BOTH directions of new↔old pairs
  *     (old nodes gain edges into the new region by append, never by
  *     rewrite).
  *   - **Probe**: best-first beam search — `hops` expansion rounds, each
  *     reading ONLY the frontier's adjacency buckets (≤ ef·(m+1) index
  *     rows per hop, partition-pruned `readIn`), exact cosine on carried
  *     vectors (rerank is inherent — no quantization error to undo).
  *     Driver state is the visited list: ≤ (entries + hops·ef)·(m+1)
  *     (id, cosine) scalars, the bounded-collect discipline every stored
  *     probe in this engine follows.
  *
  * Determinism: cosines are left-to-right double accumulation
  * ([[VectorFns.cosine]] ≡ DuckDB `list_dot_product`), ties break to the
  * lower id everywhere, and the frontier/visited evolution is a pure
  * function of those — the DuckDB oracle replays build AND probe exactly.
  */
object GraphAnn {

  private def dotSeq(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** (id, __vec, pcell, cell) with one row per (vector,
    * nearest-`nProbeBuild` cell) — the build-side cohort assignment,
    * resolved IN-PLAN (argsort over typedLit centroid scores; no join, no
    * per-row driver work). struct(-score, cell) under array_sort's
    * lexicographic order ties to the lowest cell id, mirroring the IVF
    * probes. `pcell` is the rank-1 (primary) cell — the diversity key of
    * the edge prune ([[topMDiverse]]). */
  def withBuildCells(emb: DataFrame, idCol: String, vecCol: String,
                     centroids: Seq[Seq[Double]], nProbeBuild: Int): DataFrame = {
    require(nProbeBuild >= 1 && nProbeBuild <= centroids.length)
    val v = col(vecCol).cast("array<double>")
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct((-(VectorFns.dot(v, typedLit(c.toArray)) /
        lit(math.sqrt(dotSeq(c, c))))).as("ns"), lit(i).as("cell"))
    }: _*)
    emb.select(col(idCol).cast("long").as("id"), v.as("__vec"),
        transform(slice(array_sort(scored), 1, nProbeBuild),
          s => s.getField("cell").cast("long")).as("__cl"))
      .select(col("id"), col("__vec"),
        element_at(col("__cl"), 1).as("pcell"),
        explode(col("__cl")).as("cell"))
  }

  /** Directed candidate edges src→dst for every cohort pair with src in
    * `a` and dst in `b` (call twice for both directions of a cross-batch
    * increment). Output is SLIM — (src, dst, dcell, cosine) — so the pair
    * dedup's shuffle and the downstream prune windows move ~32-byte rows,
    * never the 64-dim vectors (the vector-fat variant measured ~1 GB of
    * shuffle per build at sf0.1); vectors attach AFTER the prune, via
    * N-row side tables Catalyst broadcast-joins at test scale and
    * shuffle-joins past the broadcast threshold. `dcell` rides along from
    * the b-side cohort rows (zero extra joins) — it is dst's PRIMARY cell,
    * the diversity key of [[topMDiverse]]. */
  def edgeCandidates(a: DataFrame, b: DataFrame): DataFrame = {
    val pairs = a.select(col("id").as("src"), col("cell"))
      .join(b.select(col("id").as("dst"), col("cell"),
        col("pcell").as("dcell")), Seq("cell"))
      .where(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), col("dcell"))
      .distinct()
    pairs
      .join(vectorsOf(a).select(col("id").as("src"), col("__vec").as("__sv")),
        Seq("src"))
      .join(vectorsOf(b).select(col("id").as("dst"), col("__vec").as("__dv")),
        Seq("dst"))
      .select(col("src"), col("dst"), col("dcell"),
        VectorFns.cosine(col("__sv"), col("__dv")).as("cosine"))
  }

  /** One (id, __vec) row per node from a cohort-assignment frame (which
    * carries `nProbeBuild` rows per id). */
  private def vectorsOf(cells: DataFrame): DataFrame =
    cells.select(col("id"), col("__vec")).distinct()

  /** DIVERSITY-pruned per-src neighbor selection — the distributable form
    * of DiskANN/HNSW's robust-prune heuristic: at most `cellCap` edges per
    * (src, dst-primary-cell) survive BEFORE the per-src top-`m` by cosine,
    * so every node keeps edges into ≥ m/cellCap DISTINCT regions of the
    * space. Plain top-m on clustered corpora degenerates into disconnected
    * intra-cluster cliques (the beam can never leave its entry's cluster —
    * recall ~0 on the 64-cluster gate); the cap preserves the long-range
    * edges navigability needs while keeping proximity edges first.
    * Mergeable: per-(src,dcell) top-cap is a grouped top-k (mergeable),
    * and any row the outer top-m discards stays discarded after a merge —
    * rows displacing cap-survivors rank higher, so the m-th-best threshold
    * only rises. Fold ≡ rebuild, pinned in GraphAnnSpec.
    * One `repartition(src)` exchange serves BOTH windows: hash(src)
    * satisfies the (src, dcell) clustering (subset rule), so the second
    * window adds only a local sort. */
  def topMDiverse(cands: DataFrame, m: Int, cellCap: Int): DataFrame = {
    require(m >= 1 && cellCap >= 1)
    cands.repartition(col("src"))
      .withColumn("__rc", row_number().over(
        Window.partitionBy(col("src"), col("dcell"))
          .orderBy(col("cosine").desc, col("dst"))))
      .where(col("__rc") <= cellCap)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("cosine").desc, col("dst"))))
      .where(col("__rn") <= m).drop("__rc", "__rn")
  }

  // ── cell-chunked node pipe ──────────────────────────────────────────────
  // The incremental old side used to come from SCANNING the edge store's
  // self-edges and recomputing their cohort cells — O(stored graph) per
  // increment even when the batch touches two cells (the r14 `weak`).
  // Node rows (cell, id, pcell, vec) — one per (node, cohort cell) —
  // persist CHUNKED BY CELL next to the bucket-chunked edges, so an
  // increment reads `readIn(touchedCells)`: exactly the old cohort rows
  // that can pair with the batch (every cross pair joins on a shared
  // cell ∈ touched — commit e85acac's preservation argument, now applied
  // to the SCAN, not just the join input). Blind-append increments are
  // row-local, so fold ≡ rebuild needs no read-side fold at all;
  // redelivered duplicates collapse in edgeCandidates' pair/vector
  // distincts. Cost: vectors stored twice (self-edges + node rows) —
  // disk traded for read locality, the DiskANN layout move.

  /** Node-pipe rows from a cohort-assignment frame: (cell, id, pcell,
    * vec) — [[withBuildCells]]' own rows under storable names, chunk key
    * first. */
  def nodeBatch(cells: DataFrame): DataFrame =
    cells.select(col("cell"), col("id"), col("pcell"),
      col("__vec").as("vec"))

  /** The stored node rows back in cohort-assignment shape — the `old`
    * side [[edgeCandidates]] consumes. No recompute: cells were resolved
    * at build time and ride in the rows. */
  def nodeCells(rows: DataFrame): DataFrame =
    rows.select(col("id"), col("vec").as("__vec"), col("pcell"),
      col("cell"))

  /** Self-edges (id→id carrying the node's own vector, cosine pinned to
    * 1.0): the probe's vector storage AND every node's reachability seed. */
  def selfEdges(cells: DataFrame): DataFrame =
    cells.select(col("id").as("src"), col("id").as("dst"),
      col("pcell").as("dcell"), col("__vec").as("dvec"),
      lit(1.0).as("cosine")).distinct()

  /** One build/increment batch of index rows: top-`m` candidates from the
    * supplied direction pairs + self-edges for the batch's own nodes,
    * bucketed by `src % buckets` for partition-pruned frontier reads. */
  private def allCandidates(batchCells: DataFrame,
                            otherCells: Option[DataFrame]): DataFrame =
    otherCells match {
      case None => edgeCandidates(batchCells, batchCells)
      case Some(old) =>
        edgeCandidates(batchCells, batchCells)
          .unionByName(edgeCandidates(batchCells, old))
          .unionByName(edgeCandidates(old, batchCells))
    }

  /** dst vectors for the PRUNED edge list: ≤ m·|nodes| rows join an
    * |nodes|-row side — nothing vector-sized ever crosses the prune
    * shuffle. */
  private def attachDvec(slimEdges: DataFrame, batchCells: DataFrame,
                         otherCells: Option[DataFrame]): DataFrame = {
    val vs = otherCells.map(vectorsOf(_).unionByName(vectorsOf(batchCells)).distinct())
      .getOrElse(vectorsOf(batchCells))
      .select(col("id").as("dst"), col("__vec").as("dvec"))
    slimEdges.join(vs, Seq("dst"))
      .select(col("src"), col("dst"), col("dcell"), col("dvec"), col("cosine"))
  }

  def edgeBatch(batchCells: DataFrame, otherCells: Option[DataFrame],
                m: Int, buckets: Int, cellCap: Int): DataFrame = {
    val pruned = topMDiverse(allCandidates(batchCells, otherCells), m, cellCap)
    attachDvec(pruned, batchCells, otherCells)
      .unionByName(selfEdges(batchCells))
      .withColumn("bucket", pmod(col("src"), lit(buckets.toLong)))
  }

  /** The read-side fold: diversity-pruned per-src top-`m` among non-self
    * rows (append-merge of per-batch lists) + the self rows. Fold ≡
    * rebuild by cap∘top-m mergeability (see [[topMDiverse]]) — pinned in
    * GraphAnnSpec. Schema-generic (the PQ layout carries `dpq` instead
    * of / next to `dvec`); ranking only needs src/dst/dcell/cosine. */
  def foldAdjacency(rows: DataFrame, m: Int, cellCap: Int): DataFrame =
    topMDiverse(rows.where(col("src") =!= col("dst")), m, cellCap)
      .unionByName(rows.where(col("src") === col("dst")).distinct())

  // ── stored entry points ─────────────────────────────────────────────────
  // Beam entries were ids 0..nEntries−1 by convention through r13, which a
  // UUID-keyed or sharded-id corpus turns into degenerate seeds (and a
  // corpus whose low ids cluster into one region loses multi-entry
  // navigation entirely). Entries are now CHOSEN AT BUILD and persist as
  // their own pipe: per build cell, the node most aligned with the cell's
  // centroid (cosine desc, id asc) — a medoid-ish seed per region, so the
  // beam starts near every cluster of the space (HNSW's value is exactly
  // navigation from good entries). Per-cell argmax is MERGEABLE, so entry
  // batches blind-append like edge batches and the fold (per-cell top-1 at
  // read) ≡ a full rebuild — pinned in GraphAnnSpec.

  /** One entry-point batch from a cohort-assignment frame: (cell, id,
    * score) — this batch's best-aligned node per cell. The window is
    * cell-partitioned: key cardinality = |cells| (configuration), per-key
    * rows ≤ cohort size. */
  def entryBatch(cells: DataFrame, centroids: Seq[Seq[Double]]): DataFrame = {
    val cents = typedLit(centroids.map(_.toArray).toArray)
    foldEntries(cells.select(col("cell"), col("id"),
      VectorFns.cosine(col("__vec"),
        element_at(cents, col("cell").cast("int") + 1)).as("score")))
  }

  /** Read-side fold: per-cell top-1 (score desc, id asc) — the argmax
    * merge that makes appended entry batches ≡ a rebuild. */
  def foldEntries(rows: DataFrame): DataFrame =
    rows.withColumn("__rn", row_number().over(
        Window.partitionBy(col("cell"))
          .orderBy(col("score").desc, col("id"))))
      .where(col("__rn") === 1).drop("__rn")

  /** The probe-side entry id list — ≤ |cells| ids (configuration, not
    * data), the bounded-collect discipline every stored probe follows. */
  def entryIds(folded: DataFrame): Seq[Long] =
    folded.select(col("id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted

  /** Best-first beam search over an adjacency accessor. `expand(frontier)`
    * returns the DISTINCT (dst, cosine-to-query) rows of the frontier's
    * folded adjacency — the stored probe backs it with a bucket-pruned
    * `readIn`; in-memory callers back it with a filter. `hops` expansion
    * rounds: round 1 expands the entry points, each later round the top-`ef`
    * not-yet-expanded visited nodes. Returns the visited top-`k`
    * (cosine desc, id asc). */
  def beamSearch(expand: Seq[Long] => Seq[(Long, Double)],
                 entries: Seq[Long], ef: Int, hops: Int,
                 k: Int): Seq[(Long, Double)] = {
    require(hops >= 1 && ef >= 1 && k >= 1)
    val visited = scala.collection.mutable.LinkedHashMap.empty[Long, Double]
    var expanded = entries.toSet
    var frontier = entries
    for (_ <- 1 to hops) {
      if (frontier.nonEmpty)
        expand(frontier).foreach { case (id, c) =>
          if (!visited.contains(id)) visited.put(id, c) else ()
        }
      val next = visited.toSeq
        .sortBy { case (id, c) => (-c, id) }
        .iterator.map(_._1).filterNot(expanded.contains).take(ef).toSeq
      expanded ++= next
      frontier = next
    }
    visited.toSeq.sortBy { case (id, c) => (-c, id) }.take(k)
  }

  /** Frontier expansion against a folded adjacency frame: score each dst
    * once against the query. Bounded: |frontier|·(m+1) rows in, ≤ that
    * many (dst, cosine) scalars out. */
  def expandFrom(adj: DataFrame, query: Seq[Double])(frontier: Seq[Long]): Seq[(Long, Double)] =
    adj.where(col("src").isin(frontier: _*))
      .select(col("dst"), col("dvec")).distinct()
      .select(col("dst"), VectorFns.cosineToQuery(col("dvec"), query).as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  /** The shared frontier loop of the BATCHED beams: N queries advance
    * together, one distributed plan per hop (equi-join frontier⋈edges on
    * the node id, broadcast query side, one qid-keyed rank window per
    * round — never a per-query driver loop, so the query side scales to
    * millions of rows). Frontier evolution is the EXACT batch form of
    * [[beamSearch]]: round 1 expands the entry points, each later round
    * the per-query top-`ef` visited nodes not yet expanded (the anti-join
    * against the expanded set seeds with the entries, ≡ the oracle's
    * `NOT IN ents` filter). Each round's visited set localCheckpoints —
    * `hops` is small and the lineage would otherwise double per round.
    * `edges` carries (src, dst, payloads...); `score` ranks a (payloads,
    * query-columns) pair, higher = better. Returns visited (qid, dst, c).
    * Intermediate rounds localCheckpoint (each is consumed twice — the
    * next round's topEf AND the visited union — so the lineage would
    * double per hop); the FINAL round is consumed once downstream and
    * stays lazy, pipelining into the caller's rank window. */
  private def beamBatchCore(edges: DataFrame, payloadCols: Seq[String],
                            qs: DataFrame, score: Column,
                            entries: Seq[Long], ef: Int,
                            hops: Int): DataFrame = {
    require(entries.nonEmpty, "beam search needs at least one entry point")
    def expand(frontier: DataFrame): DataFrame =
      frontier.join(edges, frontier("node") === edges("src"))
        .select(col("qid"), col("dst")).distinct()
        .join(broadcast(qs), Seq("qid"))
        .join(edges.select((col("dst") +: payloadCols.map(col)): _*).distinct(),
          Seq("dst"))
        .select(col("qid"), col("dst"), score.as("c"))
    def topEf(visited: DataFrame, expanded: DataFrame): DataFrame =
      visited.join(expanded, Seq("qid", "dst"), "left_anti")
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("c").desc, col("dst"))))
        .where(col("__rn") <= ef)
        .select(col("qid"), col("dst").as("node"))
    val spark = edges.sparkSession
    import spark.implicits._
    var frontier = qs.select(col("qid"))
      .crossJoin(broadcast(entries.toDF("node")))
    var visited = expand(frontier)
    if (hops > 1) visited = visited.localCheckpoint(true)
    var expanded = frontier.select(col("qid"), col("node").as("dst"))
    for (h <- 2 to hops) {
      frontier = topEf(visited, expanded)
      expanded = expanded.unionByName(
        frontier.select(col("qid"), col("node").as("dst")))
      visited = visited.unionByName(expand(frontier))
        .groupBy(col("qid"), col("dst")).agg(max(col("c")).as("c"))
      if (h < hops) visited = visited.localCheckpoint(true)
    }
    visited
  }

  /** BATCHED beam search — the production probe shape (see
    * [[beamBatchCore]]). Pass a MATERIALIZED `adj` (checkpointed fold or a
    * store read): it is joined once per hop, and an unmaterialized
    * cohort-join lineage would re-run the whole build each time. `entries`
    * come from the stored entry pipe ([[entryIds]]) or any caller-chosen
    * seed list. Output: (qid, id, cosine, rank ≤ k). */
  def beamSearchBatch(adj: DataFrame, queries: DataFrame,
                      qidCol: String, qvecCol: String,
                      entries: Seq[Long], ef: Int, hops: Int, k: Int): DataFrame = {
    // distinct: a redelivered query batch (same qid twice — the streaming
    // probe's double-delivery) would otherwise duplicate (qid, dst, c)
    // rows and let duplicates consume beam slots in the rank windows
    val qs = queries.select(col(qidCol).cast("long").as("qid"),
      col(qvecCol).cast("array<double>").as("__qv")).distinct()
    beamBatchCore(adj.select(col("src"), col("dst"), col("dvec")), Seq("dvec"),
        qs, VectorFns.cosine(col("dvec"), col("__qv")), entries, ef, hops)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("c").desc, col("dst"))))
      .where(col("rank") <= k)
      .select(col("qid"), col("dst").as("id"), col("c").as("cosine"),
        col("rank"))
  }

  /** FILTERED batched beam — predicate-constrained top-k in the
    * Filtered-DiskANN spirit (Gollapudi et al., WWW 2023): the traversal
    * navigates the UNfiltered graph (restricting the frontier starves it —
    * non-matching nodes are the bridges between matching regions), and only
    * the COLLECTION step keeps visited nodes whose label matches the
    * query's own. The RAG / tenant-scoped retrieval access pattern.
    * `labels` is the (id, label) side; the visited set is the bounded side
    * of its join, the query-label side is query-batch-sized and broadcast.
    * Output: (qid, id, cosine, rank ≤ k) among matching nodes. */
  def beamSearchBatchFiltered(adj: DataFrame, queries: DataFrame,
                              qidCol: String, qvecCol: String,
                              labels: DataFrame, idCol: String,
                              labelCol: String,
                              entries: Seq[Long], ef: Int, hops: Int,
                              k: Int): DataFrame = {
    val qs = queries.select(col(qidCol).cast("long").as("qid"),
      col(qvecCol).cast("array<double>").as("__qv")).distinct()
    val lab = labels.select(col(idCol).cast("long").as("dst"),
      col(labelCol).as("__lab"))
    val qlab = qs.select(col("qid"))
      .join(lab.withColumnRenamed("dst", "qid")
        .withColumnRenamed("__lab", "__qlab"), Seq("qid"))
    beamBatchCore(adj.select(col("src"), col("dst"), col("dvec")), Seq("dvec"),
        qs, VectorFns.cosine(col("dvec"), col("__qv")), entries, ef, hops)
      .join(lab, Seq("dst"))
      .join(broadcast(qlab), Seq("qid"))
      .where(col("__lab") === col("__qlab"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("c").desc, col("dst"))))
      .where(col("rank") <= k)
      .select(col("qid"), col("dst").as("id"), col("c").as("cosine"),
        col("rank"))
  }

  /** Oracle replaying [[beamSearchBatchFiltered]]: the unfiltered frontier
    * replay, label-filtered collection, per-qid rank. */
  def beamBatchFilteredOracleSql(table: String, idCol: String, vecCol: String,
                                 labelCol: String, queryFilter: String,
                                 nCentroids: Int, nProbeBuild: Int, m: Int,
                                 cellCap: Int, ef: Int, hops: Int,
                                 k: Int): String =
    s"""WITH ${adjacencyCtes(table, idCol, vecCol, nCentroids, nProbeBuild, m, cellCap)},
       lab AS (SELECT CAST($idCol AS BIGINT) AS id, $labelCol AS lab FROM $table),
       qs AS (SELECT id AS qid, ev AS qv FROM e WHERE $queryFilter),
       ${beamCtes(ef, hops)}
       SELECT v.qid, v.dst AS id, v.c AS cosine,
         CAST(row_number() OVER (PARTITION BY v.qid ORDER BY v.c DESC, v.dst) AS INT) AS rank
       FROM vis v JOIN lab dl ON dl.id = v.dst
                  JOIN lab ql ON ql.id = v.qid
       WHERE dl.lab = ql.lab
       QUALIFY rank <= $k
       ORDER BY v.qid, rank"""

  /** BATCHED PQ-graph beam — the DiskANN serving path for N queries at
    * once: per-query ADC term tables are stamped IN-PLAN (one bounded
    * projection over the query side — `zip_with` over the literal
    * codebooks, same `|c|² − 2·q·c` form and accumulation order as
    * [[SimilaritySearch.pqAdcTable]], so scores are bit-identical to the
    * per-query [[expandPqFrom]] driver loop), traversal scores each edge
    * by m table lookups on its stored code, and the per-query top-`rerank`
    * survivors finish with exact cosine against the self-edge vectors.
    * Output: (qid, id, cosine, rank ≤ k). */
  /** Per-query ADC term-table column over a `__qv` query vector: the
    * batch form of [[SimilaritySearch.pqAdcTable]] — same `|c|² − 2·q·c`
    * terms, same accumulation order, stamped in ONE projection for N
    * queries (|c|² enters as driver-side literals). */
  private def adcTableCol(codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val d = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (cb, j) =>
      val sub = slice(col("__qv"), j * d + 1, d)
      zip_with(typedLit(cb.map(c => dotSeq(c, c)).toArray),
        typedLit(cb.map(_.toArray).toArray),
        (cc, cv) => cc - lit(2.0) * VectorFns.dot(sub, cv))
    }: _*)
  }

  /** Negated ADC of a stored code column against the per-ROW table column
    * `__adc` — the batch form of [[negAdc]] (same lookups, same
    * left-to-right sum, same exact IEEE negation). */
  private def negAdcLookup(codeCol: Column, pqM: Int): Column =
    -(0 until pqM).map(j =>
        element_at(element_at(col("__adc"), j + 1),
          element_at(codeCol, j + 1).cast("int") + 1))
      .reduceLeft(_ + _)

  def pqBeamSearchBatch(pqAdj: DataFrame, queries: DataFrame,
                        qidCol: String, qvecCol: String,
                        codebooks: Seq[Seq[Seq[Double]]],
                        entries: Seq[Long], ef: Int, hops: Int,
                        rerank: Int, k: Int): DataFrame = {
    // localCheckpoint: the table is |queries| × m·ks doubles (bounded by
    // the query batch) and would otherwise recompute per hop
    val qs = queries.select(col(qidCol).cast("long").as("qid"),
        col(qvecCol).cast("array<double>").as("__qv")).distinct()
      .withColumn("__adc", adcTableCol(codebooks))
      .localCheckpoint(true)
    val visited = beamBatchCore(
      pqAdj.select(col("src"), col("dst"), col("dpq")), Seq("dpq"),
      qs, negAdcLookup(col("dpq"), codebooks.length), entries, ef, hops)
    val cands = visited.withColumn("__rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("c").desc, col("dst"))))
      .where(col("__rn") <= rerank)
      .select(col("qid"), col("dst"))
    cands
      .join(pqAdj.where(col("src") === col("dst"))
        .select(col("dst"), col("dvec")).distinct(), Seq("dst"))
      .join(broadcast(qs.select(col("qid"), col("__qv"))), Seq("qid"))
      .select(col("qid"), col("dst"),
        VectorFns.cosine(col("dvec"), col("__qv")).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("dst"))))
      .where(col("rank") <= k)
      .select(col("qid"), col("dst").as("id"), col("cosine"), col("rank"))
  }

  /** Oracle replaying [[beamSearchBatch]] for all queries in `queryFilter`
    * (the beam CTEs are already per-qid). */
  def beamBatchOracleSql(table: String, idCol: String, vecCol: String,
                         queryFilter: String, nCentroids: Int,
                         nProbeBuild: Int, m: Int, cellCap: Int, ef: Int,
                         hops: Int, k: Int,
                         qidShift: Long = 0L): String = {
    val qid = if (qidShift == 0L) "id" else s"id + $qidShift"
    s"""WITH ${adjacencyCtes(table, idCol, vecCol, nCentroids, nProbeBuild, m, cellCap)},
       qs AS (SELECT $qid AS qid, ev AS qv FROM e WHERE $queryFilter),
       ${beamCtes(ef, hops)}
       SELECT qid, dst AS id, c AS cosine,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY c DESC, dst) AS INT) AS rank
       FROM vis
       QUALIFY rank <= $k
       ORDER BY qid, rank"""
  }

  /** DuckDB CTEs shared by the probe and recall oracles: `e` (vectors),
    * `cents` (the lowest-`nCentroids` ids — [[SimilaritySearch.sampleCentroids]]),
    * `asg` (top-`nProbeBuild` cells per vector, with rank), `pc` (each
    * node's PRIMARY cell), `adj` (the REBUILT diversity-pruned
    * cap∘top-`m`+self adjacency — ≡ the engine's fold of appended
    * batches), `ents` (the per-cell best-aligned node — ≡ the engine's
    * fold of appended [[entryBatch]]es). */
  private def adjacencyCtes(table: String, idCol: String, vecCol: String,
                            nCentroids: Int, nProbeBuild: Int,
                            m: Int, cellCap: Int): String =
    s"""e AS (SELECT CAST($idCol AS BIGINT) AS id, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT id AS ccid, ev AS cvec FROM e WHERE id < $nCentroids),
       asg AS (
         SELECT id, ev, ccid AS cell, rn FROM (
           SELECT e.id, e.ev, c.ccid,
             row_number() OVER (PARTITION BY e.id
               ORDER BY list_dot_product(e.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM e, cents c) WHERE rn <= $nProbeBuild),
       pc AS (SELECT id, cell AS pcell FROM asg WHERE rn = 1),
       pairs AS (
         SELECT DISTINCT x.id AS src, y.id AS dst, p.pcell AS dcell, x.ev AS sv, y.ev AS dv
         FROM asg x JOIN asg y USING (cell) JOIN pc p ON p.id = y.id
         WHERE x.id <> y.id),
       scored AS (
         SELECT src, dst, dcell, dv,
           list_dot_product(sv, dv) /
             (sqrt(list_dot_product(sv, sv)) * sqrt(list_dot_product(dv, dv))) AS cosine
         FROM pairs),
       adj AS (
         SELECT src, dst, dv FROM (
           SELECT src, dst, dv,
             row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn
           FROM (
             SELECT src, dst, dv, cosine,
               row_number() OVER (PARTITION BY src, dcell ORDER BY cosine DESC, dst) AS rc
             FROM scored) WHERE rc <= $cellCap) WHERE rn <= $m
         UNION ALL
         SELECT DISTINCT id AS src, id AS dst, ev AS dv FROM e),
       ents AS (SELECT DISTINCT id AS eid FROM (
           SELECT a.id, row_number() OVER (PARTITION BY a.cell
               ORDER BY list_dot_product(a.ev, c.cvec) /
                 (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(c.cvec, c.cvec))) DESC, a.id) AS rn
           FROM asg a JOIN cents c ON c.ccid = a.cell) WHERE rn = 1)"""

  /** Beam-search CTEs for queries in `qs(qid, qv)`: per-qid frontier
    * evolution with `hops` expansion rounds (hops ∈ {2, 3} supported — the
    * unrolled-CTE form the oracle needs). Terminal relation `vis` holds
    * (qid, dst, c) for every visited node. */
  private def beamCtes(ef: Int, hops: Int): String = {
    val sq = """sc AS (
         SELECT q.qid, a.src, a.dst,
           list_dot_product(a.dv, q.qv) /
             (sqrt(list_dot_product(a.dv, a.dv)) * sqrt(list_dot_product(q.qv, q.qv))) AS c
         FROM adj a, qs q)"""
    s"$sq, ${frontierCtes(ef, hops)}"
  }

  /** The frontier-evolution CTEs alone, over an existing `${pfx}sc(qid,
    * src, dst, c)` relation (higher c = better — the PQ oracle feeds
    * negated ADC distances) and the `ents(eid)` entry relation from
    * [[adjacencyCtes]]. `pfx` namespaces the chain so two beams
    * (float-graph and PQ-graph) can coexist in one oracle. */
  private def frontierCtes(ef: Int, hops: Int,
                           pfx: String = ""): String = {
    require(hops == 2 || hops == 3, "oracle unrolls 2 or 3 hops")
    val (sc, v1, x1, v2, x2, v3, vis) =
      (s"${pfx}sc", s"${pfx}v1", s"${pfx}x1", s"${pfx}v2", s"${pfx}x2",
        s"${pfx}v3", s"${pfx}vis")
    val hop23 = s"""
       $v1 AS (SELECT DISTINCT qid, dst, c FROM $sc WHERE src IN (SELECT eid FROM ents)),
       $x1 AS (SELECT qid, dst FROM (
           SELECT qid, dst, row_number() OVER (PARTITION BY qid ORDER BY c DESC, dst) AS rn
           FROM $v1 WHERE dst NOT IN (SELECT eid FROM ents)) WHERE rn <= $ef),
       $v2 AS (SELECT DISTINCT qid, dst, c FROM (
           SELECT qid, dst, c FROM $v1
           UNION ALL
           SELECT s.qid, s.dst, s.c FROM $sc s JOIN $x1 ON $x1.qid = s.qid AND $x1.dst = s.src))"""
    val hop3 = s"""
       $x2 AS (SELECT qid, dst FROM (
           SELECT $v2.qid, $v2.dst, row_number() OVER (PARTITION BY $v2.qid ORDER BY $v2.c DESC, $v2.dst) AS rn
           FROM $v2
           WHERE $v2.dst NOT IN (SELECT eid FROM ents)
             AND NOT EXISTS (SELECT 1 FROM $x1 WHERE $x1.qid = $v2.qid AND $x1.dst = $v2.dst))
         WHERE rn <= $ef),
       $v3 AS (SELECT DISTINCT qid, dst, c FROM (
           SELECT qid, dst, c FROM $v2
           UNION ALL
           SELECT s.qid, s.dst, s.c FROM $sc s JOIN $x2 ON $x2.qid = s.qid AND $x2.dst = s.src))"""
    if (hops == 2) s"$hop23, $vis AS (SELECT qid, dst, c FROM $v2)"
    else s"$hop23, $hop3, $vis AS (SELECT qid, dst, c FROM $v3)"
  }

  /** Oracle for a stored-graph beam probe of ONE query id: full rebuild of
    * the adjacency + the exact frontier replay. */
  def beamProbeOracleSql(table: String, idCol: String, vecCol: String,
                         queryId: Long, nCentroids: Int, nProbeBuild: Int,
                         m: Int, cellCap: Int, ef: Int, hops: Int,
                         k: Int): String =
    s"""WITH ${adjacencyCtes(table, idCol, vecCol, nCentroids, nProbeBuild, m, cellCap)},
       qs AS (SELECT id AS qid, ev AS qv FROM e WHERE id = $queryId),
       ${beamCtes(ef, hops)}
       SELECT dst AS $idCol, c AS cosine FROM vis
       ORDER BY c DESC, dst LIMIT $k"""

  // ── PQ-compressed graph — DiskANN's ACTUAL serving layout ──────────────
  // (Subramanya et al. 2019 §3: traversal distances from compressed codes,
  // full-precision vectors only for the final rerank.) Edge rows carry the
  // dst's m-byte PQ code instead of its float vector — the index shrinks
  // ~dim·8/m per edge (64-dim doubles → 4 bytes is 128×), which is what
  // makes a billion-node graph fit on one box's SSD. Self-edges keep BOTH
  // the code (so traversal can score them) and the full vector (the rerank
  // store + the incremental build's old-side source). The beam runs on
  // NEGATED ADC distances through the same frontier evolution; the top-
  // `rerank` survivors read their self-edge rows (bucket-pruned) for the
  // exact-cosine finish.

  /** One build/increment batch in the PQ layout: same candidates/top-m as
    * [[edgeBatch]], codes stamped from the full vectors at build time
    * (exactly DiskANN: the GRAPH is built with exact distances, only
    * SERVING uses the compression). */
  def pqEdgeBatch(batchCells: DataFrame, otherCells: Option[DataFrame],
                  m: Int, buckets: Int, cellCap: Int,
                  codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val pruned = attachDvec(
      topMDiverse(allCandidates(batchCells, otherCells), m, cellCap),
      batchCells, otherCells)
    val nonSelf = SimilaritySearch
      .withPqCodes(pruned, "dvec", codebooks)
      .select(col("src"), col("dst"), col("dcell"), col("pq").as("dpq"),
        lit(null).cast("array<double>").as("dvec"), col("cosine"))
    val self = SimilaritySearch
      .withPqCodes(selfEdges(batchCells), "dvec", codebooks)
      .select(col("src"), col("dst"), col("dcell"), col("pq").as("dpq"),
        col("dvec"), col("cosine"))
    nonSelf.unionByName(self)
      .withColumn("bucket", pmod(col("src"), lit(buckets.toLong)))
  }

  /** Negated ADC distance of a code column against a query's lookup table
    * — m literal table lookups summed left-to-right then negated (IEEE
    * negation is exact), so [[beamSearch]]'s higher-is-better ordering
    * needs no special case. */
  def negAdc(codeCol: Column, adcTable: Seq[Seq[Double]]): Column =
    -adcTable.zipWithIndex.map { case (t, j) =>
      element_at(typedLit(t.toArray),
        element_at(codeCol, j + 1).cast("int") + 1)
    }.reduceLeft(_ + _)

  /** Frontier expansion in the PQ layout: score each dst ONCE by negated
    * ADC over its stored code — float vectors untouched during traversal. */
  def expandPqFrom(adj: DataFrame, adcTable: Seq[Seq[Double]])(frontier: Seq[Long]): Seq[(Long, Double)] =
    adj.where(col("src").isin(frontier: _*))
      .select(col("dst"), col("dpq")).distinct()
      .select(col("dst"), negAdc(col("dpq"), adcTable).as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  /** Oracle for the stored PQ-graph probe of ONE query id: adjacency
    * rebuild (exact-cosine edges), PQ encode of every node from the same
    * `id < ks` codebook rule, the frontier replay on negated ADC, exact-
    * cosine rerank of the top-`rerank` survivors. */
  def pqBeamProbeOracleSql(table: String, idCol: String, vecCol: String,
                           queryId: Long, nCentroids: Int, nProbeBuild: Int,
                           m: Int, cellCap: Int, ef: Int, hops: Int,
                           dim: Int, pqM: Int, ks: Int,
                           rerank: Int, k: Int): String = {
    val d = dim / pqM
    val chain = (1 until pqM).foldLeft("s0") { (acc, j) => s"($acc + s$j)" }
    val pivots = (0 until pqM)
      .map(j => s"max(CASE WHEN j = $j THEN t END) AS s$j").mkString(", ")
    s"""WITH ${adjacencyCtes(table, idCol, vecCol, nCentroids, nProbeBuild, m, cellCap)},
       qs AS (SELECT id AS qid, ev AS qv FROM e WHERE id = $queryId),
       js AS (SELECT unnest(generate_series(0, ${pqM - 1})) AS j),
       sub AS (SELECT id, j, ev[(j*$d+1):(j*$d+$d)] AS sv FROM e, js),
       cb AS (SELECT j, id AS cid, sv AS cv FROM sub WHERE id < $ks),
       enc AS (
         SELECT id, j, cid FROM (
           SELECT s.id, s.j, c.cid,
             row_number() OVER (PARTITION BY s.id, s.j
               ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(s.sv, c.cv) ASC, c.cid) AS rn
           FROM sub s JOIN cb c USING (j)) WHERE rn = 1),
       qsub AS (SELECT j, sv AS qsv FROM sub WHERE id = $queryId),
       term AS (
         SELECT enc.id, enc.j,
           list_dot_product(c.cv, c.cv) - 2*list_dot_product(q.qsv, c.cv) AS t
         FROM enc JOIN cb c ON enc.j = c.j AND enc.cid = c.cid
                  JOIN qsub q ON q.j = enc.j),
       adc AS (SELECT id, $chain AS adist FROM (
         SELECT id, $pivots FROM term GROUP BY id)),
       sc AS (SELECT CAST($queryId AS BIGINT) AS qid, a.src, a.dst,
                -(adc.adist) AS c
              FROM adj a JOIN adc ON adc.id = a.dst),
       ${frontierCtes(ef, hops)},
       cand AS (SELECT dst FROM vis ORDER BY c DESC, dst LIMIT $rerank)
       SELECT cand.dst AS $idCol,
         list_dot_product(e.ev, q.qv) /
         (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
       FROM cand JOIN e ON e.id = cand.dst, qs q
       ORDER BY cosine DESC, cand.dst LIMIT $k"""
  }

  /** Oracle replaying [[pqBeamSearchBatch]] for all queries in
    * `queryFilter`: adjacency rebuild, PQ encode of every node, per-qid
    * negated-ADC frontier replay, exact-cosine rerank of each query's
    * top-`rerank` survivors. Output: (qid, id, cosine, rank ≤ k). */
  def pqBeamBatchOracleSql(table: String, idCol: String, vecCol: String,
                           queryFilter: String, nCentroids: Int,
                           nProbeBuild: Int, m: Int, cellCap: Int,
                           ef: Int, hops: Int,
                           dim: Int, pqM: Int, ks: Int,
                           rerank: Int, k: Int): String = {
    val d = dim / pqM
    val chain = (1 until pqM).foldLeft("s0") { (acc, j) => s"($acc + s$j)" }
    val pivots = (0 until pqM)
      .map(j => s"max(CASE WHEN j = $j THEN t END) AS s$j").mkString(", ")
    s"""WITH ${adjacencyCtes(table, idCol, vecCol, nCentroids, nProbeBuild, m, cellCap)},
       qs AS (SELECT id AS qid, ev AS qv FROM e WHERE $queryFilter),
       js AS (SELECT unnest(generate_series(0, ${pqM - 1})) AS j),
       sub AS (SELECT id, j, ev[(j*$d+1):(j*$d+$d)] AS sv FROM e, js),
       cb AS (SELECT j, id AS cid, sv AS cv FROM sub WHERE id < $ks),
       enc AS (
         SELECT id, j, cid FROM (
           SELECT s.id, s.j, c.cid,
             row_number() OVER (PARTITION BY s.id, s.j
               ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(s.sv, c.cv) ASC, c.cid) AS rn
           FROM sub s JOIN cb c USING (j)) WHERE rn = 1),
       qsub AS (SELECT q.qid, s.j, s.sv AS qsv
                FROM sub s JOIN qs q ON s.id = q.qid),
       term AS (
         SELECT u.qid, enc.id, enc.j,
           list_dot_product(c.cv, c.cv) - 2*list_dot_product(u.qsv, c.cv) AS t
         FROM enc JOIN cb c ON enc.j = c.j AND enc.cid = c.cid
                  JOIN qsub u ON u.j = enc.j),
       adc AS (SELECT qid, id, $chain AS adist FROM (
         SELECT qid, id, $pivots FROM term GROUP BY qid, id)),
       sc AS (SELECT adc.qid, a.src, a.dst, -(adc.adist) AS c
              FROM adj a JOIN adc ON adc.id = a.dst),
       ${frontierCtes(ef, hops)},
       pcand AS (SELECT qid, dst FROM (
           SELECT qid, dst, row_number() OVER (PARTITION BY qid ORDER BY c DESC, dst) AS rn
           FROM vis) WHERE rn <= $rerank)
       SELECT p.qid, p.dst AS id,
         list_dot_product(e.ev, q.qv) /
           (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine,
         CAST(row_number() OVER (PARTITION BY p.qid
           ORDER BY list_dot_product(e.ev, q.qv) /
             (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(q.qv, q.qv))) DESC, p.dst) AS INT) AS rank
       FROM pcand p JOIN e ON e.id = p.dst
                    JOIN qs q ON q.qid = p.qid
       QUALIFY rank <= $k
       ORDER BY p.qid, rank"""
  }

  /** Recall@k A/B/C — the float beam vs the PQ beam vs the IVF probe at
    * comparable probe cost, all against the exact top-k (the (ef, hops, m)
    * tuning gate, mirroring [[SimilaritySearch.annRecallReport]]). One row
    * per query: (qid, k_exact, hnsw_hits, hnsw_recall_micro, pq_hits,
    * pq_recall_micro, ivf_hits, ivf_recall_micro).
    *
    * Every arm is BATCHED (r13 verdict item 2): the two beam arms advance
    * in ONE combined frontier loop under composite qids (one plan per hop
    * across all queries × both arms — half the rounds of two separate
    * beams), IVF routes through [[SimilaritySearch.ivfBatchTopK]] (in-plan
    * per-query cells), and the exact ground truth is ONE broadcast-query
    * scoring pass — so the gate scales from its 4-query sample to a
    * 1,000-query tuning sweep with zero driver-serial work. Entries come
    * from the build-time per-cell rule ([[entryBatch]]), the same seeds the
    * stored probes read from their entry pipes. */
  def recallReport(emb: DataFrame, idCol: String, vecCol: String,
                   queryIds: Seq[Long], centroids: Seq[Seq[Double]],
                   nProbeBuild: Int, m: Int, buckets: Int, cellCap: Int,
                   ef: Int, hops: Int,
                   k: Int, nProbeIvf: Int,
                   codebooks: Seq[Seq[Seq[Double]]], pqRerank: Int): DataFrame = {
    val cells = withBuildCells(emb, idCol, vecCol, centroids, nProbeBuild)
    val adj = foldAdjacency(edgeBatch(cells, None, m, buckets, cellCap), m, cellCap)
      .localCheckpoint(true) // expanded `hops` times
    // The PQ layout shares the float graph's pruned edge set by
    // construction ([[pqEdgeBatch]] runs the same candidates/top-m before
    // coding), so RE-CODE the built adjacency instead of paying the
    // Σ|cell|² candidate scoring twice; one edge table carries BOTH
    // payloads (float vector + PQ code).
    val eadj = SimilaritySearch.withPqCodes(adj, "dvec", codebooks)
      .select(col("src"), col("dst"), col("dvec"), col("pq").as("dpq"))
      .localCheckpoint(true)
    val entries = entryIds(entryBatch(cells, centroids))
    recallReportFromIndex(emb, idCol, vecCol, queryIds, centroids,
      eadj, entries, ef, hops, k, nProbeIvf, codebooks, pqRerank)
  }

  /** [[recallReport]] over a PREBUILT index: `eadj` is the folded
    * adjacency carrying BOTH payloads (src, dst, dvec, dpq) — a
    * materialized frame (checkpoint or a store/parquet read; it is
    * expanded `hops` times) — and `entries` the build-time entry ids. The
    * build-once/probe-many split lets one corpus-level build serve every
    * gate (and every bench pass) instead of rebuilding per call. */
  def recallReportFromIndex(emb: DataFrame, idCol: String, vecCol: String,
                            queryIds: Seq[Long], centroids: Seq[Seq[Double]],
                            eadj: DataFrame, entries: Seq[Long],
                            ef: Int, hops: Int, k: Int, nProbeIvf: Int,
                            codebooks: Seq[Seq[Seq[Double]]],
                            pqRerank: Int): DataFrame = {
    val qs = emb.where(col(idCol).isin(queryIds: _*))
      .select(col(idCol).cast("long").as("qid"),
        col(vecCol).cast("array<double>").as("__qv"))
      .localCheckpoint(true)
    // COMBINED probe: the float and PQ arms advance in ONE frontier loop
    // under composite qids (qid·2 + arm), so each hop is one plan across
    // all queries × both arms — half the rounds of two separate beams,
    // and the per-arm evolutions stay independent (every join and window
    // keys on the composite qid).
    val qsArm = qs.withColumn("__adc", adcTableCol(codebooks))
      .select(col("qid"), col("__qv"), col("__adc"),
        explode(array(lit(0L), lit(1L))).as("__arm"))
      .select((col("qid") * 2 + col("__arm")).as("qid"),
        col("__qv"), col("__adc"), col("__arm"))
      .localCheckpoint(true)
    val armScore = when(col("__arm") === 0,
        VectorFns.cosine(col("dvec"), col("__qv")))
      .otherwise(negAdcLookup(col("dpq"), codebooks.length))
    val visited = beamBatchCore(eadj, Seq("dvec", "dpq"), qsArm, armScore,
        entries, ef, hops)
      .localCheckpoint(true) // consumed by both arm extractions below
    val beam = visited.where(col("qid") % 2 === 0)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("c").desc, col("dst"))))
      .where(col("rank") <= k)
      .select(expr("qid div 2").as("qid"), col("dst").as("id"))
    // the PQ arm's exact-cosine rerank of its top-`pqRerank` survivors,
    // vectors from the self-edge rows
    val pq = visited.where(col("qid") % 2 === 1)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("c").desc, col("dst"))))
      .where(col("__rn") <= pqRerank)
      .select(expr("qid div 2").as("qid"), col("dst"))
      .join(eadj.where(col("src") === col("dst"))
        .select(col("dst"), col("dvec")).distinct(), Seq("dst"))
      .join(broadcast(qs), Seq("qid"))
      .select(col("qid"), col("dst"),
        VectorFns.cosine(col("dvec"), col("__qv")).as("c2"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("c2").desc, col("dst"))))
      .where(col("rank") <= k)
      .select(col("qid"), col("dst").as("id"))
    val ivf = SimilaritySearch.ivfBatchTopK(
        SimilaritySearch.withIvfCell(emb, vecCol, centroids, "cell"), qs,
        idCol, vecCol, "cell", "qid", "__qv", centroids, k, nProbeIvf)
      .select(col("qid"), col(idCol).cast("long").as("id"))
    // exact ground truth: one scoring pass, query side broadcast — the
    // inherent cost of a recall gate (|queries| is the bounded sample)
    val exact = emb
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(broadcast(qs))
      .select(col("qid"), col("id"),
        VectorFns.cosine(col("__v"), col("__qv")).as("c"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("c").desc, col("id"))))
      .where(col("__rn") <= k)
      .select(col("qid"), col("id"))
      .localCheckpoint(true) // shared by the count and all three hit joins
    def hits(arm: DataFrame, name: String): DataFrame =
      exact.join(arm, Seq("qid", "id"), "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as(name))
    exact.groupBy(col("qid")).agg(count(lit(1)).as("k_exact"))
      .join(hits(beam, "hh"), Seq("qid"), "left")
      .join(hits(pq, "ph"), Seq("qid"), "left")
      .join(hits(ivf, "ih"), Seq("qid"), "left")
      .select(col("qid"), col("k_exact"),
        coalesce(col("hh"), lit(0L)).as("hnsw_hits"),
        expr("coalesce(hh, 0L) * 1000000L div k_exact").as("hnsw_recall_micro"),
        coalesce(col("ph"), lit(0L)).as("pq_hits"),
        expr("coalesce(ph, 0L) * 1000000L div k_exact").as("pq_recall_micro"),
        coalesce(col("ih"), lit(0L)).as("ivf_hits"),
        expr("coalesce(ih, 0L) * 1000000L div k_exact").as("ivf_recall_micro"))
      .orderBy(col("qid"))
  }

  /** Oracle replaying [[recallReport]]: exact top-k, the IVF probe, and the
    * beam replay, per query id in `queryFilter`. */
  def recallOracleSql(table: String, idCol: String, vecCol: String,
                      queryFilter: String, nCentroids: Int, nProbeBuild: Int,
                      m: Int, cellCap: Int, ef: Int, hops: Int,
                      k: Int, nProbeIvf: Int,
                      dim: Int, pqM: Int, ks: Int, pqRerank: Int): String = {
    val d = dim / pqM
    val chain = (1 until pqM).foldLeft("s0") { (acc, j) => s"($acc + s$j)" }
    val pivots = (0 until pqM)
      .map(j => s"max(CASE WHEN j = $j THEN t END) AS s$j").mkString(", ")
    s"""WITH ${adjacencyCtes(table, idCol, vecCol, nCentroids, nProbeBuild, m, cellCap)},
       qs AS (SELECT id AS qid, ev AS qv FROM e WHERE $queryFilter),
       ${beamCtes(ef, hops)},
       beam AS (SELECT qid, dst FROM (
           SELECT qid, dst, row_number() OVER (PARTITION BY qid ORDER BY c DESC, dst) AS rn
           FROM vis) WHERE rn <= $k),
       js AS (SELECT unnest(generate_series(0, ${pqM - 1})) AS j),
       sub AS (SELECT id, j, ev[(j*$d+1):(j*$d+$d)] AS sv FROM e, js),
       cb AS (SELECT j, id AS cid, sv AS cv FROM sub WHERE id < $ks),
       enc AS (
         SELECT id, j, cid FROM (
           SELECT s.id, s.j, c.cid,
             row_number() OVER (PARTITION BY s.id, s.j
               ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(s.sv, c.cv) ASC, c.cid) AS rn
           FROM sub s JOIN cb c USING (j)) WHERE rn = 1),
       qsub AS (SELECT q.qid, s.j, s.sv AS qsv
                FROM sub s JOIN qs q ON s.id = q.qid),
       term AS (
         SELECT u.qid, enc.id, enc.j,
           list_dot_product(c.cv, c.cv) - 2*list_dot_product(u.qsv, c.cv) AS t
         FROM enc JOIN cb c ON enc.j = c.j AND enc.cid = c.cid
                  JOIN qsub u ON u.j = enc.j),
       adc AS (SELECT qid, id, $chain AS adist FROM (
         SELECT qid, id, $pivots FROM term GROUP BY qid, id)),
       gsc AS (SELECT adc.qid, a.src, a.dst, -(adc.adist) AS c
               FROM adj a JOIN adc ON adc.id = a.dst),
       ${frontierCtes(ef, hops, pfx = "g")},
       pcand AS (SELECT qid, dst FROM (
           SELECT qid, dst, row_number() OVER (PARTITION BY qid ORDER BY c DESC, dst) AS rn
           FROM gvis) WHERE rn <= $pqRerank),
       pq AS (SELECT qid, dst FROM (
           SELECT p.qid, p.dst,
             row_number() OVER (PARTITION BY p.qid
               ORDER BY list_dot_product(e.ev, q.qv) /
                 (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(q.qv, q.qv))) DESC, p.dst) AS rn
           FROM pcand p JOIN e ON e.id = p.dst
                        JOIN qs q ON q.qid = p.qid) WHERE rn <= $k),
       exact AS (SELECT qid, id FROM (
           SELECT q.qid, e.id,
             row_number() OVER (PARTITION BY q.qid
               ORDER BY list_dot_product(e.ev, q.qv) /
                 (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(q.qv, q.qv))) DESC, e.id) AS rn
           FROM e, qs q) WHERE rn <= $k),
       icell AS (SELECT id, ccid AS cell FROM (
           SELECT e.id, c.ccid,
             row_number() OVER (PARTITION BY e.id
               ORDER BY list_dot_product(e.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM e, cents c) WHERE rn = 1),
       qcell AS (SELECT qid, qv, ccid AS cell FROM (
           SELECT q.qid, q.qv, c.ccid,
             row_number() OVER (PARTITION BY q.qid
               ORDER BY list_dot_product(q.qv, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM qs q, cents c) WHERE rn <= $nProbeIvf),
       ivf AS (SELECT qid, id FROM (
           SELECT qc.qid, e.id,
             row_number() OVER (PARTITION BY qc.qid
               ORDER BY list_dot_product(e.ev, qc.qv) /
                 (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(qc.qv, qc.qv))) DESC, e.id) AS rn
           FROM qcell qc JOIN icell a USING (cell) JOIN e ON e.id = a.id) WHERE rn <= $k),
       hh AS (SELECT x.qid, CAST(count(*) AS BIGINT) AS hnsw_hits
              FROM exact x JOIN beam b ON b.qid = x.qid AND b.dst = x.id GROUP BY 1),
       ph AS (SELECT x.qid, CAST(count(*) AS BIGINT) AS pq_hits
              FROM exact x JOIN pq p ON p.qid = x.qid AND p.dst = x.id GROUP BY 1),
       ih AS (SELECT x.qid, CAST(count(*) AS BIGINT) AS ivf_hits
              FROM exact x JOIN ivf v ON v.qid = x.qid AND v.id = x.id GROUP BY 1),
       ke AS (SELECT qid, CAST(count(*) AS BIGINT) AS k_exact FROM exact GROUP BY 1)
       SELECT ke.qid, ke.k_exact,
         COALESCE(hh.hnsw_hits, 0) AS hnsw_hits,
         COALESCE(hh.hnsw_hits, 0) * 1000000 // ke.k_exact AS hnsw_recall_micro,
         COALESCE(ph.pq_hits, 0) AS pq_hits,
         COALESCE(ph.pq_hits, 0) * 1000000 // ke.k_exact AS pq_recall_micro,
         COALESCE(ih.ivf_hits, 0) AS ivf_hits,
         COALESCE(ih.ivf_hits, 0) * 1000000 // ke.k_exact AS ivf_recall_micro
       FROM ke LEFT JOIN hh USING (qid) LEFT JOIN ph USING (qid)
               LEFT JOIN ih USING (qid)
       ORDER BY ke.qid"""
  }
}
