package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pair lists (near-dup graphs, link graphs).
  *
  * Connected components live in [[ApproxDedup.nearDupClusters]] (hash-min
  * label propagation); this adds the other standard corpus-graph primitive —
  * centrality — as a FIXED-ITERATION, integer-quantized PageRank whose
  * every arithmetic step an ANSI SQL oracle replays exactly.
  */
object Graph {

  /** PageRank with integer micro-unit ranks: r⁰ = round(10⁶/N);
    * rᵏ⁺¹(v) = round(d·10⁶/N·(1−damping)… precisely:
    * base = round((1−damping)·10⁶/N), per-edge contribution
    * round(damping·rᵏ(u)/deg(u)) summed as LONGs. Quantizing each edge
    * contribution BEFORE the sum makes every iteration order-independent
    * (the char-entropy/BM25 trick), so the result is reproducible at any
    * parallelism and the oracle unrolls the same `iters` steps in SQL.
    *
    * Scale shape per iteration: one join of the (node, rank) table to the
    * edge list + one hash aggregate keyed on the destination — the
    * standard distributed PageRank step; rank tables localCheckpoint each
    * pass so plan depth stays constant. `iters` is a configuration bound,
    * not a convergence loop — centrality screening wants a fixed budget.
    *
    * The pair list is UNDIRECTED (each pair contributes both directions);
    * every node of the graph therefore has degree ≥ 1 and no dangling-mass
    * term is needed.
    */
  /** HITS authorities (Kleinberg 1999) over a weighted BIPARTITE edge
    * list (u, t, w) — e.g. users × event types: a type is authoritative
    * when heavy hubs hit it, a user is a hub when they hit authoritative
    * types. `iters` mutually-recursive half-steps
    * h(u) = Σₜ w·a(t), a(t) = Σᵤ w·h(u), each L1-renormalized to
    * |side|·10⁶ (same eigenvector direction as the L2 form, but the
    * normalization is ONE IEEE division over exact-long sums — no sqrt).
    *
    * Determinism: the half-step sums are EXACT integer products (no
    * per-edge quantization needed at all); only the renormalization
    * rounds, identically on both engines. The per-edge product widens to
    * DECIMAL(38,0) INSIDE the per-node aggregate (mirroring the oracle's
    * HUGEINT sum) — a corpus-scale per-node Σ w·h can pass 9.2·10¹⁸
    * before the total is ever formed, so widening only the total would
    * still wrap.
    *
    * Scale per half-step: one equi-join of the current vector to the
    * aggregated edge list + one keyed aggregate — the hub vector is
    * |users|-sized and stays distributed; vectors localCheckpoint per
    * step. Output: the authority side (bounded by |types|). */
  def hitsAuthoritiesMicro(edges: DataFrame, uCol: String, tCol: String,
                           wCol: String, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    val e = edges.select(col(uCol).as("u"), col(tCol).as("t"),
        col(wCol).as("w"))
      .groupBy(col("u"), col("t")).agg(sum(col("w")).as("w"))
      .localCheckpoint(true)
    val nU = e.select(col("u")).distinct()
      .agg(count(lit(1)).cast("double").as("nu"))
    val nT = e.select(col("t")).distinct()
      .agg(count(lit(1)).cast("double").as("nt"))
    var a = e.select(col("t")).distinct()
      .select(col("t"), lit(1000000L).as("a")).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val hraw = e.join(a, "t")
        .groupBy(col("u"))
        .agg(sum(col("w").cast("decimal(38,0)") * col("a")).as("raw"))
      val htot = hraw.agg(sum(col("raw")).cast("double").as("tot"))
      val h = hraw.crossJoin(broadcast(htot)).crossJoin(broadcast(nU))
        .select(col("u"),
          round(col("raw").cast("double") * col("nu") * lit(1e6) /
            col("tot")).cast("long").as("h"))
        .localCheckpoint(true)
      val araw = e.join(h, "u")
        .groupBy(col("t"))
        .agg(sum(col("w").cast("decimal(38,0)") * col("h")).as("raw"))
      val atot = araw.agg(sum(col("raw")).cast("double").as("tot"))
      a = araw.crossJoin(broadcast(atot)).crossJoin(broadcast(nT))
        .select(col("t"),
          round(col("raw").cast("double") * col("nt") * lit(1e6) /
            col("tot")).cast("long").as("a"))
        .localCheckpoint(true)
    }
    a.select(col("t"), col("a").as("authority_micro"))
  }

  /** DuckDB oracle replaying [[hitsAuthoritiesMicro]]. */
  def hitsAuthoritiesOracleSql(edgesSql: String, iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""hr$i AS (SELECT e.u, sum(CAST(e.w AS HUGEINT) * a.a) AS raw
           FROM e JOIN a${i - 1} a ON a.t = e.t GROUP BY e.u),
         ht$i AS (SELECT CAST(sum(raw) AS DOUBLE) AS tot
                  FROM hr$i),
         h$i AS (SELECT u, CAST(round(CAST(raw AS DOUBLE) * nu.nu
                   * 1000000.0 / ht$i.tot) AS BIGINT) AS h
                 FROM hr$i, ht$i, nu),
         ar$i AS (SELECT e.t, sum(CAST(e.w AS HUGEINT) * h.h) AS raw
           FROM e JOIN h$i h ON h.u = e.u GROUP BY e.t),
         at$i AS (SELECT CAST(sum(raw) AS DOUBLE) AS tot
                  FROM ar$i),
         a$i AS (SELECT t, CAST(round(CAST(raw AS DOUBLE) * nt.nt
                   * 1000000.0 / at$i.tot) AS BIGINT) AS a
                 FROM ar$i, at$i, nt)"""
    }.mkString(",\n       ")
    s"""WITH e0 AS ($edgesSql),
       e AS (SELECT u, t, CAST(sum(w) AS BIGINT) AS w FROM e0 GROUP BY 1, 2),
       nu AS (SELECT CAST(count(DISTINCT u) AS DOUBLE) AS nu FROM e),
       nt AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS nt FROM e),
       a0 AS (SELECT DISTINCT t, CAST(1000000 AS BIGINT) AS a FROM e),
       $iterCtes
       SELECT t, a AS authority_micro FROM a$iters ORDER BY t"""
  }

  /** WEIGHTED PageRank — the form TextRank's paper actually specifies
    * (Mihalcea & Tarau 2004 §2.2): each neighbor's contribution scales by
    * the edge weight's share of the source's total weight,
    * round(damping·rᵏ(u)·w(u,v)/W(u)). Same quantize-before-sum
    * discipline and per-iteration shape as [[pageRankMicro]] (which is
    * the w ≡ 1 special case); parallel edges aggregate their weights
    * before any iteration. */
  def pageRankWeightedMicro(pairs: DataFrame, id1: String, id2: String,
                            wCol: String, iters: Int = 3,
                            damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    require(damping > 0.0 && damping < 1.0, "damping must be in (0, 1)")
    val edges = pairs.select(col(id1).as("src"), col(id2).as("dst"),
        col(wCol).as("w"))
      .union(pairs.select(col(id2).as("src"), col(id1).as("dst"),
        col(wCol).as("w")))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .localCheckpoint(true)
    val wsum = edges.groupBy(col("src")).agg(sum(col("w")).as("wt"))
    val nodes = edges.select(col("src").as("node")).distinct()
    val n = nodes.agg(count(lit(1)).cast("double").as("n"))
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("node"),
        round(lit(1e6) / col("n")).cast("long").as("rank_micro"))
      .localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val contribs = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(wsum, "src")
        .select(col("dst").as("node"),
          round(lit(damping) * col("rank_micro").cast("double") *
            col("w").cast("double") / col("wt").cast("double"))
            .cast("long").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("in_micro"))
      ranks = contribs.crossJoin(broadcast(n))
        .select(col("node"),
          (round(lit(1.0 - damping) * lit(1e6) / col("n")).cast("long") +
            col("in_micro")).as("rank_micro"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), col("rank_micro"))
  }

  def pageRankMicro(pairs: DataFrame, id1: String = "id1",
                    id2: String = "id2", iters: Int = 3,
                    damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    require(damping > 0.0 && damping < 1.0, "damping must be in (0, 1)")
    val edges = pairs.select(col(id1).as("src"), col(id2).as("dst"))
      .union(pairs.select(col(id2).as("src"), col(id1).as("dst")))
      .distinct().localCheckpoint(true)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("node")).distinct()
    // N rides as a broadcast single-row frame — no driver action
    val n = nodes.agg(count(lit(1)).cast("double").as("n"))
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("node"),
        round(lit(1e6) / col("n")).cast("long").as("rank_micro"))
      .localCheckpoint(true)
    try {
      (1 to iters).foreach { _ =>
        val contribs = edges
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .join(deg, "src")
          .select(col("dst").as("node"),
            round(lit(damping) * col("rank_micro").cast("double") /
              col("deg").cast("double")).cast("long").as("contrib"))
          .groupBy(col("node"))
          .agg(sum(col("contrib")).as("in_micro"))
        val next = contribs.crossJoin(broadcast(n))
          .select(col("node"),
            (round(lit(1.0 - damping) * lit(1e6) / col("n")).cast("long") +
              col("in_micro")).as("rank_micro"))
          .localCheckpoint(true)
        ranks = next
      }
    } finally ()
    ranks.select(col("node"), col("rank_micro"))
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected pair list — the dedup-graph QA primitive next to
    * [[pageRankMicro]]: a near-dup graph whose nodes close many triangles
    * is template/boilerplate structure (transitive near-dup mass), while a
    * high-degree node with LCC ≈ 0 is a hub pairing with unrelated docs —
    * usually a short/degenerate document the banding over-matches.
    *
    * Algorithm: the degree-ordered orientation (the "compact-forward" /
    * MapReduce node-iterator of Suri & Vassilvitskii, WWW 2011): orient
    * every edge from the endpoint with smaller (degree, id) to the larger,
    * enumerate wedges as pairs of OUT-edges of one node, close each wedge
    * against the oriented edge list. Each triangle is produced exactly
    * once, and the wedge fanout per node is bounded by its OUT-degree,
    * which the orientation caps at O(√E) for ANY degree distribution —
    * the skew guard that makes this survive a web-scale near-dup graph
    * where a raw id-ordered orientation would square a hub's degree.
    * The triangle SET is orientation-invariant, so the oracle replays the
    * simpler id-canonical enumeration and must agree row-for-row.
    *
    * Scale shape: two self-equi-joins of the oriented edge list (wedge
    * build keyed on the shared source, closure keyed on (v, w)) + one
    * keyed aggregate; no window, no driver action. lcc = 2·T/(deg·(deg−1))
    * in micro-units, the ONE float stage.
    */
  def triangleStats(pairs: DataFrame, id1: String = "id1",
                    id2: String = "id2"): DataFrame = {
    val e = pairs
      .select(least(col(id1), col(id2)).as("a"),
        greatest(col(id1), col(id2)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct().localCheckpoint(true)
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)
    // orient by (degree, id): src = smaller endpoint under that order
    val withDeg = e
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
    val rankAless = (col("da") < col("db")) ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = withDeg.select(
        when(rankAless, col("a")).otherwise(col("b")).as("u"),
        when(rankAless, col("b")).otherwise(col("a")).as("v"),
        when(rankAless, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint(true)
    // wedges: two out-edges (u,v), (u,w) with rank(v) < rank(w)
    val wedges = o.select(col("u"), col("v"), col("dv"))
      .join(o.select(col("u"), col("v").as("w"), col("dv").as("dw")), "u")
      .where((col("dv") < col("dw")) ||
        (col("dv") === col("dw") && col("v") < col("w")))
    // closure: the oriented edge (v, w) must exist
    val tris = wedges
      .join(o.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))
    val perNode = tris.select(col("u").as("node"))
      .union(tris.select(col("v").as("node")))
      .union(tris.select(col("w").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") < 2, lit(0L)).otherwise(
          round(lit(2e6) * coalesce(col("triangles"), lit(0L)).cast("double") /
            (col("degree") * (col("degree") - lit(1L))).cast("double"))
            .cast("long")).as("lcc_micro"))
  }

  // ── incremental triangle maintenance (stored-pipe variant) ────────────

  /** Per-batch DELTAS for incrementally-maintained triangle stats: given
    * the stored canonical edge set and a new pair batch, returns
    * (newEdges to append, per-node (node, d_deg, d_tri) stat deltas).
    * A triangle is charged to the batch where its LAST edge arrives —
    * enumerate triangles touching ≥1 new edge via a common-neighbor join
    * against the merged adjacency, dedup the sorted triple (a triangle
    * whose 2–3 edges arrive together would otherwise count once per new
    * edge) — so every triangle lands in EXACTLY one batch and the stat
    * rows are ADDITIVE: blind-append + fold ≡ full rebuild, the same
    * contract as every other stored index.
    *
    * Scale per batch: one anti-join (dedup vs stored), one common-
    * neighbor join whose fanout is Σ_(a,b)∈new (deg a + deg b) — the
    * standard incremental triangle-counting shape (new edges are the
    * sliver; the stored graph is read once, never recomputed). */
  def triangleBatchDelta(stored: DataFrame,
                         batch: DataFrame): (DataFrame, DataFrame) = {
    val b0 = batch
      .select(least(col("id1"), col("id2")).as("a"),
        greatest(col("id1"), col("id2")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val newE = b0.join(stored.select(col("a"), col("b")),
        Seq("a", "b"), "left_anti")
      .localCheckpoint(true)
    val unionE = stored.select(col("a"), col("b")).union(newE)
    val adj = unionE.select(col("a").as("x"), col("b").as("y"))
      .union(unionE.select(col("b").as("x"), col("a").as("y")))
      .localCheckpoint(true)
    val tri = newE
      .join(adj.select(col("x").as("a"), col("y").as("c")), "a")
      .join(adj.select(col("x").as("b"), col("y").as("c")), Seq("b", "c"))
      .where(col("c") =!= col("a") && col("c") =!= col("b"))
      .select(array_sort(array(col("a"), col("b"), col("c"))).as("t"))
      .select(element_at(col("t"), 1).as("n1"),
        element_at(col("t"), 2).as("n2"), element_at(col("t"), 3).as("n3"))
      .distinct()
    val triNodes = tri.select(col("n1").as("node"))
      .union(tri.select(col("n2").as("node")))
      .union(tri.select(col("n3").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d_tri"))
    val degNodes = newE.select(col("a").as("node"))
      .union(newE.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d_deg"))
    val stats = degNodes.join(triNodes, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("d_deg"), lit(0L)).as("d_deg"),
        coalesce(col("d_tri"), lit(0L)).as("d_tri"))
    (newE, stats)
  }

  /** Fold blind-appended [[triangleBatchDelta]] stat rows back into the
    * [[triangleStats]] output shape (node, degree, triangles,
    * lcc_micro). */
  def triangleFoldStats(stored: DataFrame): DataFrame =
    stored.groupBy(col("node"))
      .agg(sum(col("d_deg")).as("degree"), sum(col("d_tri")).as("triangles"))
      .where(col("degree") > 0)
      .select(col("node"), col("degree"), col("triangles"),
        when(col("degree") < 2, lit(0L)).otherwise(
          round(lit(2e6) * col("triangles").cast("double") /
            (col("degree") * (col("degree") - lit(1L))).cast("double"))
            .cast("long")).as("lcc_micro"))
}
