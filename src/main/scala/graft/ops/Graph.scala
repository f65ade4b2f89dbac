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
}
