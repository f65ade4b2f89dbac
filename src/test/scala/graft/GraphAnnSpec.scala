package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
import graft.ops.{GraphAnn, SimilaritySearch}
import graft.sync.SyncEngine

/** Graph-ANN (ops/GraphAnn): the incremental-index law, the probe's
  * partition pruning, and beam-search sanity. */
class GraphAnnSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val (npb, m, buckets, cap, ef, hops, k) = (2, 6, 8, 2, 8, 3, 10)

  private def cellsOf(emb: DataFrame, cents: Seq[Seq[Double]]): DataFrame =
    GraphAnn.withBuildCells(emb, "vec_id", "embedding", cents, npb)

  test("incremental edge batches fold to the full rebuild (top-m mergeability)") {
    val emb = Tables.embeddings(spark, sf)
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
    val full = GraphAnn.foldAdjacency(
      GraphAnn.edgeBatch(cellsOf(emb, cents), None, m, buckets, cap), m, cap)
      .select("src", "dst").orderBy("src", "dst").collect().toSeq
    // three different split keys — the fold must not depend on arrival order
    Seq(2L, 3L, 5L).foreach { p =>
      val b1 = cellsOf(emb.where(col("vec_id") % p === 0), cents)
      val b2 = cellsOf(emb.where(col("vec_id") % p =!= 0), cents)
      val appended = GraphAnn.edgeBatch(b1, None, m, buckets, cap)
        .unionByName(GraphAnn.edgeBatch(b2, Some(b1), m, buckets, cap))
      val folded = GraphAnn.foldAdjacency(appended, m, cap)
        .select("src", "dst").orderBy("src", "dst").collect().toSeq
      assert(folded == full, s"fold != rebuild for split mod $p")
    }
  }

  test("stored beam probe reads only the frontier's bucket dirs, zero corpus files") {
    val emb = Tables.embeddings(spark, sf)
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
    val root = java.nio.file.Files.createTempDirectory("graft_hnsw_prune").toString
    val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("ann", "hnsw_prune"),
      columns = ColumnRoles(Map("datetime" -> "bucket")),
      epochUnit = Some("minute"), chunkMinutes = 1)
    val store = eng.storage(spec)
    store.create(GraphAnn.edgeBatch(cellsOf(emb, cents), None, m, buckets, cap))
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val readBuckets = scala.collection.mutable.Set.empty[String]
    def expand(frontier: Seq[Long]): Seq[(Long, Double)] = {
      val want = frontier.map(_ % buckets).distinct
      val rows = store.readIn(want).where(col("src").isin(frontier: _*))
      // executional file audit: every file read must live under a
      // requested bucket's chunk dir
      rows.select(input_file_name().as("f")).distinct().collect()
        .map(_.getString(0)).foreach { f =>
          val mm = "__graft_chunk=([^/]+)/".r.findFirstMatchIn(f)
          assert(mm.isDefined, s"probe read a non-index file: $f")
          val b = mm.get.group(1)
          assert(want.map(_.toString).contains(b),
            s"probe read bucket $b outside frontier buckets $want")
          readBuckets += b
        }
      GraphAnn.expandFrom(GraphAnn.foldAdjacency(rows, m, cap), q)(frontier)
    }
    val top = GraphAnn.beamSearch(expand, Seq(0L, 1L, 2L, 3L), ef, hops, k)
    assert(top.nonEmpty && top.size <= k)
    // the query vector itself is reachable through its self-edge
    assert(top.head._1 == 0L && math.abs(top.head._2 - 1.0) < 1e-9)
    // pruning is not vacuous: the index holds more buckets than any probe read
    assert(readBuckets.size < buckets)
  }

  test("entry batches fold to the full rebuild (per-cell argmax mergeability)") {
    val emb = Tables.embeddings(spark, sf)
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
    val full = GraphAnn.entryBatch(cellsOf(emb, cents), cents)
      .select("cell", "id").orderBy("cell").collect().toSeq
    Seq(2L, 3L, 5L).foreach { p =>
      val appended = GraphAnn.entryBatch(
          cellsOf(emb.where(col("vec_id") % p === 0), cents), cents)
        .unionByName(GraphAnn.entryBatch(
          cellsOf(emb.where(col("vec_id") % p =!= 0), cents), cents))
      val folded = GraphAnn.foldEntries(appended)
        .select("cell", "id").orderBy("cell").collect().toSeq
      assert(folded == full, s"entry fold != rebuild for split mod $p")
    }
  }

  test("probe is id-space invariant: a non-zero-based corpus gets the same results") {
    // r13 seeded the beam with ids 0..nEntries-1 by convention — a corpus
    // whose ids start at 1e6 (sharded / UUID-mapped) got degenerate seeds.
    // Entries now come from the per-cell build rule, so shifting every id
    // by a constant must shift the probe output by exactly that constant.
    val emb = Tables.embeddings(spark, sf)
    val shift = 1000000L
    val shifted = emb.select((col("vec_id") + shift).as("vec_id"),
      col("embedding"))
    // centroids are an id-agnostic Seq[Seq[Double]] artifact — share one
    // set so both probes cluster identically (sampleCentroids' id<n rule
    // is a sampling convention, not part of the probe under test)
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
    def probe(e: DataFrame, qid: Long): Seq[(Long, Double)] = {
      val cells = cellsOf(e, cents)
      val adj = GraphAnn.foldAdjacency(
        GraphAnn.edgeBatch(cells, None, m, buckets, cap), m, cap).localCheckpoint(true)
      val entries = GraphAnn.entryIds(GraphAnn.entryBatch(cells, cents))
      val q = e.where(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      GraphAnn.beamSearch(GraphAnn.expandFrom(adj, q), entries, ef, hops, k)
    }
    val base = probe(emb, 7L)
    val moved = probe(shifted, 7L + shift)
    assert(moved == base.map { case (id, c) => (id + shift, c) },
      "shifting the id space changed the probe output")
  }

  test("diversity prune: per-cell cap holds and full-degree nodes span distinct cells") {
    val emb = Tables.embeddings(spark, sf)
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
    val adj = GraphAnn.foldAdjacency(
      GraphAnn.edgeBatch(cellsOf(emb, cents), None, m, buckets, cap), m, cap)
      .where(col("src") =!= col("dst")).cache()
    // ≤ cap edges per (src, dst-primary-cell) — the long-range guarantee
    assert(adj.groupBy("src", "dcell").count()
      .where(col("count") > cap).count() == 0, "cell cap violated")
    // a node holding its full m edges necessarily spans ≥ m/cap cells
    assert(adj.groupBy("src")
      .agg(countDistinct(col("dcell")).as("cells"), count(lit(1)).as("deg"))
      .where(col("deg") === m && col("cells") < m / cap).count() == 0,
      "full-degree node with too few distinct cells")
    adj.unpersist()
  }

  test("node-pipe increment: touched-cell read prunes files AND equals the unpruned build") {
    // r14's one `weak`: the increment's old side scanned every stored
    // self-edge. Node rows now persist chunked by cohort cell; this pins
    // (a) executionally, that readIn(touched) reads ONLY touched cell
    // dirs, and (b) algebraically, that the cell-pruned old side yields
    // the SAME increment as the full one, and the fold of (batch1 +
    // pruned increment) is the full rebuild.
    val emb = Tables.embeddings(spark, sf)
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
    val inc = col("vec_id").isin(7L, 11L) // a small increment
    val cells1 = cellsOf(emb.where(!inc), cents).localCheckpoint(true)
    val cells2 = cellsOf(emb.where(inc), cents).localCheckpoint(true)
    val root = java.nio.file.Files.createTempDirectory("graft_hnsw_nodes").toString
    val eng = new SyncEngine(spark, root)
    val nodeSpec = PipeSpec(PipeKeys("ann", "hnsw_nodes_prune"),
      columns = ColumnRoles(Map("datetime" -> "cell")),
      epochUnit = Some("minute"), chunkMinutes = 1)
    val store = eng.storage(nodeSpec)
    store.create(GraphAnn.nodeBatch(cells1))
    val touched = cells2.select("cell").distinct().collect()
      .map(_.getLong(0)).toSeq
    val allCells = cells1.select("cell").distinct().count()
    assert(touched.size < allCells,
      s"fixture regression: increment touches all $allCells cells — prune vacuous")
    val oldRows = store.readIn(touched)
    // executional file audit: every file read lives under a touched cell's dir
    oldRows.select(input_file_name().as("f")).distinct().collect()
      .map(_.getString(0)).foreach { f =>
        val mm = "__graft_chunk=([^/]+)/".r.findFirstMatchIn(f)
        assert(mm.isDefined, s"increment read a non-node file: $f")
        assert(touched.map(_.toString).contains(mm.get.group(1)),
          s"increment read cell dir ${mm.get.group(1)} outside touched $touched")
      }
    def edgeSet(df: DataFrame) = df.where(col("src") =!= col("dst"))
      .select("src", "dst").orderBy("src", "dst").collect().toSeq
    val incPruned = GraphAnn.edgeBatch(cells2,
      Some(GraphAnn.nodeCells(oldRows)), m, buckets, cap)
    val incFull = GraphAnn.edgeBatch(cells2, Some(cells1), m, buckets, cap)
    assert(edgeSet(incPruned) == edgeSet(incFull),
      "cell-pruned old side changed the increment's edge set")
    val full = GraphAnn.foldAdjacency(
      GraphAnn.edgeBatch(cellsOf(emb, cents), None, m, buckets, cap), m, cap)
    val folded = GraphAnn.foldAdjacency(
      GraphAnn.edgeBatch(cells1, None, m, buckets, cap).unionByName(incPruned),
      m, cap)
    assert(edgeSet(folded) == edgeSet(full),
      "fold of batch1 + pruned increment != full rebuild")
  }

  test("beam result ids exist and scores are exact cosines") {
    val emb = Tables.embeddings(spark, sf)
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
    val adj = GraphAnn.foldAdjacency(
      GraphAnn.edgeBatch(cellsOf(emb, cents), None, m, buckets, cap), m, cap)
      .localCheckpoint(true)
    val q = emb.where(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val top = GraphAnn.beamSearch(GraphAnn.expandFrom(adj, q),
      Seq(0L, 1L, 2L, 3L), ef, hops, k)
    val exact = emb.select(col("vec_id"),
        graft.functions.VectorFns.cosineToQuery(
          col("embedding").cast("array<double>"), q).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    top.foreach { case (id, c) =>
      assert(exact.contains(id), s"beam returned unknown id $id")
      assert(c == exact(id), s"beam cosine for $id drifted from the exact value")
    }
  }
}
