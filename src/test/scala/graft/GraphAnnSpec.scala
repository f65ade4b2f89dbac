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
  private val (npb, m, buckets, ef, hops, k) = (2, 6, 8, 8, 3, 10)

  private def cellsOf(emb: DataFrame, cents: Seq[Seq[Double]]): DataFrame =
    GraphAnn.withBuildCells(emb, "vec_id", "embedding", cents, npb)

  test("incremental edge batches fold to the full rebuild (top-m mergeability)") {
    val emb = Tables.embeddings(spark, sf)
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
    val full = GraphAnn.foldAdjacency(
      GraphAnn.edgeBatch(cellsOf(emb, cents), None, m, buckets), m)
      .select("src", "dst").orderBy("src", "dst").collect().toSeq
    // three different split keys — the fold must not depend on arrival order
    Seq(2L, 3L, 5L).foreach { p =>
      val b1 = cellsOf(emb.where(col("vec_id") % p === 0), cents)
      val b2 = cellsOf(emb.where(col("vec_id") % p =!= 0), cents)
      val appended = GraphAnn.edgeBatch(b1, None, m, buckets)
        .unionByName(GraphAnn.edgeBatch(b2, Some(b1), m, buckets))
      val folded = GraphAnn.foldAdjacency(appended, m)
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
    store.create(GraphAnn.edgeBatch(cellsOf(emb, cents), None, m, buckets))
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
      GraphAnn.expandFrom(GraphAnn.foldAdjacency(rows, m), q)(frontier)
    }
    val top = GraphAnn.beamSearch(expand, Seq(0L, 1L, 2L, 3L), ef, hops, k)
    assert(top.nonEmpty && top.size <= k)
    // the query vector itself is reachable through its self-edge
    assert(top.head._1 == 0L && math.abs(top.head._2 - 1.0) < 1e-9)
    // pruning is not vacuous: the index holds more buckets than any probe read
    assert(readBuckets.size < buckets)
  }

  test("beam result ids exist and scores are exact cosines") {
    val emb = Tables.embeddings(spark, sf)
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
    val adj = GraphAnn.foldAdjacency(
      GraphAnn.edgeBatch(cellsOf(emb, cents), None, m, buckets), m)
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
