package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
import graft.functions.VectorFns
import graft.ops.{ApproxDedup, SimilaritySearch}
import graft.sync.SyncEngine

/** Executional proof of the "stored-index probe reads ≤ q partition dirs"
  * claims (SURVEY §2.12 / r6 verdict item 6): for each stored-index family
  * the probe's ACTUAL input files — `input_file_name()` over the executed
  * probe, not plan text — must all live under the requested
  * `__graft_chunk=<bucket>` directories, while the index holds strictly
  * more chunk dirs than the probe touches. A regression that silently turns
  * the partition filter into a post-scan filter would read every dir and
  * fail the subset assert. */
class StoredIndexPruningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Distinct chunk labels actually read by `df`, from executional file
    * paths; fails if any file lies outside a chunk directory. */
  private def chunksRead(df: DataFrame): Set[String] =
    df.select(input_file_name().as("f")).distinct().collect()
      .map(_.getString(0))
      .map { f =>
        val m = "__graft_chunk=([^/]+)/".r.findFirstMatchIn(f)
        assert(m.isDefined, s"probe read a file outside any chunk dir: $f")
        m.get.group(1)
      }.toSet

  /** All chunk labels present anywhere under the pipe root (layout:
    * `<root>/<target>/data/__graft_chunk=<label>/…`). */
  private def chunksStored(root: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("__graft_chunk="))
      .map(_.getFileName.toString.stripPrefix("__graft_chunk=")).toSet
  }

  test("stored minhash band probe reads only the query doc's bucket dirs") {
    val docs = Tables.documents(spark, sf)
    def index(df: DataFrame) = ApproxDedup.minhashBandIndex(
      df, "doc_id", "text", shingleSize = 3, k = 24, bands = 6, buckets = 4)
    val root = java.nio.file.Files.createTempDirectory("graft_prune_mh").toString
    val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("ann", "mh_prune"),
      columns = ColumnRoles(Map("datetime" -> "bucket", "id" -> "doc_id")),
      epochUnit = Some("minute"), chunkMinutes = 1)
    val store = eng.storage(spec)
    store.create(index(docs))
    val qBuckets = index(docs.where(col("doc_id") === 45L))
      .select(col("bucket")).distinct().collect().map(_.getLong(0)).toSeq
    assert(qBuckets.nonEmpty)
    val stored = chunksStored(root)
    val read = chunksRead(store.readIn(qBuckets))
    assert(read == qBuckets.map(_.toString).toSet,
      s"probe read $read, requested ${qBuckets.toSet}")
    assert(read.size < stored.size,
      s"pruning is vacuous: index holds only ${stored.size} chunk dirs")
  }

  test("stored IVF probe reads only the nProbe cell dirs") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
    def index(df: DataFrame) =
      SimilaritySearch.withIvfCell(df, "embedding", cents)
        .select(col("vec_id"), col("embedding"), col("cell").cast("long").as("cell"))
    val root = java.nio.file.Files.createTempDirectory("graft_prune_ivf").toString
    val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("ann", "ivf_prune"),
      columns = ColumnRoles(Map("datetime" -> "cell", "id" -> "vec_id")),
      epochUnit = Some("minute"), chunkMinutes = 1)
    val store = eng.storage(spec)
    store.create(index(emb))
    val probe = SimilaritySearch.ivfProbeCells(cents, q, nProbe = 4).map(_.toLong)
    val stored = chunksStored(root)
    val probed = store.readIn(probe)
      .select(col("vec_id"), VectorFns.cosineToQuery(col("embedding"), q).as("cosine"))
    val read = chunksRead(probed)
    assert(read.subsetOf(probe.map(_.toString).toSet),
      s"probe read $read outside requested cells ${probe.toSet}")
    assert(read.size < stored.size,
      s"pruning is vacuous: index holds only ${stored.size} chunk dirs")
  }

  test("stored OPQ probe reads shipped artifacts + nProbe cell dirs, zero corpus files") {
    import org.apache.spark.sql.types._
    val emb = Tables.embeddings(spark, sf)
    val (m, ks, nCents) = (4, 16, 8)
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val rot = SimilaritySearch.opqRotation(emb, "vec_id", "embedding",
      m = m, ks = ks, nSample = 64, iters = 2)
    val rcents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", nCents)
      .map(v => SimilaritySearch.rotateQuery(v, rot))
    val rcbs = SimilaritySearch.opqCodebooks(emb, "vec_id", "embedding", rot, m, ks)
    val root = java.nio.file.Files.createTempDirectory("graft_prune_opq").toString
    val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("ann", "opq_prune"),
      columns = ColumnRoles(Map("datetime" -> "cell", "id" -> "vec_id")),
      epochUnit = Some("minute"), chunkMinutes = 1)
    val mspec = PipeSpec(PipeKeys("ann", "opq_prune_model"),
      columns = ColumnRoles(Map("datetime" -> "row_id", "id" -> "row_id")),
      epochUnit = Some("minute"), chunkMinutes = 8192)
    val store = eng.storage(spec)
    store.create(SimilaritySearch.withPqCodes(
        SimilaritySearch.withIvfCell(
          SimilaritySearch.withRotation(emb, "embedding", rot, "rvec"),
          "rvec", rcents), "rvec", rcbs)
      .select(col("vec_id"), col("rvec"), col("pq"),
        col("cell").cast("long").as("cell")))
    val modelRows =
      rot.zipWithIndex.map { case (v, i) => (0L, i.toLong, v) } ++
      rcents.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) } ++
      rcbs.zipWithIndex.flatMap { case (cb, j) =>
        cb.zipWithIndex.map { case (v, c) => (2L, (j * ks + c).toLong, v) } }
    eng.storage(mspec).create(spark.createDataFrame(
      spark.sparkContext.parallelize(modelRows.map { case (k, i, v) =>
        org.apache.spark.sql.Row(k * 2048L + i, k, i, v) }.toList, 1),
      StructType(Seq(StructField("row_id", LongType),
        StructField("kind", LongType), StructField("i", LongType),
        StructField("coeffs", ArrayType(DoubleType))))))
    // the shipped artifacts must round-trip BIT-EQUAL (parquet doubles are
    // exact) — the probe's rotation/cells/ADC all hang off this
    val got = eng.getData(mspec)
      .select(col("kind"), col("i"), col("coeffs")).collect()
    def part(kind: Long): Seq[Seq[Double]] =
      got.filter(_.getLong(0) == kind).sortBy(_.getLong(1))
        .map(_.getSeq[Double](2)).toSeq
    assert(part(0L) == rot, "rotation did not round-trip bit-equal")
    assert(part(1L) == rcents, "centroids did not round-trip bit-equal")
    val cbRows = part(2L)
    val storedCbs = Seq.tabulate(m)(j => cbRows.slice(j * ks, (j + 1) * ks))
    assert(storedCbs == rcbs, "codebooks did not round-trip bit-equal")
    // probe built ONLY from stored artifacts; its scans touch only the
    // nProbe cell dirs — any corpus-file read fails chunksRead's assert
    val rq = SimilaritySearch.rotateQuery(q, part(0L))
    val probe = SimilaritySearch.ivfProbeCells(part(1L), rq, nProbe = 2).map(_.toLong)
    val stored = chunksStored(root + "/ann_opq_prune")
    val probed = store.readIn(probe)
    val read = chunksRead(probed)
    assert(read.subsetOf(probe.map(_.toString).toSet),
      s"probe read $read outside requested cells ${probe.toSet}")
    assert(read.size < stored.size,
      s"pruning is vacuous: index holds only ${stored.size} chunk dirs")
    // end-to-end: the ADC candidate pass + rerank over the pruned frame
    val top = SimilaritySearch.pqTopK(probed, "vec_id", "rvec", "pq",
      rq, storedCbs, k = 5, rerank = 20)
    assert(top.count() == 5)
  }

  test("stored BM25 probe reads only the query terms' bucket dirs") {
    val docs = Tables.documents(spark, sf)
    val buckets = 16
    val root = java.nio.file.Files.createTempDirectory("graft_prune_bm25").toString
    val eng = new SyncEngine(spark, root)
    val pSpec = PipeSpec(PipeKeys("idx", "bm25_prune"),
      columns = ColumnRoles(Map("datetime" -> "bucket", "id" -> "doc_id")),
      epochUnit = Some("minute"), chunkMinutes = 1)
    val store = eng.storage(pSpec)
    store.create(graft.ops.Corpus.bm25Postings(docs, "doc_id", "text", buckets))
    val qBuckets = Seq("table", "scan", "window")
      .map(t => graft.ops.Sampling.hashBucketValue(t, buckets)).distinct
    val stored = chunksStored(root)
    val read = chunksRead(store.readIn(qBuckets.map(_.toLong)))
    assert(read.subsetOf(qBuckets.map(_.toString).toSet),
      s"probe read $read outside requested buckets ${qBuckets.toSet}")
    assert(read.size < stored.size,
      s"pruning is vacuous: index holds only ${stored.size} chunk dirs")
  }
}
