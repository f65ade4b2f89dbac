package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilaritySearch

/** OPQ rotation (Ge et al., CVPR 2013): trained-matrix invariants, the
  * ship-gate win over plain PQ, and stored-artifact parity. */
class OpqSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sf)

  private lazy val rot = SimilaritySearch.opqRotation(
    emb, "vec_id", "embedding", m = 8, ks = 128, nSample = 256, iters = 10)

  test("trained rotation is orthonormal (R·Rᵀ = I to 1e-9)") {
    val dim = rot.length
    assert(rot.forall(_.length == dim))
    var worst = 0.0
    for (i <- 0 until dim; j <- 0 until dim) {
      val v = rot(i).zip(rot(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      worst = math.max(worst, math.abs(v - want))
    }
    assert(worst < 1e-9, s"max |R·Rᵀ − I| = $worst")
  }

  test("rotation preserves norms (orthonormality applied in-plan)") {
    val rows = SimilaritySearch.withRotation(emb, "embedding", rot, "rv")
      .select(
        graft.functions.VectorFns.norm(col("embedding")).as("n0"),
        graft.functions.VectorFns.norm(col("rv")).as("n1"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }
  }

  test("OPQ mean reconstruction error is strictly below plain PQ at equal (m, ks)") {
    val row = SimilaritySearch.pqVsOpqRecon(
      emb, "vec_id", "embedding", m = 8, ks = 128, rot).head()
    val n = row.getLong(0)
    val pqErr = row.getLong(1); val opqErr = row.getLong(2)
    assert(n > 0)
    assert(opqErr < pqErr, s"opq $opqErr must beat pq $pqErr")
  }

  test("stored OPQ index: incremental halves + shipped-R probe == trained-R single-build probe") {
    import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
    import org.apache.spark.sql.types._
    val m = 8; val ks = 128
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val rcents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
      .map(v => SimilaritySearch.rotateQuery(v, rot))
    val rcbs = SimilaritySearch.opqCodebooks(emb, "vec_id", "embedding", rot, m, ks)
    def index(df: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.withPqCodes(
          SimilaritySearch.withIvfCell(
            SimilaritySearch.withRotation(df, "embedding", rot, "rvec"),
            "rvec", rcents), "rvec", rcbs)
        .select(col("vec_id"), col("rvec"), col("pq"),
          col("cell").cast("long").as("cell"))
    val eng = new graft.sync.SyncEngine(spark, tmpDir())
    val spec = PipeSpec(PipeKeys("ann", "opq_parity"),
      columns = ColumnRoles(Map("datetime" -> "cell", "id" -> "vec_id")),
      epochUnit = Some("minute"), chunkMinutes = 1)
    val rspec = PipeSpec(PipeKeys("ann", "opq_parity_rot"),
      columns = ColumnRoles(Map("datetime" -> "i", "id" -> "i")),
      epochUnit = Some("minute"), chunkMinutes = 64)
    val rotDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rot.zipWithIndex.map { case (row, i) =>
        org.apache.spark.sql.Row(i.toLong, row) }.toList, 1),
      StructType(Seq(StructField("i", LongType),
        StructField("coeffs", ArrayType(DoubleType)))))
    eng.sync(rspec, rotDf, checkExisting = false)
    eng.sync(spec, index(emb.where(col("vec_id") % 2 === 0)), checkExisting = false)
    eng.sync(spec, index(emb.where(col("vec_id") % 2 === 1)), checkExisting = false)
    // the SHIPPED artifact round-trips bit-exactly
    val rStored = eng.getData(rspec).orderBy(col("i"))
      .select(col("coeffs")).collect().map(_.getSeq[Double](0)).toSeq
    assert(rStored == rot, "stored rotation must round-trip bit-exactly")
    val rq = SimilaritySearch.rotateQuery(q, rStored)
    val probe = SimilaritySearch.ivfProbeCells(rcents, rq, nProbe = 8)
    val viaStore = SimilaritySearch.pqTopK(
        eng.storage(spec).readIn(probe.map(_.toLong)),
        "vec_id", "rvec", "pq", rq, rcbs, k = 10, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // single full build, trained R, no store
    val direct = SimilaritySearch.ivfPqTopK(index(emb), "vec_id", "rvec",
        "cell", "pq", rq, rcents, rcbs, k = 10, nProbe = 8, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaStore == direct)
  }
}
