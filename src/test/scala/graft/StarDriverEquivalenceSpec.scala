package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.forAll

import graft.ops.ApproxDedup

/** r16 optimization pin: the size-gated DRIVER union-find branch of
  * [[ApproxDedup.nearDupClustersStar]] must label every node identically
  * to the distributed star-contraction branch (cluster_id = min reachable
  * id), on arbitrary graphs — chains, cliques, self-loops, isolated
  * self-loop nodes, duplicate and reversed edges. The property generates
  * random edge lists and compares both branches row-for-row (the
  * distributed branch forced via `driverGateEdges = 0`). This is the
  * equivalence condition the r15 verdict attached to approving the
  * bounded-driver contraction.
  */
class StarDriverEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(30).withWorkers(4), prop)
    assert(res.passed, res.status.toString)
  }

  private def labelsOf(pairs: Seq[(Long, Long)], gate: Long): Seq[(Long, Long)] = {
    val df = pairs.toDF("id1", "id2")
    ApproxDedup.nearDupClustersStar(df, "id1", "id2", driverGateEdges = gate)
      .select(col("doc_id"), col("cluster_id"))
      .as[(Long, Long)].collect().sorted.toSeq
  }

  private def hashMinLabelsOf(pairs: Seq[(Long, Long)], gate: Long): Seq[(Long, Long)] = {
    val df = pairs.toDF("id1", "id2")
    ApproxDedup.nearDupClusters(df, "id1", "id2", driverGateEdges = gate)
      .select(col("doc_id"), col("cluster_id"))
      .as[(Long, Long)].collect().sorted.toSeq
  }

  test("driver union-find ≡ distributed star contraction on random graphs") {
    // ids from a small pool force dense collision-heavy components; the
    // pool size varies so sparse forests and near-cliques both occur.
    val edgesGen: Gen[List[(Long, Long)]] = for {
      pool <- Gen.chooseNum(2, 40)
      n    <- Gen.chooseNum(1, 60)
      es   <- Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, pool.toLong)
        b <- Gen.chooseNum(0L, pool.toLong)
      } yield (a, b))
    } yield es
    check(forAll(edgesGen) { es =>
      labelsOf(es, gate = ApproxDedup.DriverUnionFindMaxEdges) ==
        labelsOf(es, gate = 0L)
    })
  }

  test("driver union-find ≡ distributed hash-min propagation on random graphs") {
    val edgesGen: Gen[List[(Long, Long)]] = for {
      pool <- Gen.chooseNum(2, 30)
      n    <- Gen.chooseNum(1, 40)
      es   <- Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, pool.toLong)
        b <- Gen.chooseNum(0L, pool.toLong)
      } yield (a, b))
    } yield es
    check(forAll(edgesGen) { es =>
      hashMinLabelsOf(es, gate = ApproxDedup.DriverUnionFindMaxEdges) ==
        hashMinLabelsOf(es, gate = 0L)
    })
  }

  test("long chain (worst case for hash-min, fine for both branches here)") {
    val chain = (0L until 200L).map(i => (i, i + 1))
    val viaDriver = labelsOf(chain, ApproxDedup.DriverUnionFindMaxEdges)
    val viaStar = labelsOf(chain, 0L)
    assert(viaDriver == viaStar)
    assert(viaDriver.forall(_._2 == 0L)) // one component rooted at the min id
  }

  test("self-loop-only nodes keep singleton clusters in both branches") {
    val es = Seq((5L, 5L), (7L, 8L), (8L, 9L))
    assert(labelsOf(es, ApproxDedup.DriverUnionFindMaxEdges) == labelsOf(es, 0L))
    assert(labelsOf(es, ApproxDedup.DriverUnionFindMaxEdges)
      .contains((5L, 5L)))
  }
}
