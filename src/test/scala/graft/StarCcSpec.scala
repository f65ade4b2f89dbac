package graft

import org.apache.spark.sql.functions._

import graft.ops.ApproxDedup

/** Connected-components hardening: the [[ApproxDedup.nearDupClusters]]
  * large-diameter guard (a silent cap would return non-minimal
  * representatives — wrong dedup survivors with no signal), and the
  * large-star/small-star variant that contracts adversarial chain graphs
  * in O(log n) rounds where hash-min needs diameter passes. */
class StarCcSpec extends SparkSpec {
  import spark.implicits._

  private def path(n: Int) =
    (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("id1", "id2")

  test("nearDupClusters throws loudly when diameter exceeds maxIters") {
    // path of 12 nodes: diameter 11, labels advance one hop per pass.
    // driverGateEdges = 0 forces the DISTRIBUTED loop (r16: a graph this
    // small otherwise takes the exact driver union-find branch, which has
    // no iteration cap to trip — StarDriverEquivalenceSpec pins that
    // branch's labels instead).
    val e = intercept[IllegalStateException] {
      ApproxDedup.nearDupClusters(path(12), maxIters = 4,
        driverGateEdges = 0L).collect()
    }
    assert(e.getMessage.contains("maxIters"))
  }

  test("nearDupClusters is exact when diameter fits in maxIters") {
    val out = ApproxDedup.nearDupClusters(path(8), maxIters = 10)
      .as[(Long, Long)].collect().toMap
    assert(out == (1L to 8L).map(_ -> 1L).toMap)
  }

  test("star contraction labels a 200-node chain that hash-min's default cap cannot") {
    // diameter 199 >> nearDupClusters' default 20 iterations; the star
    // variant converges in O(log n) rounds with the default cap
    val out = ApproxDedup.nearDupClustersStar(path(200))
      .as[(Long, Long)].collect().toMap
    assert(out == (1L to 200L).map(_ -> 1L).toMap)
  }

  test("star variant matches hash-min on a random multi-component graph") {
    val rng = new scala.util.Random(42L)
    val pairs = Seq.fill(120) {
      // ids spread over 3 disjoint ranges so several components exist
      val base = rng.nextInt(3) * 1000L
      (base + rng.nextInt(40), base + rng.nextInt(40))
    }.toDF("id1", "id2")
    val hashMin = ApproxDedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toSet
    val star = ApproxDedup.nearDupClustersStar(pairs)
      .as[(Long, Long)].collect().toSet
    assert(star == hashMin && star.nonEmpty)
  }

  test("star variant handles duplicates, reversed pairs, and self-loops") {
    val pairs = Seq((2L, 1L), (1L, 2L), (2L, 1L), (3L, 3L), (3L, 2L))
      .toDF("id1", "id2")
    val out = ApproxDedup.nearDupClustersStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star variant on an empty pair list returns an empty frame") {
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(ApproxDedup.nearDupClustersStar(empty).isEmpty)
  }
}
