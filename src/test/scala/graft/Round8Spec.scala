package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.ops.{Dsir, Sampling}

/** Round-8 operators: DSIR importance resampling, the char-entropy native
  * expression, token-budget mixture sampling, and stream-static
  * enrichment. */
class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def entropyMicroOf(s: String): Long =
    Seq(s).toDF("t")
      .select(TextFns.charEntropyMicro($"t").as("e"))
      .as[Long].head()

  test("single repeated character has zero entropy") {
    assert(entropyMicroOf("aaaaaaa") == 0L)
    assert(entropyMicroOf("") == 0L)
  }

  test("two equiprobable characters: entropy = ln 2 (per-term rounding)") {
    // each term rounds independently: round(0.5·ln2·1e6) = 346574, ×2
    assert(entropyMicroOf("ab") == 2L * Math.round(0.5 * math.log(2.0) * 1e6))
    assert(entropyMicroOf("aabb") == entropyMicroOf("ab"))
  }

  test("uniform alphabet of n chars approaches ln n; order-independent") {
    val e1 = entropyMicroOf("abcd")
    assert(math.abs(e1 - math.log(4.0) * 1e6) <= 4) // ≤1 per rounded term
    assert(entropyMicroOf("dcba") == e1)
    assert(entropyMicroOf("badc") == e1)
  }

  test("kernel matches the relational explode form on real-ish text") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaa bbb aaa bbb aaa"),
      (3L, "Mixed CASE with punct!!! and  spaces")).toDF("id", "text")
    val kernel = docs.select($"id", TextFns.charEntropyMicro($"text").as("e"))
    val relational = docs
      .select($"id", explode(split($"text", "")).as("c"))
      .groupBy($"id", $"c").agg(count(lit(1)).as("n"))
      .withColumn("t", sum($"n").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"id")))
      .groupBy($"id")
      .agg(sum(round(($"n".cast("double") / $"t".cast("double")) *
        log($"t".cast("double") / $"n".cast("double")) * lit(1e6))
        .cast("long")).as("e"))
    val k = kernel.orderBy($"id").as[(Long, Long)].collect()
    val r = relational.orderBy($"id").as[(Long, Long)].collect()
    assert(k.sameElements(r))
  }

  test("graft_char_entropy is callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    val v = spark.sql("SELECT graft_char_entropy('ab') AS e").as[Double].head()
    assert(v == (2L * Math.round(0.5 * math.log(2.0) * 1e6)) / 1e6)
  }

  test("null text yields null entropy") {
    val out = Seq((1L, Option.empty[String]), (2L, Some("ab"))).toDF("id", "t")
      .select(TextFns.charEntropyMicro($"t").as("e"))
      .orderBy($"e".asc_nulls_first)
      .collect()
    assert(out(0).isNullAt(0) && !out(1).isNullAt(0))
  }
}

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two "domains" with disjoint vocabulary + one mixed doc
  private def corpus = Seq(
    (0L, "alpha beta gamma alpha beta", "tgt"),
    (1L, "beta gamma alpha gamma", "tgt"),
    (2L, "delta epsilon zeta delta", "raw"),
    (3L, "epsilon zeta delta zeta epsilon", "raw"),
    (4L, "alpha beta delta epsilon", "mix")).toDF("id", "text", "dom")

  test("target-like documents weigh above off-domain documents") {
    val w = Dsir.importanceWeightsMicro(
        corpus, corpus.where($"dom" === "tgt"), "id", "text", nBuckets = 64)
      .orderBy($"id").as[(Long, Long)].collect().map(_._2)
    assert(w(0) > w(2) && w(1) > w(3), s"target docs must outweigh raw: ${w.toSeq}")
    assert(w(4) > w(2) && w(4) < w(0),
      s"mixed doc must sit between: ${w.toSeq}")
  }

  test("ratio table has exactly nBuckets rows and rides a broadcast join") {
    val ratios = Dsir.bucketLogRatiosMicro(
      Dsir.gramBuckets(corpus.where($"dom" === "tgt"), "id", "text", 64),
      Dsir.gramBuckets(corpus, "id", "text", 64), 64)
    assert(ratios.count() == 64L)
    // audit the LAZY pipeline — the public entry checkpoints the result
    val (w, db) = Dsir.weightsLazy(
      corpus, corpus.where($"dom" === "tgt"), "id", "text", 64)
    try {
      val plan = w.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"ratio join must broadcast:\n$plan")
      // the scoring join and the raw-side fit must BOTH read the persisted
      // bucket table, not re-run the corpus gram explode per branch
      val opt = w.queryExecution.optimizedPlan
      val cached = opt.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m }
      assert(cached.size >= 2, s"shared bucket table not reused:\n$opt")
    } finally { db.unpersist(); () }
  }

  test("resample is deterministic, k-bounded, and weight-biased") {
    val w = Dsir.importanceWeightsMicro(
      corpus, corpus.where($"dom" === "tgt"), "id", "text", nBuckets = 64)
    val a = Dsir.resampleTopK(w, "id", 3).select($"id").as[Long].collect().toSet
    val b = Dsir.resampleTopK(w, "id", 3).select($"id").as[Long].collect().toSet
    assert(a == b && a.size == 3)
    // with strongly separated weights the two pure-target docs must survive
    assert(a.contains(0L) && a.contains(1L), s"selected: $a")
  }

  test("documents with no grams weigh zero, not null") {
    val withEmpty = corpus.union(Seq((9L, "", "raw")).toDF("id", "text", "dom"))
    val w = Dsir.importanceWeightsMicro(
        withEmpty, withEmpty.where($"dom" === "tgt"), "id", "text", 64)
      .where($"id" === 9L).as[(Long, Long)].collect()
    assert(w.sameElements(Array((9L, 0L))))
  }
}

class UnigramLogProbSpec extends SparkSpec {
  import spark.implicits._

  test("per-doc log-prob matches the hand-computed add-one model") {
    val docs = Seq((1L, "a a a a"), (2L, "b c d e")).toDF("id", "text")
    val out = graft.ops.Corpus.unigramLogProb(docs, "id", "text")
      .orderBy($"id").as[(Long, Long, Long, Double)].collect()
    // corpus: a×4, b,c,d,e×1 → T=8, V=5, denominator 13
    def lw(c: Long): Long = Math.round(math.log((c + 1.0) / 13.0) * 1e6)
    assert(out(0) == ((1L, 4L, 4 * lw(4), -(4 * lw(4)).toDouble / (4 * 1e6))))
    assert(out(1) == ((2L, 4L, 4 * lw(1), -(4 * lw(1)).toDouble / (4 * 1e6))))
    // rare-token doc is more surprising: higher cross-entropy
    assert(out(1)._4 > out(0)._4)
  }

  test("repetitive boilerplate scores lower xent than hapax soup") {
    val docs = Seq(
      (1L, "the same line the same line the same line"),
      (2L, "qwert yuiop asdfg hjklz xcvbn mnbvc")).toDF("id", "text")
    val xe = graft.ops.Corpus.unigramLogProb(docs, "id", "text")
      .orderBy($"id").select($"xent").as[Double].collect()
    assert(xe(0) < xe(1))
  }
}

class MixtureSampleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L), (4L, "a", 10L),
    (5L, "b", 7L), (6L, "b", 7L), (7L, "c", 100L)).toDF("id", "dom", "toks")

  test("per-domain running totals never exceed the budget") {
    val out = Sampling.mixtureSample(docs, "id", "dom", $"toks",
        Map("a" -> 25L, "b" -> 14L))
      .as[(Long, String, Long, Long)].collect()
    val byDom = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(byDom("a") == 20L, s"a: 2 docs of 10 fit in 25: $byDom") // 3rd would hit 30
    assert(byDom("b") == 14L, s"b: both fit exactly: $byDom")
    assert(!out.exists(_._2 == "c"), "domains without a budget drop")
    // cum_tokens is the running total in md5 order
    assert(out.forall(r => r._4 <= Map("a" -> 25L, "b" -> 14L)(r._2)))
  }

  test("selection is deterministic and md5-ranked (not id-ranked)") {
    val sel1 = Sampling.mixtureSample(docs, "id", "dom", $"toks",
      Map("a" -> 25L, "b" -> 14L)).select($"id").as[Long].collect().toSet
    val sel2 = Sampling.mixtureSample(docs, "id", "dom", $"toks",
      Map("a" -> 25L, "b" -> 14L)).select($"id").as[Long].collect().toSet
    assert(sel1 == sel2 && sel1.size == 4)
    // the 2 surviving a-docs are the md5-first ones, whatever their ids
    val aKept = sel1.intersect(Set(1L, 2L, 3L, 4L))
    assert(aKept.size == 2)
  }

  test("budget table join is broadcast; one window shuffle per domain") {
    val plan = Sampling.mixtureSample(docs, "id", "dom", $"toks",
      Map("a" -> 25L)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"budget join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no sort-merge join expected:\n$plan")
  }
}

class EnrichStaticSpec extends SparkSpec {
  import spark.implicits._

  test("static side broadcasts (batch plan shape of the micro-batch join)") {
    val facts = Seq((1L, 10L), (2L, 11L), (3L, 10L)).toDF("k", "dim_id")
    val dim = Seq((10L, "x"), (11L, "y")).toDF("dim_id", "name")
    val joined = graft.streaming.StreamingSync.enrichWithStatic(
      facts, dim, facts("dim_id") === dim("dim_id"))
    assert(joined.count() == 3)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim must broadcast:\n$plan")
  }
}
