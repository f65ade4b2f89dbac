package graft

import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Sampling, SimilaritySearch}

/** Round-10 training-data operators: BPE pair counting, weighted sampling
  * without replacement, per-source KL divergence, hard-negative mining. */
class BpePairCountsSpec extends SparkSpec {
  import spark.implicits._

  test("pair frequencies weight by word frequency; single chars drop") {
    // vocab: "aa" freq 2, "ab" freq 1, "x" freq 3 (no pairs)
    val docs = Seq("aa ab x", "aa x", "x").toDF("text")
    val got = Corpus.bpePairCounts(docs, "text", k = 10)
      .as[(String, Long)].collect().toMap
    assert(got == Map("aa" -> 2L, "ab" -> 1L))
  }

  test("case folds before counting and top-k orders by freq then pair") {
    val docs = Seq("AB ab", "cd").toDF("text")
    val got = Corpus.bpePairCounts(docs, "text", k = 1)
      .as[(String, Long)].collect()
    assert(got.sameElements(Array(("ab", 2L))))
  }

  test("longer words emit every adjacent pair") {
    val docs = Seq("abcd").toDF("text")
    val got = Corpus.bpePairCounts(docs, "text", k = 10)
      .as[(String, Long)].collect().toMap
    assert(got == Map("ab" -> 1L, "bc" -> 1L, "cd" -> 1L))
  }
}

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("id", "w")

  test("returns k rows, deterministic across runs") {
    val a = Sampling.weightedSample(docs, "id", $"w", k = 10)
      .as[(Long, Double, Long)].collect()
    val b = Sampling.weightedSample(docs, "id", $"w", k = 10)
      .as[(Long, Double, Long)].collect()
    assert(a.length == 10 && a.sameElements(b))
  }

  test("fractional weights in (0,1) sample with finite scores, ∝ weight") {
    // The old long-truncation path sent 0 < w < 1 to ln(0) = -Inf
    // (Long.MinValue) while the oracle rounded 0.5 → 1: silent divergence.
    val frac = Seq((1L, 0.5), (2L, 0.25), (3L, 2.0), (4L, 0.75))
      .toDF("id", "w")
    val got = Sampling.weightedSample(frac, "id", $"w", k = 4)
      .as[(Long, Double, Long)].collect()
    assert(got.length == 4)
    assert(got.forall { case (_, w, s) => w > 0 && s > Long.MinValue / 2 })
    // score replays ln(w) in micro-nats exactly
    val byId = got.map(r => r._1 -> r._3).toMap
    val expected = frac.select($"id", (
        round(log($"w") * lit(1e6)).cast("long") +
          graft.ops.Dsir.gumbelMicro($"id")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(byId == expected)
  }

  test("non-positive weights are excluded") {
    val mixed = Seq((1L, 5L), (2L, 0L), (3L, -4L), (4L, 1L)).toDF("id", "w")
    val got = Sampling.weightedSample(mixed, "id", $"w", k = 10)
      .select($"id").as[Long].collect().toSet
    assert(got == Set(1L, 4L))
  }

  test("ranking matches a brute-force replay of the integer key") {
    val got = Sampling.weightedSample(docs, "id", $"w", k = 100)
      .select($"id", $"score_micro").as[(Long, Long)].collect()
    val want = docs.select($"id", (
        round(log($"w".cast("double")) * lit(1e6)).cast("long") +
          graft.ops.Dsir.gumbelMicro($"id")).as("s"))
      .orderBy($"s".desc, $"id").as[(Long, Long)].collect()
    assert(got.sameElements(want))
  }

  test("an overwhelming weight is always sampled") {
    // ln(1e12) ≈ 27.6 nats above unit weights — Gumbel noise (stddev ~1.3
    // nats) cannot bridge that gap in practice
    val skewed = (1L to 50L).map(i => (i, 1L)).toDF("id", "w")
      .union(Seq((99L, 1000000000000L)).toDF("id", "w"))
    val got = Sampling.weightedSample(skewed, "id", $"w", k = 5)
      .select($"id").as[Long].collect().toSet
    assert(got.contains(99L))
  }
}

class WeightedSamplePerGroupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 60L).map(i =>
    (i, if (i % 3 == 0) "a" else "b", i % 5 + 1)).toDF("id", "grp", "w")

  test("k per group, deterministic, groups short of k return what they have") {
    val out = Sampling.weightedSamplePerGroup(docs, "id", "grp", $"w", k = 7)
    val per = out.groupBy($"grp").count().as[(String, Long)].collect().toMap
    assert(per == Map("a" -> 7L, "b" -> 7L))
    val tiny = Sampling.weightedSamplePerGroup(
      docs.where($"id" <= 4), "id", "grp", $"w", k = 7)
    assert(tiny.where($"grp" === "a").count() == 1L) // only id 3
  }

  test("per-group ranking replays the flat weightedSample key") {
    val flat = Sampling.weightedSample(docs, "id", $"w", k = 60)
      .select($"id", $"score_micro").as[(Long, Long)].collect().toMap
    val grouped = Sampling.weightedSamplePerGroup(docs, "id", "grp", $"w", k = 60)
      .select($"id", $"score_micro").as[(Long, Long)].collect().toMap
    assert(grouped == flat)
  }
}

class DomainDivergenceSpec extends SparkSpec {
  import spark.implicits._

  test("identical per-source distributions give exactly zero KL") {
    // both sources have the same unigram distribution {a: 2/3, b: 1/3} →
    // every ratio is exactly 1.0, ln quantizes to 0 micro-nats, no float dust
    val docs = Seq(("s1", "a a b"), ("s2", "a a b a a b")).toDF("src", "text")
    val got = Corpus.domainDivergence(docs, "src", "text")
      .select($"source", $"kl_micro_sum").as[(String, Long)].collect().toMap
    assert(got == Map("s1" -> 0L, "s2" -> 0L))
  }

  test("a skewed source diverges positively; totals are per-source tokens") {
    val docs = Seq(("s1", "a a a a"), ("s2", "b b b b"), ("s3", "a b a b"))
      .toDF("src", "text")
    val rows = Corpus.domainDivergence(docs, "src", "text")
      .select($"source", $"n_tokens", $"kl_nats")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rows("s1")._2 == 4L && rows("s2")._2 == 4L && rows("s3")._2 == 4L)
    // s1 and s2 concentrate on one token (ratio 12/7 > 1) → positive KL;
    // s3 matches the corpus blend less badly than the pure sources
    assert(rows("s1")._3 > 0.0 && rows("s2")._3 > 0.0)
    assert(rows("s3")._3 < rows("s1")._3)
  }
}

class BigramLogProbSpec extends SparkSpec {
  import spark.implicits._

  test("predictable word order scores better than scrambled, same unigrams") {
    // both docs share the unigram profile {a:3, b:3, c:3}; doc 1's
    // transitions are deterministic, doc 2 breaks them
    val docs = Seq((1L, "a b c a b c a b c"), (2L, "c a b b c a a c b"))
      .toDF("doc_id", "text")
    val rows = Corpus.bigramLogProb(docs, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"xent")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rows(1L)._2 == 9L && rows(2L)._2 == 9L)
    assert(rows(1L)._3 < rows(2L)._3,
      s"ordered doc must have lower cross-entropy: $rows")
  }

  test("a single-token doc scores only its unigram first-token term") {
    val docs = Seq((1L, "hello"), (2L, "hello world")).toDF("doc_id", "text")
    val one = Corpus.bigramLogProb(docs, "doc_id", "text")
      .where($"doc_id" === 1L)
      .select($"n_tokens", $"logprob_micro").as[(Long, Long)].head()
    // corpus {hello: 2, world: 1} → T=3, V=2; P_uni(hello) = (2+1)/(3+2)
    // = 0.6; round(ln(0.6)·1e6) = -510826
    assert(one == ((1L, -510826L)))
  }

  test("lambda outside (0, 1) fails fast") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Corpus.bigramLogProb(docs, "doc_id", "text", lambda = 1.0)
    }
  }
}

class MaterializeEpochsSpec extends SparkSpec {
  import spark.implicits._

  // two domains, 4 docs each, 10 tokens per doc → actual 40 tokens/domain
  private val docs = (1L to 8L).map(i =>
    (i, if (i <= 4) "up" else "down", Seq.fill(10)("t").mkString(" ")))
    .toDF("doc_id", "dom", "text")
  private val weights = Seq("up" -> 0.8, "down" -> 0.2)

  private def run() = Sampling.materializeEpochs(docs, "doc_id", "dom",
    graft.functions.TextFns.tokenCount($"text"), weights, budget = 125L)

  test("per-doc copy counts follow floor(rate) plus the fractional coin") {
    // up: target floor(125·0.8)=100, rate 2.5 → 2 or 3 copies per doc;
    // down: target floor(125·0.2)=25, rate 0.625 → 0 or 1 copies
    val counts = run().groupBy($"doc_id").count()
      .as[(Long, Long)].collect().toMap
    (1L to 4L).foreach(i =>
      assert(Set(2L, 3L).contains(counts(i)), s"doc $i: ${counts.get(i)}"))
    (5L to 8L).foreach(i =>
      assert(counts.getOrElse(i, 0L) <= 1L, s"doc $i: ${counts.get(i)}"))
  }

  test("epochs are dense 0..n-1 and the materialization is deterministic") {
    val a = run().as[(Long, String, Long)].collect().sorted
    val b = run().as[(Long, String, Long)].collect().sorted
    assert(a.sameElements(b))
    a.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(0L until rows.length))
    }
  }

  test("domains absent from the weight table emit no rows") {
    val out = Sampling.materializeEpochs(docs, "doc_id", "dom",
      graft.functions.TextFns.tokenCount($"text"),
      Seq("up" -> 1.0), budget = 125L)
    assert(out.where($"dom" === "down").count() == 0L)
  }
}

class RemoveDupSpansSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.ApproxDedup

  private def run(rows: Seq[(Long, String)], n: Int = 5) =
    ApproxDedup.removeDupSpans(rows.toDF("doc_id", "text"), "doc_id", "text", n)
      .select($"doc_id", $"clean_text", $"removed_chars")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("the first occurrence keeps the span; later docs lose it") {
    val out = run(Seq((1L, "abcdefgh"), (2L, "xxabcdefghyy")))
    assert(out(1L) == (("abcdefgh", 0L)))
    assert(out(2L) == (("xxyy", 8L)))
  }

  test("within-document repetition keeps only the first copy") {
    val out = run(Seq((1L, "abcdeabcde")))
    assert(out(1L) == (("abcde", 5L)))
  }

  test("docs without duplicated spans pass through untouched") {
    val out = run(Seq((1L, "abcdefghij"), (2L, "qrstuvwxyz")))
    assert(out(1L) == (("abcdefghij", 0L)))
    assert(out(2L) == (("qrstuvwxyz", 0L)))
  }

  test("touching cut spans merge into one island") {
    val out = run(Seq((1L, "abcdefghij"), (2L, "ZZabcdefghijZZ")))
    assert(out(2L) == (("ZZZZ", 10L)))
  }
}

class RrfFuseSpec extends SparkSpec {
  import spark.implicits._

  test("an item in both lists outranks equal-rank single-list items") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((10L, 2), (20L, 1), (21L, 3)).toDF("id", "rank")
    val out = Corpus.rrfFuse(Seq(a, b), "id", "rank", k = 10)
      .as[(Long, Long, Long)].collect()
    // id 10: round(1e6/61) + round(1e6/62) = 16393 + 16129 = 32522
    assert(out.head == ((10L, 32522L, 2L)))
    // id 20 (rank 1 in one list) beats 11 (rank 2 in one list)
    val order = out.map(_._1)
    assert(order.indexOf(20L) < order.indexOf(11L))
  }

  test("k caps the fused list; ties break by id") {
    val a = Seq((1L, 1), (2L, 1)).toDF("id", "rank")
    val out = Corpus.rrfFuse(Seq(a), "id", "rank", k = 1)
      .as[(Long, Long, Long)].collect()
    assert(out.sameElements(Array((1L, 16393L, 1L))))
  }
}

class SqReconErrorSpec extends SparkSpec {
  import spark.implicits._

  test("exactly representable vectors reconstruct to cosine 1.0") {
    val emb = Seq((0L, Array(0.9f, 0.0f)), (1L, Array(0.3f, 0.9f)))
      .toDF("vec_id", "embedding")
    val scale = SimilaritySearch.maxAbsScale(emb, "embedding")
    val out = SimilaritySearch.sqReconstructionError(
        SimilaritySearch.withInt8(emb, "embedding", scale),
        "vec_id", "embedding", "qvec", scale)
      .orderBy($"vec_id").as[(Long, Long)].collect().toMap
    // (0.9, 0) → codes (127, 0) → dequant parallel to the original: exact
    assert(out(0L) == 1000000L)
    // (0.3, 0.9) quantizes inexactly — close to but below perfect
    assert(out(1L) < 1000000L && out(1L) > 990000L, s"got ${out(1L)}")
  }
}

class BlocklistFilterSpec extends SparkSpec {
  import spark.implicits._

  test("token-boundary matching: no substring false positives, counts exact") {
    val docs = Seq((1L, "the scan runs"), (2L, "scanner scans scanning"),
      (3L, "scan scan SCAN")).toDF("doc_id", "text")
    val out = Corpus.blocklistFilter(docs, "doc_id", "text",
        words = Seq("scan"), maxHits = 0L)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((1L, false)))
    assert(out(2L) == ((0L, true)), "substrings must not match")
    assert(out(3L) == ((3L, false)), "case folds before matching")
  }

  test("maxHits thresholds the keep flag") {
    val docs = Seq((1L, "bad"), (2L, "bad bad")).toDF("doc_id", "text")
    val out = Corpus.blocklistFilter(docs, "doc_id", "text",
        words = Seq("bad"), maxHits = 1L)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(out(1L) && !out(2L))
  }

  test("oracle SQL escapes apostrophes in blocklist words") {
    val sql = Corpus.blocklistFilterOracleSql("documents", "doc_id", "text",
      words = Seq("don't", "o'brien's"))
    assert(sql.contains("'don''t'") && sql.contains("'o''brien''s'"))
    assert(!sql.contains("'don't'"))
    // Spark side still matches the raw word at token boundaries
    val docs = Seq((1L, "they don't stop"), (2L, "dont stop")).toDF("doc_id", "text")
    val out = Corpus.blocklistFilter(docs, "doc_id", "text",
        words = Seq("don't"), maxHits = 0L)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(!out(1L) && out(2L))
  }
}

class PsiBinsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Maintenance

  test("identical snapshots yield exactly zero PSI terms") {
    val a = Seq(10.0, 20.0, 30.0, 250.0).toDF("v")
    val out = Maintenance.psiBins(a, a, $"v", lo = 0.0, hi = 100.0, bins = 4)
      .as[(Int, Long, Long, Long)].collect()
    assert(out.length == 4)
    assert(out.forall(_._4 == 0L), s"nonzero terms: ${out.toSeq}")
  }

  test("a shifted snapshot produces positive total PSI; values clamp to edge bins") {
    val a = Seq(5.0, 15.0, 25.0).toDF("v")
    val b = Seq(75.0, 85.0, 950.0, -3.0).toDF("v") // 950 → top bin, -3 → bin 0
    val out = Maintenance.psiBins(a, b, $"v", lo = 0.0, hi = 100.0, bins = 10)
      .as[(Int, Long, Long, Long)].collect()
    assert(out.map(_._4).sum > 200000L, s"PSI too small: ${out.toSeq}")
    assert(out.find(_._1 == 9).get._3 == 1L) // 950 clamped into bin 9
    assert(out.find(_._1 == 0).get._3 == 1L) // -3 clamped into bin 0
  }
}

class NearDupSourceMatrixSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.ApproxDedup

  test("pairs fold into unordered source cells") {
    val docs = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
      .toDF("doc_id", "source")
    // (1,2) within A; (2,3) and (3,1) both A×B regardless of direction
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("id1", "id2")
    val out = ApproxDedup.nearDupSourceMatrix(docs, pairs, "doc_id", "source")
      .as[(String, String, Long)].collect()
    assert(out.sameElements(Array(("A", "A", 1L), ("A", "B", 2L))))
  }
}

class ShardManifestSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 40L).map(i => (i, s"text-$i", 100L))
    .toDF("doc_id", "text", "sz")
  private def sig = graft.functions.TextFns.md5Long60(
    concat($"doc_id".cast("string"), lit("|"), $"text"))

  test("manifest extends the shard plan with an exact order-free signature") {
    val plan = Sampling.shardPlan(docs, "doc_id", $"sz", 500L, buckets = 2)
      .as[(Long, Long, Long)].collect().map { case (s, n, z) => s -> ((n, z)) }.toMap
    val mani = Sampling.shardManifest(docs, "doc_id", $"sz", sig, 500L, buckets = 2)
      .select($"shard_id", $"n_docs", $"sum_size").as[(Long, Long, Long)]
      .collect().map { case (s, n, z) => s -> ((n, z)) }.toMap
    assert(mani == plan, "manifest must agree with the plan on counts/sizes")
  }

  test("a one-row content change moves exactly that shard's signature") {
    val a = Sampling.shardManifest(docs, "doc_id", $"sz", sig, 500L, 2)
      .select($"shard_id", $"content_sig".cast("string"))
      .as[(Long, String)].collect().toMap
    val tampered = docs.withColumn("text",
      when($"doc_id" === 7L, lit("TAMPERED")).otherwise($"text"))
    val b = Sampling.shardManifest(tampered, "doc_id", $"sz",
        graft.functions.TextFns.md5Long60(
          concat($"doc_id".cast("string"), lit("|"), $"text")), 500L, 2)
      .select($"shard_id", $"content_sig".cast("string"))
      .as[(Long, String)].collect().toMap
    val moved = a.keySet.filter(k => a(k) != b(k))
    assert(moved.size == 1, s"exactly one shard must change: $moved")
  }
}

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("added, removed, changed, and same all classify correctly") {
    val oldV = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newV = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = Corpus.corpusDiff(oldV, newV, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added"))
  }
}

class PaddingWasteSpec extends SparkSpec {
  import spark.implicits._

  test("buckets ladder up, overflow truncates to the top boundary") {
    // lengths 3, 8, 8, 20 with boundaries (4, 8, 16): buckets 4, 8, 8, 16
    val docs = Seq(3, 8, 8, 20).toDF("n")
    val out = Corpus.paddingWaste(docs, $"n", boundaries = Seq(4, 8, 16))
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(4L) == ((1L, 3L, 1L)))   // one doc, 3 real, 1 pad
    assert(out(8L) == ((2L, 16L, 0L)))  // two exact fits, no padding
    assert(out(16L) == ((1L, 16L, 0L))) // truncated to 16 — no pad, lost tokens
  }

  test("unsorted or non-positive boundaries fail fast") {
    val docs = Seq(1).toDF("n")
    intercept[IllegalArgumentException] {
      Corpus.paddingWaste(docs, $"n", boundaries = Seq(8, 4))
    }
  }
}

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("merge table follows greedy weighted pair counts, re-counted per step") {
    // vocab: "aaab"×2, "ab"×1 → step 1 merges "a a" (4), step 2 "a b" (3,
    // counted AFTER the first merge), step 3 "aa ab" (2)
    val docs = Seq("aaab aaab ab").toDF("text")
    val got = Corpus.bpeTrain(docs, "text", nMerges = 3)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a a", 4L), (2, "a b", 3L), (3, "aa ab", 2L)))
  }

  test("ties break to the lexicographically smallest pair") {
    val docs = Seq("ab cd").toDF("text")
    val got = Corpus.bpeTrain(docs, "text", nMerges = 1)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a b", 1L)))
  }

  test("adjacent occurrences both merge: banana under 'a n' → b an an a") {
    // The naive literal replace of ' a n ' consumes the shared sentinel
    // space and misses the second occurrence ([b,an,a,n,a]); greedy BPE
    // (subword-nmt) yields [b,an,an,a]. Distinguishes the two.
    val docs = Seq((1L, "banana")).toDF("doc_id", "text")
    val got = Corpus.bpeSegmentCounts(docs, "doc_id", "text", nMerges = 1)
      .as[(Long, Long, Long)].head()
    assert(got == ((1L, 1L, 4L)))
    // And the step-2 pair table sees (an,an) — only exists post-fix.
    val merges = Corpus.bpeTrain(Seq("banana").toDF("text"), "text", nMerges = 2)
      .as[(Int, String, Long)].collect().toSeq
    assert(merges == Seq((1, "a n", 2L), (2, "an a", 1L)))
  }

  test("abab under merge 'a b' → ab ab (2 subwords, not 3)") {
    val docs = Seq((1L, "abab")).toDF("doc_id", "text")
    val got = Corpus.bpeSegmentCounts(docs, "doc_id", "text", nMerges = 1)
      .as[(Long, Long, Long)].head()
    assert(got == ((1L, 1L, 2L)))
  }

  test("odd run aaaaa under 'a a' merges greedily left-to-right → aa aa a") {
    val merges = Corpus.bpeTrain(Seq("aaaaa").toDF("text"), "text", nMerges = 2)
      .as[(Int, String, Long)].collect().toSeq
    // step 1: (a,a) freq 4; after greedy merge "aa aa a" the step-2 pairs
    // are (aa,aa):1 and (aa,a):1 → lexicographic tie-break picks "aa a".
    assert(merges == Seq((1, "a a", 4L), (2, "aa a", 1L)))
  }

  test("training stops early when no pairs remain") {
    val docs = Seq("a b c").toDF("text") // single-char words: no pairs ever
    assert(Corpus.bpeTrain(docs, "text", nMerges = 5).count() == 0L)
  }

  test("segment counts apply the trained merges per distinct word") {
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    // after 1 merge ("a a"): aaab → 'aa a b' (3 subwords), ab → 'a b' (2)
    val one = Corpus.bpeSegmentCounts(docs, "doc_id", "text", nMerges = 1)
      .as[(Long, Long, Long)].head()
    assert(one == ((1L, 3L, 8L)))
    // after 3 merges the two words collapse to single tokens
    val three = Corpus.bpeSegmentCounts(docs, "doc_id", "text", nMerges = 3)
      .as[(Long, Long, Long)].head()
    assert(three == ((1L, 3L, 3L)))
  }
}

class FunnelLatencySpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Relational

  test("per-transition gaps use first qualifying occurrences") {
    val events = Seq(
      (1L, "a", "2024-01-01 00:00:00"), (1L, "b", "2024-01-01 02:00:00"),
      (1L, "b", "2024-01-01 05:00:00"), // later b ignored (first qualifies)
      (2L, "a", "2024-01-01 00:00:00"), (2L, "b", "2024-01-01 04:00:00"))
      .toDF("user_id", "event_type", "dts")
      .withColumn("ts", to_timestamp_ntz($"dts")).drop("dts")
    val got = Relational.funnelLatency(events, "user_id", "event_type", "ts",
        steps = Seq("a", "b"))
      .as[(String, Long, Double, Double)].collect()
    assert(got.length == 1)
    val (t, n, p50, p90) = got.head
    assert(t == "2_a_to_b" && n == 2L)
    // gaps {2h, 4h}: p50 interpolates to 3h, p90 to 2h + 0.9·2h
    assert(p50 == 3.0 * 3600 && p90 == (2.0 + 0.9 * 2.0) * 3600)
  }
}

class DailyBurstsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Relational

  test("a spike over the trailing baseline flags; warm-up days are skipped") {
    // 7 quiet days (1 event each), then a day with 50 events
    val rows =
      (1 to 7).flatMap(day => Seq((day, 1))) ++ Seq.fill(50)((8, 1)).map(t => (t._1, 1))
    val events = rows.zipWithIndex.map { case ((day, _), i) =>
      (i.toLong, f"2024-01-$day%02d 12:00:00")
    }.toDF("eid", "dts").withColumn("ts", to_timestamp_ntz($"dts"))
    val got = Relational.dailyBursts(events, "ts", sigma = 3.0, window = 7)
      .select($"cnt", $"burst").as[(Long, Boolean)].collect()
    // only day 8 has a full trailing window; its 50 events vs mean 1, std 0
    assert(got.length == 1 && got.head == ((50L, true)))
  }

  test("steady traffic never flags") {
    val events = (1 to 20).flatMap(day => (1 to 5).map(i => (day, i)))
      .zipWithIndex.map { case ((day, _), i) => (i.toLong, f"2024-01-$day%02d 06:00:00") }
      .toDF("eid", "dts").withColumn("ts", to_timestamp_ntz($"dts"))
    val flagged = Relational.dailyBursts(events, "ts").where($"burst").count()
    assert(flagged == 0L)
  }
}

class WinsorizeSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Maintenance

  test("values clamp to the exact interpolated percentiles; flags mark clips") {
    // 1..10: p10 = 1.9, p90 = 9.1 (linear interpolation)
    val df = (1L to 10L).map(i => (i, i.toDouble)).toDF("id", "v")
    val out = Maintenance.winsorize(df, "id", $"v", pLo = 0.1, pHi = 0.9)
      .as[(Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(out(1L) == ((1.9, true)) && out(10L) == ((9.1, true)))
    assert(out(5L) == ((5.0, false)))
    assert(out.values.count(_._2) == 2)
  }

  test("degenerate percentile order fails fast") {
    val df = Seq((1L, 1.0)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Maintenance.winsorize(df, "id", $"v", pLo = 0.9, pHi = 0.1)
    }
  }
}

class EventNgramsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Relational

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_type", "eid")
      .withColumn("ts", timestamp_micros($"eid" * 1000000L))

  test("trigrams count consecutive type runs per entity, never across entities") {
    val events = ev(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L), (1L, "b", 4L), (1L, "c", 5L),
      (2L, "b", 6L), (2L, "c", 7L)) // user 2 has only 2 events: no trigram
    val got = Relational.eventNgrams(events, "user_id", "event_type",
        "ts", "eid", n = 3, k = 10)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a > b > c" -> 1L, "b > c > b" -> 1L, "c > b > c" -> 1L))
  }

  test("bigrams with a tie order deterministically by pattern") {
    val events = ev((1L, "x", 1L), (1L, "y", 2L), (1L, "x", 3L), (1L, "y", 4L))
    val got = Relational.eventNgrams(events, "user_id", "event_type",
        "ts", "eid", n = 2, k = 1)
      .as[(String, Long)].collect()
    // "x > y" (2) beats "y > x" (1)
    assert(got.sameElements(Array(("x > y", 2L))))
  }
}

class WindowedFunnelSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Relational

  private def ev(rows: (Long, String, String)*) =
    rows.toSeq.toDF("user_id", "event_type", "dts")
      .withColumn("ts", to_timestamp_ntz($"dts")).drop("dts")

  test("a step past the gap breaks the chain; within the gap it counts") {
    val events = ev(
      (1L, "a", "2024-01-01 00:00:00"), (1L, "b", "2024-01-01 01:00:00"),
      (2L, "a", "2024-01-01 00:00:00"), (2L, "b", "2024-01-03 00:00:00"))
    val out = Relational.funnel(events, "user_id", "event_type", "ts",
        steps = Seq("a", "b"), maxGapUs = Some(24L * 3600L * 1000000L))
      .as[(String, Long)].collect().toMap
    assert(out == Map("1_a" -> 2L, "2_b" -> 1L))
  }

  test("windowed counts never exceed the unbounded funnel's") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val steps = Seq("signup", "view", "click")
    val plain = Relational.funnel(events, "user_id", "event_type", "ts", steps)
      .as[(String, Long)].collect().toMap
    val bounded = Relational.funnel(events, "user_id", "event_type", "ts",
        steps, maxGapUs = Some(3600L * 1000000L))
      .as[(String, Long)].collect().toMap
    steps.indices.foreach { i =>
      val k = s"${i + 1}_${steps(i)}"
      assert(bounded.getOrElse(k, 0L) <= plain.getOrElse(k, 0L), k)
    }
  }
}

/** Cross-op invariants for the round-10 operators. */
class Round10InvariantSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.ApproxDedup

  test("removeDupSpans: removed_chars always equals the length delta") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val out = ApproxDedup.removeDupSpans(docs, "doc_id", "text", n = 20)
      .select($"doc_id", length($"clean_text").cast("long").as("clean_len"),
        $"n_chars", $"removed_chars")
    val bad = out.where($"n_chars" - $"clean_len" =!= $"removed_chars").count()
    assert(bad == 0L, s"$bad docs where cut accounting disagrees with lengths")
  }

  test("bpePairCounts totals: Σ pair_freq bounded by Σ freq·(len−1) over the vocab") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val vocabTotal = Corpus.vocab(docs, "text")
      .select((greatest(length($"token") - 1, lit(0)) * $"freq").as("p"))
      .agg(sum($"p")).as[Long].head()
    // k large enough to cover every pair: totals must match exactly
    val pairTotal = Corpus.bpePairCounts(docs, "text", k = 1000000)
      .agg(sum($"pair_freq")).as[Long].head()
    assert(pairTotal == vocabTotal,
      s"pair total $pairTotal != vocab-derived $vocabTotal")
  }
}

class Round10PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("weightedSample plans zero exchanges — pure projection + TakeOrdered") {
    import org.apache.spark.sql.functions.col
    val plan = SparkEntry.queries("q_weighted_sample")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange "),
      s"weightedSample must not shuffle:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrderedAndProject:\n$plan")
  }

  test("domainDivergence: ONE corpus scan; consumers read the persisted (source, type) table") {
    // audit the LAZY pipeline — the public entry checkpoints the small
    // result and releases the persisted intermediate
    val (out, st) = graft.ops.Corpus.domainDivergenceLazy(
      Tables.documents(spark, sf), "source", "text")
    try {
      val opt = out.queryExecution.optimizedPlan
      val parquetScans = opt.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l }
      val cached = opt.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m }
      assert(parquetScans.isEmpty,
        s"${parquetScans.size} uncached corpus scans (branch re-reads):\n$opt")
      assert(cached.nonEmpty, s"persisted (source, type) table not reused in:\n$opt")
    } finally { st.unpersist(); () }
  }

  test("bigramLogProb: ONE corpus scan; both explodes read the persisted token arrays") {
    val (out, toks) = graft.ops.Corpus.bigramLogProbLazy(
      Tables.documents(spark, sf), "doc_id", "text", lambda = 0.7)
    try {
      val opt = out.queryExecution.optimizedPlan
      val parquetScans = opt.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l }
      val cached = opt.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m }
      assert(parquetScans.isEmpty,
        s"${parquetScans.size} uncached corpus scans (branch re-reads):\n$opt")
      assert(cached.nonEmpty, s"persisted token arrays not reused in:\n$opt")
    } finally { toks.unpersist(); () }
  }

  test("hardNegatives plans only equi-joins — no nested loop, no cartesian") {
    val plan = SparkEntry.queries("q_hard_negatives")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"hard negatives degenerated to a quadratic join:\n$plan")
  }

  test("bpePairCounts scans the corpus once; the pair explode sits above the vocab aggregate") {
    val plan = SparkEntry.queries("q_bpe_pairs")(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"$scans corpus scans in:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrderedAndProject:\n$plan")
  }
}

class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  // 40 unit-ish vectors in 4 dims, 2 labels; ids 0..15 double as centroids
  private def emb = (0L until 40L).map { i =>
    val d = (i % 8).toInt
    (i, Array(1.0f + d, (d * d % 5).toFloat, (7 - d).toFloat, 1.0f),
      (i % 2).toInt)
  }.toDF("vec_id", "embedding", "label")

  test("every returned negative carries a different label than its query") {
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 8)
    val indexed = SimilaritySearch.withIvfCell(emb, "embedding", cents)
    val queries = emb.where($"vec_id" < 4)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"), $"label".as("qlabel"))
    val out = SimilaritySearch.hardNegatives(indexed, queries,
      "vec_id", "embedding", "cell", "label", "qid", "qvec", "qlabel",
      cents, k = 3, nProbe = 8)
    val rows = out.select($"qid", $"vec_id", $"label").as[(Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qid, id, lab) =>
      assert(lab == ((id % 2).toInt) && lab != ((qid % 2).toInt) && id != qid)
    }
  }

  test("probing all cells equals the brute-force label-filtered top-k") {
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 8)
    val indexed = SimilaritySearch.withIvfCell(emb, "embedding", cents)
    val queries = emb.where($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"), $"label".as("qlabel"))
    val got = SimilaritySearch.hardNegatives(indexed, queries,
        "vec_id", "embedding", "cell", "label", "qid", "qvec", "qlabel",
        cents, k = 5, nProbe = 8)
      .orderBy($"rank").select($"vec_id").as[Long].collect()
    val q = emb.where($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val want = emb.where($"label" =!= 0)
      .select($"vec_id", graft.functions.VectorFns.cosine(
        $"embedding", typedLit(q.toArray)).as("c"))
      .orderBy($"c".desc, $"vec_id").limit(5)
      .select($"vec_id").as[Long].collect()
    assert(got.sameElements(want))
  }
}
