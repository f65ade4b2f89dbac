package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.ops.ApproxDedup

/** Round-12 operators: SimHash Hamming-ball near-dup pairs, asymmetric
  * shingle containment, HTML text extraction, tracking-param stripping. */
class SimhashNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("identical docs pair at hamming 0; unrelated docs do not pair") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again",
      3L -> "entirely different subject matter about spark catalyst planning optimizer rules"
    ).toDF("id", "text")
    val pairs = ApproxDedup.simhashNearDups(docs, "id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash is scale-invariant under full-text repetition (doc vs doc∥doc)") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(1L -> base, 2L -> s"$base $base").toDF("id", "text")
    val pairs = ApproxDedup.simhashNearDups(docs, "id", "text", maxHamming = 0)
      .as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("pairs found via multiple bands emit once") {
    val docs = Seq(1L -> "x y z", 2L -> "x y z").toDF("id", "text")
    val pairs = ApproxDedup.simhashNearDups(docs, "id", "text").collect()
    assert(pairs.length == 1)
  }

  test("maxHamming outside the pigeonhole-exact radius is rejected") {
    val docs = Seq(1L -> "a").toDF("id", "text")
    intercept[IllegalArgumentException] {
      ApproxDedup.simhashNearDups(docs, "id", "text", maxHamming = 4)
    }
  }
}

class ContainmentPairsSpec extends SparkSpec {
  import spark.implicits._

  private val parent =
    "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"

  test("a prefix excerpt is fully contained in its parent, not vice versa") {
    val excerpt = "one two three four five six seven"
    val docs = Seq(1L -> parent, 2L -> excerpt).toDF("id", "text")
    val got = ApproxDedup.containmentPairs(docs, "id", "text",
        n = 3, thresholdMicro = 0L, maxDocsPerShingle = 10)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // excerpt(7 tokens) has 5 trigrams, all in parent
    assert(got((2L, 1L)) == 1000000L)
    // parent(14 tokens) has 12 trigrams, 5 shared: 5*1e6 div 12
    assert(got((1L, 2L)) == 5000000L / 12L)
  }

  test("threshold keeps only the contained direction") {
    val docs = Seq(1L -> parent, 2L -> "one two three four five six seven")
      .toDF("id", "text")
    val got = ApproxDedup.containmentPairs(docs, "id", "text",
        n = 3, thresholdMicro = 900000L, maxDocsPerShingle = 10)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq.map(r => (r._1, r._2)) == Seq((2L, 1L)))
  }

  test("boilerplate shingles (over maxDocsPerShingle docs) do not create pairs") {
    // the same 3-gram in every doc; otherwise disjoint texts
    val docs = (1L to 5L).map(i =>
      i -> s"call now today uniq${i}a uniq${i}b uniq${i}c uniq${i}d").toDF("id", "text")
    val got = ApproxDedup.containmentPairs(docs, "id", "text",
        n = 3, thresholdMicro = 1L, maxDocsPerShingle = 4)
      .collect()
    assert(got.isEmpty)
  }
}

class HtmlToTextSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(TextFns.htmlToText(col("h")).as("t"))
      .as[String].head()

  test("tags strip, script/style/comment payloads drop, whitespace collapses") {
    val got = extract(
      """<html><head><style>p { color: red }</style></head>
        |<body><!-- nav --><h1>Title</h1>
        |<p>Hello   <b>world</b>.</p><script>var x = 1 < 2;</script></body></html>""".stripMargin)
    // tags are replaced by a space, so `</b>.` leaves a space before the dot
    assert(got == "Title Hello world .")
  }

  test("entities decode once, &amp; last (no double decode)") {
    assert(extract("a &amp;lt; b") == "a &lt; b")
    assert(extract("x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp; y &amp; z") ==
      "x <tag> \"q\" 's' y & z")
  }

  test("case-insensitive script/style with attributes") {
    assert(extract("""A<SCRIPT type="a">ignore
      |me</SCRIPT>B<Style media="x">s</Style>C""".stripMargin) == "A B C")
  }
}

class StripTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def strip(url: String): String =
    Seq(url).toDF("u").select(TextFns.stripTrackingParams(col("u")).as("t"))
      .as[String].head()

  test("tracking params drop, kept params and fragment survive") {
    assert(strip("https://x.com/p?utm_source=a&q=1&fbclid=z#f") ==
      "https://x.com/p?q=1#f")
    assert(strip("https://x.com/p?q=1&utm_campaign=c") == "https://x.com/p?q=1")
  }

  test("all-tracking query strings leave no dangling separators") {
    assert(strip("https://x.com/p?utm_source=a&utm_medium=b") == "https://x.com/p")
    assert(strip("https://x.com/p?gclid=1#sec") == "https://x.com/p#sec")
  }

  test("params merely containing a tracking-name substring are kept") {
    assert(strip("https://x.com/p?xutm_source=a&q=1") ==
      "https://x.com/p?xutm_source=a&q=1")
  }

  test("untouched URLs round-trip") {
    assert(strip("https://x.com/p?a=1&b=2#frag") == "https://x.com/p?a=1&b=2#frag")
    assert(strip("https://x.com/p") == "https://x.com/p")
  }
}

class SignalAucSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Evaluation

  private def auc(rows: (Int, Long)*): Option[Long] = {
    val df = rows.toDF("lbl", "score")
    Evaluation.signalAuc(df, "lbl", "score")
      .select("auc_micro").as[Option[Long]].head()
  }

  test("perfect separation scores 1.0; reversed scores 0.0") {
    assert(auc(1 -> 10L, 1 -> 9L, 0 -> 2L, 0 -> 1L).contains(1000000L))
    assert(auc(0 -> 10L, 0 -> 9L, 1 -> 2L, 1 -> 1L).contains(0L))
  }

  test("a constant score ties everything at 0.5") {
    assert(auc(1 -> 5L, 0 -> 5L, 1 -> 5L, 0 -> 5L).contains(500000L))
  }

  test("average-rank tie handling matches the closed form") {
    // pos scores {3, 1}, neg scores {3, 2}: pairs = (3v3 tie=0.5) + (3v2
    // win=1) + (1v3 lose=0) + (1v2 lose=0) → 1.5/4 = 0.375
    assert(auc(1 -> 3L, 1 -> 1L, 0 -> 3L, 0 -> 2L).contains(375000L))
  }

  test("single-class input yields null AUC") {
    assert(auc(1 -> 3L, 1 -> 1L).isEmpty)
  }
}

class CalibrationBinsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Evaluation

  test("bins partition the micro-score axis; 1e6 lands in the top bin") {
    val df = Seq((1, 100000L), (0, 150000L), (1, 900000L), (1, 1000000L))
      .toDF("lbl", "score_micro")
    val got = Evaluation.calibrationBins(df, "lbl", "score_micro", nBins = 5)
      .as[(Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(0) == ((0, 2L, 125000L, 500000L)))
    assert(got(4) == ((4, 2L, 950000L, 1000000L)))
    assert(got.size == 2)
  }
}

class LangMixSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Cleaning

  test("majority language, fraction, and distinct-language count") {
    val docs = Seq(
      1L -> "the cat is in the hat and it is fine\nthe dog is of the house\nel perro es un animal y la casa",
      2L -> "the cat is in the hat and it is fine\n\n  \nthe dog is of the house"
    ).toDF("id", "text")
    val got = Cleaning.langMix(docs, "id", "text")
      .as[(Long, Long, Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 2L, "en", 2000000L / 3L)))
    // blank lines drop; doc 2 is pure English
    assert(got(2L) == ((2L, 2L, 1L, "en", 1000000L)))
  }

  test("majority ties break to the lexicographically largest code") {
    val docs = Seq(
      1L -> "the cat is in the hat and it is fine\nel perro es un animal y la casa")
      .toDF("id", "text")
    val got = Cleaning.langMix(docs, "id", "text")
      .as[(Long, Long, Long, String, Long)].head()
    assert(got == ((1L, 2L, 2L, "es", 500000L)))
  }
}

class PrCurveSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Evaluation

  test("confusion counts and micro ratios per threshold; undefined → null") {
    // labels: pos scores {3, 1}, neg scores {2, 0}
    val df = Seq((1, 3L), (1, 1L), (0, 2L), (0, 0L)).toDF("lbl", "score")
    val got = Evaluation.prCurve(df, "lbl", "score", Seq(2L, 5L))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    // t=2: tp=1 fp=1 fn=1 → p=.5 r=.5 f1=.5
    assert(got(2L) == ((2L, 1L, 1L, 1L,
      Some(500000L), Some(500000L), Some(500000L))))
    // t=5: nothing predicted positive → precision null, recall 0
    assert(got(5L) == ((5L, 0L, 0L, 2L, None, Some(0L), Some(0L))))
  }
}

class EmbeddingQaSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Evaluation

  test("dim groups, zero-norm counting, floored micro norms") {
    val df = Seq(
      (1L, Seq(3.0f, 4.0f)),          // norm² = 25
      (2L, Seq(0.0f, 0.0f)),          // zero vector
      (3L, Seq(1.0f, 0.0f, 0.0f))     // odd dimension out
    ).toDF("vec_id", "embedding")
    val got = Evaluation.embeddingQa(df, "vec_id", "embedding")
      .as[(Int, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(2) == ((2, 2L, 1L, Some(0L), Some(25000000L))))
    assert(got(3) == ((3, 1L, 0L, Some(1000000L), Some(1000000L))))
  }
}

class FreqSpectrumSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Evaluation

  test("count-of-counts over the lowercased vocabulary") {
    val df = Seq(1L -> "a a a b b C c d").toDF("id", "text")
    // a:3, b:2, c:2 (C lowercases), d:1 → freq 1×1, 2×2, 3×1
    val got = Evaluation.freqSpectrum(df, "text")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }
}

/** Plan-shape asserts for the round-12 ops — the scale claims in SURVEY
  * §2.12, tested rather than narrated. */
class Round12PlanSpec extends SparkSpec {
  import spark.implicits._

  test("simhashNearDups: band equi-join, never a cartesian/nested-loop join") {
    val docs = Seq(1L -> "a b c", 2L -> "a b c", 3L -> "d e f").toDF("id", "text")
    val plan = graft.ops.ApproxDedup.simhashNearDups(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the (band, bucket) equi-join")
  }

  test("containmentPairs: shingle equi-join only, no cartesian product") {
    val docs = Seq(1L -> "a b c d e", 2L -> "a b c").toDF("id", "text")
    val plan = graft.ops.ApproxDedup.containmentPairs(docs, "id", "text",
        n = 3, thresholdMicro = 0L, maxDocsPerShingle = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("htmlToText and stripTrackingParams are exchange-free scan projections") {
    val df = Seq((1L, "<p>x</p>", "https://x.com/?utm_a=1")).toDF("id", "h", "u")
    val plan = df.select(
        graft.functions.TextFns.htmlToText(col("h")),
        graft.functions.TextFns.stripTrackingParams(col("u")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}

/** Executional proof for the stored SimHash index: the probe reads only the
  * query doc's ≤ 4 bucket dirs (the StoredIndexPruningSpec discipline). */
class SimhashIndexPruningSpec extends SparkSpec {
  import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
  import graft.sync.SyncEngine

  test("stored simhash band probe reads only the query doc's bucket dirs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def index(df: org.apache.spark.sql.DataFrame) =
      graft.ops.ApproxDedup.simhashBands(df, "doc_id", "text", buckets = 16)
    val root = java.nio.file.Files.createTempDirectory("graft_prune_sh").toString
    val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("ann", "sh_prune"),
      columns = ColumnRoles(Map("datetime" -> "bucket", "id" -> "doc_id")),
      epochUnit = Some("minute"), chunkMinutes = 1)
    val store = eng.storage(spec)
    store.create(index(docs))
    val qBuckets = index(docs.where(col("doc_id") === 45L))
      .select(col("bucket")).distinct().collect().map(_.getLong(0)).toSeq
    assert(qBuckets.nonEmpty && qBuckets.size <= 4)
    val storedDirs = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("__graft_chunk="))
        .map(_.getFileName.toString.stripPrefix("__graft_chunk=")).toSet
    }
    val read = store.readIn(qBuckets)
      .select(input_file_name().as("f")).distinct().collect()
      .map(_.getString(0))
      .map { f =>
        val m = "__graft_chunk=([^/]+)/".r.findFirstMatchIn(f)
        assert(m.isDefined, s"probe read a file outside any chunk dir: $f")
        m.get.group(1)
      }.toSet
    assert(read == qBuckets.map(_.toString).toSet,
      s"probe read $read, requested ${qBuckets.toSet}")
    assert(read.size < storedDirs.size,
      s"pruning is vacuous: index holds only ${storedDirs.size} chunk dirs")
  }
}

class IntervalOverlapSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Relational

  private val H = 3600L * 1000000L // one hour in micros
  private def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("overlapping pairs emit exactly once, even across many buckets") {
    val a = Seq((1L, t(0), t(10))).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((7L, t(2), t(3)), (8L, t(11), t(12))).toDF("b_id", "b_lo", "b_hi")
    // bucket = 1h: the pair (1,7) shares buckets 2 and 3 — must emit once
    val got = Relational.intervalOverlapJoin(a, b,
        "a_lo", "a_hi", "b_lo", "b_hi", bucketWidthUs = H)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 7L)))
  }

  test("closed intervals: touching endpoints overlap") {
    val a = Seq((1L, t(0), t(5))).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((2L, t(5), t(8))).toDF("b_id", "b_lo", "b_hi")
    val got = Relational.intervalOverlapJoin(a, b,
        "a_lo", "a_hi", "b_lo", "b_hi", bucketWidthUs = H).count()
    assert(got == 1L)
  }
}

class AttributionSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Relational

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("first/last touch within the window; out-of-window and no-touch keep nulls") {
    val events = Seq(
      (1L, ts(0),  100L, "view"),     // in window (conv at 10:30, 30 min)
      (1L, ts(20), 101L, "click"),    // in window
      (1L, ts(30), 102L, "purchase"),
      (2L, ts(0),  200L, "click"),    // OUTSIDE window for conv at 10:59
      (2L, ts(59), 201L, "purchase"),
      (3L, ts(10), 300L, "purchase")  // no touches at all
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Relational.touchAttribution(events, "user_id", "ts",
        "event_type", "event_id", Seq("click", "view"), "purchase",
        windowUs = 30L * 60L * 1000000L)
      .select("conv_id", "first_touch_id", "last_touch_id")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(102L) == ((Some(100L), Some(101L))))
    assert(got(201L) == ((None, None))) // touch exists but out of window
    assert(got(300L) == ((None, None))) // no touches
  }
}

class DqChecksSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Maintenance

  test("per-rule violation counts, micro rates, and the duplicate-key rule") {
    val df = Seq(
      (1L, Some(5.0)), (2L, None), (3L, Some(-1.0)), (3L, Some(2.0))
    ).toDF("id", "v")
    val got = Maintenance.dqChecks(df,
        Seq("v_null" -> col("v").isNull, "v_negative" -> (col("v") < 0)),
        uniqueKey = Some(Seq("id")))
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("v_null") == (("v_null", 1L, 4L, Some(250000L))))
    assert(got("v_negative") == (("v_negative", 1L, 4L, Some(250000L))))
    assert(got("duplicate_key:id") == (("duplicate_key:id", 1L, 4L, Some(250000L))))
  }
}

class SimhashRowParitySpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.ApproxDedup

  test("native kernel is bit-identical to the relational explode+groupBy form") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val bits = 63
    // the original relational formulation, rebuilt here as the reference:
    // explode tokens, md5-nibble conditional sums per bit, sign → bit
    val tok = docs.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bitSums = (0 until bits).map { j =>
      val nib = conv(substring(col("h"), j / 4 + 1, 1), 16, 10).cast("int")
      sum(when(nib.bitwiseAND(lit(1 << (j % 4))) =!= 0, 1).otherwise(-1)).as(s"b$j")
    }
    val sigExpr = (0 until bits).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val relational = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sigExpr.as("simhash"))
    val native = ApproxDedup.simhash(docs, "doc_id", "text")
    assert(native.exceptAll(relational).isEmpty &&
      relational.exceptAll(native).isEmpty)
  }

  test("row kernel is shuffle-free (no Exchange in the plan)") {
    val docs = Seq(1L -> "a b c").toDF("id", "text")
    val plan = docs.select(graft.ops.ApproxDedup.simhashRow(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}

class DataCardSyncSpec extends SparkSpec {
  import graft.ops.Corpus

  test("blind-append fold over batches equals a full dataCard rebuild") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val h0 = docs.where(col("doc_id") % 2 === 0)
    val h1 = docs.where(col("doc_id") % 2 === 1)
    val cards = Corpus.dataCardBatch(h0, "source", "lang", "text", 0L)
      .unionByName(Corpus.dataCardBatch(h1, "source", "lang", "text", 1L))
    val fps = Corpus.dataCardFps(h0, "source", "text")
      .unionByName(Corpus.dataCardFps(h1, "source", "text"))
    val folded = Corpus.dataCardFold(cards, fps, "source")
    val full = Corpus.dataCard(docs, "source", "lang", "text")
    assert(folded.exceptAll(full).isEmpty && full.exceptAll(folded).isEmpty)
  }
}

class ChatOpsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Chat

  private val good =
    """[{"role":"user","content":"hi there"},{"role":"assistant","content":"hello"}]"""
  private val bad =
    """[{"role":"user","content":"q"},{"role":"user","content":"again"},{"role":"assistant","content":"  "}]"""

  test("chatTurns explodes with 1-based indices and token counts") {
    val got = Chat.chatTurns(Seq(1L -> good).toDF("id", "conv"), "id", "conv")
      .as[(Long, Int, String, String, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, 1, "user", "hi there", 2L), (1L, 2, "assistant", "hello", 1L)))
  }

  test("chatValidate flags role violations and empty turns; counts per-role tokens") {
    val got = Chat.chatValidate(
        Seq(1L -> good, 2L -> bad, 3L -> "not json").toDF("id", "conv"),
        "id", "conv")
      .as[(Long, Boolean, Long, Boolean, Boolean, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, true, 2L, true, true, 0L, 0L, 2L, 1L)))
    // bad: user,user adjacent → 1 violation; whitespace-only turn → 1 empty;
    // user tokens 1+1, assistant tokens: trim("  ") splits to 1 empty token
    assert(got(2L) == ((2L, true, 3L, true, true, 1L, 1L, 2L, 1L)))
    assert(got(3L) == ((3L, false, 0L, false, false, 0L, 0L, 0L, 0L)))
  }

  test("chatValidate is a zero-shuffle projection") {
    val plan = Chat.chatValidate(Seq(1L -> good).toDF("id", "conv"), "id", "conv")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}

class VocabCoverageSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Evaluation

  test("coverage at candidate sizes; oversize candidates saturate") {
    // freqs: a:4, b:2, c:1, d:1 → total 8; top-1 = 4, top-2 = 6
    val df = Seq(1L -> "a a a a b b c d").toDF("id", "text")
    val got = Evaluation.vocabCoverage(df, "text", Seq(1, 2, 10))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 8L, 500000L)))
    assert(got(2L) == ((2L, 6L, 8L, 750000L)))
    assert(got(10L) == ((10L, 8L, 8L, 1000000L)))
  }
}

class ChatRenderPrefSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Chat

  test("chatRender produces role-tagged blocks and token counts") {
    val conv = """[{"role":"user","content":"hi there"},{"role":"assistant","content":"hello"}]"""
    val got = Chat.chatRender(Seq(1L -> conv).toDF("id", "conv"), "id", "conv")
      .as[(Long, String, Long)].head()
    assert(got._2 == "<|user|>\nhi there\n<|assistant|>\nhello")
    // tokens: <|user|> hi there <|assistant|> hello
    assert(got._3 == 5L)
  }

  test("preferenceChecks flags degenerate pairs, length bias, prompt dups") {
    val pairs = Seq(
      (1L, "p one", "good answer here", "bad"),
      (2L, "p one", "same", "same"),
      (3L, "p two", "a b", "c d e f")
    ).toDF("id", "prompt", "chosen", "rejected")
    val got = Chat.preferenceChecks(pairs, "id", "prompt", "chosen", "rejected")
      .as[(Long, Long, Long, Boolean, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 1L, false, 3000000L, 2L)))
    assert(got(2L) == ((2L, 1L, 1L, true, 1000000L, 2L)))
    assert(got(3L) == ((3L, 2L, 4L, false, 500000L, 1L)))
  }
}

class SqlSurfaceRound12Spec extends SparkSpec {
  import spark.implicits._

  test("new kernels are SQL-callable through the registry") {
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, "a b", "<p>Hi &amp; bye</p>",
        "https://x.com/p?utm_source=a&q=1"))
      .toDF("id", "t", "h", "u").createOrReplaceTempView("r12")
    val got = spark.sql(
      """SELECT graft_simhash(t) AS sig, graft_html_to_text(h) AS txt,
         graft_strip_tracking(u) AS u2, graft_normalize_url(u) AS u3
         FROM r12""").head()
    assert(got.getLong(0) ==
      graft.expressions.SimHashKernel.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b"), 63))
    assert(got.getString(1) == "Hi & bye")
    assert(got.getString(2) == "https://x.com/p?q=1")
    assert(got.getString(3) == "https://x.com/p?utm_source=a&q=1")
  }
}

class BpeStoredApplySpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Corpus

  test("apply-from-stored merges on the same corpus equals the in-process trainer") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(50).cache()
    val merges = Corpus.bpeTrain(docs, "text", nMerges = 4)
      .orderBy(col("step")).select(col("pair")).as[String].collect().toSeq
    val fromStored =
      Corpus.bpeSegmentCountsFromMerges(docs, "doc_id", "text", merges)
    val inProcess = Corpus.bpeSegmentCounts(docs, "doc_id", "text", nMerges = 4)
    assert(fromStored.exceptAll(inProcess).isEmpty &&
      inProcess.exceptAll(fromStored).isEmpty)
  }

  test("unseen words stop merging where no rule applies (BPE OOV)") {
    val train = Seq(1L -> "banana banana banana").toDF("id", "text")
    val merges = Corpus.bpeTrain(train, "text", nMerges = 2)
      .orderBy(col("step")).select(col("pair")).as[String].collect().toSeq
    // merges learned on 'banana' only; 'bandana' shares 'an' but not all
    val apply = Seq(1L -> "banana bandana xyz").toDF("id", "text")
    val got = Corpus.bpeSegmentCountsFromMerges(apply, "id", "text", merges)
      .as[(Long, Long, Long)].head()
    // sanity: 3 words, subwords strictly fewer than characters, more than words
    assert(got._2 == 3L && got._3 > 3L && got._3 < 17L)
  }
}

class StalenessDoubleFireSpec extends SparkSpec {
  import spark.implicits._

  test("indexStaleness reports missing and orphaned ids; clean index is empty") {
    val corpus = Seq(1L, 2L, 3L).toDF("id")
    val index  = Seq(1L, 3L, 9L).toDF("id")
    val got = graft.ops.Maintenance.indexStaleness(corpus, index, "id")
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "missing"), (9L, "orphaned")))
    assert(graft.ops.Maintenance.indexStaleness(corpus, corpus, "id").count() == 0)
  }

  test("doubleFires flags the SECOND of each close same-key pair only") {
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")
    val ev = Seq(
      (1L, 7L, "click", ts(0)),
      (2L, 7L, "click", ts(2)),   // 2s after #1 → flagged
      (3L, 7L, "click", ts(40)),  // 38s after #2 → fine
      (4L, 7L, "view",  ts(1)),   // different key
      (5L, 8L, "click", ts(3))    // different key
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = graft.ops.Relational.doubleFires(ev,
        Seq("user_id", "event_type"), "ts", "event_id", toleranceUs = 5000000L)
      .select("event_id", "gap_us").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((2L, 2000000L)))
  }
}

class GroupPercentilesSpec extends SparkSpec {
  import spark.implicits._

  test("exact interpolated percentiles per group") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 10.0))
      .toDF("g", "v")
    val got = graft.ops.Maintenance.groupPercentiles(df, "g", "v", Seq(0.5))
      .as[(String, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 4L, 1.0, 4.0, 2.5))) // p50 of 1..4 = 2.5
    assert(got("b") == (("b", 1L, 10.0, 10.0, 10.0)))
  }
}

class CorrelationGiniSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Evaluation

  test("perfect linear signals give r = 1; anti-correlated give r = -1") {
    val df = Seq((1L, 2L, 9L), (2L, 4L, 8L), (3L, 6L, 7L))
      .toDF("a", "b", "c")
    val got = Evaluation.signalCorrelation(df, Seq("a", "b", "c"))
      .as[(String, String, Option[Long])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", "b")).contains(1000000L))
    assert(got(("a", "c")).contains(-1000000L))
  }

  test("constant signal yields null correlation") {
    val df = Seq((1L, 5L), (2L, 5L)).toDF("a", "b")
    val got = Evaluation.signalCorrelation(df, Seq("a", "b"))
      .as[(String, String, Option[Long])].head()
    assert(got._3.isEmpty)
  }

  test("gini: balanced groups score 0, concentrated groups score high") {
    val balanced = Seq("a", "a", "b", "b", "c", "c").toDF("g")
    val gotB = Evaluation.sourceGini(balanced, "g")
      .as[(Long, Long, Long)].head()
    assert(gotB == ((3L, 6L, 0L)))
    // one group holds 8 of 10 rows: G = (2*1*1 + 2*2*1 + 2*3*8 - 4*10) / (3*10)
    val skewed = (Seq.fill(8)("big") ++ Seq("s1", "s2")).toDF("g")
    val gotS = Evaluation.sourceGini(skewed, "g")
      .as[(Long, Long, Long)].head()
    assert(gotS == ((3L, 10L, (14L * 1000000L) / 30L)))
  }
}

/** Storage-layout health: `create()` with clustering writes ONE parquet
  * file per chunk directory (the claim behind "probe reads ≤ k dirs" —
  * a dir holding (tasks × buckets) shards would still prune but pay a
  * per-file open cost the layout is supposed to avoid). */
class ChunkClusteringSpec extends SparkSpec {
  import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
  import graft.sync.SyncEngine

  test("clustered create leaves exactly one data file per chunk dir") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_onefile").toString
    val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("ann", "onefile"),
      columns = ColumnRoles(Map("datetime" -> "bucket", "id" -> "doc_id")),
      epochUnit = Some("minute"), chunkMinutes = 1)
    eng.storage(spec).create(
      graft.ops.ApproxDedup.simhashBands(docs, "doc_id", "text", buckets = 8))
    import scala.jdk.CollectionConverters._
    val chunkDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("__graft_chunk="))
      .toSeq
    assert(chunkDirs.nonEmpty)
    chunkDirs.foreach { d =>
      val files = java.nio.file.Files.list(d).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
      assert(files.size == 1,
        s"${d.getFileName} holds ${files.size} parquet files, expected 1")
    }
  }
}
