package graft

import org.apache.spark.sql.functions._

import graft.ops.{Cleaning, Corpus, Sampling}

/** Round-11 cleaning / reporting operators: C4 line gates, per-source
  * boilerplate, eval-side contamination, tokenizer fertility, UniMax. */
class C4LineCleanSpec extends SparkSpec {
  import spark.implicits._

  private def clean(texts: (Long, String)*) =
    Cleaning.c4LineClean(texts.toDF("id", "text"), "id", "text",
        minWords = 3, minLines = 2)
      .as[(Long, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap

  test("line gates: terminal punctuation, min words, javascript token") {
    val got = clean(
      1L -> "one good line stays.\nno punct here\nshort.\nenable javascript to view.\nsecond good line stays!")
    val (_, text, nLines, nKept, keep) = got(1L)
    assert(text == "one good line stays.\nsecond good line stays!")
    assert(nLines == 5L && nKept == 2L && keep)
  }

  test("quote and question terminals pass; trailing spaces are trimmed") {
    val got = clean(1L -> "is this a question?  \nhe said \"stop right there\"\nplain words end")
    // line 2 ends with a quote AFTER trim; line 3 has no terminal
    assert(got(1L)._4 == 2L)
  }

  test("page gates: brace and lorem ipsum kill the page but keep the text") {
    val got = clean(
      1L -> "a fine first sentence.\nanother fine sentence.\nvar x = { }",
      2L -> "a fine first sentence.\nLorem IPSUM is filler text.\nanother fine sentence.",
      3L -> "a fine first sentence.\nanother fine sentence.")
    assert(!got(1L)._5 && got(1L)._4 == 2L) // brace page: lines survive, keep=false
    assert(!got(2L)._5)                     // lorem (case-insensitive)
    assert(got(3L)._5)
  }

  test("minLines: a page with one surviving line is dropped") {
    val got = clean(1L -> "only one good line here.\nnope")
    assert(got(1L)._4 == 1L && !got(1L)._5)
  }
}

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // src a: banner on all 3 docs; "half line" on 2 of 3; unique text each.
  // src b: banner on 1 of 2 docs only.
  private val docs = Seq(
    (1L, "a", "unique one\nshared banner line\nhalf line appears"),
    (2L, "a", "unique two\nshared banner line\nhalf line appears"),
    (3L, "a", "unique three\nshared banner line"),
    (4L, "b", "unique four\nshared banner line"),
    (5L, "b", "unique five")).toDF("id", "source", "text")

  test("detection: prevalence is per-source and integer-exact") {
    val got = Cleaning.boilerplateLines(docs, "id", "text", "source",
        minFrac = 0.6, minDocs = 2L, minLineLen = 5)
      .select("source", "line", "df", "n_docs")
      .as[(String, String, Long, Long)].collect().toSet
    // src a: banner 3/3 flagged, half line 2/3 ≈ 0.667 ≥ 0.6 flagged;
    // src b: banner 1/2 fails minDocs=2 AND 0.5 < 0.6
    assert(got == Set(("a", "shared banner line", 3L, 3L),
                      ("a", "half line appears", 2L, 3L)))
  }

  test("a doc repeating its own line counts once (distinct per doc)") {
    val rep = Seq((1L, "a", "dup\ndup\nxxxx"), (2L, "a", "dup\nyyyy"))
      .toDF("id", "source", "text")
    val got = Cleaning.boilerplateLines(rep, "id", "text", "source",
        minFrac = 0.9, minDocs = 2L, minLineLen = 3)
      .select("line", "df").as[(String, Long)].collect().toSet
    assert(got == Set(("dup", 2L)))
  }

  test("removal: flagged lines vanish, order is preserved, short exempt") {
    val got = Cleaning.removeBoilerplate(docs, "id", "text", "source",
        minFrac = 0.6, minDocs = 2L, minLineLen = 5)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == "unique one" && got(1L)._4 == 2L)
    assert(got(3L)._2 == "unique three" && got(3L)._4 == 1L)
    assert(got(4L)._2 == "unique four\nshared banner line" && got(4L)._4 == 0L)
    assert(got(5L)._2 == "unique five" && got(5L)._4 == 0L)
  }

  test("removal: a doc that was ALL boilerplate survives with empty text") {
    val all = Seq((1L, "a", "only banner"), (2L, "a", "only banner"))
      .toDF("id", "source", "text")
    val got = Cleaning.removeBoilerplate(all, "id", "text", "source",
        minFrac = 0.5, minDocs = 2L, minLineLen = 5)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == "" && got(1L)._3 == 0L && got(1L)._4 == 1L)
  }
}

class ContaminationReportSpec extends SparkSpec {
  import spark.implicits._

  test("per-item distinct-shingle dirt fraction; corpus repeats count once") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),        // grams: abg, bgd
      (2L, "alpha beta gamma echo"),         // abg again (dup across docs)
      (3L, "zeta eta theta iota")).toDF("id", "text")
    val bench = Seq(
      (10L, "alpha beta gamma delta epsilon"), // 3 grams, 2 found
      (11L, "foo bar baz qux")).toDF("id", "text") // 2 grams, 0 found
    val got = Corpus.contaminationReport(corpus, bench, "id", "text",
        shingleSize = 3, threshold = 0.5)
      .select("bench_id", "n_shingles", "n_found", "dirty")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(10L) == ((10L, 3L, 2L, true)))
    assert(got(11L) == ((11L, 2L, 0L, false)))
  }

  test("bench item shorter than the shingle size yields no row") {
    val corpus = Seq((1L, "a b c d")).toDF("id", "text")
    val bench = Seq((10L, "a b")).toDF("id", "text")
    val got = Corpus.contaminationReport(corpus, bench, "id", "text", 3, 0.5)
    assert(got.count() == 0L)
  }
}

class FertilityReportSpec extends SparkSpec {
  import spark.implicits._

  test("fertility in micro-units, grouped; merges reduce subword counts") {
    // With 0 effective merges impossible (nMerges >= 1); after 1 merge the
    // best pair collapses. Corpus: "abab abab" x2 in group g1, "cd" in g2.
    val docs = Seq(("g1", "abab abab"), ("g1", "abab"), ("g2", "cd cd cd"))
      .toDF("grp", "text")
    val got = Corpus.fertilityReport(docs, "text", "grp", nMerges = 1)
      .select("grp", "n_words", "n_subwords", "n_chars", "fertility_micro")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // best pair over vocab {abab:3, cd:3}: pairs 'a b'(x2/word·3), 'b a'(3),
    // 'c d'(3) → 'a b' wins (freq 6) → abab = [ab,ab] (2 subwords), cd = [c,d]
    assert(got("g1") == (("g1", 3L, 6L, 12L, 2000000L)))
    assert(got("g2") == (("g2", 3L, 6L, 6L, 2000000L)))
  }
}

class UnimaxSpec extends SparkSpec {
  import spark.implicits._

  private def alloc(budget: Long, cap: Int, supplies: (String, Long)*) =
    Sampling.unimaxAllocation(
        supplies.toDF("lang", "n"), "lang", col("n"), budget, cap)
      .select("lang", "capped", "alloc_tokens", "epochs_micro")
      .as[(String, Boolean, Long, Long)].collect().map(r => r._1 -> r).toMap

  test("sequential UniMax semantics: capped prefix, equal share after") {
    // supplies asc: a=100, b=200, c=1000; budget 1000, cap 2
    // a: min(200, 1000/3=333) -> capped 200; b: min(400, 800/2=400) -> 400
    // (exactly at the boundary counts as capped); c: 400 remaining
    val got = alloc(1000L, 2, "a" -> 100L, "b" -> 200L, "c" -> 1000L)
    assert(got("a") == (("a", true, 200L, 2000000L)))
    assert(got("b") == (("b", true, 400L, 2000000L)))
    assert(got("c") == (("c", false, 400L, 400000L)))
  }

  test("budget below every cap: nobody capped, equal integer shares") {
    val got = alloc(100L, 1, "a" -> 1000L, "b" -> 2000L, "c" -> 4000L)
    assert(got.values.forall(!_._2))
    assert(got.values.map(_._3).toSeq.sorted == Seq(33L, 33L, 33L))
  }

  test("budget above total capped mass: everyone capped at the epoch cap") {
    val got = alloc(10000L, 2, "a" -> 100L, "b" -> 200L)
    assert(got("a") == (("a", true, 200L, 2000000L)))
    assert(got("b") == (("b", true, 400L, 2000000L)))
  }

  test("one language takes the whole budget under its cap") {
    val got = alloc(500L, 3, "only" -> 1000L)
    assert(got("only") == (("only", false, 500L, 500000L)))
  }
}

class TemperatureMixtureSpec extends SparkSpec {
  import spark.implicits._

  test("alpha=1 is proportional; integer share math sums under budget") {
    val docs = Seq(("a", 100L), ("b", 300L)).toDF("lang", "n")
    val got = Sampling.temperatureMixture(docs, "lang", col("n"), 1000L, 1.0)
      .select("lang", "weight_micro", "target_tokens")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // weights rel to max: a=1/3 → 333333, b=1e6
    assert(got("a") == (("a", 333333L, 1000L * 333333L / 1333333L)))
    assert(got("b") == (("b", 1000000L, 1000L * 1000000L / 1333333L)))
  }

  test("small alpha flattens the head toward uniform") {
    val docs = Seq(("a", 100L), ("b", 10000L)).toDF("lang", "n")
    def share(alpha: Double) = {
      val m = Sampling.temperatureMixture(docs, "lang", col("n"), 1000L, alpha)
        .select("lang", "target_tokens").as[(String, Long)].collect().toMap
      m("a").toDouble / (m("a") + m("b"))
    }
    assert(share(0.2) > share(0.7) && share(0.7) > 0.0)
  }
}

class CurriculumInterleaveSpec extends SparkSpec {
  import spark.implicits._

  test("round-robin by rank: round r takes each domain's r-th best") {
    val docs = Seq(
      (1L, "a", 50L), (2L, "a", 90L), (3L, "b", 10L), (4L, "b", 70L),
      (5L, "b", 30L)).toDF("id", "dom", "score")
    val got = Sampling.curriculumInterleave(docs, "id", "dom", col("score"))
      .select("id", "round", "domain_idx", "global_pos")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // a: 2 (90) rank1, 1 (50) rank2; b: 4 (70) rank1, 5 (30) rank2, 3 rank3
    assert(got(2L) == ((2L, 1L, 1L, 1L)) && got(4L) == ((4L, 1L, 2L, 2L)))
    assert(got(1L) == ((1L, 2L, 1L, 3L)) && got(5L) == ((5L, 2L, 2L, 4L)))
    assert(got(3L) == ((3L, 3L, 2L, 6L))) // gap at pos 5: domain a exhausted
  }

  test("score ties break by id — deterministic across runs") {
    val docs = Seq((7L, "a", 5L), (3L, "a", 5L)).toDF("id", "dom", "score")
    val got = Sampling.curriculumInterleave(docs, "id", "dom", col("score"))
      .select("id", "round").as[(Long, Long)].collect().toMap
    assert(got(3L) == 1L && got(7L) == 2L)
  }
}

class PiiReportSpec extends SparkSpec {
  import spark.implicits._

  test("per-source doc and span counts; clean sources report zeros") {
    val docs = Seq(
      ("a", "mail me at x@y.org or z@w.io thanks"),
      ("a", "call +1 555-0100 now"),
      ("a", "nothing here"),
      ("b", "clean text")).toDF("source", "text")
    val got = graft.ops.Cleaning.piiReport(docs, "source", "text")
      .select("source", "n_docs", "docs_with_email", "docs_with_phone",
        "n_emails", "n_phones")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 3L, 1L, 1L, 2L, 1L)))
    assert(got("b") == (("b", 1L, 0L, 0L, 0L, 0L)))
  }
}

class BoilerplateIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a", "unique one\nshared banner line"),
    (2L, "a", "unique two\nshared banner line"),
    (3L, "a", "unique three\nshared banner line"),
    (4L, "b", "unique four\nother chrome line"),
    (5L, "b", "unique five\nother chrome line")).toDF("id", "source", "text")

  test("blind-append fold over batches equals a full rebuild") {
    val h0 = docs.where(col("id") % 2 === 0)
    val h1 = docs.where(col("id") % 2 === 1)
    def counts(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Cleaning.boilerplateCounts(df, "id", "text", "source",
        minLineLen = 5, buckets = 4)
    val stored = counts(h0).unionByName(counts(h1))
    val storedN = graft.ops.Cleaning.sourceDocCounts(h0, "source", 0L)
      .unionByName(graft.ops.Cleaning.sourceDocCounts(h1, "source", 1L))
    val folded = graft.ops.Cleaning.boilerplateFold(stored, storedN,
        "source", minFrac = 0.6, minDocs = 2L)
      .select("source", "line", "df", "n_docs")
      .as[(String, String, Long, Long)].collect().toSet
    val rebuilt = graft.ops.Cleaning.boilerplateLines(docs, "id", "text",
        "source", minFrac = 0.6, minDocs = 2L, minLineLen = 5)
      .select("source", "line", "df", "n_docs")
      .as[(String, String, Long, Long)].collect().toSet
    assert(folded == rebuilt && folded.nonEmpty)
    assert(folded == Set(("a", "shared banner line", 3L, 3L),
                         ("b", "other chrome line", 2L, 2L)))
  }
}
