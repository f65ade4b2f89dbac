package graft

import org.apache.spark.sql.functions._

import graft.expressions.AcAutomaton
import graft.ops.Corpus

/** Aho–Corasick kernel + ops coverage: textbook every-end-position
  * semantics (overlaps, nesting), deterministic ids, brute-force parity
  * at a pattern count where the naive scan is already absurd, and the
  * DataFrame gates. */
class AcSpec extends SparkSpec {
  import spark.implicits._

  private def counts(patterns: Seq[String], text: String): Map[String, Long] = {
    val ac = AcAutomaton.build(patterns)
    ac.matchCounts(text).map { case (pid, c) => ac.patterns(pid) -> c }.toMap
  }

  test("overlapping and nested occurrences count at every end position") {
    assert(counts(Seq("aa"), "aaaa") == Map("aa" -> 3L))
    assert(counts(Seq("a", "aa", "aaa"), "aaa") ==
      Map("a" -> 3L, "aa" -> 2L, "aaa" -> 1L))
    // nested suffix patterns all fire inside one occurrence of the longest
    assert(counts(Seq("scan", "can", "an"), "scan the scanner") ==
      Map("scan" -> 2L, "can" -> 2L, "an" -> 2L))
    // pattern found only via a failure-link transition mid-match
    assert(counts(Seq("ab", "bc"), "abc") == Map("ab" -> 1L, "bc" -> 1L))
    assert(counts(Seq("his", "she", "hers"), "ushers") ==
      Map("she" -> 1L, "his" -> 0L, "hers" -> 1L).filter(_._2 > 0))
  }

  test("no hits, empty text, duplicate patterns") {
    assert(counts(Seq("zz"), "abc").isEmpty)
    assert(counts(Seq("zz"), "").isEmpty)
    assert(counts(Seq("ab", "ab"), "abab") == Map("ab" -> 2L))
    intercept[IllegalArgumentException](AcAutomaton.build(Seq("a", "")))
    intercept[IllegalArgumentException](AcAutomaton.build(Nil))
  }

  test("brute-force parity on 5k random patterns over random text") {
    val rng = new scala.util.Random(7L)
    def randStr(n: Int) = Seq.fill(n)(('a' + rng.nextInt(3)).toChar).mkString
    val patterns = Seq.fill(5000)(randStr(1 + rng.nextInt(6))).distinct
    val text = randStr(2000)
    val ac = AcAutomaton.build(patterns)
    val got = ac.matchCounts(text).map { case (p, c) => ac.patterns(p) -> c }.toMap
    val expected = patterns.map { p =>
      p -> (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong
    }.filter(_._2 > 0).toMap
    assert(got == expected)
  }

  test("prefix walk matches nested prefixes, never mid-string occurrences") {
    val ac = AcAutomaton.build(Seq("ab", "abc", "bc", "zz"))
    def names(t: String) = ac.prefixMatches(t).map(ac.patterns(_)).toSeq
    assert(names("abcd") == Seq("ab", "abc")) // "bc" occurs mid-string: NOT a prefix
    assert(names("ab") == Seq("ab"))
    assert(names("a") == Seq())
    assert(names("") == Seq())
    assert(names("bcde") == Seq("bc"))
  }

  test("prefixBlocklist blocks on any deny-prefix, reports matches in order") {
    val rows = Seq((1L, "https://bad.example/x"), (2L, "https://ok.example"),
      (3L, "HTTPS://BAD.example"))
      .toDF("doc_id", "url")
    val out = Corpus.prefixBlocklist(rows, "doc_id", "url",
        Seq("https://bad", "https://bad.example", "https://worse"))
      .as[(Long, Long, String, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out(1L) == ((2L, "https://bad,https://bad.example", false)))
    assert(out(2L) == ((0L, "", true)))
    assert(out(3L)._1 == 2L) // case-folded
  }

  test("acBlocklistFilter keeps zero-hit docs and thresholds totals") {
    val docs = Seq((1L, "Scan the table"), (2L, "nothing here"), (3L, "a b a b"))
      .toDF("doc_id", "text")
    val out = Corpus.acBlocklistFilter(docs, "doc_id", "text",
        Seq("scan", "can", "a b"), maxHits = 2L)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // doc 1: "scan" 1 + "can" 1 = 2 hits, 2 patterns (case-folded), keep
    // doc 3: "a b" at positions 0 and 4 -> wait: "a b a b" has "a b" twice
    assert(out(1L) == ((2L, 2L, true)))
    assert(out(2L) == ((0L, 0L, true)))
    assert(out(3L) == ((2L, 1L, true)))
  }

  test("acPatternStats reports only firing patterns") {
    val docs = Seq((1L, "scan scan"), (2L, "scan")).toDF("doc_id", "text")
    val out = Corpus.acPatternStats(docs, "doc_id", "text", Seq("scan", "zz"))
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("scan", 2L, 3L)))
  }
}
