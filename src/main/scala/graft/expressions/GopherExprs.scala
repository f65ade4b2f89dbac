package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Call target for [[GopherSignals]]'s generated code — shared with
  * interpreted eval so the two paths cannot drift.
  *
  * Computes the NINE integer counters behind the Gopher structural quality
  * signals in ONE pass over the document, reproducing the composed Catalyst
  * form's exact semantics (the DuckDB oracle replays those, so every quirk
  * is part of the contract):
  *
  *   0. n_words        — `size(split(trim(text), "\s+"))`: SQL trim strips
  *                       0x20 only; split keeps leading/trailing empties
  *                       (limit −1), so "" tokenizes to ONE empty token
  *   1. sum_word_len   — Σ length(w) in CODEPOINTS (Spark `length`)
  *   2. n_hash         — '#' characters in the trimmed text
  *   3. ellipsis_delta — length(txt) − length(regexp_replace(txt,
  *                       "\.\.\.", "")): 3 × non-overlapping left-to-right
  *                       "..." matches
  *   4. n_lines        — `size(split(text, "\n"))` over the UNtrimmed
  *                       text, trailing empty line kept
  *   5. n_bullet_lines — lines whose space-trimmed form starts with '-'/'*'
  *   6. n_ellipsis_ln  — lines whose space-trimmed form ends with "..."
  *   7. n_alpha_words  — tokens containing at least one [A-Za-z]
  *   8. n_stopwords    — DISTINCT lowercased tokens ∈ the stopword list
  *
  * The composed form pays interpreted lambda dispatch for every
  * (token|line) × signal pair — `transform`/`filter`/`aggregate` lambdas
  * evaluate outside whole-stage codegen — so a 500-token document costs
  * thousands of boxed calls per row; this kernel is one static call. */
object GopherKernel {

  private val Ws = Pattern.compile("\\s+")

  /** SQL trim semantics: strip 0x20 from both ends ONLY (Java's
    * String.trim would also strip \t\n etc. — different answers on
    * newline-padded text). */
  private def spaceTrim(s: String): String = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s.substring(lo, hi)
  }

  def compute(text: UTF8String, stopwords: Array[String]): GenericArrayData = {
    val raw = text.toString
    val txt = spaceTrim(raw)

    // tokens: split(-1) keeps boundary empties, matching Spark's StringSplit
    val toks = Ws.split(txt, -1)
    var nWords = 0L
    var sumLen = 0L
    var nAlpha = 0L
    val stopSet = new java.util.HashSet[String]()
    var si = 0
    while (si < stopwords.length) { stopSet.add(stopwords(si)); si += 1 }
    val seenStops = new java.util.HashSet[String]()
    var ti = 0
    while (ti < toks.length) {
      val w = toks(ti)
      nWords += 1
      sumLen += w.codePointCount(0, w.length)
      var ci = 0
      var alpha = false
      while (!alpha && ci < w.length) {
        val c = w.charAt(ci)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha = true
        ci += 1
      }
      if (alpha) nAlpha += 1
      val lw = w.toLowerCase(java.util.Locale.ROOT)
      if (stopSet.contains(lw)) { seenStops.add(lw); () }
      ti += 1
    }

    // '#' count and non-overlapping "..." matches over the trimmed text
    var nHash = 0L
    var nEllipsis = 0L
    var i = 0
    val tl = txt.length
    while (i < tl) {
      val c = txt.charAt(i)
      if (c == '#') { nHash += 1; i += 1 }
      else if (c == '.' && i + 2 < tl &&
               txt.charAt(i + 1) == '.' && txt.charAt(i + 2) == '.') {
        nEllipsis += 1; i += 3
      } else i += 1
    }

    // lines over the UNtrimmed text: manual split keeps the trailing empty
    var nLines = 0L
    var nBullet = 0L
    var nEllLines = 0L
    var start = 0
    var done = false
    while (!done) {
      val nl = raw.indexOf('\n', start)
      val end = if (nl < 0) raw.length else nl
      val line = spaceTrim(raw.substring(start, end))
      nLines += 1
      if (line.nonEmpty && (line.charAt(0) == '-' || line.charAt(0) == '*'))
        nBullet += 1
      if (line.endsWith("...")) nEllLines += 1
      if (nl < 0) done = true else start = nl + 1
    }

    new GenericArrayData(Array[Long](
      nWords, sumLen, nHash, 3L * nEllipsis, nLines, nBullet, nEllLines,
      nAlpha, seenStops.size.toLong))
  }
}

/** The nine Gopher structural counters as ONE generated pass (array<long>);
  * ratios and the keep decision derive with cheap arithmetic columns —
  * see [[graft.ops.Corpus.gopherQualityFilter]]. */
case class GopherSignals(child: Expression, stopwords: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gopher_signals expects a string, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any =
    GopherKernel.compute(v.asInstanceOf[UTF8String], stopwords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopwords, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.GopherKernel.compute($v, $stopsRef);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
