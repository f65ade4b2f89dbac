package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[HllRegRanks]] — also the generated code's call
  * target, so eval and codegen cannot drift.
  *
  * The composed relational form (wordShingles → explode → md5 → conv →
  * substring → rank CASE ladder → groupBy max) pays an interpreted
  * `transform` lambda per shingle plus hex-string materialization and
  * decimal `conv` parsing of md5's OUTPUT STRING — all off the codegen
  * path. Here one generated pass walks the token array, md5s each shingle
  * once (raw digest bytes, no hex string), extracts register and rank
  * directly from the nibbles, and keeps the per-document max rank per
  * register in a 2^p byte table — so a 500-shingle document emits at most
  * min(500, 2^p) packed rows instead of 500, shrinking both the explode
  * and the shuffle that follows. Register/rank are EXACTLY the oracle's:
  * register = first p/4 hex nibbles of md5, rank = leading-zero ladder of
  * the next 15 nibbles (60 bits), capped. */
object HllKernel {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Packed (register << 6 | rank) per register hit by this document's
    * word n-gram shingles, max rank per register. Token semantics match
    * `TextFns.wordShingles`: fewer than n tokens → no shingles; shingles
    * join with a single space. */
  def regRanks(tokens: ArrayData, n: Int, p: Int, rankCap: Int): ArrayData = {
    val m = 1 << p
    val hx = p / 4
    val best = new Array[Byte](m) // 0 = register unseen (ranks are ≥ 1)
    val nTok = tokens.numElements()
    val space = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](n)
    val md = md5Local.get()
    var hit = 0
    var i = 0
    while (i <= nTok - n) {
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      val s = if (n == 1) parts(0) else UTF8String.concatWs(space, parts: _*)
      md.reset()
      val d = md.digest(s.getBytes)
      // register = first hx nibbles of the digest (hex chars 1..hx)
      var reg = 0
      var k = 0
      while (k < hx) {
        val b = d(k >> 1) & 0xff
        reg = (reg << 4) | (if ((k & 1) == 0) b >>> 4 else b & 0xf)
        k += 1
      }
      // rank material = the NEXT 15 nibbles as a 60-bit long
      var w = 0L
      k = hx
      while (k < hx + 15) {
        val b = d(k >> 1) & 0xff
        w = (w << 4) | (if ((k & 1) == 0) (b >>> 4).toLong else (b & 0xf).toLong)
        k += 1
      }
      // ladder: smallest k with w >= 2^(60-k)  ⇔  nlz(w) - 3 (w < 2^60)
      val rank =
        if (w == 0L) rankCap
        else math.min(rankCap, java.lang.Long.numberOfLeadingZeros(w) - 3)
      if (rank > best(reg)) {
        if (best(reg) == 0) hit += 1
        best(reg) = rank.toByte
      }
      i += 1
    }
    val out = new Array[Long](hit)
    var r = 0
    var o = 0
    while (r < m) {
      if (best(r) != 0) { out(o) = (r.toLong << 6) | best(r).toLong; o += 1 }
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document HLL register/rank extraction as ONE generated pass over
  * the token array — parity unit-asserted against the composed
  * `shingleValues → hllRegisters` relational form and replayed by the
  * same ANSI SQL oracle. */
case class HllRegRanks(child: Expression, shingleSize: Int, p: Int,
                       rankCap: Int) extends UnaryExpression {
  require(p % 4 == 0 && p >= 4 && p <= 16, "p must be a multiple of 4 in [4,16]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() = {
    if (child.dataType == ArrayType(StringType) ||
        child.dataType == ArrayType(StringType, containsNull = false))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hllRegRanks expects array<string> tokens, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any =
    HllKernel.regRanks(v.asInstanceOf[ArrayData], shingleSize, p, rankCap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.HllKernel.regRanks($v, $shingleSize, $p, $rankCap);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
