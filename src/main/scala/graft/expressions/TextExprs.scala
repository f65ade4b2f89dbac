package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[MinHashSignature]] — also the generated code's call
  * target, so eval and codegen cannot drift. */
object MinHashKernel {
  val P = 2147483647L // Mersenne 2^31-1, see ApproxDedup

  // md5 base-hash mode allocates no MessageDigest per shingle
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5 as a 60-bit long — numerically identical to
    * `conv(substring(md5(s),1,15),16,10)` (Spark) and
    * `CAST('0x'||substring(md5(s),1,15) AS BIGINT)` (DuckDB), the repo's
    * oracle-replayable hash convention. */
  private def md5Hash60(s: UTF8String): Long = {
    val md = md5Local.get(); md.reset()
    val d = md.digest(s.getBytes)
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (d(i) & 0xffL); i += 1 }
    top >>> 4 // 16 nibbles → the first 15
  }

  /** Shingle + hash + k-way min in ONE pass over the token array.
    * Shingle strings join with a single space (`UTF8String.concatWs`, the
    * same kernel `concat_ws(" ", ...)` lowers to) and hash with Spark's
    * xxhash64 seed 42, so signatures are bit-identical to the composed
    * `wordShingles → xxhash64 → pmod → array_min` column form. With
    * `md5Base` the base hash is [[md5Hash60]] instead — slower per shingle
    * but reproducible by an ANSI SQL oracle; identical plan shape. Fewer
    * than `shingleSize` tokens → zero shingles → all-MaxValue signature,
    * the `coalesce(array_min(...), MaxValue)` convention. */
  def compute(tokens: ArrayData, shingleSize: Int,
              as: Array[Long], bs: Array[Long], md5Base: Boolean): ArrayData = {
    val k = as.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val nTok = tokens.numElements()
    val space = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](shingleSize)
    var i = 0
    while (i <= nTok - shingleSize) {
      var j = 0
      while (j < shingleSize) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      val s = if (shingleSize == 1) parts(0) else UTF8String.concatWs(space, parts: _*)
      val base = if (md5Base) md5Hash60(s)
                 else XxHash64Function.hash(s, StringType, 42L)
      val h = Math.floorMod(base, P)
      var c = 0
      while (c < k) {
        val v = Math.floorMod(h * as(c) + bs(c), P)
        if (v < sig(c)) sig(c) = v
        c += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** k-permutation MinHash signature over word shingles, computed from the
  * TOKEN array in one generated pass. The composed Catalyst form pays
  * interpreted lambda dispatch for every (shingle × hash-function) pair —
  * `transform`/`aggregate` sit outside whole-stage codegen — so a k=24
  * signature over a 500-token document costs ~12k boxed calls per row.
  * Here codegen emits a single static call into [[MinHashKernel]]. */
case class MinHashSignature(child: Expression, shingleSize: Int,
                            as: Array[Long], bs: Array[Long],
                            md5Base: Boolean = false)
    extends UnaryExpression {
  require(as.length == bs.length, "coefficient arrays must align")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() = {
    if (child.dataType == ArrayType(StringType) ||
        child.dataType == ArrayType(StringType, containsNull = false))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash expects array<string> tokens, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any =
    MinHashKernel.compute(v.asInstanceOf[ArrayData], shingleSize, as, bs, md5Base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.MinHashKernel.compute($v, $shingleSize, $asRef, $bsRef, $md5Base);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Call target for [[UnicodeNormalize]]'s generated code — shared with
  * interpreted eval so the two paths cannot drift. Already-normalized
  * strings (the overwhelmingly common case for web text) return the input
  * UTF8String without materializing a java.lang.String copy. */
object UnicodeNormalizeKernel {
  def compute(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

/** Call target for [[CharEntropyMicro]]'s generated code — shared with
  * interpreted eval so the two paths cannot drift.
  *
  * Returns the Shannon character entropy in integer MICRO-NATS: each
  * distinct codepoint's term `(n/t)·ln(t/n)` is quantized to
  * `round(term · 1e6)` BEFORE the sum, so the total is a sum of longs —
  * order-independent (HashMap iteration order cannot perturb a long sum)
  * and bit-replayable by an ANSI SQL oracle that groups per character and
  * sums the same quantized terms. Micro-nat resolution (≤ 0.5e-6 per
  * distinct char) is far below any filtering threshold's sensitivity. */
object CharEntropyKernel {
  def computeMicro(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0L
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var i = 0
    var total = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
      total += 1
    }
    val t = total.toDouble
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      sum += Math.round((c / t) * Math.log(t / c) * 1e6)
    }
    sum
  }
}

/** Shannon character entropy (micro-nats) as ONE generated pass over the
  * string — the gibberish/boilerplate detector of quality pipelines (near-0
  * entropy = one repeated character, ~ln(alphabet) = typical prose; binary
  * spill and base64 blobs sit far above prose for their length). The
  * relational form (explode per CHARACTER → two aggregates) multiplies the
  * corpus row count by its character count before shuffling; here the scan
  * stays a projection with a per-row hashmap bounded by the alphabet.
  * Quantization contract in [[CharEntropyKernel]]. */
case class CharEntropyMicro(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects a string, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any =
    CharEntropyKernel.computeMicro(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.CharEntropyKernel.computeMicro($v);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native expression — the
  * canonical first step of text curation (dedup fingerprints, shingles, and
  * tokenizers all assume one byte form per visually-identical string; UTR
  * #15 normalization is how "é" composed and "e"+U+0301 decomposed become
  * the same document). Spark has no built-in; a generated static call keeps
  * the scan inside whole-stage codegen where a Scala UDF would box. */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {
  @transient private lazy val form = java.text.Normalizer.Form.valueOf(formName)
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects a string, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any =
    UnicodeNormalizeKernel.compute(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", form, "java.text.Normalizer$Form")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.UnicodeNormalizeKernel.compute($v, $formRef);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Call target for [[SimHashRow]]'s generated code — shared with
  * interpreted eval so the two paths cannot drift.
  *
  * Computes the Charikar simhash over whitespace tokens of the lowercased,
  * trimmed text: bit j of the signature carries the sign of the sum over
  * tokens of (±1 by hex nibble j/4, bit j%4 of the token's md5) — the
  * EXACT formula of the relational kernel and the SQL oracle
  * (`ApproxDedup.simhashOracleSql`), evaluated in one primitive-array pass
  * per row: no explode, no 63 interpreted higher-order folds, no shuffle.
  * Tokenization mirrors `split(trim(lower(text)), "\s+")` including the
  * single-empty-token result on blank text. */
object SimHashKernel {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String, bits: Int): Long = {
    val toks = s.toLowerCase.trim().toString.split("\\s+", -1)
    val md = md5Local.get()
    val sums = new Array[Int](bits)
    var ti = 0
    while (ti < toks.length) {
      md.reset()
      val dig = md.digest(UTF8String.fromString(toks(ti)).getBytes)
      var j = 0
      while (j < bits) {
        val k = j >> 2 // hex-digit index of the digest, high nibble first
        val b = dig(k >> 1) & 0xff
        val nib = if ((k & 1) == 0) b >>> 4 else b & 0xf
        sums(j) += (if ((nib & (1 << (j & 3))) != 0) 1 else -1)
        j += 1
      }
      ti += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Per-row simhash signature as ONE generated pass — the ingest-time
  * stamping kernel: zero shuffle (legal in streaming projections), bit-
  * identical to the explode+groupBy relational form (parity unit-asserted)
  * and to the ANSI SQL oracle. */
case class SimHashRow(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash expects a string, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any =
    SimHashKernel.compute(v.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.SimHashKernel.compute($v, $bits);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
