package graft.expressions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[WinnowFingerprints]] — also the generated code's
  * call target, so eval and codegen cannot drift. */
object WinnowKernel {

  /** Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003): hash every
    * code-point k-gram, slide a window of `w` hashes keeping each window's
    * minimum, return the distinct selected hashes.
    *
    * Hash = first 4 md5 bytes of the gram's UTF-8 bytes as an unsigned
    * 32-bit value — bit-identical to the composed column form
    * `conv(substring(md5(gram),1,8),16,10)` and to the ANSI SQL oracle.
    * Code-POINT grams (not UTF-16 units) match Spark/DuckDB `substring`
    * semantics on supplementary characters. The window minimum runs as a
    * monotonic deque: O(n) total, not O(n·w).
    */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s   = text.toString
    val cps = s.codePoints().toArray
    val n   = cps.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val gram = new String(cps, i, k).getBytes(StandardCharsets.UTF_8)
      val d = md.digest(gram)
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (n < w) {
      var j = 0; while (j < n) { out.add(hs(j)); j += 1 }
    } else {
      // monotonic increasing deque of indices into hs
      val dq = new Array[Int](n); var head = 0; var tail = 0
      var j = 0
      while (j < n) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j; tail += 1
        if (dq(head) <= j - w) head += 1
        if (j >= w - 1) out.add(hs(dq(head)))
        j += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }
}

/** Winnowing fingerprint selection as ONE generated pass over the text.
  * The composed column form (charNgrams → md5 per gram → transform/slice/
  * array_min per window) evaluates every step as an interpreted
  * higher-order-function lambda outside whole-stage codegen; this emits a
  * single static call. Expects its child ALREADY lowercased (the caller
  * applies `lower()` in Catalyst so case-folding semantics are exactly the
  * engine's, never the JVM locale's). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "k and w must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow expects a string, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any =
    WinnowKernel.compute(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.WinnowKernel.compute($v, $k, $w);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
