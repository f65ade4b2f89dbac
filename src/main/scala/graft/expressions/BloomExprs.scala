package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Shared kernel for [[BloomMightContain]] — also the generated code's call
  * target, so interpreted eval and codegen cannot drift. */
object BloomKernel {

  /** Classic double-hashing Bloom probe (Kirsch–Mitzenmacher 2006: k
    * independent hashes simulated as `h1 + i·h2`). `h1`/`h2` are 60-bit
    * non-negative values and `k ≤ 8`, so `h1 + (k−1)·h2 < 2^63` — the
    * position arithmetic never overflows a signed long. `m` is the filter
    * size in bits; `words` is the dense little-endian bit array.
    */
  def mightContain(h1: Long, h2: Long, words: Array[Long], m: Long, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      val pos = (h1 + i * h2) % m
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }
}

/** Bloom-filter membership probe as ONE generated expression. The children
  * are the two 60-bit md5-derived hashes of the value (computed with the
  * engine's own `md5`/`conv` built-ins so an external oracle can replay the
  * exact bit positions); the filter itself is a static reference object —
  * never a 16k-element array literal in the plan.
  *
  * This is the probe half of the incremental exact-dedup membership index
  * (`ops/BloomIndex`): at 100 TB the filter is the only state that has to
  * reach the scan, and it rides to every task as one reference object.
  */
case class BloomMightContain(left: Expression, right: Expression,
                             words: Array[Long], m: Long, k: Int)
    extends BinaryExpression {
  require(m > 0 && words.length.toLong == (m + 63) / 64,
    s"words length ${words.length} does not cover $m bits")
  require(k >= 1 && k <= 8, "k must be in [1, 8] (position arithmetic bound)")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom probe expects (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    BloomKernel.mightContain(a.asInstanceOf[Long], b.asInstanceOf[Long], words, m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, (h1, h2) =>
      s"${ev.value} = graft.expressions.BloomKernel.mightContain($h1, $h2, $wordsRef, ${m}L, $k);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
