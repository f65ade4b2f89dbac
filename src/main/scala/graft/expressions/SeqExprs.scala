package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-sequence kernels for generation-eval metrics (ROUGE-L) and
  * sequence-level dedup (self-instruct pool filtering).
  *
  * The LCS dynamic program is inherently per-row imperative — no
  * composition of Spark HOFs expresses the O(m·n) recurrence without
  * interpreted lambda dispatch per CELL — so it follows the
  * [[MinHashKernel]] pattern: one shared kernel object called by both
  * interpreted eval and one generated static call, keeping the pair scan
  * inside whole-stage codegen. */
object LcsKernel {

  /** Longest-common-subsequence LENGTH of two token arrays, classic
    * two-row rolling DP: O(m·n) time, O(n) space. Token comparison is
    * exact UTF8String equality (binary — the oracle compares VARCHAR with
    * `=`, identical for the whitespace-split tokens both sides produce).
    * Callers bound m and n by slicing the inputs (the DP cost is a
    * CONFIGURED budget, not data-dependent). */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0 || n == 0) return 0L
    // materialize b once — the inner loop reads it m times
    val bt = new Array[UTF8String](n)
    var j = 0
    while (j < n) { bt(j) = b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      val ai = a.getUTF8String(i - 1)
      j = 1
      while (j <= n) {
        cur(j) =
          if (ai == null) math.max(prev(j), cur(j - 1))
          else if (ai.equals(bt(j - 1))) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(n).toLong
  }
}

/** `lcs_length(a, b)` over two `array<string>` token lists — one generated
  * static call into [[LcsKernel]]. */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(e => e.dataType.isInstanceOf[ArrayType] &&
      e.dataType.asInstanceOf[ArrayType].elementType == StringType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lcs_length expects array<string> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.LcsKernel.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
                                                 r: Expression) =
    copy(left = l, right = r)
}
