package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`, `transform`)
  * evaluate their lambdas INTERPRETED — they sit outside whole-stage
  * codegen, so a cosine over a 64-dim vector pays ~192 boxed lambda calls
  * per row, and an SRP signature pays nBits × dim of them. These
  * expressions compile the same arithmetic into one tight generated loop
  * (`doGenCode`), keeping brute-force top-k and index builds inside
  * codegen at 100 TB row counts.
  *
  * Semantics are BIT-EXACT with the `VectorFns` zip_with/aggregate forms
  * they replace (same element-order accumulation, same null/length rules),
  * so the DuckDB oracles keep hash-matching.
  */
object VectorExprs {

  /** Shared interpreted kernel: dot, |a|², |b|² in one element-order pass.
    * Returns null (like zip_with padding) on length mismatch or null
    * element. */
  private[expressions] def accumulate(a: ArrayData, b: ArrayData): Array[Double] = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    Array(dot, na, nb)
  }
}

/** `dot(a, b)` — element-order sum of products, one generated loop. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    // getDouble reinterprets raw slots — anything but double elements would
    // produce silent garbage, so the check is exact (callers cast first).
    // Per-element check: casting the OTHER operand inside one forall would
    // throw ClassCastException during analysis when only one side is an
    // array, instead of returning the clean failure below.
    val ok = Seq(left, right).forall(e => e.dataType.isInstanceOf[ArrayType] &&
      e.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot expects array<double> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val acc = VectorExprs.accumulate(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (acc == null) null else acc(0)
  }

  // fresh local names: many dot nodes can share ONE generated scope (a
  // rotation projection is 64 of them in a single CreateArray) — fixed
  // names made Janino fail with "Redefinition of local variable" and drop
  // the whole stage to interpreted eval
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val bad = ctx.freshName("bad")
    val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $dot = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `cosine(a, b)` — dot and both squared norms in ONE pass, then
  * `dot / (sqrt(na) * sqrt(nb))`, the exact arithmetic of
  * `VectorFns.dot / (norm * norm)`. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(e => e.dataType.isInstanceOf[ArrayType] &&
      e.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine expects array<double> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val acc = VectorExprs.accumulate(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (acc == null) null
    else acc(0) / (math.sqrt(acc(1)) * math.sqrt(acc(2)))
  }

  // fresh local names — see DotProduct.doGenCode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val bad = ctx.freshName("bad")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
    val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  double $x = $a.getDouble($i); double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** SRP-LSH signature: bit i = sign(dot(v, plane_i)), all planes in one
  * generated pass over the vector. Parity with the `when(proj >= 0, ...)`
  * chain in `VectorFns.srpSignaturePlanes`: a null element or a dim
  * mismatch nulls every projection, which that chain maps to an all-zero
  * signature (the `otherwise(0)` branch) — reproduced here. */
case class SrpSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() = {
    val ok = child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"srp expects an array<double> input, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var sig = 0L
    if (planes.nonEmpty && n == planes(0).length) {
      var ok = true
      var i = 0
      while (ok && i < n) { if (a.isNullAt(i)) ok = false; i += 1 }
      if (ok) {
        var b = 0
        while (b < planes.length) {
          val p = planes(b)
          var proj = 0.0
          var j = 0
          while (j < n) { proj += a.getDouble(j) * p(j); j += 1 }
          if (proj >= 0) sig |= (1L << b)
          b += 1
        }
      }
    }
    sig
  }

  // fresh local names — see DotProduct.doGenCode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
    val ok = ctx.freshName("ok"); val i = ctx.freshName("i")
    val b = ctx.freshName("b"); val p = ctx.freshName("p")
    val proj = ctx.freshName("proj"); val j = ctx.freshName("j")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |int $n = $v.numElements();
         |long $sig = 0L;
         |if ($planesRef.length > 0 && $n == $planesRef[0].length) {
         |  boolean $ok = true;
         |  for (int $i = 0; $ok && $i < $n; $i++) { if ($v.isNullAt($i)) $ok = false; }
         |  if ($ok) {
         |    for (int $b = 0; $b < $planesRef.length; $b++) {
         |      double[] $p = $planesRef[$b];
         |      double $proj = 0.0;
         |      for (int $j = 0; $j < $n; $j++) { $proj += $v.getDouble($j) * $p[$j]; }
         |      if ($proj >= 0) $sig |= (1L << $b);
         |    }
         |  }
         |}
         |${ev.value} = $sig;
         |""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Shared kernel for [[PqAdcTable]] — the generated code's call target. */
object PqAdcKernel {
  /** m×ks ADC term table for one query vector:
    * term(j, c) = cnorm(j)(c) − 2·Σ_i qv[j·d+i]·cb(j)(c)(i), the i-ascending
    * accumulation of `lit(dotSeq(c,c)) - lit(2.0) * dot(slice(qv), lit(c))`
    * — bit-identical to the composed column form it replaces. Returns null
    * on a dim mismatch or a null element (the composed form nulls the
    * affected entries; a malformed vector is malformed everywhere, so the
    * whole-table null is the same downstream "no candidates" outcome). */
  def compute(qv: ArrayData, cb: Array[Array[Array[Double]]],
              cnorms: Array[Array[Double]]): GenericArrayData = {
    val m = cb.length
    val d = if (m == 0) 0 else cb(0)(0).length
    val n = qv.numElements()
    if (n != m * d) return null
    var i = 0
    while (i < n) { if (qv.isNullAt(i)) return null; i += 1 }
    val q = qv.toDoubleArray()
    val outer = new Array[Any](m)
    var j = 0
    while (j < m) {
      val cbj = cb(j); val nj = cnorms(j)
      val terms = new Array[Double](cbj.length)
      var c = 0
      while (c < cbj.length) {
        val cw = cbj(c)
        var dot = 0.0
        var t = 0
        while (t < d) { dot += q(j * d + t) * cw(t); t += 1 }
        terms(c) = nj(c) - 2.0 * dot
        c += 1
      }
      outer(j) = new GenericArrayData(terms)
      j += 1
    }
    new GenericArrayData(outer)
  }
}

/** The full m×ks PQ asymmetric-distance-computation table as ONE expression
  * node. The composed form — `array(array(lit − 2·dot(slice(qv), lit)))`
  * over m·ks codewords — builds a 64+-node tree whose whole-stage codegen
  * source is large enough that Janino compilation dominated the batched
  * IVF+PQ probe's wall time (measured ~4.5 s of a 6 s query at sf0.1;
  * 1.6 s with codegen disabled). One reference-object call keeps the
  * generated source O(1) in m·ks. */
case class PqAdcTable(child: Expression, cb: Array[Array[Array[Double]]],
                      cnorms: Array[Array[Double]]) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    val ok = child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pqAdcTable expects an array<double> query vector, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any =
    PqAdcKernel.compute(v.asInstanceOf[ArrayData], cb, cnorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", cb, "double[][][]")
    val nRef = ctx.addReferenceObj("cnorms", cnorms, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.expressions.PqAdcKernel.compute($v, $cbRef, $nRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
