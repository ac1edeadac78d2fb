package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.SqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst cosine similarity over two float-array columns,
  * with whole-stage codegen (`doGenCode`).
  *
  * Why not `aggregate(zip_with(...))` (the previous form): Spark's
  * higher-order array functions are interpreted per element through a
  * lambda and are CodegenFallback — they break the whole-stage codegen
  * span AND materialize three intermediate arrays per row (the zipped
  * products and both squared transforms). For the ANN operators this
  * expression IS the inner loop over every vector in the corpus, so it
  * is exactly the case the builder guidance ranks a native Expression
  * above built-in composition: one fused loop over the two ArrayData
  * buffers, zero allocation, inlined into the surrounding codegen stage.
  *
  * Semantics are IDENTICAL to the replaced expression on every real
  * vector (bit-for-bit, so the DuckDB oracle hash still matches): each
  * float is widened to double, dot and both norms accumulate in
  * ascending index order, and the result is dot / (sqrt(na) * sqrt(nb)).
  *
  * Documented divergences from the HOF form (all spec-pinned):
  *  1. zero-norm (or empty) vector → NaN — IEEE 0/0 — where the HOF
  *     under Spark's default ANSI mode throws DIVIDE_BY_ZERO mid-job;
  *     NaN is the conventional "similarity undefined" answer and keeps
  *     one bad vector from failing a corpus-wide pass;
  *  2. length mismatch → extra elements of the longer input are IGNORED
  *     (the HOF's zip_with null-pads and yields NULL). Fixed-dim
  *     embedding tables never hit this; the tail-ignore keeps the hot
  *     loop branch-free;
  *  3. NULL array ELEMENT → NULL result, exactly like the HOF (never
  *     silently treated as 0.0). The per-element null check is emitted
  *     ONLY when the child schema says elements can be null
  *     (containsNull) — nullable-free columns keep the branch-free
  *     loop. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  private def elemsNullable(t: DataType): Boolean = t match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  private lazy val checkElems =
    elemsNullable(left.dataType) || elemsNullable(right.dataType)
  // a null ELEMENT produces a null result even when both columns are
  // themselves non-nullable
  override def nullable: Boolean =
    left.nullable || right.nullable || checkElems

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (checkElems && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      // emitted only for schemas that can hold null elements — the
      // common containsNull=false case keeps the branch-free loop
      val nullCheck =
        if (checkElems)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry: `cosine(col("embedding"), col("qe"))`. */
  def cosine(a: Column, b: Column): Column =
    SqlShim.column(CosineSimilarity(
      SqlShim.expression(a), SqlShim.expression(b)))
}
