package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: Jaccard similarity of two distinct-element
  * long arrays (hashed shingle sets), |A∩B| / |A∪B|, 0.0 when the union
  * is empty.
  *
  * The composable formulation (`size(array_intersect(a,b))` twice — once
  * for the numerator, once inside the union denominator — see
  * [[graft.operators.Dedup.jaccard]]) builds a hash set AND materializes
  * the intersection array per evaluation; worse, CollapseProject +
  * filter pushdown inline the alias into every consumer, so a
  * verify-filter pipeline evaluates it up to ~6x per candidate pair
  * (measured: the dominant cost of blocked n-gram verification at sf0.1,
  * >1M candidate pairs). This expression fuses the whole computation
  * into one allocation-light loop: copy both arrays, sort, merge-count
  * the intersection. Duplicated evaluation is then harmless — no hash
  * set, no intermediate ArrayData, ~O(n log n) on primitive longs.
  *
  * Inputs are treated as SETS (the signature tables are array_distinct
  * by construction); elements may appear in any order.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_similarity expects array<bigint> inputs, got " +
      s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    JaccardSimilarity.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
        ${ev.value} = graft.functions.JaccardSimilarity.compute($a, $b);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaccardSimilarity {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Shared by interpreted eval and generated code (the codegen template
    * emits a single static call — keeping the loop in one JIT-compiled
    * method beats inlining source into every generated class). */
  def compute(l: ArrayData, r: ArrayData): Double = {
    val na = l.numElements()
    val nb = r.numElements()
    if (na == 0 && nb == 0) return 0.0
    val a = l.toLongArray()
    val b = r.toLongArray()
    java.util.Arrays.sort(a)
    java.util.Arrays.sort(b)
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na.toDouble + nb.toDouble - inter
    if (union > 0) inter / union else 0.0
  }

  /** Column-API entry point. */
  def jaccardNative(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
