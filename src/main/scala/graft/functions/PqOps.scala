package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: PQ encoding — the `m` subspace codes of a
  * float vector in one pass, `array<int>`.
  *
  * Replaces [[graft.operators.Quantization.encodePq]]'s composable form:
  * per subspace an array of k structs, each holding an interpreted
  * zip_with/aggregate squared-L2 fold, reduced with array_min — m*k
  * interpreted HOF folds and m struct-array materializations per row
  * (it runs per CORPUS row in pq_topk/ivfpq and per row per Lloyd
  * iteration in trainPq). Value-exact (pinned by
  * ShingleSigsPropertySpec): distances accumulate in strict index order
  * as (v_d - c_d)^2 double sums, and the argmin resolves ties to the
  * LOWEST code exactly like array_min over (distance, code) structs.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  private val dim = codebooks.length * codebooks(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    PqOps.pqEncode(input.asInstanceOf[ArrayData], codebooks, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqOps.pqEncode($c, $cb, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Native Catalyst expression: the ADC fold — sum over subspaces s of
  * `lut[s*k + codes[s]]`, the per-pair half of PQ-ADC scoring.
  *
  * Replaces an interpreted `aggregate(zip_with(codes, sequence(...)))`
  * that ran per CANDIDATE PAIR. Strict index-order double sum, exactly
  * the composable fold. */
case class AdcFold(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  // containsNull accepted at analysis time (join outputs carry it
  // conservatively) but an ACTUAL null slot fails loudly in adcFold —
  // see MinhashSig for the policy (TextBytes.failNullSlot)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_fold expects (array<int>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqOps.adcFold(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = graft.functions.PqOps.adcFold($c, $l, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcFold =
    copy(left = newLeft, right = newRight)
}

object PqOps {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Shared by interpreted eval and generated code. */
  def pqEncode(vec: ArrayData, cb: Array[Array[Array[Double]]],
               isFloat: Boolean): GenericArrayData = {
    val m = cb.length
    val dsub = cb(0)(0).length
    require(vec.numElements() == m * dsub,
      s"pq_encode: vector length ${vec.numElements()} != ${m * dsub}")
    // one pre-scan (cheap vs the m*k*dsub fold below): getFloat/getDouble
    // on a null slot would read garbage — fail loudly instead
    var z = 0
    while (z < m * dsub) {
      if (vec.isNullAt(z)) TextBytes.failNullSlot("pq_encode", z)
      z += 1
    }
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * dsub
      val codes = cb(s)
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < codes.length) {
        val c = codes(j)
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val v = if (isFloat) vec.getFloat(base + t).toDouble
                  else vec.getDouble(base + t)
          val diff = v - c(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j } // strict <: ties keep lowest j
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Shared by interpreted eval and generated code. */
  def adcFold(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) TextBytes.failNullSlot("adc_fold.codes", s)
      val idx = s * k + codes.getInt(s)
      if (lut.isNullAt(idx)) TextBytes.failNullSlot("adc_fold.lut", idx)
      acc += lut.getDouble(idx)
      s += 1
    }
    acc
  }

  /** Column-API entry points. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebooks))
  def adcFold(codes: Column, lut: Column, k: Int): Column =
    ColumnBridge.column(AdcFold(
      ColumnBridge.expression(codes), ColumnBridge.expression(lut), k))
}
