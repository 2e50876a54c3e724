package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels for the ANN surface (llm_ann_pq): split a
  * d-dim vector into M subspaces, represent each subvector by the id of its
  * nearest codeword out of K — M bytes per vector instead of 8·d. Scoring
  * uses ADC (asymmetric distance computation): the query precomputes one
  * M×K table of exact subspace inner products against every codeword, and a
  * corpus vector's approximate inner product is M table lookups over its
  * code bytes. At 100 TB that turns the scan side of ANN from 8·d bytes/row
  * into M bytes/row (32× at d=64, M=16) with candidate re-ranking restoring
  * exactness on the short list.
  *
  * The codebook rides along as a flattened ARRAY<DOUBLE> literal of length
  * M·K·(d/M) — codeword c of subspace j occupies
  * [ (j·K + c)·sub, …+sub ) — bounded by the constants M, K, never by the
  * corpus. All three kernels are codegen'd (no CodegenFallback in the scan
  * loop, unlike SQL higher-order functions). */
object Pq {

  /** Nearest codeword per subspace by exact L2; ties to the lowest id.
    * Returns M bytes. */
  def encode(v: ArrayData, cb: ArrayData, m: Int, k: Int): Array[Byte] = {
    val d = v.numElements()
    val sub = d / m
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (j * k + c) * sub
        var dist = 0.0
        var i = 0
        while (i < sub) {
          val diff = v.getDouble(j * sub + i) - cb.getDouble(base + i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** Query-side ADC lookup table: lut[j·K + c] = <q_j, codeword_{j,c}>. */
  def lut(q: ArrayData, cb: ArrayData, m: Int, k: Int): ArrayData = {
    val d = q.numElements()
    val sub = d / m
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        val base = (j * k + c) * sub
        var ip = 0.0
        var i = 0
        while (i < sub) { ip += q.getDouble(j * sub + i) * cb.getDouble(base + i); i += 1 }
        out(j * k + c) = ip
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Approximate inner product: M lookups. */
  def adc(codes: Array[Byte], lutArr: ArrayData, k: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < codes.length) {
      s += lutArr.getDouble(j * k + (codes(j) & 0xff))
      j += 1
    }
    s
  }
}

private object PqCheck {
  def arrD(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  def litInt(e: Expression): Boolean = e.dataType == IntegerType && e.foldable
}

/** `pq_encode(v ARRAY<DOUBLE>, cb ARRAY<DOUBLE>, m INT, k INT)` → BINARY. */
case class PqEncode(first: Expression, second: Expression, third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (PqCheck.arrD(first.dataType) && PqCheck.arrD(second.dataType) &&
      PqCheck.litInt(third) && PqCheck.litInt(fourth)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_encode expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>, literal INT, literal INT)")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any, cb: Any, m: Any, k: Any): Any =
    Pq.encode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m.asInstanceOf[Int], k.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, m, k) =>
      s"${ev.value} = graft.functions.Pq$$.MODULE$$.encode($v, $cb, $m, $k);")

  override protected def withNewChildrenInternal(
      f: Expression, s2: Expression, t: Expression, f4: Expression): PqEncode =
    copy(first = f, second = s2, third = t, fourth = f4)
}

/** `pq_lut(q ARRAY<DOUBLE>, cb ARRAY<DOUBLE>, m INT, k INT)` → ARRAY<DOUBLE>. */
case class PqLut(first: Expression, second: Expression, third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (PqCheck.arrD(first.dataType) && PqCheck.arrD(second.dataType) &&
      PqCheck.litInt(third) && PqCheck.litInt(fourth)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_lut expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>, literal INT, literal INT)")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(q: Any, cb: Any, m: Any, k: Any): Any =
    Pq.lut(q.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m.asInstanceOf[Int], k.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cb, m, k) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.Pq$$.MODULE$$.lut($q, $cb, $m, $k);")

  override protected def withNewChildrenInternal(
      f: Expression, s2: Expression, t: Expression, f4: Expression): PqLut =
    copy(first = f, second = s2, third = t, fourth = f4)
}

/** `pq_adc(codes BINARY, lut ARRAY<DOUBLE>, k INT)` → DOUBLE. */
case class PqAdc(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && PqCheck.arrD(second.dataType) &&
      PqCheck.litInt(third)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_adc expects (BINARY, ARRAY<DOUBLE>, literal INT)")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(codes: Any, lutArr: Any, k: Any): Any =
    Pq.adc(codes.asInstanceOf[Array[Byte]], lutArr.asInstanceOf[ArrayData],
      k.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lutArr, k) =>
      s"${ev.value} = graft.functions.Pq$$.MODULE$$.adc($codes, $lutArr, $k);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqAdc =
    copy(first = newFirst, second = newSecond, third = newThird)
}
