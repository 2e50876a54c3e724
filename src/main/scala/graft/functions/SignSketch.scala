package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** 1024-bit random-hyperplane (sign) sketch of a dense vector, packed into
  * 16 longs, plus the matching Hamming-distance kernel — the exact-recall
  * prefilter behind `llm_dedup_embedding`.
  *
  * Estimator: for unit vectors at angle θ, each sketch bit disagrees with
  * probability θ/π, so Hamming(a, b) ~ Binomial(K, θ/π). With K = 1024 the
  * standard deviation is at most √K/2 = 16 bits, giving a 5σ acceptance
  * cutoff of K·acos(t)/π + 5·√K/2 — a pair at cosine ≥ t is rejected with
  * probability < 3e-7 (one-sided Chernoff), while pairs near cosine 0 sit
  * ~9σ above the cutoff and are overwhelmingly filtered out before the
  * exact dot product runs.
  *
  * The ±1 projection matrix is a deterministic splitmix64 stream (seeded by
  * dimension), so sketches are byte-identical across runs, executors, and
  * plan re-attempts — no broadcast state, no RNG in the task path. Both
  * kernels are tight JVM loops behind `doGenCode` static calls, keeping the
  * O(N²) candidate stream inside whole-stage codegen with zero per-pair
  * allocation. */
object SignSketch {
  val Bits = 1024
  val Words: Int = Bits / 64

  /** 5σ Hamming acceptance cutoff for a cosine threshold `t`. */
  def cutoff(t: Double): Int =
    math.ceil(Bits * math.acos(t) / math.Pi + 5.0 * math.sqrt(Bits.toDouble) / 2.0).toInt

  private val signCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic ±1 matrix for input dimension `dim`, flat [p*dim + i]. */
  private def signs(dim: Int): Array[Byte] =
    signCache.computeIfAbsent(dim, d => {
      val a = new Array[Byte](Bits * d)
      var j = 0
      while (j < a.length) {
        a(j) = if ((mix(j.toLong * 1000003L + d) & 1L) == 1L) 1 else -1
        j += 1
      }
      a
    })

  def kernel(arr: ArrayData): ArrayData = {
    val d = arr.numElements()
    val v = arr.toDoubleArray()
    val sg = signs(d)
    val words = new Array[Long](Words)
    var p = 0
    while (p < Bits) {
      var acc = 0.0
      val base = p * d
      var i = 0
      while (i < d) { acc += (if (sg(base + i) > 0) v(i) else -v(i)); i += 1 }
      if (acc > 0) words(p >> 6) |= 1L << (p & 63)
      p += 1
    }
    new GenericArrayData(words)
  }

  def hamming(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var h = 0
    var i = 0
    while (i < n) { h += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    h
  }
}

/** `sign_sketch(array<double>)` → `array<bigint>` (16 packed words). */
case class SignSketchExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_sketch expects ARRAY<DOUBLE>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_sketch"

  override protected def nullSafeEval(input: Any): Any =
    SignSketch.kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignSketch$$.MODULE$$.kernel($c);")

  override protected def withNewChildInternal(newChild: Expression): SignSketchExpr =
    copy(child = newChild)
}

/** `sketch_hamming(array<bigint>, array<bigint>)` → INT popcount distance. */
case class SketchHamming(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sketch_hamming expects two ARRAY<BIGINT>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sketch_hamming"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SignSketch.hamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SignSketch$$.MODULE$$.hamming($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SketchHamming =
    copy(left = newLeft, right = newRight)
}
