package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The minhash family behind `minhash_signature`: 128 INDEPENDENT universal
  * hashes h_i(x) = (a_i*x + b_i) mod p over a base hash x < p = 1e9+7.
  * (A two-hash Kirsch-Mitzenmacher family fails for minhash: one exclusive
  * shingle with a small (h1, h2) dominates every linear combination at once,
  * hiding a 0.97-Jaccard pair.) Coefficients are fixed-seed so signatures
  * are byte-identical across runs, executors, and plan re-attempts.
  * a_i*x stays < 1e18, inside Long arithmetic. */
object MinHash {
  val N = 128
  val P = 1000000007L
  val (as, bs): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(20260812)
    val pairs = Array.fill(N)(
      (rnd.nextInt(1000000006) + 1).toLong -> rnd.nextInt(1000000007).toLong)
    (pairs.map(_._1), pairs.map(_._2))
  }

  /** Row-local signature kernel: the 128 per-family minima over one doc's
    * base-hash array — identical arithmetic to the [[MinHashSignature]]
    * aggregate's update loop, but with the whole document in hand the
    * signature needs NO explode and NO groupBy shuffle: candidate generation
    * becomes map-only up to the band equi-join. */
  def signatureOf(arr: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val buf = Array.fill(N)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < N) {
        val x = (as(i) * h + bs(i)) % P
        if (x < buf(i)) buf(i) = x
        i += 1
      }
      j += 1
    }
    new GenericArrayData(buf)
  }
}

/** Row-local 64-bit SimHash over an array of element hashes: per bit, count
  * +1/−1 votes across elements; a positive total sets the bit. Equals the
  * explode + 64-sum-column formulation bit for bit, without the shuffle. */
object SimHash {
  def simhash64(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      j += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) { if (counts(k) > 0) sig |= 1L << k; k += 1 }
    sig
  }
}

/** `minhash_signature_arr(array<bigint>)` → `array<bigint>`: the scalar twin
  * of the [[MinHashSignature]] aggregate, for when the document's base hashes
  * are already an array column. */
case class MinHashSignatureArr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature_arr expects ARRAY<BIGINT>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature_arr"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.signatureOf(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.MinHash$$.MODULE$$.signatureOf($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureArr =
    copy(child = newChild)
}

/** `simhash64(array<bigint>)` → BIGINT packed signature. */
case class SimHash64(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<BIGINT>, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash.simhash64(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash$$.MODULE$$.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `minhash_signature(hash BIGINT)` → `array<bigint>` of the 128 per-family
  * minima over the group — ONE aggregate with an Array[Long] buffer instead
  * of 128 separate `min` columns. The per-row update is a tight 128-iteration
  * multiply-mod loop (no per-column Catalyst expression overhead), partial
  * aggregation merges elementwise (min is associative/commutative, so
  * map-side combine still applies), and shuffle serialization is one
  * 1 KiB byte blob per group. */
case class MinHashSignature(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects BIGINT, got ${t.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(MinHash.N)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val as = MinHash.as
      val bs = MinHash.bs
      var i = 0
      while (i < MinHash.N) {
        val x = (as(i) * h + bs(i)) % MinHash.P
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < MinHash.N) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * MinHash.N)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(MinHash.N)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
