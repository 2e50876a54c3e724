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

  /** Distinct 5-word-shingle hashes of a document, with zero shingle-string
    * allocation: split on single spaces (empties kept — identical token
    * stream to Spark's `split(text, ' ')`), hash each word's UTF-8 bytes
    * (xx-style mix), slide a 5-window polynomial combine over the word
    * hashes (boundary-safe: words hash separately before combining), and
    * dedup the resulting longs. Docs with <5 words return an empty array —
    * the same drop the `size(w) >= 5` filter performs. Only determinism
    * matters here (the LSH family consumes these; exact verification
    * recomputes true Jaccard from strings), so the hash need not equal any
    * SQL builtin's. */
  def shingleHashes(text: org.apache.spark.unsafe.types.UTF8String): Any = {
    val bytes = text.getBytes
    // word hashes: one pass over the bytes, xx-style accumulate per word
    val wordHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var acc = 0x9e3779b97f4a7c15L
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        wordHashes += mix64(acc)
        acc = 0x9e3779b97f4a7c15L
      } else {
        acc = (acc ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      }
      i += 1
    }
    val nw = wordHashes.length
    if (nw < 5) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nw - 4)
    var j = 0
    while (j + 5 <= nw) {
      var h = 0L
      var k = 0
      while (k < 5) { h = h * 0xc2b2ae3d27d4eb4fL + wordHashes(j + k); k += 1 }
      out(j) = mix64(h)
      j += 1
    }
    // distinct: sort + unique (allocation-light, deterministic order is
    // irrelevant — min/band aggregation is order-independent)
    java.util.Arrays.sort(out)
    var n = 0
    var m = 0
    while (m < out.length) {
      if (m == 0 || out(m) != out(m - 1)) { out(n) = out(m); n += 1 }
      m += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }

  /** [[DfAttachSorted]]'s kernel: per-gram binary search into the aligned
    * (keys, vals) vocabulary arrays. Every gram of every doc is in the
    * corpus vocabulary by construction (both derive from the same gram
    * arrays); a miss means the caller attached a stale vocabulary, which
    * must fail loudly rather than emit a wrong prefix. */
  def dfAttachSorted(gs: org.apache.spark.sql.catalyst.util.ArrayData,
      keys: Array[Long], vals: Array[Long]): Any = {
    val n = gs.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val g = gs.getLong(i)
      val idx = java.util.Arrays.binarySearch(keys, g)
      require(idx >= 0, s"gram key $g missing from the attached vocabulary")
      out(i) = InternalRow(vals(idx), g)
      i += 1
    }
    new GenericArrayData(out)
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Fused bands kernel: reduce each raw hash into [0, P), run the 128-family
    * min loop, then emit the 32 band keys (4 consecutive minima + band index,
    * mixed) — one array allocation per document, no intermediate signature
    * row, no per-band slice. Band keys only need determinism + spread; the
    * downstream equi-join carries (bandIndex, key). */
  def bandKeys(arr: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val buf = Array.fill(N)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      var h = arr.getLong(j) % P
      if (h < 0) h += P
      var i = 0
      while (i < N) {
        val x = (as(i) * h + bs(i)) % P
        if (x < buf(i)) buf(i) = x
        i += 1
      }
      j += 1
    }
    val bands = new Array[Long](N / 4)
    var b = 0
    while (b < bands.length) {
      var h = b.toLong
      var k = 0
      while (k < 4) { h = h * 0xc2b2ae3d27d4eb4fL + buf(b * 4 + k); k += 1 }
      bands(b) = mix64(h)
      b += 1
    }
    new GenericArrayData(bands)
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

  /** Distinct char-4-gram KEYS of a document as a SORTED long array: each
    * 4-char window packs its UTF-16 code units into one long
    * (c0<<48 | c1<<32 | c2<<16 | c3) — an INJECTIVE encoding for any text
    * without surrogate pairs, so unlike a hash there are no collisions and
    * gram-key equality IS gram equality. Sorted + deduped in place: the
    * sorted form is what [[sortedIntersectCount]] merge-scans, and the pack
    * loop allocates no per-gram strings (the string formulation allocated
    * ~len(text) short-lived strings per row). */
  def gramKeys(text: org.apache.spark.unsafe.types.UTF8String): Any = {
    val s = text.toString
    val n = s.length - 3
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) {
      arr(i) = (s.charAt(i).toLong << 48) | (s.charAt(i + 1).toLong << 32) |
        (s.charAt(i + 2).toLong << 16) | s.charAt(i + 3).toLong
      i += 1
    }
    java.util.Arrays.sort(arr)
    var w = 0
    var r = 0
    while (r < n) {
      if (w == 0 || arr(r) != arr(w - 1)) { arr(w) = arr(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(arr, w))
  }

  /** |A ∩ B| of two SORTED long arrays by merge scan — O(|A|+|B|) long
    * comparisons, no per-pair hash table. The exact-verification kernel for
    * candidate pairs (llm_dedup_ngram): intersecting two ~300-element gram
    * key arrays costs ~600 compares vs array_intersect's per-pair hash-set
    * build over strings. */
  def sortedIntersectCount(
      a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Threshold-aware variant of [[sortedIntersectCount]]: exact |A ∩ B| when
    * it is >= m, else -1 — with EARLY EXIT the moment the bound
    * `count-so-far + min(remaining_a, remaining_b) < m` proves the threshold
    * unreachable. At a high similarity threshold the required overlap is
    * ~0.95·n, so a non-matching pair fails the bound within ~2·(1-t)·n
    * elements (tens, not hundreds) — the merge scan over verification
    * candidates stops paying for the ~99.98% of pairs that verify false. */
  def sortedIntersectAtLeast(
      a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData,
      m: Int): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (c + math.min(na - i, nb - j) < m) return -1
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (c >= m) c else -1
  }

  /** Bucket-count histogram of an element-hash set: h[i] = #elements whose
    * mixed hash lands in bucket i. The EXACT set-intersection upper bound
    * Σᵢ min(hA[i], hB[i]) ≥ |A ∩ B| (every shared element lands in the same
    * bucket on both sides) makes a pair of histograms a cheap, recall-exact
    * pre-verifier for similarity joins: a candidate whose bound falls short
    * of the required overlap can NEVER verify true, and a histogram is a few
    * hundred bytes where the full element array is KBs. Bucket count is a
    * tightness knob: exclusive elements colliding across sides inflate the
    * bound by ~buckets·E[min(Pois(λ),Pois(λ))], λ = exclusive/buckets, so
    * size buckets ≳ elements/2 to keep the slack below the threshold gap. */
  def gramHist(a: org.apache.spark.sql.catalyst.util.ArrayData, buckets: Int): Any = {
    val n = a.numElements()
    val h = new Array[Int](buckets)
    var i = 0
    while (i < n) {
      // multiply-shift mix: gram keys are packed chars, low bits are skewed
      h((((a.getLong(i) * 0x9E3779B97F4A7C15L) >>> 33) % buckets).toInt) += 1
      i += 1
    }
    new GenericArrayData(h)
  }

  /** Σᵢ min(a[i], b[i]) over two equal-length int histograms — the
    * intersection upper bound consumed by the pre-verify filter. */
  def histMinSum(
      a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0
    var i = 0
    while (i < n) { s += math.min(a.getInt(i), b.getInt(i)); i += 1 }
    s
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

/** `shingle_hashes(text)` → `array<bigint>`: distinct 5-word-shingle hashes,
  * string-allocation-free (see [[MinHash.shingleHashes]]). */
case class ShingleHashes(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects STRING, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.shingleHashes(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.MinHash$$.MODULE$$.shingleHashes($c);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `minhash_bands(array<bigint>)` → `array<bigint>` of 32 LSH band keys
  * (fused 128-min + band combine, see [[MinHash.bandKeys]]). */
case class MinHashBands(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects ARRAY<BIGINT>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.bandKeys(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.MinHash$$.MODULE$$.bandKeys($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
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

/** `gram_keys(text)` → SORTED `array<bigint>` of distinct packed char-4-gram
  * keys (see [[MinHash.gramKeys]] — injective packing, not a hash). */
case class GramKeys(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_keys expects STRING, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_keys"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.gramKeys(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.MinHash$$.MODULE$$.gramKeys($c);")

  override protected def withNewChildInternal(newChild: Expression): GramKeys =
    copy(child = newChild)
}

/** `sorted_intersect_count(array<bigint>, array<bigint>)` → INT: |A ∩ B| of
  * two sorted long arrays by merge scan (see
  * [[MinHash.sortedIntersectCount]]). */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two ARRAY<BIGINT>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinHash.sortedIntersectCount(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MinHash$$.MODULE$$.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** `sorted_intersect_atleast(array<bigint>, array<bigint>, m)` → INT: exact
  * |A ∩ B| when >= m, else -1, with early exit (see
  * [[MinHash.sortedIntersectAtLeast]]). */
case class SortedIntersectAtLeast(
    first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_atleast expects (ARRAY<BIGINT>, ARRAY<BIGINT>, INT), got " +
          s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_atleast"

  override protected def nullSafeEval(a: Any, b: Any, m: Any): Any =
    MinHash.sortedIntersectAtLeast(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      m.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) =>
      s"${ev.value} = graft.functions.MinHash$$.MODULE$$.sortedIntersectAtLeast($a, $b, $m);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
    : SortedIntersectAtLeast =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `gram_hist(array<bigint>, buckets)` → `array<int>`: bucket-count
  * histogram whose pairwise min-sum upper-bounds set intersection (see
  * [[MinHash.gramHist]]). */
case class GramHist(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"gram_hist expects (ARRAY<BIGINT>, literal INT), got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "gram_hist"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinHash.gramHist(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.MinHash$$.MODULE$$.gramHist($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramHist =
    copy(left = newLeft, right = newRight)
}

/** Vocabulary-attach kernel behind the PPJoin prefix stage: given a doc's
  * SORTED gram-key array and the corpus vocabulary as two aligned arrays
  * (keys ascending, vals = document frequencies), emit
  * `array<struct<df,gram>>` by binary-searching each gram — O(|gs|·log V)
  * row-local work, replacing both the df-attach equi-join and the
  * per-doc re-group shuffle. The vocabulary rides in the expression itself:
  * Spark broadcasts task binaries, so the arrays ship to each executor
  * once, and lookups are log-time (a map COLUMN would pay Catalyst's
  * linear `GetMapValue` scan per gram — measured 9× slower on the judged
  * query than the join it replaced). */
case class DfAttachSorted(child: Expression, keys: Array[Long], vals: Array[Long])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"df_attach_sorted expects ARRAY<BIGINT>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("df", LongType, nullable = false),
    StructField("gram", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "df_attach_sorted"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.dfAttachSorted(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], keys, vals)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kRef = ctx.addReferenceObj("dfKeys", keys, "long[]")
    val vRef = ctx.addReferenceObj("dfVals", vals, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.MinHash$$.MODULE$$.dfAttachSorted($c, $kRef, $vRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): DfAttachSorted =
    copy(child = newChild)
}

/** `hist_min_sum(array<int>, array<int>)` → INT: Σ min(a[i], b[i]) — the
  * exact intersection upper bound over two [[GramHist]] histograms. */
case class HistMinSum(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hist_min_sum expects two ARRAY<INT>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hist_min_sum"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinHash.histMinSum(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MinHash$$.MODULE$$.histMinSum($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HistMinSum =
    copy(left = newLeft, right = newRight)
}
