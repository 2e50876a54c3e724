package graft.sources.cassandralike

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The token-ring bucket as a Spark V2 catalog function — the piece that
  * lets Catalyst PROVE two cell stores are co-partitioned and plan a
  * storage-partitioned join (no exchange on either side).
  *
  * The scan reports `KeyGroupedPartitioning(bucket(n, key))`; Spark resolves
  * the `bucket` transform through the owning catalog's FunctionCatalog and
  * compares both sides by `canonicalName` + bucket count. Two stores written
  * with the same `buckets` property therefore join shuffle-free on their row
  * keys — Cassandra's "same partitioner, same token ranges" co-location
  * argument, carried into Catalyst as a provable plan property instead of a
  * scheduling hint (the reference could only offer per-split locality,
  * input/HiveCassandraStandardSplit.java:69-71).
  *
  * `produceResult` evaluates the real assignment (encode key bytes →
  * murmur token → range), so plans that must shuffle ONE side to match a
  * store's layout (spark.sql.sources.v2.bucketing.shuffle.enabled) compute
  * the identical bucket the writer used. */
object BucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): token-ring bucket the store's writer assigns to `key`"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket expects (numBuckets INT, key), got ${inputType.catalogString}")
    require(inputType(0).dataType == IntegerType,
      s"bucket's first argument must be INT, got ${inputType(0).dataType.catalogString}")
    val keyType = inputType(1).dataType
    keyType match { // the types the store can key (Codecs.encode)
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           StringType | BinaryType | TimestampType => ()
      case other => throw new UnsupportedOperationException(
        s"bucket: unsupported key type ${other.catalogString}")
    }
    BoundBucket(keyType)
  }
}

final case class BoundBucket(keyType: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // the store's key->bucket map depends on the key's byte encoding, so the
  // identity Spark uses for co-partition compatibility must carry the type
  override def canonicalName(): String =
    s"cassandralike.bucket(${keyType.catalogString})"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val key = input.get(1, keyType)
    TokenRing.bucket(Codecs.encode(keyType, key), n)
  }
}

/** The ordered-key twin of [[BucketFunction]]: identical ring math over the
  * ORDER-PRESERVING key bytes (`key.encoding = 'ordered'`). Two deliberate
  * differences. (1) A separate function identity — the key→bucket map
  * depends on the key's byte form, so an ordered store must never be
  * "proven" co-partitioned with a bytes store: distinct canonical names
  * make Catalyst fall back to a shuffled join across encodings (sound),
  * while two ordered stores with equal bucket counts still zip
  * shuffle-free. (2) The bucket count is baked into the function NAME
  * (`ordered_bucket_<n>`), making the transform a ONE-argument function of
  * the key: Spark's storage-partitioned-join support requires a
  * partitioning transform to resolve to a single-reference expression
  * (KeyGroupedPartitioning.supportsExpressions) and only the builtin
  * `bucket` name gets the special two-arg handling. Domain =
  * [[KeyCodec.orderedSupported]]: integrals, float/double (normalized:
  * -0.0 and NaN forms route as ONE key), decimal, timestamp, date. */
final case class OrderedBucketFunction(buckets: Int) extends UnboundFunction {
  override def name(): String = OrderedBucketFunction.nameFor(buckets)
  override def description(): String =
    s"${name()}(key): token-ring bucket over order-preserving key bytes"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"${name()} expects (key), got ${inputType.catalogString}")
    val keyType = inputType(0).dataType
    require(KeyCodec.orderedSupported(keyType),
      s"${name()}: unsupported ordered key type ${keyType.catalogString}")
    BoundOrderedBucket(keyType, buckets)
  }
}

object OrderedBucketFunction {
  def nameFor(buckets: Int): String = s"ordered_bucket_$buckets"
  private val NamePat = "ordered_bucket_(\\d+)".r
  /** Parse `ordered_bucket_<n>` back to its bucket count. */
  def parse(name: String): Option[Int] = name match {
    case NamePat(n) => Some(n.toInt)
    case _ => None
  }
}

final case class BoundOrderedBucket(keyType: DataType, buckets: Int)
  extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = OrderedBucketFunction.nameFor(buckets)
  override def canonicalName(): String =
    s"cassandralike.${name()}(${keyType.catalogString})"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val key = input.get(0, keyType)
    TokenRing.bucket(Codecs.encodeKeyOrdered(keyType, key), buckets)
  }
}

/** The RANGE-layout transform family (`range.bounds` tables):
  * `range_bucket_<n>_<digest>(key)` — bucket count AND a content digest of
  * the (encoded bounds, encoding flag) pair baked into the single-argument
  * function name, so two stores prove co-partitioned iff their key->bucket
  * maps are byte-identical; hash-ring or ordered-ring stores can never
  * match a range store (distinct name families), and two range stores with
  * different bounds differ in the digest. Binding resolves the digest
  * through a driver-side registry (populated whenever a range table parses
  * its bounds — always before its transform can appear in a plan) and
  * embeds the bounds in the BOUND function, so the executor-shipped
  * instance is self-contained (no registry on executors). */
final case class RangeBucketFunction(buckets: Int, digest: String)
  extends UnboundFunction {
  override def name(): String = RangeBucketFunction.nameFor(buckets, digest)
  override def description(): String =
    s"${name()}(key): range-layout bucket over order-preserving key bytes"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"${name()} expects (key), got ${inputType.catalogString}")
    val keyType = inputType(0).dataType
    val (bounds, ordered) = RangeBucketFunction.lookup(digest).getOrElse(
      throw new IllegalStateException(
        s"range layout digest $digest not registered in this process " +
          "(no table with these range.bounds has been loaded)"))
    require(KeyCodec(keyType, ordered).rangeOrdered,
      s"${name()}: unsupported range key type ${keyType.catalogString}")
    BoundRangeBucket(keyType, buckets, digest, bounds, ordered)
  }
}

object RangeBucketFunction {
  def nameFor(buckets: Int, digest: String): String =
    s"range_bucket_${buckets}_$digest"
  private val NamePat = "range_bucket_(\\d+)_([0-9a-f]{16})".r
  def parse(name: String): Option[RangeBucketFunction] = name match {
    case NamePat(n, d) => Some(RangeBucketFunction(n.toInt, d))
    case _ => None
  }

  // digest -> (encoded bounds, ordered-encoding flag); content-addressed,
  // so concurrent registrations of the same digest are identical by
  // construction (SHA-256 prefix over the bounds bytes + flag)
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Array[Byte]], Boolean)]()
  def register(bounds: Array[Array[Byte]], ordered: Boolean): String = {
    val d = RangeLayout.digest(bounds, ordered)
    registry.putIfAbsent(d, (bounds, ordered))
    d
  }
  def lookup(digest: String): Option[(Array[Array[Byte]], Boolean)] =
    Option(registry.get(digest))
}

final case class BoundRangeBucket(keyType: DataType, buckets: Int,
    digest: String, bounds: Array[Array[Byte]], ordered: Boolean)
  extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = RangeBucketFunction.nameFor(buckets, digest)
  override def canonicalName(): String =
    s"cassandralike.${name()}(${keyType.catalogString})"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val key = input.get(0, keyType)
    val enc =
      if (ordered) Codecs.encodeKeyOrdered(keyType, key)
      else Codecs.encode(keyType, key)
    TokenRing.bucket(enc, buckets, bounds)
  }
}
