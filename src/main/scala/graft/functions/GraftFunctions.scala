package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-bigram generator: one output row per adjacent character pair of
  * the input string. A minimal custom Catalyst `Generator` standing in for the
  * Hive UDTF surface the reference delegates to (`hive-exec`,
  * /root/reference/pom.xml:110-116). */
case class CharBigrams(child: Expression) extends UnaryExpression with Generator
    with CodegenFallback {
  override def elementSchema: StructType = new StructType().add("bigram", StringType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"char_bigrams expects STRING, got ${child.dataType}")
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.toString
      (0 until math.max(0, s.length - 1))
        .map(i => InternalRow(UTF8String.fromString(s.substring(i, i + 2))))
    }
  }
  override protected def withNewChildInternal(newChild: Expression): CharBigrams =
    copy(child = newChild)
}

object GraftFunctions {
  /** Register all graft SQL functions on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("char_bigrams",
      (exprs: Seq[Expression]) => CharBigrams(exprs.head), "scala_udf")
    // Spark's own runtime-bloom-join expression pair (what InjectRuntimeFilter
    // plants), surfaced as SQL functions so a query can build the semi-join
    // reduction explicitly: bloom_agg(xxhash64(k)[, items[, bits]]) aggregates
    // a binary bloom; bloom_might_contain(bf, xxhash64(k)) probes it with full
    // codegen — no Scala UDF, no driver-side filter construction.
    reg.createOrReplaceTempFunction("bloom_agg",
      {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
        case Seq(c, n, b) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n, b)
        case other => throw new IllegalArgumentException(
          s"bloom_agg takes 1-3 args, got ${other.size}")
      }: Seq[Expression] => Expression, "scala_udf")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1)), "scala_udf")
  }
}
