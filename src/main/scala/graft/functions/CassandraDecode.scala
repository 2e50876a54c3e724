package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import graft.sources.cassandralike.Codecs

/** `cassandra_decode(bytes, 'type')` — the reference's dual binary/text cell
  * decode (T1, serde2/lazy/CassandraLazy*.java in /root/reference) as a
  * native Catalyst expression: fixed-width big-endian binary when the byte
  * length matches exactly (binary WINS the ambiguous 4/8-ASCII-digit case),
  * ASCII-text fallback otherwise, SQL NULL on garbage.
  *
  * Implemented with real `doGenCode` (not a Scala UDF) so projections using
  * it stay inside whole-stage codegen — the per-row cost is one static call
  * and an unbox, with no encoder round-trip. */
case class CassandraDecode(child: Expression, targetType: DataType)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cassandra_decode expects BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = targetType
  override def nullable: Boolean = true
  override def prettyName: String = "cassandra_decode"

  override protected def nullSafeEval(input: Any): Any =
    Codecs.decode(targetType, input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dtRef = ctx.addReferenceObj("targetType", targetType)
    nullSafeCodeGen(ctx, ev, c => {
      val decoded = ctx.freshName("decoded")
      s"""
         |Object $decoded = graft.sources.cassandralike.Codecs$$.MODULE$$.decode($dtRef, $c);
         |if ($decoded == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${unbox(decoded)};
         |}
       """.stripMargin
    })
  }

  private def unbox(decoded: String): String = targetType match {
    case IntegerType => s"((java.lang.Integer) $decoded).intValue()"
    case LongType | TimestampType => s"((java.lang.Long) $decoded).longValue()"
    case FloatType => s"((java.lang.Float) $decoded).floatValue()"
    case DoubleType => s"((java.lang.Double) $decoded).doubleValue()"
    case BooleanType => s"((java.lang.Boolean) $decoded).booleanValue()"
    case StringType => s"((org.apache.spark.unsafe.types.UTF8String) $decoded)"
    case BinaryType => s"((byte[]) $decoded)"
    case other => throw new IllegalArgumentException(s"unsupported decode type $other")
  }

  override protected def withNewChildInternal(newChild: Expression): CassandraDecode =
    copy(child = newChild)
}

/** `cassandra_validator(bytes, 'Int32Type')` — validator-to-string rendering
  * (T2, serde2/lazy/CassandraLazyValidator.java:27-35): any cell rendered to
  * a string through a named CQL validator type; unknown validators render as
  * hex (BytesType behavior). */
case class CassandraValidatorString(child: Expression, validator: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cassandra_validator expects BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "cassandra_validator"

  override protected def nullSafeEval(input: Any): Any =
    Codecs.validatorString(validator, input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("validator", validator, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => {
      val rendered = ctx.freshName("rendered")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $rendered =
         |  graft.sources.cassandralike.Codecs$$.MODULE$$.validatorString($vRef, $c);
         |if ($rendered == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $rendered;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CassandraValidatorString =
    copy(child = newChild)
}

object CassandraDecode {
  /** Type names accepted by the SQL surface — the reference's supported
    * Hive-side primitives (SURVEY §1.3). */
  def parseType(name: String): DataType = name.trim.toLowerCase match {
    case "int" | "integer" => IntegerType
    case "bigint" | "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "timestamp" => TimestampType
    case "string" => StringType
    case "binary" => BinaryType
    case other => throw new IllegalArgumentException(
      s"cassandra_decode: unsupported type '$other'")
  }
}
