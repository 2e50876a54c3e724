package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.cassandralike.{CassandraLikeTable, FieldRole, Options}

/** Catalyst rule: per-key top-k over a transposed cassandralike table is the
  * native form of the reference's slice predicate (P2: per-row cell-range
  * scan with `reversed` order and a `count` cap, executed server-side —
  * input/HiveCassandraStandardColumnInputFormat.java:73-94 in
  * /root/reference). SURVEY §4 lists this rewrite as the one remaining
  * optional Catalyst piece: map
  *
  * {{{ row_number() OVER (PARTITION BY :key ORDER BY :column [DESC]) <= k }}}
  *
  * onto scan options `slice.count=k` (+ `slice.reversed` for DESC), so the
  * source stops materializing more than k cells per key instead of scanning
  * every cell and discarding all but k post-shuffle. The Window and Filter
  * operators are left in place — they recompute row_number over the ≤k
  * surviving cells per key, which keeps the rewrite semantically bulletproof
  * (any rn-column use above still works) while the data volume leaving the
  * scan drops from O(cells) to O(k · keys).
  *
  * Safety conditions (all required, conservative by design):
  *  - the window child is the relation itself or a pure-attribute Project of
  *    it — no intervening Filter, so SQL filter-then-topk order is preserved;
  *  - partition spec is exactly the mapping's `:key` field and order spec is
  *    exactly the `:column` field of a TRANSPOSED mapping;
  *  - the order column is STRING or BINARY, whose Spark ordering equals the
  *    store's unsigned-byte cell comparator (fixed-width numeric encodings
  *    would sort negatives wrong);
  *  - row_number only (rank/dense_rank admit ties and are not a slice), with
  *    a literal `<= k` / `< k` bound;
  *  - no slice.* option is already set on the relation or table (composing
  *    two slices is ambiguous — first slice wins, bail).
  */
object SliceTopKPushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(_, child) => rewrite(f, child).getOrElse(f)
  }

  private def rewrite(f: Filter, child: LogicalPlan): Option[Filter] = {
    val (midProject, w) = child match {
      case w: Window => (None, w)
      case p @ Project(exprs, w: Window) if exprs.forall(_.isInstanceOf[Attribute]) =>
        (Some(p), w)
      case _ => return None
    }
    val (rnAttr, partAttr, sortOrder) = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(Seq(part: AttributeReference), Seq(so), _)), _)) =>
        (a.toAttribute, part, so)
      case _ => return None
    }
    val ordAttr = sortOrder.child match {
      case attr: AttributeReference => attr
      case _ => return None
    }
    val k: Long = f.condition match {
      case LessThanOrEqual(r: AttributeReference, Literal(v: Int, IntegerType))
        if r.semanticEquals(rnAttr) => v.toLong
      case LessThanOrEqual(r: AttributeReference, Literal(v: Long, LongType))
        if r.semanticEquals(rnAttr) => v
      case LessThan(r: AttributeReference, Literal(v: Int, IntegerType))
        if r.semanticEquals(rnAttr) => v.toLong - 1
      case LessThan(r: AttributeReference, Literal(v: Long, LongType))
        if r.semanticEquals(rnAttr) => v - 1
      case _ => return None
    }
    if (k <= 0 || k > Int.MaxValue) return None

    val (relProject, rel) = w.child match {
      case r: DataSourceV2Relation => (None, r)
      case p @ Project(exprs, r: DataSourceV2Relation)
        if exprs.forall(_.isInstanceOf[Attribute]) => (Some(p), r)
      case _ => return None
    }
    val table = rel.table match {
      case t: CassandraLikeTable if t.mapping.transposed => t
      case _ => return None
    }
    // the window key/order must be THIS relation's :key / :column fields
    val keyName = table.mapping.keyField.name
    val colField = table.mapping.field(FieldRole.TransColumn)
    def isRelAttr(a: AttributeReference, name: String): Boolean =
      a.name == name && rel.output.exists(_.semanticEquals(a))
    if (!isRelAttr(partAttr, keyName) || !isRelAttr(ordAttr, colField.name)) return None
    // Spark ordering must equal the store's unsigned-byte comparator
    colField.dataType match {
      case StringType | BinaryType => ()
      case _ => return None
    }
    // refuse to compose with an existing slice
    val sliceKeys = Seq(Options.SliceStart, Options.SliceFinish,
      Options.SliceReversed, Options.SliceCount)
    if (sliceKeys.exists(s => rel.options.containsKey(s) || table.tableProps.contains(s)))
      return None

    val reversed = sortOrder.direction match {
      case Ascending => false
      case Descending => true
    }
    val newOptions = new java.util.HashMap[String, String](rel.options)
    newOptions.put(Options.SliceCount, k.toString)
    if (reversed) newOptions.put(Options.SliceReversed, "true")
    val newRel = rel.copy(options = new CaseInsensitiveStringMap(newOptions))

    val newWChild = relProject.map(p => p.copy(child = newRel)).getOrElse(newRel)
    val newW = w.copy(child = newWChild)
    val newFChild = midProject.map(p => p.copy(child = newW)).getOrElse(newW)
    Some(f.copy(child = newFChild))
  }
}

/** `spark.sql.extensions`-compatible installer:
  * {{{ .config("spark.sql.extensions", "graft.plans.GraftExtensions") }}}
  * or `builder.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import graft.functions.{CassandraDecode, CassandraValidatorString}

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(s"$what must be a string literal")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SliceTopKPushdown)
    e.injectFunction((
      new FunctionIdentifier("cassandra_decode"),
      new ExpressionInfo(classOf[CassandraDecode].getName, "cassandra_decode"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "usage: cassandra_decode(bytes, 'type')")
        CassandraDecode(exprs.head,
          CassandraDecode.parseType(litString(exprs(1), "decode type")))
      }))
    e.injectFunction((
      new FunctionIdentifier("sign_sketch"),
      new ExpressionInfo(classOf[graft.functions.SignSketchExpr].getName, "sign_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 1, "usage: sign_sketch(array<double>)")
        graft.functions.SignSketchExpr(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("sketch_hamming"),
      new ExpressionInfo(classOf[graft.functions.SketchHamming].getName, "sketch_hamming"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "usage: sketch_hamming(array<bigint>, array<bigint>)")
        graft.functions.SketchHamming(exprs.head, exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[graft.functions.MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 1, "usage: minhash_signature(hash BIGINT)")
        graft.functions.MinHashSignature(exprs.head).toAggregateExpression()
      }))
    e.injectFunction((
      new FunctionIdentifier("minhash_signature_arr"),
      new ExpressionInfo(classOf[graft.functions.MinHashSignatureArr].getName, "minhash_signature_arr"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 1, "usage: minhash_signature_arr(array<bigint>)")
        graft.functions.MinHashSignatureArr(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[graft.functions.ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 1, "usage: shingle_hashes(text)")
        graft.functions.ShingleHashes(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[graft.functions.MinHashBands].getName, "minhash_bands"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 1, "usage: minhash_bands(array<bigint>)")
        graft.functions.MinHashBands(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 1, "usage: simhash64(array<bigint>)")
        graft.functions.SimHash64(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("cassandra_validator"),
      new ExpressionInfo(classOf[CassandraValidatorString].getName, "cassandra_validator"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "usage: cassandra_validator(bytes, 'ValidatorType')")
        CassandraValidatorString(exprs.head, litString(exprs(1), "validator name"))
      }))
  }
}
