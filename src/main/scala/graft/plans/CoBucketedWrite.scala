package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

import graft.sources.cassandralike.{CassandraLikeTable, Options}

/** Shuffle-free store-to-store writes between co-bucketed cell stores.
  *
  * A cassandralike write declares `Distributions.clustered(key)` so all
  * cells of a storage row reach one task; Spark satisfies it by planting a
  * RepartitionByExpression over the write's input — an unconditional
  * hash shuffle of the full write set. But when the input IS a scan of
  * another cell store with the SAME token-bucket layout (equal bucket
  * count, same key type ⇒ identical bucket function) and the target key
  * column is fed directly by the source's key attribute, the scan's splits
  * already satisfy — and exceed — that distribution: every split is a
  * key-range slice of ONE source bucket, and the row's target bucket
  * equals its source bucket, so each task writes exactly one segment of
  * exactly one target bucket. This rule removes the redundant repartition
  * (keeping the write's local sort), turning derived-table / re-index /
  * CDC-materialization pipelines between same-layout stores into map-only
  * jobs — at 100 TB the elided shuffle is the whole job's network bill.
  *
  * Runs with the injected optimizer rules, which Spark applies after the
  * early-pushdown batch where V2Writes plants the repartition. */
object CoBucketedWrite extends Rule[LogicalPlan] {

  /** Install on a session. This must run in the LAST optimizer batch
    * ("User Provided Optimizers" via experimental.extraOptimizations):
    * every SparkSessionExtensions hook — operator-optimization rules AND
    * pre-CBO rules — runs before the early-pushdown batch where V2Writes
    * plants the repartition this rule elides (verified against the 4.1
    * batch order: Pre CBO Rules < Early Filter and Projection Push-Down).
    * Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  private def buckets(t: CassandraLikeTable): Int =
    t.tableProps.get(Options.Buckets).map(_.toInt).getOrElse(Options.DefaultBuckets)

  /** The attribute (if any) that feeds output ordinal `i` of `plan`,
    * traced through Projects that alias/forward plain attributes. */
  private def tracedAttr(plan: LogicalPlan, i: Int): Option[(Attribute, LogicalPlan)] =
    plan match {
      case p: Project => p.projectList(i) match {
        case a: AttributeReference => down(p.child, a)
        case Alias(a: AttributeReference, _) => down(p.child, a)
        case _ => None
      }
      case f: Filter => down(f.child, f.output(i))
      case other if other.output.isDefinedAt(i) => Some((other.output(i), other))
      case _ => None
    }

  private def down(plan: LogicalPlan, a: Attribute): Option[(Attribute, LogicalPlan)] =
    plan.output.indexWhere(_.exprId == a.exprId) match {
      case -1 => None
      case i => tracedAttr(plan, i)
    }

  /** True iff `query`'s target-key ordinal is fed by the key attribute of a
    * cell-store scan whose bucket layout equals the target's. */
  private def coBucketed(target: CassandraLikeTable, query: LogicalPlan): Boolean = {
    val keyOrdinal = target.tableSchema.fieldIndex(target.mapping.keyField.name)
    tracedAttr(query, keyOrdinal) match {
      case Some((attr, scan: DataSourceV2ScanRelation)) =>
        scan.relation.table match {
          case src: CassandraLikeTable =>
            attr.name == src.mapping.keyField.name &&
              src.mapping.keyField.dataType == target.mapping.keyField.dataType &&
              buckets(src) == buckets(target) &&
              // key byte form AND range layout decide the bucket a key
              // routes to — a mixed-encoding or mixed-bounds pipeline
              // must keep its shuffle
              src.keyCodec.ordered == target.keyCodec.ordered &&
              src.rangeDigest == target.rangeDigest
          case _ => false
        }
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case w: V2WriteCommand => w.table match {
      case rel: DataSourceV2Relation => rel.table match {
        case target: CassandraLikeTable =>
          w.query match {
            case s @ Sort(_, false, r: RepartitionByExpression, _)
                if r.optNumPartitions.isEmpty && coBucketed(target, r.child) =>
              w.withNewQuery(s.copy(child = r.child))
            case r: RepartitionByExpression
                if r.optNumPartitions.isEmpty && coBucketed(target, r.child) =>
              w.withNewQuery(r.child)
            case _ => w
          }
        case _ => w
      }
      case _ => w
    }
    case _ => plan
  }
}
