package graft.sources.cassandralike

import org.apache.spark.sql.types._

/** The `cassandra.columns.mapping` DSL: how a declared (Hive/Spark) schema
  * maps onto schemaless cell storage.
  *
  * Semantics reproduced from the reference (cited file:line are into
  * /root/reference):
  *   - tokens `:key`, `:column`, `:subcolumn`, `:value` and the trailing-colon
  *     `cf:` whole-family map form (serde/AbstractColumnSerDe.java:61-64,
  *     serde/CassandraColumnSerDe.java:66-81);
  *   - arity must match the declared schema
  *     (serde/CassandraColumnSerDe.java:57-63);
  *   - auto-derivation when no mapping is given: first column becomes `:key`,
  *     the rest map by name (serde/AbstractColumnSerDe.java:206-252,266-274);
  *   - tables whose columns are exactly
  *     `row_key/column_name[/sub_column_name]/value` auto-transpose
  *     (serde/AbstractColumnSerDe.java:56-59,216-242);
  *   - a mapping is transposed iff it contains `:column`, in which case
  *     `:value` is required (serde/AbstractColumnSerDe.java:373-408).
  */
sealed trait FieldRole
object FieldRole {
  /** The row/partition key (`:key`). */
  case object Key extends FieldRole
  /** A named static cell (regular mapping). */
  final case class Cell(cellName: String) extends FieldRole
  /** Whole column family surfaced as map<string,string> (`cf:`). */
  case object FamilyMap extends FieldRole
  /** Transposed: the cell name (`:column`). */
  case object TransColumn extends FieldRole
  /** Transposed super: the sub-cell name (`:subcolumn`). */
  case object TransSubColumn extends FieldRole
  /** Transposed: the cell value (`:value`). */
  case object TransValue extends FieldRole
}

final case class MappedField(name: String, dataType: DataType, role: FieldRole)

final case class ColumnMapping(fields: Seq[MappedField]) {
  val transposed: Boolean = fields.exists(_.role == FieldRole.TransColumn)
  val hasSubColumn: Boolean = fields.exists(_.role == FieldRole.TransSubColumn)
  val keyField: MappedField = fields.find(_.role == FieldRole.Key).get
  def field(role: FieldRole): MappedField = fields.find(_.role == role).get
  /** Regular-mapping cells, in declaration order. */
  def cellFields: Seq[MappedField] =
    fields.collect { case f @ MappedField(_, _, FieldRole.Cell(_)) => f }
  def familyMapField: Option[MappedField] =
    fields.find(_.role == FieldRole.FamilyMap)
  def schema: StructType =
    StructType(fields.map(f => StructField(f.name, f.dataType)))
}

object ColumnMapping {
  val KEY = ":key"
  val COLUMN = ":column"
  val SUBCOLUMN = ":subcolumn"
  val VALUE = ":value"

  /** Column names that auto-transpose (serde/AbstractColumnSerDe.java:56-59). */
  private val transposedNames3 = Seq("row_key", "column_name", "value")
  private val transposedNames4 =
    Seq("row_key", "column_name", "sub_column_name", "value")

  /** Derive the mapping string for a schema with no explicit mapping
    * (serde/AbstractColumnSerDe.java:206-274). */
  def auto(schema: StructType): String = {
    val names = schema.fieldNames.map(_.toLowerCase).toSeq
    if (names == transposedNames3) s"$KEY,$COLUMN,$VALUE"
    else if (names == transposedNames4) s"$KEY,$COLUMN,$SUBCOLUMN,$VALUE"
    else (KEY +: schema.fieldNames.tail.toSeq).mkString(",")
  }

  /** Parse and validate a mapping string against the declared schema. */
  def parse(mapping: String, schema: StructType): ColumnMapping = {
    val tokens = mapping.split(",", -1).map(_.trim).toSeq
    require(tokens.size == schema.size,
      s"mapping has ${tokens.size} entries but schema has ${schema.size} columns")
    require(tokens.count(_ == KEY) == 1, s"mapping must contain exactly one $KEY")
    val fields = tokens.zip(schema.fields).map { case (tok, sf) =>
      val role = tok match {
        case KEY => FieldRole.Key
        case COLUMN => FieldRole.TransColumn
        case SUBCOLUMN => FieldRole.TransSubColumn
        case VALUE => FieldRole.TransValue
        case t if t.endsWith(":") =>
          require(sf.dataType.isInstanceOf[MapType],
            s"'$tok' (whole-family) mapping requires a map column, got ${sf.dataType}")
          FieldRole.FamilyMap
        case t => FieldRole.Cell(t)
      }
      MappedField(sf.name, sf.dataType, role)
    }
    val cm = ColumnMapping(fields)
    if (cm.transposed) {
      require(fields.exists(_.role == FieldRole.TransValue),
        s"transposed mapping requires $VALUE")
      require(fields.forall(f => f.role != FieldRole.FamilyMap &&
        !f.role.isInstanceOf[FieldRole.Cell]),
        "transposed mapping cannot mix named cells or cf: map fields")
    }
    cm
  }

  /** Parse the mapping from options, auto-deriving when absent. */
  def forTable(schema: StructType, mapping: Option[String]): ColumnMapping =
    parse(mapping.getOrElse(auto(schema)), schema)
}
