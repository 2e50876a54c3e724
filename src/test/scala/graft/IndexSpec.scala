package graft

import graft.sources.cassandralike._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Secondary-index contract (Index.scala): candidate pruning at planning,
  * stale-entry soundness under overwrite/delete, conjunct intersection,
  * empty-result short-circuit, overwrite-truncate hygiene, and the
  * layout-property lock. */
class IndexSpec extends SparkSpec {

  private def seed(name: String, idx: String,
      rows: Seq[(Long, String, Double)]): String = {
    val sp = spark; import sp.implicits._
    Seed.table(spark, sfDir, name, rows.toDF("id", "name", "bal"),
      props = Map(Options.IndexColumns -> idx))
  }

  private def tableOf(dir: String): CassandraLikeTable = {
    val meta = CellStore.readMeta(dir).get
    new CassandraLikeTable(dir, dir, StructType.fromDDL(meta.schemaDdl),
      Some(meta.mapping), meta.properties)
  }

  /** Planned partitions for pushed filters, through the real builder. */
  private def partitions(dir: String, filters: Array[Filter]): Int = {
    val t = tableOf(dir)
    val b = t.newScanBuilder(new CaseInsensitiveStringMap(
      java.util.Map.of(Options.Path, dir)))
    b.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownFilters]
      .pushFilters(filters)
    b.build().toBatch.planInputPartitions().length
  }

  test("indexed equality plans a point lookup, not a table scan") {
    val rows = (1L to 2000L).map(i => (i, s"name$i", i * 1.0))
    val dir = seed("spec_idx_prune", "name", rows)
    val full = partitions(dir, Array.empty)
    val indexed = partitions(dir, Array(EqualTo("name", "name1234")))
    assert(full > 10, s"full scan should plan many buckets, got $full")
    assert(indexed == 1, s"indexed lookup should plan 1 bucket, got $indexed")
    // and the lookup returns exactly the row
    val got = Seed.read(spark, dir).filter(col("name") === "name1234").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1234L))
  }

  test("stale entries are re-filtered: overwrite and delete stay invisible") {
    val dir = seed("spec_idx_stale", "name",
      (1L to 50L).map(i => (i, s"n$i", 0.0)))
    val sp = spark; import sp.implicits._
    // overwrite id 7's indexed value n7 -> CHANGED (newer write epoch)
    Seed.append(Seq((7L, "CHANGED", 1.0)).toDF("id", "name", "bal"), dir,
      Map(Options.WriteTimestamp -> "2"))
    // delete id 9 outright
    tableOf(dir).deleteWhere(Array[Filter](EqualTo("id", 9L)))
    def lookup(v: String): Seq[Long] =
      Seed.read(spark, dir).filter(col("name") === v).collect()
        .map(_.getLong(0)).toSeq
    assert(lookup("n7").isEmpty, "stale posting for overwritten value must re-filter")
    assert(lookup("CHANGED") == Seq(7L))
    assert(lookup("n9").isEmpty, "posting for deleted row must re-filter")
    assert(lookup("n8") == Seq(8L))
  }

  test("conjunct intersection and provably-empty lookups") {
    val dir = seed("spec_idx_conj", "name,bal".replace(",bal", ""), // single idx col
      (1L to 20L).map(i => (i, s"g${i % 3}", i * 1.0)))
    // conjunction: indexed candidates AND a non-indexed residual predicate
    val got = Seed.read(spark, dir)
      .filter(col("name") === "g1" && col("bal") > 15.0)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(16L, 19L))
    // a value that was never written: zero partitions, empty result
    assert(partitions(dir, Array(EqualTo("name", "nope"))) == 0)
    assert(Seed.read(spark, dir).filter(col("name") === "nope").count() == 0)
  }

  test("INSERT OVERWRITE truncates the index with the base") {
    val sp = spark; import sp.implicits._
    val dir = seed("spec_idx_trunc", "name", (1L to 10L).map(i => (i, s"x$i", 0.0)))
    Seq((100L, "fresh", 1.0)).toDF("id", "name", "bal")
      .write.format("cassandralike")
      .option(Options.Path, dir).option(Options.WriteTimestamp, "2")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
    // old postings gone with the old base; new index serves the new data
    assert(Seed.read(spark, dir).filter(col("name") === "x3").count() == 0)
    val got = Seed.read(spark, dir).filter(col("name") === "fresh").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(100L))
    val idxSegs = CellStore.allSegmentFiles(Index.dir(dir, "name"))
      .values.flatten.size
    assert(idxSegs >= 1, "overwrite must rebuild, not just truncate, the index")
  }

  test("double index keys: -0.0 probes find +0.0 postings and vice versa") {
    val sp = spark; import sp.implicits._
    val dir = Seed.table(spark, sfDir, "spec_idx_zero",
      Seq((1L, 0.0d), (2L, -0.0d), (3L, 1.5d)).toDF("id", "bal"),
      props = Map(Options.IndexColumns -> "bal"))
    def lookup(v: Double): Set[Long] =
      Seed.read(spark, dir).filter(col("bal") === v).collect()
        .map(_.getLong(0)).toSet
    // SQL equality: -0.0 = 0.0 — both probes must return both rows
    assert(lookup(0.0d) == Set(1L, 2L), "+0.0 probe")
    assert(lookup(-0.0d) == Set(1L, 2L), "-0.0 probe")
    assert(lookup(1.5d) == Set(3L))
  }

  test("index.columns is locked once segments exist; transposed rejected") {
    intercept[IllegalArgumentException] {
      Index.columns(ColumnMapping.parse(":key,:column,:value",
        StructType.fromDDL("row_key STRING,column_name STRING,value STRING")),
        k => if (k == Options.IndexColumns) Some("value") else None)
    }
    intercept[IllegalArgumentException] {
      Index.columns(ColumnMapping.parse(":key,name", // 'nope' is not a cell
        StructType.fromDDL("id BIGINT,name STRING")),
        k => if (k == Options.IndexColumns) Some("nope") else None)
    }
    assert(Options.LayoutProperties.contains(Options.IndexColumns))
  }
}
