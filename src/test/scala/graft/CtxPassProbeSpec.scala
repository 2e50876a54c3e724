package graft

import graft.sources.cassandralike._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Planning-cost pins for the indexed-aggregate proof context (VERDICT
  * r15 #4): the base+index sidecar walk is the dominant planning IO, so
  * one query's planning must bound how many walks it pays, and a repeated
  * grouped offer on one builder must hit the per-extraCols memo. */
class CtxPassProbeSpec extends SparkSpec {

  test("grouped+scalar planning bounds its proof walks; repeat offers hit the memo") {
    val sp = spark; import sp.implicits._
    val rows = (1L to 400L).map(i => (i, s"g${i % 4}", i % 7, i * 2))
    val dir = Seed.table(spark, sfDir, "spec_ctxprobe",
      rows.toDF("id", "src", "w", "v"),
      props = Map(Options.IndexColumns -> "src,w"))

    // one planning of a filtered grouped histogram: the memoized base ctx
    // (1 walk) + the group column's extra-col proof (1 walk) — never more
    CellScanBuilder.contextPasses.set(0)
    Seed.read(spark, dir).filter(col("w") === 3L)
      .groupBy(col("src")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect()
    assert(CellScanBuilder.contextPasses.get() <= 2,
      s"filtered-grouped planning walked ${CellScanBuilder.contextPasses.get()}× (want ≤2)")

    // scalar: exactly the one memoized pass
    CellScanBuilder.contextPasses.set(0)
    Seed.read(spark, dir).filter(col("w") === 3L)
      .agg(count(lit(1)).as("n")).collect()
    assert(CellScanBuilder.contextPasses.get() <= 1,
      s"scalar planning walked ${CellScanBuilder.contextPasses.get()}× (want ≤1)")

    // repeated grouped offers on ONE builder: the second must cost ZERO
    // additional walks (the per-extraCols memo)
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
    val meta = CellStore.readMeta(dir).get
    val table = new CassandraLikeTable(dir, dir,
      StructType.fromDDL(meta.schemaDdl), Some(meta.mapping), meta.properties)
    val m = new java.util.HashMap[String, String]()
    m.put(Options.Path, dir)
    val b = table.newScanBuilder(new CaseInsensitiveStringMap(m))
      .asInstanceOf[CellScanBuilder]
    val agg = new Aggregation(Array(new CountStar()),
      Array(Expressions.column("src")))
    CellScanBuilder.contextPasses.set(0)
    val first = b.supportCompletePushDown(agg)
    val afterFirst = CellScanBuilder.contextPasses.get()
    assert(first, "unfiltered histogram must prove complete")
    val second = b.supportCompletePushDown(agg)
    assert(second)
    assert(CellScanBuilder.contextPasses.get() == afterFirst,
      s"repeat offer re-walked: $afterFirst -> ${CellScanBuilder.contextPasses.get()}")
  }
}
