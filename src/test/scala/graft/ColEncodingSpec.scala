package graft

import graft.sources.cassandralike._
import org.apache.spark.sql.functions._

/** `column.encoding = 'ordered'` — the clustering-column twin of the
  * ordered key encoding: transposed :column bytes store through the same
  * monotone maps, so numeric/timestamp clustering columns gain per-key
  * ordering claims, slice TopN, and the slice-window run/span seeks that
  * string columns already have. */
class ColEncodingSpec extends SparkSpec {

  private val props = Map(
    Options.ColumnEncoding -> "ordered", Options.Buckets -> "4")

  test("ordered BIGINT clustering: readback, lookup, window, negatives") {
    val sp = spark; import sp.implicits._
    val src = (for {
      k <- Seq("k0", "k1", "k2")
      c <- Seq(-50L, -10L, -1L, 0L, 5L, 100L)
    } yield (k, c, s"$k@$c")).toDF("row_key", "column_name", "value")
    val store = Seed.table(spark, sfDir, "spec_colenc", src, props = props)
    val back = Seed.read(spark, store)
    assert(back.count() == 18)
    // sign-crossing range on the clustering column: exact under the
    // ordered byte window (negatives first)
    val ranged = back.filter($"column_name" >= -10L && $"column_name" < 6L)
    assert(ranged.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ==
      (for (k <- Seq("k0", "k1", "k2"); c <- Seq(-10L, -1L, 0L, 5L)) yield (k, c)).sorted)
    // multi-point slice (colLookup) over the ordered bytes
    val in = back.filter($"column_name".isin(-50L, 100L))
    assert(in.count() == 6)
    assert(back.filter($"column_name" === -1L).count() == 3)
    // per-key column ordering claim -> slice TopN pushes for ordered cols
    val topn = Seed.read(spark, store)
      .orderBy($"row_key", $"column_name").limit(4)
    val scan = topn.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    assert(scan.description().contains("Limit: 4"),
      s"ordered-col TopN not pushed: ${scan.description()}")
    assert(topn.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("k0", -50L), ("k0", -10L), ("k0", -1L), ("k0", 0L)))
  }

  test("disjoint segment col windows skip runs through the pushed range") {
    val sp = spark; import sp.implicits._
    val old = (0 until 500).map(i => ("hot", i.toLong, s"v$i"))
      .toDF("row_key", "column_name", "value")
    val store = Seed.table(spark, sfDir, "spec_colenc_window", old, props = props)
    val fresh = (500 until 1000).map(i => ("hot", i.toLong, s"v$i"))
      .toDF("row_key", "column_name", "value")
    Seed.append(fresh, store, Map(Options.WriteTimestamp -> "2"))
    val q = Seed.read(spark, store)
      .filter($"column_name" >= 100L && $"column_name" <= 149L)
    assert(q.count() == 50)
    // drain readers: the fresh segment's [500, 1000) window is disjoint
    // from the pushed [100, 149] range -> its run is never read
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    val batch = scan.toBatch
    val factory = batch.createReaderFactory()
    var colSkipped = 0L
    var merged = 0L
    batch.planInputPartitions().foreach { p =>
      val r = factory.createReader(p)
      try { while (r.next()) r.get() } finally {
        r.currentMetricsValues().foreach { m =>
          if (m.name() == "runsColSkipped") colSkipped += m.value()
          if (m.name() == "cellsMerged") merged += m.value()
        }
        r.close()
      }
    }
    assert(colSkipped >= 1, s"fresh run must col-window skip: $colSkipped")
    assert(merged == 50, s"window must filter the merge exactly: $merged")
  }

  test("typed slice.start/finish options drive the same numeric window seeks") {
    val sp = spark; import sp.implicits._
    val old = (0 until 500).map(i => ("hot", i.toLong, s"v$i"))
      .toDF("row_key", "column_name", "value")
    val store = Seed.table(spark, sfDir, "spec_colenc_sliceopt", old, props = props)
    val fresh = (500 until 1000).map(i => ("hot", i.toLong, s"v$i"))
      .toDF("row_key", "column_name", "value")
    Seed.append(fresh, store, Map(Options.WriteTimestamp -> "2"))

    def drain(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val scan = df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.get
      val batch = scan.toBatch
      val factory = batch.createReaderFactory()
      var colSkipped = 0L; var merged = 0L; var rows = 0L
      batch.planInputPartitions().foreach { p =>
        val r = factory.createReader(p)
        try { while (r.next()) { r.get(); rows += 1 } } finally {
          r.currentMetricsValues().foreach { m =>
            if (m.name() == "runsColSkipped") colSkipped += m.value()
            if (m.name() == "cellsMerged") merged += m.value()
          }
          r.close()
        }
      }
      (rows, merged, colSkipped)
    }

    // the PUSHED form (reference point) vs the OPTION-DRIVEN form: the
    // static knobs parse '100'/'149' as typed BIGINT literals against the
    // ordered column codec, so both reads fold to the same byte window —
    // same merged cells, same disjoint-run skip, same rows. Slice bounds
    // are inclusive both ends.
    val pushed = drain(Seed.read(spark, store)
      .filter($"column_name" >= 100L && $"column_name" <= 149L))
    val optioned = drain(Seed.read(spark, store, Map(
      Options.SliceStart -> "100", Options.SliceFinish -> "149")))
    assert(pushed._1 == 50 && optioned._1 == 50,
      s"both forms must return the 50 sliced rows: $pushed vs $optioned")
    assert(optioned._2 == pushed._2,
      s"option-driven slice must merge the same cells: ${optioned._2} vs ${pushed._2}")
    assert(optioned._3 >= 1, s"disjoint run must skip under options: ${optioned._3}")
    // result parity, values included
    val viaOpts = Seed.read(spark, store, Map(
        Options.SliceStart -> "100", Options.SliceFinish -> "149"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(viaOpts == (100 to 149).map(i => ("hot", i.toLong, s"v$i")))
  }

  test("row-level DML composes with ordered clustering columns") {
    spark.conf.set("spark.sql.catalog.cassandralike",
      classOf[CassandraLikeCatalog].getName)
    spark.conf.set("spark.sql.catalog.cassandralike.warehouse",
      s"${Seed.storeRoot(sfDir)}/warehouse")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cassandralike.ks")
    spark.sql("DROP TABLE IF EXISTS cassandralike.ks.colenc_dml")
    spark.sql(
      """CREATE TABLE cassandralike.ks.colenc_dml
        |  (row_key STRING, column_name BIGINT, value BIGINT)
        |USING cassandralike
        |OPTIONS (mapping ':key,:column,:value')
        |TBLPROPERTIES ('buckets' = '2', 'column.encoding' = 'ordered')""".stripMargin)
    spark.sql(
      """INSERT INTO cassandralike.ks.colenc_dml VALUES
        |  ('a', -5, 1), ('a', 0, 2), ('a', 7, 3), ('b', -5, 10)""".stripMargin)
    spark.sql(
      "UPDATE cassandralike.ks.colenc_dml SET value = 99 WHERE column_name = -5")
    spark.sql(
      "DELETE FROM cassandralike.ks.colenc_dml WHERE row_key = 'a' AND column_name = 7")
    val got = spark.table("cassandralike.ks.colenc_dml").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", -5L, 99L), ("a", 0L, 2L), ("b", -5L, 99L)), s"got $got")
  }

  test("column.encoding validation: transposed-only, locked, typed") {
    val sp = spark; import sp.implicits._
    // regular mappings reject the property up front
    intercept[Exception] {
      val dir = Seed.table(spark, sfDir, "spec_colenc_bad",
        Seq((1L, "x")).toDF("k", "v"),
        props = Map(Options.ColumnEncoding -> "ordered"))
      val meta = CellStore.readMeta(dir).get
      new CassandraLikeTable(dir, dir,
        org.apache.spark.sql.types.StructType.fromDDL(meta.schemaDdl),
        Some(meta.mapping), meta.properties).schema()
    }
    // string columns reject 'ordered' (already order-identical as bytes)
    intercept[Exception](Seed.table(spark, sfDir, "spec_colenc_bad2",
      Seq(("k", "c", "v")).toDF("row_key", "column_name", "value"),
      props = Map(Options.ColumnEncoding -> "ordered")))
    // locked once segments exist
    spark.conf.set("spark.sql.catalog.cassandralike",
      classOf[CassandraLikeCatalog].getName)
    spark.conf.set("spark.sql.catalog.cassandralike.warehouse",
      s"${Seed.storeRoot(sfDir)}/warehouse")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cassandralike.ks")
    spark.sql("DROP TABLE IF EXISTS cassandralike.ks.colenc_lock")
    spark.sql(
      """CREATE TABLE cassandralike.ks.colenc_lock
        |  (row_key STRING, column_name BIGINT, value BIGINT)
        |USING cassandralike
        |OPTIONS (mapping ':key,:column,:value')
        |TBLPROPERTIES ('buckets' = '2', 'column.encoding' = 'ordered')""".stripMargin)
    spark.sql("INSERT INTO cassandralike.ks.colenc_lock VALUES ('a', 1, 1)")
    intercept[Exception](spark.sql(
      "ALTER TABLE cassandralike.ks.colenc_lock SET TBLPROPERTIES ('column.encoding' = 'bytes')"))
  }
}
