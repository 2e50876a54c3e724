package graft

import graft.sources.cassandralike._
import org.apache.spark.sql.functions._

/** `sub.encoding = 'ordered'` — the :subcolumn twin of column.encoding:
  * super-mapping sub bytes store through the same monotone maps, so
  * numeric/timestamp sub-columns gain the per-key (column, sub) ordering
  * claim and three-key TopN pushdown. */
class SubEncodingSpec extends SparkSpec {

  private val props = Map(
    Options.SubEncoding -> "ordered", Options.Buckets -> "4")
  private val mapping = Some(":key,:column,:subcolumn,:value")

  test("ordered BIGINT sub-column: readback, negatives, 3-key TopN pushes") {
    val sp = spark; import sp.implicits._
    val src = (for {
      k <- Seq("k0", "k1")
      c <- Seq("c0", "c1")
      s <- Seq(-50L, -1L, 0L, 7L)
    } yield (k, c, s, s"$k/$c@$s")).toDF("row_key", "column_name", "sub", "value")
    val store = Seed.table(spark, sfDir, "spec_subenc", src,
      mapping = mapping, props = props)
    val back = Seed.read(spark, store)
    assert(back.count() == 16)
    // sign-crossing range on the sub column: exact under the ordered bytes
    val ranged = back.filter($"sub" >= -1L && $"sub" < 7L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(ranged == (for (k <- Seq("k0", "k1"); c <- Seq("c0", "c1");
      s <- Seq(-1L, 0L)) yield (k, c, s)).sorted)
    // three-key natural order -> partition TopN prefix pushes; plain
    // big-endian sub bytes would sort -50 AFTER 7 and decline
    val topn = Seed.read(spark, store)
      .orderBy($"row_key", $"column_name", $"sub").limit(3)
    val scan = topn.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    assert(scan.description().contains("Limit: 3"),
      s"3-key TopN not pushed: ${scan.description()}")
    assert(topn.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("k0", "c0", -50L), ("k0", "c0", -1L), ("k0", "c0", 0L)))
    // ALL-DESCENDING pushes as the suffix form ("latest N" tail); mixed
    // ASC/DESC is not a prefix OR suffix of the natural order and declines
    def scanDesc(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.get.description()
    val topnD = Seed.read(spark, store)
      .orderBy($"row_key".desc, $"column_name".desc, $"sub".desc).limit(3)
    assert(scanDesc(topnD).contains("LimitLast: 3"),
      s"3-key DESC TopN not pushed: ${scanDesc(topnD)}")
    assert(topnD.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("k1", "c1", 7L), ("k1", "c1", 0L), ("k1", "c1", -1L)))
    val mixed = Seed.read(spark, store)
      .orderBy($"row_key", $"column_name".desc, $"sub").limit(3)
    assert(!scanDesc(mixed).contains("Limit"),
      s"mixed-direction TopN must decline: ${scanDesc(mixed)}")
    assert(mixed.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("k0", "c1", -50L), ("k0", "c1", -1L), ("k0", "c1", 0L)))
  }

  test("plain-bytes numeric sub declines the 3-key TopN; results still exact") {
    val sp = spark; import sp.implicits._
    val src = Seq(("k", "c", -5L, "neg"), ("k", "c", 3L, "pos"))
      .toDF("row_key", "column_name", "sub", "value")
    val store = Seed.table(spark, sfDir, "spec_subenc_plain", src,
      mapping = mapping, props = Map(Options.Buckets -> "2"))
    val topn = Seed.read(spark, store)
      .orderBy($"row_key", $"column_name", $"sub").limit(1)
    val scan = topn.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    assert(!scan.description().contains("Limit: 1"),
      "plain big-endian sub bytes must decline the natural-order claim")
    assert(topn.collect().map(_.getLong(2)).toSeq == Seq(-5L))
  }

  test("typed slice.sub options match the pushed sub-range cell-for-cell") {
    val sp = spark; import sp.implicits._
    // one hot (key, col) group of 1000 BIGINT subs crossing zero, split
    // over two writes so the store holds runs with distinct sub windows
    val old = (-500 until 0).map(s => ("hot", "c0", s.toLong, s"v$s"))
      .toDF("row_key", "column_name", "sub", "value")
    val store = Seed.table(spark, sfDir, "spec_subenc_sliceopt", old,
      mapping = mapping, props = props)
    val fresh = (0 until 500).map(s => ("hot", "c0", s.toLong, s"v$s"))
      .toDF("row_key", "column_name", "sub", "value")
    Seed.append(fresh, store, Map(Options.WriteTimestamp -> "2"))

    def drain(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val scan = df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.get
      val batch = scan.toBatch
      val factory = batch.createReaderFactory()
      var subSkipped = 0L; var merged = 0L; var rows = 0L
      batch.planInputPartitions().foreach { p =>
        val r = factory.createReader(p)
        try { while (r.next()) { r.get(); rows += 1 } } finally {
          r.currentMetricsValues().foreach { m =>
            if (m.name() == "runsSubSkipped") subSkipped += m.value()
            if (m.name() == "cellsMerged") merged += m.value()
          }
          r.close()
        }
      }
      (rows, merged, subSkipped)
    }

    // PUSHED sub range (sign-crossing: ordered bytes keep -25 < 24) vs the
    // OPTION-DRIVEN static sub slice: the knobs parse '-25'/'24' as typed
    // BIGINT literals against the ordered sub codec, folding to the same
    // inclusive byte window — same merged cells, same disjoint-run skip
    // (the all-negative run is skipped whole when the window is positive).
    val pushed = drain(Seed.read(spark, store)
      .filter($"sub" >= -25L && $"sub" <= 24L))
    val optioned = drain(Seed.read(spark, store, Map(
      Options.SliceSubStart -> "-25", Options.SliceSubFinish -> "24")))
    assert(pushed._1 == 50 && optioned._1 == 50,
      s"both forms must return the 50 sliced rows: $pushed vs $optioned")
    assert(optioned._2 == pushed._2,
      s"option path must merge the same cells: ${optioned._2} vs ${pushed._2}")
    // a window entirely above zero skips the negative run outright
    val hi = drain(Seed.read(spark, store, Map(
      Options.SliceSubStart -> "100", Options.SliceSubFinish -> "149")))
    assert(hi._1 == 50 && hi._3 >= 1,
      s"positive window must run-skip the negative run: $hi")
  }

  test("sub.encoding validation: super-only, typed, locked once segments exist") {
    val sp = spark; import sp.implicits._
    // non-super mapping rejects the property
    intercept[Exception](Seed.table(spark, sfDir, "spec_subenc_bad",
      Seq((1L, "v")).toDF("k", "v"), props = Map(Options.SubEncoding -> "ordered")))
    // unsupported sub type (string) rejects 'ordered'
    intercept[Exception](Seed.table(spark, sfDir, "spec_subenc_bad2",
      Seq(("k", "c", "s", "v")).toDF("row_key", "column_name", "sub", "value"),
      mapping = mapping, props = Map(Options.SubEncoding -> "ordered")))
    // locked once segments exist (ALTER path, like its siblings)
    spark.conf.set("spark.sql.catalog.cassandralike",
      classOf[CassandraLikeCatalog].getName)
    spark.conf.set("spark.sql.catalog.cassandralike.warehouse",
      s"${Seed.storeRoot(sfDir)}/warehouse")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cassandralike.ks")
    spark.sql("DROP TABLE IF EXISTS cassandralike.ks.subenc_lock")
    spark.sql(
      """CREATE TABLE cassandralike.ks.subenc_lock (
        |  row_key STRING, column_name STRING, sub BIGINT, value STRING)
        |USING cassandralike
        |TBLPROPERTIES ('mapping' = ':key,:column,:subcolumn,:value',
        |  'sub.encoding' = 'ordered')""".stripMargin)
    spark.sql(
      "INSERT INTO cassandralike.ks.subenc_lock VALUES ('k', 'c', -1, 'v')")
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE cassandralike.ks.subenc_lock SET TBLPROPERTIES ('sub.encoding' = 'bytes')"))
    assert(e.getMessage.contains("layout") || e.getMessage.contains("sub.encoding"),
      s"unexpected: ${e.getMessage}")
    // per-read override of the pinned layout property is rejected loudly
    val tableDir = s"${Seed.storeRoot(sfDir)}/warehouse/ks/subenc_lock"
    val e2 = intercept[Exception](
      Seed.read(spark, tableDir, Map(Options.SubEncoding -> "bytes")).collect())
    assert(e2.getMessage.contains("layout property"), s"unexpected: ${e2.getMessage}")
  }
}
