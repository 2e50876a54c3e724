package graft

/** Executes every registered query on sf0.001 (plan + run + schema sanity).
  * Exact-value verification against DuckDB happens driver-side; here we pin
  * a few hand-checkable invariants. */
class RelationalSpec extends SparkSpec {

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs") {
      val df = q.fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      // every output column explicitly named (no auto-generated agg names)
      df.columns.foreach(c => assert(!c.contains("("), s"unaliased column $c"))
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("cross join cardinality = |region| * |nation|") {
    val df = SparkEntry.queries("rel_join_cross")(spark, sfDir)
    assert(df.count() == 5L * 25L)
  }

  test("q1 aggregates are grouped by (returnflag, linestatus)") {
    val rows = SparkEntry.queries("rel_q1_pricing_summary")(spark, sfDir).collect()
    assert(rows.length <= 6 && rows.nonEmpty)
    val counts = rows.map(_.getAs[Long]("count_order"))
    assert(counts.forall(_ > 0))
  }

  test("every oracle name has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
