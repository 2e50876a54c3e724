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

  test("registry integrity: unique names, oracles reference known tables only") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    // a duplicate would silently shadow its twin in SparkEntry.queries
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    // every oracle runs over the driver's fixed view set; a typo'd table
    // name would only surface as a driver-side DuckDB error next round
    val known = Tables.names.toSet
    val tablePat = "(?i)\\b(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // strip CTE names defined in the statement itself
      val ctes = "(?i)(?:WITH\\s+RECURSIVE\\s+|WITH\\s+|,\\s*)([a-z_][a-z0-9_]*)\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1)).toSet
      // unnest/range/generate_series are DuckDB table functions, not tables
      val builtins = Set("unnest", "range", "generate_series")
      tablePat.findAllMatchIn(sql).map(_.group(1)).foreach { t =>
        assert(known(t) || ctes(t) || builtins(t),
          s"$name oracle references unknown table '$t'")
      }
    }
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

  test("approx_count_distinct is within 5% of exact on every group") {
    import org.apache.spark.sql.functions._
    val rows = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(approx_count_distinct(col("o_custkey"), 0.01).as("a"),
        countDistinct(col("o_custkey")).as("e"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getAs[Long]("a"), r.getAs[Long]("e"))
      assert(math.abs(a - e).toDouble / e < 0.05, s"approx=$a exact=$e")
    }
  }

  test("distribute/cluster query reports sorted_ok on every group") {
    val rows = SparkEntry.queries("rel_distribute_cluster")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("sorted_ok")))
  }

  test("bloom semi-join reduction actually prunes the fact side, UDF-free") {
    import org.apache.spark.sql.functions._
    val sp = spark; import sp.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dim = Tables.load(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 250000)
    val bloom = dim.agg(expr("bloom_agg(xxhash64(o_orderkey), 100000L)")).scalar()
    val li = Tables.load(spark, sfDir, "lineitem")
    val total = li.count().toDouble
    val probed = li
      .filter(call_function("bloom_might_contain", bloom, xxhash64($"l_orderkey")))
    val passed = probed.collect().length.toDouble // executes probed's own plan
    val trueFrac = dim.count().toDouble /
      Tables.load(spark, sfDir, "orders").count().toDouble
    // the bloom must cut the shuffled fact rows to roughly the dim's
    // selectivity (1% fpp of slack) — a no-op filter means the reduction
    // silently stopped reducing
    assert(passed / total < trueFrac + 0.05,
      f"bloom passed ${passed / total}%.3f of fact rows vs dim selectivity $trueFrac%.3f")
    // native expressions, not a Scala UDF: the probe must live inside
    // whole-stage codegen (a UDF blocks codegen on the fact scan)
    val phys = probed.queryExecution.executedPlan.toString
    assert(!phys.contains("UDF"), s"Scala UDF leaked into the bloom probe plan")
    assert(phys.contains("might_contain"), "native bloom probe missing from plan")
    // "*(n)" is the executed-plan string's whole-stage-codegen marker
    assert(phys.contains("*(1) Filter might_contain"),
      s"probe fell out of whole-stage codegen:\n$phys")
  }
}
