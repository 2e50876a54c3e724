package graft

import graft.sources.cassandralike._
import org.apache.spark.sql.functions._

/** Pins exact reader-side evaluation of pushed predicates on types whose
  * comparison FilterEval must reproduce bit-for-bit — in particular
  * BinaryType (ADVICE r15 high): a pushed equality/IN/comparison on a
  * binary ROW KEY is accepted (not residual — Spark plants no re-filter),
  * and a speculative disjunction with a binary-indexed leaf must not drop
  * rows matching only that branch. */
class FilterEvalExactSpec extends SparkSpec {

  private def binDf = {
    val sp = spark; import sp.implicits._
    Seq(
      (Array[Byte](1, 2), 10L, "a"),
      (Array[Byte](1, 3), 20L, "b"),
      (Array[Byte](-1, 0), 30L, "c"), // 0xFF high byte: unsigned order
      (Array[Byte](2), 40L, "d")
    ).toDF("k", "v", "s")
  }

  test("binary row key: pushed equality / IN / range return matching rows") {
    val dir = Seed.table(spark, sfDir, "spec_binkey", binDf)
    val df = Seed.read(spark, dir)

    val eq = df.filter(col("k") === lit(Array[Byte](1, 3))).collect()
    assert(eq.map(_.getLong(1)).toSeq == Seq(20L), s"eq got ${eq.toSeq}")

    val in = df.filter(col("k").isin(Array[Byte](1, 2), Array[Byte](2)))
      .collect().map(_.getLong(1)).sorted
    assert(in.toSeq == Seq(10L, 40L), s"in got ${in.toSeq}")

    // unsigned byte order: 0xFF sorts ABOVE 0x02 (Spark binary order)
    val gt = df.filter(col("k") > lit(Array[Byte](1, 3)))
      .collect().map(_.getLong(1)).sorted
    assert(gt.toSeq == Seq(30L, 40L), s"gt got ${gt.toSeq}")
  }

  test("binary indexed cell column: speculative equality keeps matching rows") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Array[Byte](9, 9), 100L),
      (2L, Array[Byte](7), 200L),
      (3L, Array[Byte](9, 9), 300L)
    ).toDF("id", "b", "w")
    val dir = Seed.table(spark, sfDir, "spec_binidx", df,
      props = Map(Options.IndexColumns -> "b"))
    val got = Seed.read(spark, dir)
      .filter(col("b") === lit(Array[Byte](9, 9)))
      .collect().map(_.getLong(2)).sorted
    assert(got.toSeq == Seq(100L, 300L), s"got ${got.toSeq}")
  }

  test("disjunction with a binary-indexed leaf keeps rows matching only it") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Array[Byte](9, 9), 5L),   // matches only the binary branch
      (2L, Array[Byte](7), 500L),    // matches only the numeric branch
      (3L, Array[Byte](1), 6L)       // matches neither
    ).toDF("id", "b", "w")
    val dir = Seed.table(spark, sfDir, "spec_binidx_or", df,
      props = Map(Options.IndexColumns -> "b,w"))
    val got = Seed.read(spark, dir)
      .filter(col("b") === lit(Array[Byte](9, 9)) || col("w") > 100L)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L), s"got ${got.toSeq}")
  }

  test("binary IN on indexed column probes by value, not reference") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Array[Byte](4, 4)),
      (2L, Array[Byte](5))
    ).toDF("id", "b")
    val dir = Seed.table(spark, sfDir, "spec_binidx_in", df,
      props = Map(Options.IndexColumns -> "b"))
    val got = Seed.read(spark, dir)
      .filter(col("b").isin(Array[Byte](4, 4)))
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L), s"got ${got.toSeq}")
  }
}
