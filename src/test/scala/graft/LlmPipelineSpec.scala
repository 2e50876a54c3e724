package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the LLM-pipeline operators on sf0.001 (the generic
  * run-everything loop lives in RelationalSpec; here we pin invariants the
  * DuckDB oracle can't express). */
class LlmPipelineSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  /** Brute-force 5-word-shingle Jaccard pairs >= threshold, no LSH — the
    * in-Spark reference for sketch recall. */
  private def exactPairs(threshold: Double): Set[(Long, Long)] = {
    val d = Tables.load(spark, sfDir, "documents")
    val sh = d.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, size(w)-4), i -> concat_ws(' ', slice(w, i, 5))))"))
        .as("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .filter(col("common").cast("double") / (col("na") + col("nb") - col("common")) >= threshold)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash-LSH finds exactly the true Jaccard>=0.8 pairs (full recall)") {
    val got = q("llm_dedup_minhash").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactPairs(0.8))
    assert(got.nonEmpty, "fixture should contain planted near-dups")
  }

  test("incremental dedup = full recompute restricted to delta-involving pairs") {
    val got = q("llm_dedup_incremental").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = exactPairs(0.8).filter(p => p._1 % 8 == 0 || p._2 % 8 == 0)
    assert(got == want)
    assert(want.nonEmpty, "fixture should contain delta-involving near-dups")
    // the band index persisted in the store now covers base AND delta —
    // the next batch probes it without touching this one again
    val idx = sources.cassandralike.Seed.read(spark,
      s"${sources.cassandralike.Seed.storeRoot(sfDir)}/minhash_band_index")
    val docsIndexed = idx.select(col("column_name").cast("long")).distinct().count()
    val bandedDocs = Tables.load(spark, sfDir, "documents")
      .filter(expr("size(minhash_bands(shingle_hashes(text))) > 0")).count()
    assert(docsIndexed == bandedDocs)
  }

  test("incremental dedup: constant per-run workload — store resets to the base snapshot") {
    // each run must append its delta onto IDENTICAL store state: without
    // the per-run restore the seedOnce-persistent store accrues one delta
    // segment set per rerun, so later runs scan more files than run 1
    import sources.cassandralike.Seed
    val store = s"${Seed.storeRoot(sfDir)}/minhash_band_index"
    def segCount: Int = {
      val root = java.nio.file.Paths.get(store)
      val s = java.nio.file.Files.walk(root)
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.getFileName.toString.endsWith(".bin")) }
      finally s.close()
    }
    def run(): (Set[(Long, Long)], Int) = {
      val rows = q("llm_dedup_incremental").select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (rows, segCount)
    }
    val (r1, c1) = run()
    val (r2, c2) = run()
    val (r3, c3) = run()
    assert(r1 == r2 && r2 == r3, "results must be byte-stable across reruns")
    assert(c2 == c1 && c3 == c1,
      s"every run must leave base+one-delta segments, got counts $c1/$c2/$c3")
  }

  test("segment snapshot/restore: drops post-snapshot segments, detects a mutated base") {
    import sources.cassandralike.Seed
    val sp = spark; import sp.implicits._
    val name = "spec_snapshot_store"
    val dir = s"${Seed.storeRoot(sfDir)}/$name"
    Seed.table(spark, sfDir, name, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    Seed.snapshotSegments(dir)
    def segs: Set[String] = {
      val root = java.nio.file.Paths.get(dir)
      val s = java.nio.file.Files.walk(root)
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.getFileName.toString.endsWith(".bin"))
          .map(root.relativize(_).toString).toSet }
      finally s.close()
    }
    val base = segs
    assert(base.nonEmpty)
    Seed.append(Seq((3L, "c")).toDF("id", "v"), dir)
    assert(segs != base, "append should land new segments")
    assert(Seed.restoreSegments(dir), "restore should succeed on an intact base")
    assert(segs == base, "restore must return the store to the snapshot set")
    // a vanished base segment (e.g. a compaction folded it) fails the
    // restore so the caller reseeds from scratch instead of mixing states
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, base.head))
    assert(!Seed.restoreSegments(dir))
  }

  test("incremental probe pushdown: pruned index equals full scan, declines past budget") {
    import sources.cassandralike.Seed
    q("llm_dedup_incremental").count() // seeds the band index store
    val store = s"${Seed.storeRoot(sfDir)}/minhash_band_index"
    val d = Tables.load(spark, sfDir, "documents")
    val probe = d.filter(col("doc_id") % 8 === 0).select(col("doc_id"),
        posexplode(expr("minhash_bands(shingle_hashes(text))")).as(Seq("band", "bh")))
      .select(col("doc_id"), concat_ws("#", col("band"), col("bh")).as("row_key"))
    val index = Seed.read(spark, store)
      .select(col("row_key"), col("column_name").cast("long").as("doc_ix"))
    def joined(ix: org.apache.spark.sql.DataFrame): Seq[String] =
      probe.join(ix, Seq("row_key")).select("row_key", "doc_id", "doc_ix")
        .collect().map(_.toString).sorted.toSeq
    val full = joined(index)
    assert(full.nonEmpty)
    // gate forced open (floor 0, ratio gate off): the scan narrows to the
    // probe's band keys — same rows
    assert(joined(operators.LlmPipeline.probePrunedIndex(
      index, probe, store, minIndexCells = 0L, cellsPerKey = 0L)) == full)
    // key budget exceeded: declines to the unfiltered scan — same rows
    assert(joined(operators.LlmPipeline.probePrunedIndex(
      index, probe, store, minIndexCells = 0L, maxKeys = 1,
      cellsPerKey = 0L)) == full)
    // fixture-scale default: the small-index floor declines outright
    assert(joined(operators.LlmPipeline.probePrunedIndex(
      index, probe, store)) == full)
  }

  test("simhash banding finds exactly the true Jaccard>=0.8 pairs") {
    val got = q("llm_dedup_simhash").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactPairs(0.8))
  }

  test("ngram prefix filter shrinks the candidate join input, loses no pairs") {
    val d = Tables.load(spark, sfDir, "documents")
    val grams = operators.LlmPipeline.charGrams(d)
    val prefix = operators.LlmPipeline.gramPrefixes(operators.LlmPipeline.docGramArrays(d))
    val (gTotal, pTotal) = (grams.count(), prefix.count())
    // prefix length is n - ceil(0.9n) + 1 ≈ 0.1n + 1 per doc: the candidate
    // join input must be a small fraction of the full inverted index
    assert(pTotal < gTotal / 2, s"prefix $pTotal not < half of $gTotal")
    // zero recall loss vs the naive full-index join
    val naive = grams.as("a").join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(grams.groupBy("doc_id").agg(count(lit(1)).as("na"))
        .withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .join(grams.groupBy("doc_id").agg(count(lit(1)).as("nb"))
        .withColumnRenamed("doc_id", "doc_b"), "doc_b")
      .filter(col("common").cast("double") / (col("na") + col("nb") - col("common")) >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = q("llm_dedup_ngram").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
  }

  test("ngram knobs size tasks, never semantics: result identical across sweeps") {
    // NgramVerifyBlocks partitions the verify into block pairs and
    // NgramHistBuckets sets the pre-verify bound's tightness; both are
    // physical sizing knobs — the judged pairs must be byte-identical at
    // ANY setting (a histogram too coarse may verify MORE candidates, a
    // block count of 1 collapses the pairing — neither may change rows)
    def run(blocks: Int, buckets: Int): Seq[(Long, Long, Double)] =
      operators.LlmPipeline.ngramDedup(spark, sfDir, blocks, buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val base = run(operators.LlmPipeline.NgramVerifyBlocks,
      operators.LlmPipeline.NgramHistBuckets)
    assert(base.nonEmpty, "fixture should contain near-dup pairs")
    // 0 = the judged query's auto derivation (max(2, ⌈nDocs/block⌉))
    Seq((operators.LlmPipeline.NgramVerifyBlocksAuto, 128),
      (1, 128), (3, 128), (16, 16), (5, 512)).foreach { case (b, h) =>
      assert(run(b, h) == base, s"knobs (blocks=$b, histBuckets=$h) changed the result")
    }
  }

  test("prefix stage: broadcast-map and join-regroup paths emit identical postings") {
    // NgramBroadcastVocabMax only picks the physical shape of the df attach;
    // vocabMax=0 forces the join + groupBy fallback, the default takes the
    // broadcast-map path — postings must match exactly
    val d = Tables.load(spark, sfDir, "documents")
    val docArr = operators.LlmPipeline.docGramKeys(d)
    def rows(vocabMax: Long): Set[(Long, Long, Int, Int)] =
      operators.LlmPipeline.gramPrefixes(docArr, vocabMax).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val broadcastPath = rows(operators.LlmPipeline.NgramBroadcastVocabMax)
    assert(broadcastPath.nonEmpty)
    assert(rows(0L) == broadcastPath, "fallback path diverged from broadcast path")
  }

  test("embedding sketch prefilter: few candidates, zero recall loss") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = e.count()
    val allPairs = n * (n - 1) / 2
    val candidates = operators.LlmPipeline.embeddingCandidates(e, 0.45).count()
    // random 64-dim data: ~4% of pairs clear the 1024-bit 5σ Hamming cutoff
    assert(candidates < allPairs / 5,
      s"sketch passed $candidates of $allPairs pairs — prefilter not selective")
    // exact recall: the judged result equals the brute-force cosine join
    val exact = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x*y), cast(0.0 as double), (acc, x) -> acc + x)")
        / (sqrt(expr("aggregate(a.v, cast(0.0 as double), (acc, x) -> acc + x*x)"))
          * sqrt(expr("aggregate(b.v, cast(0.0 as double), (acc, x) -> acc + x*x)"))))
      .filter(col("cos") >= 0.45)
      .select(col("a.vec_id"), col("b.vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = q("llm_dedup_embedding").select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact)
    assert(got.nonEmpty, "fixture should contain pairs above the threshold")
  }

  test("minhash_signature aggregate equals 128 independent min() columns") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, 10L), (1L, 999L), (1L, 123456L), (2L, 10L), (2L, 77L))
      .toDF("g", "h")
    val viaAgg = df.groupBy("g").agg(expr("minhash_signature(h)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val (as, bs) = (functions.MinHash.as, functions.MinHash.bs)
    val expected = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues { rows =>
        (0 until functions.MinHash.N).map(i =>
          rows.map { case (_, h) => (as(i) * h + bs(i)) % functions.MinHash.P }.min)
      }.toMap
    assert(viaAgg.keySet == expected.keySet)
    expected.foreach { case (g, sig) => assert(viaAgg(g) == sig, s"group $g") }
  }

  test("minhash_signature_arr scalar kernel equals the aggregate, groupwise") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, Seq(10L, 999L, 123456L)), (2L, Seq(10L, 77L)))
      .toDF("g", "hs")
    val viaScalar = df.select(col("g"), expr("minhash_signature_arr(hs)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaAgg = df.select(col("g"), explode(col("hs")).as("h"))
      .groupBy("g").agg(expr("minhash_signature(h)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaScalar == viaAgg)
  }

  test("shingle_hashes matches the SQL shingle set in size, per doc") {
    // hash values are intentionally different from xxhash64(shingle string);
    // the SET SIZE must match the SQL formulation exactly (same tokenization:
    // single-space split, empties kept, <5-word docs empty)
    val d = Tables.load(spark, sfDir, "documents").limit(500)
    val mismatch = d.select(
      expr("size(shingle_hashes(text))").as("kernel"),
      expr("""CASE WHEN size(split(text, ' ')) >= 5 THEN
              |size(array_distinct(transform(
              |  sequence(1, size(split(text, ' '))-4),
              |  i -> concat_ws(' ', slice(split(text, ' '), i, 5)))))
              |ELSE 0 END""".stripMargin).as("sql"))
      .filter(col("kernel") =!= col("sql")).count()
    assert(mismatch == 0)
  }

  test("simhash64 scalar kernel equals the 64-sum-column formulation") {
    val sp = spark; import sp.implicits._
    val d = Tables.load(spark, sfDir, "documents").limit(200)
    val viaScalar = d.select(col("doc_id"), expr(
      "simhash64(transform(array_distinct(split(text, ' ')), w -> xxhash64(w)))").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val words = d.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("word"))
      .withColumn("h", expr("xxhash64(word)"))
    val bitAggs = (0 until 64).map(k =>
      sum(when(expr(s"(h >> $k) & 1") === 1, 1).otherwise(-1)).as(s"b$k"))
    val viaAggs = words.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(k =>
          when(col(s"b$k") > 0, shiftleft(lit(1L), k)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaScalar == viaAggs)
  }

  test("connected components: chain, triangle, and singleton-free isolation") {
    val sp = spark; import sp.implicits._
    // chain 1-2-3-4-5 (diameter 4 — forces multiple propagation rounds),
    // triangle 10-11-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val comp = operators.LlmPipeline.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(comp(_) == 1L), s"chain collapsed wrong: $comp")
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(comp(20L) == 20L && comp(21L) == 20L)
    assert(comp.size == 10) // only nodes that appear in pairs
  }

  test("connected components: random graphs match a union-find reference") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n) {
        val a = rnd.nextInt(30).toLong; val b = rnd.nextInt(30).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap
      val got = operators.LlmPipeline.connectedComponents(
          edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"trial $trial: star CC diverges from union-find")
    }
  }

  test("embedding near-dup banding finds every planted pair, sublinearly") {
    val n = Tables.load(spark, sfDir, "embeddings").count()
    val rows = q("llm_dedup_embedding_neardup").collect()
    val got = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // every (id, id+1000000) planted pair is found — zero recall loss
    val planted = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
      .map(id => (id, id + 1000000L)).toSet
    assert(planted.subsetOf(got), s"missed ${(planted -- got).size} planted pairs")
    // and nothing below the threshold leaks through the exact verify
    assert(rows.forall(_.getAs[Double]("cos") >= 0.9))
    // candidate generation is banded: result stays ~N, not N^2
    assert(got.size < 2 * n, s"${got.size} pairs for $n vectors — not near-dup regime")
  }

  test("ann_topk returns exactly 5 ranked neighbors per query") {
    val rows = q("llm_ann_topk").collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      assert(rs.forall(r => r.getAs[Long]("neighbor") != r.getAs[Long]("qid")))
    }
  }

  test("ann_ivf approximation-ratio contract holds on every query") {
    assert(q("llm_ann_ivf").collect().forall(_.getAs[Boolean]("ratio_ok")))
  }

  test("fingerprint is deterministic across runs and discriminates docs") {
    val a = q("llm_text_fingerprint").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = q("llm_text_fingerprint").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
    assert(a.map(_._2).distinct.length > a.length / 2)
  }

  test("streaming tumbling counts equal the batch aggregation (closed windows)") {
    val streamed = q("stream_window_counts")
      .select("win_start", "event_type", "n").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val ev = Tables.load(spark, sfDir, "events")
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    // append mode emits windows closed by the final watermark max(ts) - 2h
    val batch = ev
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .filter(col("w") + expr("INTERVAL 1 HOUR")
        <= lit(maxTs) - expr("INTERVAL 2 HOUR"))
      .select(date_format(col("w"), "yyyy-MM-dd HH:mm:ss"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
