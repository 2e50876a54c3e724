package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a training-data pipeline: sequence packing
  * (concat-and-chunk into fixed token budgets), deterministic mix sampling
  * (per-source rates for corpus re-weighting), text normalization, and the
  * composed quality+dedup corpus-selection step.
  *
  * Scale design rules (the 100-TB lens):
  *   - packing uses a two-level distributed prefix-sum — per-block partial
  *     sums plus a block-offset scan — never a single global window over the
  *     corpus;
  *   - mix sampling is a pure map (arithmetic hash per row, no shuffle, no
  *     sort), so it composes with any upstream scan at scan cost;
  *   - normalization is all codegen'd string expressions;
  *   - selection's dedup arm groups on the full text only to find keeper
  *     doc_ids (min per group), then semi-joins back — the shuffle carries
  *     (text-hash, doc_id), not the corpus payload, under partial
  *     aggregation.
  */
object LlmCurate {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Tokens per training sequence (chunk). */
  private val PackBudget = 2048L

  /** Greedy concat-and-chunk over (doc_id, tok): each doc joins the chunk
    * where its first token lands. The global running token offset is a
    * two-level distributed prefix-sum with `block` docs per level-1 block:
    * level 2 windows over ONE ROW PER BLOCK and every level-3 window
    * partition holds at most `block` docs — the output is independent of
    * `block`, which only balances the two levels. */
  private[graft] def packChunks(t0: DataFrame, budget: Long, block: Long): DataFrame = {
    val t = t0.withColumn("block", expr(s"doc_id div $block"))
    val blockSums = t.groupBy("block").agg(sum("tok").as("btok"))
    val wBlocks = Window.orderBy("block")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blockSums
      .withColumn("boff", coalesce(sum("btok").over(wBlocks), lit(0L)))
      .select("block", "boff")
    val wInBlock = Window.partitionBy("block").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.join(broadcast(offsets), "block")
      .withColumn("cumb",
        col("boff") + coalesce(sum("tok").over(wInBlock), lit(0L)))
      .withColumn("chunk_id", expr(s"cumb div $budget").cast("bigint"))
      .groupBy("chunk_id")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("tok").cast("bigint").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("chunk_id")
  }

  val all: Seq[Q] = Seq(

    // ---- sequence packing: greedy concat-and-chunk via the two-level
    // prefix-sum above. The block size adapts to √N (one extra count job,
    // metadata-cheap on parquet), which balances the levels at ANY corpus
    // size: 10^11 docs → ~316k block rows for the level-2 single-task
    // window and ≤316k docs per level-3 window partition. No stage ever
    // windows over the full corpus in one partition, and the result is
    // provably independent of the block size (LlmCurateSpec checks several
    // block sizes against the naive single-window reference). ----
    Q("llm_pack_sequences",
      s"""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS tok FROM documents),
         |c AS (SELECT doc_id, tok,
         |        COALESCE(sum(tok) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
         |      FROM t)
         |SELECT CAST(cumb // $PackBudget AS BIGINT) AS chunk_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(tok) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1 ORDER BY chunk_id""".stripMargin,
      bench = true) { (s, dir) =>
      val t = docs(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("tok"))
      val block = math.max(128L, math.ceil(math.sqrt(t.count().toDouble)).toLong)
      packChunks(t, PackBudget, block)
    },

    // ---- deterministic mix sampling: re-weight the corpus to per-source
    // target rates with a multiplicative arithmetic hash of doc_id — pure
    // row-local arithmetic both engines compute bit-identically, so the
    // sample is reproducible across engines, reruns, and repartitionings,
    // unlike rand(seed)-based sampling whose draw depends on
    // row-to-partition assignment. doc_id is reduced mod 2^31 BEFORE the
    // Knuth multiply: the product then peaks at ~5.7e18 < int64 max, so
    // the expression never overflows at any corpus size (Spark would wrap
    // silently where DuckDB errors — the engines must agree). The
    // fixture's source is doc_id-periodic (src<N> = doc_id % 20), which is
    // exactly why the hash must mix doc_id rather than use doc_id % k
    // directly. Rates cycle 25/50/75/100% by source index. ----
    Q("llm_mix_sample",
      """SELECT CAST(substring(source, 4) AS INT) AS src_num,
        |  CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(count(*) FILTER (((doc_id % 2147483648) * 2654435761) % 4294967296 % 100
        |       < 25 * ((CAST(substring(source, 4) AS INT) % 4) + 1)) AS BIGINT) AS n_kept,
        |  CAST(25 * ((CAST(substring(source, 4) AS INT) % 4) + 1) AS INT) AS target_pct
        |FROM documents GROUP BY 1, 4 ORDER BY src_num""".stripMargin) { (s, dir) =>
      val srcNum = expr("cast(substring(source, 4) as int)")
      val kept = expr("((doc_id % 2147483648) * 2654435761) % 4294967296 % 100") <
        lit(25) * ((srcNum % 4) + 1)
      docs(s, dir)
        .groupBy(srcNum.as("src_num"),
          (lit(25) * ((srcNum % 4) + 1)).cast("int").as("target_pct"))
        .agg(count(lit(1)).cast("bigint").as("n_total"),
          sum(when(kept, 1L).otherwise(0L)).cast("bigint").as("n_kept"))
        .select("src_num", "n_total", "n_kept", "target_pct")
        .orderBy("src_num")
    },

    // ---- text normalization: lowercase, strip non-alphanumerics, collapse
    // runs of spaces — all codegen'd string expressions (no UDF). ----
    Q("llm_text_clean",
      """WITH c AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS ct
        |  FROM documents)
        |SELECT doc_id, CAST(length(ct) AS BIGINT) AS n_chars_clean,
        |  CAST(len(string_split(ct, ' ')) AS BIGINT) AS n_words_clean
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val ct = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      docs(s, dir).select(col("doc_id"),
        length(ct).cast("bigint").as("n_chars_clean"),
        size(split(ct, " ")).cast("bigint").as("n_words_clean"))
        .orderBy("doc_id")
    },

    // ---- PII redaction: the scrub pass every externally-sourced corpus
    // takes before training — emails, IPv4 addresses and long digit runs
    // are replaced by typed placeholder tokens, with a per-doc count of
    // redactions. Patterns are chosen inside the Java-regex ∩ RE2 common
    // subset so the DuckDB twin is literally the same expressions; the
    // fixture text carries no PII, so deterministic synthetic PII is
    // appended per doc (both sides identically) to make the oracle bite.
    // Row-local codegen'd regex work — map-only at any corpus size. ----
    Q("llm_text_redact",
      """WITH a AS (SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.7 acct 123456789' AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(aug,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\d{9,}', '<NUM>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    + len(regexp_extract_all(aug, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
        |    + len(regexp_extract_all(aug, '\d{9,}')) AS BIGINT) AS n_pii
        |FROM a ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val digits = "\\d{9,}"
      val aug = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com from 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7 acct 123456789"))
      docs(s, dir).select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          regexp_replace(regexp_replace(regexp_replace(col("aug"),
            email, "<EMAIL>"), ipv4, "<IP>"), digits, "<NUM>").as("redacted"),
          (size(regexp_extract_all(col("aug"), lit(email), lit(0)))
            + size(regexp_extract_all(col("aug"), lit(ipv4), lit(0)))
            + size(regexp_extract_all(col("aug"), lit(digits), lit(0))))
            .cast("bigint").as("n_pii"))
        .orderBy("doc_id")
    },

    // ---- corpus selection: the composed curation step every training
    // pipeline ends with — quality gate (length + lexical diversity), then
    // exact-dedup keep-first (min doc_id per identical content), reported
    // as per-language corpus stats. Dedup groups on md5(text), NOT the
    // text itself, so the shuffle carries a 32-byte key per doc instead of
    // the document payload (same contract as llm_dedup_exact; a 128-bit
    // content hash is the standard exact-dup identity at corpus scale).
    // Survivors semi-join back by doc_id. ----
    Q("llm_corpus_select",
      """WITH q AS (SELECT doc_id, lang, text,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(list_distinct(string_split(text, ' '))) * 1.0
        |      / len(string_split(text, ' ')) AS diversity
        |  FROM documents),
        |f AS (SELECT * FROM q WHERE n_words >= 20 AND diversity >= 0.5),
        |k AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(text))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS n_tokens
        |FROM f JOIN k USING (doc_id) GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val words = split(col("text"), " ")
      val q = docs(s, dir).select(col("doc_id"), col("lang"), col("text"),
        size(words).cast("bigint").as("n_words"),
        (size(array_distinct(words)).cast("double") / size(words)).as("diversity"))
      val f = q.filter(col("n_words") >= 20 && col("diversity") >= 0.5)
      val keep = f.groupBy(md5(col("text"))).agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      f.join(keep, Seq("doc_id"), "left_semi")
        .groupBy("lang")
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum("n_words").cast("bigint").as("n_tokens"))
        .orderBy("lang")
    },

    // ---- unigram-frequency commonness score: per-doc average corpus
    // frequency of its words — the integer-exact core of LM-based quality
    // filtering (a doc of very common words is boilerplate; very rare
    // words, noise). Two aggregations and one join on the vocab table;
    // every quantity is an exact int64 until the final division, which
    // both engines evaluate bit-identically on the same ints (a
    // log-probability formulation would instead sum doubles in
    // partition-dependent order and lose cross-engine hash equality). ----
    Q("llm_text_commonness",
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT w, count(*) AS cw FROM w GROUP BY w)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(cw) AS BIGINT) AS sum_freq,
        |  round(sum(cw) * 1.0 / count(*), 4) AS avg_freq
        |FROM w JOIN c USING (w) GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val words = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val vocab = words.groupBy("w").agg(count(lit(1)).as("cw"))
      words.join(vocab, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("bigint").as("n_words"),
          sum("cw").cast("bigint").as("sum_freq"))
        .select(col("doc_id"), col("n_words"), col("sum_freq"),
          round(col("sum_freq") * 1.0 / col("n_words"), 4).as("avg_freq"))
        .orderBy("doc_id")
    },

    // ---- train/val/test split: the deterministic 80/10/10 partition every
    // training run starts from. Same engine-portable arithmetic hash as
    // llm_mix_sample (doc_id-only, overflow-safe), so the split is stable
    // across engines, reruns, repartitionings, and INCREMENTAL corpus
    // growth — a doc's split never changes when new docs arrive, which a
    // row_number-based split cannot guarantee. Map-only until the final
    // 3-row aggregate. ----
    Q("llm_split_corpus",
      """WITH s AS (SELECT doc_id, len(string_split(text, ' ')) AS tok,
        |    CASE WHEN ((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 < 80 THEN 'train'
        |         WHEN ((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens
        |FROM s GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
      val h = expr("((doc_id % 2147483648) * 2654435761) % 4294967296 % 100")
      docs(s, dir)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("tok"),
          when(h < 80, "train").when(h < 90, "val").otherwise("test").as("split"))
        .groupBy("split")
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum("tok").cast("bigint").as("n_tokens"))
        .orderBy("split")
    },

    // ---- decontamination: flag corpus documents that share any long
    // n-gram (8 words) with a held-out benchmark set (docs 0-9 here) — the
    // standard test-set leakage check before training. The benchmark gram
    // set is tiny by construction and BROADCASTS into the corpus-side
    // equi-join, so the corpus is touched in one map-side pass: no
    // corpus-sized shuffle at any size, cost scales with corpus grams x
    // (benchmark grams in the hash table). ----
    Q("llm_decontaminate",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct([list_aggregate(w[i:i+7], 'string_agg', ' ')
        |        for i in range(1, len(w)-6)])) AS gram
        |      FROM w WHERE len(w) >= 8),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10)
        |SELECT g.doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_shared
        |FROM g JOIN bench USING (gram) WHERE g.doc_id >= 10
        |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val g = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(1, size(w)-7), i -> concat_ws(' ', slice(w, i, 8))))"))
          .as("gram"))
      val bench = g.filter(col("doc_id") < 10).select("gram").distinct()
      g.filter(col("doc_id") >= 10)
        .join(broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(countDistinct("gram").cast("bigint").as("n_shared"))
        .orderBy("doc_id")
    },

    // ---- within-doc repetition (Gopher-style quality rule): fraction of
    // duplicate word-bigrams inside each document — boilerplate and
    // degenerate generations repeat phrases; natural text mostly doesn't.
    // Entirely row-local array expressions (no shuffle before the final
    // ORDER BY), exact integers until the rounded ratio. ----
    Q("llm_text_repetition",
      """WITH g AS (SELECT doc_id,
        |    [list_aggregate(w[i:i+1], 'string_agg', ' ') FOR i IN range(1, len(w))] AS grams
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3)
        |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |  CAST(len(grams) - len(list_distinct(grams)) AS BIGINT) AS n_dup,
        |  round((len(grams) - len(list_distinct(grams))) * 1.0 / len(grams), 4) AS dup_ratio
        |FROM g ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val grams = expr(
        "transform(sequence(1, size(w)-1), i -> concat_ws(' ', slice(w, i, 2)))")
      docs(s, dir)
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), grams.as("grams"))
        .select(col("doc_id"),
          size(col("grams")).cast("bigint").as("n_grams"),
          (size(col("grams")) - size(array_distinct(col("grams"))))
            .cast("bigint").as("n_dup"))
        .withColumn("dup_ratio", round(col("n_dup") * 1.0 / col("n_grams"), 4))
        .orderBy("doc_id")
    },

    // ---- keyword extraction: top-3 terms per doc, TF-IDF-ordered but in
    // exact integer space — rank by term frequency desc, document
    // frequency asc (the IDF direction), term asc. For a fixed tf the
    // tf·ln(N/df) score is monotone in -df, so the integer ranking agrees
    // with float TF-IDF wherever the latter is well-defined and sidesteps
    // cross-engine libm ulp differences that would flip near-tied ranks.
    // The per-doc window partitions bound each sort by the doc's vocab. ----
    Q("llm_text_keywords",
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM w GROUP BY doc_id, w),
        |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        |r AS (SELECT doc_id, w, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tf.tf DESC, df.df, w) AS rk
        |  FROM tf JOIN df USING (w))
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, w AS term,
        |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
      val words = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
      val rk = Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df"), col("w"))
      tf.join(df, "w")
        .withColumn("rk", row_number().over(rk).cast("bigint"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("w").as("term"),
          col("tf").cast("bigint").as("tf"), col("df").cast("bigint").as("df"))
        .orderBy("doc_id", "rk")
    },

    // ---- SEGMENT-LEVEL dedup (CCNet-style boilerplate strip): fixed
    // 10-word segments appearing in >= 3 DISTINCT docs are cut from every
    // doc, which is the line/paragraph dedup pass web corpora take before
    // doc-level dedup (headers, navigation, license blurbs). Scale shape:
    //   1. segmentation is a row-local array expression;
    //   2. hot-segment discovery aggregates 8-byte xxhash64 keys (never
    //      segment strings) — the only corpus-sized shuffle, at 16 B/row;
    //   3. candidate segments (hot hashes only) re-verify the >= 3-doc
    //      threshold on the STRING, so a 64-bit collision can promote a
    //      candidate but never a result — exactness at string level;
    //   4. the rewrite is map-side: the verified boilerplate vocabulary
    //      (small by nature — segments shared across many docs) folds into
    //      one broadcast array row and each doc filters its own segments
    //      row-locally, preserving order. No reassembly shuffle: the corpus
    //      text never moves.
    // A doc that is ALL boilerplate stays, with cleaned = ''. ----
    Q("llm_dedup_segments",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |seg AS (SELECT doc_id, i AS pos,
        |    array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS s
        |  FROM w, LATERAL (SELECT unnest(generate_series(0,
        |    CAST(ceil(len(ws) / 10.0) AS INT) - 1)) AS i) t(i)),
        |bp AS (SELECT s FROM seg GROUP BY s HAVING count(DISTINCT doc_id) >= 3)
        |SELECT seg.doc_id,
        |  CAST(count(*) FILTER (WHERE bp.s IS NOT NULL) AS BIGINT) AS n_dropped,
        |  coalesce(string_agg(seg.s, ' ' ORDER BY seg.pos)
        |    FILTER (WHERE bp.s IS NULL), '') AS cleaned
        |FROM seg LEFT JOIN bp ON seg.s = bp.s
        |GROUP BY seg.doc_id ORDER BY seg.doc_id""".stripMargin, bench = true) { (s, dir) =>
      val d = docs(s, dir)
        .withColumn("ws", split(col("text"), " "))
        .withColumn("segs", expr(
          "transform(sequence(0, (size(ws) + 9) div 10 - 1)," +
            " i -> concat_ws(' ', slice(ws, i*10+1, 10)))"))
      val seg = d.select(col("doc_id"), explode(col("segs")).as("s"))
      val hot = seg.groupBy(xxhash64(col("s")).as("h"))
        .agg(count_distinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 3).select("h")
      val bp = seg.join(broadcast(hot), xxhash64(col("s")) === col("h"), "left_semi")
        .groupBy("s").agg(count_distinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 3).select("s")
      val bpRow = bp.agg(collect_list(col("s")).as("bps"))
      d.crossJoin(broadcast(bpRow))
        .withColumn("kept", expr("filter(segs, x -> NOT array_contains(bps, x))"))
        .select(col("doc_id"),
          (size(col("segs")) - size(col("kept"))).cast("bigint").as("n_dropped"),
          concat_ws(" ", col("kept")).as("cleaned"))
        .orderBy("doc_id")
    },
  )
}
