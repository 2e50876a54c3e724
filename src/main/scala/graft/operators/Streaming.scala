package graft.operators

import graft.Q
import graft.Util._
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Judged streaming queries: real Structured Streaming executions over the
  * `events` table, verified against batch-equivalent DuckDB oracles. */
object Streaming {

  val all: Seq[Q] = Seq(

    // ---- tumbling event-time window + watermark, APPEND mode: only
    // watermark-closed windows are emitted, so operator state is bounded on
    // an infinite stream (complete mode would grow state forever). The
    // oracle mirrors the emission set exactly: windows whose end precedes
    // the final watermark max(ts) − 2h. Every event ts carries random
    // microseconds while window ends are whole hours, so the emission
    // boundary can never tie and <=/< are equivalent. ----
    Q("stream_window_counts",
      """WITH mx AS (SELECT max(ts) AS mt FROM events),
        |w AS (SELECT date_trunc('hour', ts) AS win, event_type, count(*) AS n,
        |        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |      FROM events GROUP BY 1, 2)
        |SELECT strftime(win, '%Y-%m-%d %H:%M:%S') AS win_start, event_type, n, total
        |FROM w WHERE win + INTERVAL 1 HOUR <= (SELECT mt - INTERVAL 2 HOUR FROM mx)
        |ORDER BY win_start, event_type""".stripMargin,
      bench = true) { (s, dir) =>
      val agg = StreamOps.eventsStream(s, dir)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), d(sum(col("value").cast("decimal(12,2)"))).as("total"))
      StreamOps.runToMemory(s, agg, "append")
        .select(ymdHms(col("window.start")).as("win_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy(col("win_start"), col("event_type"))
    },

    // ---- sliding window (2h length, 1h slide), append mode: each event
    // lands in 2 windows; emitted = windows closed by the final watermark ----
    Q("stream_sliding_counts",
      """WITH mx AS (SELECT max(ts) AS mt FROM events),
        |x AS (SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
        |                     date_trunc('hour', ts)]) AS win, value FROM events),
        |w AS (SELECT win, count(*) AS n,
        |        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |      FROM x GROUP BY 1)
        |SELECT strftime(win, '%Y-%m-%d %H:%M:%S') AS win_start, n, total
        |FROM w WHERE win + INTERVAL 2 HOUR <= (SELECT mt - INTERVAL 2 HOUR FROM mx)
        |ORDER BY win_start""".stripMargin) { (s, dir) =>
      val agg = StreamOps.eventsStream(s, dir)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(count(lit(1)).as("n"), d(sum(col("value").cast("decimal(12,2)"))).as("total"))
      StreamOps.runToMemory(s, agg, "append")
        .select(ymdHms(col("window.start")).as("win_start"), col("n"), col("total"))
        .orderBy(col("win_start"))
    },

    // ---- session windows (30-min inactivity gap) per user, append mode:
    // the judged output is exactly the append-mode emission set — sessions
    // closed by the final watermark max(ts) − 2h. No batch action runs
    // inside the query: the oracle reproduces the emission predicate
    // (session end = last event + gap precedes the watermark). Event ts
    // carry random microseconds, so the emission boundary can never tie
    // and the <=/< choice is immaterial. ----
    Q("stream_session_windows",
      """WITH mx AS (SELECT max(ts) AS mt FROM events),
        |marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 30 MINUTE OR
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM marked)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |  count(*) AS n_events
        |FROM sess
        |GROUP BY user_id, sid
        |HAVING max(ts) + INTERVAL 30 MINUTE <= (SELECT mt - INTERVAL 2 HOUR FROM mx)
        |ORDER BY user_id, sess_start""".stripMargin) { (s, dir) =>
      val agg = StreamOps.eventsStream(s, dir)
        .withWatermark("ts", "2 hours")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      StreamOps.runToMemory(s, agg, "append")
        .select(col("user_id"), ymdHms(col("session_window.start")).as("sess_start"),
          col("n_events"))
        .orderBy(col("user_id"), col("sess_start"))
    },

    // ---- stream-stream inner join with event-time interval bound: click →
    // purchase attribution (clicks within the hour before a same-user
    // purchase). Both sides watermarked AND the join condition bounds event
    // time on both sides, so each side's join state is purged as the
    // watermark passes — bounded state on infinite streams, the only
    // stream-stream join shape that survives 100 TB. Inner-join rows emit
    // as soon as both sides arrive (no watermark gating), so with
    // AvailableNow over the fixture the emission set is exactly the batch
    // join — which is what the oracle computes. Sub-second ts randomness
    // makes boundary ties impossible. ----
    Q("stream_join_interval",
      """SELECT p.user_id AS user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        |  AND p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |ORDER BY user_id, purchase_ts, click_ts""".stripMargin) { (s, dir) =>
      import s.implicits._
      val p = StreamOps.eventsStream(s, dir)
        .filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("p_ts"))
        .withWatermark("p_ts", "2 hours")
      val c = StreamOps.eventsStream(s, dir)
        .filter($"event_type" === "click")
        .select($"user_id".as("c_user"), $"ts".as("c_ts"))
        .withWatermark("c_ts", "2 hours")
      val joined = p.join(c,
        $"user_id" === $"c_user" &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") && $"c_ts" <= $"p_ts")
      StreamOps.runToMemory(s, joined, "append")
        .select($"user_id", ymdHms($"p_ts").as("purchase_ts"),
          ymdHms($"c_ts").as("click_ts"))
        .orderBy($"user_id", $"purchase_ts", $"click_ts")
    },

    // ---- stream-stream LEFT OUTER interval join: matched rows emit on
    // arrival (the inner part); an UNMATCHED purchase emits its
    // null-extended row only at state eviction — the outer-join semantics
    // only watermarks make possible on infinite streams. Spark's exact
    // eviction instant for interval conditions is an internal detail
    // (empirically between wm−34min and wm on this fixture), so the JUDGED
    // comparison restricts both sides to purchases ≥4h before the final
    // event time (2h watermark delay + 1h interval + 1h margin), where
    // emission is unconditional — the full outer machinery still runs in
    // the judged path; only the undocumented boundary zone is excluded
    // from the hash compare. ----
    Q("stream_join_left_outer",
      """WITH mx AS (SELECT least(
        |    max(ts) FILTER (WHERE event_type = 'purchase'),
        |    max(ts) FILTER (WHERE event_type = 'click')) AS mt FROM events),
        |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        |      AND ts <= (SELECT mt - INTERVAL 4 HOUR FROM mx)),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |matched AS (
        |  SELECT p.user_id, p.ts AS p_ts, c.ts AS c_ts FROM p JOIN c
        |    ON p.user_id = c.user_id
        |    AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts),
        |unmatched AS (
        |  SELECT p.user_id, p.ts AS p_ts, NULL::TIMESTAMP AS c_ts FROM p
        |  WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
        |      AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts))
        |SELECT user_id, strftime(p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(c_ts, '%Y-%m-%d %H:%M:%S') AS click_ts
        |FROM (SELECT * FROM matched UNION ALL SELECT * FROM unmatched)
        |ORDER BY user_id, purchase_ts, click_ts""".stripMargin) { (s, dir) =>
      import s.implicits._
      val p = StreamOps.eventsStream(s, dir)
        .filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("p_ts"))
        .withWatermark("p_ts", "2 hours")
      val c = StreamOps.eventsStream(s, dir)
        .filter($"event_type" === "click")
        .select($"user_id".as("c_user"), $"ts".as("c_ts"))
        .withWatermark("c_ts", "2 hours")
      val joined = p.join(c,
        $"user_id" === $"c_user" &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") && $"c_ts" <= $"p_ts",
        "left_outer")
      // certain-emission bound: distributed 1-row broadcast, no driver
      // action. The join's watermark is the MIN across both inputs'
      // event-time maxima (each side's watermark advances off ITS OWN max
      // ts), so the bound must use least(max purchase, max click) — using
      // the overall max(ts) judged purchases whose state was never evicted
      // when one side's events end early (the sf0.001 one-row miss: clicks
      // ended 4h before purchases, leaving a purchase above the real
      // watermark but inside the old bound).
      val bound = graft.Tables.load(s, dir, "events")
        .agg(least(
          max(when($"event_type" === "purchase", $"ts")),
          max(when($"event_type" === "click", $"ts"))).as("mt"))
      StreamOps.runToMemory(s, joined, "append")
        .join(broadcast(bound))
        .filter($"p_ts" <= $"mt" - expr("INTERVAL 4 HOURS"))
        .select($"user_id", ymdHms($"p_ts").as("purchase_ts"),
          ymdHms($"c_ts").as("click_ts"))
        .orderBy($"user_id", $"purchase_ts", $"click_ts")
    },

    // ---- streaming dedup with watermark-bounded state: first occurrence
    // of each (user, event_type) passes, duplicates are dropped, and
    // per-key state expires once the watermark moves past it —
    // dropDuplicatesWithinWatermark, the infinite-stream answer to exact
    // dedup (plain dropDuplicates would hold every key forever). Emitted
    // rows carry arrival-order-dependent ts, so the judged projection is
    // the deduped KEY SET, which is deterministic. ----
    Q("stream_dedup_watermark",
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val deduped = StreamOps.eventsStream(s, dir)
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
      StreamOps.runToMemory(s, deduped, "append")
        .select($"user_id", $"event_type")
        .orderBy($"user_id", $"event_type")
    },

    // ---- streaming sink INTO the cassandralike store — NATIVE: the
    // windowed aggregation's append-mode emission set flows through
    // `writeStream.format("cassandralike")`, i.e. the store's own DSv2
    // StreamingWrite (wide-row layout: one storage row per window, one
    // column per event type), then reads back through the DSv2 scan. Each
    // micro-batch stages segments exactly like a batch append and commits
    // them with a per-epoch marker (replay-idempotent — StreamingSinkSpec);
    // the LWW/compaction machinery applies unchanged. This is the operator
    // that closes the loop between the streaming surface and the store. ----
    Q("stream_sink_cassandralike",
      """WITH mx AS (SELECT max(ts) AS mt FROM events),
        |w AS (SELECT date_trunc('hour', ts) AS win, event_type, count(*) AS n
        |      FROM events GROUP BY 1, 2)
        |SELECT strftime(win, '%Y-%m-%d %H:%M:%S') AS win_start, event_type, CAST(n AS BIGINT) AS n
        |FROM w WHERE win + INTERVAL 1 HOUR <= (SELECT mt - INTERVAL 2 HOUR FROM mx)
        |ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
      import graft.sources.cassandralike.{CellStore, Seed}
      val agg = StreamOps.eventsStream(s, dir)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(ymdHms(col("window.start")).as("win_start"), col("event_type"), col("n"))
      val store = s"${Seed.storeRoot(dir)}/stream_sink"
      CellStore.dropTable(store)
      CellStore.writeMeta(store, CellStore.Meta(
        "win_start STRING,event_type STRING,n BIGINT",
        ":key,:column,:value", Map.empty))
      // the NATIVE streaming sink: no foreachBatch — the store's
      // StreamingWrite commits each micro-batch's segments with epoch
      // markers (replay-idempotent); write.timestamp pinned as Seed does
      StreamOps.runToStoreSink(agg, store, "append",
        Map(graft.sources.cassandralike.Options.WriteTimestamp -> "1"))
      Seed.read(s, store)
        .select(col("win_start"), col("event_type"), col("n"))
        .orderBy(col("win_start"), col("event_type"))
    },

    // ---- custom keyed state (flatMapGroupsWithState): first-seen dedup of
    // (user, event_type) pairs, emitting each pair once with its earliest
    // event time. State per user = event types already emitted; within a
    // batch the true per-type min is computed first (the iterator's order is
    // arbitrary), so the output is deterministic. With Trigger.AvailableNow
    // over the fixture this runs as one batch; at scale the same operator
    // runs incrementally with state in the state store, partitioned by
    // user_id — no driver-side state anywhere. ----
    Q("stream_stateful_firstseen",
      """SELECT user_id, event_type,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      val ds = StreamOps.eventsStream(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
        .as[(Long, String, java.sql.Timestamp)]
      val firstSeen = ds.groupByKey(_._1)
        .flatMapGroupsWithState[Map[String, java.sql.Timestamp],
          (Long, String, java.sql.Timestamp)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) { (user, rows, state) =>
          val seen = state.getOption.getOrElse(Map.empty[String, java.sql.Timestamp])
          val batchMin = rows.foldLeft(Map.empty[String, java.sql.Timestamp]) {
            case (m, (_, typ, ts)) =>
              if (m.get(typ).forall(ts.before)) m.updated(typ, ts) else m
          }
          val fresh = batchMin.filter { case (typ, _) => !seen.contains(typ) }
          state.update(seen ++ fresh)
          fresh.iterator.map { case (typ, ts) => (user, typ, ts) }
        }
        .toDF("user_id", "event_type", "ts0")
      StreamOps.runToMemory(s, firstSeen, "append")
        .select(col("user_id"), col("event_type"), ymdHms(col("ts0")).as("first_ts"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // ---- stream-static enrichment join: the event stream joined per
    // micro-batch against a BATCH dimension (customer ⋈ nation), broadcast
    // to every task — stateless (no watermark, no join state; each input
    // row emits exactly once), so the stream side scales to any rate and
    // the static side only needs to stay broadcast-sized. This is the
    // standard dim-enrichment shape; re-reading the dimension each
    // micro-batch is what picks up slowly-changing dims at scale. ----
    Q("stream_join_static",
      """SELECT e.event_id, e.user_id, e.event_type, n.n_name AS nation
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dim = graft.Tables.load(s, dir, "customer")
        .join(graft.Tables.load(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select($"c_custkey", $"n_name".as("nation"))
      val enriched = StreamOps.eventsStream(s, dir)
        .select($"event_id", $"user_id", $"event_type")
        .join(broadcast(dim), $"user_id" === $"c_custkey")
      StreamOps.runToMemory(s, enriched, "append")
        .select($"event_id", $"user_id", $"event_type", $"nation")
        .orderBy($"event_id")
    },

    // ---- the change feed as an EVENT-TIME source: rows stream OUT of the
    // cell store and straight into a watermark + tumbling-window
    // aggregation — the feed composes with event-time semantics exactly
    // like a file source (same emission contract as stream_window_counts:
    // append mode, windows closed by the final watermark max(ts) − 2h).
    // The store is written as ONE epoch, so the feed's first micro-batch
    // carries every row and no event can arrive behind the watermark —
    // the multi-epoch late-arrival story is the consumer's watermark
    // policy, not the source's. ----
    Q("stream_changefeed_window",
      """WITH mx AS (SELECT max(ts) AS mt FROM events),
        |w AS (SELECT date_trunc('hour', ts) AS win, event_type, count(*) AS n,
        |        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |      FROM events GROUP BY 1, 2)
        |SELECT strftime(win, '%Y-%m-%d %H:%M:%S') AS win_start, event_type, n, total
        |FROM w WHERE win + INTERVAL 1 HOUR <= (SELECT mt - INTERVAL 2 HOUR FROM mx)
        |ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
      import graft.sources.cassandralike.Seed
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      val store = Seed.table(s, dir, "changefeed_events", ev)
      val feed = s.readStream.format("cassandralike").option("path", store).load()
      val agg = feed
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), d(sum(col("value").cast("decimal(12,2)"))).as("total"))
      StreamOps.runToMemory(s, agg, "append")
        .select(ymdHms(col("window.start")).as("win_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy(col("win_start"), col("event_type"))
    },

    // ---- the store as a STREAMING SOURCE: `readStream` over a
    // cassandralike table is a change feed — each micro-batch reads exactly
    // the segments committed since the last offset (offset = consumed
    // segment set; see CellChangeFeedStream), assembled into table rows by
    // the same reader as the batch scan. Here three append epochs land in
    // the store (each epoch = committed segments), the feed drains them
    // under Trigger.AvailableNow, and a complete-mode aggregation over the
    // emitted upsert stream must equal the batch aggregation over the whole
    // table — every stored row emitted exactly once, none twice (disjoint
    // appends; the overwrite/tombstone re-emission contract is
    // ChangeFeedSpec's). Closes the loop opposite stream_sink_cassandralike:
    // that query streams INTO the store, this one streams OUT of it. ----
    Q("stream_store_changefeed",
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      bench = true) { (s, dir) =>
      import graft.sources.cassandralike.Seed
      // three disjoint write epochs — the feed's unit of incremental work.
      // The store is read-only input for the judged operator (the change
      // feed SOURCE); seeding memoizes per JVM like the connector fixtures
      // (Connector.seedOnce) so the bench's repeated runs time the feed,
      // not the fixture writes. Every run still streams all three epochs
      // from a fresh checkpoint.
      val store = s"${Seed.storeRoot(dir)}/changefeed"
      Connector.seedOnce(s"$dir#stream_changefeed") {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        Seed.table(s, dir, "changefeed", ev.filter(col("event_id") % 3 === 0))
        Seed.append(ev.filter(col("event_id") % 3 === 1), store,
          Map("write.timestamp" -> "2"))
        Seed.append(ev.filter(col("event_id") % 3 === 2), store,
          Map("write.timestamp" -> "3"))
      }
      val feed = s.readStream.format("cassandralike").option("path", store).load()
      val agg = feed.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          d(sum(col("value").cast("decimal(12,2)"))).as("total"))
      StreamOps.runToMemory(s, agg, "complete")
        .select(col("event_type"), col("n"), col("total"))
        .orderBy(col("event_type"))
    },

    // ---- CONTINUOUS DEDUP: the change feed driving the store-persisted
    // LSH band index — the composed shape a 100-TB corpus pipeline runs
    // forever. Documents commit to a cell store in epochs; the feed drains
    // them in commit-ordered bounded batches; each batch (a) appends its
    // minhash bands to the persisted index (LSM append, no rebuild),
    // (b) probes the index for candidate near-dups, (c) verifies exact
    // Jaccard on candidate docs only, and (d) upserts confirmed pairs into
    // a result store. Per-batch cost is O(batch bands + collided buckets +
    // candidates) — independent of corpus history except through true
    // collisions. A pair is emitted exactly once (when its later member's
    // batch probes: the earlier member is already indexed, and a doc is in
    // exactly one batch), so the accumulated result equals the FULL-corpus
    // LSH dedup whatever the batch granularity — the oracle recomputes all
    // true Jaccard>=0.8 pairs from scratch.
    //
    // The judged run is a genuine STOP/RESUME cycle: the query drains epoch
    // 1 and terminates; epochs 2 and 3 then land in the store; a NEW query
    // against the SAME checkpoint recovers the committed segment-set offset
    // and processes only the new epochs. Exactly-once across the restart is
    // what makes the accumulated pairs equal the oracle — a replayed batch
    // is absorbed by the pair-keyed upsert, a skipped one would lose
    // pairs. ----
    Q("stream_dedup_continuous", LlmPipeline.jaccardOracle) { (s, dir) =>
      import graft.sources.cassandralike.{CellStore, Options => CLOpt, Seed}
      val d = graft.Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
      val store = Seed.table(s, dir, "continuous_docs",
        d.filter(col("doc_id") % 3 === 0), props = Map(CLOpt.Buckets -> "8"))
      val idx = s"${Seed.storeRoot(dir)}/continuous_band_index"
      CellStore.dropTable(idx)
      CellStore.writeMeta(idx, CellStore.Meta(
        "row_key STRING,column_name STRING,value STRING",
        ":key,:column,:value", Map.empty))
      val res = s"${Seed.storeRoot(dir)}/continuous_pairs"
      CellStore.dropTable(res)
      CellStore.writeMeta(res, CellStore.Meta(
        "pair STRING,doc_a BIGINT,doc_b BIGINT,jac DOUBLE",
        ":key,doc_a,doc_b,jac", Map.empty))
      def bandRows(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
          posexplode(expr("minhash_bands(shingle_hashes(text))")).as(Seq("band", "bh")))
        .select(concat_ws("#", col("band"), col("bh")).as("row_key"),
          lpad(col("doc_id").cast("string"), 12, "0").as("column_name"),
          lit("1").as("value"))
      def feed() = s.readStream.format("cassandralike")
        .option(CLOpt.Path, store)
        .option(CLOpt.StreamMaxSegmentsPerBatch, "8")
        .load()
      def processBatch(batch0: org.apache.spark.sql.DataFrame, id: Long): Unit = {
        val batch = batch0.select(col("doc_id"), col("text"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        if (batch.count() > 0) {
          // index first, then probe against the WHOLE index: prior-batch
          // pairs and batch-internal pairs fall out of one join
          Seed.append(bandRows(batch), idx)
          val probe = batch.select(col("doc_id"),
              posexplode(expr("minhash_bands(shingle_hashes(text))")).as(Seq("band", "bh")))
            .select(col("doc_id"), concat_ws("#", col("band"), col("bh")).as("row_key"))
          // the batch's band-key set pushes into the index scan as
          // In(row_key) point reads when the cost gate clears (an index
          // big enough that point reads beat per-key planning cost) —
          // O(collided buckets) per batch instead of a full index scan
          // that grows with everything indexed so far (LlmPipeline's
          // incremental probe, same cost gate)
          val index = LlmPipeline.probePrunedIndex(
            Seed.read(s, idx)
              .select(col("row_key"), col("column_name").cast("long").as("doc_ix")),
            probe, idx)
          val cand = probe.join(index, Seq("row_key"))
            .filter(col("doc_id") =!= col("doc_ix"))
            .select(least(col("doc_id"), col("doc_ix")).as("doc_a"),
              greatest(col("doc_id"), col("doc_ix")).as("doc_b"))
            .distinct()
          val pairs = LlmPipeline.verifyJaccardDocs(cand, d, LlmPipeline.shingles, 0.8)
          Seed.append(pairs.select(
            concat_ws("#", lpad(col("doc_a").cast("string"), 12, "0"),
              lpad(col("doc_b").cast("string"), 12, "0")).as("pair"),
            col("doc_a"), col("doc_b"), col("jac")), res)
        }
        batch.unpersist()
        ()
      }
      StreamOps.withRunCheckpoint { ckpt =>
        // round 1: drain epoch 1, then the query STOPS
        StreamOps.runForeachBatchResumable(feed(), "append", ckpt)(processBatch)
        // two more epochs land while no query is running
        Seed.append(d.filter(col("doc_id") % 3 === 1), store,
          Map(CLOpt.WriteTimestamp -> "2"))
        Seed.append(d.filter(col("doc_id") % 3 === 2), store,
          Map(CLOpt.WriteTimestamp -> "3"))
        // round 2: a NEW query on the SAME checkpoint resumes at the
        // committed segment-set offset and sees only the new epochs
        StreamOps.runForeachBatchResumable(feed(), "append", ckpt)(processBatch)
      }
      Seed.read(s, res).select(col("doc_a"), col("doc_b"), col("jac"))
        .orderBy(col("doc_a"), col("doc_b"))
    }
  )
}
