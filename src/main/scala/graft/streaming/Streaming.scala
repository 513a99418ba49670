package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.{bloom_contains, hash_bucket_counts, hist_agg, hist_quantile, hll_distinct, md5_long, top_k_by, word_shingles, ws_tokens}

/** Structured Streaming surface. The reference is strictly batch
  * (SURVEY.md §2.10); its one streaming-adjacent behavior is incremental
  * re-runs (skip already-processed clips, `dpl/processor/nodes/base.py:135`).
  * Here that becomes first-class: a file-source stream re-using the SAME
  * operator graph (checkpointing subsumes the memoization manifest), plus
  * event-time sessionization with watermarks for the events table.
  */
object Streaming {

  /** Continuous ingest of new clip rows from a directory of parquet files;
    * exactly-once per file via the checkpoint — the streaming form of the
    * reference's skip-if-output-exists memoization. The returned frame can
    * be passed through the same ClipOp transforms as batch. */
  def clipFileStream(spark: SparkSession, root: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 32)
      .parquet(root)

  /** Event-time sessionization with a gap timeout over a streaming events
    * frame (ts: TimestampType). Uses the native session_window — state is
    * managed by Spark's state store, scaling by user_id partitioning. */
  def sessionized(events: DataFrame, gapMinutes: Int = 30,
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Streaming form of the q72 session-funnel features: per session,
    * event count, distinct event types, entry/exit event type and total
    * value. Needs (ts: timestamp, user_id, event_id, event_type, value).
    * Same state posture as [[sessionized]] — session_window state is
    * watermark-bounded. Entry/exit use `min_by`/`max_by` on the unique
    * (ts, event_id) key; distinct types via `collect_set` (bounded by
    * the type alphabet per session — streaming forbids exact
    * count-distinct, and sessions are small groups anyway). */
  def sessionFunnel(events: DataFrame, gapMinutes: Int = 30,
                    watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        size(collect_set(col("event_type"))).cast("long").as("n_types"),
        min_by(col("event_type"), struct(col("ts"), col("event_id"))).as("first_type"),
        max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("last_type"),
        sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("n_types"), col("first_type"), col("last_type"),
        col("total_value"))

  /** Streaming first-occurrence dedup with custom state
    * (`flatMapGroupsWithState`): keyed by a precomputed content hash, each
    * key emits only its first row; subsequent duplicates are dropped by a
    * per-key seen-flag in the state store. This is the streaming form of
    * exact dedup (Dedup.exactClusters) for continuous corpus ingest —
    * state is partitioned by hash, so it scales like any keyed stream.
    *
    * State is BOUNDED by an event-time TTL: a key silent for `ttlMs` of
    * event time past the watermark is dropped from the store and
    * re-admits (the standard TTL'd re-admission trade — an unbounded
    * seen-set would grow one entry per distinct hash ever ingested, which
    * a continuous 100 TB corpus cannot afford). Every arrival re-arms its
    * key's timer, so a hash that keeps recurring keeps deduplicating.
    * Input needs columns (doc_id: long, content_hash: string,
    * ts: timestamp); `ttlMs` must be >= the watermark delay.
    */
  def streamingDedup(docs: DataFrame, watermarkDelay: String = "10 minutes",
                     ttlMs: Long = 24L * 3600 * 1000): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs.withWatermark("ts", watermarkDelay)
      // a null event time would NPE below (withWatermark does not drop
      // null-ts rows) and can never be deduplicated meaningfully
      .where(col("ts").isNotNull)
      .select(col("content_hash"), col("doc_id"), col("ts"))
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // one pass, nothing buffered: track the first row (emitted iff
            // the key is new) and the max event time (re-arms the TTL)
            var first: (String, Long) = null
            var maxTs = Long.MinValue
            rows.foreach { r =>
              if (first == null) first = (r._1, r._2) // first occurrence wins
              val t = r._3.getTime
              if (t > maxTs) maxTs = t
            }
            val out =
              if (state.exists) Iterator.empty
              else { state.update(true); Iterator.single(first) }
            // re-arm: expire once the key has been silent for ttlMs of
            // event time (never at-or-before the current watermark, which
            // the state store rejects)
            state.setTimeoutTimestamp(math.max(
              maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out
          }
      }
      .toDF("content_hash", "doc_id")
  }

  /** Streaming LOCF grid fill — the streaming twin of
    * [[graft.operators.AsOf.gridResample]]: per key, every step-multiple
    * grid point g with last_obs_ts <= g < next_obs_ts emits carrying the
    * last observation's value, as soon as the next observation proves no
    * later observation can claim g (an observation exactly AT a grid
    * point wins it, matching the batch at-or-before rule). Points at or
    * after a key's latest observation stay unemitted until a newer
    * observation closes them — the streaming-honest prefix of the batch
    * result (StreamingSpec proves the emitted prefix equals the batch
    * per-key fill below each key's last observation).
    *
    * State is TWO LONGS per key (last ts + value) — keys are
    * entity-bounded (users/sensors), unlike the content-hash space of
    * streamingDedup, so no TTL is armed; rows within a batch sort by
    * (ts, v) and batches are assumed per-key in order (late data past an
    * already-consumed timestamp would need watermarked reprocessing
    * upstream). Input columns: (k, ts, v) as longs. */
  def streamingLocf(obs: DataFrame, stepNs: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(stepNs > 0, s"stepNs must be positive, got $stepNs")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("k").cast("long"), col("ts").cast("long"),
        col("v").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[(Long, Long)]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long)]
          var st = state.getOption.orNull
          sorted.foreach { case (_, t, v) =>
            if (st != null && t > st._1) {
              val (t0, v0) = st
              var g = Math.floorDiv(t0 + stepNs - 1, stepNs) * stepNs
              while (g < t) { out += ((k, g, v0)); g += stepNs }
            }
            if (st == null || t >= st._1) st = (t, v)
          }
          if (st != null) state.update(st)
          out.iterator
      }
      .toDF("k", "ts", "v")
  }

  /** Streaming token-bucket admission audit — the live twin of the
    * batch [[graft.functions.TokenBucket]] replay kernel: per key, each
    * arriving event is granted or denied by the SAME milli-token
    * integer recurrence, with (last ts, tokens) as the only state (two
    * longs per key, entity-bounded like [[streamingLocf]] — no TTL).
    * Emits (k, ts, granted) per event; StreamingSpec proves the
    * streamed decisions and final counts equal the batch kernel over
    * the full history. Batch rows sort by ts; per-key order across
    * batches is assumed monotone (the kernel's own discipline). */
  def streamingTokenBucket(obs: DataFrame, capacityMilli: Long,
                           refillMilliPerSec: Long, costMilli: Long,
                           ticksPerSecond: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(capacityMilli > 0 && costMilli > 0 && ticksPerSecond > 0 &&
      refillMilliPerSec >= 0, "bad token bucket parameters")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("k").cast("long"), col("ts").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[(Long, Long)]) =>
          val sorted = rows.toSeq.sortBy(_._2)
          var (prev, tokens) = state.getOption.getOrElse((-1L, capacityMilli))
          val out = sorted.map { case (_, t) =>
            if (prev >= 0L)
              tokens = math.min(capacityMilli,
                tokens + (t - prev) * refillMilliPerSec / ticksPerSecond)
            val granted = tokens >= costMilli
            if (granted) tokens -= costMilli
            prev = t
            (k, t, granted)
          }
          state.update((prev, tokens))
          out.iterator
      }
      .toDF("k", "ts", "granted")
  }

  /** Streaming integer EWMA — the live twin of the q162
    * [[graft.functions.ewma_shift]] kernel: per key the trailing
    * baseline s' = s + ((x − s) >> shift) updates as events arrive,
    * emitting (k, ts, x, s) per observation. TWO LONGS of state per key
    * (count, baseline) — the [[streamingTokenBucket]] shape: exact
    * integer recurrence, so the streamed baseline equals the batch
    * kernel over the same history bit-for-bit (StreamingSpec), which no
    * IEEE alpha-blend recurrence can promise across replays. Rows sort
    * by ts within each micro-batch; cross-batch order is the stream's
    * delivery contract (same as every stateful recurrence here). */
  def streamingEwma(obs: DataFrame, shift: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(shift >= 0 && shift <= 62,
      s"streamingEwma needs shift in [0, 62], got $shift")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("k").cast("long"), col("ts").cast("long"),
        col("x").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[(Long, Long)]) =>
          val sorted = rows.toSeq.sortBy(_._2)
          var (n, s) = state.getOption.getOrElse((0L, 0L))
          val out = sorted.map { case (_, t, x) =>
            s = if (n == 0L) x else s + ((x - s) >> shift)
            n += 1
            (k, t, x, s)
          }
          state.update((n, s))
          out.iterator
      }
      .toDF("k", "ts", "x", "s")
  }

  /** Streaming CUSUM changepoint monitor — the live twin of
    * [[graft.operators.Stats.cusumAlarms]]: per key the accumulator
    * S = max(0, S + x − ref) updates as observations arrive, emitting
    * (k, ts, x, s, alarm) per row and resetting after each alarm
    * (S ≥ h). ONE LONG of state per key — the [[streamingEwma]] shape:
    * exact integer recurrence, so the streamed trajectory equals the
    * batch kernel over the same history bit-for-bit (StreamingSpec).
    * Rows sort by ts within each micro-batch; cross-batch order is the
    * stream's delivery contract. */
  def streamingCusum(obs: DataFrame, ref: Long, h: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(h > 0, s"streamingCusum needs h > 0, got $h")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("k").cast("long"), col("ts").cast("long"),
        col("x").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[Long]) =>
          val sorted = rows.toSeq.sortBy(_._2)
          var s = state.getOption.getOrElse(0L)
          val out = sorted.map { case (_, t, x) =>
            s = math.max(0L, s + x - ref)
            val alarm = s >= h
            val row = (k, t, x, s, alarm)
            if (alarm) s = 0L
            row
          }
          state.update(s)
          out.iterator
      }
      .toDF("k", "ts", "x", "s", "alarm")
  }

  /** Streaming A/B cell maintainer — the live twin of
    * [[graft.operators.Stats.twoProportionZ]]: per experiment key the
    * state is the four exact cells (n_a, x_a, n_b, x_b), each batch
    * folds its rows in and emits the key's refreshed cells (Append —
    * downstream keeps the latest row per key and serves the z readout
    * at any moment via `Stats.twoProportionZFromCells`, the SAME fixed
    * IEEE tail the batch operator runs, so live == batch is structural).
    * FOUR LONGS of state per key regardless of history. NULL side/hit
    * rows fail loudly before touching state (the batch operator's
    * checked contract — a NULL side would silently vanish from both
    * arms). Input columns: (k, side, hit). Output: the cells table. */
  def streamingAbCells(obs: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = obs.sparkSession
    import spark.implicits._
    val guarded = obs.select(col("k").cast("long"),
      when(col("side").isNull || col("hit").isNull,
        raise_error(lit("streamingAbCells: NULL side/hit row — assign " +
          "every row a cohort and an outcome, or filter explicitly " +
          "before the stream")))
        .otherwise(col("side").cast("boolean")).as("side"),
      col("hit").cast("boolean").as("hit"))
    guarded.as[(Long, Boolean, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long),
        (Long, Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[(Long, Long, Long, Long)]) =>
          var (na, xa, nb, xb) = state.getOption.getOrElse((0L, 0L, 0L, 0L))
          rows.foreach { case (_, side, hit) =>
            if (side) { na += 1L; if (hit) xa += 1L }
            else { nb += 1L; if (hit) xb += 1L }
          }
          state.update((na, xa, nb, xb))
          Iterator((k, na, xa, nb, xb))
      }
      .toDF("k", "n_a", "x_a", "n_b", "x_b")
  }

  /** Streaming K-ANONYMITY class monitor — the live twin of
    * [[graft.operators.Stats.kAnonymityProfile]] (q235): per
    * quasi-identifier equivalence class (the caller packs the quasi
    * columns into `cls`; sensitive values arrive as longs — hash a
    * non-numeric sensitive first, the fingerprint-not-payload
    * discipline), each batch folds arrivals in and emits the class's
    * refreshed (n, l) row (Append — downstream keeps the latest row
    * per class and runs the q235 summary reduction over it at any
    * moment).
    *
    * Bounded state, HONESTLY: the raw l-diversity state (the distinct
    * sensitive set) is unbounded, but the monitor's question is
    * "which classes sit BELOW the k/l thresholds" — any class with
    * more than `lCap` distinct sensitive values is safely diverse and
    * its exact l is irrelevant. So the per-class state caps at
    * lCap + 1 retained values: for every class at or below the
    * threshold the streamed l is EXACT (== batch
    * least(count_distinct, lCap+1)), and a saturated class reports
    * exactly lCap + 1, meaning "≥ lCap + 1". State per class:
    * one long + at most lCap + 1 longs, regardless of history.
    * NULL sensitive values count toward n but never toward l (the
    * q235 semantics — an all-NULL class surfaces l = 0). Streamed ==
    * batch pinned in StreamingSpec, saturation included.
    * Input: (cls, s). Output: (cls, n, l_capped). */
  def streamingKAnonymityClasses(obs: DataFrame, lCap: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(lCap >= 1, s"streamingKAnonymityClasses needs lCap >= 1")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("cls").cast("string"), col("s").cast("long"))
      .as[(String, Option[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Seq[Long]), (String, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (cls, rows, state: GroupState[(Long, Seq[Long])]) =>
          var (n, seen) = state.getOption.getOrElse((0L, Seq.empty[Long]))
          var set = seen.toSet
          rows.foreach { case (_, sOpt) =>
            n += 1L
            sOpt.foreach { v =>
              if (set.size < lCap + 1 && !set.contains(v)) set += v
            }
          }
          state.update((n, set.toSeq))
          Iterator((cls, n, set.size.toLong))
      }
      .toDF("cls", "n", "l_capped")
  }

  /** Streaming GOLDEN-RECORD survivorship maintainer — the live twin
    * of [[graft.operators.Snapshot.goldenRecords]] (q212) in its
    * (ts, id)-ordered two-attribute shape: per entity cluster the
    * state is (member count, canonical min id, and for each attribute
    * the (ts, id, value) of the LATEST NON-NULL observation); each
    * batch folds its rows in and emits the cluster's refreshed golden
    * row (Append — downstream keeps the latest row per cluster).
    * Survivorship picks are associative-commutative max_by folds over
    * a unique (ts, id) order key, so streamed == batch over the full
    * history is structural, not coincidental — pinned in
    * StreamingSpec. State is O(1) per cluster regardless of history
    * (two longs + two bounded picks). Input columns:
    * (k, ts, id, a_s, a_l) with a unique (ts, id) per row.
    * Output: (k, n_members, canonical_id, last_s, last_l). */
  def streamingGoldenRecords(obs: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = obs.sparkSession
    import spark.implicits._
    def better[A](cur: Option[(Long, Long, A)], ts: Long, id: Long,
                  v: A): Option[(Long, Long, A)] =
      cur match {
        case Some((bt, bi, _)) if bt > ts || (bt == ts && bi >= id) => cur
        case _ => Some((ts, id, v))
      }
    obs.select(col("k").cast("long"), col("ts").cast("long"),
        col("id").cast("long"), col("a_s").cast("string"),
        col("a_l").cast("long"))
      .as[(Long, Long, Long, Option[String], Option[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[
        (Long, Long, Option[(Long, Long, String)],
          Option[(Long, Long, Long)]),
        (Long, Long, Long, Option[String], Option[Long])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[(Long, Long,
            Option[(Long, Long, String)], Option[(Long, Long, Long)])]) =>
          var (n, canon, ps, pl) =
            state.getOption.getOrElse((0L, Long.MaxValue,
              None: Option[(Long, Long, String)],
              None: Option[(Long, Long, Long)]))
          rows.foreach { case (_, ts, id, as_, al) =>
            n += 1L
            if (id < canon) canon = id
            as_.foreach(v => ps = better(ps, ts, id, v))
            al.foreach(v => pl = better(pl, ts, id, v))
          }
          state.update((n, canon, ps, pl))
          Iterator((k, n, canon, ps.map(_._3), pl.map(_._3)))
      }
      .toDF("k", "n_members", "canonical_id", "last_s", "last_l")
  }

  /** Streaming LAST-TOUCH ATTRIBUTION — the live twin of
    * [[graft.operators.AsOf.lastTouchAttribution]] (q224): per user
    * the state is ONE (ts, channel) pair — the latest touch seen —
    * and each arriving conversion is credited on the spot (touch
    * within `tolerance`, else "(unattributed)") and emitted as an
    * attribution row; downstream rolls the stream up by channel for
    * the live dashboard. Rows fold in event-time order within a batch
    * (sorted in the group iterator — bounded by one key's batch
    * slice), touches before conversions on an equal timestamp and max
    * channel on an equal-ts touch pair, exactly mirroring the batch
    * operator's (key, ts) max-channel dedupe + at-or-before as-of
    * pick, so streamed credits == batch credits whenever batches
    * respect event-time order across batch boundaries (the standard
    * maintainer contract — StreamingSpec pins it). Input:
    * (k, ts, kind 'touch'|'conv', channel, v). Output per conversion:
    * (k, ts, v, channel). */
  def streamingLastTouch(obs: DataFrame, tolerance: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("k").cast("long"), col("ts").cast("long"),
        col("kind").cast("string"), col("channel").cast("string"),
        col("v").cast("long"))
      .as[(Long, Long, String, Option[String], Option[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String),
        (Long, Long, Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[(Long, String)]) =>
          var st = state.getOption
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, String)]
          // touches sort before conversions at an equal ts (kind
          // 'conv' > 'touch' lexicographically reversed via boolean),
          // equal-ts touches ascending by channel so the LAST applied
          // is the max — the batch dedupe rule
          rows.toSeq.sortBy(r => (r._2, r._3 == "conv",
            r._4.getOrElse(""))).foreach {
            case (_, ts, "touch", Some(ch), _) =>
              if (st.forall(s => ts > s._1 || (ts == s._1 && ch > s._2)))
                st = Some((ts, ch))
            case (_, ts, "conv", _, Some(v)) =>
              val ch = st match {
                case Some((tts, c)) if ts >= tts && ts - tts <= tolerance
                  => c
                case _ => "(unattributed)"
              }
              out += ((k, ts, v, ch))
            case (_, ts, kind, _, _) => throw new IllegalArgumentException(
              s"streamingLastTouch: malformed row (k=$k, ts=$ts, " +
                s"kind=$kind) — touches need a channel, conversions a " +
                "value")
          }
          if (st.isDefined) state.update(st.get)
          out.iterator
      }
      .toDF("k", "ts", "v", "channel")
  }

  /** Streaming ROLLING OLS TREND — the live twin of
    * [[graft.operators.Stats.rollingOlsSlope]] (q227): per key the
    * state is the last `window−1` values plus a retained arrival
    * count (O(window) longs — never the history), and each arrival
    * with a full window emits its trailing least-squares slope
    * immediately. The slope is x-translation-invariant, so every
    * emission REBASES x to 1..w — sx/sxx/den are closed-form
    * constants and only sy/sxy fold over the buffer. The arrival
    * index therefore never enters the math: the previous form kept
    * x = the lifetime arrival index, whose Σx² ≈ w·idx² walked a
    * long-lived high-rate key deterministically into int64 wrap —
    * rebased, every magnitude is bounded by the WINDOW and the value
    * scale alone, for any stream lifetime. That bound is CHECKED,
    * not documented: each value must satisfy |y| ≤ 4·10¹⁸/w³ (the
    * numerator w³·B int64 budget with margin), rejected loudly
    * per-row, and the window is capped so den = w²(w²−1)/12 fits
    * int64. The emitted integers equal the batch operator's exactly
    * (same rebasing identity), so streamed == batch is structural
    * whenever batches respect (order, id) time order (StreamingSpec
    * pins it). Input: (k, o, id, y) with per-batch rows folded in
    * (o, id) order. Output: (k, o, id, n, slope) for full windows
    * only. */
  def streamingRollingSlope(obs: DataFrame, window: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(window >= 2, s"streamingRollingSlope needs window >= 2")
    require(window <= 100000,
      s"streamingRollingSlope: window $window exceeds 100000 — the " +
        "closed-form denominator w^2(w^2-1)/12 must fit int64")
    val n = window.toLong
    val sx = n * (n + 1L) / 2L
    val sxx = n * (n + 1L) * (2L * n + 1L) / 6L
    // den = n·sxx − sx² — but BOTH intermediate products overflow int64
    // near the window cap (n·sxx ≈ 3.3e19 at w = 100000), so compute the
    // closed form w²(w²−1)/12 ≈ 8.3e18 (which DOES fit, hence the cap)
    // through BigInt, exactly as the batch rollingOlsSlope does: the
    // value must never depend on two's-complement wraparound cancelling.
    val den = (BigInt(n) * n * (BigInt(n) * n - 1) / 12).toLong
    val maxAbsY = 4000000000000000000L / (n * n * n)
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("k").cast("long"), col("o").cast("long"),
        col("id").cast("long"), col("y").cast("long"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Seq[Long]),
        (Long, Long, Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[(Long, Seq[Long])]) =>
          var (cnt, buf0) = state.getOption.getOrElse((0L, Seq.empty[Long]))
          var buf = buf0.toVector
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Long, Double)]
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach {
            case (_, o, id, y) =>
              require(math.abs(y) <= maxAbsY,
                s"streamingRollingSlope: |y| = ${math.abs(y)} under key " +
                  s"$k exceeds the int64 exactness contract " +
                  s"(w^3*B <= 4e18 => |y| <= $maxAbsY at window " +
                  s"$window). Rescale the values to coarser integer " +
                  "units.")
              cnt += 1L
              buf = (buf :+ y).takeRight(window)
              if (buf.length == window) {
                // rebased x = 1..w: sx/sxx/den are the constants above
                var sy = 0L
                var sxy = 0L
                var j = 0
                while (j < window) {
                  sy += buf(j); sxy += (j + 1L) * buf(j); j += 1
                }
                out += ((k, o, id, n,
                  (n * sxy - sx * sy).toDouble / den.toDouble))
              }
          }
          state.update((cnt, buf))
          out.iterator
      }
      .toDF("k", "o", "id", "n", "slope")
  }

  /** Streaming transition-entropy monitor — the live twin of
    * [[graft.operators.Stats.transitionEntropy]] (q252), the
    * [[PsiMaintainer]] pattern over the pair histogram: each
    * micro-batch of (key, src, dst) transition rows folds into the
    * per-(key, src, dst) count state (counts additive over disjoint
    * row sets → streamed == batch is STRUCTURAL), and [[entropy]]
    * serves the exact batch readout through the shared
    * `transitionEntropyFromHist` path — a live "did this segment's
    * behavior become scripted?" (H→0) / "did navigation decouple?"
    * (MI→0) alarm. State: one bounded histogram, never rows. NULL
    * states fail loudly before touching state. */
  final class TransitionEntropyMaintainer(initial: DataFrame,
                                          keyCol: String, srcCol: String,
                                          dstCol: String,
                                          maxDistinctPerKey: Long = 2000000L) {
    import graft.operators.Stats
    private var hist: DataFrame = Stats.pairHist(initial, keyCol,
      srcCol, dstCol, "TransitionEntropyMaintainer")

    /** Exact [[graft.operators.Stats.transitionEntropy]] of every
      * transition folded so far, served from state. */
    def entropy(): DataFrame = synchronized {
      Stats.transitionEntropyFromHist(hist, keyCol, maxDistinctPerKey)
    }

    /** Fold one micro-batch of transition rows. */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val h = Stats.pairHist(batch, keyCol, srcCol, dstCol,
        "TransitionEntropyMaintainer")
      hist = hist.unionByName(h)
        .groupBy(col(keyCol), col("__src"), col("__dst"))
        .agg(sum(col("__c")).as("__c"))
        .localCheckpoint()
    }

    /** Start the maintenance stream: one [[applyBatch]] per micro-batch. */
    def attach(rows: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      rows.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the COMPLETE monitor state for
      * [[TransitionEntropyMaintainer.restore]]. */
    def checkpoint(dir: String): Unit = synchronized {
      hist.write.mode("overwrite").parquet(s"$dir/hist")
    }
  }

  object TransitionEntropyMaintainer {
    /** Resume a [[TransitionEntropyMaintainer.checkpoint]].
      * Configuration is not state — pass the SAME values the original
      * monitor ran with. */
    def restore(spark: SparkSession, dir: String, keyCol: String,
                srcCol: String, dstCol: String,
                maxDistinctPerKey: Long = 2000000L): TransitionEntropyMaintainer = {
      val hist = spark.read.parquet(s"$dir/hist")
      val emptyInitial = hist.limit(0)
        .select(col(keyCol), col("__src").as(srcCol),
          col("__dst").as(dstCol))
      val m = new TransitionEntropyMaintainer(emptyInitial, keyCol,
        srcCol, dstCol, maxDistinctPerKey)
      m.hist = hist.localCheckpoint()
      m
    }
  }

  /** Streaming importance-weight health monitor — the live twin of
    * [[graft.operators.Stats.weightDiagnostics]] (q246): per key the
    * state is the exact power sums (n, Σw, Σw², max w) — four scalars
    * regardless of history; weights micro-quantize per row with the
    * batch operator's banker-rounding, the sums accumulate in
    * BigDecimal (the batch decimal(38,0) lane — Σw² can pass int64
    * long before the CHECKED n·maxw² ≤ 10³⁷ contract trips), and each
    * batch emits the key's refreshed (n, sum_w, ess, efficiency,
    * max_w_share) row through the SAME final IEEE shape as the batch
    * operator, so live == batch is structural. NULL/negative weights
    * and the magnitude contract fail loudly per batch. Input columns:
    * (k, w). */
  def streamingEss(obs: DataFrame, scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(scale > 0, s"streamingEss: scale must be positive, got $scale")
    val bound = BigDecimal("1" + "0" * 37)
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("k").cast("long"), col("w").cast("double"))
      .as[(Long, java.lang.Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, BigDecimal, BigDecimal, Long),
        (Long, Long, Double, Double, Double, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[(Long, BigDecimal, BigDecimal, Long)]) =>
          var (n, s1, s2, mw) = state.getOption
            .getOrElse((0L, BigDecimal(0), BigDecimal(0), 0L))
          rows.foreach { case (_, w) =>
            require(w != null && !w.isNaN,
              s"streamingEss: NULL/NaN weight under key $k — weights " +
                "must be nonnegative; filter or clamp first")
            val wq = math.rint(w * scale.toDouble).toLong
            require(wq >= 0L,
              s"streamingEss: negative weight $w under key $k — " +
                "weights must be nonnegative; filter or clamp first")
            n += 1L
            s1 += BigDecimal(wq)
            s2 += BigDecimal(wq) * BigDecimal(wq)
            if (wq > mw) mw = wq
          }
          require(BigDecimal(n) * BigDecimal(mw) * BigDecimal(mw) <= bound,
            s"streamingEss: key $k exceeds the decimal(38,0) power-sum " +
              "contract (rows x maxWeight^2 <= 1e37 at the chosen " +
              "scale) — lower scale or rescale the weights")
          state.update((n, s1, s2, mw))
          val s1D = s1.doubleValue
          val out =
            if (s1.signum == 0)
              (k, n, s1D / scale.toDouble, Double.NaN, Double.NaN,
                Double.NaN)
            else (k, n, s1D / scale.toDouble,
              s1D * s1D / s2.doubleValue,
              s1D * s1D / s2.doubleValue / n.toDouble,
              mw.toDouble / s1D)
          Iterator.single(out)
      }
      .toDF("k", "n", "sum_w", "ess", "efficiency", "max_w_share")
  }

  /** Streaming Holt level+trend monitor — the live twin of
    * [[graft.operators.Stats.holtSmooth]] (q249): per key the state is
    * exactly TWO longs (level, trend) plus a seen flag regardless of
    * history — the smoothing recursion is sequential, so folding each
    * ordered observation through the same floor-divided updates as the
    * batch kernel makes streamed == batch STRUCTURAL. Each row emits
    * its one-step-ahead forecast made BEFORE the update (pred), so
    * |x − pred| is a ready-made live anomaly score with a trend-aware
    * baseline (the EWMA monitor's blind spot). The batch |x| ≤ 10¹⁵
    * headroom contract is enforced per row, loudly. Rows must arrive
    * in order per key across batches (the [[streamingCusum]]
    * contract). Input columns: (k, o, x). Output:
    * (k, o, x, pred, level, trend). */
  def streamingHolt(obs: DataFrame, aShift: Int = 2,
                    gShift: Int = 3): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(aShift >= 0 && aShift <= 62 && gShift >= 0 && gShift <= 62,
      s"streamingHolt: shifts must be in [0, 62], got ($aShift, $gShift)")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("k").cast("long"), col("o").cast("long"),
        col("x").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Boolean),
        (Long, Long, Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[(Long, Long, Boolean)]) =>
          var (l, b, seen) = state.getOption.getOrElse((0L, 0L, false))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Long, Long, Long)]
          rows.toSeq.sortBy(_._2).foreach { case (_, o, x) =>
            require(math.abs(x) <= 1000000000000000L,
              s"streamingHolt: |x| = ${math.abs(x)} under key $k " +
                "exceeds the int64 headroom contract (|x| <= 1e15) — " +
                "rescale the metric to coarser integer units")
            if (!seen) {
              l = x; b = 0L; seen = true
              out += ((k, o, x, x, l, b))
            } else {
              val pred = l + b
              val lN = pred + Math.floorDiv(x - pred, 1L << aShift)
              val bN = b + Math.floorDiv(lN - l - b, 1L << gShift)
              out += ((k, o, x, pred, lN, bN))
              l = lN; b = bN
            }
          }
          state.update((l, b, seen))
          out.iterator
      }
      .toDF("k", "o", "x", "pred", "level", "trend")
  }

  /** Streaming conformal-anomaly monitor — the live twin of
    * [[graft.operators.Stats.conformalBh]] (q239): per monitored key
    * the state is the TEST score histogram (bounded by score
    * resolution — the batch bounded-histogram contract made a stream
    * invariant, CHECKED per batch with a loud failure), while the
    * calibration histogram is a fixed plan literal (held out by
    * construction, it never grows). Each batch folds its rows in and
    * re-runs the SAME cross-multiplied int64 BH sweep as the batch
    * operator — exact rational p-values, the (ncal+1)·m·10⁶ ≤ 9e18
    * magnitude contract re-CHECKED as m grows — and emits the key's
    * refreshed (m, n_discoveries, thr_score, any) row (Append —
    * downstream keeps the latest row per key; discoveries are exactly
    * the rows with score ≥ thr_score when `any`). Batch parity is
    * structural: same histogram, same integer predicate, same
    * min-satisfying-score threshold — pinned by StreamingSpec against
    * `conformalBh` of the accumulated rows. Input columns: (k, s). */
  def streamingConformal(obs: DataFrame, calHist: Map[Long, Long],
                         alphaMicro: Long,
                         maxDistinctScores: Int = 100000): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(alphaMicro > 0 && alphaMicro < 1000000L,
      s"streamingConformal: alphaMicro must be in (0, 1e6), got $alphaMicro")
    require(calHist.nonEmpty && calHist.valuesIterator.forall(_ > 0),
      "streamingConformal: calibration histogram must be non-empty with " +
        "positive counts")
    val spark = obs.sparkSession
    import spark.implicits._
    val ncal = calHist.valuesIterator.sum
    // descending calibration scores + cumulative ≥-counts, fixed once
    val calDesc = calHist.toArray.sortBy(-_._1)
    val calScores = calDesc.map(_._1)
    val calCum = calDesc.scanLeft(0L)(_ + _._2).tail
    def geCal(s: Long): Long = {
      var lo = 0; var hi = calScores.length // calScores descending
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (calScores(mid) >= s) lo = mid + 1 else hi = mid
      }
      if (lo == 0) 0L else calCum(lo - 1)
    }
    obs.select(col("k").cast("long"), col("s").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, Long],
        (Long, Long, Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[Map[Long, Long]]) =>
          var h = state.getOption.getOrElse(Map.empty[Long, Long])
          rows.foreach { case (_, s) =>
            h = h.updated(s, h.getOrElse(s, 0L) + 1L) }
          require(h.size <= maxDistinctScores,
            s"streamingConformal: key $k holds ${h.size} distinct " +
              s"scores, exceeding the bounded-histogram contract " +
              s"(maxDistinctScores=$maxDistinctScores) — quantize the " +
              "score before streaming")
          state.update(h)
          val m = h.valuesIterator.sum
          require((ncal + 1).toDouble * m.toDouble * 1e6 <= 9e18,
            s"streamingConformal: key $k reached (n_cal+1)*m = " +
              s"${(ncal + 1) * m}, exceeding the cross-multiplied " +
              "int64 exactness contract ((n_cal+1)*m*1e6 <= 9e18) — " +
              "sample the calibration or shard the monitor")
          // descending sweep: within a tie block only the largest rank
          // can certify, and the LAST satisfying block (smallest score)
          // is the selection threshold — the batch operator verbatim
          var r = 0L
          var thr = Option.empty[Long]
          h.toArray.sortBy(-_._1).foreach { case (s, c) =>
            r += c
            val pnum = 1L + geCal(s)
            if (pnum * m * 1000000L <= r * alphaMicro * (ncal + 1L))
              thr = Some(s)
          }
          val nDisc = thr.map(t =>
            h.iterator.filter(_._1 >= t).map(_._2).sum).getOrElse(0L)
          Iterator((k, m, nDisc, thr.getOrElse(Long.MinValue),
            thr.isDefined))
      }
      .toDF("k", "m", "n_discoveries", "thr_score", "any")
  }

  /** Streamed RQ rank-quantile sketch per key — the live twin of
    * `functions.rq_sketch` (q192/q193): per-key state is the canonical
    * sketch bytes (level + ≤ budget exact value counts), each batch
    * folds its values in, and each batch emits the key's refreshed
    * bytes (Append — downstream keeps the latest row per key and serves
    * quantiles with `rq_quantile` at any moment). Because the sketch is
    * a PURE FUNCTION OF THE INPUT MULTISET (merge == one-shot — the
    * RqSketch invariant), the emitted bytes are BIT-IDENTICAL to the
    * batch aggregate over the key's full history: the strongest
    * streamed-equals-batch contract in the module, pinned by
    * StreamingSpec. State is bounded by the budget, never by history.
    * Input columns: (k, v). Output: (k, sketch). */
  def streamingRqSketch(obs: DataFrame, budget: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("k").cast("long"), col("v").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], (Long, Array[Byte])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[Array[Byte]]) =>
          val buf = state.getOption
            .map(graft.functions.RqSketch.deserialize)
            .getOrElse(graft.functions.RqSketch.emptyBuf())
          rows.foreach { case (_, v) =>
            graft.functions.RqSketch.insert(buf, v, 1L, budget) }
          val bytes = graft.functions.RqSketch.serialize(buf)
          state.update(bytes)
          Iterator((k, bytes))
      }
      .toDF("k", "sketch")
  }

  /** Streamed state for EXACT exponentially-decayed popularity — the
    * live twin of [[graft.operators.Stats.decayedCounts]]. Per key the
    * state is the total event count plus a day→count histogram PRUNED
    * to the trailing `horizonDays` window of that key's newest day —
    * at most horizonDays+1 entries, so state is bounded by the horizon,
    * never by history length. Pruning is lossless for the final score:
    * a day dropped here is ≥ horizon behind the key's max day, hence ≥
    * horizon behind the GLOBAL max day, where its power-of-two weight
    * is exactly zero in the batch kernel too. Each batch emits the
    * key's refreshed state row (Append — downstream keeps the latest
    * per key); [[decayedFromState]] turns a state snapshot into the
    * batch-identical (n_events, decayed, score) table. */
  def streamingDecayedState(obs: DataFrame, horizonDays: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(horizonDays >= 0 && horizonDays <= 62,
      s"streamingDecayedState needs horizonDays in [0, 62], got $horizonDays")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("k").cast("long"), col("d").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Map[Long, Long]),
        (Long, Long, Array[Long], Array[Long])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[(Long, Map[Long, Long])]) =>
          var (n, hist) = state.getOption.getOrElse((0L, Map.empty[Long, Long]))
          rows.foreach { case (_, d) =>
            n += 1L
            hist = hist.updated(d, hist.getOrElse(d, 0L) + 1L)
          }
          val maxd = hist.keys.max
          hist = hist.filter { case (d, _) => maxd - d <= horizonDays }
          state.update((n, hist))
          val days = hist.keys.toArray.sorted
          Iterator((k, n, days, days.map(hist)))
      }
      .toDF("k", "n_events", "days", "counts")
  }

  /** Serve the decayed-popularity table from a [[streamingDecayedState]]
    * snapshot (latest row per key): ages every retained day against the
    * GLOBAL max day across keys — joined in as a one-row aggregate (the
    * trailingActives discipline, no eager collect) — with the same
    * power-of-two weights as the batch kernel, so the result is
    * bit-identical to `Stats.decayedCounts` over the full history. */
  def decayedFromState(stateSnapshot: DataFrame, horizonDays: Int): DataFrame = {
    require(horizonDays >= 0 && horizonDays <= 62,
      s"decayedFromState needs horizonDays in [0, 62], got $horizonDays")
    val bound = stateSnapshot.select(explode(col("days")).as("__d"))
      .agg(max(col("__d")).as("__maxd"))
    stateSnapshot
      .select(col("k"), col("n_events"),
        explode(arrays_zip(col("days"), col("counts"))).as("__z"))
      .select(col("k"), col("n_events"),
        col("__z.days").as("__d"), col("__z.counts").as("__c"))
      .crossJoin(bound)
      .withColumn("__w",
        when(col("__maxd") - col("__d") <= horizonDays,
          col("__c") * expr(
            s"shiftleft(1L, cast(${horizonDays}L - (__maxd - __d) as int))"))
          .otherwise(lit(0L)))
      .groupBy(col("k"))
      .agg(max(col("n_events")).as("n_events"), sum(col("__w")).as("decayed"))
      .withColumn("score",
        col("decayed").cast("double") / lit(math.pow(2.0, horizonDays)))
  }

  /** Streamed RUN-LENGTH encoding — the live twin of
    * [[graft.operators.Stats.stateRuns]]: per key the state is just
    * (current run index, its state value, its length), three values
    * regardless of history; each batch walks its rows in `o` order,
    * extends or opens runs, and emits every run TOUCHED this batch with
    * its refreshed length (Append — downstream keeps the max-length row
    * per (k, run_idx), since a run can grow across batches). Rows must
    * arrive with non-decreasing `o` per key across batches (the
    * streamingEwma in-order contract); states must be non-null.
    * Output rows: (k, run_idx, state, run_len). */
  def streamingStateRuns(obs: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col("k").cast("long"), col("o").cast("long"),
        col("st").cast("string"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String, Long),
        (Long, Long, String, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (k, rows, state: GroupState[(Long, String, Long)]) =>
          var (run, st, len) = state.getOption.getOrElse((0L, null: String, 0L))
          val touched = scala.collection.mutable.LinkedHashMap
            .empty[Long, (String, Long)]
          rows.toSeq.sortBy(_._2).foreach { case (_, _, s) =>
            if (st == null || s != st) { run += 1L; st = s; len = 0L }
            len += 1L
            touched(run) = (st, len)
          }
          state.update((run, st, len))
          touched.iterator.map { case (r, (s, l)) => (k, r, s, l) }
      }
      .toDF("k", "run_idx", "state", "run_len")
  }

  /** Windowed per-type event counts (tumbling) — the streaming analogue of
    * the report side-channel. */
  def eventTypeCounts(events: DataFrame, windowMinutes: Int = 10,
                      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$windowMinutes minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Windowed approximate distinct counts via the [[graft.functions.HllDistinct]]
    * sketch aggregate — distinct users per event type per tumbling window
    * in one pass with 2^p BYTES of state per group. This is the streaming
    * cardinality shape: an exact distinct would hold every id in the
    * state store (unbounded per-group state), while the sketch buffer is
    * fixed-size and merges by byte-max, so partial aggregation and state
    * compaction stay cheap. The estimate is identical to the batch
    * `hll_distinct` over the same rows — the sketch is deterministic and
    * partitioning-independent. */
  def windowedDistinctUsers(events: DataFrame, windowMinutes: Int = 10,
                            watermark: String = "1 hour", p: Int = 10): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$windowMinutes minutes"), col("event_type"))
      .agg(hll_distinct(col("user_id").cast("string"), p).as("approx_users"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("approx_users"))

  /** Windowed approximate value quantiles via the mergeable histogram
    * sketch ([[graft.functions.HistAgg]]): p50/p90/p99 of `value` per
    * event type per tumbling window with nBins*8 BYTES of state per
    * group — an exact windowed percentile would buffer every value in
    * the state store. Deterministic: identical to the batch histogram
    * over the same rows. */
  def windowedValueQuantiles(events: DataFrame, windowMinutes: Int = 10,
                             watermark: String = "1 hour",
                             lo: Double = 0.0, hi: Double = 1000.0,
                             nBins: Int = 128): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$windowMinutes minutes"), col("event_type"))
      .agg(hist_agg(col("value").cast("double"), lo, hi, nBins).as("h"))
      .select(col("window.start").as("window_start"), col("event_type"),
        hist_quantile(col("h"), 0.5, lo, hi, nBins).as("p50"),
        hist_quantile(col("h"), 0.9, lo, hi, nBins).as("p90"),
        hist_quantile(col("h"), 0.99, lo, hi, nBins).as("p99"))

  /** Top-k largest events per tumbling window via the partial-combining
    * [[graft.functions.TopKByAgg]] — the streaming anomaly/outlier
    * monitor: state per group is k rows, not the window's full event
    * set, and no sort ever runs. Value is integer cents in the sort key
    * so ordering is exact; event_id rides negated for an ascending
    * tiebreak. */
  def windowedTopEvents(events: DataFrame, k: Int = 3, windowMinutes: Int = 10,
                        watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$windowMinutes minutes"), col("event_type"))
      .agg(top_k_by(struct(
        bround(col("value") * 100, 0).cast("long").as("value_cents"),
        (-col("event_id")).as("neg_id")), k).as("top"))
      .select(col("window.start").as("window_start"), col("event_type"),
        posexplode(col("top")))
      .select(col("window_start"), col("event_type"),
        (col("pos") + 1).as("rank"),
        (-col("col.neg_id")).as("event_id"), col("col.value_cents"))

  /** Streaming near-duplicate candidate detection — the batch LSH bucket
    * join (Dedup.minhashLshPairs' candidate step) as continuous ingest.
    * Input rows are banded minhash signatures (doc_id, band, band_sig)
    * from `Dedup.bandedSignatures`, which is stateless and runs on a
    * streaming frame unchanged. Each (band, band_sig) bucket keeps its
    * first-seen anchor doc_id in the state store; every later arrival
    * emits an (anchor, doc_id) candidate pair. Exact-Jaccard verification
    * stays a batch join against the corpus. State partitions by bucket
    * key, so it scales like any keyed stream.
    *
    * Each bucket's anchor expires after `ttlMs` of event-time silence
    * past the watermark (same TTL'd re-admission contract as
    * [[streamingDedup]]): a bucket nothing has hashed into for a day
    * stops occupying the store, and its next arrival becomes the new
    * anchor. Input needs (doc_id, band, band_sig, ts) — pass `ts`
    * through `Dedup.bandedSignatures(..., extraCols = Seq("ts"))`. */
  def streamingLshCandidates(banded: DataFrame,
                             watermarkDelay: String = "10 minutes",
                             ttlMs: Long = 24L * 3600 * 1000): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .withWatermark("ts", watermarkDelay)
      .where(col("ts").isNotNull) // null event time would NPE the TTL below
      .select(col("band"), concat_ws(",", col("band_sig")).as("sig"),
        col("doc_id"), col("ts"))
      .as[(Int, String, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // single pass: only the doc ids are kept (needed for the
            // deterministic sorted emission order), timestamps are folded
            // into a running max instead of buffering the tuples
            val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
            var maxTs = Long.MinValue
            rows.foreach { r =>
              ids += r._3
              val t = r._4.getTime
              if (t > maxTs) maxTs = t
            }
            val sorted = ids.sorted
            val (anchor, rest) =
              if (state.exists) (state.get, sorted) else (sorted.head, sorted.tail)
            state.update(anchor)
            state.setTimeoutTimestamp(math.max(
              maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            rest.iterator.filter(_ != anchor).map(d => (anchor, d))
          }
      }
      .toDF("id_a", "id_b")
  }

  /** Streaming form of the q78 trailing-window anomaly scorer: a stream
    * of per-(event_type, bucket) counts is z-scored against the previous
    * `window` buckets of the same type, kept as BOUNDED per-key state
    * (at most `window` (bucket, cnt) pairs — the state size is
    * types x window regardless of stream length). Exactly q78's math:
    * integer trailing sums, population variance, z only when the
    * variance is positive and at least `minPrev` buckets precede.
    * Feed it finalized bucket counts (e.g. append-mode windowed counts
    * after the watermark) so buckets arrive per key in event-time order;
    * within a micro-batch rows are sorted by bucket. */
  def streamingAnomaly(counts: DataFrame, window: Int = 24,
                       minPrev: Int = 6): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(window >= 1 && minPrev >= 1 && minPrev <= window,
      s"streamingAnomaly needs 1 <= minPrev <= window, got $minPrev/$window")
    val spark = counts.sparkSession
    import spark.implicits._
    counts.select(col("event_type"), col("bucket").cast("long"),
        col("cnt").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long)],
        (String, Long, Long, Option[Double], Option[Double])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[List[(Long, Long)]]) =>
          var hist = state.getOption.getOrElse(Nil) // newest bucket first
          val out = rows.toSeq.sortBy(_._2).map { case (_, bucket, cnt) =>
            val prev = hist.filter(_._1 < bucket).take(window)
            val n = prev.size
            val stats =
              if (n >= minPrev) {
                val s1 = prev.iterator.map(_._2).sum
                val s2 = prev.iterator.map(c => c._2 * c._2).sum
                val mean = s1.toDouble / n
                val variance = s2.toDouble / n - mean * mean
                val z = if (variance > 0) Some((cnt - mean) / math.sqrt(variance)) else None
                Some((mean, z))
              } else None
            hist = ((bucket, cnt) :: hist.filter(_._1 != bucket))
              .sortBy(-_._1).take(window)
            (key, bucket, cnt, stats.map(_._1), stats.flatMap(_._2))
          }
          state.update(hist)
          out.iterator
      }
      .toDF("event_type", "bucket", "cnt", "trail_mean", "z_score")
  }

  /** Stream-static n-gram Bloom decontamination — the q69 batch shape on
    * continuous corpus ingest: the held-out set's shingles collapse to
    * ONE static Bloom row (built once with `bloom_agg`), cross-joined
    * onto the document stream; each arriving doc reports how many of its
    * 3-gram shingles test positive. Stateless and map-only per
    * micro-batch (no streaming state at all — the filter is a broadcast
    * constant), so the ingest path scales exactly like the batch scan.
    * `bloom` must be a one-row static frame with a binary `f` column
    * built with the same (numBits, numHashes). */
  def streamingDecontaminate(docs: DataFrame, bloom: DataFrame,
                             numBits: Int, numHashes: Int,
                             shingleN: Int = 3): DataFrame =
    docs
      .withColumn("shingles", coalesce(
        word_shingles(ws_tokens(col("text")), shingleN, distinct = true),
        array().cast("array<string>")))
      .crossJoin(broadcast(bloom))
      .select(col("doc_id"),
        size(col("shingles")).cast("long").as("n_shingles"),
        size(filter(col("shingles"),
          x => bloom_contains(col("f"), x, numBits, numHashes)))
          .cast("long").as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)

  /** Continuous-ingest chunking: TextAnalysis.chunkOffsets is a pure
    * projection + generator (chunk_spans walks each token array once,
    * posexplode emits the windows), so the SAME operator runs unchanged
    * on a document stream — no state, no watermark, one chunk-table row
    * per window per arriving doc. Continuous ingest therefore produces
    * the exact rows the batch chunker (q76) produces on the same docs. */
  def streamingChunks(docs: DataFrame, chunkTokens: Int = 16,
                      overlap: Int = 8): DataFrame =
    graft.operators.TextAnalysis.chunkOffsets(
      docs, "doc_id", "text", chunkTokens, overlap)

  /** Continuous-ingest quality gate: the classifier filter
    * (TextAnalysis.classifierQualityFilter) is one stateless projection
    * — per-doc features and a linear score — so the SAME operator runs
    * unchanged on a document stream, scoring each doc the moment it
    * arrives with exactly the batch (q90) rows. This is the shape a
    * live ingest filter runs in production: score-at-ingest, route by
    * `keep`. */
  def streamingQualityGate(docs: DataFrame,
                           bias: Double, wMeanLen: Double, wAlpha: Double,
                           wStop: Double, wDigit: Double): DataFrame =
    graft.operators.TextAnalysis.classifierQualityFilter(
      docs, "doc_id", "text", bias, wMeanLen, wAlpha, wStop, wDigit)

  /** Continuous-ingest hashing-trick vectorizer. The batch form's
    * (doc, dim) groupBy would become a STATEFUL streaming aggregate —
    * unbounded state for a computation that is complete the moment the
    * document arrives — so the bucket histogram is computed inside the
    * row by the single-pass [[graft.functions.hash_bucket_counts]]
    * expression (tokenize once, one O(tokens) map walk) and exploded:
    * stateless, append-mode, emitting exactly
    * TextAnalysis.hashingVectorizer's (doc_id, dim, cnt) rows. The
    * previous composed form — `size(filter(dims, _ == d))` per distinct
    * bucket — tokenized twice and paid O(tokens x distinct buckets) per
    * document, quadratic on long documents; zero-count buckets stay
    * absent either way. */
  def streamingVectorize(docs: DataFrame, dim: Int): DataFrame = {
    require(dim >= 2 && dim <= (1 << 24), s"streamingVectorize dim out of range: $dim")
    docs.select(col("doc_id"),
        explode(hash_bucket_counts(col("text"), dim)).as("e"))
      .select(col("doc_id"), col("e.dim").as("dim"), col("e.cnt").as("cnt"))
  }

  /** Continuous-ingest perplexity gate: score each arriving document
    * against a TRAINED bigram-NLL table
    * (TextAnalysis.bigramNllTable, collected to a plan-literal map —
    * the broadcast-LM stance of CCNet's memory-mapped KenLM; swap for a
    * stream-static join + stateful sum if the LM outgrows a literal).
    * Scoring is ONE in-row fold over the bigram array — a (count, sum)
    * struct accumulator, so the shingle expression is referenced
    * exactly once — then routed through a Generate (the q90 idiom) so
    * the four output columns cannot re-inline it. Stateless,
    * append-mode; emits the batch filter's exact columns, with unseen
    * bigrams (impossible in batch, which trains on its own corpus)
    * charged `unseenNllMicro`. */
  def streamingPerplexityGate(docs: DataFrame, nll: Map[String, Long],
                              thresholdMicro: Long,
                              unseenNllMicro: Long): DataFrame = {
    val m = typedLit(nll)
    val scored = aggregate(
      word_shingles(ws_tokens(col("text")), 2),
      struct(lit(0L).as("n"), lit(0L).as("s")),
      // try_element_at, not element_at: under Spark 4's default ANSI
      // mode a missing MAP key THROWS (MAP_KEY_DOES_NOT_EXIST), so a
      // plain lookup would fail the stream on the first unseen bigram
      // instead of charging the penalty
      (acc, x) => struct((acc.getField("n") + 1).as("n"),
        (acc.getField("s") + coalesce(try_element_at(m, x), lit(unseenNllMicro)))
          .as("s")))
    docs.select(col("doc_id"), explode(array(scored)).as("f"))
      .select(col("doc_id"),
        coalesce(col("f.n"), lit(0L)).as("n_bigrams"),
        coalesce(col("f.s"), lit(0L)).as("nll_sum_micro"),
        when(col("f.n") > 0, expr("f.s div f.n")).otherwise(lit(0L))
          .as("nll_avg_micro"),
        (coalesce(col("f.n"), lit(0L)) > 0 &&
          when(col("f.n") > 0, expr("f.s div f.n")).otherwise(lit(0L))
            <= thresholdMicro).as("keep"))
  }

  /** Continuous search-index maintenance over a stream of (id, text)
    * upserts and (optionally) deletes — the streaming form of the
    * q105/q108 LSM-segment model (TextAnalysis.searchIndexDelta /
    * searchSegmentsTopK / compactSearchIndex). Driver-held state is the
    * corpus FINGERPRINT table (two longs per doc — the Snapshot.delta
    * fingerprint-not-payload discipline; the corpus text is never
    * retained), the compacted BASE index, and the accumulated pending
    * [[TextAnalysis.SearchDelta]] segments. Each micro-batch classifies
    * its rows against the fingerprints (presence-based: a first-seen id
    * is `added` even when its text — and so its fingerprint — is NULL,
    * matching searchIndexDelta and a full rebuild, which both carry a
    * dl=0 docmeta row for it), tokenizes ONLY added+changed rows into a
    * delta segment, tombstones changed+deleted ids, and APPENDS the
    * segment: compaction (the O(live postings) regroup) runs only once
    * every `compactEvery` batches, so minute-level micro-batches cost
    * O(|batch|) each and the regroup amortizes — serving reads base +
    * pending segments through [[topK]] in the meantime. An unchanged
    * re-send is a no-op (no tombstone, no segment row); a delete of an
    * absent id is a no-op. With `deleteCol` set, batch rows with that
    * boolean column true are deletes (their text is ignored) — the
    * streamed entry point for the batch path's tombstone semantics.
    * Parity with a full rebuild of the surviving corpus is pinned by
    * StreamingSpec, with compaction counted, not just claimed. */
  final class SearchIndexMaintainer(initialCorpus: DataFrame, idCol: String,
                                    textCol: String,
                                    nShards: Int = graft.operators.TextAnalysis.AutoShards,
                                    compactEvery: Int = 8,
                                    deleteCol: Option[String] = None,
                                    maintainPositions: Boolean = false,
                                    maxDocsPerShard: Int =
                                      graft.operators.TextAnalysis.DefaultMaxDocsPerShard) {
    import graft.operators.TextAnalysis
    require(compactEvery >= 1,
      s"SearchIndexMaintainer needs compactEvery >= 1, got $compactEvery")
    private var fps: DataFrame = initialCorpus
      .select(col(idCol).as("doc_id"), md5_long(col(textCol)).as("fp"))
      .localCheckpoint()
    private var base: TextAnalysis.SearchIndex =
      TextAnalysis.buildSearchIndex(initialCorpus, idCol, textCol, nShards,
        maxDocsPerShard)
    private var pending: Vector[TextAnalysis.SearchDelta] = Vector.empty
    private var nCompactions: Long = 0L
    // the positional postings share the SEGMENT LIFECYCLE (same refresh
    // rows, same tombstones, same compaction cadence) — the Lucene
    // stance, where positions live inside the same segment as the
    // postings; they are a separate TABLE only for the space trade
    private var posBase: Option[DataFrame] =
      if (maintainPositions)
        Some(TextAnalysis.buildPositionalIndex(initialCorpus, idCol, textCol,
          nShards, maxDocsPerShard))
      else None
    private var posPending: Vector[TextAnalysis.PositionalDelta] = Vector.empty

    // compactPositionalIndex needs an explicit shard count (no docmeta
    // table to derive AutoShards from): resolve from the fingerprint
    // table, which tracks the full corpus and is materialized — the SAME
    // maxDocsPerShard the builders above used, so the two cannot drift
    private def posShards: Int =
      if (nShards > 0) nShards
      else math.max(1L,
        (fps.count() + maxDocsPerShard - 1) / maxDocsPerShard).toInt

    private def compactNow(): Unit = {
      base = TextAnalysis.compactSearchIndex(base, pending, nShards)
      posBase = posBase.map(p =>
        TextAnalysis.compactPositionalIndex(p, posPending, posShards))
      pending = Vector.empty
      posPending = Vector.empty
      nCompactions += 1
    }

    /** The served single-index view: folds any pending segments into
      * the base first (an explicit compaction point — callers that can
      * serve multi-segment should prefer [[topK]]). */
    def index: TextAnalysis.SearchIndex = synchronized {
      if (pending.nonEmpty) compactNow()
      base
    }

    /** BM25 top-k over base + pending segments — the serving path that
      * needs NO compaction work. */
    def topK(terms: Seq[String], k: Int): DataFrame = synchronized {
      TextAnalysis.searchSegmentsTopK(base, pending, terms, k)
    }

    /** Phrase search over the co-maintained positional levels — only
      * with `maintainPositions = true`. */
    def phrase(terms: Seq[String]): DataFrame = synchronized {
      TextAnalysis.phraseSearchSegments(posIndexOrFail, posPending, terms)
    }

    /** Proximity predicate over the same co-maintained positional
      * levels (the [[phrase]] sibling — no compaction work either). */
    def proximity(termsA: Seq[String], termsB: Seq[String], maxGap: Long,
                  ordered: Boolean = false): DataFrame = synchronized {
      TextAnalysis.proximitySearchSegments(posIndexOrFail, posPending,
        termsA, termsB, maxGap, ordered)
    }

    /** Inclusion/exclusion selection over base + pending segments —
      * the corpus-subsetting predicate served live, no compaction
      * work. */
    def termFilter(mustHave: Seq[String],
                   mustNot: Seq[String] = Nil): DataFrame = synchronized {
      TextAnalysis.termFilterSegments(base, pending, mustHave, mustNot)
    }

    /** Wildcard (`pre*`) selection over base + pending segments — the
      * range-probe sibling of [[termFilter]], no compaction work. */
    def prefix(p: String): DataFrame = synchronized {
      TextAnalysis.prefixSearchSegments(base, pending, p)
    }

    /** The maintained positional postings as one table (compacts
      * first, like [[index]]). */
    def positionalIndex: DataFrame = synchronized {
      if (pending.nonEmpty) compactNow()
      posIndexOrFail
    }

    private def posIndexOrFail: DataFrame = posBase.getOrElse(
      throw new IllegalStateException(
        "positional serving needs maintainPositions = true"))

    /** Pending (not yet compacted) segment count / compactions run. */
    def segmentCount: Int = synchronized(pending.length)
    def compactionCount: Long = synchronized(nCompactions)

    /** Apply one micro-batch of upserts/deletes (ids unique within a
      * batch). */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val isDel = deleteCol.filter(batch.columns.contains)
        .map(c => coalesce(col(c).cast("boolean"), lit(false)))
        .getOrElse(lit(false))
      val b = batch.select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        md5_long(col(textCol)).as("fp"), isDel.as("__del")).localCheckpoint()
      val classified = b.join(
        fps.select(col("doc_id"), col("fp").as("fp_prev"),
          lit(true).as("in_prev")),
        Seq("doc_id"), "left_outer")
      val present = coalesce(col("in_prev"), lit(false))
      // presence-based `added` (NOT fingerprint equality alone: an added
      // doc with NULL text has fp <=> fp_prev — both NULL — yet must
      // enter docmeta); null-safe `changed` so a NULL -> NULL re-send
      // stays unchanged
      val refresh = classified.where(!col("__del") &&
        (!present || !(col("fp") <=> col("fp_prev"))))
      val refreshRows = refresh.select(col("doc_id"), col("__text"))
        .localCheckpoint() // consumed by both segment builds
      val segment = TextAnalysis.buildSearchIndex(refreshRows, "doc_id",
        "__text", nShards)
      val tombstones = classified
        .where(present && (col("__del") || !(col("fp") <=> col("fp_prev"))))
        .select(col("doc_id")).localCheckpoint()
      pending :+= TextAnalysis.SearchDelta(segment, tombstones)
      if (maintainPositions) {
        posPending :+= TextAnalysis.PositionalDelta(
          TextAnalysis.buildPositionalIndex(refreshRows, "doc_id", "__text",
            nShards), tombstones)
      }
      // fps updates BEFORE any compaction so posShards sizes from the
      // post-batch corpus, not the previous one
      fps = fps.join(b.select("doc_id"), Seq("doc_id"), "left_anti")
        .unionByName(b.where(!col("__del")).select(col("doc_id"), col("fp")))
        .localCheckpoint()
      if (pending.length >= compactEvery) compactNow()
    }

    /** Start the maintenance stream: one [[applyBatch]] per micro-batch. */
    def attach(upserts: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      upserts.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the COMPLETE maintenance state — fingerprints, compacted
      * base (first-class [[TextAnalysis.saveSearchIndex]] layout),
      * every pending segment with its tombstones, the co-maintained
      * positional twins, and a one-row meta table — so a restarted
      * driver resumes via [[SearchIndexMaintainer.restore]] WITHOUT the
      * original corpus (which, mid-stream, no longer exists anywhere
      * else: the maintainer deliberately retains fingerprints, not
      * text). Stale `seg-*` directories from an earlier, longer
      * checkpoint are ignored at restore (meta's pending count bounds
      * the reads). Call between batches (synchronized like every other
      * entry point). */
    def checkpoint(dir: String): Unit = synchronized {
      val spark = fps.sparkSession
      import spark.implicits._
      fps.write.mode("overwrite").parquet(s"$dir/fps")
      TextAnalysis.saveSearchIndex(base, s"$dir/base")
      pending.zipWithIndex.foreach { case (d, i) =>
        TextAnalysis.saveSearchIndex(d.segment, f"$dir/seg-$i%03d")
        d.tombstones.write.mode("overwrite")
          .parquet(f"$dir/seg-$i%03d/tombstones")
      }
      posBase.foreach(p =>
        TextAnalysis.savePositionalIndex(p, s"$dir/posbase"))
      posPending.zipWithIndex.foreach { case (d, i) =>
        d.segment.write.mode("overwrite").parquet(f"$dir/posseg-$i%03d/segment")
        d.tombstones.write.mode("overwrite")
          .parquet(f"$dir/posseg-$i%03d/tombstones")
      }
      Seq((pending.length, nCompactions, posBase.isDefined))
        .toDF("n_pending", "n_compactions", "maintain_positions")
        .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
  }

  /** Continuous EXACT set-similarity maintenance — the streamed twin of
    * the q156/q157 PPJoin pair, keeping "all pairs with Jaccard >=
    * threshold" LIVE over a stream of (id, text) upserts and deletes
    * the way [[SearchIndexMaintainer]] keeps its indexes live.
    *
    * Driver-held state (references to checkpointed frames — no text is
    * ever retained, the fingerprint-not-payload discipline):
    *   - `fps`   — (doc_id, fp) corpus fingerprints for batch
    *     classification (two longs per doc);
    *   - `sets`  — (doc_id, ts) the per-doc shingle sets of the LIVE
    *     corpus: everything the PPJoin math needs (df order, prefixes,
    *     verification hashes) derives from this table, so maintenance
    *     never needs the original text back;
    *   - `pairs` — (id_a, id_b, jaccard) the maintained answer.
    *
    * Per batch, the q157 invariant applied literally:
    *   pairs' = pairs − {p : p touches a changed/deleted id}
    *            ∪ ppJoinDelta-form(sets', fresh = added ∪ changed)
    * which equals ppJoin(surviving corpus) — survivors' endpoints both
    * kept their shingle sets (Jaccard untouched); every other pair is
    * re-derived against the POST-batch df order. O(delta × matched
    * postings) per batch, never a corpus re-join; StreamingSpec pins
    * streamed == batch rebuild over random upsert/delete histories,
    * checkpoint/restore included. */
  final class SimilarityMaintainer(initialCorpus: DataFrame, idCol: String,
                                   textCol: String, threshold: Double,
                                   shingleN: Int = 3,
                                   deleteCol: Option[String] = None) {
    import graft.operators.Dedup
    require(threshold > 0.0 && threshold <= 1.0,
      s"SimilarityMaintainer needs threshold in (0, 1], got $threshold")
    private var fps: DataFrame = initialCorpus
      .select(col(idCol).as("doc_id"), md5_long(col(textCol)).as("fp"))
      .localCheckpoint()
    private var sets: DataFrame =
      Dedup.ppSets(initialCorpus, idCol, textCol, shingleN)
    private var livePairs: DataFrame =
      Dedup.ppJoinFrom(sets, threshold, None).localCheckpoint()

    /** The maintained pair set (id_a, id_b, jaccard). */
    def pairs: DataFrame = synchronized(livePairs)

    /** Apply one micro-batch of upserts/deletes (ids unique within a
      * batch) — classification discipline identical to
      * [[SearchIndexMaintainer.applyBatch]]. */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val isDel = deleteCol.filter(batch.columns.contains)
        .map(c => coalesce(col(c).cast("boolean"), lit(false)))
        .getOrElse(lit(false))
      val b = batch.select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        md5_long(col(textCol)).as("fp"), isDel.as("__del")).localCheckpoint()
      val classified = b.join(
        fps.select(col("doc_id"), col("fp").as("fp_prev"),
          lit(true).as("in_prev")),
        Seq("doc_id"), "left_outer")
      val present = coalesce(col("in_prev"), lit(false))
      // ids whose OLD state dies: deletes and changed re-sends — their
      // sets leave the corpus and every pair touching them is re-derived
      // (changed) or gone (deleted)
      val gone = classified
        .where(present && (col("__del") || !(col("fp") <=> col("fp_prev"))))
        .select(col("doc_id")).localCheckpoint()
      // ids whose NEW state enters: added + changed (presence-based —
      // the SearchIndexMaintainer NULL-text discipline)
      val refresh = classified.where(!col("__del") &&
        (!present || !(col("fp") <=> col("fp_prev"))))
      val refreshRows = refresh.select(col("doc_id"), col("__text"))
      val freshIds = refreshRows.select(col("doc_id")).localCheckpoint()
      sets = sets.join(gone, Seq("doc_id"), "left_anti")
        .unionByName(Dedup.ppSets(refreshRows, "doc_id", "__text", shingleN))
        .localCheckpoint()
      val survivors = livePairs
        .join(gone.withColumnRenamed("doc_id", "id_a"), Seq("id_a"),
          "left_anti")
        .join(gone.withColumnRenamed("doc_id", "id_b"), Seq("id_b"),
          "left_anti")
        .select(col("id_a"), col("id_b"), col("jaccard"))
      livePairs = survivors
        .unionByName(Dedup.ppJoinFrom(sets, threshold, Some(freshIds))
          .select(col("id_a"), col("id_b"), col("jaccard")))
        .localCheckpoint()
      fps = fps.join(b.select("doc_id"), Seq("doc_id"), "left_anti")
        .unionByName(b.where(!col("__del")).select(col("doc_id"), col("fp")))
        .localCheckpoint()
    }

    /** Start the maintenance stream: one [[applyBatch]] per micro-batch. */
    def attach(upserts: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      upserts.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the COMPLETE maintenance state (fingerprints, live
      * shingle sets, pair set) for [[SimilarityMaintainer.restore]] —
      * the original corpus text is NOT needed to resume. */
    def checkpoint(dir: String): Unit = synchronized {
      fps.write.mode("overwrite").parquet(s"$dir/fps")
      sets.write.mode("overwrite").parquet(s"$dir/sets")
      livePairs.write.mode("overwrite").parquet(s"$dir/pairs")
    }
  }

  object SimilarityMaintainer {
    /** Resume a [[SimilarityMaintainer.checkpoint]]. Configuration
      * (idCol/textCol/threshold/shingleN/deleteCol) is not state — pass
      * the SAME values the original maintainer ran with (the
      * [[SearchIndexMaintainer.restore]] contract). */
    def restore(spark: SparkSession, dir: String, threshold: Double,
                idCol: String = "doc_id", textCol: String = "text",
                shingleN: Int = 3,
                deleteCol: Option[String] = None): SimilarityMaintainer = {
      val fps = spark.read.parquet(s"$dir/fps")
      val emptyDocs = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            fps.schema("doc_id").dataType),
          org.apache.spark.sql.types.StructField(textCol,
            org.apache.spark.sql.types.StringType))))
      val m = new SimilarityMaintainer(emptyDocs, idCol, textCol, threshold,
        shingleN, deleteCol)
      m.fps = fps.localCheckpoint()
      m.sets = spark.read.parquet(s"$dir/sets").localCheckpoint()
      m.livePairs = spark.read.parquet(s"$dir/pairs").localCheckpoint()
      m
    }
  }

  /** Continuous association-rule maintenance — the streamed twin of
    * the q208/q214 pair, keeping a live co-purchase / co-occurrence
    * monitor over an APPEND-ONLY basket stream (the
    * [[SimilarityMaintainer]] pattern applied to market-basket state).
    *
    * Sound for exactly the reason [[graft.operators.Assoc.pairRulesDelta]]
    * (q214) proves: every statistic is ADDITIVE over disjoint basket
    * sets — item supports, pair supports and the basket total all just
    * sum — so folding each micro-batch into the persisted UNFILTERED
    * supports equals the full rebuild over the accumulated corpus.
    *
    * Driver-held state (references to checkpointed frames):
    *   - `items`  — (item, support), UNFILTERED;
    *   - `pairSupports` — (item_a, item_b, support_ab), UNFILTERED
    *     (filtered state would freeze out pairs that cross the
    *     threshold only with a later batch's help — the q214
    *     persistence contract);
    *   - `seen`   — the basket-id set (one id per basket — the
    *     fingerprint-not-payload discipline: no item rows retained),
    *     which upgrades pairRulesDelta's DOCUMENTED append-only caller
    *     contract into a CHECKED one: a batch re-sending a seen basket
    *     id fails loudly instead of double-counting its supports.
    *
    * Per batch: one CHECKED per-basket fan-out bound (the
    * [[graft.operators.Contracts]] discipline), one anti-join
    * append-only check, three additive folds — O(delta × basket²),
    * never a corpus re-scan. `rules(minSupport)` serves the exact
    * [[graft.operators.Assoc.pairRules]] readout from state at any
    * moment; StreamingSpec pins streamed == batch rebuild across
    * batches and checkpoint/restore. */
  final class AssocMaintainer(initialBaskets: DataFrame, basketCol: String,
                              itemCol: String,
                              maxItemsPerBasket: Long = 100000L) {
    import graft.operators.{Assoc, Contracts}
    private var items: DataFrame =
      Assoc.itemSupports(initialBaskets, basketCol, itemCol)
        .localCheckpoint()
    private var pairSup: DataFrame =
      Assoc.pairSupports(initialBaskets, basketCol, itemCol)
        .localCheckpoint()
    private var seen: DataFrame = initialBaskets
      .select(col(basketCol).as("__b")).where(col("__b").isNotNull)
      .distinct().localCheckpoint()
    private var nBaskets: Long = seen.count()

    /** Exact [[graft.operators.Assoc.pairRules]] over every basket
      * folded so far, served from state — no basket rows touched. */
    def rules(minSupport: Long): DataFrame = synchronized {
      Assoc.rulesFromSupports(items, pairSup, nBaskets, minSupport)
    }

    /** Fold one micro-batch of NEW baskets (append-only — re-sent
      * basket ids are rejected, see class doc). */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val d = batch.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
        .where(col("__i").isNotNull && col("__b").isNotNull)
        .distinct().localCheckpoint()
      Contracts.boundedPerKey(d, "__b", maxItemsPerBasket,
        "AssocMaintainer", "distinct items",
        "Split or cap pathological baskets before mining — the pair " +
          "join is C(n,2) per basket.",
        contract = "per-basket pair fan-out")
      val batchBaskets = d.select(col("__b")).distinct().localCheckpoint()
      val dup = batchBaskets.join(seen, Seq("__b"), "left_semi")
        .limit(1).count()
      require(dup == 0L,
        "AssocMaintainer: a batch re-sent an already-folded basket id " +
          "— supports are additive over DISJOINT basket sets only " +
          "(the q214 contract); route updated baskets through a rebuild")
      items = items.toDF("__i", "__s")
        .unionByName(d.groupBy(col("__i")).agg(count(lit(1)).as("__s")))
        .groupBy(col("__i")).agg(sum(col("__s")).as("__s"))
        .localCheckpoint()
      pairSup = pairSup.toDF("item_a", "item_b", "support_ab")
        .unionByName(Assoc.pairSupports(
          d.select(col("__b").as(basketCol), col("__i").as(itemCol)),
          basketCol, itemCol))
        .groupBy(col("item_a"), col("item_b"))
        .agg(sum(col("support_ab")).as("support_ab"))
        .localCheckpoint()
      nBaskets += batchBaskets.count()
      seen = seen.unionByName(batchBaskets).localCheckpoint()
    }

    /** Start the maintenance stream: one [[applyBatch]] per micro-batch. */
    def attach(baskets: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      baskets.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the COMPLETE maintenance state (supports + basket-id
      * set + total) for [[AssocMaintainer.restore]]. */
    def checkpoint(dir: String): Unit = synchronized {
      items.write.mode("overwrite").parquet(s"$dir/items")
      pairSup.write.mode("overwrite").parquet(s"$dir/pairs")
      seen.write.mode("overwrite").parquet(s"$dir/seen")
      val sp = items.sparkSession
      import sp.implicits._
      Seq(nBaskets).toDF("n_baskets")
        .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
  }

  object AssocMaintainer {
    /** Resume an [[AssocMaintainer.checkpoint]]. Configuration
      * (basketCol/itemCol/maxItemsPerBasket) is not state — pass the
      * SAME values the original maintainer ran with (the
      * [[SimilarityMaintainer.restore]] contract). */
    def restore(spark: SparkSession, dir: String, basketCol: String,
                itemCol: String,
                maxItemsPerBasket: Long = 100000L): AssocMaintainer = {
      val seen = spark.read.parquet(s"$dir/seen")
      val emptyBaskets = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          org.apache.spark.sql.types.StructField(basketCol,
            seen.schema("__b").dataType),
          org.apache.spark.sql.types.StructField(itemCol,
            org.apache.spark.sql.types.StringType))))
      val m = new AssocMaintainer(emptyBaskets, basketCol, itemCol,
        maxItemsPerBasket)
      m.items = spark.read.parquet(s"$dir/items").localCheckpoint()
      m.pairSup = spark.read.parquet(s"$dir/pairs").localCheckpoint()
      m.seen = seen.localCheckpoint()
      m.nBaskets = spark.read.parquet(s"$dir/meta")
        .collect().head.getLong(0)
      m
    }
  }

  /** Streaming PSI drift monitor — the live twin of
    * [[graft.operators.Stats.psiByKey]] (q244): the baseline
    * categorical histogram is fixed at construction; each micro-batch
    * folds its rows into the live histogram (counts are additive over
    * disjoint row sets, so streamed == batch is STRUCTURAL); [[psi]]
    * serves the batch operator's exact readout from state via the
    * shared [[graft.operators.Stats.psiFromHists]] code path. State:
    * two bounded per-(key, category) histograms — never rows; a
    * year-long stream holds exactly as much as a day-long one with the
    * same category vocabulary. NULL categories fail loudly before
    * touching state (the batch contract). [[checkpoint]]/[[restore]]
    * persist the COMPLETE state without the corpus. */
  final class PsiMaintainer(baseline: DataFrame, keyCol: String,
                            catCol: String,
                            maxDistinctPerKey: Long = 2000000L) {
    import graft.operators.Stats
    private var base: DataFrame =
      Stats.catHist(baseline, keyCol, catCol, "__c", "PsiMaintainer")
    private var live: DataFrame = base.limit(0).localCheckpoint()

    /** Exact [[graft.operators.Stats.psiByKey]] of (baseline, every
      * row folded so far), served from state. */
    def psi(): DataFrame = synchronized {
      Stats.psiFromHists(base, live, keyCol, maxDistinctPerKey)
    }

    /** Fold one micro-batch of current-side rows. */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val h = Stats.catHist(batch, keyCol, catCol, "__c", "PsiMaintainer")
      live = live.unionByName(h)
        .groupBy(col(keyCol), col("__cat"))
        .agg(sum(col("__c")).as("__c"))
        .localCheckpoint()
    }

    /** Start the maintenance stream: one [[applyBatch]] per micro-batch. */
    def attach(rows: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      rows.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the COMPLETE monitor state (both histograms) for
      * [[PsiMaintainer.restore]]. */
    def checkpoint(dir: String): Unit = synchronized {
      base.write.mode("overwrite").parquet(s"$dir/base")
      live.write.mode("overwrite").parquet(s"$dir/live")
    }
  }

  /** Live ε-DP noisy-count release — the streaming twin of
    * [[graft.operators.Stats.noisyCounts]] (q267): micro-batches fold
    * into the per-key count table (counts additive over disjoint row
    * sets → streamed == batch is STRUCTURAL), and [[release]] serves
    * the batch operator's own `noisyCountsFromHist` tail. The noise is
    * a pure function of the key, so the live dashboard re-releases the
    * SAME noise draw as counts grow — no per-refresh privacy spend
    * (the seeded-DP budget argument; changing ε is a NEW release).
    * State: one count per key, never rows. NULL keys fail loudly per
    * batch before touching state. */
  final class NoisyCountsMaintainer(initial: DataFrame,
                                    keyCols: Seq[String],
                                    epsilonMicro: Long) {
    import graft.operators.Stats
    private var hist: DataFrame = Stats.countHist(initial, keyCols,
      "NoisyCountsMaintainer")

    /** Exact [[graft.operators.Stats.noisyCounts]] of every row folded
      * so far, served from state. */
    def release(): DataFrame = synchronized {
      Stats.noisyCountsFromHist(hist, keyCols, epsilonMicro)
    }

    /** Fold one micro-batch of rows. */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val h = Stats.countHist(batch, keyCols, "NoisyCountsMaintainer")
      hist = hist.unionByName(h)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col("n")).as("n"))
        .localCheckpoint()
    }

    /** Start the maintenance stream: one [[applyBatch]] per micro-batch. */
    def attach(rows: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      rows.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the count state for [[NoisyCountsMaintainer.restore]]. */
    def checkpoint(dir: String): Unit = synchronized {
      hist.write.mode("overwrite").parquet(dir)
    }
  }

  object NoisyCountsMaintainer {
    /** Resume a [[NoisyCountsMaintainer.checkpoint]]. Configuration is
      * not state — pass the SAME keyCols/epsilonMicro the original
      * monitor ran with (the [[PsiMaintainer.restore]] contract). */
    def restore(spark: SparkSession, dir: String, keyCols: Seq[String],
                epsilonMicro: Long): NoisyCountsMaintainer = {
      val hist = spark.read.parquet(dir)
      val m = new NoisyCountsMaintainer(hist.limit(0).drop("n"), keyCols,
        epsilonMicro)
      m.hist = hist.localCheckpoint()
      m
    }
  }

  /** Live precision–recall curve monitor — the streaming twin of
    * [[graft.operators.Stats.prCurve]] (q269), the [[PsiMaintainer]]
    * pattern over the per-(key, score) (np, nw) histogram: each
    * micro-batch of scored+labeled rows folds into the bounded
    * histogram state (counts additive over disjoint row sets →
    * streamed == batch is STRUCTURAL: [[curve]] serves the batch
    * operator's own `prCurveFromHist` tail), so the live "where does
    * today's threshold sit" readout never rescans scored history.
    * State: one histogram bounded by key × score cardinality, never
    * rows. NULL score/label rows fail loudly per batch (the same
    * validated-hist path as batch). */
  final class PrCurveMaintainer(initial: DataFrame, keyCol: String,
                                scoreCol: String, labelCol: String,
                                maxDistinctPerKey: Long = 2000000L) {
    import graft.operators.Stats
    private var hist: DataFrame = Stats.prHist(initial, keyCol, scoreCol,
      labelCol, "PrCurveMaintainer")

    /** Exact [[graft.operators.Stats.prCurve]] of every row folded so
      * far, served from state. */
    def curve(): DataFrame = synchronized {
      Stats.prCurveFromHist(hist, keyCol, maxDistinctPerKey)
    }

    /** Fold one micro-batch of scored rows. */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val h = Stats.prHist(batch, keyCol, scoreCol, labelCol,
        "PrCurveMaintainer")
      hist = hist.unionByName(h)
        .groupBy(col(keyCol), col("__s"))
        .agg(sum(col("np")).as("np"), sum(col("nw")).as("nw"))
        .localCheckpoint()
    }

    /** Start the maintenance stream: one [[applyBatch]] per micro-batch. */
    def attach(rows: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      rows.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the histogram state for [[PrCurveMaintainer.restore]]. */
    def checkpoint(dir: String): Unit = synchronized {
      hist.write.mode("overwrite").parquet(dir)
    }
  }

  object PrCurveMaintainer {
    /** Resume a [[PrCurveMaintainer.checkpoint]]. Configuration is not
      * state — pass the SAME column/bound values the original monitor
      * ran with (the [[PsiMaintainer.restore]] contract). */
    def restore(spark: SparkSession, dir: String, keyCol: String,
                scoreCol: String, labelCol: String,
                maxDistinctPerKey: Long = 2000000L): PrCurveMaintainer = {
      val hist = spark.read.parquet(dir)
      val empty = hist.limit(0)
        .select(col(keyCol), col("__s").as(scoreCol),
          lit(true).as(labelCol))
      val m = new PrCurveMaintainer(empty, keyCol, scoreCol, labelCol,
        maxDistinctPerKey)
      m.hist = hist.localCheckpoint()
      m
    }
  }

  /** Live cross-document sentence-dedup maintainer — the streaming
    * twin of q309's `dedupLines ∘ uax29_sentences` chain (dedup
    * against HISTORY is the production shape: new crawls arrive and
    * must dedup against everything already ingested, not just their
    * own batch): state is one row per DISTINCT sentence hash holding
    * its keeper — the MIN (doc_id, pos) owner and the line — and min
    * is additive over disjoint batches, so streamed == batch is
    * STRUCTURAL. [[audit]] serves the surviving-sentence view per
    * keeper doc (docs whose every sentence lost to history simply
    * have no row — the batch operator's 0-kept rows). State bounded
    * by distinct-sentence count, CHECKED against `maxDistinct` at
    * serve time. */
  final class SentenceDedupMaintainer(initial: DataFrame, idCol: String,
                                      sentsCol: String,
                                      maxDistinct: Long = 10000000L) {
    private def hist(df: DataFrame): DataFrame = df
      .select(col(idCol).as("doc_id"),
        posexplode(col(sentsCol)).as(Seq("pos", "line")))
      .groupBy(md5_long(col("line")).as("__h"))
      .agg(min(struct(col("doc_id"), col("pos").cast("long").as("pos"),
        col("line"))).as("first"))

    private var state: DataFrame = hist(initial).localCheckpoint()

    /** The surviving sentences per keeper doc, served from state:
      * (doc_id, n_kept, dedup_text) — exactly the batch operator's
      * rows for docs that kept at least one sentence. */
    def audit(): DataFrame = synchronized {
      graft.operators.Contracts.enforce(state,
        graft.operators.Contracts.Bound(count(lit(1)),
          _ <= maxDistinct, n =>
            s"SentenceDedupMaintainer: $n distinct sentences exceed " +
              s"the state contract ($maxDistinct) — shard the corpus " +
              "or raise the bound"))
      state
        .groupBy(col("first.doc_id").as("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(array_sort(collect_list(
            struct(col("first.pos").as("pos"),
              col("first.line").as("line")))),
            x => x.getField("line")), "\n").as("dedup_text"))
    }

    /** Fold one micro-batch of (id, sentences) rows. */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      state = state.unionByName(hist(batch))
        .groupBy(col("__h")).agg(min(col("first")).as("first"))
        .localCheckpoint()
    }

    /** Start the maintenance stream: one [[applyBatch]] per micro-batch. */
    def attach(rows: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      rows.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the keeper state for
      * [[SentenceDedupMaintainer.restore]]. */
    def checkpoint(dir: String): Unit = synchronized {
      state.write.mode("overwrite").parquet(dir)
    }
  }

  object SentenceDedupMaintainer {
    /** Resume a [[SentenceDedupMaintainer.checkpoint]]. Configuration
      * is not state — pass the SAME columns/bounds the original
      * monitor ran with (the [[PsiMaintainer.restore]] contract). */
    def restore(spark: SparkSession, dir: String, idCol: String,
                sentsCol: String,
                maxDistinct: Long = 10000000L): SentenceDedupMaintainer = {
      val st = spark.read.parquet(dir)
      val empty = st.limit(0)
        .select(col("first.doc_id").as(idCol),
          array().cast("array<string>").as(sentsCol))
      val m = new SentenceDedupMaintainer(empty, idCol, sentsCol,
        maxDistinct)
      m.state = st.localCheckpoint()
      m
    }
  }

  /** LIVE IVF-PQ INDEX MAINTENANCE — the streaming twin of
    * [[graft.operators.Similarity.updatePqIndex]] (q100) in the
    * [[SearchIndexMaintainer]] pattern, closing the one maintained
    * artifact that had no live twin (the r14 verdict's #5 gap): the
    * persisted ANN code table stays current over a stream of
    * (id, embedding) upserts and deletes.
    *
    * Driver-held state (references to checkpointed frames — the
    * fingerprint-not-payload discipline: no raw vector is retained):
    *   - `fps`   — (vec_id, fp) via [[graft.operators.Snapshot
    *     .vecFingerprint]], two longs per vector, classifies each
    *     batch into added/changed/unchanged/removed;
    *   - `codes` — (vec_id, cell, codes), the maintained IVF-PQ code
    *     table itself (~dim/M smaller than the vectors).
    * The coarse centroids and PQ codebooks are FIXED at construction
    * (trained once from the initial corpus — a delta never retrains,
    * the updatePqIndex contract), so per batch the maintainer
    * re-encodes ONLY added/changed vectors against the frozen
    * quantizers and anti-joins out removed/changed rows: O(|delta|)
    * encodes per batch, never a corpus re-encode, and deterministic
    * encoding makes the maintained table EXACTLY the batch re-encode
    * of the surviving corpus (StreamingSpec pins streamed == batch
    * rebuild over scripted + random histories, checkpoint/restore
    * included).
    *
    * Serving: [[index]] wraps the maintained table as a
    * [[graft.operators.Similarity.PqIndex]], so ivfPqTopK / flat ADC
    * run against the live index with no conversion. */
  final class PqIndexMaintainer(initialCorpus: DataFrame, idCol: String,
                                vecCol: String, m: Int = 4, ks: Int = 8,
                                nCells: Int = 8,
                                deleteCol: Option[String] = None,
                                centroidsOverride: Array[Array[Double]] = null,
                                codebooksOverride: Seq[Seq[Seq[Double]]] = null) {
    import graft.operators.{Similarity, Snapshot}
    private val init = initialCorpus.select(col(idCol).as("vec_id"),
      col(vecCol).as("embedding"))
    private val centroids: Array[Array[Double]] =
      if (centroidsOverride != null) centroidsOverride
      else Similarity.seedCentroids(init, nCells)
    private val codebooks: Seq[Seq[Seq[Double]]] =
      if (codebooksOverride != null) codebooksOverride
      else Similarity.pqCodebooks(init, m, ks)
    private def encode(rows: DataFrame): DataFrame = rows.select(
      col("vec_id"),
      graft.functions.ivf_assign(col("embedding"), centroids).as("cell"),
      graft.functions.pq_encode(col("embedding"), codebooks).as("codes"))
    private var fps: DataFrame = init.select(col("vec_id"),
      Snapshot.vecFingerprint(col("embedding")).as("fp")).localCheckpoint()
    private var codes: DataFrame = encode(init).localCheckpoint()

    /** The live index, served with zero conversion work. */
    def index: Similarity.PqIndex = synchronized {
      Similarity.PqIndex(codes, centroids, codebooks)
    }

    /** IVFADC top-k over the live index. */
    def topK(queries: DataFrame, k: Int, nProbe: Int = 2): DataFrame =
      synchronized { Similarity.ivfPqTopK(index, queries, k, nProbe) }

    /** Apply one micro-batch of upserts/deletes (ids unique within a
      * batch). Unchanged re-sends (same fingerprint) are no-ops. */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val isDel = deleteCol.filter(batch.columns.contains)
        .map(c => coalesce(col(c).cast("boolean"), lit(false)))
        .getOrElse(lit(false))
      val b = batch.select(col(idCol).as("vec_id"),
          col(vecCol).as("embedding"),
          Snapshot.vecFingerprint(col(vecCol)).as("fp"), isDel.as("__del"))
        .localCheckpoint()
      val classified = b.join(
        fps.select(col("vec_id"), col("fp").as("fp_prev"),
          lit(true).as("in_prev")),
        Seq("vec_id"), "left_outer")
      val present = coalesce(col("in_prev"), lit(false))
      val refresh = classified.where(!col("__del") &&
          (!present || !(col("fp") <=> col("fp_prev"))))
        .select(col("vec_id"), col("embedding"))
      val retire = classified
        .where(present && (col("__del") || !(col("fp") <=> col("fp_prev"))))
        .select(col("vec_id"))
      codes = codes.join(retire, Seq("vec_id"), "left_anti")
        .unionByName(encode(refresh))
        .localCheckpoint()
      fps = fps.join(b.select("vec_id"), Seq("vec_id"), "left_anti")
        .unionByName(b.where(!col("__del")).select(col("vec_id"), col("fp")))
        .localCheckpoint()
    }

    /** Start the maintenance stream: one [[applyBatch]] per
      * micro-batch. */
    def attach(upserts: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      upserts.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the complete maintenance state in the
      * [[graft.operators.Similarity.loadPqIndex]] layout (codes /
      * centroids / codebooks) plus the fingerprint table, so a
      * restarted driver resumes via [[PqIndexMaintainer.restore]]
      * without the original vectors. */
    def checkpoint(dir: String): Unit = synchronized {
      val spark = codes.sparkSession
      import spark.implicits._
      // commit-marker protocol: the four table writes are NOT atomic
      // as a group, so the marker is deleted FIRST and re-created
      // LAST — a crash anywhere in between leaves a checkpoint that
      // restore() refuses loudly instead of silently loading a mixed
      // generation of fps/codes/centroids/codebooks
      val marker = new org.apache.hadoop.fs.Path(s"$dir/_graft_commit")
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(marker, false)
      fps.write.mode("overwrite").parquet(s"$dir/fps")
      codes.write.mode("overwrite").parquet(s"$dir/codes")
      centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
        .toDF("cell", "centroid")
        .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids")
      codebooks.zipWithIndex.flatMap { case (codebook, sub) =>
        codebook.zipWithIndex.map { case (cv, j) => (sub, j, cv) } }
        .toDF("sub", "code", "cv")
        .repartition(1).write.mode("overwrite").parquet(s"$dir/codebooks")
      val out = fs.create(marker, true)
      out.writeBytes("graft-pq-checkpoint v1\n")
      out.close()
    }
  }

  object PqIndexMaintainer {
    /** Resume a [[PqIndexMaintainer.checkpoint]]: quantizers and code
      * table load through the first-class
      * [[graft.operators.Similarity.loadPqIndex]] reader;
      * configuration is not state — pass the SAME columns the
      * original maintainer ran with. */
    def restore(spark: SparkSession, dir: String, idCol: String,
                vecCol: String,
                deleteCol: Option[String] = None): PqIndexMaintainer = {
      val marker = new org.apache.hadoop.fs.Path(s"$dir/_graft_commit")
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker))
        throw new IllegalStateException(
          s"PqIndexMaintainer.restore: no commit marker at $marker — " +
            "the checkpoint is absent or a crash interrupted " +
            "checkpoint(); the four state tables may be mixed " +
            "generations. Re-checkpoint from a live maintainer.")
      val idx = graft.operators.Similarity.loadPqIndex(spark, dir)
      val empty = idx.codes.limit(0)
        .select(col("vec_id").as(idCol),
          array().cast("array<float>").as(vecCol))
      val mm = new PqIndexMaintainer(empty, idCol, vecCol,
        m = idx.codebooks.length, ks = idx.codebooks.head.length,
        nCells = idx.centroids.length, deleteCol = deleteCol,
        centroidsOverride = idx.centroids,
        codebooksOverride = idx.codebooks)
      mm.fps = spark.read.parquet(s"$dir/fps").localCheckpoint()
      mm.codes = idx.codes.localCheckpoint()
      mm
    }
  }

  /** Live group-fairness monitor — the streaming twin of
    * [[graft.operators.Stats.fairnessAudit]] (q280), the
    * [[PrCurveMaintainer]] pattern over the per-group confusion
    * table: each micro-batch of labeled+predicted rows folds into the
    * five additive counts per group (counts additive over disjoint
    * row sets → streamed == batch is STRUCTURAL: [[audit]] serves the
    * batch operator's own `fairnessFromConf` tail), so the live "is
    * the classifier drifting against a group" readout never rescans
    * labeled history. State: one row per group — bounded by group
    * cardinality, never rows. NULL / non-binary labels fail loudly
    * per batch (the same validated path as batch). */
  final class FairnessMaintainer(initial: DataFrame, groupCol: String,
                                 labelCol: String, predCol: String) {
    import graft.operators.Stats
    private var conf: DataFrame = Stats.confusionHist(initial, groupCol,
      labelCol, predCol, "FairnessMaintainer")

    /** Exact [[graft.operators.Stats.fairnessAudit]] of every row
      * folded so far, served from state. The cumulative micro-rate
      * contract is RE-CHECKED here: per-batch validation bounds each
      * fold, but the folded totals grow across batches, so serving
      * without this re-check could silently run the micro-rate math
      * past its exact-int64 bound (the [[MutualInfoMaintainer]]
      * serve-time-revalidation discipline). */
    def audit(): DataFrame = synchronized {
      graft.operators.Contracts.enforce(conf,
        graft.operators.Contracts.Bound(sum(col("n")),
          _ <= 1000000000000L, n =>
            s"FairnessMaintainer: $n cumulative rows exceed the " +
              "micro-rate int64 contract (1e12 rows across all " +
              "folded batches)"))
      Stats.fairnessFromConf(conf, groupCol)
    }

    /** Fold one micro-batch of labeled rows. */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val h = Stats.confusionHist(batch, groupCol, labelCol, predCol,
        "FairnessMaintainer")
      conf = conf.unionByName(h)
        .groupBy(col(groupCol))
        .agg(sum(col("n")).as("n"), sum(col("tp")).as("tp"),
          sum(col("fp")).as("fp"), sum(col("fn")).as("fn"),
          sum(col("tn")).as("tn"))
        .localCheckpoint()
    }

    /** Start the maintenance stream: one [[applyBatch]] per micro-batch. */
    def attach(rows: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      rows.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the confusion state for [[FairnessMaintainer.restore]]. */
    def checkpoint(dir: String): Unit = synchronized {
      conf.write.mode("overwrite").parquet(dir)
    }
  }

  object FairnessMaintainer {
    /** Resume a [[FairnessMaintainer.checkpoint]]. Configuration is
      * not state — pass the SAME column names the original monitor
      * ran with (the [[PsiMaintainer.restore]] contract). */
    def restore(spark: SparkSession, dir: String, groupCol: String,
                labelCol: String, predCol: String): FairnessMaintainer = {
      val conf = spark.read.parquet(dir)
      val empty = conf.limit(0)
        .select(col(groupCol), lit(0L).as(labelCol), lit(0L).as(predCol))
      val m = new FairnessMaintainer(empty, groupCol, labelCol, predCol)
      m.conf = conf.localCheckpoint()
      m
    }
  }

  /** Live Wald-SPRT experiment monitor — the streaming twin of
    * [[graft.operators.Stats.sprtBernoulli]] (q290): the whole point
    * of a SEQUENTIAL test is to be read while data arrives, so each
    * micro-batch of Bernoulli outcomes folds into the per-key
    * (n, successes) pair (additive over disjoint row sets → streamed
    * == batch is STRUCTURAL: [[decisions]] serves the batch operator's
    * own `sprtFromCounts` tail) and the live accept/continue readout
    * never rescans outcome history. State: two longs per key. NULL /
    * non-binary outcomes fail loudly per batch. */
  final class SprtMaintainer(initial: DataFrame, keyCol: String,
                             successCol: String, p0: (Long, Long),
                             p1: (Long, Long),
                             alpha: (Long, Long) = (5L, 100L),
                             beta: (Long, Long) = (5L, 100L)) {
    import graft.operators.Stats
    private var counts: DataFrame = Stats.sprtCounts(initial, keyCol,
      successCol, "SprtMaintainer")

    /** Exact [[graft.operators.Stats.sprtBernoulli]] of every outcome
      * folded so far, served from state. The cumulative per-key n
      * contract is RE-CHECKED here: per-batch validation bounds each
      * fold, but folded counts grow across batches, so serving
      * without this re-check could silently cast an over-bound LLR
      * decimal to long (the [[MutualInfoMaintainer]]
      * serve-time-revalidation discipline). */
    def decisions(): DataFrame = synchronized {
      graft.operators.Contracts.enforce(counts,
        graft.operators.Contracts.Bound(max(col("n")),
          _ <= 2000000000L, n =>
            s"SprtMaintainer: a key holds $n cumulative outcomes, " +
              "exceeding the exact micro-nat LLR contract (n <= 2e9 " +
              "per key across all folded batches)"))
      Stats.sprtFromCounts(counts, keyCol, p0, p1, alpha, beta)
    }

    /** Fold one micro-batch of outcomes. */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val h = Stats.sprtCounts(batch, keyCol, successCol,
        "SprtMaintainer")
      counts = counts.unionByName(h)
        .groupBy(col(keyCol))
        .agg(sum(col("n")).as("n"),
          sum(col("successes")).as("successes"))
        .localCheckpoint()
    }

    /** Start the maintenance stream: one [[applyBatch]] per micro-batch. */
    def attach(rows: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      rows.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the count state for [[SprtMaintainer.restore]]. */
    def checkpoint(dir: String): Unit = synchronized {
      counts.write.mode("overwrite").parquet(dir)
    }
  }

  object SprtMaintainer {
    /** Resume a [[SprtMaintainer.checkpoint]]. Configuration is not
      * state — pass the SAME columns and hypothesis rationals the
      * original monitor ran with (the [[PsiMaintainer.restore]]
      * contract). */
    def restore(spark: SparkSession, dir: String, keyCol: String,
                successCol: String, p0: (Long, Long), p1: (Long, Long),
                alpha: (Long, Long) = (5L, 100L),
                beta: (Long, Long) = (5L, 100L)): SprtMaintainer = {
      val counts = spark.read.parquet(dir)
      val empty = counts.limit(0)
        .select(col(keyCol), lit(0L).as(successCol))
      val m = new SprtMaintainer(empty, keyCol, successCol, p0, p1,
        alpha, beta)
      m.counts = counts.localCheckpoint()
      m
    }
  }

  /** Live mutual-information / leakage monitor — the streaming twin
    * of [[graft.operators.Stats.mutualInfoByKey]] (q281): each
    * micro-batch of categorical (key, x, y) rows folds into the
    * bounded per-(key, x, y) cell table (counts additive over
    * disjoint row sets → streamed == batch is STRUCTURAL: [[mi]]
    * serves the batch operator's own `miFromCells` tail), so the live
    * "is this metadata field leaking the label" readout never rescans
    * history. State bounded by key × x × y cardinality. NULL
    * categories fail loudly per batch. */
  final class MutualInfoMaintainer(initial: DataFrame, keyCol: String,
                                   xCol: String, yCol: String,
                                   maxDistinctPerKey: Long = 2000000L) {
    import graft.operators.Stats
    private var cells: DataFrame = Stats.miCells(initial, keyCol, xCol,
      yCol, "MutualInfoMaintainer")

    /** Exact [[graft.operators.Stats.mutualInfoByKey]] of every row
      * folded so far, served from state. */
    def mi(): DataFrame = synchronized {
      Stats.miFromCells(cells, keyCol, maxDistinctPerKey)
    }

    /** Fold one micro-batch of categorical rows. */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val h = Stats.miCells(batch, keyCol, xCol, yCol,
        "MutualInfoMaintainer")
      cells = cells.unionByName(h)
        .groupBy(col(keyCol), col("__x"), col("__y"))
        .agg(sum(col("__c")).as("__c"))
        .localCheckpoint()
    }

    /** Start the maintenance stream: one [[applyBatch]] per micro-batch. */
    def attach(rows: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      rows.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the cell state for [[MutualInfoMaintainer.restore]]. */
    def checkpoint(dir: String): Unit = synchronized {
      cells.write.mode("overwrite").parquet(dir)
    }
  }

  object MutualInfoMaintainer {
    /** Resume a [[MutualInfoMaintainer.checkpoint]]. Configuration is
      * not state — pass the SAME columns/bounds the original monitor
      * ran with (the [[PsiMaintainer.restore]] contract). */
    def restore(spark: SparkSession, dir: String, keyCol: String,
                xCol: String, yCol: String,
                maxDistinctPerKey: Long = 2000000L)
      : MutualInfoMaintainer = {
      val cells = spark.read.parquet(dir)
      val empty = cells.limit(0)
        .select(col(keyCol), col("__x").as(xCol), col("__y").as(yCol))
      val m = new MutualInfoMaintainer(empty, keyCol, xCol, yCol,
        maxDistinctPerKey)
      m.cells = cells.localCheckpoint()
      m
    }
  }

  object PsiMaintainer {
    /** Resume a [[PsiMaintainer.checkpoint]]. Configuration
      * (keyCol/catCol/maxDistinctPerKey) is not state — pass the SAME
      * values the original monitor ran with (the
      * [[SimilarityMaintainer.restore]] contract). */
    def restore(spark: SparkSession, dir: String, keyCol: String,
                catCol: String,
                maxDistinctPerKey: Long = 2000000L): PsiMaintainer = {
      val base = spark.read.parquet(s"$dir/base")
      val emptyBaseline = base.limit(0)
        .select(col(keyCol), col("__cat").as(catCol))
      val m = new PsiMaintainer(emptyBaseline, keyCol, catCol,
        maxDistinctPerKey)
      m.base = base.localCheckpoint()
      m.live = spark.read.parquet(s"$dir/live").localCheckpoint()
      m
    }
  }

  /** Continuous VIDEO near-dup edge maintenance — the streamed twin of
    * the q158/q163 video family, keeping the order-consistent voted
    * clip-pair edge set LIVE over a stream of clip upserts and deletes
    * (the [[SimilarityMaintainer]] pattern applied to the multimodal
    * stack).
    *
    * Driver-held state (references to checkpointed frames — the frame
    * CORPUS is never retained, the fingerprint-not-payload discipline):
    *   - `fps`     — [[graft.operators.Dedup.clipFingerprints]] of the
    *     live corpus (two longs per clip) for batch classification;
    *   - `kfBytes` — [[graft.operators.Dedup.clipKeyframeBytes]]: the
    *     per-keyframe dHash byte table (~8 longs per shot) — everything
    *     the banded-Hamming + LIS-vote math needs;
    *   - `edges`   — the maintained (clip_a, clip_b, n_votes) answer.
    *
    * Per batch, the q163 invariant applied literally:
    *   edges' = edges − {e : e touches a changed/deleted clip}
    *            ∪ videoEdgesFromBytes(kfBytes', fresh = added ∪ changed)
    * which equals videoNearDupEdges(surviving corpus): an edge's votes
    * depend ONLY on its two clips' keyframes (verified locality —
    * `Dedup.scala` edge derivation), so untouched pairs cannot move.
    * O(|fresh keyframes| × band bucket) per batch, never a corpus
    * re-fingerprint; StreamingSpec pins streamed == batch rebuild over
    * upserts + deletes + checkpoint/restore.
    *
    * Batch shape: ONE ROW PER CLIP upsert —
    * (idCol, seriesCol, framesCol: array<struct<frameIdxCol,
    * matrixCol>>, [deleteCol]) — a clip arrives whole (its per-frame
    * feature series plus its frame matrices), ids unique per batch. */
  final class VideoDedupMaintainer(initialClips: DataFrame,
                                   initialFrames: DataFrame, idCol: String,
                                   seriesCol: String, frameIdxCol: String,
                                   matrixCol: String, cutThreshold: Double,
                                   maxHamming: Int = 6, minVotes: Int = 2,
                                   bandBytes: Int = 2,
                                   framesCol: String = "frames",
                                   deleteCol: Option[String] = None) {
    import graft.operators.Dedup
    private var fps: DataFrame = Dedup.clipFingerprints(initialClips,
      initialFrames, idCol, seriesCol, frameIdxCol, matrixCol)
      .localCheckpoint()
    private var kfBytes: DataFrame = Dedup.clipKeyframeBytes(initialClips,
      initialFrames, idCol, seriesCol, frameIdxCol, matrixCol, cutThreshold)
      .localCheckpoint()
    private var liveEdges: DataFrame = Dedup.videoEdgesFromBytes(kfBytes,
      maxHamming, minVotes, bandBytes, None).localCheckpoint()

    /** The maintained voted edge set (clip_a, clip_b, n_votes). */
    def edges: DataFrame = synchronized(liveEdges)

    /** Apply one micro-batch of clip upserts/deletes (ids unique within
      * a batch) — classification discipline identical to
      * [[SimilarityMaintainer.applyBatch]]. */
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val isDel = deleteCol.filter(batch.columns.contains)
        .map(c => coalesce(col(c).cast("boolean"), lit(false)))
        .getOrElse(lit(false))
      val b = batch.select(col(idCol), col(seriesCol), col(framesCol),
        isDel.as("__del")).localCheckpoint()
      val bClips = b.select(col(idCol), col(seriesCol))
      val bFrames = b.select(col(idCol), explode(col(framesCol)).as("__fr"))
        .select(col(idCol), col(s"__fr.$frameIdxCol").as(frameIdxCol),
          col(s"__fr.$matrixCol").as(matrixCol))
      // batch fingerprints via the SAME derivation the batch operator
      // classifies with — streamed and rebuilt classification can never
      // disagree
      val bfp = Dedup.clipFingerprints(bClips, bFrames, idCol, seriesCol,
          frameIdxCol, matrixCol)
        .join(b.select(col(idCol), col("__del")), Seq(idCol))
        .localCheckpoint()
      val classified = bfp.join(
        fps.select(col(idCol), col("__sfp").as("__psfp"),
          col("__ffp").as("__pffp"), lit(true).as("__inp")),
        Seq(idCol), "left_outer")
      val present = coalesce(col("__inp"), lit(false))
      val changed = !(col("__sfp") <=> col("__psfp")) ||
        !(col("__ffp") <=> col("__pffp"))
      // gone: old state dies (deletes + changed re-sends) — their
      // keyframe bytes leave and every edge touching them re-derives
      // (changed) or dies (deleted)
      val gone = classified.where(present && (col("__del") || changed))
        .select(col(idCol)).localCheckpoint()
      // fresh: new state enters (adds + changed re-sends)
      val fresh = classified.where(!col("__del") && (!present || changed))
        .select(col(idCol)).localCheckpoint()
      kfBytes = kfBytes
        .join(gone.withColumnRenamed(idCol, "clip"), Seq("clip"), "left_anti")
        .unionByName(Dedup.clipKeyframeBytes(
          bClips.join(fresh, Seq(idCol)), bFrames.join(fresh, Seq(idCol)),
          idCol, seriesCol, frameIdxCol, matrixCol, cutThreshold))
        .localCheckpoint()
      val survivors = liveEdges
        .join(gone.withColumnRenamed(idCol, "clip_a"), Seq("clip_a"),
          "left_anti")
        .join(gone.withColumnRenamed(idCol, "clip_b"), Seq("clip_b"),
          "left_anti")
        .select(col("clip_a"), col("clip_b"), col("n_votes"))
      liveEdges = survivors
        .unionByName(Dedup.videoEdgesFromBytes(kfBytes, maxHamming,
          minVotes, bandBytes, Some(fresh)))
        .localCheckpoint()
      fps = fps.join(b.select(idCol), Seq(idCol), "left_anti")
        .unionByName(bfp.where(!col("__del"))
          .select(col(idCol), col("__sfp"), col("__ffp")))
        .localCheckpoint()
    }

    /** Start the maintenance stream: one [[applyBatch]] per micro-batch. */
    def attach(upserts: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      upserts.writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .start()

    /** Persist the COMPLETE maintenance state (clip fingerprints,
      * keyframe byte table, edge set) for
      * [[VideoDedupMaintainer.restore]] — the frame corpus is NOT
      * needed to resume. */
    def checkpoint(dir: String): Unit = synchronized {
      fps.write.mode("overwrite").parquet(s"$dir/fps")
      kfBytes.write.mode("overwrite").parquet(s"$dir/kfbytes")
      liveEdges.write.mode("overwrite").parquet(s"$dir/edges")
    }
  }

  object VideoDedupMaintainer {
    /** Resume a [[VideoDedupMaintainer.checkpoint]]. Configuration
      * (column names, cutThreshold, maxHamming, minVotes, bandBytes,
      * deleteCol) is not state — pass the SAME values the original
      * maintainer ran with (the [[SearchIndexMaintainer.restore]]
      * contract). */
    def restore(spark: SparkSession, dir: String, idCol: String,
                seriesCol: String, frameIdxCol: String, matrixCol: String,
                cutThreshold: Double, maxHamming: Int = 6, minVotes: Int = 2,
                bandBytes: Int = 2, framesCol: String = "frames",
                deleteCol: Option[String] = None): VideoDedupMaintainer = {
      import org.apache.spark.sql.types._
      val fps = spark.read.parquet(s"$dir/fps")
      def empty(schema: StructType) = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val idType = fps.schema(idCol).dataType
      val m = new VideoDedupMaintainer(
        empty(StructType(Seq(StructField(idCol, idType),
          StructField(seriesCol, ArrayType(DoubleType))))),
        empty(StructType(Seq(StructField(idCol, idType),
          StructField(frameIdxCol, LongType),
          StructField(matrixCol, ArrayType(ArrayType(DoubleType)))))),
        idCol, seriesCol, frameIdxCol, matrixCol, cutThreshold, maxHamming,
        minVotes, bandBytes, framesCol, deleteCol)
      m.fps = fps.localCheckpoint()
      m.kfBytes = spark.read.parquet(s"$dir/kfbytes").localCheckpoint()
      m.liveEdges = spark.read.parquet(s"$dir/edges").localCheckpoint()
      m
    }
  }

  object SearchIndexMaintainer {
    /** Resume a [[SearchIndexMaintainer.checkpoint]]: loads the
      * fingerprint table, base index, pending segments and positional
      * twins, and returns a maintainer ready for the next
      * [[SearchIndexMaintainer.applyBatch]]. Serving configuration
      * (idCol/textCol names, nShards, compactEvery, deleteCol,
      * maxDocsPerShard) is not state — pass the SAME values the original
      * maintainer ran with, or future segments will shard differently
      * than compaction expects. `maintainPositions` IS state (the
      * positional artifacts either exist on disk or don't) and comes
      * from the checkpoint meta. */
    def restore(spark: SparkSession, dir: String,
                idCol: String = "doc_id", textCol: String = "text",
                nShards: Int = graft.operators.TextAnalysis.AutoShards,
                compactEvery: Int = 8, deleteCol: Option[String] = None,
                maxDocsPerShard: Int =
                  graft.operators.TextAnalysis.DefaultMaxDocsPerShard): SearchIndexMaintainer = {
      import graft.operators.TextAnalysis
      val meta = spark.read.parquet(s"$dir/meta").head()
      val nPending = meta.getAs[Int]("n_pending")
      val maintainPositions = meta.getAs[Boolean]("maintain_positions")
      val fps = spark.read.parquet(s"$dir/fps")
      // an empty corpus with the checkpoint's id type seeds the
      // constructor cheaply; every state field is then overwritten
      val emptyDocs = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            fps.schema("doc_id").dataType),
          org.apache.spark.sql.types.StructField(textCol,
            org.apache.spark.sql.types.StringType))))
      val m = new SearchIndexMaintainer(emptyDocs, idCol, textCol, nShards,
        compactEvery, deleteCol, maintainPositions, maxDocsPerShard)
      m.fps = fps.localCheckpoint()
      m.base = TextAnalysis.loadSearchIndex(spark, s"$dir/base")
      m.pending = (0 until nPending).toVector.map { i =>
        TextAnalysis.SearchDelta(
          TextAnalysis.loadSearchIndex(spark, f"$dir/seg-$i%03d"),
          spark.read.parquet(f"$dir/seg-$i%03d/tombstones"))
      }
      m.nCompactions = meta.getAs[Long]("n_compactions")
      if (maintainPositions) {
        m.posBase = Some(spark.read.parquet(s"$dir/posbase/postings"))
        m.posPending = (0 until nPending).toVector.map { i =>
          TextAnalysis.PositionalDelta(
            spark.read.parquet(f"$dir/posseg-$i%03d/segment"),
            spark.read.parquet(f"$dir/posseg-$i%03d/tombstones"))
        }
      }
      m
    }
  }

  /** Watermarked stream-stream interval join: each click matched to the
    * same user's views in the `rangeMinutes` before it. Both sides carry
    * watermarks, so the join state Spark keeps per side is bounded by
    * watermark + range and expires as event time advances — the streaming
    * form of the batch binned range join (RangeJoin.binnedRangeJoin).
    * Inputs need (user_id, ts: timestamp, event_id). */
  def clickViewJoin(views: DataFrame, clicks: DataFrame,
                    rangeMinutes: Int = 10,
                    watermark: String = "30 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"),
        col("ts").as("view_ts"), col("event_id").as("view_id"))
      .withWatermark("view_ts", watermark)
    val c = clicks.select(col("user_id").as("c_user"),
        col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    c.join(v, expr(
      s"""c_user = v_user AND
         |view_ts BETWEEN click_ts - INTERVAL $rangeMinutes MINUTES
         |            AND click_ts""".stripMargin))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }
}
