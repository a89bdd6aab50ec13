package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Event-stream operators: gap-based sessionization and watermarked
  * windowed aggregation, in both batch (window functions) and
  * Structured Streaming (stateful) forms.
  *
  * The reference has no streaming surface (batch CLIs only, SURVEY.md
  * §2.7); this is the §7.1-step-10 extension: ingest is append-only, so
  * the same transforms run as `readStream` → `writeStream` unchanged.
  *
  * Scale notes: sessionization shuffles once on user_id (both forms);
  * the batch form's window sort is per-user (bounded); the streaming
  * form holds one small state record per active user, dropped by
  * watermark — the 100 TB-friendly shape for unbounded event logs.
  */
object EventStreams {

  val SessionGapSeconds: Long = 1800L // 30 min

  /** Batch sessionization: session break where the gap from the
    * previous event of the same user exceeds `gapSeconds`; session
    * number = running sum of breaks. Timestamps compared in epoch
    * microseconds (exact integers, engine-portable). */
  def sessionize(events: DataFrame, gapSeconds: Long = SessionGapSeconds): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val us = unix_micros(col("ts"))
    val prev = lag(us, 1).over(w)
    events
      .withColumn("brk",
        when(prev.isNull || us - prev > gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("session_number",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("brk")
  }

  /** Per-session stats (the oracle-checked rollup). */
  def sessionStats(events: DataFrame, gapSeconds: Long = SessionGapSeconds): DataFrame =
    sessionize(events, gapSeconds)
      .groupBy("user_id", "session_number")
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))

  // -------------------------------------------------------------
  // Structured Streaming forms
  // -------------------------------------------------------------

  /** Hourly tumbling-window counts as a stream with a 1-hour
    * watermark. Identical semantics to the batch date_trunc rollup
    * once all data is processed. */
  def streamingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
      .select(col("window.start").as("h"), col("event_type"), col("cnt"), col("sv"))

  /** s23's streaming state: watermarked hourly per-type counts — the
    * exact (event_type, hr, c) table
    * [[graft.operators.EventQueries.cusumFromCounts]] folds, so the
    * CUSUM changepoint decision runs from state with zero event
    * re-reads. Run in Complete mode for a bounded-source replay (a
    * live pipeline runs Update and re-folds on each trigger — the
    * fold input is the same state either way). */
  def streamingTypeHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("window.start").as("hr"), col("c"))

  /** Time-series downsampling as a stream: per-user tumbling window
    * with a watermark — the streaming face of the s14 batch rollup
    * (minus the distinct-type count, which streaming aggregation
    * cannot compute exactly; a live pipeline uses
    * approx_count_distinct there). `bucket` is the same epoch-aligned
    * integral 5-minute index as the batch form, so stream==batch is
    * directly comparable (StreamingSpec). */
  def streamingDownsample(
      events: DataFrame, windowSeconds: Long = 300L,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$windowSeconds seconds"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sv_cents"))
      .select(
        col("user_id"),
        expr(s"unix_micros(window.start) div ${windowSeconds * 1000000L}")
          .as("bucket"),
        col("n_events"), col("sv_cents"))

  case class Ev(event_id: Long, ts_us: Long, user_id: Long)
  case class SessionState(sessions: List[(Long, Long, Long, Long)])
  case class SessionOut(user_id: Long, session_number: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /** Stateful streaming sessionization via flatMapGroupsWithState:
    * per-user state carries the open session across micro-batches;
    * finished sessions are emitted when a gap closes them. On a static
    * source processed to completion this matches `sessionStats` for
    * all closed sessions; the final open session per user remains in
    * state (emitted here on timeout in a live stream).
    *
    * Late data: an event at or before the open session's end merges
    * into it (extending `start` downward if needed) rather than
    * rewinding `end` — so out-of-order arrivals within the open
    * session never fracture it. Events older than the open session's
    * reach (start − gap) belong to an already-emitted session and are
    * counted as their own late singleton session (a real pipeline
    * would route them to a corrections channel). */
  def streamingSessionize(
      events: Dataset[Ev], gapSeconds: Long = SessionGapSeconds): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          // (session_number, n, start, end)
          var current = state.getOption.map(_.sessions).getOrElse(Nil).headOption
          var closed = List.empty[SessionOut]
          sorted.foreach { e =>
            current match {
              case Some((num, n, s, end))
                  if e.ts_us <= end + gapUs && e.ts_us >= s - gapUs =>
                // in-order extension OR late arrival inside the open
                // session's reach: end only moves forward, start only
                // backward
                current = Some((num, n + 1,
                  math.min(s, e.ts_us), math.max(end, e.ts_us)))
              case Some((num, _, s, _)) if e.ts_us < s - gapUs =>
                // too late for the open session: emit as a late
                // singleton, keep the open session untouched
                closed ::= SessionOut(userId, num, 1L, e.ts_us, e.ts_us)
              case Some((num, n, s, end)) =>
                // gap exceeded forward: close and start a new session
                closed ::= SessionOut(userId, num, n, s, end)
                current = Some((num + 1, 1L, e.ts_us, e.ts_us))
              case None =>
                current = Some((1L, 1L, e.ts_us, e.ts_us))
            }
          }
          state.update(SessionState(current.toList))
          closed.reverseIterator
      }
  }

  case class TypedEv(event_id: Long, ts_us: Long, user_id: Long,
      event_type: String)
  case class AttribState(first: String, prev: Option[String],
      converted: Boolean)
  case class AttribOut(user_id: Long, first_touch: String,
      last_touch: Option[String])

  case class SeqState(p1: String, p2: String)
  case class SeqOut(user_id: Long, e1: String, e2: String, e3: String)

  /** Streaming sequential-pattern extraction — the stream face of the
    * s22 batch query: per user, emit every 3-event-type sequence as
    * its third event arrives. State per user is O(1) — the last TWO
    * event types, the sliding context a trigram needs — so an
    * unbounded clickstream costs state proportional to USERS. Emitted
    * trigram multiset ≡ the batch double-lead window's (spec-pinned);
    * the global top-k count is a downstream aggregation either way.
    * Ordering contract as [[streamingAttribution]]: sorted within a
    * micro-batch, time-ordered batch delivery across them. */
  def streamingSequences(events: Dataset[TypedEv]): Dataset[SeqOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqState, SeqOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[TypedEv], state: GroupState[SeqState]) =>
          var st = state.getOption.getOrElse(SeqState(null, null))
          val out = scala.collection.mutable.ListBuffer.empty[SeqOut]
          for (e <- evs.toSeq.sortBy(e => (e.ts_us, e.event_id))) {
            if (st.p1 != null)
              out += SeqOut(uid, st.p1, st.p2, e.event_type)
            st = SeqState(st.p2, e.event_type)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming conversion attribution — the stream face of the s16
    * batch query: per user, emit (first_touch, last_touch) exactly
    * once, at the moment the first `purchase` arrives; non-converting
    * users emit nothing (their state is one tiny record awaiting a
    * purchase). first_touch = the user's earliest event type,
    * last_touch = the event immediately before the first purchase
    * (None when the purchase IS the first event) — the same
    * semantics the batch query derives from its row_number windows.
    *
    * State per user is O(1) — two strings and a flag — and events
    * after conversion are ignored without resorting the history, so
    * an unbounded clickstream costs state proportional to USERS, not
    * events. Within a micro-batch arrivals are sorted by event time;
    * ACROSS batches the usual ordered-delivery contract of the other
    * stateful ops applies (a production deployment would pair this
    * with a watermark + timeout to expire converted/stale users). */
  def streamingAttribution(events: Dataset[TypedEv]): Dataset[AttribOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttribState, AttribOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[TypedEv], state: GroupState[AttribState]) =>
          var st = state.getOption.getOrElse(AttribState(null, None, false))
          var out = List.empty[AttribOut]
          if (!st.converted) {
            for (e <- evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
                 if !st.converted) {
              val first = if (st.first == null) e.event_type else st.first
              if (e.event_type == "purchase") {
                out ::= AttribOut(uid, first, st.prev)
                st = AttribState(first, st.prev, converted = true)
              } else {
                st = AttribState(first, Some(e.event_type), converted = false)
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class FunnelState(viewUs: Long, clickUs: Long, purchaseUs: Long)
  case class FunnelOut(user_id: Long, stage: Long, view_us: Long,
      click_us: Option[Long], purchase_us: Option[Long])

  /** Streaming ordered-funnel — the stream face of the s25 batch
    * query (round 16): per user, view → click → purchase where each
    * stage counts only at-or-after the previous stage's FIRST
    * occurrence. One row is emitted per stage TRANSITION (at most 3
    * per user, ever), carrying the funnel row as of that moment; the
    * user's max-stage row ≡ the batch funnel row (spec-pinned). Users
    * with no view emit nothing, exactly as the batch form starts from
    * the view cohort.
    *
    * State per user is O(1) — three epoch-micros slots (-1 = unset).
    * Each micro-batch is folded in STAGE order (all views, then all
    * clicks, then all purchases, each pass in time order): the
    * chained conditional mins need full batch visibility — a click
    * TIED with the first view's timestamp can sort before it, and a
    * single time-ordered pass would silently drop it where the batch
    * `min(click ≥ view_us)` counts it (ties qualify under ≥). Within
    * a pass the first qualifying event IS the min, so the fold stays
    * O(batch) with no history kept; ACROSS batches the usual
    * ordered-delivery contract of the sibling stateful rungs applies
    * (a tie split across two micro-batches is out of contract).
    *
    * State TTL (round 17): with `horizonSeconds > 0` the input gains
    * a watermark and each user's state carries an EVENT-TIME timeout
    * at last-activity + horizon — abandoned users (a view that never
    * clicks) leave the state store once the watermark passes their
    * horizon, so lifetime-distinct users no longer accumulate
    * forever (the round-16 NoTimeout gap). A user whose next stage
    * arrives within the horizon is unaffected; one who returns after
    * expiry restarts the funnel — exactly the trade a horizon
    * declares. The default 0 keeps the unbounded round-16 contract. */
  def streamingFunnel(
      events: Dataset[TypedEv],
      horizonSeconds: Long = 0L,
      watermarkDelay: String = "10 seconds"): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val ttl = horizonSeconds > 0 && events.isStreaming
    val src =
      if (ttl)
        events.withColumn("ts", timestamp_micros(col("ts_us")))
          .withWatermark("ts", watermarkDelay)
          .as[TypedEv]
      else events
    val timeout =
      if (ttl) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, timeout) {
        (uid: Long, evs: Iterator[TypedEv], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            val out = scala.collection.mutable.ListBuffer.empty[FunnelOut]
            val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
            for (e <- sorted if e.event_type == "view")
              if (st.viewUs < 0) {
                st = st.copy(viewUs = e.ts_us)
                out += FunnelOut(uid, 1L, e.ts_us, None, None)
              }
            for (e <- sorted if e.event_type == "click")
              if (st.viewUs >= 0 && st.clickUs < 0 && e.ts_us >= st.viewUs) {
                st = st.copy(clickUs = e.ts_us)
                out += FunnelOut(uid, 2L, st.viewUs, Some(e.ts_us), None)
              }
            for (e <- sorted if e.event_type == "purchase")
              if (st.clickUs >= 0 && st.purchaseUs < 0 &&
                  e.ts_us >= st.clickUs) {
                st = st.copy(purchaseUs = e.ts_us)
                out += FunnelOut(uid, 3L, st.viewUs, Some(st.clickUs),
                  Some(e.ts_us))
              }
            state.update(st)
            if (ttl && sorted.nonEmpty)
              // never set a timeout at-or-before the current watermark
              // (the state API rejects it for an already-late group)
              state.setTimeoutTimestamp(math.max(
                sorted.map(_.ts_us).max / 1000L + horizonSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }

  case class RetState(cohortWk: Long, preWks: List[Long],
      emitted: List[Long])
  case class RetOut(user_id: Long, cohort_wk: Long, week_offset: Long)

  /** Streaming retention — the stream face of the s26 batch query
    * (round 16): per user, one row per (cohort_wk, week_offset) the
    * FIRST time the user is active in that week at-or-after their
    * signup week. The s26 cohort table folds from the emitted rows
    * with plain aggregation (n_active = COUNT per (cohort, offset) —
    * each pair emits once per user; cohort size = the offset-0 count,
    * since signup itself is activity); stream ≡ batch spec-pinned.
    *
    * State per user: the cohort week plus the emitted offset list —
    * bounded by the HORIZON in weeks (a year = 52 entries), never by
    * event volume. `preWks` holds distinct weeks seen before the
    * signup arrives; under time-ordered delivery those can only
    * qualify at offset 0, but they fold through the same ≥-cohort
    * gate so an in-batch reorder cannot drop the signup-week
    * activity. Weeks are the same pure integer epoch-week indexes as
    * the batch form (us div 604800·10⁶).
    *
    * State TTL (round 17): with `horizonWeeks > 0` the report is
    * horizon-bounded the way a production retention table is (a
    * 12-week cohort report never emits offset 13): offsets past the
    * horizon are not emitted, `preWks` keeps only weeks within the
    * horizon of the newest seen (the round-16 gap: a user who never
    * signs up otherwise accumulates one entry per distinct pre-signup
    * week for the stream's lifetime), and each user's state carries
    * an event-time timeout at the horizon past its last activity —
    * signed-up users expire once their observation window closes,
    * never-signup users once their pre-history can no longer qualify.
    * The default 0 keeps the unbounded round-16 contract. */
  def streamingRetention(
      events: Dataset[TypedEv],
      weekUs: Long = 604800000000L,
      horizonWeeks: Long = 0L,
      watermarkDelay: String = "10 seconds"): Dataset[RetOut] = {
    import events.sparkSession.implicits._
    val ttl = horizonWeeks > 0 && events.isStreaming
    val src =
      if (ttl)
        events.withColumn("ts", timestamp_micros(col("ts_us")))
          .withWatermark("ts", watermarkDelay)
          .as[TypedEv]
      else events
    val timeout =
      if (ttl) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetState, RetOut](
        OutputMode.Append, timeout) {
        (uid: Long, evs: Iterator[TypedEv], state: GroupState[RetState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(RetState(-1L, Nil, Nil))
            val out = scala.collection.mutable.ListBuffer.empty[RetOut]
            var lastWk = -1L
            for (e <- evs.toSeq.sortBy(e => (e.ts_us, e.event_id))) {
              val wk = Math.floorDiv(e.ts_us, weekUs)
              lastWk = math.max(lastWk, wk)
              if (st.cohortWk < 0) {
                if (e.event_type == "signup") {
                  val offs = (wk :: st.preWks).filter(_ >= wk)
                    .map(_ - wk).distinct
                    .filter(o => horizonWeeks <= 0 || o <= horizonWeeks)
                  offs.foreach(o => out += RetOut(uid, wk, o))
                  st = RetState(wk, Nil, offs)
                } else if (!st.preWks.contains(wk))
                  st = st.copy(preWks = (wk :: st.preWks).filter(w =>
                    horizonWeeks <= 0 || w >= wk - horizonWeeks))
              } else {
                val o = wk - st.cohortWk
                if (o >= 0 && !st.emitted.contains(o) &&
                    (horizonWeeks <= 0 || o <= horizonWeeks)) {
                  out += RetOut(uid, st.cohortWk, o)
                  st = st.copy(emitted = o :: st.emitted)
                }
              }
            }
            state.update(st)
            if (ttl && lastWk >= 0)
              state.setTimeoutTimestamp(math.max(
                (lastWk + horizonWeeks + 1L) * (weekUs / 1000L),
                state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }

  /** Stream-stream correlated join: for each left event, all right
    * events of the same user within the trailing `windowSeconds`.
    * Watermarks on both sides bound the join state (right rows are
    * dropped once older than the watermark minus the window) — the
    * unbounded-log-safe form of event correlation. Works identically
    * on batch DataFrames (same expression, no state). */
  def correlate(
      left: DataFrame, right: DataFrame,
      windowSeconds: Long = 1800L,
      watermark: String = "1 hour"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark("ts", watermark) else left)
      .select(col("event_id").as("l_event_id"), col("user_id"),
        col("ts").as("l_ts"))
    val r = (if (right.isStreaming) right.withWatermark("ts", watermark) else right)
      .select(col("event_id").as("r_event_id"),
        col("user_id").as("r_user_id"), col("ts").as("r_ts"))
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col("r_ts") <= col("l_ts"))
      .select(col("l_event_id"), col("user_id"), col("r_event_id"),
        col("l_ts"), col("r_ts"))
  }

  /** Batch-only scale form of [[correlate]]: the join key gains a
    * time bucket of `windowSeconds` width, so one reduce task never
    * sees more than ~two buckets of one user's events — a hot user's
    * trailing-window join spreads over its time range instead of
    * concentrating in one task (the same move as the skew-safe as-of
    * join). Each right event is indexed under its own bucket and the
    * next (a left event's trailing window spans at most two), the
    * range predicate then trims exactly — results are bit-identical
    * to [[correlate]], checked against the same oracle. */
  def correlateBinned(
      left: DataFrame, right: DataFrame,
      windowSeconds: Long = 1800L): DataFrame = {
    val winUs = windowSeconds * 1000000L
    // integral division (SQL `div`, truncation toward zero): double
    // `/` could round a quotient across a bucket boundary at micro
    // timestamps. Truncation differs from floor for NEGATIVE
    // (pre-epoch) timestamps, but buckets stay monotone with unit
    // steps either way, so the own-bucket + next-bucket indexing and
    // the exact range trim remain correct for any epoch sign.
    val b = expr(s"unix_micros(ts) div $winUs")
    val l = left.select(col("event_id").as("l_event_id"), col("user_id"),
      col("ts").as("l_ts"), b.as("bucket"))
    val r = right
      .select(col("event_id").as("r_event_id"),
        col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        explode(array(b, b + 1)).as("bucket"))
    l.join(r,
      col("user_id") === col("r_user_id") && l("bucket") === r("bucket") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col("r_ts") <= col("l_ts"))
      .select(col("l_event_id"), col("user_id"), col("r_event_id"),
        col("l_ts"), col("r_ts"))
  }

  /** Streaming exact dedup — the stream face of the batch d1/d7
    * dedup: keep the first arrival per key, dropping repeats. State is
    * BOUNDED by the event-time watermark (`dropDuplicatesWithinWatermark`
    * evicts a key's dedup record once the watermark passes it), so an
    * unbounded log never accumulates unbounded dedup state — the
    * contract an ingest-time deduper needs. Works identically on a
    * batch frame (plain dropDuplicates) so the same call serves both
    * faces of the pipeline. */
  def streamingDedup(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      delay: String = "1 hour"): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
    else df.dropDuplicates(keys)

  /** Run a streaming query over a static parquet dir to completion via
    * the memory sink; returns the collected result table. The harness
    * for asserting stream == batch. */
  def runToCompletion(
      streamDf: DataFrame, queryName: String, outputMode: OutputMode): DataFrame = {
    val q = streamDf.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    streamDf.sparkSession.table(queryName)
  }
}
