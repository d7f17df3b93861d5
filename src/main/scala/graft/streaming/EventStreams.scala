package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming operators over the events stream: event-time
  * windowed aggregation with watermarks, and a
  * flatMapGroupsWithState-based cursor (the engine-managed form of
  * mito's user-threaded `cursor` object — SURVEY §1.1: "cursor =
  * engine-managed state keyed by input partition").
  *
  * Scale notes: windowed aggregation shuffles once on (window, key) with
  * partial aggregation and watermark-driven state eviction — state size
  * is O(open windows x keys), not O(stream). The stateful cursor keeps
  * one small struct per key in the state store with idle-timeout
  * eviction.
  */
object EventStreams {

  /** Event-time tumbling-window counts/sums per event_type with a
    * watermark for late-data eviction. `ts` may arrive as epoch-nano
    * LONG or as a timestamp — [[graft.Tables.eventMicros]] dispatches on
    * the bound schema (known at plan time even for a stream). */
  def windowedAgg(events: DataFrame, window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(graft.Tables.eventMicros(events)))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))

  final case class EventRow(user_id: Long, event_id: Long, ts: Long, value: Double)
  final case class Cursor(user_id: Long, last_event_id: Long, last_ts: Long,
      n_events: Long, total_value: Double)

  /** Per-user cursor maintained in the state store: the mito
    * `{"cursor": {...}}` pattern with engine-managed fault-tolerant
    * state (at-least-once on replay, like the reference's re-entry
    * loop). Emits the updated cursor on every batch a user appears in. */
  def userCursor(events: Dataset[EventRow]): Dataset[Cursor] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Cursor, Cursor](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[Cursor]) =>
          val prev = state.getOption.getOrElse(Cursor(userId, -1L, Long.MinValue, 0L, 0d))
          var cur = prev
          rows.foreach { r =>
            cur = Cursor(userId,
              if (r.ts > cur.last_ts) r.event_id else cur.last_event_id,
              math.max(r.ts, cur.last_ts),
              cur.n_events + 1,
              cur.total_value + r.value)
          }
          state.update(cur)
          if (cur.n_events != prev.n_events) Iterator.single(cur) else Iterator.empty
      }
  }

  /** A session event: micro-precision time (the batch q85 unit) plus
    * the event-time column the watermark is defined on. */
  final case class SessEvent(user_id: Long, event_id: Long, tus: Long,
      value: Double, event_time: java.sql.Timestamp)
  /** A completed session — the streaming twin of one batch q85 row
    * (session_seq is a batch presentation artifact; identity here is
    * (user_id, session_start_us)). */
  final case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, sum_value: Double)
  /** The in-flight session state (public: the state encoder's codegen
    * instantiates it reflectively). */
  final case class OpenSession(start: Long, end: Long, n: Long,
      sumCents: Long)

  /** Streaming gap-based sessionization: the incremental form of batch
    * q85. State per user is ONE open session (4 longs); a session is
    * emitted when a new event arrives past the gap, or when the
    * event-time timer fires after the watermark passes the gap horizon
    * — so state is bounded by active users, not history. Values
    * accumulate as exact cents (decimal(18,2) semantics, matching the
    * batch rollup's decimal sum bit-for-bit). Events are sorted within
    * each micro-batch; cross-batch disorder is the watermark's job. */
  def sessionize(events: Dataset[SessEvent], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L
    def cents(v: Double): Long = java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP).movePointRight(2).longValueExact()
    def emit(userId: Long, s: OpenSession): Session =
      Session(userId, s.start, s.end, s.n,
        new java.math.BigDecimal(java.math.BigInteger.valueOf(s.sumCents), 2).doubleValue())
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(userId, s))
          } else {
            val out = Vector.newBuilder[Session]
            var open = state.getOption
            rows.toVector.sortBy(r => (r.tus, r.event_id)).foreach { r =>
              open = open match {
                case Some(s) if r.tus - s.end > gapUs =>
                  out += emit(userId, s)
                  Some(OpenSession(r.tus, r.tus, 1L, cents(r.value)))
                case Some(s) =>
                  Some(OpenSession(s.start, math.max(s.end, r.tus), s.n + 1,
                    s.sumCents + cents(r.value)))
                case None =>
                  Some(OpenSession(r.tus, r.tus, 1L, cents(r.value)))
              }
            }
            open.foreach { s =>
              state.update(s)
              // the timer must sit above the current watermark (late
              // stragglers can leave end+gap already behind it)
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, s.end / 1000L + gapMs))
            }
            out.result().iterator
          }
      }
  }

  /** One input event for the streaming as-of enrichment. */
  final case class AsofEvent(user_id: Long, event_id: Long, tus: Long,
      event_type: String)
  /** One enriched event: the batch q107 row shape (None = no purchase
    * at-or-before this event yet). */
  final case class AsofOut(event_id: Long, user_id: Long, event_type: String,
      tus: Long, asof_purchase_us: Option[Long])
  /** The retained right-side state: latest match-type timestamp seen. */
  final case class AsofState(us: Long)

  /** Streaming twin of batch q107 (operators.AsOf): enrich each event
    * with the latest `matchType` event of the same user at-or-before
    * its timestamp. State per user is ONE long — the classic streaming
    * enrichment where the "right side" of the as-of join is folded into
    * keyed state instead of sorted alongside (state is bounded by
    * users, not history). Within a micro-batch rows sort by (tus,
    * match-first, event_id) so equal-timestamp matches are inclusive,
    * exactly the batch operator's tie rule; ACROSS batches events must
    * arrive in order per user (a late-arriving purchase cannot
    * retro-enrich rows already emitted — inherent to any append-mode
    * as-of, so the operator is exact under per-key ordered delivery
    * and best-effort under disorder). */
  def asofEnrich(events: Dataset[AsofEvent],
      matchType: String = "purchase"): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[AsofEvent], state: GroupState[AsofState]) =>
          var last = state.getOption
          val out = Vector.newBuilder[AsofOut]
          rows.toVector
            .sortBy(r => (r.tus, if (r.event_type == matchType) 0 else 1, r.event_id))
            .foreach { r =>
              if (r.event_type == matchType) last = Some(AsofState(r.tus))
              out += AsofOut(r.event_id, userId, r.event_type, r.tus, last.map(_.us))
            }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** One input event for streaming attribution. */
  final case class AttrEvent(user_id: Long, event_id: Long, tus: Long,
      event_type: String, value: Double)
  /** One attributed purchase: the batch q149 pre-rollup row. */
  final case class AttrOut(event_id: Long, user_id: Long, day: Long,
      attributed: Boolean, cents: Long)

  /** Streaming twin of batch q149 (last-touch attribution): each
    * purchase credits the user's most recent view within `windowUs`,
    * with the view cursor folded into ONE long of keyed state (same
    * state shape as [[asofEnrich]] — attribution IS an as-of join
    * against the view sub-stream). Within a micro-batch rows sort by
    * (tus, event_id), the batch window's exact tie rule; across
    * batches the per-key ordered-delivery caveat of any append-mode
    * as-of applies. Emits per-purchase rows — the day rollup
    * downstream is a plain streaming groupBy in update mode. */
  def attribute(events: Dataset[AttrEvent],
      windowUs: Long = 7L * 86400000000L): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AttrOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[AttrEvent], state: GroupState[AsofState]) =>
          var lastView = state.getOption
          val out = Vector.newBuilder[AttrOut]
          rows.toVector.sortBy(r => (r.tus, r.event_id)).foreach { r =>
            if (r.event_type == "view") lastView = Some(AsofState(r.tus))
            else if (r.event_type == "purchase") {
              val attr = lastView.exists(s => r.tus - s.us <= windowUs)
              out += AttrOut(r.event_id, userId, r.tus / 86400000000L, attr,
                math.floor(r.value * 100).toLong)
            }
          }
          lastView.foreach(state.update)
          out.result().iterator
      }
  }

  /** One daily volume cell for the streaming CUSUM monitor. */
  final case class CusumCell(event_type: String, day: Long, cnt: Long)
  /** One CUSUM point: the statistic after folding `day`. */
  final case class CusumOut(event_type: String, day: Long, s: Long)
  /** CUSUM recursion state: prefix sum and its clamped running min. */
  final case class CusumState(cum: Long, runmin: Long)

  /** Streaming twin of batch q148: Page's CUSUM over per-type daily
    * volumes, maintained incrementally as (cum, runmin) — TWO longs of
    * state per type, updated by the same closed form the batch windows
    * compute (S_t = cum_t - min(0, runmin_t)). The reference mean is a
    * plan-side literal per type (a calibration window's mean — the
    * standard online-CUSUM posture; batch q148 estimates it from the
    * full series, which a stream cannot know). Within a micro-batch
    * cells fold in day order; across batches days must arrive in order
    * per type (the append-mode as-of caveat). */
  def cusum(cells: Dataset[CusumCell], mu: Map[String, Long]): Dataset[CusumOut] = {
    import cells.sparkSession.implicits._
    cells
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (ty: String, rows: Iterator[CusumCell], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L))
          val m = mu.getOrElse(ty, 0L)
          val out = Vector.newBuilder[CusumOut]
          rows.toVector.sortBy(_.day).foreach { r =>
            val cum = st.cum + (r.cnt - m)
            st = CusumState(cum, math.min(st.runmin, cum))
            out += CusumOut(ty, r.day, cum - math.min(st.runmin, 0L))
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** One daily volume cell for the streaming EWMA monitor. */
  final case class EwmaCell(event_type: String, day: Long, cnt: Long)
  /** One EWMA point: the pre-update baseline and flag for `day`. */
  final case class EwmaOut(event_type: String, day: Long, cnt: Long,
    ewma_prev: Double, flagged: Boolean)
  /** EWMA recursion state: the decayed sum anchored at lastDay, plus
    * how many prior days have been folded. */
  final case class EwmaState(sum: Double, lastDay: Long, nPrior: Long)

  /** Streaming twin of batch q184: the per-type EWMA baseline
    * maintained incrementally as ONE decayed sum — sum_d = sum_{b<=d}
    * cnt_b * 0.75^(d-b), carried forward by multiplying 0.75^(gap) on
    * each arrival (day gaps decay correctly, same calendar-distance
    * contract as the batch pair join). ewma_prev for an arriving day d
    * is 0.25 * sum * 0.75^(d-1-lastDay); days with fewer than 5 priors
    * are warm-up and emit nothing, matching the batch gate. The flag
    * compares against the ROUNDED baseline exactly like batch q184.
    * State per type: one double + two longs. Days must arrive in order
    * per type across batches (the append-mode as-of caveat); within a
    * micro-batch cells fold in day order. */
  def ewma(cells: Dataset[EwmaCell]): Dataset[EwmaOut] = {
    import cells.sparkSession.implicits._
    cells
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (ty: String, rows: Iterator[EwmaCell], state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(0.0, Long.MinValue, 0L))
          val out = Vector.newBuilder[EwmaOut]
          // a re-delivered or batch-split day would pass the ordering
          // assumption (r.day == st.lastDay) yet fold its count into
          // the decayed sum a second time, silently corrupting the
          // baseline — drop already-folded days instead (at-least-once
          // delivery becomes effectively-once for the state fold)
          rows.toVector.sortBy(_.day)
            .foreach { r => if (r.day > st.lastDay) {
            if (st.nPrior >= 5) {
              val prev = BigDecimal(0.25 * st.sum *
                math.pow(0.75, (r.day - 1 - st.lastDay).toDouble))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              out += EwmaOut(ty, r.day, r.cnt, prev, r.cnt > 2.0 * prev)
            }
            val carried =
              if (st.nPrior == 0L) 0.0
              else st.sum * math.pow(0.75, (r.day - st.lastDay).toDouble)
            st = EwmaState(carried + r.cnt, r.day, st.nPrior + 1)
          } }
          state.update(st)
          out.result().iterator
      }
  }

  /** One daily (trials, conversions) cell for the streaming SPRT. */
  final case class SprtCell(day: Long, trials: Long, conversions: Long)
  /** One SPRT point: the post-update LLR and decision for `day`. */
  final case class SprtOut(day: Long, trials: Long, conversions: Long,
    llr: Double, decision: String)
  /** SPRT recursion state: the running LLR anchored at lastDay. */
  final case class SprtState(llr: Double, lastDay: Long)

  /** Streaming twin of batch q211: Wald's SPRT walked incrementally —
    * each arriving day folds conv*ln(p1/p0) +
    * (trials-conv)*ln((1-p1)/(1-p0)) into ONE running LLR (H1: p=0.25
    * vs H0: p=0.2, the batch query's pre-registered constants) and
    * emits the day's decision against the +/-ln(19) bounds. The terms
    * fold in day order (within a batch by sort, across batches by the
    * append-mode in-order caveat), so the double sequence is
    * bit-identical to the batch cumsum; re-delivered or batch-split
    * days are dropped after the first fold (the ewma dedup contract).
    * State per stream: one double + one long. */
  def sprt(cells: Dataset[SprtCell]): Dataset[SprtOut] = {
    import cells.sparkSession.implicits._
    val c1 = math.log(0.25 / 0.2)
    val c2 = math.log(0.75 / 0.8)
    val bound = math.log(19.0)
    cells
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[SprtState, SprtOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[SprtCell], state: GroupState[SprtState]) =>
          var st = state.getOption.getOrElse(SprtState(0.0, Long.MinValue))
          val out = Vector.newBuilder[SprtOut]
          rows.toVector.sortBy(_.day).foreach { r =>
            if (r.day > st.lastDay) {
              // the day's term is built BEFORE it joins the running sum
              // (conv*c1 + rest*c2, then llr + term) — the same
              // association the batch window's per-row expression uses,
              // so the double sequence matches bit for bit
              val term = r.conversions * c1 + (r.trials - r.conversions) * c2
              st = SprtState(st.llr + term, r.day)
              val rounded = BigDecimal(st.llr)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              val dec = if (rounded >= bound) "accept_h1"
                        else if (rounded <= -bound) "accept_h0"
                        else "continue"
              out += SprtOut(r.day, r.trials, r.conversions, rounded, dec)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** One daily (type, day, revenue-cents) cell for the streaming
    * Page-Hinkley monitor. */
  final case class PhCell(eventType: String, day: Long, x: Long)
  /** One Page-Hinkley point: the post-update statistic for `day`. */
  final case class PhOut(eventType: String, day: Long, x: Long,
    runningMean: Double, phStat: Double, alarm: Boolean)
  /** PH recursion state: prefix count + exact integer prefix sum (the
    * running mean derives from them, never drifts), the dev cumsum U,
    * its running minimum, and the dedup anchor. */
  final case class PhState(n: Long, sx: Long, u: Double, umin: Double,
    lastDay: Long)

  /** Streaming twin of batch q241: Page-Hinkley walked incrementally —
    * each arriving (type, day) cell updates the exact integer prefix
    * (n, sum), derives mean = sum/n (one double division, identical to
    * the batch window's exact-prefix-sum spelling), folds
    * dev = x - mean into the running U, tracks min U, and emits
    * PH = U - minU with the same unrounded lambda = 100000 alarm.
    * Days fold in order (within a batch by sort, across batches by the
    * append-mode in-order caveat); re-delivered days are dropped after
    * the first fold (the ewma dedup contract). State per type: four
    * scalars + the anchor. */
  def pageHinkley(cells: Dataset[PhCell]): Dataset[PhOut] = {
    import cells.sparkSession.implicits._
    cells
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[PhState, PhOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[PhCell], state: GroupState[PhState]) =>
          var st = state.getOption.getOrElse(
            PhState(0L, 0L, 0.0, Double.MaxValue, Long.MinValue))
          val out = Vector.newBuilder[PhOut]
          rows.toVector.sortBy(_.day).foreach { r =>
            if (r.day > st.lastDay) {
              val n = st.n + 1
              val sx = st.sx + r.x
              val mean = sx.toDouble / n
              val u = st.u + (r.x.toDouble - mean)
              val umin = math.min(st.umin, u)
              st = PhState(n, sx, u, umin, r.day)
              val ph = u - umin
              def r6(v: Double) = BigDecimal(v)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              out += PhOut(k, r.day, r.x, r6(mean), r6(ph), ph > 100000.0)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** The same per-user cursor on the transformWithState API (Spark 4.1
    * StatefulProcessor): typed ValueState in the state store, optional
    * TTL so an idle user's cursor is evicted instead of living forever
    * — the operational upgrade over [[userCursor]] for unbounded key
    * spaces (requires the RocksDB state store provider). Output parity
    * with userCursor is asserted by EventStreamsSpec. */
  final class CursorProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, EventRow, Cursor] {
    @transient private var cursor: ValueState[Cursor] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttlConf =
        if (ttl == null || ttl.isZero) TTLConfig.NONE
        else TTLConfig(ttl)
      cursor = getHandle.getValueState[Cursor]("cursor",
        Encoders.product[Cursor], ttlConf)
    }

    override def handleInputRows(userId: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[Cursor] = {
      val prev = Option(cursor.get())
        .getOrElse(Cursor(userId, -1L, Long.MinValue, 0L, 0d))
      var cur = prev
      rows.foreach { r =>
        cur = Cursor(userId,
          if (r.ts > cur.last_ts) r.event_id else cur.last_event_id,
          math.max(r.ts, cur.last_ts),
          cur.n_events + 1,
          cur.total_value + r.value)
      }
      cursor.update(cur)
      if (cur.n_events != prev.n_events) Iterator.single(cur) else Iterator.empty
    }
  }

  final case class FunnelEvent(user_id: Long, event_type: String,
    tus: Long, event_id: Long)
  final case class FunnelState(user_id: Long, t1: Option[Long],
    t2: Option[Long], t3: Option[Long])

  /** q139's strict-sequence funnel incrementally (transformWithState):
    * three longs of ValueState per user (-1 = unset) advanced through
    * the view -> click-after-view -> purchase-after-click chain.
    * Each micro-batch's rows are processed in EVENT-TIME order
    * ((tus, event_id) sort, matching the batch window's frame), so the
    * first qualifying event in the scan IS the batch form's min —
    * single-batch output is exactly funnelTimes (parity-spec'd).
    * Across batches the merge is monotone: steps only ever move
    * earlier-to-later as data arrives in time order; late events that
    * precede an already-fixed earlier step follow last-merge semantics
    * (the same arrival-horizon trade every streaming twin here
    * documents — exact replay requires reprocessing, i.e. the batch
    * form). Emits the user's full (t1, t2, t3) row each batch the user
    * appears; the latest row per user is the funnel state. */
  final class FunnelProcessor
      extends StatefulProcessor[Long, FunnelEvent, FunnelState] {
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("funnel",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[FunnelState] = {
      var (t1, t2, t3) = if (st.exists()) st.get() else (-1L, -1L, -1L)
      rows.toVector.sortBy(e => (e.tus, e.event_id)).foreach { e =>
        e.event_type match {
          case "view" if t1 < 0 => t1 = e.tus
          case "click" if t1 >= 0 && t2 < 0 && e.tus > t1 => t2 = e.tus
          case "purchase" if t2 >= 0 && t3 < 0 && e.tus > t2 => t3 = e.tus
          case _ =>
        }
      }
      st.update((t1, t2, t3))
      def opt(v: Long): Option[Long] = if (v < 0) None else Some(v)
      Iterator.single(FunnelState(key, opt(t1), opt(t2), opt(t3)))
    }
  }

  /** Streaming funnel state via transformWithState. */
  def funnelTws(events: Dataset[FunnelEvent]): Dataset[FunnelState] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Per-user cursor via transformWithState; `ttl` null/zero = keep
    * state forever (parity with userCursor). TTL eviction is
    * processing-time based, so a TTL forces TimeMode.ProcessingTime
    * (the engine rejects TTL state under TimeMode.None). */
  def userCursorTws(events: Dataset[EventRow],
      ttl: java.time.Duration = null): Dataset[Cursor] = {
    import events.sparkSession.implicits._
    val timeMode =
      if (ttl == null || ttl.isZero) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.user_id)
      .transformWithState(new CursorProcessor(ttl), timeMode, OutputMode.Append())
  }
}
