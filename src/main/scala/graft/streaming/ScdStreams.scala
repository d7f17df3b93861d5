package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of batch q199 (SCD2 dimension-history BUILD): the
  * interval-construction side of the CDC pair whose APPLY side is
  * [[DedupStreams.applyChanges]]. An order-change log streams in; per
  * customer, consecutive runs of the same order priority fold into
  * Kimball type-2 validity intervals incrementally, instead of the
  * batch form's lag/cumsum/lead windows over the full log.
  *
  * State per custkey is ONE fixed-width record (the open run: run_id,
  * priority, valid_from, n_orders, plus the last-applied (od,
  * orderkey) cursor) — independent of how many orders the customer
  * ever places. Each micro-batch emits:
  *   - a `closed = true` row for every run the batch closes
  *     (valid_to = the next run's valid_from) — immutable facts, safe
  *     to append straight to the history table;
  *   - one `closed = false` row for the key's post-batch open run
  *     (valid_to = None). The LATEST open row per key upserts the
  *     "current" slice, so closed-appends + open-upserts reproduce the
  *     batch q199 snapshot exactly (parity-spec'd in
  *     EventStreamsSpec).
  *
  * Ordering contract (same posture as [[EventStreams.ewma]] after the
  * r11 duplicate-fold fix): rows WITHIN a micro-batch are applied in
  * (od, orderkey) order — matching the batch window's frame — and
  * across batches the per-key (od, orderkey) cursor must not regress;
  * a re-delivered or out-of-order row at or below the cursor is
  * DROPPED, so redelivery cannot split a run or double-count
  * n_orders. Exact replay of genuinely late data requires
  * reprocessing, i.e. the batch form — the same arrival-horizon trade
  * every streaming twin here documents.
  */
object ScdStreams {

  final case class OrderRow(custkey: Long, orderkey: Long, od: Int,
    priority: String)
  /** `od`/`valid_from`/`valid_to` are epoch days (the batch DATE
    * columns' wire form — `datediff(d, DATE'1970-01-01')`). */
  final case class ScdInterval(custkey: Long, run_id: Long, priority: String,
    valid_from: Int, valid_to: Option[Int], n_orders: Long, closed: Boolean)

  // open run + re-delivery cursor; priority is never null in the
  // orders fixture so null marks "no state yet" is unnecessary —
  // absence of the ValueState row is the empty state
  private final case class RunState(run_id: Long, priority: String,
    valid_from: Int, n_orders: Long, last_od: Int, last_ok: Long)

  final class ScdProcessor
      extends StatefulProcessor[Long, OrderRow, ScdInterval] {
    @transient private var st: ValueState[RunState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[RunState]("run",
        Encoders.product[RunState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[OrderRow],
        timerValues: TimerValues): Iterator[ScdInterval] = {
      val out = Vector.newBuilder[ScdInterval]
      var cur: RunState = if (st.exists()) st.get() else null
      rows.toVector.sortBy(r => (r.od, r.orderkey)).foreach { r =>
        val fresh =
          cur == null || r.od > cur.last_od ||
            (r.od == cur.last_od && r.orderkey > cur.last_ok)
        if (fresh) {
          if (cur == null)
            cur = RunState(1L, r.priority, r.od, 1L, r.od, r.orderkey)
          else if (r.priority == cur.priority)
            cur = cur.copy(n_orders = cur.n_orders + 1L,
              last_od = r.od, last_ok = r.orderkey)
          else {
            out += ScdInterval(key, cur.run_id, cur.priority,
              cur.valid_from, Some(r.od), cur.n_orders, closed = true)
            cur = RunState(cur.run_id + 1L, r.priority, r.od, 1L,
              r.od, r.orderkey)
          }
        }
      }
      if (cur != null) {
        st.update(cur)
        out += ScdInterval(key, cur.run_id, cur.priority, cur.valid_from,
          None, cur.n_orders, closed = false)
      }
      out.result().iterator
    }
  }

  def buildIntervals(orders: Dataset[OrderRow]): Dataset[ScdInterval] = {
    import orders.sparkSession.implicits._
    orders.groupByKey(_.custkey)
      .transformWithState(new ScdProcessor, TimeMode.None(), OutputMode.Append())
  }
}
