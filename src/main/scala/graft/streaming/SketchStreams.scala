package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins for the sketch family's sliding-window face —
  * the operational form of SURVEY §2's "store sketches at the finest
  * grain, derive every window by merge" algebra (q160/q228).
  */
object SketchStreams {

  /** One day-grain HLL register cell on lane `idx`: the day's max-rho,
    * None when the densified spine had no contributing user for the
    * lane (q228's left-join null). */
  final case class RegCell(day: Long, idx: Long, m: Option[Long])
  /** The trailing-7-day merged register for (day, idx). */
  final case class RegOut(day: Long, idx: Long, mm: Option[Long])
  /** Per-lane state: day -> max-rho for the trailing week (<= 7
    * entries after the prune) plus the last emitted day. */
  final case class RegState(days: Map[Long, Long], lastDay: Long)

  /** Streaming twin of batch q228's register windowing: keyed by
    * register lane (256 keys), each arriving day's cell MAX-merges
    * into the lane's trailing-week day->rho map — max-merge makes a
    * re-delivered cell idempotent, the property that lets sketch
    * pipelines shrug off at-least-once delivery — prunes days older
    * than the week, and emits the merged trailing register
    * max over (day-6 .. day). Days must arrive in order across
    * batches (the sprt/ewma caveat; within a batch they are sorted);
    * a late re-delivery merges into state but never re-emits an
    * already-emitted day. State per lane: <= 7 (day, rho) pairs + a
    * long — 256 lanes x ~120 B total, SF-invariant. The 256-lane ->
    * estimate fold is stateless arithmetic downstream; the parity
    * spec applies q121's estimator to the emitted registers and
    * matches batch q228's hll_est bit for bit. */
  def slidingHllRegisters(cells: Dataset[RegCell]): Dataset[RegOut] = {
    import cells.sparkSession.implicits._
    cells
      .groupByKey(_.idx)
      .flatMapGroupsWithState[RegState, RegOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (idx: Long, rows: Iterator[RegCell], state: GroupState[RegState]) =>
          var st = state.getOption.getOrElse(RegState(Map.empty, Long.MinValue))
          val out = Vector.newBuilder[RegOut]
          rows.toVector.sortBy(_.day).foreach { r =>
            val merged = r.m.fold(st.days)(m => st.days.updated(r.day,
              math.max(m, st.days.getOrElse(r.day, Long.MinValue))))
            if (r.day > st.lastDay) {
              val pruned = merged.filter { case (d, _) => d > r.day - 7 }
              st = RegState(pruned, r.day)
              out += RegOut(r.day, idx,
                if (pruned.isEmpty) None else Some(pruned.values.max))
            } else {
              // late/re-delivered day: absorb (idempotent under
              // max-merge), keep the prune anchored at lastDay
              st = st.copy(days =
                merged.filter { case (d, _) => d > st.lastDay - 7 })
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
