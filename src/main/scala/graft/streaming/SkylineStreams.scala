package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q162's Pareto frontier: the frontier maintained
  * INCREMENTALLY as points arrive, instead of recomputed per snapshot.
  *
  * The skyline operator has exactly the property a streaming state
  * needs: the state IS the answer, and the answer is output-bounded
  * (frontier-sized, not stream-sized) — a dominated point can never
  * re-enter the frontier when more points arrive, so pruning is safe
  * forever and the per-batch work is merge(frontier, batch) followed by
  * one prune. Dominance semantics are identical to batch q162
  * (maximize both coordinates, strict in at least one; duplicate
  * points co-survive), asserted by the replay-parity spec.
  *
  * Scale notes: the single logical group means the stream's points all
  * meet at one task — the same place batch q162's GLOBAL stage runs.
  * The fix is also the same: run the batch local-skyline prefilter
  * upstream (any salt-partitioned window), so only per-partition
  * survivors reach the stateful operator; the state itself never
  * exceeds the true frontier plus the current batch.
  */
object SkylineStreams {

  final case class Pt(key: Long, price_c: Long, date_us: Long)
  final case class Frontier(pts: List[Pt])

  /** Exact skyline of a point set under q162's dominance: group by
    * price descending; a price group survives iff its max date beats
    * every strictly-higher-price date seen so far, and within a
    * surviving group exactly the max-date points (duplicates included)
    * are kept. */
  def skylineOf(pts: Seq[Pt]): List[Pt] = {
    val byPrice = pts.groupBy(_.price_c).toSeq.sortBy(-_._1)
    var hi = Long.MinValue
    val out = List.newBuilder[Pt]
    byPrice.foreach { case (_, g) =>
      val gm = g.map(_.date_us).max
      if (gm > hi) {
        out ++= g.filter(_.date_us == gm).sortBy(_.key)
        hi = gm
      }
    }
    out.result()
  }

  /** Each micro-batch emits the full post-merge frontier (tag rows
    * with the batch if deltas are needed downstream); state carries
    * only the frontier itself. */
  def frontier(points: Dataset[Pt]): Dataset[Pt] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Frontier, Pt](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[Pt], state: GroupState[Frontier]) =>
          val merged = skylineOf(
            state.getOption.map(_.pts).getOrElse(Nil) ++ rows.toSeq)
          state.update(Frontier(merged))
          merged.iterator
      }
  }
}
