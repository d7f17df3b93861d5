package graft.operators

import graft.Checkpoints
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components via alternating large-star / small-star
  * (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
  * Components in MapReduce and Beyond", SoCC 2014, Algorithm 2).
  *
  * Why this exists next to q86's min-label propagation: label prop
  * converges in O(diameter) rounds — fine for the cliquish near-dup
  * graphs it was built for, but a CHAIN-shaped component (incremental
  * crawl snapshots, session-stitching identity graphs) of length d
  * needs d rounds, and q86 hard-caps at 20. Alternating star
  * contracts the graph toward stars rooted at each component's
  * minimum node in O(log^2 n) rounds REGARDLESS of diameter — the
  * published MapReduce-scale answer, and each round is shuffle-bounded
  * by the CURRENT edge set (which only shrinks toward one edge per
  * non-root node).
  *
  * Scale shape per phase: one hash exchange for the per-node window
  * min + one for the distinct — the data in flight is (node, node)
  * pairs, never payload rows. The driver loop is iteration CONTROL
  * only (same posture as q86/q114); each round's edge set is
  * checkpointed (lineage truncated so the plan stays flat across
  * rounds) and round n-1's blocks are released as soon as round n is
  * materialized — see [[graft.Checkpoints]] for the lifecycle and the
  * local-vs-reliable checkpoint reliability posture
  * (SPARK_GRAFT_RELIABLE_CHECKPOINT switches to reliable checkpoints
  * for cluster deployments that need mid-job fault tolerance).
  */
object Components {

  /** large-star: for every node u, connect each STRICTLY LARGER
    * neighbor to m = min(neighbors ∪ {u}). Emitted edges are (hi, lo)
    * by construction (v > u >= m). */
  private[graft] def largeStar(e: DataFrame): DataFrame =
    largeStarRaw(e).distinct()

  /** largeStar WITHOUT the trailing dedup: emits one (hi, lo) row per
    * input edge with v > u (at most |e| rows, possibly with
    * duplicates). The alternating rounds feed this straight into
    * smallStar, which is duplicate-tolerant (its window takes a min
    * and it ends in its own distinct) — skipping the intermediate
    * exchange saves one full shuffle of the edge set per round at
    * ZERO extra rows (the raw emission is never larger than the
    * deduped one was before its distinct). */
  private def largeStarRaw(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val m = least(min(col("v")).over(Window.partitionBy(col("u"))), col("u"))
    sym.withColumn("m", m)
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
  }

  /** small-star: orient each edge toward its larger endpoint, then
    * connect that node and all its (smaller) neighbors to the
    * neighborhood minimum. The two outputs per windowed row ((u, m)
    * and (v, m)) emit through ONE explode instead of a union of two
    * projections of the window — the union form re-ran the window
    * (sort + min) twice per round, once per branch, because only the
    * Exchange below it is reused across plan branches. */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    val ori = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val withM = ori.withColumn("m",
      min(col("v")).over(Window.partitionBy(col("u"))))
    withM.select(explode(array(
        struct(col("u"), col("m").as("v")),
        struct(col("v").as("u"), col("m").as("v")))).as("x"))
      .select(col("x.u").as("u"), col("x.v").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Contract `edges` (any two long columns named u/v; self-loops and
    * duplicates tolerated) to its star forest: one (node, root) edge
    * per non-root node, root = the component's minimum node id. */
  private[graft] def stars(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    // Materialize the caller's edge build ONCE before the first round:
    // largeStar consumes its input twice (the symmetrization union),
    // so an uncheckpointed edge set re-ran the whole upstream pipeline
    // (LSH banding + exact verify for q143/q154, the per-image decode
    // + band join for q229) twice — guide §1.2: remove recomputed
    // passes before anything else. The rounds themselves were already
    // checkpointed.
    val e0 = Checkpoints.cp(edges.filter(col("u") =!= col("v")))
    var cur = Checkpoints.cp(smallStar(largeStarRaw(e0)))
    // e0's only consumer (round 1) is materialized — free its blocks
    Checkpoints.release(e0)
    var converged = false
    var round = 1
    // r16 tried-and-REVERTED: running contraction rounds in PAIRS per
    // convergence check (VERDICT r15 #6). Same-window A/B on the
    // q86/q143/q154/q229 family (focused median-of-3, sf0.1,
    // local[32]): paired 11.38 s vs per-round 10.64 s — the
    // one-overshoot contraction round (materialized via checkpoint)
    // costs more than the +1/-1 convergence job it saves at these
    // round counts (fixtures converge in 2-3 rounds, so pairing buys
    // at most one skipped check and always pays one extra round's cp).
    while (!converged && round < maxRounds) {
      val next = Checkpoints.cp(smallStar(largeStarRaw(cur)))
      // both sides are distinct sets of (hi, lo) pairs, so per-key
      // +1/-1 weights summing to zero everywhere proves set equality —
      // ONE shuffle job instead of the previous count() + except()
      // pair (two jobs, except shuffling both sides)
      converged = next.select(col("u"), col("v"), lit(1L).as("__w"))
        .union(cur.select(col("u"), col("v"), lit(-1L).as("__w")))
        .groupBy(col("u"), col("v")).agg(sum(col("__w")).as("__w"))
        .filter(col("__w") =!= 0L).isEmpty
      // round n is materialized and the convergence check consumed
      // round n-1: its blocks are dead (r16: blocks used to pin for
      // the JVM's lifetime, accumulating across the suite)
      Checkpoints.release(cur)
      cur = next
      round += 1
    }
    require(converged, s"alternating star did not converge in $maxRounds rounds")
    cur
  }

  /** Each graph node labeled with its component's minimum node id.
    * Columns: (node, component). Nodes absent from the edge set are
    * absent from the output (an isolated row is its own trivial
    * component — callers that need it add the spine). */
  def components(edges: DataFrame): DataFrame = {
    val st = stars(edges)
    st.select(col("u").as("node"), col("v").as("component"))
      .union(st.select(col("v").as("node"), col("v").as("component")))
      .distinct()
  }
}
