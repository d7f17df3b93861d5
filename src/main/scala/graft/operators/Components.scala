package graft.operators

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
  * only (same posture as q86/q114); localCheckpoint truncates lineage
  * so the plan stays flat across rounds.
  */
object Components {

  /** large-star: for every node u, connect each STRICTLY LARGER
    * neighbor to m = min(neighbors ∪ {u}). Emitted edges are (hi, lo)
    * by construction (v > u >= m). */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val m = least(min(col("v")).over(Window.partitionBy(col("u"))), col("u"))
    sym.withColumn("m", m)
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** small-star: orient each edge toward its larger endpoint, then
    * connect that node and all its (smaller) neighbors to the
    * neighborhood minimum. */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    val ori = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val withM = ori.withColumn("m",
      min(col("v")).over(Window.partitionBy(col("u"))))
    withM.select(col("u"), col("m").as("v"))
      .union(withM.select(col("v").as("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Contract `edges` (any two long columns named u/v; self-loops and
    * duplicates tolerated) to its star forest: one (node, root) edge
    * per non-root node, root = the component's minimum node id. */
  private[graft] def stars(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    var cur = smallStar(largeStar(
      edges.filter(col("u") =!= col("v")))).localCheckpoint(true)
    var converged = false
    var round = 1
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      // both sides are distinct sets of (hi, lo) pairs, so equal
      // counts + empty one-sided difference proves set equality
      converged = next.count() == cur.count() &&
        next.except(cur).isEmpty
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
