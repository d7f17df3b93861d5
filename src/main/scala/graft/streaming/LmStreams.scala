package graft.streaming

import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Streaming stupid-backoff LM scoring: the production split of q136 —
  * count the TRAIN corpus once into static n-gram tables, then score
  * arriving documents with three stream-static left joins (trigram,
  * backoff bigram, unigram floor). Stream-static joins are append-safe
  * and the count tables are exactly the windows q136 computes inline,
  * so the two forms agree number-for-number (parity-spec'd). At scale
  * the count tables are vocabulary-sized (n-gram TYPES), shuffled once
  * at build; each arriving doc's trigrams join by key — no state
  * beyond the per-doc aggregate. */
object LmStreams {

  /** Explode a documents frame into its trigram stream
    * (doc_id, a, b, c). */
  private def trigrams(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("t"), lit(1), greatest(size(col("t")) - 2, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 2, lit(0))),
        slice(col("t"), lit(3), greatest(size(col("t")) - 2, lit(0))))).as("g"))
      .select(col("doc_id"), col("g.0").as("a"), col("g.1").as("b"),
        col("g.2").as("c"))
  }

  /** Static n-gram count tables from the train corpus: trigram table
    * (a, b, c, c_abc, c_ab), backoff bigram table (b, c, c_bc), and
    * final-token table (c, c_c) — all counted over the SAME trigram
    * stream q136's windows aggregate, with the (a, b) context count
    * attached to the trigram row (it is only consulted when the
    * trigram itself was seen). */
  def backoffCounts(trainDocs: DataFrame): (DataFrame, DataFrame, DataFrame, Long) = {
    val tg = trigrams(trainDocs)
    val tri = tg.groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("c_abc"))
      .withColumn("c_ab",
        sum(col("c_abc")).over(Window.partitionBy(col("a"), col("b"))))
    val bi = tg.groupBy(col("b"), col("c")).agg(count(lit(1)).as("c_bc"))
    val uni = tg.groupBy(col("c")).agg(count(lit(1)).as("c_c"))
    val n = tg.count()
    (tri, bi, uni, n)
  }

  /** Score a streaming documents frame against the static tables.
    * Output matches q136's eval rows: (doc_id, n_pos, n_tri, n_bi,
    * n_uni, avg_backoff_bits); complete-mode aggregate. */
  def backoffScore(docs: DataFrame, tri: DataFrame, bi: DataFrame,
      uni: DataFrame, n: Long): DataFrame = {
    val scored = trigrams(docs)
      .join(tri, Seq("a", "b", "c"), "left")
      .join(bi, Seq("b", "c"), "left")
      .join(uni, Seq("c"), "left")
      .select(col("doc_id"),
        coalesce(col("c_abc"), lit(0L)).as("c_abc"),
        coalesce(col("c_ab"), lit(0L)).as("c_ab"),
        coalesce(col("c_bc"), lit(0L)).as("c_bc"),
        coalesce(col("c_c"), lit(0L)).as("c_c"))
      .withColumn("p",
        when(col("c_abc") > 0, col("c_abc").cast("double") / col("c_ab"))
          .when(col("c_bc") > 0, lit(0.4) * col("c_bc") / col("c_c"))
          .otherwise(lit(0.16) * (col("c_c") + 1) / lit(n + 1.0)))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pos"),
        sum(when(col("c_abc") > 0, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("c_abc") === 0 && col("c_bc") > 0, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("c_abc") === 0 && col("c_bc") === 0, 1L).otherwise(0L)).as("n_uni"),
        round(avg(-log2(col("p"))), 6).as("avg_backoff_bits"))
  }
}
