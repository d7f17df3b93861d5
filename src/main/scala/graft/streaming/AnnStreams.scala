package graft.streaming

import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming similarity search: query vectors arrive on a stream and
  * probe a STATIC IVF-indexed corpus (the production split of q57 —
  * index once, serve the query firehose). The stream-static cell join
  * bounds candidates per query to ~nprobe/K of the corpus, and the
  * per-query top-k is ONE bounded-state aggregate: (cosine, vec_id)
  * packs order-isomorphically into a single long, so MinKAgg's k longs
  * per query ARE the result heap — mergeable across batches (the
  * partial agg is the sketch union), k*|queries| total state, no
  * per-query sort anywhere. Complete-mode output; with a watermarked
  * query stream the same aggregate closes per event-time window.
  *
  * Parity: EventStreamsSpec pins the decoded stream results equal to
  * the batch q57 rows (same codebook, same rounding, same
  * (cos desc, vec_id) tie-break — the packed-long order).
  */
object AnnStreams {

  /** Index the static corpus side: doubles, self-dot, IVF cell. */
  def ivfIndex(corpus: DataFrame, nCells: Int): DataFrame =
    corpus
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
      .withColumn("ss", dot_product(col("emb"), col("emb")))
      .withColumn("cell", ivf_cell(col("emb"), nCells))

  /** Stream-static IVF search. `queries` is a streaming frame of
    * (vec_id, embedding); returns one row per query with the packed
    * top-k array (see [[decode]]). */
  def ivfSearch(queries: DataFrame, indexedCorpus: DataFrame,
      nCells: Int, nprobe: Int, topK: Int): DataFrame = {
    val q = queries
      .select(col("vec_id").as("qid"),
        transform(col("embedding"), _.cast("double")).as("qe"))
      .withColumn("qss", dot_product(col("qe"), col("qe")))
      .withColumn("cell", explode(ivf_probes(col("qe"), nCells, nprobe)))
    val cand = q.join(indexedCorpus, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(dot_product(col("qe"), col("emb")) /
        (sqrt(col("qss")) * sqrt(col("ss"))), 6))
    // pack (-cos, vec_id) into one long: the 6dp cosine is an exact
    // integer in [-1e6, 1e6], biased to [1e6, 3e6] in the high 32 bits
    // so ascending packed order == (cos desc, vec_id asc)
    val enc = (lit(2000000L) - floor(col("cos") * 1e6 + 0.5).cast("long")) *
      lit(1L << 32) + col("vec_id")
    cand.groupBy(col("qid")).agg(min_k(enc, topK).as("top"))
  }

  /** Unpack [[ivfSearch]]'s rows to the q57 output shape
    * (qid, rnk, vec_id, cos). */
  def decode(searched: DataFrame): DataFrame =
    searched
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "v")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rnk"),
        col("v").bitwiseAND(lit((1L << 32) - 1)).as("vec_id"),
        ((lit(2000000L) - shiftright(col("v"), 32)).cast("double") / 1e6).as("cos"))
}
