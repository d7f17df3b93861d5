package graft

import graft.functions._
import graft.queries.Pipeline
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("minhash-LSH dedup finds exactly the brute-force near-dup pairs") {
    val lsh = Pipeline.queries("q31_minhash_lsh_dedup")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute force: all-pairs exact Jaccard over shingle sets
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
    val brute = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
        size(array_union(col("a.sh"), col("b.sh"))))
      .filter(col("j") >= 0.9)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(lsh == brute)
    assert(brute.nonEmpty, "test data should contain planted near-duplicates")
  }

  test("minhash-LSH skew cap keeps representatives: 65+ exact copies still pair") {
    // 70 identical docs share ALL 16 band hashes, so every bucket holds 70
    // members (> the 64 cap). A whole-bucket drop would report ZERO pairs
    // for the primary dedup target; the representative cap must keep the
    // first 64 (by doc_id) pairing in every band -> C(64,2) pairs.
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q31cap").toString
    (0L until 70L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Pipeline.queries("q31_minhash_lsh_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for (a <- 0L until 64L; b <- (a + 1) until 64L) yield (a, b)).toSet
    assert(pairs == expected, s"got ${pairs.size} pairs, want ${expected.size}")
  }

  test("ngram-jaccard prefix-filter join is exact vs brute force at t=0.8") {
    val pf = Pipeline.queries("q82_ngram_jaccard_join")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val brute = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
        size(array_union(col("a.sh"), col("b.sh"))))
      .filter(col("j") >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pf == brute)
    assert(brute.nonEmpty, "test data should contain planted near-duplicates")
  }

  test("ngram-jaccard skew cap keeps representatives: 65+ exact copies still pair") {
    // Identical docs share identical df-ordered prefixes, so every prefix
    // posting holds all 70 members (> the 64 cap); the representative cap
    // must keep the first 64 (by doc_id) pairing -> C(64,2) exact pairs.
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q82cap").toString
    (0L until 70L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Pipeline.queries("q82_ngram_jaccard_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for (a <- 0L until 64L; b <- (a + 1) until 64L) yield (a, b)).toSet
    assert(pairs == expected, s"got ${pairs.size} pairs, want ${expected.size}")
  }

  test("simhash near-dup pairs cover the high-jaccard pairs") {
    val sim = Pipeline.queries("q38_simhash_neardup")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val minhash = Pipeline.queries("q31_minhash_lsh_dedup")(spark, sf)
      .filter(col("jaccard") >= 0.98)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(minhash.subsetOf(sim),
      s"simhash missed high-jaccard pairs: ${minhash -- sim}")
  }

  test("ann topk is rank-ordered and self-free") {
    val rows = Pipeline.queries("q36_ann_topk")(spark, sf).collect()
    assert(rows.length > 0)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getDouble(3)).sameElements(
        byRank.map(_.getDouble(3)).sorted(Ordering[Double].reverse)), s"qid $qid not sorted")
      assert(rs.forall(_.getLong(2) != qid), "self in neighbors")
    }
  }

  test("multimodal feature stub: 16-bin histogram counts sum to n_bytes") {
    val r = Pipeline.queries("q40_multimodal_features")(spark, sf).head
    val feats = r.getAs[String]("features").split(",").map(_.toLong)
    assert(feats.length == 16)
    assert(feats.sum == r.getAs[Long]("n_bytes"))
  }

  test("ivf ann: probed search overlaps the exact top-k (recall sanity)") {
    def topSets(name: String) =
      Pipeline.queries(name)(spark, sf).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = topSets("q36_ann_topk")
    val ivf = topSets("q57_ann_ivf")
    // nprobe=4 of K=16 cells scans ~1/4 of the corpus; on near-uniform
    // random embeddings expect meaningful but partial overlap
    val overlaps = exact.map { case (q, ex) => (ivf.getOrElse(q, Set.empty) & ex).size }
    assert(overlaps.sum > 0, "IVF found none of the exact neighbors")
    assert(ivf.values.forall(_.size <= 5))
  }

  test("lang_id returns a known label") {
    val langs = Pipeline.queries("q34_lang_id")(spark, sf)
      .select("lang_guess").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "zh", "und")))
  }

  test("exact dedup keeps one keeper per hash") {
    val df = Pipeline.queries("q30_exact_dedup")(spark, sf)
    assert(df.count() == df.select("content_hash").distinct().count())
  }
}
