package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.min_k

/** The lexical-retrieval family: the bounded MinKAgg aggregate
  * (expressions/MinKAgg.scala) and the q111/q112 query semantics it
  * feeds. The oracle rows prove end-to-end equality vs DuckDB; these
  * tests pin the aggregate's merge/dedupe mechanics on adversarial
  * partitionings the sf fixtures don't exercise.
  */
class RetrievalSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("min_k equals slice(sort_array(collect_set)) across partitionings") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(2000) { i =>
      (s"g${i % 7}", rnd.nextLong() % 500) // dups + negatives across 7 groups
    }
    for (parts <- Seq(1, 3, 13)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val got = df.groupBy($"g").agg(min_k($"v", 16).as("mk"))
      val want = df.groupBy($"g")
        .agg(slice(sort_array(collect_set($"v")), 1, 16).as("mk"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"min_k mismatch at parts=$parts")
    }
  }

  test("min_k keeps fewer than k when the distinct domain is small") {
    val df = Seq.fill(100)(42L).zipWithIndex
      .map { case (v, i) => ("g", if (i % 2 == 0) v else 7L) }
      .toDF("g", "v").repartition(5)
    val r = df.groupBy($"g").agg(min_k($"v", 16).as("mk"))
      .head.getSeq[Long](1)
    assert(r == Seq(7L, 42L)) // distinct, sorted, no repeats from merges
  }

  test("min_k ignores nulls and caps hot groups") {
    val df = (1L to 1000L).toDF("v")
      .select(lit("hot").as("g"),
        when($"v" % 97 === 0, null).otherwise($"v" * -1).as("v"))
      .repartition(7)
    val r = df.groupBy($"g").agg(min_k($"v", 4).as("mk")).head.getSeq[Long](1)
    assert(r == Seq(-1000L, -999L, -998L, -997L))
  }

  test("q111 postings are the capped ascending doc_id prefix") {
    val r = SparkEntry.queries("q111_inverted_index")(spark, SparkSpec.sf)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val posting = row.getAs[String]("postings").split(",").map(_.toLong)
      assert(posting.length <= 16)
      assert(posting.sameElements(posting.sorted), s"unsorted: ${row}")
      assert(posting.distinct.length == posting.length)
      assert(row.getAs[Long]("df") >= posting.length ||
        row.getAs[Long]("df") == posting.length)
      assert(row.getAs[Long]("tf") >= row.getAs[Long]("df"))
    }
  }

  test("q112 ranks a planted term-stuffed doc first and scores by BM25") {
    // Planted corpus: doc 1 is stuffed with all four query terms, doc 2
    // matches one term once, doc 3 matches nothing and must be absent.
    val docs = Seq(
      (1L, "dup vector hash merge dup vector", "en", "s", 6L),
      (2L, "filler words and a hash only here", "en", "s", 7L),
      (3L, "nothing relevant at all", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q112_bm25_topk")(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[Long]("n_terms") == 4L)
    assert(out(1).getAs[Long]("n_terms") == 1L)
    assert(out(0).getAs[Double]("score") > out(1).getAs[Double]("score"))
  }

  test("q118 IVFADC is the flat ADC scan restricted to probed cells") {
    // Jegou et al.'s IVFADC contract: same codes, same ADC metric, the
    // cell routing only PRUNES candidates. So (1) any pair both
    // variants return carries the identical integer adc and cosine;
    // (2) per query, the k-th best of the pruned candidate set can
    // only be >= the k-th best of the exhaustive set; (3) every query
    // still finds neighbors at this fixture density.
    val sf = "/root/testdata/sf0.001"
    def rows(useCells: Boolean) =
      graft.queries.Pipeline.pqAnn(spark, sf, useCells).collect()
        .map(r => (r.getLong(0), r.getLong(2)) ->
          ((r.getLong(1), r.getLong(3), r.getDouble(4)))).toMap
    val flat = rows(useCells = false)
    val cell = rows(useCells = true)
    assert(cell.nonEmpty && flat.nonEmpty)
    val qids = flat.keys.map(_._1).toSet
    assert(cell.keys.map(_._1).toSet == qids, "every query keeps hits under IVF")
    for (k <- cell.keySet & flat.keySet) {
      assert(cell(k)._2 == flat(k)._2, s"adc diverged on $k")
      assert(cell(k)._3 == flat(k)._3, s"cos diverged on $k")
    }
    for (q <- qids) {
      def ranked(m: Map[(Long, Long), (Long, Long, Double)]) =
        m.collect { case ((`q`, _), (rnk, adc, _)) => rnk -> adc }.toSeq.sortBy(_._1)
      val (f, c) = (ranked(flat), ranked(cell))
      for (((_, fAdc), (_, cAdc)) <- f.zip(c))
        assert(cAdc >= fAdc, s"query $q: pruned rank beat the exhaustive rank")
    }
  }
}
