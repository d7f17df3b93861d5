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

  test("containment join finds a doc pasted inside a bigger one — asymmetric, jaccard-blind") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q224cj").toString
    val small = (1 to 40).map(i => s"w$i").mkString(" ")
    val filler = (100 to 400).map(i => s"x$i").mkString(" ")
    Seq((1L, small), (2L, small + " " + filler), (3L, (1000 to 1100).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q224_containment_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // small ⊂ big: containment exactly 1.0, ONE direction only — and
    // nothing pairs with the unrelated doc
    assert(rows == Seq((1L, 2L, 1.0)), s"got $rows")
    // the pair is invisible to symmetric jaccard dedup at its threshold
    val jac = Pipeline.queries("q82_ngram_jaccard_join")(spark, dir).collect()
    assert(jac.isEmpty, "q82 should not see a ~0.11-jaccard pair")
  }

  test("shapley attribution equals the brute permutation average and is efficient") {
    val got = Pipeline.queries("q225_shapley_attribution")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // independent recompute: per-user pre-first-purchase channel sets,
    // then Shapley as the LITERAL average marginal over all n!
    // channel orderings (the definition, not the coalition formula)
    val ev = Tables(spark, sf).events
    val raw = ev.select(col("user_id"), col("event_type"),
        Tables.eventMicros(ev).as("tus"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = raw.groupBy(_._1)
    val channels = raw.map(_._2).distinct.filter(_ != "purchase").sorted.toSeq
    val sets = byUser.toSeq.map { case (_, rs) =>
      val fp = rs.filter(_._2 == "purchase").map(_._3).minOption
      val touched = rs.filter(r => r._2 != "purchase" &&
        fp.forall(r._3 < _)).map(_._2).toSet
      (touched, rs.exists(_._2 == "purchase"))
    }
    def v(coal: Set[String]): Long =
      sets.count { case (t, conv) => conv && t.subsetOf(coal) }.toLong
    val perms = channels.permutations.toSeq
    val brute = channels.map { c =>
      val marginals = perms.map { p =>
        val before = p.takeWhile(_ != c).toSet
        v(before + c) - v(before)
      }
      c -> marginals.sum.toDouble / perms.size
    }.toMap
    assert(got.keySet == brute.keySet)
    brute.foreach { case (c, phi) =>
      assert(math.abs(got(c) - phi) < 1e-6, s"$c: ${got(c)} vs brute $phi")
    }
    // efficiency: the values split exactly v(all) - v(empty)
    val total = got.values.sum
    assert(math.abs(total - (v(channels.toSet) - v(Set.empty))) < 1e-4,
      s"sum ${total} != v(all) - v(empty)")
  }

  test("image dup clusters equal a driver-side union-find over the q223 pairs") {
    val pairs = Pipeline.queries("q223_image_dhash_neardup")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val byRoot = parent.keys.toSeq.groupBy(find)
    val want = byRoot.values.flatMap { members =>
      val root = members.min
      members.map(m => (m, root, m == root, members.size.toLong))
    }.toSeq.sortBy(_._1)
    val got = Pipeline.queries("q229_image_dup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3))).toSeq
    assert(got == want, "components diverge from union-find ground truth")
    assert(got.nonEmpty && got.exists(_._4 >= 8),
      "the planted 8-doc groups should form clusters")
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

  test("byte-level multimodal feature: 16-bin histogram counts sum to n_bytes") {
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

  test("dup clusters: labels are the component minimum of the q31 pair graph") {
    val pairs = Pipeline.queries("q31_minhash_lsh_dedup")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = Pipeline.queries("q86_dup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference union-find over the same edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(labels.keySet == nodes.toSet, "cluster rows = pair-graph nodes")
    nodes.foreach(n => assert(labels(n) == find(n), s"doc $n labeled ${labels(n)}, want ${find(n)}"))
    assert(nodes.nonEmpty)
  }

  test("stratified split is total, deterministic, and id-only") {
    val rows = Pipeline.queries("q83_stratified_split")(spark, sf).collect()
    val total = Tables(spark, sf).documents.count()
    assert(rows.length == total, "every doc gets exactly one split row")
    // id-only determinism: recompute one doc's bucket with plain JDK md5
    val r0 = rows.head
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"split:${r0.getLong(0)}".getBytes("UTF-8"))
    // digest bytes 8..15, little-endian — md5Lower64/md5_number_lower
    var h = 0L
    for (i <- 15 to 8 by -1) h = (h << 8) | (md(i) & 0xffL)
    assert(r0.getLong(2) == (h & 1023L), "bucket != md5-lower-64 & 1023")
    // 80/10/10 by construction of the thresholds; loose bound at n=50
    val frac = rows.count(_.getString(3) == "train").toDouble / total
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac implausible")
  }

  test("vocab top-k: tf >= df, ranks total, and top-1 is the global max") {
    val rows = Pipeline.queries("q84_vocab_topk")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(r => r.getLong(1) >= r.getLong(2) && r.getLong(2) >= 1))
    val tfs = rows.map(_.getLong(1))
    assert(tfs.sameElements(tfs.sorted(Ordering[Long].reverse)), "not tf-descending")
    val globalMax = Tables(spark, sf).documents
      .select(explode(tokens(col("text"))).as("t")).groupBy("t").count()
      .agg(max("count")).head.getLong(0)
    assert(rows.head.getLong(1) == globalMax)
  }

  test("pii redact: planted emails/ips/phones are replaced and counted") {
    // The driver corpus contains no PII (q87's oracle row passes with 0
    // matches), so the redaction semantics are pinned here on planted
    // docs with known expected output.
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q87pii").toString
    Seq(
      (1L, "contact alice.smith+x@mail.example.org for details", "s", "en", 0L),
      (2L, "server at 10.0.255.7 answered", "s", "en", 0L),
      (3L, "call +1 415 555 0188 or 415-555-0199 now", "s", "en", 0L),
      (4L, "nothing sensitive here", "s", "en", 0L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q87_pii_redact")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(rows(1L) == ((1L, 0L, 0L, "contact <EMAIL> for details")))
    assert(rows(2L) == ((0L, 1L, 0L, "server at <IP> answered")))
    assert(rows(3L) == ((0L, 0L, 2L, "call <PHONE> or <PHONE> now")))
    assert(rows(4L) == ((0L, 0L, 0L, "nothing sensitive here")))
  }

  test("sequence pack: bins are contiguous per shard and respect the budget") {
    val rows = Pipeline.queries("q88_sequence_pack")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val byId = rs.sortBy(_.getLong(0))
      var cum = 0L
      byId.foreach { r =>
        assert(r.getLong(3) == cum / 256, s"$src doc ${r.getLong(0)} bin")
        assert(r.getLong(4) == cum % 256, s"$src doc ${r.getLong(0)} offset")
        cum += r.getLong(2)
      }
    }
    assert(rows.map(_.getLong(3)).max >= 1, "budget too large: only one bin")
  }

  test("sessionize: sessions partition the events and respect the 30-min gap") {
    val rows = Pipeline.queries("q85_sessionize")(spark, sf).collect()
    val nEvents = Tables(spark, sf).events.count()
    assert(rows.map(_.getLong(4)).sum == nEvents, "sessions must cover all events")
    rows.groupBy(_.getLong(0)).foreach { case (user, rs) =>
      val byId = rs.sortBy(_.getLong(1))
      byId.foreach(r => assert(r.getLong(2) <= r.getLong(3), "start <= end"))
      byId.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) - a.getLong(3) > 1800L * 1000000L,
            s"user $user: sessions ${a.getLong(1)}/${b.getLong(1)} closer than the gap")
        case _ =>
      }
    }
  }

  test("repetition stats: planted repeats get exact n-gram fractions") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q89rep").toString
    Seq(
      (1L, "a b a b a b", "s", "en", 0L), // bigrams: 3x"a b", 2x"b a"
      (2L, "x y z w", "s", "en", 0L),     // all n-grams distinct
      (3L, "q", "s", "en", 0L),           // too short for any n-gram
      (4L, "p q", "s", "en", 0L))         // bigram yes, trigram no
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q89_repetition_stats")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(2) == 3L)          // top2_count
    assert(rows(1L).getDouble(3) == 3.0 / 5)   // top2_frac
    assert(rows(1L).getDouble(4) == 1.0)       // dup2_frac: every bigram repeats
    assert(rows(1L).getLong(5) == 2L)          // top3_count ("a b a" twice)
    assert(rows(1L).getDouble(6) == 1.0)       // dup3_frac
    assert(rows(2L).getLong(2) == 1L && rows(2L).getDouble(4) == 0.0)
    assert(rows(3L).getLong(2) == 0L && rows(3L).getDouble(3) == 0.0)
    assert(rows(4L).getLong(2) == 1L && rows(4L).getLong(5) == 0L
      && rows(4L).getDouble(6) == 0.0)
  }

  test("decontaminate: eval docs never appear; an eval copy is fully flagged") {
    // Invariants on the driver corpus…
    val rows = Pipeline.queries("q90_decontaminate")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 20 != 0, "eval doc in the training output")
      assert(r.getLong(1) >= 1L)
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
    }
    // …and exact values on a planted corpus: doc 0 is eval; doc 1 is its
    // verbatim copy (contam_frac 1.0); doc 2 shares no 3-gram (absent).
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q90dec").toString
    Seq(
      (0L, "the quick brown fox jumps over", "s", "en", 0L),
      (1L, "the quick brown fox jumps over", "s", "en", 0L),
      (2L, "entirely disjoint vocabulary appears here", "s", "en", 0L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = Pipeline.queries("q90_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(planted.keySet == Set(1L))
    assert(planted(1L) == ((4L, 1.0))) // 6 tokens -> 4 trigram shingles, all shared
  }

  test("bloom decontaminate: no false negatives vs q90's exact set; audit splits hits") {
    // Bloom guarantees: every truly contaminated doc (q90's exact
    // broadcast-set answer) is flagged with ALL its shared grams
    // (n_true == q90.n_shared); extra flagged docs/grams are pure
    // false positives, and the audit columns account exactly.
    val truth = Pipeline.queries("q90_decontaminate")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Pipeline.queries("q105_bloom_decontaminate")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(truth.nonEmpty)
    assert(truth.keySet.subsetOf(bloom.keySet), "bloom dropped a contaminated doc")
    truth.foreach { case (id, nShared) =>
      val (nf, nt, _) = bloom(id)
      assert(nt == nShared, s"doc $id: bloom audit lost true shared grams")
      assert(nf >= nt)
    }
    (bloom.keySet -- truth.keySet).foreach { id =>
      val (nf, nt, fp) = bloom(id)
      assert(nt == 0L && fp == nf, s"doc $id: phantom true overlap")
    }
    bloom.values.foreach { case (nf, nt, fp) =>
      assert(nf == nt + fp && nf >= 1L)
    }
  }

  test("mixture sample: rarest lang keeps everything at weight 1") {
    val docs = Tables(spark, sf).documents
    val langN = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nmin = langN.values.min
    val rarest = langN.filter(_._2 == nmin).keySet
    val rows = Pipeline.queries("q91_mixture_sample")(spark, sf).collect()
    val byLang = rows.groupBy(_.getString(1))
    rarest.foreach { l =>
      assert(byLang(l).length == langN(l), s"$l: rate 1.0 must keep all docs")
      assert(byLang(l).forall(_.getDouble(2) == 1.0))
    }
    rows.foreach { r =>
      val expected = 1.0 / math.sqrt(nmin.toDouble / langN(r.getString(1)))
      assert(r.getDouble(2) == expected, s"weight for ${r.getString(1)}")
      assert(r.getDouble(2) >= 1.0)
    }
    // the over-represented languages are actually thinned
    val maxLang = langN.maxBy(_._2)._1
    assert(byLang(maxLang).length < langN(maxLang))
  }

  test("quality filter: each rule fires alone on its planted doc") {
    val session = spark
    import session.implicits._
    // stopword-rich English filler with mean word length ~3.3
    val enPad = "the cats and dogs of all come to you within one house is it a big thing wonderful " * 4
    val dir = java.nio.file.Files.createTempDirectory("q92qf").toString
    Seq(
      (1L, enPad.trim, "s", "en", 0L),                          // clean: kept
      (2L, "the and of to in is a short text here now", "s", "en", 0L), // 11 tokens -> f_short
      (3L, ("zq wv xk pj " * 12).trim, "s", "en", 0L),          // no stopwords -> f_stop+f_lang... careful
      (4L, (enPad + "a b " * 30).trim, "s", "en", 0L),          // repeated bigram -> f_rep
      (5L, enPad.trim + " " + ("pneumonoultramicroscopic " * 60).trim, "s", "en", 0L)) // long words -> f_wordlen
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q92_quality_filter")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    def flags(r: org.apache.spark.sql.Row) =
      (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9), r.getBoolean(10))
    assert(rows(1L).getBoolean(11), s"clean doc dropped: ${rows(1L)}")
    assert(flags(rows(2L))._1, "doc 2 must flag f_short")
    assert(flags(rows(3L))._2, "doc 3 must flag f_stop")
    assert(flags(rows(4L))._4, "doc 4 must flag f_rep")
    assert(flags(rows(5L))._3, "doc 5 must flag f_wordlen")
    rows.values.foreach { r =>
      val (a, b, c, d, e) = flags(r)
      assert(r.getBoolean(11) == !(a || b || c || d || e), "keep must be !any(flag)")
    }
    // and on the driver corpus the rules split non-trivially (f_wordlen
    // at column 8 excluded: all 50 docs at sf0.001 sit inside [3,10])
    val corpus = Pipeline.queries("q92_quality_filter")(spark, sf).collect()
    Seq(6, 7, 9, 10).foreach { i =>
      assert(corpus.exists(_.getBoolean(i)), s"rule at column $i never fires at $sf")
    }
    assert(corpus.exists(_.getBoolean(11)), "nothing survives the gate")
  }

  test("semantic dedup: keep-first drops planted duplicates, keeps the rest") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q93sem").toString
    val e1 = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f)
    Seq((1L, e1), (2L, e1), (3L, e1), (4L, e2))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Pipeline.queries("q93_semantic_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(rows(1L) == ((0L, true)), "first copy is the keeper")
    assert(rows(2L) == ((1L, false)))
    assert(rows(3L) == ((2L, false)))
    assert(rows(4L)._2, "orthogonal vector must survive")
    // invariants on the driver corpus
    val corpus = Pipeline.queries("q93_semantic_dedup")(spark, sf).collect()
    assert(corpus.length == Tables(spark, sf).embeddings.count())
    corpus.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(2) == 0L))
      assert(r.getInt(1) >= 0 && r.getInt(1) < 16)
    }
  }

  test("span dedup: a planted 8-token span is found in both carriers only") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q94span").toString
    val span = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 tokens
    Seq(
      (1L, s"one two three $span four five", "s", "en", 0L),
      (2L, s"six seven $span eight nine ten eleven", "s", "en", 0L),
      (3L, "u v w x y z aa bb cc dd", "s", "en", 0L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q94_span_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 13 tokens -> 6 windows; only the one fully inside the span matches
    assert(rows(1L) == ((6L, 1L)), s"doc 1: ${rows(1L)}")
    assert(rows(2L) == ((7L, 1L)), s"doc 2: ${rows(2L)}")
    assert(rows(3L) == ((3L, 0L)), s"doc 3: ${rows(3L)}")
    // corpus invariants: n_shared <= n_windows, frac in [0,1]
    val corpus = Pipeline.queries("q94_span_dedup")(spark, sf).collect()
    corpus.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("curation pipeline composes gate, dedup, split, and pack consistently") {
    val q97 = Pipeline.queries("q97_curation_pipeline")(spark, sf).collect()
    assert(q97.nonEmpty)
    val keepIds = Pipeline.queries("q92_quality_filter")(spark, sf).collect()
      .filter(_.getBoolean(11)).map(_.getLong(0)).toSet
    val ids = q97.map(_.getLong(0)).toSet
    assert(ids.subsetOf(keepIds), "pipeline must only emit gate survivors")
    // dedup among survivors: expected keeper = min id per identical text
    val docs = Tables(spark, sf).documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = keepIds.groupBy(docs).values.map(_.min).toSet
    assert(ids == expected, "keepers must be the min-id survivor per content")
    // split agrees with the standalone q83 assignment
    val splits = Pipeline.queries("q83_stratified_split")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    q97.foreach(r => assert(r.getString(2) == splits(r.getLong(0))))
    // packing is contiguous per (split, source), like the q88 invariant
    q97.groupBy(r => (r.getString(2), r.getString(1))).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(4) == cum / 256)
        cum += r.getLong(3)
      }
    }
  }

  test("unigram surprisal: rare-token docs score above common-token docs, exactly") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q98sur").toString
    Seq(
      (1L, "a a a a", "s", "en", 0L),  // tf(a)=4, N=8 -> 3 - 2 = 1.0 bit
      (2L, "b c d e", "s", "en", 0L))  // four singletons -> 3 - 0 = 3.0 bits
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q98_unigram_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(1L) == ((4L, 1.0)))
    assert(rows(2L) == ((4L, 3.0)))
    // corpus invariant: every surprisal is positive and finite
    val corpus = Pipeline.queries("q98_unigram_surprisal")(spark, sf).collect()
    corpus.foreach(r => assert(r.getDouble(2) > 0.0 && !r.getDouble(2).isInfinite))
  }

  test("bigram surprisal: deterministic contexts are free, novel ones cost bits") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q99bg").toString
    Seq(
      (1L, "a b a b a b", "s", "en", 0L), // (a,b) shares 'a' with doc 3
      (2L, "x y", "s", "en", 0L),         // unique context -> exactly 0 bits
      (3L, "a c", "s", "en", 0L))         // c(a,c)=1 of c(a.)=4 -> exactly 2 bits
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q99_bigram_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(2L) == ((1L, 0.0)))
    assert(rows(3L) == ((1L, 2.0)))
    assert(rows(1L)._1 == 5L && rows(1L)._2 > 0.0 && rows(1L)._2 < rows(3L)._2)
  }

  test("char entropy: known distributions get exact bits") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q95ent").toString
    Seq(
      (1L, "aaaaaaaa", "s", "en", 0L),      // one symbol -> 0 bits
      (2L, "abababab", "s", "en", 0L),      // two equiprobable -> 1 bit
      (3L, "hello world", "s", "en", 0L),   // hand-computed 2.845351
      (4L, "的的a", "s", "zh", 0L))         // codepoint counting, not bytes
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q95_char_entropy")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(1L) == ((8L, 1L, 0.0)))
    assert(rows(2L) == ((8L, 2L, 1.0)))
    assert(rows(3L) == ((11L, 8L, 2.845351)))
    assert(rows(4L)._1 == 3L && rows(4L)._2 == 2L)
  }

  test("corpus report: shares sum to one, cumulative is a total coverage curve") {
    val rows = Pipeline.queries("q96_corpus_report")(spark, sf).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getDouble(5))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    val cums = rows.map(_.getDouble(6))
    cums.sliding(2).foreach {
      case Array(a, b) => assert(b >= a, "cum_share must be nondecreasing")
      case _ =>
    }
    assert(math.abs(cums.last - 1.0) < 1e-9)
    assert(rows.map(_.getLong(2)).sum == Tables(spark, sf).documents.count())
    // descending token order
    val toks = rows.map(_.getLong(3))
    assert(toks.sameElements(toks.sorted(Ordering[Long].reverse)))
  }

  test("curation operators tolerate an empty corpus (0 rows, no throw)") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qEmpty").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Seq("q30_exact_dedup", "q83_stratified_split", "q84_vocab_topk",
      "q87_pii_redact", "q88_sequence_pack", "q89_repetition_stats",
      "q90_decontaminate", "q91_mixture_sample", "q92_quality_filter", "q93_semantic_dedup",
      "q94_span_dedup", "q95_char_entropy", "q96_corpus_report",
      "q97_curation_pipeline", "q98_unigram_surprisal", "q99_bigram_surprisal",
      "q100_winnow_overlap", "q101_token_budget_fill", "q105_bloom_decontaminate")
      .foreach { q =>
        assert(Pipeline.queries(q)(spark, dir).count() == 0L, s"$q on empty corpus")
      }
  }

  test("embed quantize: exact int8 codes on a planted vector, bounded error on the corpus") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q103qz").toString
    Seq((1L, Array(1.0f, -0.5f, 0.25f, 0.0f)), (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Pipeline.queries("q103_embed_quantize")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(rows(1L)._1 == "127,-64,32,0", rows(1L))
    assert(rows(1L)._2 == 0.003937) // 1/254 rounded to 6dp
    assert(rows(2L) == (("0,0,0,0", 0.0)), "zero vector must quantize to zeros")
    // symmetric int8 bound: max error <= maxabs/254 (+ rounding slack)
    val corpus = Pipeline.queries("q103_embed_quantize")(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val q = r.getString(1).split(",").map(_.toInt)
      assert(q.forall(v => v >= -127 && v <= 127), "code out of int8 range")
      assert(q.exists(_ == 127) || q.exists(_ == -127), "scale must saturate one code")
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("dup source matrix: cells partition the q31 pair set") {
    val rows = Pipeline.queries("q102_dup_source_matrix")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "source pair not canonicalized")
      assert(r.getBoolean(4) == (r.getString(0) != r.getString(1)))
      assert(r.getLong(2) >= 1L)
      assert(r.getDouble(3) >= 0.9 && r.getDouble(3) <= 1.0)
    }
    val totalPairs = Pipeline.queries("q31_minhash_lsh_dedup")(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == totalPairs,
      "matrix cells must partition the verified pair set")
  }

  test("token budget fill: each language fills to its budget, prefix-closed and deterministic") {
    val rows = Pipeline.queries("q101_token_budget_fill")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) < 5000L, "admitted past the budget"))
    val langTotal = Tables(spark, sf).documents.groupBy("lang")
      .agg(sum(size(tokens(col("text"))).cast("long")).as("t"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val admitted = rs.map(_.getLong(2)).sum
      val (total, n) = langTotal(lang)
      // either the budget is reached (last admitted doc crosses it) or
      // the language simply ran out of documents
      assert(admitted >= math.min(5000L, total), s"$lang under-filled")
      if (total > 5000L) assert(rs.length < n, s"$lang should be trimmed")
    }
    // determinism: a second run admits the identical set
    val again = Pipeline.queries("q101_token_budget_fill")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_.getLong(0)).toSet)
  }

  test("winnow overlap: the guarantee holds on a planted span; kernel matches brute force") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q100win").toString
    val span = "alpha beta gamma delta epsilon zeta eta theta" // 8 >= w+k-1 = 7
    Seq(
      (1L, s"one two three $span four five", "s", "en", 0L),
      (2L, s"six seven $span eight nine ten eleven", "s", "en", 0L),
      (3L, "u v w x y z aa bb cc dd", "s", "en", 0L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q100_winnow_overlap")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a shared run of >= w+k-1 tokens must contribute a common fingerprint
    assert(rows(1L)._2 >= 1L, s"doc 1 must share a fingerprint: ${rows(1L)}")
    assert(rows(2L)._2 >= 1L)
    assert(rows(3L)._2 == 0L)
    // kernel vs brute-force winnowing on random token arrays
    import org.scalacheck.Gen
    def brute(toks: Array[String], k: Int, w: Int): Set[Long] = {
      val m = toks.length - k + 1
      if (m < w) return Set.empty
      val h = (0 until m).map(i => graft.expressions.SketchKernel.md5Lower64(
        toks.slice(i, i + k).mkString(" ").getBytes("UTF-8"))).toArray
      (0 to m - w).map(j =>
        (j until j + w).minBy(x => h(x) ^ Long.MinValue)).map(h).toSet
    }
    val gen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e")).map(_.toArray)
    Iterator.continually(gen.sample).flatten.take(300).foreach { toksArr =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toksArr.map(s => org.apache.spark.unsafe.types.UTF8String.fromString(s): Any))
      val got = graft.expressions.SketchKernel.winnowedFingerprints(arr, 4, 4)
      assert(got.toLongArray().toSet == brute(toksArr, 4, 4),
        s"toks=${toksArr.mkString(",")}")
    }
  }

  test("charStats kernel matches brute-force entropy on random unicode strings") {
    import org.scalacheck.Gen
    val gen = Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ', '的', 'é', 'ß')).map(_.mkString)
    Iterator.continually(gen.sample).flatten.take(300).foreach { s =>
      val got = graft.expressions.SketchKernel.charStats(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val cps = s.codePoints().toArray
      val counts = cps.groupBy(identity).view.mapValues(_.length).toMap
      assert(got.getDouble(0) == cps.length.toDouble)
      assert(got.getDouble(1) == counts.size.toDouble)
      val n = cps.length.toDouble
      val want = if (cps.isEmpty) 0.0
        else math.log(n) / math.log(2.0) -
          counts.toSeq.sortBy(_._1).map { case (_, c) =>
            c * (math.log(c.toDouble) / math.log(2.0)) }.sum / n
      assert(math.abs(got.getDouble(2) - want) < 1e-12, s"s=$s")
    }
  }

  test("ngramRunStats kernel matches brute-force counts on random token arrays") {
    import org.scalacheck.Gen
    val genToks = Gen.listOf(Gen.oneOf("a", "b", "ab", "ba", "x y", "")).map(_.toArray)
    val cases = Iterator.continually(genToks.sample).flatten.take(500)
    cases.foreach { toks =>
      (1 to 4).foreach { n =>
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          toks.map(s => org.apache.spark.unsafe.types.UTF8String.fromString(s): Any))
        val got = graft.expressions.SketchKernel.ngramRunStats(arr, n)
        val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
        val best = if (counts.isEmpty) 0L else counts.values.max
        val dup = counts.values.filter(_ > 1).sum
        assert(got.getLong(0) == best && got.getLong(1) == dup,
          s"toks=${toks.mkString("[", ",", "]")} n=$n got=(${got.getLong(0)},${got.getLong(1)}) want=($best,$dup)")
      }
    }
  }

  test("incremental dedup: probe flags copies, admits uniques, cap keeps reps") {
    import SparkSpec.spark.implicits._
    val shA = (1 to 10).map(i => s"g$i")
    val existing = Seq((1L, shA), (2L, shA), (3L, (1 to 10).map(i => s"x$i")))
      .toDF("doc_id", "sh")
    val newDocs = Seq((10L, shA), (20L, (1 to 10).map(i => s"z$i")))
      .toDF("doc_id", "sh")
    val got = Pipeline.incrementalDedup(newDocs, existing)
      .orderBy("new_doc").collect()
    assert(got.length == 2)
    assert(got(0).getLong(0) == 10L && got(0).getLong(1) == 2L
      && got(0).getLong(2) == 2L && got(0).getDouble(3) == 1.0
      && !got(0).getBoolean(4), s"copy row: ${got(0)}")
    assert(got(1).getLong(0) == 20L && got(1).getLong(1) == 0L
      && got(1).isNullAt(2) && got(1).isNullAt(3)
      && got(1).getBoolean(4), s"unique row: ${got(1)}")

    // a 70-copy clique past the 64-posting cap: the admit decision must
    // still flag (representatives survive in every band), with n_dups
    // degrading to the documented capped count
    val clique = (1L to 70L).map(i => (i, shA)).toDF("doc_id", "sh")
    val probe = Seq((100L, shA)).toDF("doc_id", "sh")
    val capped = Pipeline.incrementalDedup(probe, clique).collect()
    assert(capped.length == 1 && !capped(0).getBoolean(4), "must still flag")
    assert(capped(0).getLong(1) == 64L, s"capped count: ${capped(0)}")
    assert(capped(0).getLong(2) == 64L, "keep-first reps => best tie-break is doc 64")
  }

  test("apply vocab: positional ids, -1 OOV, exact counts") {
    import SparkSpec.spark.implicits._
    val docs = Seq((1L, "b a a c"), (2L, "z z"), (3L, "")).toDF("doc_id", "text")
    val got = Pipeline.applyVocab(docs, Seq("a", "b", "c"))
      .orderBy("doc_id").collect()
    assert(got(0).getString(1) == "1,0,0,2"
      && got(0).getLong(2) == 4L && got(0).getLong(3) == 0L)
    assert(got(1).getString(1) == "-1,-1"
      && got(1).getLong(2) == 2L && got(1).getLong(3) == 2L)
    // empty text tokenizes to [""] (the established split semantics):
    // one OOV token, same as the DuckDB oracle
    assert(got(2).getString(1) == "-1"
      && got(2).getLong(2) == 1L && got(2).getLong(3) == 1L)
  }

  test("mixture materialize: one epoch for the top lang, bounded repeats, key order") {
    val rows = Pipeline.queries("q109_mixture_materialize")(spark, sf).collect()
    val langN = Tables(spark, sf).documents.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nmax = langN.values.max
    // the commonest language runs exactly 1.0 epochs: one rep per doc
    val topLangs = langN.filter(_._2 == nmax).keySet
    rows.filter(r => topLangs(r.getString(1)))
      .groupBy(_.getLong(0)).values.foreach(rs => assert(rs.length == 1))
    // every language's total lands in [n*floor(e), n*ceil(e)]
    rows.groupBy(_.getString(1)).foreach { case (l, rs) =>
      val e = math.sqrt(nmax.toDouble / langN(l))
      assert(rs.length >= langN(l) * math.floor(e)
        && rs.length <= langN(l) * math.ceil(e),
        s"$l: ${rs.length} reps of ${langN(l)} docs at epochs $e")
      // rep indices are dense 0..n_reps-1 per doc
      rs.groupBy(_.getLong(0)).values.foreach { doc =>
        assert(doc.map(_.getLong(2)).sorted.sameElements(0L until doc.length))
      }
    }
    // the stream arrives in global shuffle-key order
    val keys = rows.map(_.getLong(3))
    assert(keys.sameElements(keys.sorted), "not in training order")
  }

  test("chunk windows: overlap, boundaries, and tail coverage are exact") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 2 chunks: [0,64) + [48,100)
      (2L, (1 to 64).map(i => s"t$i").mkString(" ")),  // exactly one window
      (3L, "a b c"),                                   // short doc: one short chunk
      (4L, (1 to 65).map(i => s"t$i").mkString(" ")))  // one past the window: 2 chunks
      .toDF("doc_id", "text")
    val got = Pipeline.chunkWindows(docs).orderBy("doc_id", "chunk_id").collect()
      .groupBy(_.getLong(0))
    val d1 = got(1L)
    assert(d1.length == 2)
    assert(d1(0).getLong(2) == 0L && d1(0).getLong(3) == 64L)
    assert(d1(1).getLong(2) == 48L && d1(1).getLong(3) == 52L)
    val c0 = d1(0).getString(4).split(" ")
    val c1 = d1(1).getString(4).split(" ")
    // 16-token overlap: chunk 0's tokens 49..64 are chunk 1's 1..16
    assert(c0.slice(48, 64).sameElements(c1.slice(0, 16)))
    assert(c1.last == "t100", "tail token must be covered")
    assert(got(2L).length == 1 && got(2L)(0).getLong(3) == 64L)
    assert(got(3L).length == 1 && got(3L)(0).getLong(3) == 3L
      && got(3L)(0).getString(4) == "a b c")
    val d4 = got(4L)
    assert(d4.length == 2 && d4(1).getLong(2) == 48L && d4(1).getLong(3) == 17L)
    // chunks cover every token exactly once modulo the declared overlap
    assert(d4(0).getLong(3) + d4(1).getLong(3) == 65L + 16L)
  }

  test("kmeans: planted satellites land on their anchor's cluster") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q114km").toString
    // 8 orthogonal anchors (vec_id 0..7 = the deterministic init) and
    // 16 satellites, each a slightly-perturbed copy of anchor id%8.
    def anchor(j: Int) = Array.tabulate(64)(i => if (i == j * 8) 1.0f else 0.0f)
    val vecs = (0 until 8).map(j => (j.toLong, anchor(j))) ++
      (8 until 24).map { i =>
        val a = anchor(i % 8).clone(); a(63) = 0.01f * (i % 3 + 1); (i.toLong, a)
      }
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Pipeline.queries("q114_kmeans_cluster")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 24)
    rows.foreach { case (id, cl, dist) =>
      assert(cl == id % 8, s"vec $id assigned to $cl")
      assert(dist >= 0L)
    }
    // the full corpus: a total assignment into the 8 initial clusters
    val corpus = Pipeline.queries("q114_kmeans_cluster")(spark, sf).collect()
    assert(corpus.length == Tables(spark, sf).embeddings.count())
    assert(corpus.forall(r => r.getLong(1) >= 0L && r.getLong(1) < 8L))
  }

  test("semantic decontaminate: an eval copy is flagged at cos 1, orthogonal is clean") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q115sd").toString
    val e1 = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(64)(i => if (i == 7) 1.0f else 0.0f)
    // vec 0 is the eval split (id % 20 == 0); vec 1 copies it, vec 2 is
    // orthogonal. The copy shares vec 0's cell, so the probe must hit.
    Seq((0L, e1), (1L, e1), (2L, e2))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Pipeline.queries("q115_semantic_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(!rows.contains(0L), "eval vectors are not corpus rows")
    assert(rows(1L) == ((1L, 1.0, true)), rows(1L).toString)
    assert(rows(2L) == ((0L, 0.0, false)), rows(2L).toString)
    // corpus invariants: flags and hit counts agree
    val corpus = Pipeline.queries("q115_semantic_decontaminate")(spark, sf).collect()
    assert(corpus.forall(r => r.getBoolean(3) == (r.getLong(1) > 0L)))
    assert(corpus.forall(r => r.getLong(0) % 20 != 0L))
  }

  test("quality classifier: integer scores are length-normalized and repetition-invariant") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q116qc").toString
    Seq((1L, "alpha", "s", "en", 5L), (2L, "alpha alpha alpha", "s", "en", 17L),
      (3L, "alpha beta", "s", "en", 10L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q116_quality_classifier")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val (n1, raw1, s1, a1) = rows(1L)
    assert(n1 == 1L && raw1 >= -1024L && raw1 <= 1023L)
    assert(s1 == raw1.toDouble && a1 == (s1 >= 0.0))
    // 3x the same token: raw sum scales, normalized score does not
    assert(rows(2L)._2 == 3L * raw1)
    assert(rows(2L)._3 == s1)
    // two tokens: sum of the individual weights, halved by length
    val rawBeta = rows(3L)._2 - raw1
    assert(rows(3L)._3 == BigDecimal((raw1 + rawBeta) / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // scores are bit-stable: a second run returns the identical map
    val again = Pipeline.queries("q116_quality_classifier")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows.view.mapValues(_._3).toMap == again)
  }

  test("pq ann: codes reconstruct exactly for codebook vectors; adc orders sanely") {
    val rows = Pipeline.queries("q118_pq_ann")(spark, sf).collect()
    // 10 queries x top-5, ranks total per query, self-free
    assert(rows.length == 50)
    rows.groupBy(_.getLong(0)).foreach { case (qid, g) =>
      assert(g.map(_.getLong(1)).sorted.sameElements(1L to 5L), s"ranks for $qid")
      assert(g.forall(_.getLong(2) != qid), "self must be excluded")
      // adc (exact integer) is non-decreasing in rank
      val byRank = g.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
      assert(byRank.forall(_ >= 0L), "squared distance is non-negative")
    }
    // PQ recall sanity vs the exact brute-force top-5 (q36 semantics):
    // approximate search must recover a nontrivial share of true
    // neighbors on the fixture (loose bound — PQ with a blind codebook)
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, sf).embeddings
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
      .withColumn("ss", graft.functions.dot_product(col("emb"), col("emb")))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("emb").as("qe"), col("ss").as("qss"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", graft.functions.dot_product(col("qe"), col("emb")) /
        (sqrt(col("qss")) * sqrt(col("ss"))))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"pq recall collapsed: $recall")
  }

  test("pq_codes kernel == the struct-least expression form (argmin + lowest-cl tie)") {
    // the r15 kernel replaced 8 subspaces x |cl| struct-least zip_with
    // aggregates per row; this pins bit-identical argmin INCLUDING the
    // tie rule (equal distance -> lowest cl) on a planted tie: two
    // centroids equidistant from a probe vector
    val cents: IndexedSeq[Seq[(Long, Array[Long])]] = IndexedSeq.tabulate(8) { st =>
      Seq(3L -> Array.fill(8)(st + 2L), 7L -> Array.fill(8)(st.toLong),
        11L -> Array.fill(8)(st + 4L))
        .sortBy(_._1)
    }
    // probe at st+1 per dim: distance 1*8 to cl=3 (st+2) and cl=7 (st)
    // in every subspace -> tie, lowest cl (3) must win; second probe
    // sits exactly on cl=11
    val df = spark.range(2).selectExpr(
      "CASE WHEN id = 0 THEN transform(sequence(1, 64), i -> CAST((i - 1) DIV 8 + 1 AS BIGINT)) " +
        "ELSE transform(sequence(1, 64), i -> CAST((i - 1) DIV 8 + 4 AS BIGINT)) END AS qv")
    val flat = typedlit(cents.map(sub => sub.flatMap { case (cl, v) => cl +: v.toSeq }))
    val kernel = df.select(graft.functions.pq_codes(col("qv"), flat, 8).as("c"))
      .collect().map(_.getSeq[Long](0))
    def sqL(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = x * x
    val exprForm = df.select(array((0 until 8).map { st =>
      val sub = slice(col("qv"), st * 8 + 1, 8)
      least(cents(st).map { case (cl, v) =>
        struct(aggregate(zip_with(sub, lit(v), (a, b) => sqL(a - b)),
          lit(0L), (acc, x) => acc + x).as("d"), lit(cl).as("c"))
      }: _*).getField("c")
    }: _*).as("c")).collect().map(_.getSeq[Long](0))
    assert(kernel.toSeq.map(_.toSeq) == exprForm.toSeq.map(_.toSeq))
    assert(kernel(0).forall(_ == 3L), "tie must keep the lowest cl")
    assert(kernel(1).forall(_ == 11L), "exact hit must pick its centroid")
  }

  test("corpus diff: statuses partition the id space by construction") {
    val rows = Pipeline.queries("q119_corpus_diff")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val n = Tables(spark, sf).documents.count()
    assert(rows.size == n, "full outer join covers every doc in either snapshot")
    rows.foreach { case (id, st) =>
      val expect =
        if (id % 10 == 0) "added"           // absent from old
        else if (id % 10 == 1) "removed"    // absent from new
        else if (id % 7 == 3) "changed"     // draft suffix in old
        else "unchanged"
      assert(st == expect, s"doc $id: $st != $expect")
    }
  }

  test("curation v2: the fused DAG agrees with its standalone stages") {
    val rows = Pipeline.queries("q126_curation_v2")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet.subsetOf(Set("train", "valid", "test")) && rows.nonEmpty)
    // recompose from the standalone operators: q116's accepted docs,
    // q117 semantics re-run on that subset, q83's split thresholds
    val accepted = Pipeline.queries("q116_quality_classifier")(spark, sf)
      .filter(col("accept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val gatedDocs = Tables(spark, sf).documents
      .filter(col("doc_id").isInCollection(accepted))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk")).orderBy(col("doc_id"), col("idx"))
    val expect = Pipeline.docBlocks(gatedDocs)
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(array_sort(collect_list(
        when(col("rn") === 1, struct(col("idx"), col("blk"))))),
        _.getField("blk")), " ").as("clean"))
      .filter(length(col("clean")) > 0)
      .select(col("doc_id"),
        size(tokens(col("clean"))).cast("long").as("n_tok"),
        (md5_lower64(concat(lit("split:"), col("doc_id").cast("string"))
          .cast("binary")).bitwiseAND(lit(1023L))).as("bucket"))
      .collect().map { r =>
        val split = if (r.getLong(2) < 819) "train"
          else if (r.getLong(2) < 922) "valid" else "test"
        (split, r.getLong(1))
      }
    val bySplit = expect.groupBy(_._1)
      .map { case (sp, xs) => sp -> ((xs.length.toLong, xs.map(_._2).sum)) }
    assert(rows == bySplit, s"$rows vs $bySplit")
    // the gate dropped something and the rewrite dropped blocks, or the
    // fixture would make this test vacuous
    assert(accepted.size < Tables(spark, sf).documents.count())
  }

  test("shard manifest: totals conserve the corpus and the digest is order-free") {
    val rows = Pipeline.queries("q125_shard_manifest")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet.subsetOf((0L until 64L).toSet))
    val docs = Tables(spark, sf).documents
    assert(rows.map(_._2).sum == docs.count(), "every doc lands in exactly one shard")
    val totTok = docs.select(sum(size(tokens(col("text"))).cast("long"))).head().getLong(0)
    assert(rows.map(_._3).sum == totTok, "token totals conserve")
    // order independence: recomputing over a shuffled corpus gives the
    // identical manifest (the digest is a commutative integer sum)
    val dir = java.nio.file.Files.createTempDirectory("q125sm").toString
    docs.orderBy(rand(42)).coalesce(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val again = Pipeline.queries("q125_shard_manifest")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("quantile sketch: estimates sit within one bucket width below the exact value") {
    val rows = Pipeline.queries("q124_quantile_sketch")(spark, sf).collect()
    assert(rows.nonEmpty)
    val vals = Tables(spark, sf).events.agg(
      min(col("value")), max(col("value"))).head()
    val width = (vals.getDouble(1) - vals.getDouble(0)) / 256
    // the sketch's RANK contract: the estimate is the lower edge of the
    // bucket holding the ceil(p*n)-th discrete order statistic (value
    // error then depends only on bucket width, not data distribution)
    val byType = Tables(spark, sf).events.select(col("event_type"), col("value"))
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getDouble(1)).sorted }
    rows.foreach { r =>
      val sortedVals = byType(r.getString(0))
      assert(r.getLong(1) == sortedVals.length)
      for ((p, i) <- Seq(0.5 -> 2, 0.9 -> 4, 0.99 -> 6)) {
        val est = r.getDouble(i)
        val disc = sortedVals(math.ceil(p * sortedVals.length).toInt - 1)
        assert(est <= disc + 1e-6 && disc <= est + width + 1e-6,
          s"${r.getString(0)} p$p: stat $disc outside [$est, ${est + width}]")
      }
      // estimates and exact percentiles are monotone in p
      assert(r.getDouble(2) <= r.getDouble(4) && r.getDouble(4) <= r.getDouble(6))
      assert(r.getDouble(3) <= r.getDouble(5) && r.getDouble(5) <= r.getDouble(7))
    }
  }

  private def plantedPixel(seed: Long, idx: Long, bright: Long): Long =
    (((seed + idx) * 2654435761L) % 256L + bright) % 256L

  test("multimodal frames: stride-2 scanline sampling over REAL decoded pixels") {
    val rows = Pipeline.queries("q123_multimodal_frames")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val want = Tables(spark, sf).documents.select(col("doc_id")).collect()
      .map(_.getLong(0)).sorted.toSeq.flatMap { id =>
        val w = 32 + id % 32; val h = 16 + id % 16
        (0L until h).filter(_ % 2 == 0).map { y =>
          val px = (0L until w).map(x => plantedPixel(id, y * w + x, 0L))
          (id, y / 2, y, w, px.sum, px.min, px.max)
        }
      }
    assert(rows.length == want.length)
    assert(rows == want, "every sampled frame recomputed without either codec side")
  }

  test("image row stats: brute decode-free recompute from doc_id") {
    val got = Pipeline.queries("q222_image_row_stats")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    val want = Tables(spark, sf).documents.select(col("doc_id")).collect()
      .map(_.getLong(0)).filter(_ % 3 == 0).sorted.toSeq.flatMap { id =>
        val w = 16 + id % 16; val h = 8 + id % 8
        (0L until h).map { y =>
          val px = (0L until w).map(x => plantedPixel(id, y * w + x, 0L))
          (id, w, h, y, w, px.sum, px.min, px.max)
        }
      }
    assert(got.length == want.length)
    assert(got == want, "every scanline recomputed without either codec side")
  }

  test("image dhash near-dup: brute banding over independently decoded hashes") {
    // recompute each doc's dHash by calling the DECODER directly on the
    // encoder's bytes, re-band, re-cap at 64, re-pair — the full pipeline
    // replayed driver-side, then compared as a set
    val got = Pipeline.queries("q223_image_dhash_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ids = Tables(spark, sf).documents.select(col("doc_id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    val sigs = ids.map { id =>
      val gid = id / 8
      val p = graft.expressions.MediaKernel.pngEncodeGray(
        gid % 16 + 16, gid % 8 + 8, gid, (id % 8) * 3)
      id -> graft.expressions.MediaKernel.pngDhash(p).longValue()
    }.toMap
    val buckets = sigs.toSeq.flatMap { case (id, sig) =>
      (0 until 4).map(b => ((b, (sig >>> (b * 16)) & 0xffffL), id))
    }.groupBy(_._1).values
    val want = buckets.flatMap { members =>
      val kept = members.map(_._2).sorted.take(64)
      for (a <- kept; b <- kept if a < b) yield (a, b)
    }.toSet.map { p: (Long, Long) =>
      (p._1, p._2, java.lang.Long.bitCount(sigs(p._1) ^ sigs(p._2)).toLong)
    }.filter(_._3 <= 12L)
    assert(got == want, s"pair sets diverge: ${got.size} vs ${want.size}")
    // the plant guarantees work to do: same-group docs differ only by
    // brightness, so near-dup pairs exist, and cross-group images are
    // far enough apart that not everything pairs
    assert(got.nonEmpty)
    assert(got.size < ids.size * (ids.size - 1) / 2)
    // every same-group pair that banding surfaced has LOW hamming
    got.filter(p => p._1 / 8 == p._2 / 8).foreach { p =>
      assert(p._3 <= 12L)
    }
  }

  private def plantedJpegBlock(seed: Long, bw: Long, x: Long, y: Long,
      bright: Long): Long = {
    val v = (seed + (y / 8) * bw + x / 8) % 32768L
    ((((v * v + v) * 2654435761L) >> 16) % 256L + bright) % 256L
  }

  test("jpeg row stats: brute decode-free recompute from doc_id") {
    val got = Pipeline.queries("q242_jpeg_row_stats")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    val want = Tables(spark, sf).documents.select(col("doc_id")).collect()
      .map(_.getLong(0)).filter(_ % 3 == 1).sorted.toSeq.flatMap { id =>
        val w = 16 + id % 16; val h = 8 + id % 8; val bw = (w + 7) / 8
        (0L until h).map { y =>
          val px = (0L until w).map(x => plantedJpegBlock(id, bw, x, y, 0L))
          (id, w, h, y, w, px.sum, px.min, px.max)
        }
      }
    assert(got.length == want.length)
    assert(got == want,
      "every scanline recomputed without Huffman, IDCT or either codec side")
  }

  test("jpeg dhash near-dup: brute banding over independently decoded hashes") {
    // the q223 replay with the payload swapped to baseline JPEG: each
    // dHash recomputed by running the DECODER directly on the
    // encoder's bytes, then re-band, re-cap, re-pair driver-side
    val got = Pipeline.queries("q243_jpeg_dhash_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ids = Tables(spark, sf).documents.select(col("doc_id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    val sigs = ids.map { id =>
      val gid = id / 8
      val p = graft.expressions.MediaKernel.jpegEncodeGrayFlat(
        (gid % 4 + 9) * 8, (gid % 4 + 3) * 8, gid, (id % 8) * 3)
      id -> graft.expressions.MediaKernel.imageDhash(p).longValue()
    }.toMap
    val buckets = sigs.toSeq.flatMap { case (id, sig) =>
      (0 until 4).map(b => ((b, (sig >>> (b * 16)) & 0xffffL), id))
    }.groupBy(_._1).values
    val want = buckets.flatMap { members =>
      val kept = members.map(_._2).sorted.take(64)
      for (a <- kept; b <- kept if a < b) yield (a, b)
    }.toSet.map { p: (Long, Long) =>
      (p._1, p._2, java.lang.Long.bitCount(sigs(p._1) ^ sigs(p._2)).toLong)
    }.filter(_._3 <= 12L)
    assert(got == want, s"pair sets diverge: ${got.size} vs ${want.size}")
    assert(got.nonEmpty)
    // the quadratic block plant separates groups: every surfaced pair
    // is WITHIN a group (cross-group hamming stays far above 12)
    got.foreach(p => assert(p._1 / 8 == p._2 / 8,
      s"cross-group pair ${p._1}, ${p._2} at hamming ${p._3}"))
  }

  test("banded-Hamming RECALL CONTRACT: d <= 3 always surfaces; d >= 4 can be missed") {
    // The 4 x 16-bit exact-match banding behind q38/q223/q243
    // pigeonhole-guarantees a clean band only for Hamming distance
    // <= 3 (4 errors can touch all 4 bands). This pins the envelope
    // ADVERSARIALLY instead of leaving it implied: a planted pair at
    // d = 4 with one flipped bit in EVERY band shares no band key and
    // is DOCUMENTED-MISSED by both engines identically (the oracle
    // replays the same banding); a d = 3 pair always shares >= 1
    // clean band, whatever bits the errors touch.
    val session = spark
    import session.implicits._
    def bandPairs(sigs: Seq[(Long, Long)]): Set[(Long, Long)] = {
      val df = sigs.toDF("doc_id", "sig")
      val bands = df.select(col("doc_id"), col("sig"),
        explode(expr(
          """transform(sequence(0, 3), b -> struct(b AS band_id,
            shiftrightunsigned(sig, cast(b * 16 AS int)) & 65535 AS key))""")).as("bd"))
      bands.select(col("bd.band_id").as("band_id"), col("bd.key").as("key"),
          col("doc_id"))
        .as("a").join(bands.select(col("bd.band_id").as("band_id"),
          col("bd.key").as("key"), col("doc_id")).as("b"),
          Seq("band_id", "key"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val base = 0x5a5a_1234_9abc_def0L
    // d = 4, one bit flipped inside each 16-bit band: NO band survives
    val spread4 = base ^ ((1L << 3) | (1L << 17) | (1L << 40) | (1L << 55))
    assert(java.lang.Long.bitCount(base ^ spread4) == 4)
    assert(bandPairs(Seq((1L, base), (2L, spread4))).isEmpty,
      "a d=4 all-bands pair is (by the documented contract) MISSED")
    // d = 12, three bits flipped in each band: also missed — the
    // contract failure regime extends through the verify threshold
    val spread12 = base ^ (0x7L << 2) ^ (0x7L << 18) ^ (0x7L << 34) ^ (0x7L << 50)
    assert(java.lang.Long.bitCount(base ^ spread12) == 12)
    assert(bandPairs(Seq((1L, base), (2L, spread12))).isEmpty)
    // d = 3: whatever 3 bands the errors hit, >= 1 of 4 bands is clean
    // — exhaustively, every 3-bit error pattern across band boundaries
    for (bits <- Seq(Seq(0, 1, 2), Seq(0, 16, 32), Seq(15, 16, 63),
        Seq(5, 25, 45), Seq(48, 55, 63))) {
      val d3 = bits.foldLeft(base)((s, b) => s ^ (1L << b))
      assert(java.lang.Long.bitCount(base ^ d3) == 3)
      assert(bandPairs(Seq((1L, base), (2L, d3))) == Set((1L, 2L)),
        s"d=3 pair with errors at $bits must always surface")
    }
  }

  test("sliding hll: every day's estimate equals a direct register build on its window") {
    val got = Pipeline.queries("q228_sliding_hll_7day")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val ev = Tables(spark, sf).events
    val ud = ev.select(Tables.eventMicros(ev).as("tus"), col("user_id"))
      .collect().map(r => (r.getLong(0) / 86400000000L, r.getLong(1)))
      .distinct.toSeq
    val days = ud.map(_._1).distinct.sorted
    def smear(w0: Long): Long =
      Seq(1, 2, 4, 8, 16, 32).foldLeft(w0)((w, k) => w | (w >>> k))
    def est(users: Iterable[Long]): Double = {
      val regs = new Array[Long](256)
      users.foreach { u =>
        val h = graft.expressions.SketchKernel.md5Lower64(
          s"uhll:$u".getBytes("UTF-8"))
        val idx = (h & 255L).toInt
        val rho = 49L - java.lang.Long.bitCount(smear((h >>> 8) & 281474976710655L))
        regs(idx) = math.max(regs(idx), rho)
      }
      val s = regs.map(m => if (m == 0) 562949953421312L else 1L << (49 - m)).sum
      val nr = regs.count(_ > 0)
      val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 562949953421312.0 / s
      val e = if (nr < 256 && raw <= 640.0)
        256.0 * math.log(256.0 / (256 - nr)) else raw
      // Spark's round() is HALF_UP, not rint's HALF_EVEN
      BigDecimal(e).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = days.map { d =>
      val win = ud.filter(t => t._1 >= d - 6 && t._1 <= d).map(_._2)
      (d, win.distinct.size.toLong, est(win))
    }
    assert(got == want,
      "window-merged registers diverge from a direct build on each window")
    // and the estimate is inside HLL's error envelope on every day
    got.foreach { case (d, exact, e) =>
      assert(math.abs(e - exact) / exact < 0.26, s"day $d: $e vs $exact")
    }
  }

  test("hll distinct: estimate tracks the exact audit within sketch error") {
    val rows = Pipeline.queries("q121_hll_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(2), r.getDouble(3))
      assert(exact > 0 && est > 0)
      // m=256 raw HLL: 1.04/sqrt(256) ~ 6.5% std error; allow 4 sigma
      val rel = math.abs(est - exact) / exact
      assert(rel < 0.26, s"${r.getString(0)}: est $est vs exact $exact ($rel)")
      assert(r.getLong(1) >= exact, "token occurrences >= distinct tokens")
    }
    // determinism: a rerun yields the identical estimates
    val again = Pipeline.queries("q121_hll_distinct")(spark, sf).collect()
    assert(rows.map(_.getDouble(3)).toSeq == again.map(_.getDouble(3)).toSeq)
  }

  test("hll small-range: planted low-cardinality corpus takes the linear-counting branch") {
    // ~40 distinct shingles per source: raw estimate lands far below
    // the 2.5m=640 floor with most registers empty, so the estimate
    // must be the Flajolet linear-counting value m*ln(m/V) exactly —
    // and at this density it is sharply more accurate than raw HLL.
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q121lc").toString
    (0 until 20).map(i =>
        (i.toLong, (0 until 12).map(j => s"w${(i * 7 + j) % 30}").mkString(" "),
          "en", s"src${i % 2}", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q121_hll_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(2), r.getDouble(3))
      assert(exact < 640, "fixture must sit in the small-range regime")
      // recompute the linear-counting branch from the register count:
      // V>0 guaranteed at this cardinality (exact << 256)
      val rel = math.abs(est - exact) / exact
      assert(rel < 0.10, s"${r.getString(0)}: linear counting should be " +
        s"sharp at this density; est $est vs exact $exact ($rel)")
      // the value must be of the form 256*ln(256/V) for integer V
      val v = math.round(256.0 / math.exp(est / 256.0))
      val expected = BigDecimal(256.0 * math.log(256.0 / v))
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(est == expected, s"est $est is not a linear-counting value (V=$v)")
    }
  }

  test("cms heavy hitters: estimates never undercount and top-1 is the true max") {
    val rows = Pipeline.queries("q122_cms_heavy_hitters")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val vocab = Tables(spark, sf).documents
      .select(explode(tokens(col("text"))).as("tok")).distinct().count()
    assert(rows.length == math.min(50L, vocab))
    assert(rows.map(_._1).sorted.sameElements(1L to rows.length.toLong))
    rows.foreach { case (_, tok, exact, est, over) =>
      assert(est >= exact, s"CMS undercounted '$tok': $est < $exact")
      assert(over == est - exact)
    }
    // exact counts are rank-ordered descending
    val ex = rows.sortBy(_._1).map(_._3)
    assert(ex.zip(ex.tail).forall { case (a, b) => a >= b })
    // the true modal token's estimate is at least its exact count and
    // its exact count is the global max
    val docs = Tables(spark, sf).documents
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").count().orderBy(col("count").desc).limit(1).collect()
    assert(rows.minBy(_._1)._3 == docs(0).getLong(1))
  }

  test("hybrid rrf: fusion is consistent with its arms and favors dual hits") {
    val rows = Pipeline.queries("q120_hybrid_rrf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, g) =>
      // ranks total, rrf non-increasing in rank
      assert(g.map(_._2).sorted.sameElements(1L to g.length.toLong))
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._6).zip(byRank.tail.map(_._6)).forall { case (a, b) => a >= b })
      g.foreach { case (_, _, id, lr, sr, rrf) =>
        assert(id != qid, "self never retrieved")
        assert(lr > 0 || sr > 0, "a fused row must come from at least one arm")
        // rrf is exactly the sum of its arms' reciprocal terms
        val expect = BigDecimal(
          (if (lr > 0) 1.0 / (60 + lr) else 0.0) +
            (if (sr > 0) 1.0 / (60 + sr) else 0.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(rrf - expect) < 1e-9, s"q$qid id$id: $rrf != $expect")
      }
      // a doc in BOTH top-20s always outranks a doc in exactly one arm:
      // worst dual score 2/(60+20) = 0.025 > best single 1/61 = 0.0164
      val dual = g.filter(r => r._4 > 0 && r._5 > 0).map(_._6)
      val single = g.filter(r => (r._4 == 0) ^ (r._5 == 0)).map(_._6)
      if (dual.nonEmpty && single.nonEmpty)
        assert(dual.min > single.max)
    }
  }

  test("block dedup: later copies drop, first stays, text reassembles in order") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q117bd").toString
    val blk0 = (1 to 16).map(i => s"t$i").mkString(" ")
    val blk1 = (17 to 32).map(i => s"t$i").mkString(" ")
    val uniq = (1 to 16).map(i => s"u$i").mkString(" ")
    val rep = (1 to 16).map(i => s"r$i").mkString(" ")
    Seq((1L, s"$blk0 $blk1", "s", "en", 0L),   // original, 2 blocks
      (2L, s"$blk0 $uniq", "s", "en", 0L),     // copies doc 1's block 0
      (3L, s"$rep $rep", "s", "en", 0L),       // repeats its own block
      (4L, "tail only", "s", "en", 0L))        // short partial block
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q117_block_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(1L) == ((2L, 0L, s"$blk0 $blk1")), "first carrier untouched")
    assert(rows(2L) == ((2L, 1L, uniq)), "cross-doc copy removed")
    assert(rows(3L) == ((2L, 1L, rep)), "within-doc repeat removed")
    assert(rows(4L) == ((1L, 0L, "tail only")), "partial block kept verbatim")
    // corpus invariant: cleaned token count = total - 16 * dropped blocks
    // only for full blocks; cheaper global check: n_dropped <= n_blocks
    val corpus = Pipeline.queries("q117_block_dedup")(spark, sf).collect()
    assert(corpus.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(corpus.length == Tables(spark, sf).documents.count())
  }

  test("bpe_apply: greedy left-to-right merge semantics (reference BPE loop)") {
    val session = spark
    import session.implicits._
    def seg(w: String, merges: (String, String)*): Seq[String] =
      Seq(w).toDF("w").select(graft.functions.bpe_apply(col("w"),
        typedlit(merges.map(_._1)), typedlit(merges.map(_._2))).as("s"))
        .head().getSeq[String](0)
    assert(seg("hello") == Seq("h", "e", "l", "l", "o"), "no merges = chars")
    assert(seg("hello", ("l", "l")) == Seq("h", "e", "ll", "o"))
    // overlap: runs merge non-overlapping, left to right
    assert(seg("aaa", ("a", "a")) == Seq("aa", "a"))
    assert(seg("aaaa", ("a", "a")) == Seq("aa", "aa"))
    assert(seg("aaaa", ("a", "a"), ("aa", "aa")) == Seq("aaaa"))
    // rank order matters: later merges see earlier merges' symbols
    assert(seg("abab", ("a", "b"), ("ab", "ab")) == Seq("abab"))
    assert(seg("abab", ("b", "a")) == Seq("a", "ba", "b"))
  }

  test("bpe train: planted corpus learns the hand-computed merge table") {
    // word types: "aaa" freq 2, "ab" freq 1.
    //  round 1: pairs (a,a) cnt 4 (two per "aaa" occurrence-type x2),
    //           (a,b) cnt 1 -> merge (a,a).
    //  round 2: "aaa"->[aa,a]: pair (aa,a) cnt 2; (a,b) 1 -> (aa,a).
    //  round 3: "aaa"->[aaa]: only (a,b) 1 -> (a,b).
    //  round 4+: no pairs anywhere -> training stops early (the
    //            oracle's empty m_r has no rank row; both sides emit 3).
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q130bpe").toString
    Seq((1L, "aaa aaa ab", "en", "s0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q130_bpe_train")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, "a", "a", 4L), (2L, "aa", "a", 2L), (3L, "a", "b", 1L)))
    // determinism under physical layout on the real fixture
    val full = Pipeline.queries("q130_bpe_train")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(full.length == 6)
    val dir2 = java.nio.file.Files.createTempDirectory("q130det").toString
    Tables(spark, sf).documents.orderBy(rand(11)).repartition(5)
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val again = Pipeline.queries("q130_bpe_train")(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(full.toSeq == again.toSeq, "merge table must not depend on layout")
    // tokenize: compression ratio >= 1 everywhere (merges only shrink)
    val tk = Pipeline.queries("q131_bpe_tokenize")(spark, sf).collect()
    assert(tk.nonEmpty)
    tk.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "bpe tokens <= chars")
      assert(r.getDouble(4) >= 1.0)
    }
  }

  test("dsir: target-like docs outrank off-domain docs, layout-deterministic") {
    val session = spark
    import session.implicits._
    // target = min(source) = "a" (all-x). With Laplace smoothing over
    // 256 buckets: llr(x) = ln(5/260) - ln(8/269) ~= -0.435,
    // llr(y) = ln(1/260) - ln(7/269) ~= -1.913 (x and y land in
    // different md5 buckets w.h.p.; asserted via the ordering). Per-doc
    // avg llr then orders 1 (all x) > 2 (xxy) > 4 (xy) > 3 (all y).
    val dir = java.nio.file.Files.createTempDirectory("q132dsir").toString
    Seq((1L, "x x x x", "en", "a", 7L), (2L, "x x y", "en", "b", 5L),
      (3L, "y y y y", "en", "b", 7L), (4L, "x y", "en", "b", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q132_dsir_select")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 3L))
    assert(rows.map(_.getDouble(2)).toSeq == rows.map(_.getDouble(2)).sortBy(-_).toSeq)
    // hand-check doc 1's avg llr: every token is x
    val llrX = math.log(5.0 / 260.0) - math.log(8.0 / 269.0)
    assert(math.abs(rows(0).getDouble(2) - llrX) < 1e-6)
    // fixture: top-100 of 500 docs, scores monotone, layout-free
    val full = Pipeline.queries("q132_dsir_select")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(full.length == 100)
    assert(full.map(_._3).toSeq == full.map(_._3).sortBy(-_).toSeq)
    val dir2 = java.nio.file.Files.createTempDirectory("q132det").toString
    Tables(spark, sf).documents.orderBy(rand(7)).repartition(5)
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val again = Pipeline.queries("q132_dsir_select")(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(full.toSeq == again.toSeq, "selection must not depend on layout")
  }

  test("dsir: kernel scoring is bit-identical to the HOF fold") {
    val llr = Pipeline.dsirLlrCached(spark, sf)
    val docs = Tables(spark, sf).documents
    val a = Pipeline.dsirScore(docs, llr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = Pipeline.dsirScoreHof(docs, llr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("bpe tokenize: type rollup equals per-occurrence form") {
    val a = Pipeline.queries("q131_bpe_tokenize")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val b = Pipeline.bpeTokenizeOcc(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(a.toSeq == b.toSeq)
  }

  test("jl projection: exact components, JL-bounded angle distortion, layout-free") {
    val rows = Pipeline.queries("q134_jl_project")(spark, sf).collect()
    val n = Tables(spark, sf).embeddings.count()
    assert(rows.length == n)
    // hand-recompute vector 0's component p0 from first principles
    val emb0 = Tables(spark, sf).embeddings.filter(col("vec_id") === 0L)
      .head().getSeq[Float](1)
    val p0 = (0 until 64).map { i =>
      val sign = if ((graft.expressions.SketchKernel.md5Lower64(
        s"jl:0:$i".getBytes("UTF-8")) & 1L) == 0L) 1L else -1L
      sign * math.floor(emb0(i).toDouble * 10000d + 0.5).toLong
    }.sum
    assert(rows(0).getLong(1) == p0)
    // distortion audit over the 32 lowest vec_ids' 496 pairs: cosine
    // in 64-d vs projected 16-d. Achlioptas +-1 at m=16 gives per-pair
    // std ~ 1/sqrt(m) = 0.25; measured mean |err| is ~0.20 on the
    // fixture — assert the JL bound holds with slack
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val m = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (m == 0) 0.0 else d / m
    }
    val emb = Tables(spark, sf).embeddings.filter(col("vec_id") < 32)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble)).toMap
    val proj = rows.filter(_.getLong(0) < 32).map(r =>
      r.getLong(0) -> (1 to 16).map(r.getLong(_).toDouble)).toMap
    val errs = for {
      a <- emb.keys.toSeq.sorted; b <- emb.keys.toSeq.sorted if a < b
    } yield math.abs(cos(emb(a), emb(b)) - cos(proj(a), proj(b)))
    assert(errs.sum / errs.length < 0.25,
      s"mean cosine distortion ${errs.sum / errs.length} exceeds the JL bound")
    // layout determinism: integer arithmetic cannot depend on partitioning
    val again = Pipeline.queries("q134_jl_project")(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("cohort retention: matrix invariants hold and offset 0 covers every user") {
    val rows = Pipeline.queries("q138_cohort_retention")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "offsets are non-negative")
    // every user appears in their cohort's offset-0 cell (first-seen
    // day IS activity), so offset-0 counts sum to the user universe
    val users = Tables(spark, sf).events
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rows.filter(_._2 == 0).map(_._3).sum == users)
    // a cohort's later-offset cell can never exceed its offset-0 cell
    val day0 = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(rows.forall(r => r._3 <= day0(r._1)))
  }

  test("event transitions: planted timelines, rows sum to 1") {
    val session = spark
    import session.implicits._
    def ev(id: Long, u: Long, t: Long, ty: String) =
      (id, new java.sql.Timestamp(t), u, ty, 1.0, "{}")
    // u1: view->click->view->purchase, u2: view->view
    val dir = java.nio.file.Files.createTempDirectory("q141tr").toString
    Seq(ev(1, 1, 1000, "view"), ev(2, 1, 2000, "click"),
      ev(3, 1, 3000, "view"), ev(4, 1, 4000, "purchase"),
      ev(5, 2, 1000, "view"), ev(6, 2, 2000, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Pipeline.queries("q141_event_transitions")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // from=view has 3 transitions (u1's two + u2's one) -> 1/3 each
    assert(rows == Map(
      ("view", "click") -> ((1L, 0.333333)), ("view", "purchase") -> ((1L, 0.333333)),
      ("view", "view") -> ((1L, 0.333333)), ("click", "view") -> ((1L, 1.0))))
    // fixture: each from-row's probabilities sum to ~1
    val full = Pipeline.queries("q141_event_transitions")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    full.groupBy(_._1).foreach { case (_, ps) =>
      assert(math.abs(ps.map(_._2).sum - 1.0) < 1e-4)
    }
  }

  test("rolling actives: hand-computed trailing window, wau bounds dau") {
    val session = spark
    import session.implicits._
    def ev(id: Long, u: Long, day: Long) =
      (id, new java.sql.Timestamp(day * 86400000L + 1000), u, "view", 1.0, "{}")
    // u1 active d0 and d3, u2 active d0: DAU d0=2 d3=1;
    // WAU(d0)={u1,u2}=2, WAU(d3) covers d-3..d3 -> both users = 2
    val dir = java.nio.file.Files.createTempDirectory("q140ra").toString
    Seq(ev(1, 1, 0), ev(2, 1, 3), ev(3, 2, 0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Pipeline.queries("q140_rolling_active")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byDay = rows.map(r => r._1 -> r).toMap
    assert(rows.length == 2, "only activity days in the output")
    assert(byDay.values.map(r => (r._2, r._3, r._4)).toSet ==
      Set((2L, 2L, 1.0), (1L, 2L, 0.5)))
    // fixture invariants: wau >= dau, stickiness in (0, 1]
    val full = Pipeline.queries("q140_rolling_active")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(full.nonEmpty)
    assert(full.forall { case (d, w, s) => w >= d && s > 0 && s <= 1.0 })
  }

  test("event funnel: planted strict-sequence cases, hand-computed") {
    val session = spark
    import session.implicits._
    val us = 1000000L
    def ev(id: Long, u: Long, t: Long, ty: String) =
      (id, new java.sql.Timestamp(t * 1000), u, ty, 1.0, "{}")
    // u1 full funnel; u2 click BEFORE view (doesn't count) then
    // purchase without a qualifying click; u3 completes but the click
    // lands past 7 days; u4 never views
    val events = Seq(
      ev(1, 1, 1000, "view"), ev(2, 1, 2000, "click"), ev(3, 1, 3000, "purchase"),
      ev(4, 2, 1000, "click"), ev(5, 2, 2000, "view"), ev(6, 2, 3000, "purchase"),
      ev(7, 3, 1000, "view"), ev(8, 3, 8 * 86400 * 1000L, "click"),
      ev(9, 4, 1000, "error"))
    val dir = java.nio.file.Files.createTempDirectory("q139f").toString
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Pipeline.queries("q139_event_funnel")(spark, dir).head()
    assert(r.getLong(0) == 4L, "n_users")
    assert(r.getLong(1) == 3L, "n_view: u1 u2 u3")
    assert(r.getLong(2) == 1L, "n_click: only u1 (u2 pre-view, u3 late)")
    assert(r.getLong(3) == 1L, "n_purchase: only u1")
    assert(r.getDouble(4) == Math.round(1.0 / 3.0 * 1e6) / 1e6)
    assert(r.getDouble(5) == 1.0)
  }

  test("funnel latency: nearest-rank order stats, consistent with the funnel counts") {
    val session = spark
    import session.implicits._
    def ev(id: Long, u: Long, t: Long, ty: String) =
      (id, new java.sql.Timestamp(t), u, ty, 1.0, "{}")
    // u1 converts in 1s (click) / 2s (purchase); u2 clicks in 3s
    val dir = java.nio.file.Files.createTempDirectory("q142fl").toString
    Seq(ev(1, 1, 1000, "view"), ev(2, 1, 2000, "click"), ev(3, 1, 3000, "purchase"),
      ev(4, 2, 1000, "view"), ev(5, 2, 4000, "click"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Pipeline.queries("q142_funnel_latency")(spark, dir).head()
    // click latencies sorted: [1e6, 3e6] -> p50 = k=1 -> 1e6, p90 = k=2 -> 3e6
    assert(r.getLong(0) == 2L && r.getLong(1) == 1000000L && r.getLong(2) == 3000000L)
    assert(r.getLong(3) == 1L && r.getLong(4) == 2000000L && r.getLong(5) == 2000000L)
    // fixture: counts agree with q139's funnel row; p50 <= p90
    val f = Pipeline.queries("q139_event_funnel")(spark, sf).head()
    val l = Pipeline.queries("q142_funnel_latency")(spark, sf).head()
    assert(l.getLong(0) == f.getLong(2) && l.getLong(3) == f.getLong(3))
    assert(l.getLong(1) <= l.getLong(2) && l.getLong(4) <= l.getLong(5))
  }

  test("alternating star: random graphs agree with a naive union-find") {
    val session = spark
    import session.implicits._
    import graft.operators.Components
    val rnd = new scala.util.Random(1137)
    for (trial <- 1 to 4) {
      val n = 10 + rnd.nextInt(30)
      val m = 5 + rnd.nextInt(60)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // naive disjoint-set forest as ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).filter(v => edges.exists(e =>
          (e._1 == v || e._2 == v) && e._1 != e._2))
        .map(v => (v.toLong, find(v).toLong)).toSet
      val got = Components.components(edges.toDF("u", "v")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"trial $trial (n=$n, m=$m)")
    }
  }

  test("alternating star: chain/clique/singleton graphs label to the component min") {
    val session = spark
    import session.implicits._
    import graft.operators.Components
    // a 64-link PATH — the shape min-label propagation cannot absorb
    // within q86's 20-round cap (needs O(length) rounds; star needs
    // O(log^2)) — plus a clique and a 2-node component, shuffled and
    // with duplicate/self edges thrown in
    val path = (1L until 64L).map(i => (i + 1000, i + 1001))
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a + 2000, b + 2000)
    val loose = Seq((7L, 9L), (9L, 7L), (5L, 5L)) // dup + swap + self-loop
    val edges = scala.util.Random.shuffle(path ++ clique ++ loose)
      .toDF("u", "v").repartition(7)
    val got = Components.components(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (1001L to 1064L).map((_, 1001L)).toSet ++
      (2001L to 2005L).map((_, 2001L)).toSet + ((7L, 7L)) + ((9L, 7L))
    assert(got == want)
    // fixture: bit-for-bit the same labeling as q86's label propagation
    val viaStar = Pipeline.queries("q143_components_star")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val viaProp = Pipeline.queries("q86_dup_clusters")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(viaStar == viaProp)
  }

  test("z-order: morton code matches the naive bit fold; zone maps are disjoint and local") {
    val session = spark
    import session.implicits._
    def naive(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    val pts = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L),
      (1L, 2L), (43690L, 21845L), (12345L, 54321L))
    val got = pts.toDF("x", "y")
      .select(Pipeline.morton16(col("x"), col("y"))).collect().map(_.getLong(0))
    assert(got.toSeq == pts.map { case (x, y) => naive(x, y) })
    // fixture zone maps: shards tile the z-space disjointly (that IS
    // the pruning property), counts are total, grid cells bound keys
    val rows = Pipeline.queries("q144_zorder_layout")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(6), r.getLong(7)))
    assert(rows.map(_._2).sum == Tables(spark, sf).lineitem.count())
    rows.foreach { case (shard, _, zmin, zmax) =>
      assert(zmin >> 24 == shard && zmax >> 24 == shard,
        "zone map z-range must stay inside its shard's z-prefix")
    }
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, _, _, amax), (_, _, bmin, _)) => assert(amax < bmin)
      case _ =>
    }
  }

  test("salted join: result-identical to the plain join, shuffle-hash on (key, salt)") {
    import graft.operators.Salted
    val ev = Tables(spark, sf).events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val cust = Tables(spark, sf).customer.select(col("c_custkey"), col("c_mktsegment"))
    val salted = Salted.saltedJoin(ev, cust, "user_id", "c_custkey", col("event_id"), 8)
      .select(col("event_id"), col("c_mktsegment"))
    val plain = ev.join(cust, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_mktsegment"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // plan shape: hash join (no broadcast of either side), both the
    // key and the salt in the join condition
    val phys = salted.queryExecution.executedPlan.toString
    assert(phys.contains("ShuffledHashJoin"), phys.take(400))
    assert(!phys.contains("BroadcastHashJoin"))
    assert(phys.contains("__salt"))
  }

  test("textrank: hub word ranks first on a planted star corpus; layout-free") {
    val session = spark
    import session.implicits._
    // "nexus" co-occurs with every other content word (star graph) —
    // PageRank must put it first; spokes tie and break on word order
    val spokes = Seq("amber", "birch", "cedar", "dunes", "ember")
    val docs = spokes.zipWithIndex.flatMap { case (w, i) =>
      Seq((i * 2L, s"nexus $w nexus $w", "en", "a", 20L),
        (i * 2 + 1L, s"$w nexus", "en", "b", 11L))
    }
    val dir = java.nio.file.Files.createTempDirectory("q146tr").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q146_textrank")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.head._2 == "nexus", rows.mkString(", "))
    assert(rows.map(_._2).toSet == (spokes :+ "nexus").toSet)
    assert(rows.head._3 > rows(1)._3, "hub strictly outranks spokes")
    assert(rows.tail.map(_._2).toSeq == spokes, "tied spokes break on word order")
    // fixture: 20 rows, deterministic under physical layout
    val full = Pipeline.queries("q146_textrank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(full.length == 20)
    val dir2 = java.nio.file.Files.createTempDirectory("q146det").toString
    Tables(spark, sf).documents.orderBy(rand(7)).repartition(5)
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val again = Pipeline.queries("q146_textrank")(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(full.toSeq == again.toSeq)
  }

  test("z-order layout prunes at the parquet reader: scan emits a fraction of raw") {
    // same rectangle filter over both layouts; identical answers, but
    // the z-sorted files' footer stats let the reader SKIP row groups,
    // so its scan node emits far fewer rows than the raw layout's
    // (which must materialize everything and filter after). This is
    // the mechanism behind q144's claim, asserted on reader metrics
    // rather than wall clock (a warm local fs hides the I/O win).
    def scanOutputRows(zo: Boolean): (Long, Long) = {
      val df = Pipeline.zorderScan(spark, sf, zordered = zo)
      val n = df.collect().head.getLong(0)
      val top = df.queryExecution.executedPlan
      val finalPlan = top match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val emitted = finalPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.metrics("numOutputRows").value
      }.sum
      (n, emitted)
    }
    val (nRaw, emittedRaw) = scanOutputRows(false)
    val (nZ, emittedZ) = scanOutputRows(true)
    assert(nRaw == nZ, "layout must not change the answer")
    assert(emittedZ * 4 <= emittedRaw,
      s"z layout should skip most row groups: z emitted $emittedZ vs raw $emittedRaw")
  }

  test("balanced shards: equi-depth bins are contiguous in z and actually balanced") {
    val rows = Pipeline.queries("q147_balanced_shards")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables(spark, sf).lineitem.count()
    assert(rows.map(_._2).sum == total)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    // range-contiguity: z ranges of consecutive bins never interleave
    rows.sliding(2).foreach {
      case Array((_, _, _, amax), (_, _, bmin, _)) => assert(amax < bmin)
      case _ =>
    }
    // balance: every bin within 2x of the ideal 1/16 (cell granularity
    // caps the error; the equi-width q144 grid makes no such promise)
    val ideal = total.toDouble / rows.length
    rows.foreach { case (bin, n, _, _) =>
      assert(n < 2 * ideal, s"bin $bin holds $n rows vs ideal $ideal")
    }
  }

  test("cusum: closed window form finds the planted level shift at its onset day") {
    val session = spark
    import session.implicits._
    // type "a" daily counts [10,10,10,10,20,20]: mean = 13, devs
    // [-3,-3,-3,-3,7,7], cum [-3,-6,-9,-12,-5,2], clamped runmin -12
    // from day 3 => S [0,0,0,0,7,14]: peak 14 on day 5
    val day = 86400000L
    val evs = for {
      d <- 0 to 5
      i <- 0 until (if (d >= 4) 20 else 10)
    } yield ((d * 100 + i).toLong, new java.sql.Timestamp(d * day + i), 1L, "a", 1.0, "{}")
    val dir = java.nio.file.Files.createTempDirectory("q148cs").toString
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Pipeline.queries("q148_cusum_anomaly")(spark, dir).head()
    assert(r.getString(0) == "a" && r.getLong(1) == 14L)
    assert(r.getLong(2) == 5L && r.getLong(3) == 13L)
    // fixture: every event type scores, peaks are non-negative
    val full = Pipeline.queries("q148_cusum_anomaly")(spark, sf).collect()
    assert(full.nonEmpty && full.forall(_.getLong(1) >= 0L))
  }

  test("attribution: last view within 7 days gets the credit, stale/no view does not") {
    val session = spark
    import session.implicits._
    val h = 3600000L
    def ev(id: Long, u: Long, ms: Long, ty: String, v: Double) =
      (id, new java.sql.Timestamp(ms), u, ty, v, "{}")
    val dir = java.nio.file.Files.createTempDirectory("q149at").toString
    Seq(
      ev(1, 1, 0, "view", 0.0), ev(2, 1, h, "purchase", 10.0), // attributed, day 0
      ev(3, 1, 9L * 24 * h, "purchase", 5.0), // view is 9 days stale: not attributed
      ev(4, 2, 24 * h, "purchase", 7.0)) // no view at all: not attributed
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Pipeline.queries("q149_attribution")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((0L, 1L, 1L, 1000L), (1L, 1L, 0L, 0L), (9L, 1L, 0L, 0L)))
  }

  test("negative sampling: 4 per anchor, never self, deterministic, well-spread") {
    val rows = Pipeline.queries("q152_negative_sampling")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables(spark, sf).documents.count()
    assert(rows.length == 4 * nDocs)
    assert(rows.forall { case (a, _, neg) => a != neg }, "no self-negatives")
    assert(rows.groupBy(_._1).forall(_._2.map(_._2).toSet == Set(0L, 1L, 2L, 3L)))
    // uniform-hash spread: most docs should appear as a negative
    assert(rows.map(_._3).distinct.length > nDocs * 0.9)
    // same draws under a different physical layout
    val dir = java.nio.file.Files.createTempDirectory("q152ns").toString
    Tables(spark, sf).documents.orderBy(rand(3)).repartition(7)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val again = Pipeline.queries("q152_negative_sampling")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("skew report: planted hot key dominates, invariants hold on the fixture") {
    val session = spark
    import session.implicits._
    // 100 extra events on user 7 plus one each on users 0..9:
    // 110 rows, 10 keys, hottest = 7 with 101 rows
    val evs = (0 until 100).map(i =>
      (i.toLong, new java.sql.Timestamp(i.toLong), 7L, "view", 1.0, "{}")) ++
      (0 until 10).map(i =>
        ((100 + i).toLong, new java.sql.Timestamp(i.toLong), i.toLong, "view", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("q153sk").toString
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // lineitem needed by the other two report rows
    Tables(spark, sf).lineitem.limit(50)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Pipeline.queries("q153_skew_report")(spark, dir).collect()
    val ev = r.find(_.getString(0) == "events.user_id").get
    assert(ev.getLong(1) == 110L && ev.getLong(2) == 10L)
    assert(ev.getLong(3) == 101L && ev.getLong(4) == 7L)
    assert(ev.getDouble(5) == math.rint(101.0 * 10 / 110 * 1e6) / 1e6)
    // fixture invariants: multiple >= 1, hot count <= rows
    val full = Pipeline.queries("q153_skew_report")(spark, sf).collect()
    assert(full.length == 3)
    assert(full.forall(x => x.getDouble(5) >= 1.0 && x.getLong(3) <= x.getLong(1)))
  }

  test("split leakage: exactly the dup pairs straddling splits are reported") {
    val session = spark
    import session.implicits._
    import graft.expressions.SketchKernel
    def split(id: Long): String = {
      val b = SketchKernel.md5Lower64(s"split:$id".getBytes("UTF-8")) & 1023L
      if (b < 819) "train" else if (b < 922) "valid" else "test"
    }
    // 10 exact-duplicate pairs with pair-unique vocab: the leaky
    // clusters must be exactly those whose two ids hash to different
    // splits under q83's rule
    val docs = (0 until 10).flatMap { p =>
      val text = (0 until 10).map(w => s"w${p}x$w").mkString(" ")
      Seq((p * 2L, text, "en", "a", 60L), (p * 2 + 1L, text, "en", "a", 60L))
    }
    val dir = java.nio.file.Files.createTempDirectory("q154lk").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val want = (0 until 10).map(p => (p * 2L, p * 2 + 1L))
      .filter { case (a, b) => split(a) != split(b) }
      .map(_._1).toSet // cluster id = min doc_id = the even id
    val got = Pipeline.queries("q154_split_leakage")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == want, s"want $want got ${got.keySet}")
    assert(got.values.forall(_ == 2L), "each planted cluster has 2 docs")
    assert(want.nonEmpty, "fixture ids should produce at least one straddle")
  }

  test("daily trend: planted linear series recovers its exact slope") {
    val session = spark
    import session.implicits._
    val day = 86400000L
    // counts 5 + 3*day for days 0..4: slope exactly 3, num/den 150/50
    val evs = for {
      d <- 0 to 4
      i <- 0 until (5 + 3 * d)
    } yield ((d * 100 + i).toLong, new java.sql.Timestamp(d * day + i), 1L, "a", 1.0, "{}")
    val dir = java.nio.file.Files.createTempDirectory("q150tr").toString
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Pipeline.queries("q150_daily_trend")(spark, dir).head()
    assert(r.getString(0) == "a" && r.getLong(1) == 5L)
    assert(r.getLong(2) == 150L && r.getLong(3) == 50L && r.getDouble(4) == 3.0)
  }

  test("source divergence: identical sources score ~0, disjoint sources score high") {
    val session = spark
    import session.implicits._
    // repeat enough that real counts dominate the +1/256 Laplace floor
    val same = Seq.fill(200)("alpha beta gamma delta epsilon zeta").mkString(" ")
    val other = Seq.fill(200)("uno dos tres cuatro cinco seis").mkString(" ")
    val docs = Seq(
      (1L, same, "en", "s1", 30L), (2L, same, "en", "s2", 30L),
      (3L, other, "en", "s3", 30L))
    val dir = java.nio.file.Files.createTempDirectory("q151jd").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = Pipeline.queries("q151_source_divergence")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(m.size == 3)
    assert(m(("s1", "s2")) == 0.0, "identical distributions diverge by 0")
    assert(m(("s1", "s3")) > 0.4 && m(("s1", "s3")) <= 1.0)
    assert(m(("s1", "s3")) == m(("s2", "s3")), "JS is symmetric in content")
    // fixture: full 20-choose-2 matrix, all in [0, 1]
    val full = Pipeline.queries("q151_source_divergence")(spark, sf).collect()
    assert(full.length == 190)
    assert(full.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("funnel latency: zero converted users yields null percentiles, not a throw") {
    val session = spark
    import session.implicits._
    def ev(id: Long, u: Long, t: Long, ty: String) =
      (id, new java.sql.Timestamp(t), u, ty, 1.0, "{}")
    // views only: nearest-rank index would be 0, which element_at
    // rejects — the guard must emit the oracle's NULLs instead
    val dir = java.nio.file.Files.createTempDirectory("q142zero").toString
    Seq(ev(1, 1, 1000, "view"), ev(2, 2, 2000, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Pipeline.queries("q142_funnel_latency")(spark, dir).head()
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getLong(3) == 0L && r.isNullAt(4) && r.isNullAt(5))
  }

  test("featureless docs are excluded from training and scoring on both engines") {
    val session = spark
    import session.implicits._
    // doc 3 (whitespace-only) and doc 4 (null text) produce no
    // features; the oracle's unnest joins drop them, so the engine
    // must too — otherwise they'd sit at margin 0 (forever
    // misclassified) and emit null score rows the oracle omits.
    val dir = java.nio.file.Files.createTempDirectory("q133empty").toString
    Seq((1L, "good good", "en", "a", 9L), (2L, "bad bad", "en", "b", 7L),
      (3L, "   ", "en", "b", 3L), (4L, null.asInstanceOf[String], "en", "b", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val curve = Pipeline.queries("q133_train_classifier")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // identical trajectory to the two-doc separable corpus: round 1
    // misclassifies exactly the 2 real docs, then converges
    assert(curve.toSeq == Seq((1L, 2L, 4L), (2L, 0L, 4L), (3L, 0L, 4L),
      (4L, 0L, 4L), (5L, 0L, 4L)))
    val scored = Pipeline.queries("q132_dsir_select")(spark, dir).collect()
    assert(scored.map(_.getLong(0)).toSet == Set(1L, 2L),
      "featureless docs must not appear in the scored output")
    assert(scored.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("coarse-to-fine ANN: recall@5 comparable to raw-space IVF at 1/4 routing cost") {
    def top5(name: String): Map[Long, Set[Long]] =
      Pipeline.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = top5("q36_ann_topk") // brute-force ground truth
    def recall(got: Map[Long, Set[Long]]): Double =
      exact.keys.toSeq.map(q =>
        (exact(q) & got.getOrElse(q, Set.empty)).size / 5.0).sum / exact.size
    val rCf = recall(top5("q137_coarse_to_fine"))
    val rIvf = recall(top5("q57_ann_ivf"))
    // measured on the fixture: q137 0.44 vs q57 0.50 at sf0.001 (0.52
    // vs 0.36 at sf0.01) — the 16-d routing loses nothing systematic
    // vs raw 64-d Rademacher cells; slack absorbs fixture refreshes
    assert(rCf >= 0.25, s"coarse-to-fine recall@5 $rCf below floor")
    assert(rCf >= rIvf - 0.25,
      s"coarse-to-fine recall@5 $rCf far below raw-space IVF $rIvf")
  }

  test("stupid backoff: all three branches fire with hand-computed scores") {
    val session = spark
    import session.implicits._
    // pick real split assignments (the query hashes doc_id): some
    // train ids carrying "p q r", and three eval ids exercising each
    // backoff tier — seen trigram (p=1), seen bigram (p=0.4), unseen
    // unigram floor (p=0.16/(N+1))
    def isTrain(id: Long): Boolean =
      (graft.expressions.SketchKernel.md5Lower64(
        s"split:$id".getBytes("UTF-8")) & 1023L) < 819L
    val ids = (1L to 60L)
    val train = ids.filter(isTrain).take(4)
    val eval3 = ids.filterNot(isTrain).take(3)
    assert(train.length == 4 && eval3.length == 3, "fixture ids cover both splits")
    val docs = train.map(id => (id, "p q r", "en", "s0", 5L)) ++
      Seq((eval3(0), "p q r", "en", "s0", 5L),   // tri: p = 4/4
        (eval3(1), "x q r", "en", "s0", 5L),     // bi:  p = 0.4 * 4/4
        (eval3(2), "x y z", "en", "s0", 5L))     // uni: p = 0.16/(4+1)
    val dir = java.nio.file.Files.createTempDirectory("q136sb").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q136_stupid_backoff")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(rows.keySet == eval3.toSet, "only held-out docs are scored")
    assert(rows(eval3(0)) == ((1L, 1L, 0L, 0L, 0.0)))
    val bi = rows(eval3(1))
    assert((bi._1, bi._2, bi._3, bi._4) == ((1L, 0L, 1L, 0L)))
    assert(math.abs(bi._5 - (-math.log(0.4) / math.log(2))) < 1e-6)
    val un = rows(eval3(2))
    assert((un._1, un._2, un._3, un._4) == ((1L, 0L, 0L, 1L)))
    assert(math.abs(un._5 - (-math.log(0.16 / 5.0) / math.log(2))) < 1e-6)
    // fixture: deterministic under layout
    val full = Pipeline.queries("q136_stupid_backoff")(spark, sf).collect()
      .map(_.toSeq)
    val dir2 = java.nio.file.Files.createTempDirectory("q136det").toString
    Tables(spark, sf).documents.orderBy(rand(17)).repartition(5)
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val again = Pipeline.queries("q136_stupid_backoff")(spark, dir2).collect()
      .map(_.toSeq)
    assert(full.toSeq == again.toSeq)
  }

  test("pmi: planted collocation ranks above independent pairs, hand-checked") {
    val session = spark
    import session.implicits._
    // per doc tokens [alpha beta x y z x y z] -> 7 bigrams; x6 docs:
    // (alpha,beta)=6, (beta,x)=6, (x,y)=12, (y,z)=12, (z,x)=6, N=42.
    // margins: alpha-first=6, beta-second=6 -> pmi(alpha,beta) =
    // ln(6*42/36) = ln(7); every other pair has a 12 margin ->
    // ln(3.5). The planted collocation wins (ties broken (a,b) asc).
    val dir = java.nio.file.Files.createTempDirectory("q135pmi").toString
    val filler = "x y z x y z "
    Seq.tabulate(6)(i => (i.toLong, s"alpha beta $filler", "en", "s0", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q135_pmi_collocations")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.head._1 == "alpha" && rows.head._2 == "beta",
      s"planted collocation must rank first, got ${rows.head}")
    // hand-check: alpha->beta cnt 6; beta->x 6 so ca(alpha)=6,
    // cb(beta)=6; N = 6 docs * 7 bigrams = 42
    assert(rows.head._3 == 6L)
    assert(math.abs(rows.head._4 - math.log(6.0 * 42.0 / (6.0 * 6.0))) < 1e-6)
    // fixture: 20 rows, scores monotone non-increasing
    val full = Pipeline.queries("q135_pmi_collocations")(spark, sf).collect()
      .map(r => r.getDouble(3))
    assert(full.length == 20)
    assert(full.toSeq == full.sortBy(-_).toSeq)
  }

  test("perceptron: separable planted corpus converges in one update, layout-free") {
    val session = spark
    import session.implicits._
    // round 1: w=0 -> margin 0 -> BOTH docs misclassified, grad =
    // (+2)e_good + (-2)e_bad, l1 = 4. round 2+: margins +-4, zero
    // misclassified, weights frozen. (Relies on 'good' and 'bad'
    // hashing to different buckets mod 64 — asserted by l1 = 4.)
    val dir = java.nio.file.Files.createTempDirectory("q133sep").toString
    Seq((1L, "good good", "en", "a", 9L), (2L, "bad bad", "en", "b", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.queries("q133_train_classifier")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 2L, 4L), (2L, 0L, 4L), (3L, 0L, 4L),
      (4L, 0L, 4L), (5L, 0L, 4L)))
    // fixture: 5 curve rows, deterministic under physical layout
    val full = Pipeline.queries("q133_train_classifier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(full.length == 5)
    assert(full.head._2 == Tables(spark, sf).documents.count(),
      "round 1 under w=0 misclassifies every doc")
    val dir2 = java.nio.file.Files.createTempDirectory("q133det").toString
    Tables(spark, sf).documents.orderBy(rand(13)).repartition(7)
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val again = Pipeline.queries("q133_train_classifier")(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(full.toSeq == again.toSeq, "trajectory must not depend on layout")
  }

  test("stratified sample: exact k per stratum, deterministic, bottom-k consistent") {
    val rows = Pipeline.queries("q128_stratified_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val strata = Tables(spark, sf).documents.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySrc = rows.groupBy(_._1)
    assert(bySrc.keySet == strata.keySet)
    bySrc.foreach { case (src, smp) =>
      assert(smp.length == math.min(8L, strata(src)), s"$src exact-k")
      assert(smp.map(_._2).sorted.sameElements(1L to smp.length.toLong))
      // rank order follows priority order
      assert(smp.sortBy(_._2).map(_._4).toSeq == smp.map(_._4).sorted.toSeq)
    }
    // determinism under physical layout: a shuffled, re-partitioned
    // copy of the corpus yields the identical sample
    val dir = java.nio.file.Files.createTempDirectory("q128ss").toString
    Tables(spark, sf).documents.orderBy(rand(7)).repartition(7)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val again = Pipeline.queries("q128_stratified_sample")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSet == again.toSet)
    // bottom-k consistency (the re-run/backfill contract): dropping a
    // NON-sampled doc never changes the sample
    val sampled = rows.map(_._3).toSet
    val victim = Tables(spark, sf).documents
      .filter(!col("doc_id").isInCollection(sampled))
      .select(col("doc_id")).head().getLong(0)
    val dir2 = java.nio.file.Files.createTempDirectory("q128bk").toString
    Tables(spark, sf).documents.filter(col("doc_id") =!= victim)
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val minus = Pipeline.queries("q128_stratified_sample")(spark, dir2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSet == minus.toSet, "sample must ignore non-member churn")
  }

  test("source minhash: estimates track exact Jaccard; signatures merge by min") {
    val rows = Pipeline.queries("q129_source_minhash")(spark, sf).collect()
    val nSrc = Tables(spark, sf).documents.select("source").distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2, "full pair matrix")
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(3), r.getDouble(4))
      // 64 perms: std err sqrt(J(1-J)/64) <= 1/16; allow 4 sigma
      assert(math.abs(est - exact) <= 0.25,
        s"${r.getString(0)}x${r.getString(1)}: est $est vs exact $exact")
    }
    // mergeability: element-wise min of per-shard signatures equals the
    // whole-corpus signature — the property that lets the sketch
    // stream, federate, and backfill without touching shingle sets
    val docs = Tables(spark, sf).documents
    val full = Pipeline.minhashSig(docs).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val lo = Pipeline.minhashSig(docs.filter(col("doc_id") % 2 === 0))
    val hi = Pipeline.minhashSig(docs.filter(col("doc_id") % 2 === 1))
    val merged = lo.union(hi).groupBy(col("source"), col("p"))
      .agg(min(col("mn")).as("mn")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == full, "shard-merge must equal the whole-corpus signature")
  }

  test("quantile sketch: single-valued distribution maps to bucket 0, not NaN") {
    // ADVICE r9: vmax == vmin made the bucket expression divide by
    // zero; Spark's least() skipped the NaN-cast null while DuckDB's
    // CASE could error. Both engines now pin the degenerate range to
    // bucket 0, and the estimate collapses to the single value.
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q124dg").toString
    (1 to 8).map(i => (i.toLong, "click", 42.5, 0L))
      .toDF("event_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val bins = Pipeline.quantileBins(spark.read.parquet(s"$dir/events.parquet"),
        42.5, 42.5).select("bucket").distinct().collect()
    assert(bins.map(_.getInt(0)).toSeq == Seq(0))
    val r = Pipeline.queries("q124_quantile_sketch")(spark, dir).collect()
    assert(r.length == 1 && r(0).getLong(1) == 8L)
    for (i <- Seq(2, 3, 4, 5, 6, 7))
      assert(r(0).getDouble(i) == 42.5, s"col $i: ${r(0).getDouble(i)}")
  }

  test("waterfill allocation: caps respected, budget filled to floor slack, saturated set is a ratio prefix") {
    val rows = Pipeline.queries("q157_mixture_waterfill")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val totalAvail = rows.map(_._2).sum
    val budget = totalAvail * 3 / 5
    // every allocation within its cap and nonnegative
    rows.foreach { case (src, avail, _, _, alloc) =>
      assert(alloc >= 0 && alloc <= avail, s"$src alloc $alloc vs avail $avail")
    }
    val (sat, unsat) = rows.partition(_._4)
    if (unsat.isEmpty) {
      // budget covers everything: allocation IS availability
      assert(rows.forall { case (_, avail, _, _, alloc) => alloc == avail })
      assert(totalAvail <= budget)
    } else {
      // budget exhausted up to floor-division slack (< one λ unit/source)
      val allocated = rows.map(_._5).sum
      assert(allocated <= budget)
      assert(budget - allocated < unsat.map(_._3).sum,
        s"slack ${budget - allocated} >= unsaturated weight ${unsat.map(_._3).sum}")
      // saturated set is a prefix in a/w ratio order
      if (sat.nonEmpty) {
        val maxSatRatio = sat.map(r => r._2.toDouble / r._3).max
        val minUnsatRatio = unsat.map(r => r._2.toDouble / r._3).min
        assert(maxSatRatio <= minUnsatRatio)
      }
      // unsaturated allocations are weight-proportional at a shared λ:
      // per-weight rates differ by at most one floor unit
      val rates = unsat.map(r => r._5.toDouble / r._3)
      assert(rates.max - rates.min <= 1.0, s"rates $rates")
    }
  }

  test("mad outliers: planted spike flagged, constant series silent") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q159mad").toString
    // LONG ts columns read as epoch-NANOS (Tables.eventMicros contract)
    val day = 86400000000000L
    val rows = (for {
      d <- 0 to 14
      i <- 0 until (if (d == 7) 100 else 10)
    } yield (d.toLong * 1000 + i, "a", 1.0, d * day + i)) ++
      (for { d <- 0 to 14; i <- 0 until 5 }
        yield (100000L + d * 1000 + i, "b", 1.0, d * day + i))
    rows.toDF("event_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Pipeline.queries("q159_mad_outliers")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // exactly ONE flagged row: type a day 7 (cnt 100, med 10, mad 0 ->
    // the max(mad,1) floor governs, dev 90); the constant b series and
    // a's normal days never fire
    assert(got.toSeq == Seq(("a", 7L, 100L, 10L, 0L, 90L)), got.mkString(","))
  }

  test("sketch rollup: merged per-source registers equal the direct corpus registers") {
    val docs = Tables(spark, sf).documents
    // merge path: finest-grain registers, max-merged across sources
    val merged = Pipeline.hllRegisters(docs)
      .groupBy(col("source"), col("idx")).agg(max(col("rho")).as("m"))
      .groupBy(col("idx")).agg(max(col("m")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    // direct path: registers over the corpus with no source split
    val direct = Pipeline.hllRegisters(docs.withColumn("source", lit("all")))
      .groupBy(col("idx")).agg(max(col("rho")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    assert(merged == direct, "max-merge must be lossless (sketch algebra)")
    // and the corpus row of q160 is within HLL's error envelope of exact
    val corpusRow = Pipeline.queries("q160_sketch_rollup")(spark, sf)
      .filter(col("scope") === "__corpus__").collect().head
    val (exact, est) = (corpusRow.getLong(1), corpusRow.getDouble(2))
    assert(math.abs(est - exact) / exact < 0.15,
      s"corpus estimate $est vs exact $exact outside 15%")
  }

  test("kmv overlap: unsaturated sketches are exact, saturated inside the envelope") {
    val rows = Pipeline.queries("q161_kmv_overlap")(spark, sf).collect()
    assert(rows.length == 190, s"expected 20*19/2 pairs, got ${rows.length}")
    var saturated = 0
    rows.foreach { r =>
      val (exInter, exUnion) = (r.getLong(2), r.getLong(3))
      val (uEst, iEst) = (r.getDouble(4), r.getLong(6))
      if (uEst == exUnion.toDouble && exUnion <= 128) {
        // union sketch held the whole set: estimates must be EXACT
        assert(iEst == exInter, s"unsaturated pair ${r.getString(0)}/${r.getString(1)}: $iEst != $exInter")
      } else {
        saturated += 1
        // KMV stderr ~ 1/sqrt(k-2) ~ 8.9% at k=128; allow ~4 sigma
        assert(math.abs(uEst - exUnion) / exUnion < 0.36,
          s"union est $uEst vs $exUnion outside envelope")
      }
    }
    // the sf0.001 fixture never saturates k=128, so plant a corpus
    // that does: 800-token union, 200-token intersection
    if (saturated == 0) {
      val session = spark
      import session.implicits._
      val dir = java.nio.file.Files.createTempDirectory("q161sat").toString
      def doc(src: String, id: Long, lo: Int, hi: Int) =
        (id, (lo until hi).map(t => s"tok$t").mkString(" "), src)
      val rows =
        (0 until 10).map(i => doc("A", i.toLong, i * 50, i * 50 + 50)) ++
          (0 until 10).map(i => doc("B", 100L + i, 300 + i * 50, 300 + i * 50 + 50))
      rows.toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val p = Pipeline.queries("q161_kmv_overlap")(spark, dir).collect().head
      assert(p.getLong(2) == 200L && p.getLong(3) == 800L, p.toString)
      assert(math.abs(p.getDouble(4) - 800.0) / 800.0 < 0.36,
        s"planted union est ${p.getDouble(4)} outside envelope")
      assert(math.abs(p.getLong(6) - 200.0) / 200.0 < 0.5,
        s"planted intersection est ${p.getLong(6)} outside envelope")
    }
  }

  test("kmv sketch merge equals the sketch of the union stream") {
    val session = spark
    import session.implicits._
    // two overlapping synthetic streams; bottom-k of (bottom-k A ++
    // bottom-k B) must equal bottom-k of (A ++ B) — the mergeability
    // that lets per-shard sketches roll up without rescan
    val a = (1L to 400L).map(i => ("a", i * 7919L % 100003L)).toDF("g", "h")
    val b = (300L to 700L).map(i => ("b", i * 7919L % 100003L)).toDF("g", "h")
    val k = 32
    val merged = a.unionAll(b).groupBy(lit(1)).agg(min_k(col("h"), k).as("sk"))
      .select(explode(col("sk"))).collect().map(_.getLong(0)).toSeq
    val perG = a.unionAll(b).groupBy(col("g")).agg(min_k(col("h"), k).as("sk"))
      .select(explode(col("sk"))).collect().map(_.getLong(0))
      .distinct.sorted.take(k).toSeq
    assert(merged == perG, "bottom-k merge must be lossless")
  }

  test("skyline: planted dominance cases and brute-force agreement") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q162").toString
    val ts = (d: Int) => new java.sql.Timestamp(d * 86400000L)
    // (key, price, day): 2 and 5 duplicate frontier points, 3 loses the
    // equal-price tie, 1 is dominated outright, 4 and 6 are corner points
    Seq((1L, 1.00, 10), (2L, 2.00, 20), (3L, 2.00, 15),
      (4L, 3.00, 5), (5L, 2.00, 20), (6L, 0.50, 30))
      .map { case (k, p, d) => (k, p, ts(d)) }
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Pipeline.queries("q162_skyline")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 4L, 5L, 6L), s"planted skyline wrong: $got")
    // fixture: the two-stage result must equal the quadratic definition
    val pts = Tables(spark, sf).orders.select(col("o_orderkey"),
      floor(col("o_totalprice") * 100).cast("long"),
      unix_micros(col("o_orderdate").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = pts.filter { case (_, p, d) =>
      !pts.exists { case (_, p2, d2) =>
        (p2 > p && d2 >= d) || (p2 == p && d2 > d) }
    }.map(_._1).toSet
    val fx = Pipeline.queries("q162_skyline")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(fx == brute, s"fixture skyline != brute: ${fx.diff(brute)} / ${brute.diff(fx)}")
  }

  test("equi-frequency bins: exact cover, order, and cell-resolution balance") {
    val rows = Pipeline.queries("q163_equifreq_bins")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = Tables(spark, sf).lineitem.count()
    assert(rows.map(_._2).sum == n, "bins must partition the corpus")
    // range-contiguous: each bin's hi < next bin's lo
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 < b._3, s"bins overlap: $a vs $b")
    }
    // balance holds up to the resolution of one histogram cell: no bin
    // exceeds the ideal share by more than the hottest cell's count
    val v = Tables(spark, sf).lineitem
      .select(floor(col("l_extendedprice") * 100).cast("long").as("v"))
    val (mn, mx) = {
      val r = v.agg(min(col("v")), max(col("v"))).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val maxCell = v.select(expr(s"((v - $mn) * 256) div (${mx - mn + 1})").as("c"))
      .groupBy(col("c")).count().agg(max(col("count"))).collect().head.getLong(0)
    rows.foreach { case (bin, cnt, _, _) =>
      assert(cnt <= n / 16 + maxCell, s"bin $bin count $cnt breaks balance bound")
    }
  }

  test("weighted sample: priorities are the min-over-position hashes, bottom-k exact") {
    import graft.expressions.SketchKernel
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val brute = docs.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val prio = toks.indices.map(p =>
          SketchKernel.md5Lower64(s"ws:$id:$p".getBytes("UTF-8")) & Long.MaxValue).min
        Some((id, prio, toks.length.toLong))
      }
    }.sortBy(t => (t._2, t._1)).take(32)
    val got = Pipeline.queries("q164_weighted_sample")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(2)))
    assert(got.toSeq == brute.toSeq,
      s"bottom-32 mismatch: ${got.toSeq.diff(brute.toSeq)}")
  }

  test("pivot matrix equals the long-form groupBy and covers every event") {
    val wide = Pipeline.queries("q165_pivot_matrix")(spark, sf).collect()
    val types = Seq("click", "error", "purchase", "signup", "view")
    val total = wide.map(r => types.indices.map(i => r.getLong(i + 1)).sum).sum
    assert(total == Tables(spark, sf).events.count(), "pivot must cover all events")
    // long-form parity: every (dow, type) cell matches the plain groupBy
    val ev = Tables(spark, sf).events
    val dow = pmod(Tables.eventMicros(ev).cast("long")
      .divide(lit(86400000000L)).cast("long") + 4, lit(7))
    val long = ev.select(dow.as("dow"), col("event_type"))
      .groupBy(col("dow"), col("event_type")).count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    wide.foreach { r =>
      val d = r.getLong(0)
      types.zipWithIndex.foreach { case (t, i) =>
        assert(r.getLong(i + 1) == long.getOrElse((d, t), 0L),
          s"cell ($d, $t) diverges from long form")
      }
    }
  }

  test("closed-form correlation matrix matches Spark's corr()") {
    val got = Pipeline.queries("q166_corr_matrix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val li = Tables(spark, sf).lineitem.select(
      floor(col("l_quantity")).cast("long").as("q"),
      floor(col("l_extendedprice")).cast("long").as("p"),
      floor(col("l_discount") * 100).cast("long").as("d"),
      floor(col("l_tax") * 100).cast("long").as("t"))
    Seq("q", "p", "d", "t").combinations(2).foreach { case Seq(a, b) =>
      val ref = li.agg(corr(col(a), col(b))).collect().head.getDouble(0)
      assert(math.abs(got((a, b)) - ref) < 1e-6,
        s"corr($a,$b): closed form ${got((a, b))} vs corr() $ref")
    }
  }

  test("fuzzy join: planted distance-1 pairs found, distance-2 collisions dropped") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q167").toString
    // spark/sparks (indel), spark/spork (substitution), cash/hash,
    // table/fable, table/tables; hash/hashes and fable/tables are
    // distance 2 and must NOT appear (hashes shares no variant with
    // hash; spork/sparks collide on nothing)
    val words = Seq("spark", "sparks", "spork", "hash", "cash",
      "table", "tables", "fable", "hashes")
    Seq((1L, (words ++ words).mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.queries("q167_fuzzy_join")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val want = Set(("cash", "hash"), ("fable", "table"),
      ("spark", "sparks"), ("spark", "spork"), ("table", "tables"))
    assert(got == want, s"got $got")
    // the fixture vocabulary genuinely has no distance-1 pairs — the
    // 0-row result is the correct answer, not a silent miss
    assert(Pipeline.queries("q167_fuzzy_join")(spark, sf).count() == 0)
  }

  test("seasonal decomposition: weekly indexes balance to ~zero per type") {
    val rows = Pipeline.queries("q168_seasonal_decompose")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // MA detrending makes weekly indexes near-balanced: per type, the
    // day-weighted mean deviation is small relative to daily volume
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val wsum = rs.map(r => r._4 * r._3).sum
      val days = rs.map(_._3).sum
      assert(math.abs(wsum / days) < 2.0,
        s"$t: weighted seasonal mean ${wsum / days} not near zero")
    }
  }

  test("bloom join: no false negatives, funnel ordering, FP rate in envelope") {
    val r = Pipeline.queries("q169_bloom_join")(spark, sf).collect().head
    val (nKeys, nPass, nTrue, rev) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // exact ground truth via the plain join
    val li = Tables(spark, sf).lineitem
    val urgent = Tables(spark, sf).orders
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val truth = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
      .agg(count(lit(1)), sum(floor(col("l_extendedprice") * 100).cast("long")))
      .collect().head
    assert(nTrue == truth.getLong(0), "bloom path lost true matches")
    assert(rev == truth.getLong(1), "revenue diverges from the plain join")
    assert(nPass >= nTrue, "bloom passes must cover all true matches")
    assert(nKeys > 0)
    // m=2^20 bits, k=3, n<=|urgent| keys: FPR well under 1% here, so
    // the pass set stays within 5% of the truth
    assert(nPass - nTrue <= math.max(5L, nTrue / 20),
      s"false positives $nPass-$nTrue outside envelope")
  }

  test("bounded top-k per group equals the window-rank form, ties by key") {
    val got = Pipeline.queries("q170_topk_bounded")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val c = Tables(spark, sf).customer.select(col("c_custkey"),
      col("c_nationkey").cast("long").as("nk"),
      floor(col("c_acctbal") * 100).cast("long").as("bal_c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("nk"))
      .orderBy(col("bal_c").desc, col("c_custkey"))
    val ref = c.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .join(broadcast(Tables(spark, sf).nation
        .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))), Seq("nk"))
      .select(col("n_name"), col("rk"), col("c_custkey"), col("bal_c"))
      .orderBy(col("n_name"), col("rk")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == ref, "bounded-state top-k diverges from the window form")
    // the fixture exercises the negative-balance half of the packing bias
    assert(c.filter(col("bal_c") < 0).count() > 0,
      "fixture has no negative balances — packing bias untested")
  }

  test("holdout readout: cells and chi-square match a brute recomputation") {
    import graft.expressions.SketchKernel
    val r = Pipeline.queries("q171_holdout_ab")(spark, sf).collect().head
    val users = Tables(spark, sf).events
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val cells = users.map { case (uid, p) =>
      val arm = SketchKernel.md5Lower64(s"ab:$uid".getBytes("UTF-8")) & 1L
      (arm, if (p >= 14) 1L else 0L)
    }
    val (n0, c0) = (cells.count(_._1 == 0L).toLong,
      cells.filter(_._1 == 0L).map(_._2).sum)
    val (n1, c1) = (cells.count(_._1 == 1L).toLong,
      cells.filter(_._1 == 1L).map(_._2).sum)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n0, c0, n1, c1)), "contingency cells diverge")
    val (a, b, c2, d) = (c0.toDouble, (n0 - c0).toDouble,
      c1.toDouble, (n1 - c1).toDouble)
    val chi2 = (n0 + n1).toDouble * math.pow(a * d - b * c2, 2) /
      (n0.toDouble * n1.toDouble * (c0 + c1).toDouble * ((n0 - c0) + (n1 - c1)).toDouble)
    assert(math.abs(r.getDouble(6) - chi2) < 1e-3,
      s"chi2 ${r.getDouble(6)} vs brute $chi2")
    // both outcome classes must be populated or the statistic is vacuous
    assert(c0 + c1 > 0 && (n0 - c0) + (n1 - c1) > 0, "degenerate fixture split")
  }

  test("basket rules: symmetric lift, directional confidence, planted basket") {
    val rows = Pipeline.queries("q172_basket_rules")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    rows.foreach { case ((a, b), (nab, na, nb2, sup, conf, lift)) =>
      val rev = rows((b, a))
      assert(rev._1 == nab, s"pair counts asymmetric for $a/$b")
      assert(math.abs(rev._6 - lift) < 1e-9, s"lift not symmetric for $a/$b")
      assert(math.abs(conf - nab.toDouble / na) < 1e-4)
      assert(sup > 0 && sup <= 1 && conf > 0 && conf <= 1)
      assert(nab <= math.min(na, nb2), "pair support exceeds a marginal")
    }
    // planted: 3 baskets — {x,y}, {x,y}, {x}. n_x=3, n_y=2, n_xy=2:
    // conf(x->y)=2/3, conf(y->x)=1, lift = 3*2/(3*2) = 1.0
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q172").toString
    val base = 86400000000L
    val evs = Seq(
      (1L, 1L * base, 10L, "x"), (2L, 1L * base + 1, 10L, "y"),
      (3L, 2L * base, 10L, "x"), (4L, 2L * base + 1, 10L, "y"),
      (5L, 3L * base, 10L, "x"))
      .map { case (id, us, u, t) =>
        (id, new java.sql.Timestamp(us / 1000), u, t, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val p = Pipeline.queries("q172_basket_rules")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(6), r.getDouble(7)))).toMap
    assert(math.abs(p(("x", "y"))._1 - 2.0 / 3) < 1e-6)
    assert(math.abs(p(("y", "x"))._1 - 1.0) < 1e-6)
    assert(math.abs(p(("x", "y"))._2 - 1.0) < 1e-6, "lift should be 1.0")
  }

  test("profile: exact stats match per-column recomputation, HLL in envelope") {
    val rows = Pipeline.queries("q173_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5), r.getString(6))).toMap
    val li = Tables(spark, sf).lineitem
    val n = li.count()
    Seq("l_returnflag" -> col("l_returnflag"),
      "l_linestatus" -> col("l_linestatus"),
      "l_quantity" -> floor(col("l_quantity")).cast("long").cast("string"),
      "l_partkey" -> col("l_partkey").cast("string")).foreach { case (name, c) =>
      val (nr, nn, de, est, mn, mx) = rows(name)
      assert(nr == n)
      val ref = li.select(c.as("v")).agg(
        sum(when(col("v").isNull, 1L).otherwise(0L)),
        countDistinct(col("v")), min(col("v")), max(col("v"))).collect().head
      assert(nn == ref.getLong(0), s"$name nulls")
      assert(de == ref.getLong(1), s"$name distinct")
      assert(mn == ref.getString(2) && mx == ref.getString(3), s"$name range")
      assert(math.abs(est - de) / math.max(1.0, de.toDouble) < 0.15,
        s"$name HLL $est vs exact $de outside 15%")
    }
  }

  test("cumulative distinct: exact curve is monotone and matches brute, HLL tracks it") {
    val rows = Pipeline.queries("q174_cumulative_distinct")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // monotone non-decreasing, final value = total distinct users
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2, "exact curve must be monotone")
      assert(a._3 <= b._3 + 1e-9, "prefix-union HLL curve must be monotone")
    }
    val totalUsers = Tables(spark, sf).events
      .select(col("user_id")).distinct().count()
    assert(rows.last._2 == totalUsers, "curve must end at total distinct")
    // brute per-day check on a sample of days
    val ev = Tables(spark, sf).events
    val ud = ev.select(col("user_id"),
      Tables.eventMicros(ev).cast("long").divide(lit(86400000000L))
        .cast("long").as("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    Seq(rows.head._1, rows(rows.length / 2)._1, rows.last._1).foreach { d =>
      val brute = ud.filter(_._2 <= d).map(_._1).distinct.length
      val got = rows.find(_._1 == d).get._2
      assert(got == brute, s"day $d: $got vs brute $brute")
    }
    rows.foreach { case (d, ex, est) =>
      assert(math.abs(est - ex) / math.max(1.0, ex.toDouble) < 0.15,
        s"day $d: HLL $est vs exact $ex outside 15%")
    }
  }

  test("blocklist filter: planted occurrence counts, token-level matching") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q175").toString
    Seq(
      // 3x "data" (one inside "database" must NOT count), 2x "hash join"
      (1L, "data base database data hash join and hash join again data"),
      // phrase split across other tokens must NOT count
      (2L, "hash and join table then scan"),
      (3L, "slow slow slow slow slow slow slow slow"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.queries("q175_blocklist_filter")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1L, 5L, 2L, false),   // 3x data + 2x "hash join"
      (2L, 0L, 0L, false),
      (3L, 8L, 1L, true)),   // 8x slow hits the threshold
      got.mkString(","))
  }

  test("benford audit: probabilities sum to one, counts cover, chi2 from brute") {
    val rows = Pipeline.queries("q176_benford_audit")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1L to 9L), "all nine digits present")
    val n = Tables(spark, sf).orders.count()
    assert(rows.map(_._2).sum == n, "digit counts must cover every order")
    // expected counts sum to N (Benford probabilities sum to 1)
    assert(math.abs(rows.map(_._3).sum - n) < 0.1)
    // contributions match a direct recomputation
    rows.foreach { case (d, obs, exp, contrib) =>
      val want = math.pow(obs - exp, 2) / exp
      assert(math.abs(contrib - want) < 0.01, s"digit $d contrib")
    }
  }

  test("dq report: planted defects are counted, clean fixture reports zeros") {
    val rows = Pipeline.queries("q177_dq_report")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the driver fixture is referentially intact
    assert(rows("lineitem_orphan_orderkey")._1 == 0L)
    assert(rows("orders_orphan_custkey")._1 == 0L)
    assert(rows("orders_duplicate_orderkey")._1 == 0L)
    // planted: orphaned lineitems and duplicate order keys
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q177").toString
    Seq((1L, 1L, "O", 10.0, new java.sql.Timestamp(0L), "1-URGENT"),
      (1L, 1L, "O", 10.0, new java.sql.Timestamp(0L), "1-URGENT"),
      (2L, 99L, "O", 10.0, new java.sql.Timestamp(0L), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1.0), (7L, 2.0), (8L, 3.0))
      .toDF("l_orderkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "X")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, new java.sql.Timestamp(0L), 10L, "view", Some(1.0), "{}"),
      (2L, new java.sql.Timestamp(3 * 86400000L), 10L, "view", None, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val p = Pipeline.queries("q177_dq_report")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(p("lineitem_orphan_orderkey") == ((2L, 3L)), p.toString) // keys 7, 8
    assert(p("orders_orphan_custkey") == ((1L, 3L)))                // custkey 99
    assert(p("orders_duplicate_orderkey") == ((1L, 3L)))            // key 1 twice
    assert(p("events_null_value") == ((1L, 2L)))
    assert(p("events_missing_days") == ((2L, 4L)))                  // days 1, 2 absent
  }

  test("f2 sketch: collision-free fixture is exact; planted heavy stream stays in envelope") {
    val r = Pipeline.queries("q178_joinsize_sketch")(spark, sf).collect().head
    assert(r.getLong(0) >= r.getLong(1), "CMS inner product must never underestimate")
    // planted: 5000 distinct tokens force cell collisions; the
    // overestimate must stay within the F1^2/w additive bound
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q178").toString
    val rnd = new scala.util.Random(7)
    val docs = (0 until 50).map { i =>
      (i.toLong, (0 until 400).map(_ => s"t${rnd.nextInt(5000)}").mkString(" "))
    }
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val p = Pipeline.queries("q178_joinsize_sketch")(spark, dir).collect().head
    val (est, exact) = (p.getLong(0), p.getLong(1))
    val f1 = 50L * 400L
    assert(est >= exact, "underestimate on the planted stream")
    assert(est - exact <= f1 * f1 / 1024 * 3,
      s"overestimate ${est - exact} outside ~3x F1^2/w envelope")
    assert(est > exact, "planted 5000-key stream should actually collide")
  }

  test("variant props histogram equals the string-parse path") {
    val got = Pipeline.queries("q179_props_variant")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // independent extraction via get_json_object (the string re-parse
    // path the variant tier replaces)
    val ref = Tables(spark, sf).events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"), expr("k div 10").as("b"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == ref, "variant path diverges from string-parse path")
    assert(got.nonEmpty)
  }

  test("share-of-total: shares sum to one at both levels") {
    val rows = Pipeline.queries("q180_share_of_total")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "grand shares must sum to 1")
    rows.groupBy(_._1).foreach { case (f, rs) =>
      assert(math.abs(rs.map(_._3).sum - 1.0) < 1e-4, s"flag $f shares must sum to 1")
    }
    val total = Tables(spark, sf).lineitem
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")))
      .collect().head.getLong(0)
    assert(rows.map(_._2).sum == total, "cents must be conserved")
  }

  test("session paths: planted timeline produces the expected ranked paths") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q181").toString
    val m = 60000000L // one minute in micros
    def ev(id: Long, u: Long, tus: Long, t: String) =
      (id, new java.sql.Timestamp(tus / 1000), u, t, 0.0, "{}")
    // user 10: view->click, then after a 40-min gap purchase (new session)
    // user 20: view->click (same path as user 10's first session)
    val evs = Seq(
      ev(1, 10, 0, "view"), ev(2, 10, m, "click"),
      ev(3, 10, 45 * m, "purchase"),
      ev(4, 20, 0, "view"), ev(5, 20, 2 * m, "click"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Pipeline.queries("q181_session_paths")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "view->click", 2L), (2L, "purchase", 1L)), got.mkString(","))
  }

  test("bm25 ndcg: bounded in (0,1], dcg <= idcg, brute recomputation agrees") {
    val r = Pipeline.queries("q182_bm25_ndcg")(spark, sf).collect().head
    val (dcg, idcg, ndcg) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(dcg > 0 && idcg > 0 && dcg <= idcg + 1e-9)
    assert(ndcg > 0 && ndcg <= 1.0 + 1e-9)
    // brute: rerun q112's top-20, compute rel + DCG@10 in Scala
    val terms = Set("dup", "vector", "hash", "merge")
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(row => (row.getLong(0), row.getString(1).trim.split("\\s+").toSeq))
    val ranked = Pipeline.queries("q112_bm25_topk")(spark, sf).collect()
      .map(row => row.getLong(0)).take(10)
    val rel = docs.map { case (id, tk) => id -> tk.toSet.count(terms) }.toMap
    val bruteDcg = ranked.zipWithIndex.map { case (id, i) =>
      rel(id).toDouble / (math.log(i + 2.0) / math.log(2.0)) }.sum
    assert(math.abs(dcg - bruteDcg) < 1e-4, s"dcg $dcg vs brute $bruteDcg")
    val bruteIdcg = rel.toSeq.sortBy(t => (-t._2, t._1)).take(10).zipWithIndex
      .map { case ((_, g), i) => g.toDouble / (math.log(i + 2.0) / math.log(2.0)) }
      .sum
    assert(math.abs(idcg - bruteIdcg) < 1e-4, s"idcg $idcg vs brute $bruteIdcg")
  }

  test("compaction plan: bins near target, bytes conserved, deterministic order") {
    val rows = Pipeline.queries("q183_compaction_plan")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 64)
    val total = rows.map(_._2).sum
    val target = (total + 15) / 16
    val maxShard = rows.map(_._2).max
    rows.groupBy(_._3).foreach { case (bin, rs) =>
      // next-fit bins overshoot the target by at most one shard
      assert(rs.map(_._2).sum <= target + maxShard,
        s"bin $bin exceeds target+maxShard")
    }
    // bins are contiguous in the size-desc packing order
    val byOrder = rows.sortBy(t => (-t._2, t._1)).map(_._3)
    assert(byOrder.sliding(2).forall(w => w.length < 2 || w(1) >= w(0)),
      "bins not monotone")
  }

  test("ewma anomaly: brute per-day recomputation agrees, priors gated") {
    val rows = Pipeline.queries("q184_ewma_anomaly")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    // brute: daily counts from the raw events, EWMA over strict priors
    val e = Tables(spark, sf).events
    val daily = e.select(col("event_type"), Tables.eventMicros(e).as("tus"))
      .select(col("event_type"), expr("tus DIV 86400000000").as("day"))
      .groupBy("event_type", "day").count().collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    rows.foreach { case (typ, day, cnt, ewma, ratio, flagged) =>
      assert(daily((typ, day)) == cnt)
      val priors = daily.collect { case ((t, d), c) if t == typ && d < day => (d, c) }
      assert(priors.size >= 5, s"$typ/$day passed the gate with ${priors.size} priors")
      val brute = BigDecimal(0.25 * priors.map { case (d, c) =>
        c * math.pow(0.75, (day - d - 1).toDouble) }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(ewma - brute) < 2e-6, s"$typ/$day ewma $ewma vs $brute")
      assert(flagged == (cnt > 2.0 * ewma))
      assert(math.abs(ratio - cnt / ewma) < 1e-5)
    }
    // every day with >= 5 priors is present — the gate drops only ramp-up
    val expected = daily.keys.groupBy(_._1).values.map { ks =>
      val days = ks.map(_._2).toSeq.sorted; days.drop(5).size
    }.sum
    assert(rows.length == expected, s"${rows.length} rows vs $expected eligible days")
  }

  test("decile lift: exact counts, gains monotone, lift consistent") {
    val rows = Pipeline.queries("q185_decile_lift")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val tot = rows.map(_._2).sum
    val totPos = rows.map(_._3).sum
    val scoredDocs = Tables(spark, sf).documents
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0).count()
    assert(tot == scoredDocs)
    assert(totPos > 0 && totPos < tot)
    // ntile balance: bucket sizes differ by at most 1
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    rows.foreach { case (_, n, nPos, posRate, lift, _) =>
      assert(math.abs(posRate - nPos.toDouble / n) < 1e-6)
      assert(math.abs(lift - (nPos.toDouble * tot) / (n.toDouble * totPos)) < 1e-5)
    }
    // cumulative capture is monotone nondecreasing and ends at 1
    val caps = rows.map(_._6)
    assert(caps.sliding(2).forall(w => w.length < 2 || w(1) >= w(0) - 1e-9))
    assert(math.abs(caps.last - 1.0) < 1e-6)
  }

  test("calibration bins: counts conserve, p stays inside its bin") {
    val rows = Pipeline.queries("q186_calibration_bins")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val scoredDocs = Tables(spark, sf).documents
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0).count()
    assert(rows.map(_._2).sum == scoredDocs)
    rows.foreach { case (bin, n, nPos, avgP, empRate, brier) =>
      assert(bin >= 0 && bin <= 9)
      assert(nPos <= n)
      // bin 9 also holds p = 1.0 (clamp), so its upper bound is closed
      assert(avgP >= bin / 10.0 - 1e-6 && avgP <= (bin + 1) / 10.0 + 1e-6)
      assert(math.abs(empRate - nPos.toDouble / n) < 1e-6)
      assert(brier >= 0.0 && brier <= 1.0)
    }
  }

  test("knn graph stats: brute recount of edges, wedges and triangles agrees") {
    val r = Pipeline.queries("q187_knn_graph_stats")(spark, sf).collect().head
    val (nv, neds, nw, nt, cc) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))
    // brute: collect vectors, assign cells, top-3 cosine within cell
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(row => (row.getLong(0), row.getSeq[Float](1).map(_.toDouble).toArray))
    assert(nv == vecs.length)
    val kCells = math.max(16, vecs.length / 125)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => a(i) * b(i)).sum
    def cell(v: Array[Double]): Int = (0 until kCells).map { k =>
      val d = v.indices.map(i => v(i) * (if ((graft.expressions.SketchKernel
        .md5Lower64(s"ivf_${k}_$i".getBytes("UTF-8")) & 1L) == 1L) 1.0 else -1.0)).sum
      (k, d)
    }.maxBy { case (k, d) => (d, -k) }._1
    val byCell = vecs.groupBy { case (_, v) => cell(v) }
    val knn = byCell.values.toSeq.flatMap { vs =>
      vs.toSeq.flatMap { case (id, v) =>
        vs.toSeq.filter(_._1 != id)
          .map { case (nb, w) => (nb,
            BigDecimal(dot(v, w) / (math.sqrt(dot(v, v)) * math.sqrt(dot(w, w))))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
          .sortBy { case (nb, c) => (-c, nb) }.take(3)
          .map { case (nb, _) => (id, nb) }
      }
    }
    val edges = knn.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(neds == edges.size, s"edges $neds vs brute ${edges.size}")
    val adjacency = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).sorted }
    val wedges = adjacency.values.map(ns => ns.size.toLong * (ns.size - 1) / 2).sum
    assert(nw == wedges, s"wedges $nw vs brute $wedges")
    val closed = adjacency.values.flatMap(ns =>
      ns.combinations(2).filter(p => edges.contains((p(0), p(1))))).size
    assert(nt == closed / 3, s"triangles $nt vs brute ${closed / 3}")
    assert(math.abs(cc - BigDecimal(closed.toDouble / wedges)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(cc >= 0.0 && cc <= 1.0)
  }

  test("gini concentration: brute recomputation from per-user cents agrees") {
    val r = Pipeline.queries("q188_gini_concentration")(spark, sf).collect().head
    val (n, total, gini, s1, s10) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
    val per = Tables(spark, sf).events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), floor(col("value") * 100).cast("long").as("c"))
      .groupBy("user_id").agg(sum("c").as("cents")).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    assert(n == per.length && total == per.map(_._2).sum)
    val asc = per.sortBy { case (u, c) => (c, u) }.map(_._2)
    val iw = asc.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
    val bruteGini = (2.0 * iw - (n + 1.0) * total) / (n.toDouble * total)
    assert(math.abs(gini - bruteGini) < 2e-6, s"gini $gini vs $bruteGini")
    assert(gini >= 0.0 && gini < 1.0)
    val desc = per.sortBy { case (u, c) => (-c, u) }.map(_._2)
    val k1 = (n + 99) / 100; val k10 = (n + 9) / 10
    assert(math.abs(s1 - desc.take(k1.toInt).sum.toDouble / total) < 2e-6)
    assert(math.abs(s10 - desc.take(k10.toInt).sum.toDouble / total) < 2e-6)
    assert(s1 <= s10 + 1e-9 && s10 <= 1.0)
  }

  test("kanon audit: class sizes conserve customers, at_risk matches n < 4") {
    val rows = Pipeline.queries("q189_kanon_audit")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val total = Tables(spark, sf).customer.count()
    assert(rows.map(_._4).sum == total)
    assert(rows.forall { case (_, _, _, n, risk) => risk == (n < 4) })
    // classes are distinct quasi-identifier tuples
    assert(rows.map(t => (t._1, t._2, t._3)).distinct.length == rows.length)
    // a planted lookup: every class size matches a direct filter count
    val (nat, seg, band, n, _) = rows.maxBy(_._4)
    val direct = Tables(spark, sf).customer
      .filter(col("c_nationkey") === nat && col("c_mktsegment") === seg &&
        floor(col("c_acctbal") / 1000.0) === band).count()
    assert(direct == n)
  }

  test("pmi pairs: brute windowed co-occurrence recomputation agrees") {
    val rows = Pipeline.queries("q190_pmi_pairs")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length <= 20 && rows.nonEmpty)
    val docs = Tables(spark, sf).documents.select(col("text")).collect()
      .map(_.getString(0).trim.split("\\s+").toSeq)
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    var tPair = 0L
    docs.foreach { ts =>
      for (i <- ts.indices; j <- (i + 1) until math.min(i + 4, ts.length)) {
        val k = if (ts(i) <= ts(j)) (ts(i), ts(j)) else (ts(j), ts(i))
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + 1; tPair += 1
      }
    }
    val cw = docs.flatten.groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    val tTok = docs.map(_.length.toLong).sum
    rows.foreach { case (w1, w2, cPair, pmi) =>
      assert(pairCounts((w1, w2)) == cPair && cPair >= 20)
      val brute = math.log(cPair.toDouble * tTok * tTok /
        (tPair.toDouble * cw(w1) * cw(w2)))
      assert(math.abs(pmi - brute) < 2e-6, s"($w1,$w2) pmi $pmi vs $brute")
    }
    // the list is the global top-20: no unlisted pair beats the floor
    val floorPmi = rows.map(_._4).min
    val best = pairCounts.filter(_._2 >= 20).map { case ((a, b), c) =>
      math.log(c.toDouble * tTok * tTok / (tPair.toDouble * cw(a) * cw(b)))
    }.toSeq.sorted.reverse
    if (best.length > 20) assert(best(20) <= floorPmi + 2e-6)
  }

  test("cluster outliers: exactly the dist > nearest-rank-p95 tail of q114") {
    val asg = Pipeline.queries("q114_kmeans_cluster")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = Pipeline.queries("q191_cluster_outliers")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCl = asg.groupBy(_._2)
    val expected = byCl.toSeq.flatMap { case (cl, vs) =>
      val sorted = vs.sortBy(t => (t._3, t._1))
      val k = (19 * vs.length + 19) / 20
      val p95 = sorted(k - 1)._3
      vs.toSeq.filter(_._3 > p95).map(t => (t._1, cl, t._3, p95))
    }.toSet
    assert(out.toSet == expected, s"${out.length} vs ${expected.size}")
    // the tail is small by construction (~5%)
    assert(out.length <= asg.length / 10)
  }

  test("winsorized stats: brute per-type recomputation agrees") {
    val rows = Pipeline.queries("q192_winsorized_stats")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    val data = Tables(spark, sf).events
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100).cast("long").as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(rows.map(_._1).toSet == data.keySet)
    rows.foreach { case (typ, n, p05, p95, rawMean, winMean, nClamped) =>
      val cs = data(typ).sortBy(t => (t._3, t._2)).map(_._3)
      assert(n == cs.length)
      val lo = cs(((n + 19) / 20).toInt - 1)
      val hi = cs(((19 * n + 19) / 20).toInt - 1)
      assert(p05 == lo && p95 == hi, s"$typ cutoffs ($p05,$p95) vs ($lo,$hi)")
      assert(math.abs(rawMean - cs.sum.toDouble / n) < 2e-6)
      val wsum = cs.map(c => math.max(lo, math.min(hi, c))).sum
      assert(math.abs(winMean - wsum.toDouble / n) < 2e-6)
      assert(nClamped == cs.count(c => c < lo || c > hi))
      assert(winMean >= lo - 1e-9 && winMean <= hi + 1e-9)
    }
  }

  test("rfm segments: brute quartile recomputation agrees, users conserve") {
    val rows = Pipeline.queries("q193_rfm_segments")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty && rows.length <= 64)
    val e = Tables(spark, sf).events
    val per = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), Tables.eventMicros(e).as("tus"),
        floor(col("value") * 100).cast("long").as("c"))
      .select(col("user_id"), expr("tus DIV 86400000000").as("day"), col("c"))
      .groupBy("user_id")
      .agg(max("day").as("ld"), count(lit(1)).as("f"), sum("c").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).sum == per.length)
    assert(rows.map(_._5).sum == per.map(_._4).sum)
    def quartile(order: Seq[Long]): Map[Long, Long] = {
      // ntile(4): first (n mod 4) buckets get ceil(n/4)
      val n = order.length
      val (q, rem) = (n / 4, n % 4)
      order.zipWithIndex.map { case (u, i) =>
        val big = (q + 1) * rem
        u -> (if (i < big) i / (q + 1) + 1L else (i - big) / q + rem + 1L)
      }.toMap
    }
    val r = quartile(per.sortBy(t => (t._2, t._1)).map(_._1))
    val f = quartile(per.sortBy(t => (t._3, t._1)).map(_._1))
    val m = quartile(per.sortBy(t => (t._4, t._1)).map(_._1))
    val brute = per.groupBy(t => (r(t._1), f(t._1), m(t._1)))
      .map { case (k, vs) => k -> (vs.length.toLong, vs.map(_._4).sum) }
    rows.foreach { case (rs, fs, ms, n, cents, avg) =>
      val (bn, bc) = brute((rs, fs, ms))
      assert(n == bn && cents == bc, s"segment ($rs,$fs,$ms)")
      assert(math.abs(avg - cents.toDouble / n) < 1e-6)
    }
  }

  test("ctfidf keywords: brute class-rate recomputation agrees, 5 per class") {
    val rows = Pipeline.queries("q194_ctfidf_keywords")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val docs = Tables(spark, sf).documents
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).trim.split("\\s+").toSeq))
    val byClass = docs.groupBy(_._1).map { case (s2, ds) => s2 -> ds.flatMap(_._2) }
    val corpus = docs.flatMap(_._2).groupBy(identity).map { case (t, o) => t -> o.length }
    val tTok = docs.map(_._2.length).sum
    val nCls = byClass.size
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length), s"$src ranks")
      assert(rs.length == math.min(5, byClass(src).distinct.length))
      rs.foreach { case (_, _, tok, score) =>
        val tfc = byClass(src).count(_ == tok)
        val brute = tfc.toDouble / byClass(src).length *
          math.log(1.0 + tTok.toDouble / (nCls.toLong * corpus(tok)))
        assert(math.abs(score - brute) < 2e-6, s"$src/$tok $score vs $brute")
      }
      // top-5 really is the max: no unlisted token beats the floor
      val floorScore = rs.map(_._4).min
      val all = byClass(src).distinct.map { tok =>
        byClass(src).count(_ == tok).toDouble / byClass(src).length *
          math.log(1.0 + tTok.toDouble / (nCls.toLong * corpus(tok)))
      }.sorted.reverse
      if (all.length > 5) assert(all(5) <= floorScore + 2e-6)
    }
  }

  test("token burstiness: brute VMR recomputation agrees, content words burst") {
    val rows = Pipeline.queries("q195_token_burstiness")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = Tables(spark, sf).documents.select(col("text")).collect()
      .map(_.getString(0).trim.split("\\s+").toSeq)
    val n = docs.length.toLong
    val vocab = docs.flatten.distinct
    assert(rows.length == vocab.length)
    rows.foreach { case (tok, tf, df, vmr) =>
      val xs = docs.map(_.count(_ == tok).toLong).filter(_ > 0)
      assert(tf == xs.sum && df == xs.length)
      val brute = (n * xs.map(x => x * x).sum - tf * tf).toDouble / (n * tf)
      assert(math.abs(vmr - brute) < 2e-6, s"$tok vmr $vmr vs $brute")
    }
    // order is vmr desc with token tie-break
    assert(rows.sliding(2).forall(w => w.length < 2 || w(0)._4 > w(1)._4 ||
      (w(0)._4 == w(1)._4 && w(0)._1 < w(1)._1)))
  }

  test("embedding dim stats: brute per-dimension recomputation agrees") {
    val rows = Pipeline.queries("q196_embedding_dim_stats")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 64 && rows.map(_._1).toSeq == (0L until 64L))
    val vecs = Tables(spark, sf).embeddings.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    rows.foreach { case (dim, n, mean, std, vmin, vmax) =>
      val vs = vecs.map(_(dim.toInt))
      assert(n == vs.length)
      assert(math.abs(mean - vs.sum / n) < 2e-6)
      val bstd = math.sqrt((vs.map(v => v * v).sum - vs.sum * vs.sum / n) / n)
      assert(math.abs(std - bstd) < 2e-6, s"dim $dim std $std vs $bstd")
      assert(math.abs(vmin - vs.min) < 2e-6 && math.abs(vmax - vs.max) < 2e-6)
      assert(vmin <= mean && mean <= vmax && std >= 0.0)
    }
  }

  test("source diversity: brute entropy/simpson/ttr recomputation agrees") {
    val rows = Pipeline.queries("q197_source_diversity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val docs = Tables(spark, sf).documents
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).trim.split("\\s+").toSeq))
      .groupBy(_._1).map { case (s2, ds) => s2 -> ds.flatMap(_._2) }
    assert(rows.map(_._1).toSet == docs.keySet)
    rows.foreach { case (src, nTok, vocab, shannon, simpson, ttr) =>
      val toks2 = docs(src)
      val counts = toks2.groupBy(identity).map(_._2.length.toLong)
      assert(nTok == toks2.length && vocab == counts.size)
      val n = nTok.toDouble
      val bh = math.log(n) - counts.map(c => c * math.log(c.toDouble)).sum / n
      assert(math.abs(shannon - bh) < 2e-6, s"$src H $shannon vs $bh")
      val bs = counts.map(c => c * (c - 1)).sum.toDouble / (nTok * (nTok - 1))
      assert(math.abs(simpson - bs) < 2e-6)
      assert(math.abs(ttr - vocab.toDouble / nTok) < 2e-6)
      assert(shannon >= 0 && simpson >= 0 && simpson <= 1)
    }
  }

  test("zipf fit: brute log-log OLS agrees, slope negative, r2 in [0,1]") {
    val r = Pipeline.queries("q198_zipf_fit")(spark, sf).collect().head
    val (n, slope, r2) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val freqs = Tables(spark, sf).documents.select(col("text")).collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
      .groupBy(identity).toSeq.map { case (t, o) => (t, o.length.toLong) }
      .sortBy { case (t, f) => (-f, t) }
    assert(n == freqs.length)
    val xy = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.log((i + 1).toDouble), math.log(f.toDouble)) }
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val bSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val bR2 = math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(slope - bSlope) < 2e-6, s"slope $slope vs $bSlope")
    assert(math.abs(r2 - bR2) < 2e-6)
    assert(slope < 0 && r2 >= 0 && r2 <= 1)
  }

  test("scd2 intervals: runs partition each customer's history, no gaps") {
    val rows = Pipeline.queries("q199_scd2_intervals")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDate(3),
        Option(r.getDate(4)), r.getLong(5)))
    val orders = Tables(spark, sf).orders
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2), r.getString(3)))
    assert(rows.map(_._6).sum == orders.length, "every order lands in a run")
    rows.groupBy(_._1).foreach { case (cust, ivs) =>
      val sorted = ivs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length), s"$cust run ids")
      // only the last interval is open; valid_to chains to the next start
      sorted.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(0)._5.contains(pair(1)._4), s"$cust interval chain")
      }
      assert(sorted.last._5.isEmpty, s"$cust last interval must be open")
      // adjacent runs carry different priorities (otherwise not a change)
      sorted.sliding(2).foreach { pair =>
        if (pair.length == 2) assert(pair(0)._3 != pair(1)._3, s"$cust run merge")
      }
      // brute replay of one customer's history
      val hist = orders.filter(_._1 == cust)
        .sortBy(t => (t._3.getTime, t._2)).map(_._4)
      val runs = hist.foldLeft(Vector.empty[(String, Long)]) { (acc, p) =>
        if (acc.nonEmpty && acc.last._1 == p) acc.init :+ (p, acc.last._2 + 1)
        else acc :+ (p, 1L)
      }
      assert(sorted.map(t => (t._3, t._6)).toSeq == runs, s"$cust runs")
    }
  }

  test("wow revenue: brute weekly rollup and deltas agree") {
    val rows = Pipeline.queries("q200_wow_revenue")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(rows.nonEmpty)
    val t = Tables(spark, sf)
    val brute = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"),
        expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') div 7"),
        floor(col("o_totalprice") * 100).cast("long")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(rows.map(r => ((r._1, r._2), r._3)).toMap == brute)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._4.isEmpty && sorted.head._5.isEmpty, "first week null")
      sorted.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          assert(pair(1)._4.contains(pair(0)._3), "prev chains")
          val exp = (pair(1)._3 - pair(0)._3).toDouble / pair(0)._3
          assert(math.abs(pair(1)._5.get - exp) < 2e-6)
        }
      }
    }
  }

  test("neyman allocation: sums to budget, proportional, brute sigma agrees") {
    val rows = Pipeline.queries("q201_neyman_allocation")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    assert(rows.map(_._5).sum == 1000L, "largest-remainder must hit the budget")
    val data = Tables(spark, sf).events
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    rows.foreach { case (typ, n, sigma, ideal, alloc) =>
      val cs = data(typ).map(_._2)
      assert(n == cs.length)
      val mean = cs.sum.toDouble / n
      val bSigma = math.sqrt(cs.map(c => c.toDouble * c).sum / n - mean * mean)
      assert(math.abs(sigma - bSigma) < 1e-4, s"$typ sigma $sigma vs $bSigma")
      // integerization stays within 1 of the ideal share
      assert(math.abs(alloc - ideal) < 1.0 + 1e-9, s"$typ alloc $alloc vs $ideal")
    }
    // weights really drive the split: ideal shares track n*sigma
    val ws = rows.map(r => r._2 * r._3)
    val tot = ws.sum
    rows.zip(ws).foreach { case ((typ, _, _, ideal, _), w) =>
      assert(math.abs(ideal - w / tot * 1000) < 1e-3, s"$typ share")
    }
  }

  test("bootstrap ci: deterministic weights, brute replicate recomputation") {
    val rows = Pipeline.queries("q202_bootstrap_ci")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val data = Tables(spark, sf).events
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val ts = Seq(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563, 0.9994058151824183)
    def kOf(id: Long, b: Int): Long = {
      val u = (graft.expressions.SketchKernel.md5Lower64(
        s"bs:$id:$b".getBytes("UTF-8")) & 9007199254740991L).toDouble /
        9007199254740992.0
      val i = ts.indexWhere(u < _); if (i < 0) 6L else i.toLong
    }
    rows.foreach { case (typ, n, mean, lo, hi) =>
      val evs = data(typ)
      assert(n == evs.length)
      assert(math.abs(mean - evs.map(_._3).sum.toDouble / n) < 2e-6)
      val reps = (0 until 40).map { b =>
        val ks = evs.map(e => (kOf(e._2, b), e._3))
        BigDecimal(ks.map(t => t._1 * t._2).sum.toDouble / ks.map(_._1).sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.sorted
      assert(math.abs(lo - reps.head) < 1e-9, s"$typ lo $lo vs ${reps.head}")
      assert(math.abs(hi - reps(38)) < 1e-9, s"$typ hi $hi vs ${reps(38)}")
      assert(lo <= mean && mean <= hi, s"$typ mean outside CI")
    }
  }

  test("diff in diff: brute cell means and estimate agree, arms match q171") {
    val r = Pipeline.queries("q203_diff_in_diff")(spark, sf).collect().head
    val (nP, tPre, tPost, cPre, cPost, did) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val e = Tables(spark, sf).events
    val raw = e.select(col("user_id"), col("event_type"),
        Tables.eventMicros(e).as("tus"),
        floor(col("value") * 100).cast("long").as("c")).collect()
      .map(row => (row.getLong(0), row.getString(1), row.getLong(2) / 86400000000L,
        row.getLong(3)))
    val (mn, mx) = (raw.map(_._3).min, raw.map(_._3).max)
    val cutoff = (mn + mx + 1) / 2
    def armOf(u: Long): Long =
      graft.expressions.SketchKernel.md5Lower64(s"ab:$u".getBytes("UTF-8")) & 1L
    val purch = raw.filter(_._2 == "purchase")
    assert(nP == purch.length)
    def cellMean(a: Long, post: Boolean): Double = {
      val cs = purch.filter(p => armOf(p._1) == a && (p._3 >= cutoff) == post)
      cs.map(_._4).sum.toDouble / cs.length
    }
    assert(math.abs(tPre - cellMean(1, post = false)) < 2e-6)
    assert(math.abs(tPost - cellMean(1, post = true)) < 2e-6)
    assert(math.abs(cPre - cellMean(0, post = false)) < 2e-6)
    assert(math.abs(cPost - cellMean(0, post = true)) < 2e-6)
    assert(math.abs(did - ((cellMean(1, true) - cellMean(1, false)) -
      (cellMean(0, true) - cellMean(0, false)))) < 5e-6)
  }

  test("capture recapture: brute sample recount, estimator sane on dup-free corpus") {
    val r = Pipeline.queries("q204_capture_recapture")(spark, sf).collect().head
    val (exact, nA, nB, nAB, nHat) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))
    val fps = Tables(spark, sf).documents.select(col("text")).collect()
      .map(row => {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(row.getString(0).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }).distinct
    assert(exact == fps.length)
    def in(salt: String, fp: String): Boolean =
      (graft.expressions.SketchKernel.md5Lower64(
        s"$salt$fp".getBytes("UTF-8")) & 7L) == 0L
    val a = fps.filter(in("cap_a:", _)).toSet
    val b = fps.filter(in("cap_b:", _)).toSet
    assert(nA == a.size && nB == b.size && nAB == (a & b).size)
    val brute = (nA + 1.0) * (nB + 1) / (nAB + 1) - 1.0
    assert(math.abs(nHat - brute) < 2e-6)
    // Chapman is biased low when overlap is tiny; at minimum it must be
    // >= the larger sample and finite
    assert(nHat >= math.max(nA, nB) - 1e-9)
  }

  test("audio pcm windows: brute decode-free recompute from (doc_id, n_chars)") {
    val got = Pipeline.queries("q205_audio_pcm_windows")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    def sample(seed: Long, k: Long): Long =
      ((seed + k) * 2654435761L) % 65536L - 32768L
    val want = Tables(spark, sf).documents
      .select(col("doc_id"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 % 3 == 1).sortBy(_._1).toSeq.flatMap { case (id, nc) =>
        val sr = (id % 5) match {
          case 0 => 8000L; case 1 => 16000L; case 2 => 22050L
          case 3 => 44100L; case _ => 48000L
        }
        val ch = if (id % 4 == 1) 1L else 2L
        val n = nc % 200 + 17
        (0L until n).map(k => (k / 32L, sample(id, k)))
          .groupBy(_._1).toSeq.sortBy(_._1).map { case (w, ks) =>
            (id, sr, ch, w, ks.size.toLong, ks.map(_._2).sum,
              ks.map(t => math.abs(t._2)).max)
          }
      }
    assert(got.length == want.length)
    assert(got == want, "every window recomputed without either codec side")
  }

  private def armOfUser(u: Long): Long =
    graft.expressions.SketchKernel.md5Lower64(s"ab:$u".getBytes("UTF-8")) & 1L

  private def purchasesByUser(): Map[Long, Seq[(Long, Long)]] = {
    // user -> [(day, cents)] over purchase events
    val e = Tables(spark, sf).events
    e.filter(col("event_type") === "purchase")
      .select(col("user_id"), Tables.eventMicros(e).as("tus"),
        floor(col("value") * 100).cast("long").as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 86400000000L, r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
  }

  test("kaplan meier: brute survival product over customer lifetimes") {
    val got = Pipeline.queries("q206_kaplan_meier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val perCust = Tables(spark, sf).orders
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("dus"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / 86400000000L))
      .groupBy(_._1).toSeq.map { case (_, rows) =>
        val ds = rows.map(_._2)
        (ds.max - ds.min + 1, ds.max)
      }
    val maxDay = perCust.map(_._2).max
    val lifetimes = perCust.map { case (dur, ld) => (dur, ld < maxDay - 90) }
    val byT = lifetimes.groupBy(_._1).toSeq.sortBy(_._1)
    var surv = 1.0
    val want = byT.flatMap { case (t, rows) =>
      val nRisk = lifetimes.count(_._1 >= t)
      val d = rows.count(_._2)
      if (d == 0) None
      else {
        surv *= (nRisk - d).toDouble / nRisk
        Some((t, nRisk.toLong, d.toLong,
          BigDecimal(surv).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
      }
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
      assert(math.abs(g._4 - w._4) < 2e-6, s"survival $g vs $w")
    }
    // survival is monotone non-increasing from 1
    assert(got.head._4 <= 1.0 + 1e-9)
    got.sliding(2).foreach(p =>
      if (p.length == 2) assert(p(1)._4 <= p(0)._4 + 1e-9))
  }

  test("cuped: brute moments, theta shrinks within-arm residual variance") {
    val rows = Pipeline.queries("q207_cuped")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val days = purchasesByUser().values.flatten.map(_._1)
    val cutoff = (days.min + days.max + 1) / 2
    val pu = purchasesByUser().map { case (u, evs) =>
      (armOfUser(u), evs.filter(_._1 < cutoff).map(_._2).sum,
        evs.filter(_._1 >= cutoff).map(_._2).sum)
    }.toSeq
    val n = pu.size.toLong
    val (sx, sy) = (pu.map(_._2).sum, pu.map(_._3).sum)
    val (sxy, sxx, syy) = (pu.map(t => t._2 * t._3).sum,
      pu.map(t => t._2 * t._2).sum, pu.map(t => t._3 * t._3).sum)
    val (mx, my) = (sx.toDouble / n, sy.toDouble / n)
    val cxy = sxy.toDouble / n - mx * my
    val vx = sxx.toDouble / n - mx * mx
    val vy = syy.toDouble / n - my * my
    val theta = cxy / vx
    val rho2 = cxy * cxy / (vx * vy)
    rows.foreach { r =>
      val au = pu.filter(_._1 == r._1)
      assert(r._2 == au.size)
      val myA = au.map(_._3).sum.toDouble / au.size
      val mxA = au.map(_._2).sum.toDouble / au.size
      assert(math.abs(r._3 - myA) < 2e-6)
      assert(math.abs(r._4 - (myA - theta * (mxA - mx))) < 2e-6)
      assert(math.abs(r._5 - theta) < 2e-6)
      assert(math.abs(r._6 - rho2) < 2e-6)
    }
    assert(rho2 > 0 && rho2 <= 1.0)
  }

  test("mann whitney: brute average-rank U statistic with tie correction") {
    val r = Pipeline.queries("q208_mann_whitney")(spark, sf).collect().head
    val (n1, n2, u1, z) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3))
    val e = Tables(spark, sf).events
    val obs = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), floor(col("value") * 100).cast("long").as("c"))
      .collect().map(r2 => (armOfUser(r2.getLong(0)), r2.getLong(1)))
    assert(n1 == obs.count(_._1 == 1L) && n2 == obs.count(_._1 == 0L))
    // average ranks over the sorted pooled sample
    val sorted = obs.map(_._2).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => (v, g.map(_._2 + 1).sum.toDouble / g.length) }
    val r1 = obs.filter(_._1 == 1L).map(o => rankOf(o._2)).sum
    val bruteU = r1 - n1.toDouble * (n1 + 1) / 2
    assert(math.abs(u1 - bruteU) < 1e-6, s"$u1 vs $bruteU")
    val n = (n1 + n2).toDouble
    val tie = obs.groupBy(_._2).values
      .map(g => { val t = g.length.toDouble; t * t * t - t }).sum
    val mu = n1.toDouble * n2 / 2
    val vu = n1.toDouble * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    assert(math.abs(z - (bruteU - mu) / math.sqrt(vu)) < 1e-5)
  }

  test("lorenz curve: brute decile shares, monotone means, ending at 1") {
    val got = Pipeline.queries("q209_lorenz_curve")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val per = purchasesByUser().toSeq
      .map { case (u, evs) => (u, evs.map(_._2).sum) }
      .sortBy(t => (t._2, t._1))
    val n = per.size
    val q = n / 10; val rem = n % 10
    val deciles = per.zipWithIndex.map { case ((_, c), i) =>
      val rn = i + 1
      val d = if (rn <= rem * (q + 1)) (rn + q) / (q + 1)
              else rem + (rn - rem * (q + 1) + q - 1) / q
      (d.toLong, c)
    }
    val byD = deciles.groupBy(_._1).toSeq.sortBy(_._1)
    val total = per.map(_._2).sum.toDouble
    var cum = 0L
    val want = byD.map { case (d, rows) =>
      cum += rows.map(_._2).sum
      (d, rows.size.toLong, rows.map(_._2).sum, cum / total)
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
      assert(math.abs(g._4 - w._4) < 2e-6)
    }
    assert(math.abs(got.last._4 - 1.0) < 1e-9, "shares end at 1")
    // sorted-ascending buckets: per-user decile MEANS are non-decreasing
    // (raw share increments can dip where ANSI ntile gives the earlier
    // decile one extra user, so compare means, not sums)
    val means = got.map(g => g._3.toDouble / g._2)
    means.sliding(2).foreach(p =>
      if (p.length == 2) assert(p(1) >= p(0) - 1e-9, "mean monotonicity"))
  }

  test("heaps law: brute gram first-occurrence growth and OLS fit") {
    val r = Pipeline.queries("q210_heaps_law")(spark, sf).collect().head
    val (nCk, beta, k, r2) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    assert(nCk == 16L)
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(row => (row.getLong(0), row.getString(1)))
    val firstDoc = scala.collection.mutable.Map[String, Long]()
    docs.sortBy(_._1).foreach { case (id, text) =>
      val ts = text.trim.split("\\s+").toSeq
      ts.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
        .foreach { g: String =>
          if (!firstDoc.contains(g)) firstDoc(g) = id }
    }
    val maxId = docs.map(_._1).max
    val pts = (1 to 16).map { kk =>
      val cut = (maxId + 1) * kk / 16
      (docs.count(_._1 < cut).toDouble,
        firstDoc.values.count(_ < cut).toDouble)
    }
    val xs = pts.map(p => math.log(p._1)); val ys = pts.map(p => math.log(p._2))
    val n = 16.0
    val (sx, sy) = (xs.sum, ys.sum)
    val (sxx, syy, sxy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum,
      xs.zip(ys).map(t => t._1 * t._2).sum)
    val bruteBeta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(beta - bruteBeta) < 1e-4, s"$beta vs $bruteBeta")
    assert(math.abs(k - math.exp((sy - bruteBeta * sx) / n)) < 1e-2)
    assert(math.abs(r2 - math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))) < 1e-4)
    assert(beta > 0 && beta < 1, "sub-linear vocabulary growth")
  }

  test("sprt: brute LLR walk and decision bands") {
    val got = Pipeline.queries("q211_sprt")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4)))
    val e = Tables(spark, sf).events
    val raw = e.select(col("user_id"), Tables.eventMicros(e).as("tus"),
        (col("event_type") === "purchase").as("conv")).collect()
      .filter(r2 => armOfUser(r2.getLong(0)) == 1L)
      .map(r2 => (r2.getLong(1) / 86400000000L, r2.getBoolean(2)))
    val byDay = raw.groupBy(_._1).toSeq.sortBy(_._1)
    var llr = 0.0
    val c1 = math.log(0.25 / 0.2); val c2 = math.log(0.75 / 0.8)
    val want = byDay.map { case (d, evs) =>
      val conv = evs.count(_._2).toLong
      llr += conv * c1 + (evs.length - conv) * c2
      (d, evs.length.toLong, conv, llr)
    }
    assert(got.length == want.length)
    val bound = math.log(19.0)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
      assert(math.abs(g._4 - w._4) < 2e-6)
      val dec = if (g._4 >= bound) "accept_h1"
                else if (g._4 <= -bound) "accept_h0" else "continue"
      assert(g._5 == dec)
    }
  }

  test("ngram novelty: brute first-occurrence ratio, doc 0 fully novel") {
    val got = Pipeline.queries("q212_ngram_novelty")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(row => (row.getLong(0), row.getString(1)))
    val grams = docs.map { case (id, text) =>
      (id, text.trim.split("\\s+").toSeq.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet)
    }
    val firstDoc = grams.flatMap { case (id, gs) => gs.map(g => (g, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = grams.filter(_._2.nonEmpty).sortBy(_._1).map { case (id, gs) =>
      val novel = gs.count(g => firstDoc(g) == id)
      (id, gs.size.toLong, novel.toLong, novel.toDouble / gs.size)
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
      assert(math.abs(g._4 - w._4) < 2e-6)
    }
    // the first doc's grams are all first occurrences by definition
    assert(got.head._4 == 1.0)
  }

  test("readability: brute regex recompute, bands respect rounded edges") {
    val got = Pipeline.queries("q213_readability")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(row => (row.getLong(0), row.getString(1)))
      .filter(d => d._2 != null && d._2.trim.nonEmpty).sortBy(_._1)
    assert(got.length == docs.length)
    got.zip(docs).foreach { case (g, (id, text)) =>
      assert(g._1 == id)
      val w = text.trim.split("\\s+").length.toLong
      val sRaw = "[.!?]+".r.findAllIn(text).length.toLong
      val sents = if (sRaw == 0) 1L else sRaw
      val syl = "[aeiouAEIOU]+".r.findAllIn(text).length.toLong
      assert(g._2 == w && g._3 == sents && g._4 == syl, s"counts for doc $id")
      val flesch = BigDecimal(206.835 - 1.015 * (w.toDouble / sents) -
        84.6 * (syl.toDouble / w))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(g._5 - flesch) < 2e-6)
      val band = if (g._5 >= 60) "easy" else if (g._5 >= 30) "medium"
                 else "hard"
      assert(g._6 == band)
    }
  }

  test("post stratification: brute quintile contrast and weighted fold") {
    val got = Pipeline.queries("q214_post_stratification")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getDouble(6)))
    val days = purchasesByUser().values.flatten.map(_._1)
    val cutoff = (days.min + days.max + 1) / 2
    val pu = purchasesByUser().toSeq.map { case (u, evs) =>
      (u, evs.filter(_._1 < cutoff).map(_._2).sum,
        evs.filter(_._1 >= cutoff).map(_._2).sum, armOfUser(u))
    }.sortBy(t => (t._2, t._1))
    val n = pu.size; val q = n / 5; val rem = n % 5
    val strata = pu.zipWithIndex.map { case ((_, _, y, arm), i) =>
      val rn = i + 1
      val st = if (rn <= rem * (q + 1)) (rn + q) / (q + 1)
               else rem + (rn - rem * (q + 1) + q - 1) / q
      (st.toLong, y, arm)
    }.groupBy(_._1).toSeq.sortBy(_._1)
    var wSum = 0.0; var wN = 0L
    val want = strata.map { case (st, rows) =>
      val t = rows.filter(_._3 == 1L); val c = rows.filter(_._3 == 0L)
      // one-arm strata report no contrast and are weighted out
      val ate = if (t.nonEmpty && c.nonEmpty)
        Some(t.map(_._2).sum.toDouble / t.size -
          c.map(_._2).sum.toDouble / c.size)
      else None
      ate.foreach { a => wSum += a * rows.size; wN += rows.size }
      (st, rows.size.toLong, t.size.toLong, ate)
    }
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
      assert(g._4.isDefined == w._4.isDefined, s"validity $g vs $w")
      (g._4, w._4) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 2e-6)
        case _ =>
      }
      assert(math.abs(g._5 - wSum / wN) < 2e-6)
    }
  }

  test("label silhouette: brute centroid silhouette, range law, planted separation") {
    val got = Pipeline.queries("q249_label_silhouette")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val embs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val byLbl = embs.groupBy(_._2)
    val cents = byLbl.view.mapValues { vs =>
      Array.tabulate(64)(i => vs.map(_._3(i)).sum / vs.size) }.toMap
    def dist(x: Array[Double], c: Array[Double]): Double =
      math.sqrt(x.zip(c).map(t => (t._1 - t._2) * (t._1 - t._2)).sum)
    val want = byLbl.toSeq.sortBy(_._1).map { case (l, vs) =>
      val rows = vs.map { case (_, _, x) =>
        val a = dist(x, cents(l))
        val b = cents.collect { case (l2, c) if l2 != l => dist(x, c) }.min
        val s = if (math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0
        (a, b, s)
      }
      (l, vs.size.toLong, rows.map(_._3).sum / rows.size,
        rows.map(_._1).sum / rows.size, rows.map(_._2).sum / rows.size)
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2, s"$g vs $w")
      // brute computes (x-c)^2 directly, the engine expands through
      // dot products — agree to FP-expansion tolerance
      assert(math.abs(g._3 - w._3) < 1e-4, s"label ${g._1} sil")
      assert(math.abs(g._4 - w._4) < 1e-4, s"label ${g._1} intra")
      assert(math.abs(g._5 - w._5) < 1e-4, s"label ${g._1} inter")
      // silhouette range law
      assert(g._3 >= -1.0 - 1e-9 && g._3 <= 1.0 + 1e-9)
    }
    // the fixture's labels are NOT planted clusters: the diagnostic
    // must say so (|mean s| ~ 0), not hallucinate separation
    assert(got.map(t => math.abs(t._3)).max < 0.1,
      "unstructured labels must read as silhouette ~ 0")
    // and a PLANTED separable labeling reads strongly positive: shift
    // each vector by +10 on dimension (label mod 64)
    val planted = embs.map { case (_, l, x) =>
      val y = x.clone(); y((l % 64).toInt) += 10.0; (l, y) }
    val pc = planted.groupBy(_._1).view.mapValues { vs =>
      Array.tabulate(64)(i => vs.map(_._2(i)).sum / vs.size) }.toMap
    val psil = planted.map { case (l, x) =>
      val a = dist(x, pc(l))
      val b = pc.collect { case (l2, c) if l2 != l => dist(x, c) }.min
      (b - a) / math.max(a, b)
    }
    assert(psil.sum / psil.length > 0.5,
      "a separable labeling must read strongly positive")
  }

  test("hard negatives: brute all-pairs mining, per-anchor top-3, never a near-dup") {
    import graft.functions.{shingles, tokens}
    val got = Pipeline.queries("q248_hard_negatives")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sh = Tables(spark, sf).documents
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
      .filter(_._2.nonEmpty)
    // the rare-shingle contract: candidates share a df <= 64 shingle
    val df = sh.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val rare = df.filter(_._2 <= 64).keySet
    val pairs = for {
      (a, sa) <- sh; (b, sb) <- sh
      if a < b && (sa & sb).exists(rare)
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j < 0.5
    } yield (a, b, math.floor(j * 1000000).toLong)
    val want = pairs.flatMap { case (a, b, m) => Seq((a, b, m), (b, a, m)) }
      .groupBy(_._1).toSeq.flatMap { case (anchor, ns) =>
        ns.sortBy(n => (-n._3, n._2)).take(3).zipWithIndex
          .map { case ((_, neg, m), i) => (anchor, (i + 1).toLong, neg, m) }
      }.sortBy(t => (t._1, t._2))
    assert(want.nonEmpty, "fixture should yield hard negatives")
    assert(got.toSeq == want, s"got ${got.length} vs brute ${want.length}; " +
      s"first diff: ${got.toSeq.zip(want).find(p => p._1 != p._2)}")
    // a mined negative is never a near-duplicate: disjoint from q31's pairs
    val dups = Pipeline.queries("q31_minhash_lsh_dedup")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (a, _, b, _) =>
      assert(!dups.contains((math.min(a, b), math.max(a, b))),
        s"($a, $b) is a verified near-dup, not a negative") }
  }

  test("kn perplexity: brute smoothed scores; types agree with q230's table") {
    val got = Pipeline.queries("q247_kn_perplexity")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val docToks = Tables(spark, sf).documents
      .select(col("doc_id"), graft.functions.tokens(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val bigrams = docToks.flatMap { case (d, ts) =>
      ts.zip(ts.drop(1)).map(p => (d, p)) }
    val cnt = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val types = cnt.keys.toSeq
    val caM = types.groupBy(_._1).view.mapValues(_.map(cnt).sum).toMap
    val naM = types.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nbM = types.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tt = types.size.toDouble
    def p(ab: (String, String)): Double =
      (cnt(ab) - 0.75) / caM(ab._1) +
        0.75 * naM(ab._1) / caM(ab._1) * (nbM(ab._2) / tt)
    val want = bigrams.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, bs) =>
      val bits = bs.map(b => -math.log(p(b._2)) / math.log(2.0))
      (d, bs.size.toLong, bits.sum / bits.size)
    }
    assert(got.length == want.length && got.map(_._1).sameElements(want.map(_._1)))
    got.zip(want).foreach { case ((d, n, bits, ppl), (wd, wn, wbits)) =>
      assert(d == wd && n == wn, s"doc $d bigram count")
      assert(math.abs(bits - wbits) < 2e-6, s"doc $d bits $bits vs $wbits")
      assert(math.abs(ppl - math.pow(2.0, wbits)) < math.abs(ppl) * 1e-5 + 2e-6)
      // perplexity of a smoothed model over a finite vocab is > 1
      assert(ppl > 1.0, s"doc $d ppl $ppl")
    }
    // the scored types ARE q230's table: its published top-20 pkn
    // values equal this model's p on the same (a, b)
    Pipeline.queries("q230_kneser_ney")(spark, sf).collect().foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val pk = r.getDouble(6)
      assert(math.abs(pk - BigDecimal(p(key))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"q230 pkn for $key")
    }
  }

  test("exact substring: planted >=50-token repeats cut exactly; 8-gram-only sharing is not") {
    val session = spark
    import session.implicits._
    // doc 0: the 100-token source. doc 1: a verbatim 62-token run from
    // doc 0 framed by unique tokens — the exact repeat q94's 8-gram
    // shared_frac can flag but cannot bound (the planted case VERDICT
    // r14 #8 asks for). doc 2: shares many 8-grams with doc 0 (10-token
    // chunks interleaved with unique separators) but never 50
    // consecutive tokens — exactly the sub-threshold sharing the
    // 50-token contract must NOT cut. doc 3: a same-doc self-repeat
    // (60-token run twice) — the second occurrence is removed.
    val src = (0 until 100).map(i => s"s$i")
    val run62 = src.slice(10, 72)
    val d1 = (0 until 20).map(i => s"a$i") ++ run62 ++ (0 until 20).map(i => s"b$i")
    val d2 = (0 until 5).flatMap(k =>
      src.slice(k * 10, k * 10 + 10) :+ s"x$k") ++ (0 until 10).map(i => s"c$i")
    val run60 = (0 until 60).map(i => s"r$i")
    val d3 = run60 ++ Seq("u1", "u2") ++ run60
    val docs = Seq(
      0L -> src.mkString(" "), 1L -> d1.mkString(" "),
      2L -> d2.mkString(" "), 3L -> d3.mkString(" "))
      .toDF("doc_id", "text")
    val got = graft.queries.DedupQueries.exactSubstringSpans(docs, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(got == List(
      // doc 0 holds every canonical copy: nothing removed
      (0L, 100L, 0L, 0L, 100L),
      // doc 1: windows 21..33 mark, one island, span = 33-21+50 = 62
      (1L, 102L, 1L, 62L, 40L),
      // doc 2: no 50-token window recurs (separators break every run)
      (2L, 65L, 0L, 0L, 65L),
      // doc 3: second occurrence of the 60-run (windows 63..73) cut
      (3L, 122L, 1L, 60L, 62L)))
    // threshold sensitivity: at w=10 doc 2's shared chunks DO mark
    // (each 10-token chunk recurs verbatim in doc 0)
    val w10 = graft.queries.DedupQueries.exactSubstringSpans(docs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(w10(2L) > 0L, "sub-threshold sharing is a threshold choice, not a blind spot")
  }

  test("kn heldout: brute four-branch scores; in-domain flags reproduce q247") {
    val got = Pipeline.queries("q250_kn_heldout")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    val docToks = Tables(spark, sf).documents
      .select(col("doc_id"), graft.functions.tokens(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    def isTrain(d: Long): Boolean =
      (graft.expressions.SketchKernel.md5Lower64(
        s"split:$d".getBytes("UTF-8")) & 1023L) < 819L
    val bigrams = docToks.flatMap { case (d, ts) =>
      ts.zip(ts.drop(1)).map(p => (d, p)) }
    val cntTr = bigrams.filter(b => isTrain(b._1)).groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val trainTypes = cntTr.keys.toSeq
    val caM = trainTypes.groupBy(_._1).view.mapValues(_.map(cntTr).sum)
      .toMap.withDefaultValue(0L)
    val naM = trainTypes.groupBy(_._1).view.mapValues(_.size.toLong)
      .toMap.withDefaultValue(0L)
    val nbM = trainTypes.groupBy(_._2).view.mapValues(_.size.toLong)
      .toMap.withDefaultValue(0L)
    val tt = trainTypes.size.toDouble
    // branch id 1..4 mirroring the query's CASE order
    def branch(ab: (String, String)): Int =
      if (cntTr(ab) > 0) 1
      else if (caM(ab._1) > 0 && nbM(ab._2) > 0) 2
      else if (nbM(ab._2) > 0) 3
      else 4
    def p(ab: (String, String)): Double = branch(ab) match {
      case 1 => (cntTr(ab) - 0.75) / caM(ab._1) +
        0.75 * naM(ab._1) / caM(ab._1) * (nbM(ab._2) / tt)
      case 2 => 0.75 * naM(ab._1) / caM(ab._1) * (nbM(ab._2) / tt)
      case 3 => nbM(ab._2) / tt
      case _ => 1.0 / (tt + 1.0)
    }
    val want = bigrams.filter(b => !isTrain(b._1)).groupBy(_._1).toSeq
      .sortBy(_._1).map { case (d, bs) =>
        val brs = bs.map(b => branch(b._2))
        val bits = bs.map(b => -math.log(p(b._2)) / math.log(2.0))
        (d, bs.size.toLong, brs.count(_ == 1).toLong,
          brs.count(_ == 2).toLong, brs.count(_ == 3).toLong,
          brs.count(_ == 4).toLong, bits.sum / bits.size)
      }
    assert(got.length == want.length &&
      got.map(_._1).sameElements(want.map(_._1)), "eval doc set")
    got.zip(want).foreach {
      case ((d, n, s1, s2, s3, s4, bits, ppl),
            (wd, wn, w1, w2, w3, w4, wbits)) =>
        assert(d == wd && n == wn, s"doc $d bigram count")
        assert((s1, s2, s3, s4) == ((w1, w2, w3, w4)), s"doc $d branches")
        assert(math.abs(bits - wbits) < 2e-6, s"doc $d bits $bits vs $wbits")
        assert(math.abs(ppl - math.pow(2.0, wbits)) <
          math.abs(ppl) * 1e-5 + 2e-6, s"doc $d ppl")
    }
    // the held-out point of the query: the non-seen branches genuinely
    // fire on the eval split (q136's discipline)
    assert(got.map(_._2).sum > 0, "some eval bigram is train-seen")
    assert(got.map(t => t._3 + t._4 + t._5).sum > 0,
      "some eval bigram is NOT train-seen (else the split is vacuous)")
    // in-domain parity pin: trainFlag = evalFlag = true degenerates to
    // q247 — every bigram seen, full-corpus counts, identical bits/ppl
    val all = graft.queries.TextQueries.knHeldoutScore(
      Tables(spark, sf).documents, lit(true), lit(true)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    val q247 = Pipeline.queries("q247_kn_perplexity")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(all.length == q247.length)
    all.zip(q247).foreach { case ((d, n, s1, s2, s3, s4, bits, ppl),
        (qd, qn, qbits, qppl)) =>
      assert(d == qd && n == qn && s1 == n && s2 == 0 && s3 == 0 && s4 == 0,
        s"doc $d in-domain branch counts")
      assert(bits == qbits && ppl == qppl, s"doc $d in-domain score parity")
    }
  }

  test("ipw ate: brute Hajek weights; point estimate equals q214's fold") {
    val r = Pipeline.queries("q245_ipw_ate")(spark, sf).collect().head
    val (nsu, nt, nc) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (m1, m0, ate, ess1, ess0) = (r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6), r.getDouble(7))
    val days = purchasesByUser().values.flatten.map(_._1)
    val cutoff = (days.min + days.max + 1) / 2
    val pu = purchasesByUser().toSeq.map { case (u, evs) =>
      (u, evs.filter(_._1 < cutoff).map(_._2).sum,
        evs.filter(_._1 >= cutoff).map(_._2).sum, armOfUser(u))
    }.sortBy(t => (t._2, t._1))
    val n = pu.size; val q = n / 5; val rem = n % 5
    val cells = pu.zipWithIndex.map { case ((_, _, y, arm), i) =>
      val rn = i + 1
      val st = if (rn <= rem * (q + 1)) (rn + q) / (q + 1)
               else rem + (rn - rem * (q + 1) + q - 1) / q
      (st.toLong, y, arm)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (st, rows) =>
      val t = rows.filter(_._3 == 1L); val c = rows.filter(_._3 == 0L)
      (st, rows.size, t.size, c.size, t.map(_._2).sum, c.map(_._2).sum)
    }.filter(x => x._3 > 0 && x._4 > 0)
    assert(nsu == cells.size.toLong && nt == cells.map(_._3).sum.toLong &&
      nc == cells.map(_._4).sum.toLong)
    var (t1, w1, w1b, t0, w0, w0b) = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    cells.foreach { case (_, nu, ntS, ncS, sy1, sy0) =>
      val e = ntS.toDouble / nu
      t1 += sy1 / e; w1 += ntS / e; w1b += ntS / (e * e)
      t0 += sy0 / (1.0 - e); w0 += ncS / (1.0 - e)
      w0b += ncS / ((1.0 - e) * (1.0 - e))
    }
    assert(math.abs(m1 - t1 / w1) < 2e-6)
    assert(math.abs(m0 - t0 / w0) < 2e-6)
    assert(math.abs(ate - (t1 / w1 - t0 / w0)) < 2e-6)
    assert(math.abs(ess1 - w1 * w1 / w1b) < 2e-6)
    assert(math.abs(ess0 - w0 * w0 / w0b) < 2e-6)
    // Kish ESS is positive and bounded by the arm size (Cauchy-Schwarz)
    assert(ess1 > 0 && ess1 <= nt + 1e-6)
    assert(ess0 > 0 && ess0 <= nc + 1e-6)
    // the cross-estimator law: with stratified propensities the Hajek
    // IPW point estimate IS q214's valid-strata post-stratified fold
    val postStrat = Pipeline.queries("q214_post_stratification")(spark, sf)
      .collect().head.getDouble(6)
    assert(math.abs(ate - postStrat) < 2e-6,
      s"IPW $ate diverges from post-stratified $postStrat")
  }

  test("cohort ltv: brute cohort fold, curves cumulative and monotone") {
    val got = Pipeline.queries("q215_cohort_ltv")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val ords = Tables(spark, sf).orders
      .select(col("o_custkey"), year(col("o_orderdate").cast("date"))
        .cast("long").as("yr"),
        floor(col("o_totalprice") * 100).cast("long").as("c")).collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2)))
    val firstYr = ords.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = firstYr.values.groupBy(identity).view.mapValues(_.size).toMap
    val cells = ords.map(o => ((firstYr(o._1), o._2 - firstYr(o._1)), o._3))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = cells.keys.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (cy, ks) =>
        var cum = 0L
        ks.toSeq.sortBy(_._2).map { case (_, age) =>
          cum += cells((cy, age))
          (cy, age, sizes(cy).toLong, cells((cy, age)), cum,
            cum.toDouble / sizes(cy))
        }
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 &&
        g._4 == w._4 && g._5 == w._5, s"$g vs $w")
      assert(math.abs(g._6 - w._6) < 2e-6)
    }
  }

  test("mrl truncation: brute prefix-dim recall against local full top-5") {
    val got = Pipeline.queries("q216_mrl_truncation")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val embs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < d) { dp += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      BigDecimal(dp / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def top5(qid: Long, qe: Array[Double], d: Int): Set[Long] =
      embs.filter(_._1 != qid)
        .map { case (id, e) => (id, cos(qe, e, d)) }
        .sortBy(t => (-t._2, t._1)).take(5).map(_._1).toSet
    val queries10 = embs.filter(_._1 < 10)
    val want = for (d <- Seq(8, 16, 32); (qid, qe) <- queries10) yield {
      val hits = (top5(qid, qe, d) & top5(qid, qe, 64)).size.toLong
      (d.toLong, qid, hits, hits.toDouble / 5)
    }
    assert(got.length == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
      assert(math.abs(g._4 - w._4) < 1e-9)
    }
    // wider prefixes can only help on average
    val avg = got.groupBy(_._1).view.mapValues(v =>
      v.map(_._4).sum / v.length).toMap
    assert(avg(32L) >= avg(8L) - 1e-9, "recall grows with prefix width")
  }

  test("revenue autocorr: brute day-aligned pearson at both lags") {
    val got = Pipeline.queries("q217_revenue_autocorr")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val daily = purchasesByUser().values.flatten.toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = Seq(1L, 7L).map { k =>
      val pairs = daily.toSeq.sortBy(_._1).flatMap { case (d, x) =>
        daily.get(d - k).map(y => (x.toDouble, y.toDouble))
      }
      val n = pairs.length
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val (sxy, sxx, syy) = (pairs.map(t => t._1 * t._2).sum,
        pairs.map(t => t._1 * t._1).sum, pairs.map(t => t._2 * t._2).sum)
      val r = (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) *
        math.sqrt(n * syy - sy * sy))
      (k, n.toLong, r)
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2, s"$g vs $w")
      assert(math.abs(g._3 - w._3) < 2e-6)
      assert(g._3 >= -1.0 - 1e-9 && g._3 <= 1.0 + 1e-9)
    }
  }

  test("dup pagerank: brute fixed-point trajectory over the q31 edge set") {
    val got = Pipeline.queries("q218_dup_pagerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = Pipeline.queries("q31_minhash_lsh_dedup")(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = pairs.flatMap(p => Seq(p, p.swap))
    val deg = und.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var sc = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val contrib = und.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => sc(u) / deg(u) }.sum
      }
      sc = deg.keys.map(v =>
        v -> (150000L + 850000L * contrib.getOrElse(v, 0L) / 1000000L)).toMap
    }
    val want = sc.toSeq.sortBy { case (v, s0) => (-s0, v) }.take(20)
      .zipWithIndex.map { case ((v, s0), i) => ((i + 1).toLong, v, s0) }
    assert(got.toSeq == want, "distributed rounds == local trajectory")
    // scores stay in the fixed-point PageRank range [0.15, deg-bounded]
    assert(got.forall(_._3 >= 150000L))
  }

  test("triangle census: brute count over the q31 edge set, each counted once") {
    val got = Pipeline.queries("q244_triangle_census")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val pairs = Pipeline.queries("q31_minhash_lsh_dedup")(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = pairs.toSeq.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // brute: each triangle {a<b<c} counted once via its smallest edge
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    var total = 0L
    for ((a, b) <- pairs; c <- adj(a) if c > b && adj(b).contains(c)) {
      total += 1
      triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1
    }
    assert(total > 0, "fixture should contain at least one dup triangle")
    assert(got.map(_._1).toSet == adj.keySet, "one row per dup-graph node")
    got.foreach { case (v, degree, nTri, clus) =>
      assert(degree == adj(v).size.toLong, s"degree of $v")
      assert(nTri == triPerNode(v), s"triangles of $v")
      if (degree >= 2) {
        val b = 2.0 * triPerNode(v) / (degree * (degree - 1.0))
        assert(math.abs(clus.get - BigDecimal(b)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
        assert(clus.get >= 0.0 && clus.get <= 1.0 + 1e-9)
      } else assert(clus.isEmpty, s"deg-1 node $v must report null clustering")
    }
    // handshake law: per-node participation sums to 3x the census
    assert(got.map(_._3).sum == 3L * total)
  }

  test("mde power: brute moments, symmetric in arms, shrinks with n") {
    val r = Pipeline.queries("q219_mde_power")(spark, sf).collect().head
    val (n1, n0, mean, sd, mdeAbs, mdeRel) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val ys = purchasesByUser().toSeq.map { case (u, evs) =>
      (armOfUser(u), evs.map(_._2).sum) }
    assert(n1 == ys.count(_._1 == 1L) && n0 == ys.count(_._1 == 0L))
    val n = ys.size
    val my = ys.map(_._2).sum.toDouble / n
    val s2 = (ys.map(t => t._2.toDouble * t._2).sum / n - my * my) *
      (n.toDouble / (n - 1))
    assert(math.abs(mean - my) < 2e-6)
    assert(math.abs(sd - math.sqrt(s2)) < 2e-6)
    val brute = (1.959964 + 0.841621) *
      math.sqrt(s2 * (1.0 / n1 + 1.0 / n0))
    assert(math.abs(mdeAbs - brute) < 2e-6)
    assert(math.abs(mdeRel - brute / my) < 2e-6)
    // sanity: the detectable lift is positive and a sensible fraction
    assert(mdeAbs > 0 && mdeRel > 0)
  }

  test("source semantic matrix: brute centroids, diagonal-free, symmetric range") {
    val got = Pipeline.queries("q220_source_semantic_matrix")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val src = Tables(spark, sf).documents
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (src(r.getLong(0)),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val bySrc = vecs.groupBy(_._1)
    val cents = bySrc.view.mapValues { vs =>
      val n = vs.length
      (Array.tabulate(64)(d => vs.map(_._2(d)).sum / n), n.toLong)
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < 64) { dp += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val srcs = cents.keys.toSeq.sorted
    val want = for (i <- srcs.indices; j <- i + 1 until srcs.length) yield {
      val (ca, na) = cents(srcs(i)); val (cb, nb) = cents(srcs(j))
      (srcs(i), srcs(j), na, nb, cos(ca, cb))
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4,
        s"$g vs $w")
      assert(math.abs(g._5 - w._5) < 2e-6)
      assert(g._5 >= -1.0 - 1e-9 && g._5 <= 1.0 + 1e-9)
    }
  }

  test("dedup threshold sweep: brute recount from q31 pairs, monotone") {
    val got = Pipeline.queries("q221_dedup_threshold_sweep")(spark, sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val pairs = Pipeline.queries("q31_minhash_lsh_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = Seq(0.90, 0.92, 0.95, 0.98).map { t =>
      val sel = pairs.filter(_._3 >= t)
      val docs = sel.flatMap(p => Seq(p._1, p._2)).distinct.length
      (t, sel.length.toLong, docs.toLong,
        if (sel.isEmpty) 0.0 else sel.map(_._3).sum / sel.length)
    }
    assert(got.length == want.count(_._2 > 0) ||
      got.length == want.length)
    got.zip(want.filter(w => got.exists(_._1 == w._1))).foreach {
      case (g, w) =>
        assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
        assert(math.abs(g._4 - w._4) < 2e-6)
    }
    // pair volume and doc coverage shrink as the threshold tightens
    got.sliding(2).foreach(p => if (p.length == 2) {
      assert(p(1)._2 <= p(0)._2 && p(1)._3 <= p(0)._3)
    })
  }

  test("ann recall audit equals the locally-joined q36/q57 intersection") {
    val audit = Pipeline.queries("q158_ann_recall_audit")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sortBy(_._1)
    val exact = Pipeline.queries("q36_ann_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = Pipeline.queries("q57_ann_ivf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(audit.nonEmpty && audit.map(_._1).toSet == exact.keySet)
    audit.foreach { case (qid, hits, recall) =>
      val expect = exact(qid).intersect(approx.getOrElse(qid, Set.empty)).size
      assert(hits == expect, s"qid $qid: $hits vs $expect")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(math.abs(recall - expect.toDouble / exact(qid).size) < 1e-6)
    }
  }

  test("gramian aggregate matches brute-force outer-product sums at any partitioning") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(155)
    val d = 5
    val vecs = Seq.fill(40)(Array.fill(d)(rnd.nextInt(2001) - 1000L))
    def brute: Array[Long] = {
      val acc = new Array[Long](d * (d + 1) / 2)
      for (v <- vecs) {
        var off = 0
        for (i <- 0 until d; j <- i until d) {
          acc(off) += v(i) * v(j); off += 1
        }
      }
      acc
    }
    for (parts <- Seq(1, 3, 7)) {
      val got = vecs.map(_.toSeq).toDF("v").repartition(parts)
        .select(gramian(col("v"), d).as("g"))
        .head.getSeq[Long](0).toArray
      assert(got.toSeq == brute.toSeq, s"parts=$parts")
    }
  }

  test("pca projection: fixed-point component captures at least the best axis variance") {
    // Power iteration converges to the top eigenvector; after 12
    // fixed-point rounds the Rayleigh quotient v'Cv/v'v must at least
    // dominate every coordinate axis (whose quotient is C_ii) — a
    // floor any correct eigensolver clears, and a sharp failure if the
    // iteration diverged, overflowed, or renormalized wrong.
    val q = Tables(spark, sf).embeddings
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * 10000d + 0.5).cast("long")).as("qv"))
    val d = 64
    val mean = q.select(posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .collect().sortBy(_.getInt(0))
    val n = mean.head.getLong(2)
    val mm = mean.map(r => math.floor(r.getLong(1).toDouble / n + 0.5).toLong)
    val tri = q.select(gramian(zip_with(col("qv"), lit(mm), (a, b) => a - b), d).as("g"))
      .head.getSeq[Long](0)
    val a = Array.ofDim[Long](d, d)
    var off = 0
    for (i <- 0 until d; j <- i until d) {
      a(i)(j) = tri(off); a(j)(i) = tri(off); off += 1
    }
    // re-derive the component exactly as q155 does (memo-independent)
    var vv = Array.fill(d)(1000000L)
    for (_ <- 0 until 12) {
      val u = Array.tabulate(d) { i =>
        (0 until d).map(j => BigInt(a(i)(j)) * vv(j)).sum
      }
      val mx = u.map(_.abs).max.max(BigInt(1))
      vv = u.map(x => (BigInt(x.signum) * ((x.abs * 1000000) / mx)).toLong)
    }
    def rayleigh(v: Array[Long]): Double = {
      val num = (for (i <- 0 until d; j <- 0 until d)
        yield BigInt(a(i)(j)) * v(i) * v(j)).sum
      val den = v.map(x => BigInt(x) * x).sum
      (BigDecimal(num) / BigDecimal(den)).toDouble
    }
    val axisBest = (0 until d).map(i => a(i)(i).toDouble).max
    assert(rayleigh(vv) >= axisBest * 0.999,
      s"rayleigh ${rayleigh(vv)} vs best axis $axisBest")

    // and the query itself is deterministic + partitioning-invariant:
    // a fresh dataset-dir copy (fresh memo key) reproduces bit-exact
    val out = Pipeline.queries("q155_pca_project")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length > 0)
    val dir2 = java.nio.file.Files.createTempDirectory("q155det").toString
    spark.read.parquet(s"$sf/embeddings.parquet").repartition(7)
      .write.mode("overwrite").parquet(s"$dir2/embeddings.parquet")
    val again = Pipeline.queries("q155_pca_project")(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }

  test("kneser-ney: brute bigram-type recompute; a context's mass sums to 1") {
    val got = Pipeline.queries("q230_kneser_ney")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    val texts = Tables(spark, sf).documents.select(col("text")).collect()
      .map(_.getString(0))
    val pairs = texts.flatMap { t =>
      val w = t.trim.split("\\s+")
      if (w.length < 2) Seq.empty[(String, String)]
      else w.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val cnt = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ca = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val na = cnt.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nb = cnt.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tt = cnt.size.toLong
    def pkn(a: String, b: String): Double =
      (cnt((a, b)) - 0.75) / ca(a) +
        0.75 * na(a) / ca(a) * (nb(b).toDouble / tt)
    val want = cnt.toSeq.map { case ((a, b), c) => (a, b, c) }
      .sortBy { case (a, b, c) => (-c, a, b) }.take(20)
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, (a, b, c)) =>
      assert((g._1, g._2, g._3) == (a, b, c), s"$g vs ($a,$b,$c)")
      assert(g._4 == ca(a) && g._5 == na(a) && g._6 == nb(b), s"marginals $g")
      assert(math.abs(g._7 - pkn(a, b)) < 1e-6, s"pkn $g vs ${pkn(a, b)}")
    }
    // the KN normalization law: for a fixed context a, the seen
    // discounted terms plus the redistributed continuation mass over
    // the ENTIRE vocabulary sum to exactly 1
    val a0 = got.head._1
    val seen = cnt.keys.filter(_._1 == a0).map(_._2).toSeq
    val sumSeen = seen.map(b => (cnt((a0, b)) - 0.75) / ca(a0)).sum
    val sumCont = 0.75 * na(a0) / ca(a0) * (nb.values.sum.toDouble / tt)
    assert(math.abs(sumSeen + sumCont - 1.0) < 1e-9, "context mass != 1")
  }

  test("mann-kendall: brute pairwise recompute; planted monotone series") {
    val r = Pipeline.queries("q231_mann_kendall")(spark, sf).collect().head
    val daily = purchasesByUser().toSeq.flatMap(_._2)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val n = daily.size
    assert(r.getLong(0) == n)
    val prs = for (i <- 0 until n; j <- i + 1 until n) yield (daily(i), daily(j))
    val s = prs.map { case ((_, r1), (_, r2)) =>
      if (r2 > r1) 1L else if (r2 < r1) -1L else 0L }.sum
    assert(r.getLong(1) == s, s"S ${r.getLong(1)} vs $s")
    val m = prs.size.toDouble
    assert(math.abs(r.getDouble(2) - s / m) < 1e-6, "tau")
    val sumT = daily.groupBy(_._2).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val varS = (n.toLong * (n - 1) * (2L * n + 5) - sumT) / 18.0
    assert(math.abs(r.getDouble(3) - varS) < 1e-4, "var_s")
    val z = if (s > 0) (s - 1) / math.sqrt(varS)
            else if (s < 0) (s + 1) / math.sqrt(varS) else 0.0
    assert(math.abs(r.getDouble(4) - z) < 1e-6, "z")
    val slopes = prs.map { case ((d1, r1), (d2, r2)) =>
      (r2 - r1).toDouble / (d2 - d1) }.sorted
    val mi = slopes.size
    val sen = (slopes((mi + 1) / 2 - 1) + slopes((mi + 2) / 2 - 1)) / 2
    assert(math.abs(r.getDouble(5) - sen) < 1e-6, "sen slope")

    // planted strictly-increasing series: S = n(n-1)/2, tau = 1,
    // every pairwise slope = 100 cents/day
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q231mk").toString
    (0 until 6).map(d => (java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(d * 86400L)), "purchase",
        (d + 1).toDouble))
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val p = Pipeline.queries("q231_mann_kendall")(spark, dir).collect().head
    assert(p.getLong(0) == 6 && p.getLong(1) == 15)
    assert(math.abs(p.getDouble(2) - 1.0) < 1e-9, "planted tau")
    // the engine reports var_s rounded to 6dp (510/18 = 28.3(3))
    assert(math.abs(p.getDouble(3) - 6.0 * 5 * 17 / 18) < 1e-6, "planted var")
    assert(math.abs(p.getDouble(5) - 100.0) < 1e-9, "planted sen slope")
  }

  test("bh-fdr: brute welch z, normal tail and benjamini-hochberg cutoffs") {
    val got = Pipeline.queries("q232_fdr_bh")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6), r.getBoolean(7)))
    val rows = Tables(spark, sf).events
      .select(col("event_type"), col("user_id"),
        floor(col("value") * 100).cast("long").as("c")).collect()
      .map(r2 => (r2.getString(0), armOfUser(r2.getLong(1)), r2.getLong(2)))
    def phiTail(x: Double): Double = {
      val t = 1.0 / (1.0 + 0.2316419 * math.abs(x))
      val poly = ((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
        - 0.356563782) * t + 0.319381530) * t
      0.3989422804014327 * math.exp(-math.abs(x) * math.abs(x) / 2.0) * poly
    }
    val stats = rows.map(_._1).distinct.sorted.map { ty =>
      val g1 = rows.filter(r2 => r2._1 == ty && r2._2 == 1L).map(_._3)
      val g0 = rows.filter(r2 => r2._1 == ty && r2._2 == 0L).map(_._3)
      def mean(g: Array[Long]) = g.sum.toDouble / g.length
      def s2(g: Array[Long]) = {
        val mm = mean(g)
        g.map(x => (x - mm) * (x - mm)).sum / (g.length - 1.0)
      }
      val z = (mean(g1) - mean(g0)) /
        math.sqrt(s2(g1) / g1.length + s2(g0) / g0.length)
      (ty, g1.length.toLong, g0.length.toLong, z, 2.0 * phiTail(z))
    }
    val ranked = stats.sortBy(s => (s._5, s._1)).zipWithIndex
      .map { case (s, i) => (s, i + 1L) }
    val mc = ranked.size
    val kmax = ranked.filter { case (s, rk) => s._5 <= 0.05 * rk / mc }
      .map(_._2).maxOption.getOrElse(0L)
    assert(got.length == mc && mc >= 2)
    got.zip(ranked).foreach { case (g, (s, rk)) =>
      assert(g._1 == s._1 && g._2 == s._2 && g._3 == s._3, s"$g vs $s")
      assert(math.abs(g._4 - s._4) < 2e-6, s"z ${g._4} vs ${s._4}")
      assert(math.abs(g._5 - s._5) < 1e-6, s"p ${g._5} vs ${s._5}")
      assert(g._6 == rk, s"rank ${g._6} vs $rk")
      assert(math.abs(g._7 - 0.05 * rk / mc) < 1e-9, "crit")
      assert(g._8 == (rk <= kmax), s"significance flag at rank $rk")
    }
    // BH rejects a PREFIX of the p-ordered metrics, never a gap
    val flags = got.sortBy(_._6).map(_._8)
    assert(flags.sliding(2).forall(w => w.length < 2 || w(0) || !w(1)),
      "rejections must be a rank prefix")
  }

  test("qte deciles: brute per-arm ANSI ntile recompute") {
    val got = Pipeline.queries("q233_qte_deciles")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    val per = purchasesByUser().toSeq
      .map { case (u, evs) => (u, evs.map(_._2).sum, armOfUser(u)) }
    def deciles(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
      // (y, decile) under ANSI ntile(10) over (y asc, user asc)
      val sorted = rows.sortBy(t => (t._2, t._1))
      val n = sorted.size; val q = n / 10; val rem = n % 10
      sorted.zipWithIndex.map { case ((_, y, _), i) =>
        val rn = i + 1
        val d = if (rn <= rem * (q + 1)) (rn + q) / (q + 1)
                else rem + (rn - rem * (q + 1) + q - 1) / q
        (y, d.toLong)
      }
    }
    val all = per.groupBy(_._3).toSeq.flatMap { case (arm, rows) =>
      deciles(rows).map { case (y, d) => (arm, y, d) } }
    val byD = all.groupBy(_._3).toSeq.sortBy(_._1)
    assert(got.length == byD.length && got.length == 10)
    got.zip(byD).foreach { case (g, (d, rows)) =>
      val t = rows.filter(_._1 == 1L); val c = rows.filter(_._1 == 0L)
      assert(g._1 == d && g._2 == t.size && g._3 == c.size, s"counts $g")
      val mt = if (t.nonEmpty) Some(t.map(_._2).sum.toDouble / t.size) else None
      val mc = if (c.nonEmpty) Some(c.map(_._2).sum.toDouble / c.size) else None
      def close(a: Option[Double], b: Option[Double]) = (a, b) match {
        case (Some(x), Some(y)) => math.abs(x - y) < 1e-6
        case (None, None) => true
        case _ => false
      }
      assert(close(g._4, mt) && close(g._5, mc), s"means $g vs ($mt, $mc)")
      val qte = for (x <- mt; y <- mc) yield x - y
      assert(close(g._6, qte), s"qte $g vs $qte")
    }
  }

  test("kmv unique-vocab: brute sketch-difference recompute; unsaturated = exact") {
    val got = Pipeline.queries("q236_kmv_unique_vocab")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val rows = Tables(spark, sf).documents
      .select(col("source"), shingles(tokens(col("text")), 3).as("sh"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val bySrc = rows.groupBy(_._1).view
      .mapValues(_.flatMap(_._2).toSet).toMap
    def h(t: String): Long =
      graft.expressions.SketchKernel.md5Lower64(s"kmv:$t".getBytes("UTF-8")) &
        281474976710655L
    val sk = bySrc.view.mapValues(s => s.map(h).toSeq.sorted.take(128)).toMap
    assert(got.nonEmpty && got.exists(_._3 > 0), "fixture has unique grams")
    got.foreach { case (src, nd, uniq, est) =>
      assert(nd == bySrc(src).size.toLong, s"$src vocab")
      val exactUniq = bySrc(src).count(t =>
        !bySrc.exists { case (o, s2) => o != src && s2.contains(t) })
      assert(uniq == exactUniq, s"$src unique: $uniq vs $exactUniq")
      val rest = sk.filter(_._1 != src).values.flatten.toSet.toSeq
        .sorted.take(128)
      val un = (sk(src) ++ rest).distinct.sorted.take(128)
      val ku = un.size
      val ma = un.count(x => sk(src).contains(x) && !rest.contains(x))
      val uEst = if (ku < 128) ku.toDouble
                 else 127.0 * 281474976710656.0 / un.last
      val want = ma.toDouble / ku * uEst
      assert(math.abs(est - want) < 1e-3, s"$src: est $est vs brute $want")
    }
    // planted UNSATURATED corpus (6 gram types < k): the sketches hold
    // the full sets, so the difference estimate is exactly the answer
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q236kmv").toString
    Seq((1L, "a b c d e f", "s1"), (2L, "c d e f g h", "s2"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val p = Pipeline.queries("q236_kmv_unique_vocab")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // each source: 4 grams, 2 shared ("c d e", "d e f") -> 2 unique
    assert(p.map(_._1).toSeq == Seq("s1", "s2"))
    p.foreach { case (srcN, nd, uniq, est) =>
      assert(nd == 4L && uniq == 2L, s"$srcN $nd $uniq")
      assert(math.abs(est - 2.0) < 1e-9, s"$srcN est $est not exact")
    }
  }

  test("k-center coreset: brute greedy recompute; coverage radius shrinks") {
    val got = Pipeline.queries("q234_kcenter_coreset")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = Tables(spark, sf).embeddings
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * 10000d + 0.5).cast("long")).as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val centers = scala.collection.mutable.ArrayBuffer(vecs.head)
    val want = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val dm = scala.collection.mutable.Map(
      vecs.map(v => v._1 -> d2(v._2, vecs.head._2)): _*)
    for (i <- 0 until 8) {
      // argmax of running min-distance, lowest vec_id on ties
      val far = vecs.maxBy(v => (dm(v._1), -v._1))
      want += ((i.toLong, centers(i)._1, dm(far._1)))
      if (i < 7) {
        centers += far
        vecs.foreach(v => dm(v._1) = math.min(dm(v._1), d2(v._2, far._2)))
      }
    }
    assert(got.toSeq == want.toSeq,
      s"greedy selection diverges:\n${got.toSeq}\nvs\n${want.toSeq}")
    // the coverage guarantee: admitting each center never widens the
    // max-min radius
    got.map(_._3).sliding(2).foreach(w =>
      if (w.length == 2) assert(w(1) <= w(0), "radius must shrink"))
  }

  test("audio noisiness: every ZCR window recomputed without either codec side") {
    val got = Pipeline.queries("q235_audio_noisiness")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    def sample(seed: Long, k: Long): Long =
      ((seed + k) * 2654435761L) % 65536L - 32768L
    val meta = Tables(spark, sf).documents
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1) % 200 + 17)).sortBy(_._1)
    assert(got.length == meta.length && got.nonEmpty)
    got.zip(meta).foreach { case (g, (id, ns)) =>
      assert(g._1 == id)
      val wins = (0L until ns).map { k =>
        val cross = k > 0 && (sample(id, k) >= 0) != (sample(id, k - 1) >= 0)
        (k / 32L, if (cross) 1L else 0L, math.abs(sample(id, k)))
      }.groupBy(_._1).toSeq.map { case (_, ks) =>
        (ks.size.toLong, ks.map(_._2).sum, ks.map(_._3).sum)
      }
      val zcr = wins.map(_._2).sum
      assert(g._2 == wins.size && g._3 == ns && g._4 == zcr, s"doc $id $g")
      assert(g._5 == wins.count(w => w._2 * 32 >= w._1 * 30), s"doc $id flags")
      assert(g._6 == wins.map(_._3).max, s"doc $id l1")
      assert(math.abs(g._7 - zcr.toDouble / (ns - 1)) < 1e-6, s"doc $id ratio")
    }
    // the high-ZCR cutoff genuinely discriminates on this corpus
    assert(got.exists(_._5 == 0) || got.exists(g => g._5 < g._2),
      "flag must not be all-ones")
    assert(got.exists(_._5 > 0), "flag must not be all-zeros")
  }

  test("label propagation: brute kNN graph + 3 frozen majority rounds") {
    val got = Pipeline.queries("q237_label_propagation")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4))))
    val embs = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2)))
    val n = embs.length
    val bigK = math.max(16L, n.toLong / 125L).toInt
    def md5s(x: String): Long =
      graft.expressions.SketchKernel.md5Lower64(x.getBytes("UTF-8"))
    val rad = Array.tabulate(bigK, 64)((k, i) =>
      if ((md5s(s"ivf_${k}_${i}") & 1L) == 1L) 1.0 else -1.0)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ss = embs.map(e => e._2.map(x => x * x).sum)
    val cellOf = embs.map { case (_, v, _) =>
      (0 until bigK).map(k => ((0 until 64).map(i => v(i) * rad(k)(i)).sum, k))
        .maxBy(t => (t._1, -t._2))._2
    }
    // within-cell top-3 cosine neighbors, symmetrized
    val idx = embs.indices
    val edges = scala.collection.mutable.Set.empty[(Long, Long)]
    idx.groupBy(cellOf).values.foreach { members =>
      members.foreach { a =>
        val top = members.filter(_ != a).map { b =>
          val dot = (0 until 64).map(i => embs(a)._2(i) * embs(b)._2(i)).sum
          (round6(dot / (math.sqrt(ss(a)) * math.sqrt(ss(b)))), embs(b)._1)
        }.sortBy(t => (-t._1, t._2)).take(3)
        top.foreach { case (_, nb) =>
          val (u, v) = (math.min(embs(a)._1, nb), math.max(embs(a)._1, nb))
          edges += ((u, v))
        }
      }
    }
    val adj = edges.toSeq.flatMap { case (u, v) => Seq((u, v), (v, u)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val trueLab = embs.map(e => e._1 -> e._3).toMap
    val lab = scala.collection.mutable.Map.empty[Long, (Int, Long)]
    embs.map(_._1).filter(_ % 5 == 0).foreach(id => lab(id) = (trueLab(id), 0L))
    for (t <- 1 to 3) {
      val newly = adj.keys.filter(!lab.contains(_)).flatMap { u =>
        val votes = adj(u).filter(lab.contains).map(v => lab(v)._1)
        if (votes.isEmpty) None
        else {
          val best = votes.groupBy(identity).toSeq
            .map { case (l, vs) => (l, vs.size) }
            .maxBy { case (l, c) => (c, -l) }._1
          Some(u -> ((best, t.toLong)))
        }
      }.toSeq
      newly.foreach { case (u, lv) => lab(u) = lv }
    }
    assert(got.length == n)
    got.foreach { case (id, isSeed, labOut, rnd, correct) =>
      assert(isSeed == (id % 5 == 0 && lab.contains(id) && lab(id)._2 == 0L),
        s"seed flag $id")
      val want = lab.get(id)
      assert(labOut == want.map(_._1) && rnd == want.map(_._2),
        s"vertex $id: ($labOut, $rnd) vs $want")
      assert(correct == want.map(_._1 == trueLab(id)), s"audit $id")
    }
    // propagation genuinely spreads: some non-seed gets labeled in
    // round 1 and assignments never change once made (frozen by
    // construction of the brute — the engine must agree everywhere)
    assert(got.exists(g => !g._2 && g._4.contains(1L)), "round-1 spread")
  }

  test("cmh strata: brute 2x2 tables; MH odds ratio inside the stratum range") {
    val got = Pipeline.queries("q238_cmh_strata")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    val e = Tables(spark, sf).events
    val rows = e.select(col("user_id"), Tables.eventMicros(e).as("tus"),
        (col("event_type") === "purchase").as("conv")).collect()
      .map(r => (armOfUser(r.getLong(0)), (r.getLong(1) / 86400000000L) % 7,
        r.getBoolean(2)))
    val strata = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (dow, rs) =>
      val a = rs.count(r => r._1 == 1L && r._3).toLong
      val b = rs.count(r => r._1 == 1L && !r._3).toLong
      val c = rs.count(r => r._1 == 0L && r._3).toLong
      val d = rs.count(r => r._1 == 0L && !r._3).toLong
      (dow, a, b, c, d)
    }
    assert(got.map(g => (g._1, g._2, g._3, g._4, g._5)).toSeq == strata)
    val num = strata.map { case (_, a, b, c, d) =>
      val t = (a + b + c + d).toDouble
      a.toDouble - (a + b).toDouble * (a + c) / t }.sum
    val den = strata.map { case (_, a, b, c, d) =>
      val t = (a + b + c + d).toDouble
      (a + b).toDouble * (c + d) * (a + c) * (b + d) / (t * t * (t - 1)) }.sum
    val orn = strata.map { case (_, a, b, c, d) =>
      a.toDouble * d / (a + b + c + d) }.sum
    val ord = strata.map { case (_, a, b, c, d) =>
      b.toDouble * c / (a + b + c + d) }.sum
    got.foreach { g =>
      assert(math.abs(g._7 - orn / ord) < 1e-5, s"or_mh ${g._7}")
      assert(math.abs(g._8 - num * num / den) < 1e-4, s"cmh ${g._8}")
    }
    // the MH common odds ratio is a positive-weighted average of the
    // stratum odds ratios, so it must lie within their range
    val ors = got.map(_._6)
    assert(got.head._7 >= ors.min - 1e-9 && got.head._7 <= ors.max + 1e-9,
      "or_mh outside stratum range")
  }

  test("jackknife ratio: brute leave-one-day-out recompute; CI brackets") {
    val r = Pipeline.queries("q239_jackknife_ratio")(spark, sf).collect().head
    val daily = purchasesByUser().toSeq.flatMap(_._2)
      .groupBy(_._1).view.mapValues(v => (v.map(_._2).sum, v.size.toLong))
      .toSeq.sortBy(_._1)
    val k = daily.size
    val ts = daily.map(_._2._1).sum
    val tn = daily.map(_._2._2).sum
    assert(r.getLong(0) == k)
    val ratio = ts.toDouble / tn
    assert(math.abs(r.getDouble(1) - ratio) < 1e-6)
    val reps = daily.map { case (_, (s2, n2)) =>
      (ts - s2).toDouble / (tn - n2) }
    val rbar = reps.sum / k
    val ssq = reps.map(x => (x - rbar) * (x - rbar)).sum
    val se = math.sqrt((k - 1).toDouble / k * ssq)
    assert(math.abs(r.getDouble(2) - se) < 1e-5, s"se ${r.getDouble(2)} vs $se")
    assert(math.abs(r.getDouble(3) - (ratio - 1.959964 * se)) < 1e-4)
    assert(math.abs(r.getDouble(4) - (ratio + 1.959964 * se)) < 1e-4)
    assert(r.getDouble(3) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(4),
      "CI must bracket the point estimate")
  }

  test("matched att: brute nearest-control-within-caliper recompute") {
    val r = Pipeline.queries("q240_matched_att")(spark, sf).collect().head
    val e = Tables(spark, sf).events
    val allDays = e.select(Tables.eventMicros(e).as("tus")).collect()
      .map(_.getLong(0) / 86400000000L)
    val cutoff = (allDays.min + allDays.max + 1L) / 2L
    val pu = purchasesByUser().toSeq.map { case (u, evs) =>
      val x = evs.filter(_._1 < cutoff).map(_._2).sum
      val y = evs.filter(_._1 >= cutoff).map(_._2).sum
      (u, x, y, armOfUser(u))
    }
    val treat = pu.filter(_._4 == 1L)
    val ctrl = pu.filter(_._4 == 0L)
    assert(r.getLong(0) == treat.size && r.getLong(1) == ctrl.size)
    val matches = treat.flatMap { case (tid, tx, ty, _) =>
      val cands = ctrl.filter(c => math.abs(c._2 - tx) <= 1000L)
      if (cands.isEmpty) None
      else {
        val best = cands.minBy(c => (math.abs(c._2 - tx), c._1))
        Some((tid, ty, best._1, best._3, math.abs(best._2 - tx)))
      }
    }
    assert(r.getLong(2) == matches.size, "n_matched")
    assert(math.abs(r.getDouble(3) -
      matches.size.toDouble / treat.size) < 1e-6, "match_rate")
    assert(math.abs(r.getDouble(4) -
      matches.map(m => m._2 - m._4).sum.toDouble / matches.size) < 1e-6,
      "att")
    assert(math.abs(r.getDouble(5) -
      matches.map(_._5).sum.toDouble / matches.size) < 1e-6, "mean dx")
    // caliper law: every brute match (and therefore every engine
    // match, since counts+sums agree exactly) is within 1000 cents
    assert(matches.forall(_._5 <= 1000L), "caliper violated")
    assert(matches.nonEmpty && matches.size <= treat.size)
  }
}
