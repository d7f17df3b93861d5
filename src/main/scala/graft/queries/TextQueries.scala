package graft.queries

import graft.Tables
import graft.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis family: lang-id, quality, token counts, PII,
  * entropy/surprisal, BPE train/apply, perceptron classifier, DSIR,
  * PMI, TextRank, c-TF-IDF, burstiness, Zipf, BM25, fuzzy join.
  *
  * Split from Pipeline.scala (round 12 housekeeping): query/oracle
  * entries only — every shared helper, memo cache and SQL CTE stays in
  * [[Pipeline]] (widened to private[queries]) so behavior and plan
  * shapes are byte-identical. */
private[graft] object TextQueries {
  import Pipeline._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q230_kneser_ney" -> { (s, dir) =>
      // Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the
      // interpolated form of Chen & Goodman 1999 with a fixed absolute
      // discount D = 0.75) — the LM-smoothing counterpart to q136's
      // stupid backoff: the lower-order model is the CONTINUATION
      // distribution (how many distinct left contexts a word
      // completes), not raw unigram frequency — the correction that
      // keeps frequent-but-single-context tokens ("Francisco") from
      // dominating the backoff mass. Every statistic lives on the
      // bigram TYPE table built by ONE pair-type agg (q135's posture:
      // the shuffle carries distinct pairs, never the token stream):
      // c(a,b) = cnt; c(a) and the continuation fan-out N1+(a.) are
      // two sums over the SAME hash(a) window; N1+(.b) one over
      // hash(b); the type total N1+(..) rides in as a broadcast 1-row
      // frame (q124's bounds pattern). p_kn(b|a) = (c(a,b) - D)/c(a)
      // + D*N1+(a.)/c(a) * N1+(.b)/N1+(..) over exact integer counts
      // (c(a,b) >= 1 > D keeps the discounted term positive), rounded
      // 6dp; output = top-20 by (cnt desc, a, b) via TakeOrdered.
      // 100 TB shape: everything after the one pair-type shuffle is
      // vocabulary^2-bounded, exactly q135's scale posture.
      val prs = Tables(s, dir).documents
        .select(explode(zip_with(
          slice(toks(col("text")), lit(1), greatest(size(toks(col("text"))) - 1, lit(0))),
          slice(toks(col("text")), lit(2), greatest(size(toks(col("text"))) - 1, lit(0))),
          (x, y) => struct(x.as("a"), y.as("b")))).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
      val total = prs.agg(count(lit(1)).as("tt"))
      val wA = Window.partitionBy(col("a"))
      val wB = Window.partitionBy(col("b"))
      prs
        .withColumn("ca", sum(col("cnt")).over(wA))
        .withColumn("na", count(lit(1)).over(wA))
        .withColumn("nb", count(lit(1)).over(wB))
        .crossJoin(broadcast(total))
        .select(col("a"), col("b"), col("cnt"), col("ca"), col("na"), col("nb"),
          round((col("cnt").cast("double") - lit(0.75)) / col("ca") +
            lit(0.75) * col("na").cast("double") / col("ca") *
              (col("nb").cast("double") / col("tt")), 6).as("pkn"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(20)
    },


    "q247_kn_perplexity" -> { (s, dir) =>
      // Per-document PERPLEXITY under q230's interpolated Kneser-Ney
      // bigram LM — the "score the corpus with its own LM" filter
      // (in-domain perplexity): q99's MLE surprisal flags rare
      // SEQUENCES; the KN-smoothed score discounts every observed
      // bigram by D = 0.75 and backs off to CONTINUATION probability,
      // so boilerplate built from frequent-but-single-context bigrams
      // stops looking fluent — the classic LM-quality gate a curation
      // pass thresholds before training. Model statistics live on the
      // bigram TYPE table (q135's one pair-type shuffle; ca/na share
      // the hash(a) window exchange, nb rides hash(b), the type total
      // broadcasts as q124's 1-row bounds frame); scoring joins the
      // token-level bigram stream back on (a, b). In-domain means
      // every scored bigram exists in the table, so p_kn > 0 is total
      // (held-out scoring would add q136's unseen-gram floor). Each
      // type's p_kn is a deterministic expression over exact integer
      // counts; only the per-doc log average is FP, absorbed by
      // round 6 (q99's contract). ppl = 2^bits.
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), toks(col("text")).as("t"))
      val bg = docs
        .select(col("doc_id"), explode(arrays_zip(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1))).as("bgp"))
        .select(col("doc_id"), col("bgp.0").as("a"), col("bgp.1").as("b"))
      val prs = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt"))
      val total = prs.agg(count(lit(1)).as("tt"))
      val wA = Window.partitionBy(col("a"))
      val wB = Window.partitionBy(col("b"))
      val pkn = prs
        .withColumn("ca", sum(col("cnt")).over(wA))
        .withColumn("na", count(lit(1)).over(wA))
        .withColumn("nb", count(lit(1)).over(wB))
        .crossJoin(broadcast(total))
        .select(col("a"), col("b"),
          ((col("cnt").cast("double") - lit(0.75)) / col("ca") +
            lit(0.75) * col("na").cast("double") / col("ca") *
              (col("nb").cast("double") / col("tt"))).as("p"))
      bg.join(pkn, Seq("a", "b"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(-log2(col("p"))), 6).as("avg_kn_bits"),
          round(pow(lit(2).cast("double"), avg(-log2(col("p")))), 6)
            .as("ppl"))
        .orderBy(col("doc_id"))
    },


    "q250_kn_heldout" -> { (s, dir) =>
      // HELD-OUT Kneser-Ney scoring (VERDICT r14 Next #4 — q247's
      // missing half): the train split's KN bigram table scores the
      // docs the model has NOT seen, which is the actual curation use
      // (gate NEW data with an LM trained on the accepted corpus).
      // Split = q83/q136's deterministic hash rule (md5 of
      // "split:doc_id", bucket < 819 of 1024 trains, ~80/20). Unlike
      // the in-domain q247, eval bigrams can now be UNSEEN, so the
      // interpolated form degrades branch by branch exactly as the
      // smoothing intends: seen pair -> full formula; unseen pair
      // under a seen context -> the backoff mass lambda(a) * pcont(b);
      // unseen context -> pure continuation pcont(b); continuation
      // unseen too -> q136's +1 uniform floor 1/(tt+1). Per-branch
      // counts are part of the gated output (the q136 discipline: the
      // branches must be SHOWN to fire). Scale shape: ONE pair-type
      // shuffle over the combined stream (train flags aggregated in
      // the map-side combine), model marginals as conditional window
      // sums on the vocab^2-bounded TYPE table (ca/na share the
      // hash(a) exchange, nb rides hash(b), tt broadcasts as the
      // 1-row bounds frame), and the eval stream joins back once on
      // (a, b) — documents never shuffle, q136's posture.
      knHeldoutScore(Tables(s, dir).documents)
    },

    "q210_heaps_law" -> { (s, dir) =>
      // Heaps'-law fit of vocabulary growth — q198's Zipf companion
      // and the capacity-planning readout behind "how big does the
      // tokenizer vocab get at 100x the corpus": V(n) ~ K * n^beta,
      // fit by OLS on ln(vocab) vs ln(docs) at 16 corpus-prefix
      // checkpoints (prefix = doc_id order, the ingestion order). The
      // vocabulary unit is the 3-gram shingle TYPE (q31's shingled
      // helper) — the fixture's word vocabulary saturates at 31 types
      // inside the first checkpoint, while gram types keep growing the
      // way a real tokenizer vocab does. Each gram contributes to a
      // checkpoint iff its FIRST occurrence (min doc_id — one
      // gram-type shuffle) precedes the cut, so every count is an
      // exact integer and the only FP freedom is the 16-term OLS sum,
      // absorbed by round 6. Scale shape: one gram agg + one doc-count
      // agg, each cross-joined to the broadcast 16-row checkpoint
      // table; the driver moves only the 1-row max doc_id.
      val maxId = Tables(s, dir).documents
        .agg(max(col("doc_id"))).head.getLong(0)
      val ckpts = s.range(1, 17)
        .select(col("id").as("ckpt"),
          expr(s"(($maxId + 1) * id) DIV 16").as("cut"))
      val firstDoc = shingled(Tables(s, dir))
        .select(col("doc_id"), explode(col("sh")).as("gram"))
        .groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
      val vocabAt = firstDoc.crossJoin(broadcast(ckpts))
        .filter(col("first_doc") < col("cut"))
        .groupBy(col("ckpt")).agg(count(lit(1)).as("vocab"))
      val docsAt = Tables(s, dir).documents.select(col("doc_id"))
        .crossJoin(broadcast(ckpts))
        .filter(col("doc_id") < col("cut"))
        .groupBy(col("ckpt")).agg(count(lit(1)).as("docs"))
      docsAt.join(vocabAt, Seq("ckpt"))
        .select(log(col("docs").cast("double")).as("x"),
          log(col("vocab").cast("double")).as("y"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("n").as("n_checkpoints"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6)
            .as("heaps_beta"),
          round(exp((col("sy") - (col("n") * col("sxy") - col("sx") *
            col("sy")) / (col("n") * col("sxx") - col("sx") * col("sx")) *
            col("sx")) / col("n")), 6).as("heaps_k"),
          // a fully saturated vocabulary (every checkpoint sees the
          // same gram count — the 100x-replicated ladder corpus does
          // this) has zero y-variance: the fit is degenerate and r2 is
          // NULL rather than a division crash
          when(col("n") * col("syy") - col("sy") * col("sy") > 0,
            round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
              ((col("n") * col("sxx") - col("sx") * col("sx")) *
               (col("n") * col("syy") - col("sy") * col("sy"))), 6))
            .as("r2"))
    },

    "q213_readability" -> { (s, dir) =>
      // Flesch-style readability scoring — the per-document curation
      // signal legibility filters key on: words (whitespace tokens),
      // sentences ([.!?]+ runs, floored at 1 so fragments don't
      // div-0), and a vowel-run syllable proxy (the container has no
      // dictionary; vowel groups are the standard approximation), all
      // exact integer counts from codegen'd regexes. The score
      // 206.835 - 1.015*(w/s) - 84.6*(syl/w) is one fixed double
      // spelling, and the easy/medium/hard band compares the ROUNDED
      // score so the bucket edge is deterministic cross-engine. Scale
      // shape: q33's — narrow range sort, then a map-only projection.
      val w = size(toks(col("text"))).cast("long")
      val sRaw = size(regexp_extract_all(col("text"), lit("[.!?]+"),
        lit(0))).cast("long")
      val sents = when(sRaw === 0, 1L).otherwise(sRaw)
      val syl = size(regexp_extract_all(col("text"),
        lit("[aeiouAEIOU]+"), lit(0))).cast("long")
      Tables(s, dir).documents.filter(hasTokens).orderBy(col("doc_id"))
        .select(col("doc_id"), w.as("n_words"), sents.as("n_sentences"),
          syl.as("n_syllables"),
          round(lit(206.835) - lit(1.015) * (w.cast("double") /
            sents.cast("double")) - lit(84.6) * (syl.cast("double") /
            w.cast("double")), 6).as("flesch"))
        .withColumn("band", when(col("flesch") >= 60, "easy")
          .when(col("flesch") >= 30, "medium").otherwise("hard"))
    },

    // --- text analysis -------------------------------------------------
    "q33_quality_score" -> { (s, dir) =>
      val t = toks(col("text"))
      val nTok = size(t).cast("long")
      val stopHits = stopword_hits(t, "en")
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"),
          nTok.as("n_tokens"),
          size(regexp_extract_all(col("text"), lit("[,.!?;:]"), lit(0))).cast("long").as("n_punct"),
          stopHits.as("stop_hits"),
          (stopHits.cast("double") / nTok * 0.5 +
            least(nTok.cast("double") / 100.0, lit(1.0)) * 0.5).as("quality"))
    },


    "q34_lang_id" -> { (s, dir) =>
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"), lang_id(toks(col("text"))).as("lang_guess"))
    },


    "q35_token_count" -> { (s, dir) =>
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"),
          size(toks(col("text"))).cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("n_bpe_tokens"))
    },


    "q84_vocab_topk" -> { (s, dir) =>
      // Corpus vocabulary: term frequency + document frequency per
      // token, top 100 by tf (token tie-break makes the order total).
      // One hash shuffle on token with map-side partial aggregation; df
      // rides the standard two-phase distinct rewrite on the same key;
      // the top-k is TakeOrderedAndProject (per-partition heads + driver
      // merge of 100 rows), never a corpus-wide sort shuffle.
      Tables(s, dir).documents
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("token"))
        .limit(100)
    },


    "q146_textrank" -> { (s, dir) =>
      // TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
      // PageRank (d = 0.85, 10 iterations) over the word co-occurrence
      // graph — nodes are the top-128 content words (length >= 4, the
      // deterministic stand-in for the paper's POS filter), edges are
      // adjacent-pair co-occurrences weighted by count. Scale shape:
      // the corpus contributes exactly two token scans (vocab count +
      // bigram count, q132's read-twice posture); the vocab ships back
      // as a 128-string isin literal (q110's dictionary pattern, no
      // join), and the graph itself is BOUNDED by construction
      // (<= 128 nodes / 8128 edges), so the 10 PageRank rounds are
      // driver control-plane like q114's centroids — at 100 TB the
      // iteration cost is unchanged because the graph size is fixed by
      // the vocab cap, not the corpus. Scores are fixed-point integers
      // (1e6 = 1.0) with per-term floor division, so the trajectory is
      // bit-reproducible and the oracle replays it exactly (integer //
      // in unrolled CTEs).
      import s.implicits._
      val docs = Tables(s, dir).documents
      val vs = docs.select(explode(toks(col("text"))).as("w"))
        .filter(length(col("w")) >= 4)
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(128)
        .collect().map(_.getString(0)) // bounded: vocab cap
      val ed = docs.select(toks(col("text")).as("t"))
        .select(explode(arrays_zip(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1))).as("bg"))
        .select(col("bg.0").as("a"), col("bg.1").as("b"))
        .filter(col("a") =!= col("b") &&
          col("a").isin(vs.toSeq: _*) && col("b").isin(vs.toSeq: _*))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
        .collect() // bounded: <= 128*127/2 edges
      val und = ed.toSeq.flatMap { r =>
        val (u, v, w) = (r.getString(0), r.getString(1), r.getLong(2))
        Seq((u, v, w), (v, u, w))
      }
      val deg = und.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      var sc = deg.keys.map(_ -> 1000000L).toMap
      for (_ <- 1 to 10) {
        val contrib = und.groupBy(_._2).map { case (v, es) =>
          v -> es.map { case (u, _, w) => w * sc(u) / deg(u) }.sum
        }
        sc = deg.keys.map(v =>
          v -> (150000L + 850000L * contrib.getOrElse(v, 0L) / 1000000L)).toMap
      }
      sc.toSeq.sortBy { case (w0, s0) => (-s0, w0) }.take(20).zipWithIndex
        .map { case ((w0, s0), i) => ((i + 1).toLong, w0, s0) }
        .toDF("rank", "word", "score")
    },


    "q87_pii_redact" -> { (s, dir) =>
      // PII scrubbing: redact emails, long digit runs (phone-like), and
      // IPv4 addresses with typed placeholders, and count each kind for
      // the audit trail. Email first so its digits can't half-match the
      // phone pattern; both engines apply the same order. Pure per-row
      // regex work (codegen'd regexp_replace/extract_all) — no shuffle
      // beyond the presentation sort; the patterns are RE2-compatible so
      // the DuckDB oracle replays them verbatim.
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phone = "\\+?\\d[\\d -]{7,}\\d"
      val t = col("text")
      Tables(s, dir).documents
        .orderBy(col("doc_id"))
        .select(col("doc_id"),
          size(regexp_extract_all(t, lit(email), lit(0))).cast("long").as("n_emails"),
          size(regexp_extract_all(t, lit(ip), lit(0))).cast("long").as("n_ips"),
          size(regexp_extract_all(t, lit(phone), lit(0))).cast("long").as("n_phones"),
          regexp_replace(regexp_replace(regexp_replace(t,
            email, "<EMAIL>"), ip, "<IP>"), phone, "<PHONE>").as("redacted"))
    },


    "q89_repetition_stats" -> { (s, dir) =>
      // Gopher-style repetition filters (Rae et al. 2021 §A1.1): the
      // top-n-gram fraction (how much of the doc is one repeated
      // phrase) and the duplicate-n-gram fraction (how much of the doc
      // is ANY repeated phrase) for word 2- and 3-grams. The corpus has
      // no newlines, so the line/paragraph halves of the rule family
      // don't apply; n-gram repetition is the half that does. Pure
      // per-row work: one build-sort-scan kernel pass per n (codegen'd
      // StaticInvoke), no shuffle beyond the presentation sort,
      // O(L log L) per doc at any corpus size.
      val t = toks(col("text"))
      Tables(s, dir).documents
        .orderBy(col("doc_id"))
        .select(col("doc_id"), size(t).cast("long").as("n_tokens"),
          ngram_run_stats(t, 2).as("r2"),
          ngram_run_stats(t, 3).as("r3"))
        .select(col("doc_id"), col("n_tokens"),
          col("r2").getItem(0).as("top2_count"),
          when(col("n_tokens") >= 2,
            col("r2").getItem(0).cast("double") / (col("n_tokens") - 1))
            .otherwise(0.0).as("top2_frac"),
          when(col("n_tokens") >= 2,
            col("r2").getItem(1).cast("double") / (col("n_tokens") - 1))
            .otherwise(0.0).as("dup2_frac"),
          col("r3").getItem(0).as("top3_count"),
          when(col("n_tokens") >= 3,
            col("r3").getItem(1).cast("double") / (col("n_tokens") - 2))
            .otherwise(0.0).as("dup3_frac"))
    },


    "q110_tokenize_ids" -> { (s, dir) =>
      // The corpus -> token-ids step between curation and training:
      // apply the q84-style vocabulary (top 1024 by tf, token
      // tie-break; id = 0-based rank) to every document, emitting the
      // id sequence plus OOV accounting (-1 = out-of-vocabulary, the
      // unk id decision left to the consumer). Two jobs: the vocab
      // build is one token shuffle with a BOUNDED (|V|) result,
      // memoized per dir; the corpus pass is MAP-ONLY — each task
      // looks tokens up in the dictionary literal, no join, no shuffle
      // of the token stream (the explode+join form would shuffle every
      // token of the corpus). ids emit as CSV so the oracle compare is
      // positional and type-exact.
      val vocab = memo(vocabCache, dir)(
        Tables(s, dir).documents
          .select(explode(toks(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("tf"))
          .orderBy(col("tf").desc, col("token")).limit(1024)
          .collect().map(_.getString(0)))
      applyVocab(Tables(s, dir).documents.orderBy(col("doc_id")), vocab)
    },


    "q111_inverted_index" -> { (s, dir) =>
      // The retrieval-side complement of q84's vocabulary: a full
      // inverted index — per token its corpus term frequency, document
      // frequency, and a CAPPED posting list (the 16 smallest doc_ids,
      // CSV so the compare is positional). The cap is the scale story:
      // postings aggregate through MinKAgg, the bounded-state top-k
      // TypedImperativeAggregate (expressions/MinKAgg.scala), so the
      // map-side partial state for a stopword token is 16 longs flat —
      // `slice(sort_array(collect_set))` would carry the full
      // corpus-sized posting set into the shuffle before slicing. Two
      // bounded-state shuffles: (token, doc_id) pair counts, then the
      // per-token rollup (tf rides sum-of-counts, df is a plain count
      // because pairs are distinct by construction).
      val pairs = Tables(s, dir).documents
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy(col("token"), col("doc_id")).agg(count(lit(1)).as("c"))
      pairs.groupBy(col("token"))
        .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"),
          min_k(col("doc_id"), 16).as("p"))
        .select(col("token"), col("tf"), col("df"),
          array_join(transform(col("p"), _.cast("string")), ",").as("postings"))
        .orderBy(col("token"))
    },


    "q112_bm25_topk" -> { (s, dir) =>
      // Lexical retrieval: BM25 top-20 for a fixed conjunctive-ish
      // query (k1 = 1.2, b = 0.75, idf = ln((N-df+0.5)/(df+0.5)+1) —
      // the Robertson/Sparck-Jones always-positive form). Plan shape at
      // 100 TB: the corpus scan filters the exploded token stream to
      // the QUERY TERMS before anything shuffles, so the (doc, term)
      // aggregation and the df window both move match-volume, never
      // corpus-volume; N and avgdl are one memoized global aggregate
      // attached as plan literals; the final top-20 is
      // TakeOrderedAndProject (per-partition heads + driver merge), not
      // a global sort. Constants appear as identical decimal literals
      // here and in the oracle; the per-doc score sums <= 4 terms and
      // rounds to 6dp before the compare and the rank (q98's
      // determinism argument).
      val terms = Seq("dup", "vector", "hash", "merge")
      val stats = memo(bm25Stats, dir) {
        val r = Tables(s, dir).documents
          .agg(count(lit(1)),
            avg(size(toks(col("text"))).cast("double"))).head
        (r.getLong(0), r.getDouble(1))
      }
      val (nDocs, avgdl) = stats
      val matched = Tables(s, dir).documents
        .select(col("doc_id"), size(toks(col("text"))).cast("double").as("dl"),
          explode(toks(col("text"))).as("token"))
        .filter(col("token").isin(terms: _*))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).cast("double").as("tf"), max(col("dl")).as("dl"))
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("token"))).cast("double"))
      val idf = log((lit(nDocs.toDouble) - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
      val contrib = idf * col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)))
      matched.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"), round(sum(contrib), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },


    "q99_bigram_surprisal" -> { (s, dir) =>
      // Bigram-LM quality scoring: mean conditional surprisal
      // -log2 p(w|prev) with p estimated from the corpus itself,
      // p(w|prev) = c(prev,w) / c(prev·) — one step up from q98's
      // unigram model (catches wrong-order fluency that unigram
      // frequencies can't). Per-row bigram build, then two partitioned
      // count windows that share ONE exchange (hash(prev) co-locates
      // (prev,cur) too) and the per-doc rollup — token payloads
      // shuffle, never documents, and every window key is
      // high-cardinality. Rounds to 6dp: both engines average float
      // logs in their own order. The bigram build binds the token
      // array to an attribute FIRST and zips two slices — an earlier
      // form used element_at(toks(text), i) inside a transform lambda,
      // which re-evaluates the tokenizer subtree per element
      // (O(tokens^2) regex splits per doc; 8.2 s vs ~1 s at sf0.1).
      Tables(s, dir).documents
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), explode(arrays_zip(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1))).as("bg"))
        .select(col("doc_id"), col("bg.0").as("prev"), col("bg.1").as("cur"))
        .withColumn("c_bg",
          count(lit(1)).over(Window.partitionBy(col("prev"), col("cur"))))
        .withColumn("c_prev", count(lit(1)).over(Window.partitionBy(col("prev"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(log2(col("c_prev").cast("double"))
            - log2(col("c_bg").cast("double"))), 6).as("avg_surprisal_bits"))
        .orderBy(col("doc_id"))
    },


    "q98_unigram_surprisal" -> { (s, dir) =>
      // Cheap language-model quality scoring: each doc's mean per-token
      // surprisal under the corpus's own unigram distribution (the
      // poor-man's perplexity filter — fluent text is low-surprisal,
      // rare-token soup is high). avg(-log2(tf/N)) decomposes as
      // log2(N) - avg(log2(tf)), so N attaches as a plan-time constant
      // (one memoized corpus count) and tf rides a window PARTITIONED
      // by token — one token shuffle, no join back, no single-partition
      // vocab pass, no broadcast of a corpus-sized vocabulary. Rounds
      // to 6dp: both engines average float logs in their own order.
      val toksDf = Tables(s, dir).documents
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      val total: Long = Pipeline.memo(Pipeline.tokCount, dir)(
        Tables(s, dir).documents
          .agg(coalesce(sum(size(toks(col("text"))).cast("long")), lit(0L)))
          .head.getLong(0))
      toksDf
        .withColumn("tf", count(lit(1)).over(Window.partitionBy(col("token"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          round(log2(lit(total.toDouble)) - avg(log2(col("tf").cast("double"))), 6)
            .as("avg_surprisal_bits"))
        .orderBy(col("doc_id"))
    },


    "q95_char_entropy" -> { (s, dir) =>
      // Character-level Shannon entropy — the classic gibberish /
      // binary-leak / encoding-corruption signal (natural text sits in
      // a narrow bits-per-char band; base64 blobs and key dumps sit
      // high, repeated-char junk sits low). One codepoint-pass kernel
      // per row; entropy rounds to 6dp before compare because the
      // oracle's group-by accumulates float terms in its own order.
      Tables(s, dir).documents
        .orderBy(col("doc_id"))
        .select(col("doc_id"), char_stats(col("text")).as("cs"))
        .select(col("doc_id"),
          col("cs").getItem(0).cast("long").as("n_chars"),
          col("cs").getItem(1).cast("long").as("n_distinct_chars"),
          round(col("cs").getItem(2), 6).as("entropy_bits"))
    },


    "q92_quality_filter" -> { (s, dir) =>
      // The composite curation gate: C4/Gopher-style rules evaluated
      // per document, each failure exposed as its own flag so the
      // pipeline can report WHY a doc dropped (rule ablation needs the
      // per-rule counts, not just the survivor set). Rules: too short
      // (< 25 tokens), too few stopwords (< 4%), mean word length
      // outside [3, 10], dominant-bigram repetition (>= 8%), and
      // non-English (an en-only pipeline). Every signal is one of the
      // existing per-row kernels (stopword_hits, lang_id,
      // ngram_run_stats) — one codegen'd projection, no shuffle beyond
      // the presentation sort, embarrassingly parallel at any scale.
      qualityFlags(Tables(s, dir).documents.orderBy(col("doc_id")))
    },


    "q116_quality_classifier" -> { (s, dir) =>
      // Model-based quality scoring, fasttext-shaped: a linear
      // classifier over HASHED bag-of-words features whose weight
      // vector ships as part of the plan (here a deterministic
      // hash-derived stand-in for trained weights — the lookup
      // w[md5(tok) & 1023] has exactly the shape of a real quantized
      // model). Weights are INTEGER (int16-ish quantization, like
      // shipped fasttext/CLD3 models), so the per-doc sum is exact
      // whatever the evaluation order and the score is bit-stable at
      // any scale — no FP drift between a laptop run and a
      // 1000-executor run. One codegen'd per-row projection: tokenize,
      // hash, look up, sum, normalize by length. No shuffle beyond the
      // presentation sort; embarrassingly parallel.
      val t = toks(col("text"))
      val ws = transform(t, tok =>
        (md5_lower64(concat(lit("qc:"), tok).cast("binary"))
          .bitwiseAND(lit(1023L)) * lit(2654435761L)) % lit(2048L) - lit(1024L))
      // orderBy FIRST: the kernel projection must stay above the range
      // exchange or the sort-sampling pass evaluates every hash twice
      // (PlanAuditSpec pins this shape for the whole per-row family).
      Tables(s, dir).documents.orderBy(col("doc_id"))
        .select(col("doc_id"), size(t).cast("long").as("n_tokens"),
          aggregate(ws, lit(0L), (a, x) => a + x).as("score_raw"))
        .withColumn("score",
          round(col("score_raw").cast("double") / col("n_tokens"), 6))
        // accept gates on the exact INTEGER score, not the rounded
        // double: round(-1/1e7, 6) = -0.0 and -0.0 >= 0.0 is true, so a
        // double gate would admit slightly-negative docs that q126's
        // fused integer gate (score_raw >= 0) rejects — the two stages
        // are contract-pinned to agree on all inputs (ADVICE r9).
        .withColumn("accept", col("score_raw") >= 0L)
    },


    "q167_fuzzy_join" -> { (s, dir) =>
      // Fuzzy string self-join (edit distance <= 1) via DELETION-
      // NEIGHBORHOOD blocking (the SymSpell candidate scheme) — the
      // typo/variant detector behind vocab normalization and OCR
      // cleanup, and the join family (similarity join on strings)
      // Spark has no operator for. All-pairs levenshtein is |V|^2;
      // instead each vocab word explodes to itself + its length
      // single-deletion variants, and two words are candidates iff
      // they share a variant — which covers every distance<=1 pair
      // (substitution: both drop the differing char; indel: the short
      // word IS a variant of the long one). The blocking is provably
      // bounded: the words mapping to a variant v are v itself plus
      // single-char insertions into v, so a bucket can never exceed
      // |alphabet|*(len+1)+1 rows regardless of corpus size — the
      // self-join fan-out is capped by CONSTRUCTION, not by a heuristic
      // cap. Exact levenshtein then verifies candidates (distance-2
      // del+ins pairs also collide; the verify drops them). Scale:
      // everything runs at vocabulary TYPE level — one token-count
      // shuffle, one variant shuffle, never a corpus-sized pair join.
      val vocab = Tables(s, dir).documents
        .select(explode(toks(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .filter(length(col("w")) >= 4 && col("cnt") >= 2)
      val vars = vocab.select(col("w"), col("cnt"),
        explode(concat(array(col("w")),
          transform(sequence(lit(0), length(col("w")) - 1),
            i => concat(col("w").substr(lit(1), i),
              col("w").substr(i + lit(2), length(col("w"))))))).as("v"))
      vars.as("a").join(vars.as("b"),
          col("a.v") === col("b.v") && col("a.w") < col("b.w"))
        .select(col("a.w").as("w1"), col("b.w").as("w2"),
          col("a.cnt").as("cnt1"), col("b.cnt").as("cnt2"))
        .distinct()
        .filter(levenshtein(col("w1"), col("w2")) <= 1)
        .orderBy(col("w1"), col("w2"))
    },


    "q175_blocklist_filter" -> { (s, dir) =>
      // Blocklist phrase filtering — the safety/compliance gate every
      // training pipeline runs: count occurrences of listed 1..2-token
      // phrases per document and flag documents over threshold. The
      // phrase list rides as a PLAN LITERAL into an isin filter over
      // the token/shingle streams (broadcast-free, map-side; the list
      // is config-scale however big the corpus), counts come from one
      // explode + filter + doc rollup, and the rollup is the only
      // shuffle. Phrases match at TOKEN level (exact word-sequence
      // hits, not substring false positives: "data" never fires inside
      // "database" — shingle equality is the tokenized-match contract).
      val uni = Seq("data", "slow")
      val bi = Seq("hash join", "table scan")
      val docs = Tables(s, dir).documents
      val t1 = docs.select(col("doc_id"), explode(toks(col("text"))).as("g"))
        .filter(col("g").isin(uni: _*))
      // occurrence counts need the NON-distinct bigram stream (the
      // shingles kernel dedups within a doc), so bigrams come from a
      // positional transform. The token array materializes in its OWN
      // projection first: referencing the split expression inside the
      // lambda would inline it per element_at — two split() calls per
      // bigram, quadratic per doc (the round-11a plan-size lesson;
      // measured 5.4 s -> sub-second at sf0.1)
      val tk = docs.select(col("doc_id"), toks(col("text")).as("tk"))
      val t2 = tk
        .select(col("doc_id"), explode(when(size(col("tk")) >= 2,
          transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat(element_at(col("tk"), i), lit(" "),
              element_at(col("tk"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("g"))
        .filter(col("g").isin(bi: _*))
      val hits = t1.unionAll(t2)
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_hits"),
          count(lit(1)).as("n_phrases_hit"))
      docs.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_hits", "n_phrases_hit"))
        .withColumn("flagged", col("n_hits") >= 8)
        .orderBy(col("doc_id"))
    },


    "q182_bm25_ndcg" -> { (s, dir) =>
      // Retrieval-quality evaluation (nDCG@10) of the q112 BM25
      // ranker — the eval harness that closes the lexical loop the way
      // q158's recall audit closes the ANN loop. Graded relevance =
      // distinct query terms a doc contains (0..4, exact integer);
      // DCG folds the RANKED list's gains under 1/log2(rank+1), IDCG
      // re-ranks by relevance itself (doc_id tie-break, both engines),
      // nDCG = the single division at the end. Plan adds only
      // TakeOrdered top-10s and a 10-row fold to whatever the ranker
      // costs — the corpus still filters to query terms before any
      // shuffle. ln/ln2 spelled identically both engines.
      val terms = Seq("dup", "vector", "hash", "merge")
      val stats = memo(bm25Stats, dir) {
        val r = Tables(s, dir).documents
          .agg(count(lit(1)),
            avg(size(toks(col("text"))).cast("double"))).head
        (r.getLong(0), r.getDouble(1))
      }
      val (nDocs, avgdl) = stats
      val matched = Tables(s, dir).documents
        .select(col("doc_id"), size(toks(col("text"))).cast("double").as("dl"),
          explode(toks(col("text"))).as("token"))
        .filter(col("token").isin(terms: _*))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).cast("double").as("tf"), max(col("dl")).as("dl"))
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("token"))).cast("double"))
      val idf = log((lit(nDocs.toDouble) - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
      val contrib = idf * col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)))
      val scored = matched.groupBy(col("doc_id"))
        .agg(round(sum(contrib), 6).as("score"),
          countDistinct(col("token")).cast("long").as("rel"))
      def gainSum(df: DataFrame, ord: Seq[Column]): DataFrame =
        df.orderBy(ord: _*).limit(10)
          .withColumn("rk", row_number().over(Window.orderBy(ord: _*)))
          .agg(sum(col("rel").cast("double") /
            (log(col("rk").cast("double") + lit(1.0)) / log(lit(2.0))))
            .as("g"))
      val dcg = gainSum(scored, Seq(col("score").desc, col("doc_id")))
        .select(round(col("g"), 6).as("dcg"))
      val idcg = gainSum(scored, Seq(col("rel").desc, col("doc_id")))
        .select(round(col("g"), 6).as("idcg"))
      dcg.crossJoin(broadcast(idcg))
        .select(col("dcg"), col("idcg"),
          round(col("dcg") / col("idcg"), 6).as("ndcg"))
    },


    "q190_pmi_pairs" -> { (s, dir) =>
      // Pointwise mutual information of token pairs co-occurring
      // within a 3-token window (Church & Hanks 1990) — the collocation
      // statistic behind phrase mining and tokenizer-merge scoring
      // (q146's co-occurrence edges, scored instead of ranked). All
      // counts are exact integers; PMI multiplies them as DOUBLES in a
      // FIXED left-to-right order (products reach ~1e20 at the sf10
      // ladder, past long range) so both engines compute bit-identical
      // IEEE products before the single ln. Scale shape: the pair join
      // is per-doc positional (distance <= 3, so fan-out is 3 rows per
      // token, never doc-quadratic) on ONE doc_id shuffle; marginals
      // are a vocabulary-sized broadcast; the top-20 is TakeOrdered.
      val tk = Tables(s, dir).documents
        .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "w")))
      val b = tk.select(col("doc_id").as("d2"), col("pos").as("pos2"),
        col("w").as("wb"))
      // merge hint: explode wrecks size stats, and at the sf10 ladder
      // the planner tried to BROADCAST one side of this self-join
      // (driver OOM) — sort-merge on doc_id is the shape that holds at
      // any corpus size (both sides shuffle once on the join key)
      val pairs = tk.hint("merge").join(b, col("doc_id") === col("d2") &&
          col("pos2") > col("pos") && col("pos2") - col("pos") <= 3)
        .select(least(col("w"), col("wb")).as("w1"),
          greatest(col("w"), col("wb")).as("w2"))
      val cp = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_pair"))
      val cw = tk.groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val tTok = tk.agg(count(lit(1)).as("t_tok"))
      val tPair = pairs.agg(count(lit(1)).as("t_pair"))
      cp.filter(col("c_pair") >= 20)
        .join(broadcast(cw.select(col("w").as("w1"), col("cw").as("c1"))), "w1")
        .join(broadcast(cw.select(col("w").as("w2"), col("cw").as("c2"))), "w2")
        .crossJoin(broadcast(tTok)).crossJoin(broadcast(tPair))
        .select(col("w1"), col("w2"), col("c_pair"),
          round(log(col("c_pair").cast("double") * col("t_tok") * col("t_tok") /
            (col("t_pair").cast("double") * col("c1") * col("c2"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)
    },


    "q194_ctfidf_keywords" -> { (s, dir) =>
      // Class-based TF-IDF keywords (the c-TF-IDF of Grootendorst's
      // BERTopic, 2022): per SOURCE, the tokens whose in-class rate
      // most exceeds their corpus rate — score = (tf_class/total_class)
      // * ln(1 + avg_class_tokens/corpus_tf) — the corpus-exploration
      // readout "what is each source about" (q146 ranks tokens within
      // a doc; this ranks them across classes). Counts are exact
      // integers; the two divisions and one ln are spelled identically
      // on both engines and rounded at 6. Scale shape: ONE
      // (source, token) shuffle with map-side partials; the corpus
      // marginal is a vocabulary-sized broadcast; per-class totals ride
      // a window over the class cells; top-5 per class is a rank
      // window over |classes| x |vocab| cells, never raw tokens.
      val tk = Tables(s, dir).documents
        .select(col("source"), explode(toks(col("text"))).as("token"))
      val cls = tk.groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("tfc"))
        .withColumn("totc",
          sum(col("tfc")).over(Window.partitionBy(col("source"))))
      val corpus = tk.groupBy(col("token")).agg(count(lit(1)).as("ft"))
      val tots = tk.agg(count(lit(1)).as("t_tok"),
        countDistinct(col("source")).as("n_cls"))
      val wr = Window.partitionBy(col("source"))
        .orderBy(col("score").desc, col("token"))
      cls.join(broadcast(corpus), "token")
        .crossJoin(broadcast(tots))
        .withColumn("score",
          round(col("tfc").cast("double") / col("totc") *
            log(lit(1.0) + col("t_tok").cast("double") /
              (col("n_cls") * col("ft"))), 6))
        .withColumn("rk", row_number().over(wr).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk"), col("token"), col("score"))
        .orderBy(col("source"), col("rk"))
    },


    "q195_token_burstiness" -> { (s, dir) =>
      // Token burstiness (Church & Gale 1995): the variance-to-mean
      // ratio of a token's per-document count — VMR 1 is Poisson
      // background, VMR >> 1 marks content words that arrive in bursts
      // (and candidate boilerplate when paired with high df). Over ALL
      // N docs (absent docs contribute 0), so
      // VMR = (N*sum(x^2) - tf^2) / (N*tf) from three exact integer
      // sums — products stay inside a long through the sf10 ladder;
      // one division + round at the end. Scale shape: ONE (doc, token)
      // count agg, then a vocabulary-sized token rollup; the doc total
      // is a broadcast ONE-ROW literal.
      val perDoc = Tables(s, dir).documents
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("x"))
      val nDocs = Tables(s, dir).documents.agg(count(lit(1)).as("n_docs"))
      perDoc.groupBy(col("token"))
        .agg(sum(col("x")).as("tf"), count(lit(1)).as("df"),
          sum(col("x") * col("x")).as("sx2"))
        .crossJoin(broadcast(nDocs))
        .select(col("token"), col("tf"), col("df"),
          round((col("n_docs") * col("sx2") - col("tf") * col("tf"))
            .cast("double") / (col("n_docs") * col("tf")).cast("double"), 6)
            .as("vmr"))
        .orderBy(col("vmr").desc, col("token"))
    },


    "q198_zipf_fit" -> { (s, dir) =>
      // Zipf's-law fit over the corpus vocabulary: OLS slope and R^2 of
      // ln(freq) against ln(rank) — the distributional sanity check a
      // curation pipeline runs on tokenizer output (natural text slopes
      // ~ -1; synthetic/boilerplate corpora flatten). Ranks are exact
      // integers (freq desc, token tie-break); the five OLS sums run
      // over VOCABULARY cells (q150's closed form in log space), so the
      // only FP freedom is the order of a |vocab|-term sum, absorbed by
      // round 6. Scale shape: one token count agg, one |vocab| window
      // rank, one single-row rollup.
      val vocab = Tables(s, dir).documents
        .select(explode(toks(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .withColumn("rnk", row_number()
          .over(Window.orderBy(col("freq").desc, col("token"))).cast("long"))
        .select(log(col("rnk").cast("double")).as("x"),
          log(col("freq").cast("double")).as("y"))
      vocab
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("n").as("n_types"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("zipf_slope"),
          round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
             (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
    },


    "q130_bpe_train" -> { (s, dir) =>
      // TRAIN a BPE tokenizer vocabulary on the corpus (Sennrich et
      // al. 2016) — the operator that turns raw text into the merge
      // table every LLM tokenizer ships. T=6 merge rounds as a driver
      // control loop (q114's Lloyd pattern): per round one distributed
      // adjacent-pair count over the word-TYPE table — occurrences
      // roll up to types once, so the per-round pass scales with
      // vocabulary, not corpus — and a single (cnt DESC, lhs, rhs)
      // argmax row to the driver; merges-so-far ride into the
      // bpe_apply kernel as plan literals (the broadcast analogue).
      // Greedy left-to-right apply semantics match the reference BPE
      // loop exactly; the oracle unrolls the same 6 rounds as CTEs
      // with a list_reduce fold proven equivalent to the kernel's.
      // Output = the learned artifact: (rank, lhs, rhs, cnt).
      import s.implicits._
      val merges = memo(bpeMerges, dir)(bpeTrain(Tables(s, dir).documents, 6))
      merges.zipWithIndex
        .map { case ((a, b, c), i) => (i + 1L, a, b, c) }
        .toDF("rank", "lhs", "rhs", "cnt")
        .orderBy(col("rank"))
    },


    "q131_bpe_tokenize" -> { (s, dir) =>
      // APPLY the q130-trained merges to the whole corpus and report
      // the standard per-source tokenizer health metric (compression =
      // chars per BPE token). Merges ride as plan literals into the
      // bpe_apply kernel; because the OUTPUT is per-source stats (not
      // per-doc token ids), segmentation rides the word-TYPE rollup:
      // occurrences collapse to (source, word, n) in the map-side
      // combine — the shuffle carries |sources|x|vocab| rows, not the
      // token stream — and the kernel runs once per TYPE, weighted by
      // n on the way to the source rollup. Measured at sf10 (900M
      // occurrences): 18.7 s -> 4.4 s vs the per-occurrence map-only
      // form, which remains the right shape only when the output
      // itself is per-document token ids. Training memoized with q130.
      val merges = memo(bpeMerges, dir)(bpeTrain(Tables(s, dir).documents, 6))
      val sy = bpe_apply(col("w"),
        typedlit(merges.map(_._1)), typedlit(merges.map(_._2)))
      Tables(s, dir).documents
        .select(col("source"), explode(toks(col("text"))).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))
        .select(col("source"), col("n"),
          length(col("w")).cast("long").as("nc"), size(sy).cast("long").as("nt"))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_words"), sum(col("nc") * col("n")).as("n_chars"),
          sum(col("nt") * col("n")).as("n_bpe_tokens"),
          round(sum(col("nc") * col("n")).cast("double") / sum(col("nt") * col("n")), 6)
            .as("compression"))
        .orderBy(col("source"))
    },


    "q132_dsir_select" -> { (s, dir) =>
      // DATA SELECTION via importance resampling (DSIR, Xie et al.
      // NeurIPS 2023): score every raw document by how target-like its
      // hashed-unigram feature distribution is — per-doc avg
      // log-likelihood ratio between the target-domain and raw-corpus
      // unigram models over 256 hash buckets — and keep the top-k.
      // (The paper samples with Gumbel noise; the deterministic top-k
      // variant is the reproducible form, and rank-by-llr is the same
      // ordering the noise perturbs.) Scale shape: the two feature
      // distributions are estimated in ONE token scan whose shuffle
      // carries <= 256 cells (dsirLlr above, memoized); the llr table
      // rides into the plan as a 2 KB literal (q110's dictionary
      // pattern), so SCORING is map-only per-row — tokenize, hash,
      // look up, sum — and selection is TakeOrdered top-k. The corpus
      // is read twice total and never joins or re-shuffles.
      dsirScore(Tables(s, dir).documents, dsirLlrCached(s, dir))
        .orderBy(col("llr_avg").desc, col("doc_id")).limit(100)
    },


    "q136_stupid_backoff" -> { (s, dir) =>
      // Held-out LM scoring with STUPID BACKOFF (Brants et al. 2007 —
      // the smoothing designed explicitly for MapReduce-scale LMs:
      // no discounting state, just raw counts and a fixed 0.4 backoff
      // factor). Counts come from the TRAIN split (q83's deterministic
      // hash split) and score the held-out docs: p(c|a,b) = c_abc/c_ab
      // if seen, else 0.4*c_bc/c_c, else 0.16*(c_c+1)/(N+1) — unlike
      // the self-scored q98/q99, the backoff branches genuinely fire
      // here (unseen eval trigrams), and the per-branch counts are
      // part of the gated output. All counts ride conditional window
      // sums over ONE trigram stream (train flags aggregated, eval
      // rows filtered after): the c / (b,c) / (a,b,c) windows all
      // contain c, so hash(c) serves the three back-to-back with NO
      // re-exchange (ClusteredDistribution of a superset key is
      // satisfied by the subset hash); only (a,b) re-shuffles. Two
      // exchanges of the trigram stream + the doc rollup, documents
      // never shuffle. N = train trigram positions, a memoized scalar.
      val t = toks(col("text"))
      val bucket = md5_lower64(concat(lit("split:"),
        col("doc_id").cast("string")).cast("binary")).bitwiseAND(lit(1023L))
      val n: Long = memo(triCount, dir)(
        Tables(s, dir).documents.filter(bucket < 819)
          .agg(coalesce(sum(greatest(size(t) - 2, lit(0)).cast("long")), lit(0L)))
          .head.getLong(0))
      val trainSum = sum(when(col("tr"), 1L).otherwise(0L))
      val scored = Tables(s, dir).documents
        .select(col("doc_id"), (bucket < 819).as("tr"), t.as("t"))
        .select(col("doc_id"), col("tr"), explode(arrays_zip(
          slice(col("t"), lit(1), greatest(size(col("t")) - 2, lit(0))),
          slice(col("t"), lit(2), greatest(size(col("t")) - 2, lit(0))),
          slice(col("t"), lit(3), greatest(size(col("t")) - 2, lit(0))))).as("g"))
        .select(col("doc_id"), col("tr"), col("g.0").as("a"),
          col("g.1").as("b"), col("g.2").as("c"))
        // one explicit hash(c) exchange + the windows applied FINEST
        // FIRST with c-prefixed key lists: the (c,b,a) sort is a
        // prefix-superset of (c,b) and (c), so the three share ONE
        // sort (the previous coarse-first stack re-sorted the full
        // trigram stream per window: [c], [b,c], [a,b,c] — three
        // sorts); partition SETS are unchanged, so every count is
        // identical (r15 opt). Only (a,b) still re-exchanges.
        .repartition(col("c"))
        .withColumn("c_abc",
          trainSum.over(Window.partitionBy(col("c"), col("b"), col("a"))))
        .withColumn("c_bc", trainSum.over(Window.partitionBy(col("c"), col("b"))))
        .withColumn("c_c", trainSum.over(Window.partitionBy(col("c"))))
        .withColumn("c_ab", trainSum.over(Window.partitionBy(col("a"), col("b"))))
        .filter(!col("tr"))
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
        .orderBy(col("doc_id"))
    },


    "q135_pmi_collocations" -> { (s, dir) =>
      // COLLOCATION extraction by pointwise mutual information over
      // adjacent bigrams (Church & Hanks 1990) — the corpus-statistics
      // pass behind tokenizer audits and phrase mining. Every count
      // comes from ONE bigram-type table: occurrences collapse in the
      // map-side combine (the q131 rollup — the shuffle carries pair
      // TYPES, not the token stream), the a- and b-marginals are two
      // window sums over that small table, and the bigram total rides
      // in as a broadcast 1-row frame (q124's pattern — no global
      // single-partition window). PMI = ln(cnt*N / (ca*cb)) on exact
      // integer counts, rounded to 6dp like every FP compare; min
      // count 5 prunes the long tail before the windows; output =
      // top-20 by (pmi, a, b) via TakeOrdered.
      val prs = Tables(s, dir).documents
        .select(explode(zip_with(
          slice(toks(col("text")), lit(1), greatest(size(toks(col("text"))) - 1, lit(0))),
          slice(toks(col("text")), lit(2), greatest(size(toks(col("text"))) - 1, lit(0))),
          (x, y) => struct(x.as("a"), y.as("b")))).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
      val total = prs.agg(sum(col("cnt")).as("n"))
      prs
        .withColumn("ca", sum(col("cnt")).over(Window.partitionBy(col("a"))))
        .withColumn("cb", sum(col("cnt")).over(Window.partitionBy(col("b"))))
        .crossJoin(broadcast(total))
        .filter(col("cnt") >= 5)
        .select(col("a"), col("b"), col("cnt"),
          round(log(col("cnt") * col("n") / (col("ca") * col("cb"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("a"), col("b")).limit(20)
    },


    "q133_train_classifier" -> { (s, dir) =>
      // TRAIN the quality classifier q116 only applies: a linear model
      // over 64 hashed bag-of-words buckets, learned by the batch
      // perceptron against weak labels (target source vs rest — the
      // fasttext good-corpus/raw-corpus recipe). Five rounds as a
      // driver control loop; all-integer arithmetic makes every round
      // an exact commutative sum, so the learned trajectory is
      // bit-identical at any partitioning and the oracle replays it as
      // five unrolled join-agg CTEs. Output = the training curve:
      // per-round misclassification count (under the PRE-update
      // weights; round 1 is all docs, margin 0) and the post-update
      // weight l1 norm. See perceptronTrain for the per-round plan
      // shape (map-only scoring, 65-cell driver traffic).
      import s.implicits._
      val curve = memo(perceptronRuns, dir)(
        perceptronTrain(Tables(s, dir).documents, 5))
      curve.zipWithIndex.map { case ((m, l1), i) => (i + 1L, m, l1) }
        .toDF("round", "n_mis", "w_l1").orderBy(col("round"))
    },
  )

  /** q250's engine: KN-score `evalFlag` docs against the bigram table
    * of `trainFlag` docs. The flags default to q83/q136's hash split
    * (md5("split:doc_id") & 1023, < 819 trains); the parity spec runs
    * trainFlag = evalFlag = true, under which every eval bigram is
    * seen, the first branch always fires with the FULL-corpus counts,
    * and avg_kn_bits/ppl reproduce q247 bit-for-bit — pinning that the
    * held-out machinery and the in-domain query share one arithmetic.
    * Model marginals are conditional window sums on the TYPE table
    * (only cnt_tr > 0 types are IN the train model; eval-only types
    * ride the same table with zero train count, which is what makes
    * the single (a,b) join total — no left-join null handling). */
  private[graft] def knHeldoutScore(docs: DataFrame,
      trainFlag: Column = knSplitBucket < 819,
      evalFlag: Column = knSplitBucket >= 819): DataFrame = {
    val bgAll = docs
      .select(col("doc_id"), trainFlag.as("tr"), evalFlag.as("ev"),
        toks(col("text")).as("t"))
      .select(col("doc_id"), col("tr"), col("ev"), explode(arrays_zip(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0)))))
        .as("bgp"))
      .select(col("doc_id"), col("tr"), col("ev"),
        col("bgp.0").as("a"), col("bgp.1").as("b"))
    val types = bgAll.groupBy(col("a"), col("b"))
      .agg(sum(when(col("tr"), 1L).otherwise(0L)).as("cnt_tr"))
    val total = types
      .agg(sum(when(col("cnt_tr") > 0, 1L).otherwise(0L)).as("tt"))
    val isTrainType = when(col("cnt_tr") > 0, 1L).otherwise(0L)
    val model = types
      .withColumn("ca", sum(col("cnt_tr")).over(Window.partitionBy(col("a"))))
      .withColumn("na", sum(isTrainType).over(Window.partitionBy(col("a"))))
      .withColumn("nb", sum(isTrainType).over(Window.partitionBy(col("b"))))
      .crossJoin(broadcast(total))
    val scored = bgAll.filter(col("ev")).join(model, Seq("a", "b"))
      .withColumn("p",
        when(col("cnt_tr") > 0,
          (col("cnt_tr").cast("double") - lit(0.75)) / col("ca") +
            lit(0.75) * col("na").cast("double") / col("ca") *
              (col("nb").cast("double") / col("tt")))
          .when(col("ca") > 0 && col("nb") > 0,
            lit(0.75) * col("na").cast("double") / col("ca") *
              (col("nb").cast("double") / col("tt")))
          .when(col("nb") > 0, col("nb").cast("double") / col("tt"))
          .otherwise(lit(1.0) / (col("tt") + lit(1L))))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("cnt_tr") > 0, 1L).otherwise(0L)).as("n_seen"),
        sum(when(col("cnt_tr") === 0 && col("ca") > 0 && col("nb") > 0, 1L)
          .otherwise(0L)).as("n_backoff"),
        sum(when(col("cnt_tr") === 0 && col("ca") === 0 && col("nb") > 0, 1L)
          .otherwise(0L)).as("n_cont"),
        sum(when(col("nb") === 0, 1L).otherwise(0L)).as("n_oov"),
        round(avg(-log2(col("p"))), 6).as("avg_kn_bits"),
        round(pow(lit(2).cast("double"), avg(-log2(col("p")))), 6).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** q136's deterministic doc-level split bucket (md5 of
    * "split:doc_id", 1024 buckets). */
  private[graft] def knSplitBucket: Column =
    md5_lower64(concat(lit("split:"),
      col("doc_id").cast("string")).cast("binary")).bitwiseAND(lit(1023L))

  def oracle: Map[String, String] = Map(
    "q210_heaps_law" ->
      s"""WITH mx AS (SELECT max(doc_id) AS maxid FROM documents),
          ck AS (SELECT CAST(range + 1 AS BIGINT) AS ckpt,
                  ((SELECT maxid FROM mx) + 1) * (range + 1) // 16 AS cut
                 FROM range(16)),
          fd AS (SELECT gram, min(doc_id) AS first_doc
                 FROM (SELECT doc_id, unnest(sh) AS gram
                       FROM (SELECT doc_id, $shSql AS sh
                             FROM (SELECT doc_id, $tokSql AS lst
                                   FROM documents)))
                 GROUP BY gram),
          va AS (SELECT ckpt, CAST(count(*) AS BIGINT) AS vocab
                 FROM fd, ck WHERE first_doc < cut GROUP BY ckpt),
          da AS (SELECT ckpt, CAST(count(*) AS BIGINT) AS docs
                 FROM documents, ck WHERE doc_id < cut GROUP BY ckpt),
          xy AS (SELECT ln(CAST(docs AS DOUBLE)) AS x,
                  ln(CAST(vocab AS DOUBLE)) AS y
                 FROM da JOIN va USING (ckpt)),
          g AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
                 sum(y) AS sy, sum(x * x) AS sxx, sum(y * y) AS syy,
                 sum(x * y) AS sxy FROM xy)
          SELECT n AS n_checkpoints,
                 round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                   AS heaps_beta,
                 round(exp((sy - (n * sxy - sx * sy) /
                   (n * sxx - sx * sx) * sx) / n), 6) AS heaps_k,
                 CASE WHEN n * syy - sy * sy > 0
                   THEN round(power(n * sxy - sx * sy, 2) /
                     ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                 END AS r2
          FROM g""",

    "q213_readability" ->
      s"""WITH b AS (SELECT doc_id,
               CAST(len($tokSql) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS sr,
               CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+'))
                 AS BIGINT) AS n_syllables
              FROM documents WHERE $hasTokensSql),
          c AS (SELECT doc_id, n_words,
                 CASE WHEN sr = 0 THEN 1 ELSE sr END AS n_sentences,
                 n_syllables FROM b),
          f AS (SELECT doc_id, n_words, n_sentences, n_syllables,
                 round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) /
                   CAST(n_sentences AS DOUBLE)) - 84.6 *
                   (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
                   6) AS flesch
                FROM c)
          SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
            CASE WHEN flesch >= 60 THEN 'easy'
                 WHEN flesch >= 30 THEN 'medium' ELSE 'hard' END AS band
          FROM f ORDER BY doc_id""",

    "q198_zipf_fit" ->
      s"""WITH f AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
              FROM (SELECT unnest($tokSql) AS token FROM documents)
              GROUP BY 1),
          xy AS (SELECT ln(CAST(row_number() OVER
                   (ORDER BY freq DESC, token) AS DOUBLE)) AS x,
                 ln(CAST(freq AS DOUBLE)) AS y FROM f),
          g AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
                FROM xy)
          SELECT n AS n_types,
                 round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
                 round(power(n * sxy - sx * sy, 2) /
                   ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
          FROM g""",

    "q194_ctfidf_keywords" ->
      s"""WITH tk AS (SELECT source, unnest($tokSql) AS token FROM documents),
          cls AS (SELECT source, token, CAST(count(*) AS BIGINT) AS tfc
                  FROM tk GROUP BY 1, 2),
          cw AS (SELECT source, token, tfc,
                  CAST(sum(tfc) OVER (PARTITION BY source) AS BIGINT) AS totc
                 FROM cls),
          corpus AS (SELECT token, CAST(count(*) AS BIGINT) AS ft
                     FROM tk GROUP BY 1),
          tots AS (SELECT CAST(count(*) AS BIGINT) AS t_tok,
                    CAST(count(DISTINCT source) AS BIGINT) AS n_cls FROM tk),
          sc AS (SELECT cw.source, cw.token,
                  round(CAST(cw.tfc AS DOUBLE) / cw.totc *
                    ln(1.0 + CAST(t.t_tok AS DOUBLE) / (t.n_cls * c.ft)), 6)
                    AS score
                 FROM cw JOIN corpus c ON cw.token = c.token CROSS JOIN tots t),
          r AS (SELECT source, token, score,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY score DESC, token) AS BIGINT) AS rk FROM sc)
          SELECT source, rk, token, score FROM r WHERE rk <= 5
          ORDER BY source, rk""",

    "q195_token_burstiness" ->
      s"""WITH pd AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS x
              FROM (SELECT doc_id, unnest($tokSql) AS token FROM documents)
              GROUP BY 1, 2),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          t AS (SELECT token, CAST(sum(x) AS BIGINT) AS tf,
                 CAST(count(*) AS BIGINT) AS df,
                 CAST(sum(x * x) AS BIGINT) AS sx2
                FROM pd GROUP BY 1)
          SELECT token, tf, df,
                 round(CAST(n_docs * sx2 - tf * tf AS DOUBLE)
                   / CAST(n_docs * tf AS DOUBLE), 6) AS vmr
          FROM t CROSS JOIN n ORDER BY vmr DESC, token""",

    "q190_pmi_pairs" ->
      s"""WITH tk AS (SELECT doc_id, generate_subscripts(l, 1) AS pos,
                unnest(l) AS w
              FROM (SELECT doc_id, $tokSql AS l FROM documents)),
          pr AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
                 FROM tk a JOIN tk b ON a.doc_id = b.doc_id
                   AND b.pos > a.pos AND b.pos - a.pos <= 3),
          cp AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair
                 FROM pr GROUP BY 1, 2),
          cw AS (SELECT w, CAST(count(*) AS BIGINT) AS cw FROM tk GROUP BY 1),
          t AS (SELECT CAST(count(*) AS BIGINT) AS t_tok FROM tk),
          tp AS (SELECT CAST(count(*) AS BIGINT) AS t_pair FROM pr),
          j AS (SELECT cp.w1, cp.w2, cp.c_pair, a.cw AS c1, b.cw AS c2
                FROM cp JOIN cw a ON cp.w1 = a.w JOIN cw b ON cp.w2 = b.w
                WHERE cp.c_pair >= 20)
          SELECT w1, w2, c_pair,
                 round(ln(CAST(c_pair AS DOUBLE) * t_tok * t_tok /
                   (CAST(t_pair AS DOUBLE) * c1 * c2)), 6) AS pmi
          FROM j CROSS JOIN t CROSS JOIN tp
          ORDER BY pmi DESC, w1, w2 LIMIT 20""",

    "q182_bm25_ndcg" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  avg(CAST(len(lst) AS DOUBLE)) AS avgdl FROM t),
          x AS (SELECT doc_id, CAST(len(lst) AS DOUBLE) AS dl,
                  unnest(lst) AS token FROM t),
          m AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf, max(dl) AS dl
                FROM x WHERE token IN ('dup', 'vector', 'hash', 'merge') GROUP BY 1, 2),
          d AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM m GROUP BY 1),
          c AS (SELECT m.doc_id, m.token,
                  ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * m.tf * 2.2
                    / (m.tf + 1.2 * (0.25 + 0.75 * m.dl / s.avgdl)) AS contrib
                FROM m JOIN d USING (token) CROSS JOIN s),
          sc AS (SELECT doc_id, round(sum(contrib), 6) AS score,
                   CAST(count(DISTINCT token) AS BIGINT) AS rel
                 FROM c GROUP BY doc_id),
          dr AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
                 FROM sc),
          ir AS (SELECT *, row_number() OVER (ORDER BY rel DESC, doc_id) AS rk
                 FROM sc),
          dcg AS (SELECT round(sum(CAST(rel AS DOUBLE)
                    / (ln(CAST(rk AS DOUBLE) + 1.0) / ln(2.0))), 6) AS dcg
                  FROM dr WHERE rk <= 10),
          idcg AS (SELECT round(sum(CAST(rel AS DOUBLE)
                    / (ln(CAST(rk AS DOUBLE) + 1.0) / ln(2.0))), 6) AS idcg
                   FROM ir WHERE rk <= 10)
          SELECT dcg, idcg, round(dcg / idcg, 6) AS ndcg
          FROM dcg CROSS JOIN idcg""",

    "q175_blocklist_filter" ->
      s"""WITH t1 AS (SELECT doc_id, tok AS g FROM
                   (SELECT doc_id, unnest($tokSql) AS tok FROM documents)
                 WHERE tok IN ('data', 'slow')),
          t2 AS (SELECT doc_id, g FROM
                   (SELECT doc_id,
                      unnest([lst[i] || ' ' || lst[i+1]
                              for i in range(1, len(lst))]) AS g
                    FROM (SELECT doc_id, $tokSql AS lst FROM documents)
                    WHERE len(lst) >= 2)
                 WHERE g IN ('hash join', 'table scan')),
          u AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2),
          pg AS (SELECT doc_id, g, count(*) AS n FROM u GROUP BY 1, 2),
          hits AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_hits,
                     count(*) AS n_phrases_hit
                   FROM pg GROUP BY doc_id)
          SELECT d.doc_id, coalesce(n_hits, 0) AS n_hits,
            coalesce(n_phrases_hit, 0) AS n_phrases_hit,
            coalesce(n_hits, 0) >= 8 AS flagged
          FROM (SELECT doc_id FROM documents) d
          LEFT JOIN hits USING (doc_id) ORDER BY d.doc_id""",

    "q167_fuzzy_join" ->
      s"""WITH vb AS (SELECT tok AS w, count(*) AS cnt
                      FROM (SELECT unnest($tokSql) AS tok FROM documents)
                      WHERE length(tok) >= 4 GROUP BY tok HAVING count(*) >= 2),
          vr AS (SELECT w, cnt,
                   unnest(list_prepend(w, list_transform(range(length(w)),
                     i -> substr(w, 1, CAST(i AS INT)) || substr(w, CAST(i + 2 AS INT))))) AS v
                 FROM vb),
          cand AS (SELECT DISTINCT a.w AS w1, b.w AS w2,
                     a.cnt AS cnt1, b.cnt AS cnt2
                   FROM vr a JOIN vr b ON a.v = b.v AND a.w < b.w)
          SELECT w1, w2, cnt1, cnt2 FROM cand
          WHERE levenshtein(w1, w2) <= 1 ORDER BY w1, w2""",

    "q146_textrank" -> textrankOracleSql(10),

    "q84_vocab_topk" ->
      s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS token FROM documents)
          SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
          FROM t GROUP BY token ORDER BY tf DESC, token LIMIT 100""",

    "q87_pii_redact" ->
      """SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(text, '\+?\d[\d -]{7,}\d')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+?\d[\d -]{7,}\d', '<PHONE>', 'g') AS redacted
         FROM documents ORDER BY doc_id""",

    // The oracle recounts n-gram occurrences by brute unnest + group-by,
    // independently of Spark's sorted run-length scan.
    "q89_repetition_stats" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          b2 AS (SELECT doc_id, unnest([lst[i] || ' ' || lst[i+1]
                   for i in range(1, len(lst))]) AS g FROM t),
          c2 AS (SELECT doc_id, g, count(*) AS c FROM b2 GROUP BY 1, 2),
          a2 AS (SELECT doc_id, max(c) AS best2,
                   sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup2
                 FROM c2 GROUP BY 1),
          b3 AS (SELECT doc_id, unnest([lst[i] || ' ' || lst[i+1] || ' ' || lst[i+2]
                   for i in range(1, len(lst) - 1)]) AS g FROM t),
          c3 AS (SELECT doc_id, g, count(*) AS c FROM b3 GROUP BY 1, 2),
          a3 AS (SELECT doc_id, max(c) AS best3,
                   sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3
                 FROM c3 GROUP BY 1)
          SELECT t.doc_id, CAST(len(lst) AS BIGINT) AS n_tokens,
            CAST(coalesce(best2, 0) AS BIGINT) AS top2_count,
            CASE WHEN len(lst) >= 2
              THEN CAST(coalesce(best2, 0) AS DOUBLE) / (len(lst) - 1)
              ELSE 0.0 END AS top2_frac,
            CASE WHEN len(lst) >= 2
              THEN CAST(coalesce(dup2, 0) AS DOUBLE) / (len(lst) - 1)
              ELSE 0.0 END AS dup2_frac,
            CAST(coalesce(best3, 0) AS BIGINT) AS top3_count,
            CASE WHEN len(lst) >= 3
              THEN CAST(coalesce(dup3, 0) AS DOUBLE) / (len(lst) - 2)
              ELSE 0.0 END AS dup3_frac
          FROM t LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
          ORDER BY doc_id""",

    "q110_tokenize_ids" ->
      s"""WITH ex AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
          c AS (SELECT token, count(*) AS tf FROM ex GROUP BY token),
          v AS (SELECT token,
                  CAST(row_number() OVER (ORDER BY tf DESC, token) - 1 AS BIGINT) AS id
                FROM c ORDER BY tf DESC, token LIMIT 1024),
          t AS (SELECT doc_id, $tokSql AS tok FROM documents),
          p AS (SELECT doc_id, tok, unnest(generate_series(1, len(tok))) AS i FROM t),
          j AS (SELECT p.doc_id, p.i, v.id
                FROM (SELECT doc_id, i, tok[i] AS token FROM p) p
                LEFT JOIN v ON p.token = v.token)
          SELECT t.doc_id,
            coalesce(j.ids, '') AS ids,
            CAST(len(t.tok) AS BIGINT) AS n_tokens,
            CAST(coalesce(j.n_oov, 0) AS BIGINT) AS n_oov
          FROM t LEFT JOIN (
            SELECT doc_id,
              array_to_string(list(CAST(coalesce(id, -1) AS VARCHAR) ORDER BY i), ',') AS ids,
              sum(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS n_oov
            FROM j GROUP BY doc_id) j ON t.doc_id = j.doc_id
          ORDER BY t.doc_id""",

    "q111_inverted_index" ->
      s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
          p AS (SELECT token, doc_id, count(*) AS c FROM t GROUP BY 1, 2)
          SELECT token, CAST(sum(c) AS BIGINT) AS tf, count(*) AS df,
            array_to_string(list_sort(list(doc_id))[1:16], ',') AS postings
          FROM p GROUP BY token ORDER BY token""",

    "q112_bm25_topk" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  avg(CAST(len(lst) AS DOUBLE)) AS avgdl FROM t),
          x AS (SELECT doc_id, CAST(len(lst) AS DOUBLE) AS dl,
                  unnest(lst) AS token FROM t),
          m AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf, max(dl) AS dl
                FROM x WHERE token IN ('dup', 'vector', 'hash', 'merge') GROUP BY 1, 2),
          d AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM m GROUP BY 1),
          c AS (SELECT m.doc_id,
                  ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * m.tf * 2.2
                    / (m.tf + 1.2 * (0.25 + 0.75 * m.dl / s.avgdl)) AS contrib
                FROM m JOIN d USING (token) CROSS JOIN s)
          SELECT doc_id, count(*) AS n_terms, round(sum(contrib), 6) AS score
          FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""",

    "q99_bigram_surprisal" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          b AS (SELECT doc_id, unnest(lst[1:len(lst)-1]) AS prev,
                  unnest(lst[2:len(lst)]) AS cur
                FROM t WHERE len(lst) >= 2),
          c AS (SELECT doc_id, prev, cur,
                  count(*) OVER (PARTITION BY prev, cur) AS c_bg,
                  count(*) OVER (PARTITION BY prev) AS c_prev
                FROM b)
          SELECT doc_id, count(*) AS n_bigrams,
            round(avg(log2(c_prev) - log2(c_bg)), 6) AS avg_surprisal_bits
          FROM c GROUP BY doc_id ORDER BY doc_id""",

    "q98_unigram_surprisal" ->
      s"""WITH tk AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
          c AS (SELECT doc_id, token,
                  count(*) OVER (PARTITION BY token) AS tf FROM tk)
          SELECT doc_id, count(*) AS n_tokens,
            round(log2((SELECT count(*) FROM tk)) - avg(log2(tf)), 6)
              AS avg_surprisal_bits
          FROM c GROUP BY doc_id ORDER BY doc_id""",

    "q95_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
         g AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
         e AS (SELECT doc_id, sum(n) AS n_chars, count(*) AS n_distinct,
                 round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 6) AS h
               FROM g GROUP BY doc_id)
         SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_distinct AS BIGINT) AS n_distinct_chars,
           h AS entropy_bits
         FROM e ORDER BY doc_id""",

    "q92_quality_filter" ->
      s"""WITH $qualityCteSql
          SELECT doc_id, n_tokens, stop_ratio, mean_word_len, top2_frac,
            lang_guess, f_short, f_stop, f_wordlen, f_rep, f_lang, keep
          FROM fk ORDER BY doc_id""",

    "q33_quality_score" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst, text FROM documents)
          SELECT doc_id,
            CAST(len(lst) AS BIGINT) AS n_tokens,
            CAST(len(regexp_extract_all(text, '[,.!?;:]')) AS BIGINT) AS n_punct,
            CAST(len(list_filter(lst, x -> list_contains(['the','and','of','to','in','is','a'], x))) AS BIGINT) AS stop_hits,
            CAST(len(list_filter(lst, x -> list_contains(['the','and','of','to','in','is','a'], x))) AS DOUBLE)
              / len(lst) * 0.5 + least(CAST(len(lst) AS DOUBLE) / 100.0, 1.0) * 0.5 AS quality
          FROM t ORDER BY doc_id""",

    "q34_lang_id" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS lst FROM documents),
          c AS (SELECT doc_id,
            len(list_filter(lst, x -> list_contains(['the','and','of','to','in','is','a'], x))) AS c_en,
            len(list_filter(lst, x -> list_contains(['der','die','und','ist','das','ein'], x))) AS c_de,
            len(list_filter(lst, x -> list_contains(['el','la','de','que','y','los'], x))) AS c_es,
            len(list_filter(lst, x -> list_contains(['le','la','et','les','des','un'], x))) AS c_fr,
            len(list_filter(lst, x -> list_contains(['的','是','不','我','在','了'], x))) AS c_zh
            FROM t)
          SELECT doc_id, CASE
            WHEN greatest(c_en, c_de, c_es, c_fr, c_zh) = 0 THEN 'und'
            WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
            WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
            WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
            WHEN c_fr >= c_zh THEN 'fr'
            ELSE 'zh' END AS lang_guess
          FROM c ORDER BY doc_id""",

    "q35_token_count" ->
      s"""SELECT doc_id,
          CAST(len($tokSql) AS BIGINT) AS n_ws_tokens,
          CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
          FROM documents ORDER BY doc_id""",


    // Hashed linear classifier with integer weights:
    // w[fid] = fid * 2654435761 mod 2048 - 1024, fid = md5 & 1023.
    "q116_quality_classifier" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
          w AS (SELECT doc_id, len(toks) AS n_tokens,
                list_sum(list_transform(toks, tok ->
                  CAST(md5_number_lower('qc:' || tok) & 1023 AS BIGINT)
                    * 2654435761 % 2048 - 1024)) AS score_raw
                FROM t)
          SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
            CAST(score_raw AS BIGINT) AS score_raw,
            round(score_raw * 1.0 / n_tokens, 6) AS score,
            score_raw >= 0 AS accept
          FROM w ORDER BY doc_id""",


    // Curation v2 rebuilt: the same four stages chained as CTEs —
    // BPE training unrolled: 6 pair-count/argmax/apply rounds. The
    // greedy left-to-right merge is a list_reduce over a
    // space-delimited string accumulator — collapsing the trailing
    // symbol when (trailing == lhs, next == rhs), which reproduces the
    // kernel's fold exactly (merged symbols stop matching lhs, so runs
    // merge non-overlapping).
    "q130_bpe_train" -> bpeOracleSql(6),


    // Corpus tokenization with the trained merges: same rounds, final
    // apply included, per-source stats over occurrences.
    "q131_bpe_tokenize" -> bpeTokenizeOracleSql(6),


    // DSIR rebuilt: hashed-unigram counts for target (= min source)
    // and raw in one conditional agg, Laplace-smoothed llr per bucket
    // over a 256-row spine, per-doc avg llr via the bucket join the
    // engine replaces with a plan-literal lookup, top-100.
    "q132_dsir_select" ->
      s"""WITH tk AS (SELECT doc_id, source,
              CAST(md5_number_lower('dsir:' || tok) & 255 AS BIGINT) AS b
            FROM (SELECT doc_id, source, unnest($tokSql) AS tok
                  FROM documents WHERE $hasTokensSql)),
          cn AS (SELECT b, count(*) AS cr,
              sum(CASE WHEN source = (SELECT min(source) FROM documents)
                  THEN 1 ELSE 0 END) AS ct
            FROM tk GROUP BY b),
          tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM cn),
          llr AS (SELECT sp.range AS b,
              ln((coalesce(cn.ct, 0) + 1.0) / ((SELECT nt FROM tot) + 256.0))
            - ln((coalesce(cn.cr, 0) + 1.0) / ((SELECT nr FROM tot) + 256.0)) AS v
            FROM range(0, 256) sp LEFT JOIN cn ON cn.b = sp.range),
          sc AS (SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
              round(sum(llr.v) / count(*), 6) AS llr_avg
            FROM tk JOIN llr ON tk.b = llr.b GROUP BY tk.doc_id)
          SELECT doc_id, n_tokens, llr_avg FROM sc
          ORDER BY llr_avg DESC, doc_id LIMIT 100""",


    // Batch-perceptron training unrolled: five margin/misclassified/
    // gradient/update rounds over integer hashed features — the whole
    // trajectory is exact integer arithmetic on both sides.
    "q133_train_classifier" -> perceptronOracleSql(5),


    // Stupid backoff rebuilt: one trigram stream with conditional
    // train-count windows, eval rows filtered after, the same
    // three-branch CASE and +1-smoothed unigram floor.
    "q136_stupid_backoff" ->
      s"""WITH t AS (SELECT doc_id,
              (md5_number_lower('split:' || CAST(doc_id AS VARCHAR)) & 1023) < 819 AS tr,
              $tokSql AS lst FROM documents),
          tg AS (SELECT doc_id, tr, g.a AS a, g.b AS b, g.c AS c
            FROM (SELECT doc_id, tr,
                unnest(list_transform(range(1, len(lst) - 1), i ->
                  struct_pack(a := lst[CAST(i AS INT)],
                              b := lst[CAST(i AS INT) + 1],
                              c := lst[CAST(i AS INT) + 2]))) AS g
              FROM t WHERE len(lst) >= 3)),
          n AS (SELECT sum(CASE WHEN tr THEN 1 ELSE 0 END) AS n FROM tg),
          w AS (SELECT doc_id, tr, a, b, c,
              sum(CASE WHEN tr THEN 1 ELSE 0 END) OVER (PARTITION BY c) AS c_c,
              sum(CASE WHEN tr THEN 1 ELSE 0 END) OVER (PARTITION BY b, c) AS c_bc,
              sum(CASE WHEN tr THEN 1 ELSE 0 END) OVER (PARTITION BY a, b, c) AS c_abc,
              sum(CASE WHEN tr THEN 1 ELSE 0 END) OVER (PARTITION BY a, b) AS c_ab
            FROM tg)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pos,
            CAST(sum(CASE WHEN c_abc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
            CAST(sum(CASE WHEN c_abc = 0 AND c_bc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi,
            CAST(sum(CASE WHEN c_abc = 0 AND c_bc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni,
            round(avg(-log2(
              CASE WHEN c_abc > 0 THEN c_abc * 1.0 / c_ab
                   WHEN c_bc > 0 THEN 0.4 * c_bc / c_c
                   ELSE 0.16 * (c_c + 1.0) / ((SELECT n FROM n) + 1) END)), 6)
              AS avg_backoff_bits
          FROM w WHERE NOT tr GROUP BY doc_id ORDER BY doc_id""",


    // Kneser-Ney rebuilt: the same bigram-type table, the c(a)/N1+(a.)
    // /N1+(.b) window marginals, the scalar type total, and the
    // identical double spelling of the interpolated-discount formula.
    "q230_kneser_ney" ->
      s"""WITH pr AS (SELECT pr.a AS a, pr.b AS b
            FROM (SELECT unnest(list_transform(range(1, len(lst)), i ->
                struct_pack(a := lst[CAST(i AS INT)], b := lst[CAST(i AS INT) + 1]))) AS pr
              FROM (SELECT $tokSql AS lst FROM documents) WHERE len(lst) >= 2)),
          c AS (SELECT a, b, count(*) AS cnt FROM pr GROUP BY 1, 2),
          m AS (SELECT a, b, cnt,
              sum(cnt) OVER (PARTITION BY a) AS ca,
              count(*) OVER (PARTITION BY a) AS na,
              count(*) OVER (PARTITION BY b) AS nb,
              (SELECT count(*) FROM c) AS tt FROM c)
          SELECT a, b, CAST(cnt AS BIGINT) AS cnt, CAST(ca AS BIGINT) AS ca,
            CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
            round((CAST(cnt AS DOUBLE) - 0.75) / ca
              + 0.75 * CAST(na AS DOUBLE) / ca * (CAST(nb AS DOUBLE) / tt), 6)
              AS pkn
          FROM m ORDER BY cnt DESC, a, b LIMIT 20""",


    "q247_kn_perplexity" ->
      s"""WITH pr AS (SELECT doc_id, pr.a AS a, pr.b AS b
            FROM (SELECT doc_id,
                unnest(list_transform(range(1, len(lst)), i ->
                  struct_pack(a := lst[CAST(i AS INT)],
                    b := lst[CAST(i AS INT) + 1]))) AS pr
              FROM (SELECT doc_id, $tokSql AS lst FROM documents)
              WHERE len(lst) >= 2)),
          c AS (SELECT a, b, count(*) AS cnt FROM pr GROUP BY 1, 2),
          m AS (SELECT a, b, (CAST(cnt AS DOUBLE) - 0.75) / ca
                  + 0.75 * CAST(na AS DOUBLE) / ca
                    * (CAST(nb AS DOUBLE) / tt) AS p
                FROM (SELECT a, b, cnt,
                        sum(cnt) OVER (PARTITION BY a) AS ca,
                        count(*) OVER (PARTITION BY a) AS na,
                        count(*) OVER (PARTITION BY b) AS nb,
                        (SELECT count(*) FROM c) AS tt FROM c)),
          s AS (SELECT doc_id, p FROM pr JOIN m USING (a, b))
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
            round(avg(-log2(p)), 6) AS avg_kn_bits,
            round(power(CAST(2 AS DOUBLE), avg(-log2(p))), 6) AS ppl
          FROM s GROUP BY doc_id ORDER BY doc_id""",

    // Held-out KN rebuilt from scratch: the q136 split rule, one
    // combined bigram-type table with conditional train counts, the
    // same window marginals as q247's oracle, and the four-branch
    // degradation spelled with the identical double expressions.
    "q250_kn_heldout" ->
      s"""WITH t AS (SELECT doc_id,
              (md5_number_lower('split:' || CAST(doc_id AS VARCHAR)) & 1023) < 819 AS tr,
              $tokSql AS lst FROM documents),
          pr AS (SELECT doc_id, tr, pr.a AS a, pr.b AS b
            FROM (SELECT doc_id, tr,
                unnest(list_transform(range(1, len(lst)), i ->
                  struct_pack(a := lst[CAST(i AS INT)],
                    b := lst[CAST(i AS INT) + 1]))) AS pr
              FROM t WHERE len(lst) >= 2)),
          c AS (SELECT a, b,
                 sum(CASE WHEN tr THEN 1 ELSE 0 END) AS cnt_tr
                FROM pr GROUP BY 1, 2),
          n AS (SELECT sum(CASE WHEN cnt_tr > 0 THEN 1 ELSE 0 END) AS tt
                FROM c),
          m AS (SELECT a, b, cnt_tr,
              sum(cnt_tr) OVER (PARTITION BY a) AS ca,
              sum(CASE WHEN cnt_tr > 0 THEN 1 ELSE 0 END)
                OVER (PARTITION BY a) AS na,
              sum(CASE WHEN cnt_tr > 0 THEN 1 ELSE 0 END)
                OVER (PARTITION BY b) AS nb,
              (SELECT tt FROM n) AS tt FROM c),
          s AS (SELECT doc_id, cnt_tr, ca, na, nb, tt,
              CASE WHEN cnt_tr > 0 THEN
                     (CAST(cnt_tr AS DOUBLE) - 0.75) / ca
                       + 0.75 * CAST(na AS DOUBLE) / ca
                         * (CAST(nb AS DOUBLE) / tt)
                   WHEN ca > 0 AND nb > 0 THEN
                     0.75 * CAST(na AS DOUBLE) / ca
                       * (CAST(nb AS DOUBLE) / tt)
                   WHEN nb > 0 THEN CAST(nb AS DOUBLE) / tt
                   ELSE CAST(1 AS DOUBLE) / (tt + 1) END AS p
            FROM pr JOIN m USING (a, b) WHERE NOT tr)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
            CAST(sum(CASE WHEN cnt_tr > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_seen,
            CAST(sum(CASE WHEN cnt_tr = 0 AND ca > 0 AND nb > 0
              THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
            CAST(sum(CASE WHEN cnt_tr = 0 AND ca = 0 AND nb > 0
              THEN 1 ELSE 0 END) AS BIGINT) AS n_cont,
            CAST(sum(CASE WHEN nb = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_oov,
            round(avg(-log2(p)), 6) AS avg_kn_bits,
            round(power(CAST(2 AS DOUBLE), avg(-log2(p))), 6) AS ppl
          FROM s GROUP BY doc_id ORDER BY doc_id""",

    // PMI rebuilt: the same bigram-type counts, window marginals and
    // natural log over exact integer ratios.
    "q135_pmi_collocations" ->
      s"""WITH pr AS (SELECT pr.a AS a, pr.b AS b
            FROM (SELECT unnest(list_transform(range(1, len(lst)), i ->
                struct_pack(a := lst[CAST(i AS INT)], b := lst[CAST(i AS INT) + 1]))) AS pr
              FROM (SELECT $tokSql AS lst FROM documents) WHERE len(lst) >= 2)),
          c AS (SELECT a, b, count(*) AS cnt FROM pr GROUP BY 1, 2),
          m AS (SELECT a, b, cnt,
              sum(cnt) OVER (PARTITION BY a) AS ca,
              sum(cnt) OVER (PARTITION BY b) AS cb,
              (SELECT sum(cnt) FROM c) AS n FROM c)
          SELECT a, b, CAST(cnt AS BIGINT) AS cnt,
            round(ln(cnt * n * 1.0 / (ca * cb)), 6) AS pmi
          FROM m WHERE cnt >= 5
          ORDER BY pmi DESC, a, b LIMIT 20""",
  )
}
