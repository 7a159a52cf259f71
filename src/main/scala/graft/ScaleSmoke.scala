package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Opt-in scale linearity smoke for the pair-finders: runs each on the
  * documents/embeddings corpus at 1x and 10x and reports the runtime
  * ratio — the early-warning check that catches the next quadratic
  * path (an uncapped self-join blows past 10x growth long before the
  * driver bench does).
  *
  * The 10x corpora are id-shifted copies whose CONTENT is salted per
  * copy (tokens suffixed / embeddings jittered), so copies do not
  * near-duplicate each other and the duplicate-pair density per row
  * stays constant — the regime where a healthy pair-finder scales
  * ~linearly and a skew-uncapped one goes quadratic.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.ScaleSmoke"
  * Exit code 1 if any ratio exceeds MaxRatio (clear superlinear signal).
  */
object ScaleSmoke {

  /** 10x wall-clock budget with generous constant-overhead slack: a
    * quadratic pair path shows up as >= 50x, linear lands well under.
    */
  val MaxRatio = 25.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    // comma-separated finder filter for targeted re-measurement; a
    // filtered run never writes the evidence file (partial results
    // must not masquerade as a full sweep)
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.split(',').toSet)
    val spark = LocalSession.build()

    val docs = Tables.df(spark, sfDir, "documents").select("doc_id", "lang", "text")
    val embs = Tables.df(spark, sfDir, "embeddings").select("vec_id", "embedding")

    // k salted copies: copy 0 is the original; higher copies shift ids
    // and perturb content so cross-copy rows never pair (lang passes
    // through unchanged — the KL group count stays constant while the
    // vocab grows, the regime where the closed-form remainder matters).
    // Shared with EdJoinFuelDecades (ScaleCorpus) so the decade fuel
    // audit measures the SAME salted corpus as the edjoin finder here.
    def docsX(k: Int): DataFrame = ScaleCorpus.docsX(docs, k)

    // k-fold users (id-shifted copies) over the SAME time span —
    // constant per-user history, the regime where user-keyed window
    // ops should scale with the log and calendar-bounded state stays
    // constant
    def eventsX(k: Int): DataFrame = {
      val ev = Tables.df(spark, sfDir, "events")
        .select("user_id", "event_type", "ts", "event_id")
      (0 until k).map { i =>
        if (i == 0) ev
        else ev.select((col("user_id") + lit(i * 10000000L)).as("user_id"),
          col("event_type"), col("ts"),
          (col("event_id") + lit(i * 1000000000L)).as("event_id"))
      }.reduce(_ unionByName _)
    }

    // shared with BucketLoadDecades (ScaleCorpus) so the decade smokes
    // and the fuel audit measure the SAME salted corpus
    def embsX(k: Int): DataFrame = ScaleCorpus.embsX(embs, k)

    // letters-only salt for the [a-z]+-tokenizing trainers (BPE / LR):
    // the "_i" salt above would be filtered out of their word stream
    // and the copies would vanish from the measured path
    def docsXLetters(k: Int): DataFrame = (0 until k).map { i =>
      if (i == 0) docs
      else docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("lang"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit("q" * i)))).as("text"))
    }.reduce(_ unionByName _)

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.foreach(_ => ())
      graft.api.CacheScope.global.release(blocking = true)
      (System.nanoTime() - t0) / 1e9
    }

    val finders: Seq[(String, Int => DataFrame)] = Seq(
      "ngram_jaccard" -> (k =>
        graft.dedup.NgramJaccard.jaccardPairs(docsX(k), "doc_id", "text")),
      "ngram_ppjoin" -> (k =>
        graft.dedup.NgramJaccard.jaccardPairsExact(docsX(k), "doc_id", "text")),
      "edjoin" -> (k =>
        // exact edit-distance pairs: the salted copies perturb every
        // word, so cross-copy distances blow past d and per-copy pair
        // counts stay constant; shared word-interior grams grow k-fold
        // in df, which the rarest-first prefix order must keep OUT of
        // the inverted index — the property this finder measures
        graft.dedup.EdJoin.edPairs(docsX(k), "doc_id", "text", q = 3, d = 8)),
      "minhash_lsh" -> (k =>
        graft.dedup.MinHash.nearDupPairs(docsX(k), "doc_id", "text")),
      "minhash_calib" -> (k =>
        // same bucket-bounded candidate plan as minhash_lsh plus k
        // signature-equality checks per candidate: salted copies share
        // no buckets, so candidates stay constant while the corpus
        // grows k-fold
        graft.dedup.MinHash.estVsExactPairs(docsX(k), "doc_id", "text")),
      "embed_neardup" -> (k =>
        graft.ann.Knn.nearDupPairs(embsX(k), "vec_id", "embedding", threshold = 0.95)),
      "matcher_lsh" -> (k => {
        // within-collection generalized matcher on the LSH tier — the
        // round-6 operator; banded candidates keep it near-linear
        val e = embsX(k)
        graft.ann.Matcher.findMatchesLshTopN(e, e, "vec_id", "embedding",
          graft.ann.Matcher.MatchConfig(topN = 3, minSimilarity = Some(0.9)))
      }),
      "sigindex_delta" -> (k =>
        // fixed-size delta vs k-times corpus: the corpus side is two
        // map-only scans, so growth should track corpus size linearly
        graft.dedup.SignatureIndex.crossPairsInline(
          docsX(k).filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          "doc_id", "text")),
      "winnow_pairs" -> (k =>
        // map-only window-min sketches + bucket-bounded pair join: the
        // salted copies share no fingerprints, so bucket sizes (and
        // pair counts) stay constant while the corpus grows k-fold
        graft.dedup.Winnow.sharedFingerprintPairs(docsX(k), "doc_id", "text")),
      "dup_spans" -> (k =>
        // positional grams + distinct-doc agg + keyed semi-join: all
        // corpus-linear; the salted copies share no shingles so the
        // duplicated-gram density stays constant
        graft.dedup.SpanDedup.duplicatedSpans(docsX(k), "doc_id", "text")),
      "line_dedup" -> (k => {
        // every doc carries the same footer line (a hot line at
        // corpus-wide df): the first-occurrence table is a PARTIAL
        // aggregate (min of (doc, pos)), so the hot group combines
        // map-side and growth stays ~linear — the skew regime a
        // per-hash window formulation would fail
        val lined = docsX(k).withColumn("text",
          concat(regexp_replace(col("text"), "(([^ ]+ ){9}[^ ]+) ", "$1.|"),
            lit("|all rights reserved footer line")))
        graft.dedup.LineDedup.dedupLines(lined, "doc_id", "text", sep = "|")
      }),
      "corpus_kl" -> (k =>
        // pairwise KL over GLOBAL vocab: groups stay constant, vocab
        // grows ~k-fold — linear iff the absent-absent remainder stays
        // closed-form (nothing V x L^2 joined)
        graft.ops.Corpus.klDivergence(docsX(k), "lang", "text")),
      "kmeans" -> (k => {
        // Lloyd's: per-iteration cost is one scan + k x d doubles to the
        // driver, so 10x rows should be ~10x per iteration
        val e = embsX(k)
        graft.ann.KMeans.assign(e, "vec_id", "embedding",
          graft.ann.KMeans.fit(e, "vec_id", "embedding", k = 8, maxIters = 3))
      }),
      "decontam_embed" -> (k =>
        // fixed eval set vs k-times train corpus: eval bands broadcast,
        // train side is map-side bands + one keyed verify join
        graft.ann.Knn.decontaminateEmbed(embsX(k),
          embs.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
          threshold = 0.95)),
      "bpe_train" -> (k => {
        // corpus compresses to its word table first; 10 merge rounds of
        // vocabulary-sized work after one corpus-sized groupBy
        val m = graft.text.BpeTrain.fit(docsXLetters(k), "text", nMerges = 10)
        graft.text.BpeTrain.encode(docsXLetters(k), "text", m).select("doc_id", "tokens")
      }),
      "lr_classify" -> (k =>
        // 3 GD steps = 3 partial-avg scans + 1 scoring scan, all map-only
        graft.ops.LogReg.classify(docsXLetters(k), "doc_id", "text",
          label = col("lang") === "en")),
      "dsir" -> (k =>
        // bucket-model build (2 scans) + model broadcast back over the
        // token stream — all partial-agg, corpus-linear
        graft.ops.Corpus.importanceWeights(docsX(k), "doc_id", "text",
          targetPred = col("lang") === "en")),
      "hard_negatives" -> (k => {
        // fixed 24-probe broadcast vs k-times corpus: the probe side
        // is constant-sized by construction (hash-order limit), so
        // cost is one corpus scan — the % 50 fraction-sampling shape
        // this finder exists to keep out went O(n²/50)
        val d = Tables.df(spark, sfDir, "documents")
          .select("doc_id", "source", "text")
        val corpus = (0 until k).map { i =>
          if (i == 0) d
          else d.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            col("source"),
            concat_ws(" ", transform(split(col("text"), " "),
              t => concat(t, lit(s"_$i")))).as("text"))
        }.reduce(_ unionByName _)
        graft.ops.HardNegatives.mine(corpus, "doc_id", "source", "text")
      }),
      "boilerplate" -> (k => {
        // line-frequency pass + bounded-set broadcast filter: the
        // footer is boilerplate at every k, the threshold scales with
        // the corpus so the common set stays constant-sized
        val footered = docsX(k).withColumn("text",
          concat(col("text"), lit("|shared footer line here.")))
        graft.text.Clean.dropBoilerplate(footered, "doc_id", "text",
          sep = "|", minDocs = 100L * k)
      }),
      "corpus_build" -> (k => {
        // stopword-PRESERVING per-copy salt: the generic "_i" salt
        // would zero every copy's stopword ratio and the quality gate
        // would drop stages 2-4 back to 1x data; salting only
        // non-stopwords keeps the gate pass-rate constant while (a)
        // copies stay fingerprint-distinct (no cross-copy dedup) and
        // (b) each copy's grams only contaminate against its own
        // eval slice (constant contamination density)
        def salted(i: Int) =
          if (i == 0) docs
          else docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            col("lang"),
            concat_ws(" ", transform(split(col("text"), " "),
              t => when(t.isin(graft.text.TextFunctions.stopwords: _*), t)
                .otherwise(concat(t, lit(s"_$i"))))).as("text"))
        val corpus = (0 until k).map(salted).reduce(_ unionByName _)
        // the composed 4-stage pass: gate (map) + fingerprint dedup
        // (keyed agg) + decontam (eval broadcast, eval scales with the
        // corpus here) + budget (bucketed prefix sum) — every stage
        // corpus-linear; the budget scales with k so membership work
        // doesn't vanish
        graft.ops.CorpusBuild.trainingSubset(corpus, "doc_id", "lang", "text",
          evalPred = col("doc_id") % 10 === 0, w = 4,
          budgetPerSource = 700L * k, salt = "ss")
      }),
      "skew_ngram" -> (k => {
        // ONE hot shingle family at corpus-wide df: every doc carries
        // the same boilerplate phrase, so uncapped the inverted-index
        // self-join would form (n·k)² candidate rows on it. The df cap
        // drops the hot postings (SkewCapSpec pins both sides of that
        // contract) and cost stays ~linear — the skew regime the
        // uniform-salted finders above never enter
        val hot = docsX(k).withColumn("text", concat(col("text"),
          lit(" graft shared boilerplate footer phrase common to every single document")))
        graft.dedup.NgramJaccard.jaccardPairs(hot, "doc_id", "text", maxDf = 200)
      }),
      "skew_minhash" -> (k => {
        // template spam: 40·k exact copies of one text — the template's
        // band buckets grow k-fold; the bucket cap drops them once past
        // 100, bounding pair formation regardless of k
        val spam = spark.range(40L * k).select(
          (col("id") + 900000000L).as("doc_id"),
          lit("the same template text repeated verbatim for every spam row of this corpus").as("text"))
        graft.dedup.MinHash.nearDupPairs(
          docsX(k).select("doc_id", "text").unionByName(spam),
          "doc_id", "text", maxBucket = 100)
      }),
      "skew_winnow" -> (k => {
        // one shared passage in every doc: its fingerprint bucket is
        // corpus-sized; the bucket cap drops it at any k
        val hot = docsX(k).withColumn("text", concat(col("text"),
          lit(" this long shared passage of twenty tokens sits inside every document so its fingerprints bucket together across the entire corpus")))
        graft.dedup.Winnow.sharedFingerprintPairs(hot, "doc_id", "text", maxBucket = 200)
      }),
      "js_divergence" -> (k =>
        // same shape contract as corpus_kl: groups constant, vocab
        // grows ~k-fold, the absent-absent mass must stay closed-form
        graft.ops.Corpus.jsDivergence(docsX(k), "lang", "text")),
      "basket_pairs" -> (k => {
        // k-fold users (id-shifted copies), constant per-user session
        // shape: the basket self-join is keyed on (user, session) with
        // ≤|types| rows per side per key, so pair work grows with the
        // user count — linear — never with the corpus squared
        val ev = Tables.df(spark, sfDir, "events")
          .select("user_id", "event_type", "ts", "event_id")
        val evX = (0 until k).map { i =>
          if (i == 0) ev
          else ev.select((col("user_id") + lit(i * 10000000L)).as("user_id"),
            col("event_type"), col("ts"),
            (col("event_id") + lit(i * 1000000000L)).as("event_id"))
        }.reduce(_ unionByName _)
        graft.ops.EventFeatures.basketPairs(evX, "user_id", "event_type",
          "ts", "event_id")
      }),
      "pagerank" -> (k =>
        // iterative op on the pair graph: the pair-finder dominates
        // (persisted once per call — the eager CacheScope discipline),
        // five fixed rank rounds ride the cap-bounded edge list, so
        // cost tracks the minhash_lsh finder ~linearly
        graft.ops.PageRank.ranks(
          graft.dedup.MinHash.nearDupPairs(docsX(k), "doc_id", "text"),
          "id_a", "id_b")),
      "pagerank_dist" -> (k => {
        // the DISTRIBUTED iterate path, which the bench-scale dup
        // graphs no longer reach (they sit under the 50k driver-fold
        // threshold): a deterministic LCG edge list of 60k·k pairs
        // (> threshold at every k) drives the join-per-round shape —
        // five rounds of one keyed join + one groupBy each, so cost
        // should track the edge count ~linearly. PageRankSpec pins
        // driver==distributed bit-equality; this finder keeps the
        // distributed path's wall-clock a standing committed number.
        val n = 60000L * k
        graft.ops.PageRank.ranks(
          spark.range(n).select(col("id").as("id_a"),
            ((col("id") * 48271L + 12345L) % n).as("id_b")),
          "id_a", "id_b")
      }),
      "dup_triangles" -> (k =>
        // triangle census on the pair graph: salted copies keep each
        // copy's pair structure intact, so edges AND per-node degrees
        // stay constant per copy — the edge-edge path join (bounded by
        // Σ deg² under the bucket cap) grows ~k, never (n·k)²; the
        // persisted edge list rides the global scope time() releases
        graft.dedup.GraphStats.triangleCensus(
          graft.api.CacheScope.global.persist(
            graft.dedup.MinHash.nearDupPairs(docsX(k), "doc_id", "text")
              .select("id_a", "id_b")))),
      "event_paths" -> (k => {
        // k-fold users, constant per-user history: ONE fused window
        // pass on the user key + a |types|³-bounded aggregate — linear
        // in the event log
        graft.ops.EventFeatures.eventPaths(eventsX(k), "user_id",
          "event_type", "ts", "event_id")
      }),
      "concurrency" -> (k => {
        // k-fold users in the SAME time span: sessions grow ~k but the
        // hourly boundary table stays calendar-bounded, so the
        // triangular cumulative join is constant-size and total cost
        // tracks the sessionizing window pass
        graft.ops.EventFeatures.concurrency(eventsX(k), "user_id",
          "ts", "event_id")
      }))
    // (no semdedup finder: its pair join is by contract quadratic in
    // CLUSTER size — the scale dial is k ∝ n (constant cluster size,
    // fit on a subsample), so a fixed-k 10x run measures the documented
    // regime, not a regression; the within-bucket pair shape itself is
    // smoked by embed_neardup)

    var failed = false
    val results = finders.filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, f) =>
      val warm = time(f(1)) // JIT/classload warm-up, untimed
      val t1 = time(f(1))
      val tk = time(f(copies))
      val ratio = tk / math.max(t1, 0.01)
      if (ratio > MaxRatio) failed = true
      System.err.println(f"[scale] $name%-14s 1x=$t1%.2f s ${copies}x=$tk%.2f s ratio=$ratio%.1f (warm $warm%.2f)")
      s""""$name":{"t1":$t1,"tk":$tk,"ratio":$ratio}"""
    }
    val line = s"""{"metric":"scale_smoke","copies":$copies,"max_ratio":$MaxRatio,"finders":{${results.mkString(",")}},"sf":"$sfDir"}"""
    // committed-evidence file, same convention as Bench -> BENCH_FULL.json;
    // name carries the sf so the sf0.01 and sf1 runs don't clobber each other
    val out = "SCALE_SMOKE_" + sfDir.split('/').last.replace('.', '_') + ".json"
    if (only.isEmpty)
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
      catch { case e: Exception =>
        System.err.println(s"[scale] $out write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
    if (failed) sys.exit(1)
  }
}
