package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming operators (SURVEY §2 row 55). Each transform is
  * written against the unified DataFrame API so the SAME function works
  * on a batch frame and a `readStream` frame — batch runs are the
  * correctness oracle for the streaming path (spec-checked parity).
  *
  * Scale/semantics notes: watermarks bound state for late data;
  * windowed aggregation state is per (window, key) and expires past the
  * watermark; dedup uses dropDuplicatesWithinWatermark so the seen-set
  * is bounded; custom state (running totals) uses mapGroupsWithState
  * with explicit per-key state.
  */
object StreamOps {

  /** Windowed count/sum per (time window, key). On a streaming input a
    * watermark must be set for append-mode sinks and state expiry.
    */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String,
      watermark: Option[String] = None): DataFrame = {
    val base =
      if (df.isStreaming && watermark.isDefined) df.withWatermark(tsCol, watermark.get)
      else df
    base.groupBy(window(col(tsCol), windowDuration).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("n_events"), col("sum_value"))
  }

  /** Trailing-7-day rolling daily volume as a SLIDING event-time
    * window (7-day window sliding 1 day) — the streaming twin of the
    * batch RANGE-window op (`q_rolling_daily`). Emits
    * (key, day, n_7d) for every epoch day whose trailing window holds
    * at least one event — a SUPERSET of the batch frame, which emits
    * only days with same-day events; on those shared days the counts
    * agree exactly (spec-pinned). The watermark bounds per
    * (window, key) state to ~7 days + allowed lateness; sliding
    * windows align to the epoch, so the as-of day is
    * window_end/86400s − 1.
    */
  def rollingDailyStream(df: DataFrame, tsCol: String, keyCol: String,
      watermark: Option[String] = None): DataFrame = {
    val base =
      if (df.isStreaming && watermark.isDefined) df.withWatermark(tsCol, watermark.get)
      else df
    base.groupBy(window(col(tsCol), "7 days", "1 day").as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_7d"))
      .select(col(keyCol),
        (expr("unix_micros(w.end) div 86400000000") - 1).as("day"),
        col("n_7d"))
  }

  /** Streaming dedup with bounded state: duplicates of `keyCols` are
    * dropped while their event time is within the watermark.
    */
  def dedupe(df: DataFrame, keyCols: Seq[String], tsCol: String, watermark: String): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)
    else df.dropDuplicates(keyCols)

  /** Streaming NEAR-dedup: drop documents whose 60-bit SimHash
    * fingerprint exactly matches an earlier document's within the
    * watermark — the streaming tier of the batch
    * [[graft.dedup.SimHash]] pair-finder. Exact-fingerprint match
    * catches the near-identical mass (boilerplate, templated spam,
    * re-crawls) at bounded state: one 8-byte fingerprint per document
    * inside the watermark, partitioned by fingerprint — no pair join
    * appears anywhere in the plan, so the op is safe on an unbounded
    * ingest stream. Batch input runs the same code as a plain
    * fingerprint dropDuplicates (parity spec-checked).
    */
  def nearDedupeStream(df: DataFrame, textCol: String, tsCol: String,
                       watermark: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val fp = df.withColumn("__fp", call_function("graft_simhash",
      call_function("graft_token_hashes60", col(textCol))))
    val deduped =
      if (df.isStreaming)
        fp.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(Seq("__fp"))
      else fp.dropDuplicates("__fp")
    deduped.drop("__fp")
  }

  /** Streaming train/eval decontamination: drop stream documents that
    * share ANY w-gram with a STATIC eval set — the streaming tier of
    * [[graft.ops.Corpus.decontaminateBloom]]. The eval side is batch:
    * its distinct gram hashes build one Bloom filter at stream-
    * definition time (right-sized from a real count), broadcast once.
    * The stream side is then a pure map — per row, hash the w-grams
    * and test `exists(gh, mightContain)` — so the operator is
    * STATELESS: no watermark, no state store, no shuffle, safe at any
    * ingest rate. False positives over-drop at ~`fpp` (never
    * under-drop); docs shorter than w tokens have no grams and always
    * pass. Batch input runs the identical filter (parity
    * spec-checked against the batch decontaminator).
    */
  /** Streaming SEMANTIC decontamination: drop every stream row whose
    * embedding is within cosine `threshold` of any eval embedding —
    * the stream tier of [[graft.ann.Knn.decontaminateEmbed]], catching
    * paraphrased benchmark leakage the n-gram Bloom filter above
    * misses. The eval matrix (bounded by the eval-suite contract, like
    * the Bloom's gram set) collects once, broadcasts once, and the
    * stream filter is pure map-side — STATELESS: no watermark, no
    * state store, restart-safe. The per-row check is the native
    * [[graft.functions.CosineAnyAbove]] codegen kernel (the eval
    * matrix rides the plan as a foldable literal — bounded by the
    * eval-suite contract); cosine rounds to 4dp exactly as the batch
    * operator does, so parity is bit-for-bit.
    */
  def decontaminateEmbedStream(stream: DataFrame, evalDf: DataFrame,
                               vecCol: String, evalVecCol: String,
                               threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(stream.sparkSession)
    val evalVecs: Seq[Seq[Double]] = evalDf
      .select(col(evalVecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .collect().map(_.getSeq[Double](0))
    val contaminated = call_function("graft_cosine_any",
      col(vecCol).cast("array<double>"), typedLit(evalVecs), lit(threshold))
    // coalesce keeps the legacy false-on-null behavior (null-vector
    // rows pass the filter)
    stream.filter(!coalesce(contaminated, lit(false)))
  }

  /** Streaming DSIR importance scoring — "fit the domain model on the
    * standing corpus once, score every incoming document forever": the
    * hashed-unigram LM log-ratio model
    * ([[graft.ops.Corpus.importanceWeights]]) collapses to an
    * nBuckets-double array on the driver (a LITERAL bound — the
    * KMeans-centers pattern), broadcasts once, and the stream side is
    * a STATELESS map-only per-doc sum — no joins, no state store, any
    * ingest rate. Buckets never seen in the corpus score with the
    * Laplace-smoothed default, exactly what the batch formula assigns
    * a zero-count bucket. Appends `log_w` (4dp, Spark round
    * semantics) to the stream; batch parity asserted in
    * StreamOpsSpec.
    */
  def importanceScoreStream(stream: DataFrame, corpus: DataFrame, textCol: String,
                            targetPred: org.apache.spark.sql.Column,
                            nBuckets: Int = 1024): DataFrame = {
    import graft.text.TextFunctions
    val isT = coalesce(targetPred, lit(false))
    val counts = corpus.select(isT.as("__t"),
        explode(expr(
          s"transform(${TextFunctions.tokenHashesSql(textCol)}, h -> h % $nBuckets)")).as("b"))
      .groupBy("b").agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("cr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nt = counts.map(_._2).sum
    val nr = counts.map(_._3).sum
    // same arithmetic shape as the batch model: ln((c+1)/(N+B)) ratios
    def lwOf(ct: Long, cr: Long): Double =
      math.log((ct + 1).toDouble / (nt + nBuckets)) -
        math.log((cr + 1).toDouble / (nr + nBuckets))
    val lw = Array.fill(nBuckets)(lwOf(0L, 0L))
    counts.foreach { case (b, ct, cr) => lw(b.toInt) = lwOf(ct, cr) }
    // native codegen table-sum kernel (graft.functions.TableSum): the
    // nBuckets-double model rides the plan as a foldable literal;
    // round() is Spark's own BigDecimal HALF_UP — batch parity holds
    graft.functions.GraftFunctions.register(stream.sparkSession)
    stream.withColumn("log_w", round(call_function("graft_table_sum",
      expr(TextFunctions.tokenHashesSql(textCol)), typedLit(lw.toSeq)), 4))
  }

  /** Streaming quantile normalization — the serve-time tier of
    * [[graft.ops.EventFeatures.quantileNormalize]]: fit the
    * per-(group, cent-value) CDF ONCE on the standing corpus (the
    * compressed histogram is bounded by the value domain, so it
    * collapses to driver arrays — the KMeans-centers pattern),
    * broadcast, and map each incoming row STATELESSLY to its
    * normalized rank. A value seen in the corpus reproduces the batch
    * op's qn bit-for-bit (identical integer arithmetic); an unseen
    * value interpolates by its insertion point (count of corpus
    * values strictly below it, cnt = 0 in the same formula) — so the
    * output stays monotone in the value and lands in (0, 1). An
    * unseen GROUP yields null (no distribution to normalize against).
    * No joins, no state store, any ingest rate. The per-row lookup is
    * the native [[graft.functions.GroupCdfRank]] codegen kernel (the
    * fitted per-group arrays ride the plan as a foldable binary
    * literal; binary search + the exact PortableRound integer
    * average-rank formula); batch parity asserted in StreamOpsSpec.
    */
  def quantileNormalizeStream(stream: DataFrame, corpus: DataFrame,
      groupCol: String, valueCol: String): DataFrame = {
    val fit = corpus.select(col(groupCol).cast("string").as("g"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("qv"))
      .filter(col("g").isNotNull && col("qv").isNotNull)
      .groupBy("g", "qv").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val model: Map[String, (Array[Long], Array[Long])] =
      fit.groupBy(_._1).map { case (g, rows) =>
        val sorted = rows.sortBy(_._2)
        val qvs = sorted.map(_._2).toArray
        val cnts = sorted.map(_._3).toArray
        // cum(i) = corpus values strictly below qvs(i); cum(len) = n
        val cum = new Array[Long](qvs.length + 1)
        var i = 0
        while (i < qvs.length) { cum(i + 1) = cum(i) + cnts(i); i += 1 }
        g -> ((qvs, cum))
      }
    graft.functions.GraftFunctions.register(stream.sparkSession)
    stream.withColumn("qn", call_function("graft_cdf_rank",
      col(groupCol).cast("string"),
      floor(col(valueCol).cast("double") * 100 + 0.5).cast("long"),
      lit(graft.functions.GroupCdfRank.encode(model))))
  }

  /** Serve-time winsorization: per-group p05/p95 caps fit ONCE on the
    * standing corpus (the [[graft.ops.Describe.winsorizedMeans]]
    * contract — groupQuantiles caps on the cent grid), broadcast as a
    * |groups|-entry map, then a stateless map clips each incoming
    * value — the live tier of the robust-mean dashboard (the batch op
    * aggregates; this emits the per-row clipped value a downstream
    * windowed mean consumes). Clip rule mirrors the batch categories
    * exactly (q ≤ lo → lo; q ≥ hi AND q > lo → hi; else q), so the
    * sum of streamed clipped values reproduces the batch winsorized
    * numerator — spec-asserted. Unseen group yields null. No joins,
    * no state store, no UDF: the caps ride the plan as two foldable
    * map literals and the clip is pure built-ins (map lookup +
    * CASE WHEN), fully inside whole-stage codegen.
    */
  def winsorizeStream(stream: DataFrame, corpus: DataFrame,
      groupCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val caps: Map[String, (Double, Double)] =
      graft.ops.Describe.groupQuantiles(corpus, groupCol, valueCol,
          Seq("p_lo" -> pLo, "p_hi" -> pHi))
        .select(col(groupCol).cast("string"), col("p_lo"), col("p_hi"))
        .collect()
        .filter(!_.isNullAt(0)) // a null corpus group can never be probed (null key lookups are null)
        .map(r => r.getString(0) ->
          ((r.getDouble(1) * 100.0, r.getDouble(2) * 100.0))).toMap
    val lo = try_element_at(typedLit(caps.map { case (g, c) => g -> c._1 }),
      col(groupCol).cast("string"))
    val hi = try_element_at(typedLit(caps.map { case (g, c) => g -> c._2 }),
      col(groupCol).cast("string"))
    val q = floor(col(valueCol).cast("double") * 100 + 0.5)
    val clipped = when(q <= lo, lo).when(q >= hi, hi).otherwise(q)
    stream.withColumn("winsorized",
      when(lo.isNotNull && hi.isNotNull && q.isNotNull, clipped / 100.0))
  }

  /** Streaming retrieval against the persisted IVF+PQ index
    * ([[graft.ann.IvfPqIndex]]) — "build the index on the standing
    * corpus once, serve every incoming query forever". Structured
    * Streaming cannot express per-query top-k in append mode (top-k
    * is an ordered limit, not a watermarked aggregation), so the
    * streaming shape is the standard foreachBatch one: this is the
    * BATCH BODY — each micro-batch's queries (bounded: a batch of
    * retrieval requests) probe the static on-disk index with the same
    * partition-pruned ADC scan the batch `searchVectorPq` runs, and
    * the union of the ≤ nQueries·k result rows comes back as one
    * frame. All state is the on-disk index — restart-safe, nothing in
    * the state store. Batch parity asserted in StreamOpsSpec.
    *
    * {{{
    * queries.writeStream.foreachBatch { (b: DataFrame, _: Long) =>
    *   StreamOps.probeVectorPqBatch(b, "qid", "vec", dir, k = 5)
    *     .write.mode("append").parquet(out)
    * }.start()
    * }}}
    */
  def probeVectorPqBatch(batch: DataFrame, qidCol: String, vecCol: String,
                         indexDir: String, k: Int, nProbe: Int = 4,
                         rerank: Int = 0,
                         raw: Option[(DataFrame, String, String)] = None): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val queries: Seq[(Long, Seq[Double])] = batch
      .select(col(qidCol).cast("long"), col(vecCol).cast("array<double>"))
      .filter(col(vecCol).isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
    if (queries.isEmpty)
      return Seq.empty[(Long, Long, Double)].toDF("qid", "id", "score")
    val rows = queries.flatMap { case (qid, qv) =>
      graft.ann.IvfPqIndex.probe(spark, indexDir, qv, k, nProbe, rerank, raw)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }
    rows.toDF("qid", "id", "score")
  }

  def decontaminateStream(stream: DataFrame, evalDf: DataFrame, textCol: String,
                          evalTextCol: String, w: Int, fpp: Double = 0.01): DataFrame = {
    import graft.text.{Repetition, TextFunctions}
    // persisted across the two actions (count for sizing, then the
    // bloomFilter aggregation) — one tokenize/distinct pass, not two
    val evalGrams = evalDf
      .select(explode(Repetition.ngrams(col(evalTextCol), w)).as("gram"))
      .select(TextFunctions.portableHash60(col("gram")).as("gh"))
      .distinct()
      .persist()
    val bloom = try {
      val n = math.max(evalGrams.count(), 1L)
      graft.ops.Sketches.buildBloom(evalGrams, col("gh"), n, fpp)
    } finally evalGrams.unpersist()
    // native codegen any-hit probe over the doc's gram-hash array (the
    // array<bigint> arm of graft_bloom_contains) — no boxed udf on the
    // per-event path; coalesce keeps the legacy null-text behavior
    // (null grams array probed false → row kept)
    graft.functions.GraftFunctions.register(stream.sparkSession)
    val gramHashes = transform(Repetition.ngrams(col(textCol), w),
      g => TextFunctions.portableHash60(g))
    stream.filter(!coalesce(
      graft.functions.BloomContains.probe(gramHashes, bloom), lit(false)))
  }

  /** Streaming ingest with incremental near-dup rejection against the
    * persisted [[graft.dedup.SignatureIndex]] — the daily-ingest loop
    * as a stream. Per micro-batch (foreachBatch — the index is a file
    * artifact, so the batch API drives it):
    *  1. near-dups of the batch vs the STANDING CORPUS drop out
    *     ([[graft.dedup.SignatureIndex.deltaPairs]]: batch side
    *     broadcasts, corpus index never shuffles);
    *  2. batch-INTERNAL near-dup clusters prune to one representative
    *     ([[graft.api.Collection.dedupe]] — pairs → components →
    *     anti-join, all batch-sized);
    *  3. survivors' signatures APPEND to the index, then flow to
    *     `sink`.
    * All cross-batch state lives in the on-disk index — a restart
    * resumes exactly where the index left off, no state store to
    * recover. Exactly-once caveat: append and sink are two writes; if
    * the job dies between them a re-processed batch self-excludes on
    * ids (deltaPairs filters corpus_id = new_id) but text-identical
    * re-sends under NEW ids would be rejected as dups — the safe
    * failure mode for a dedup pipeline.
    */
  def dedupeIngestStream(stream: DataFrame, idCol: String, textCol: String,
                         indexDir: String, threshold: Double = 0.5)
                        (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val scope = new graft.api.CacheScope()
      try {
        val b = scope.persist(batch)
        val dupIds = graft.dedup.SignatureIndex
          .deltaPairs(b.sparkSession, indexDir, b, idCol, textCol, threshold, scope = scope)
          .select(col("new_id").as(idCol)).distinct()
        val fresh = b.join(dupIds, Seq(idCol), "left_anti")
        val survivors = scope.persist(
          new graft.api.Collection("batch", fresh).dedupe(idCol, textCol, threshold, scope))
        graft.dedup.SignatureIndex.append(survivors, idCol, textCol, indexDir)
        sink(survivors)
      } finally scope.release(blocking = true)
    }.start()

  /** A closed gap-session (streaming twin of [[graft.ops.Sessionize]]):
    * event-time micros of the first/last event, event count, value sum.
    */
  case class Session(user: String, startUs: Long, endUs: Long, nEvents: Long, sumValue: Double)

  /** Open-session state carried between micro-batches. */
  case class SessionAcc(startUs: Long, endUs: Long, nEvents: Long, sumValue: Double)

  /** Streaming gap-based sessionization via flatMapGroupsWithState —
    * the stateful-operator analog of the batch
    * [[graft.ops.Sessionize.sessionize]] (spec checks parity).
    *
    * Per user key: batch events merge into the open session when within
    * `gapSeconds` of its end, else the open session CLOSES (emitted) and
    * a new one starts; an event-time timeout closes the open session
    * once the watermark passes its end + gap, bounding state to one
    * small struct per active user. Input must carry a watermark on the
    * event-time column for the timeout to fire.
    */
  def sessionizeStream(
      ds: Dataset[(String, java.sql.Timestamp, Double)], // (user, eventTime, value)
      gapSeconds: Long): Dataset[Session] = {
    import ds.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    // the event-time column rides through AS A TIMESTAMP: converting it
    // to a long upstream would strip the watermark metadata the
    // EventTimeTimeout checker requires
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: String, rowsT: Iterator[(String, java.sql.Timestamp, Double)], state: GroupState[SessionAcc]) =>
          val rows = rowsT.map { case (u, t, v) => (u, us(t), v) }
          if (!state.hasTimedOut && rows.isEmpty && state.exists) {
            Iterator.empty
          } else if (state.hasTimedOut) {
            // watermark passed the open session's end + gap: close it
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.startUs, s.endUs, s.nEvents, s.sumValue))
          } else {
            val sorted = rows.toSeq.sortBy(_._2)
            var open = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer[Session]()
            sorted.foreach { case (_, t, v) =>
              open match {
                case Some(s) if t - s.endUs <= gapUs =>
                  // min on start: a late (within-watermark) event can
                  // PRECEDE the open session's first event — the batch
                  // sessionizer would report the true min as the start
                  open = Some(SessionAcc(math.min(s.startUs, t), math.max(s.endUs, t),
                    s.nEvents + 1, s.sumValue + v))
                case Some(s) =>
                  closed += Session(user, s.startUs, s.endUs, s.nEvents, s.sumValue)
                  open = Some(SessionAcc(t, t, 1L, v))
                case None =>
                  open = Some(SessionAcc(t, t, 1L, v))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fires once the event-time watermark passes end + gap
              // (clamped above the current watermark: late data could
              // otherwise compute a timeout already in the past)
              val t = (s.endUs + gapUs) / 1000L + 1L
              state.setTimeoutTimestamp(math.max(t, state.getCurrentWatermarkMs + 1L))
            }
            closed.iterator
          }
      }
  }

  /** Streaming per-key z-score anomaly flags — the continuous twin of
    * the batch q_anomaly monitor, with PREFIX semantics (the only ones
    * a stream can have): each event scores against its key's running
    * mean/std over everything seen BEFORE it, then folds into the
    * state. Welford's online update keeps the state at three doubles
    * per key — numerically stable, O(keys) memory, no event history
    * retained. Events score only once >= `minN` prior observations
    * exist and the running std is positive; z rounds to 4dp (Spark
    * round semantics). Within a micro-batch, a key's rows process in
    * ascending id order so replays are deterministic.
    *
    * Input (key, id, value) → flagged (key, id, z) with |z| >= thresh.
    */
  def anomalyStream(ds: Dataset[(Long, Long, Double)],
      minN: Int = 5, zThresh: Double = 2.0): Dataset[(Long, Long, Double)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[(Long, Double, Double)]) =>
          var (n, mean, m2) = state.getOption.getOrElse((0L, 0.0, 0.0))
          val out = scala.collection.mutable.ListBuffer[(Long, Long, Double)]()
          rows.toSeq.sortBy(_._2).foreach { case (_, id, v) =>
            if (n >= minN) {
              val sd = math.sqrt(m2 / n)
              if (sd > 0) {
                val z = BigDecimal.decimal((v - mean) / sd)
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (math.abs(z) >= zThresh) out += ((key, id, z))
              }
            }
            n += 1
            val d = v - mean
            mean += d / n
            m2 += d * (v - mean)
          }
          state.update((n, mean, m2))
          out.iterator
      }
  }

  /** Streaming twin of [[graft.ops.Moments]]: per-key RUNNING skewness
    * and excess kurtosis via the one-pass central-moment update
    * (Pébay's M2/M3/M4 recurrences — the Welford state of
    * [[anomalyStream]] extended two moments up; five doubles per key,
    * bounded). Each event folds in id order and emits the shape of the
    * prefix INCLUDING itself once `minN` events have arrived — the
    * live tail-drift monitor (a kurtosis trending up under a flat
    * std is the fraud/outage signature the batch q_moments reports
    * after the fact). Replaying a corpus reproduces the batch op's
    * final values (spec-pinned at 4dp; the recurrences are
    * algebraically the power-sum moments, differing only in float
    * path).
    */
  def momentsStream(ds: Dataset[(Long, Long, Double)],
      minN: Int = 4): Dataset[(Long, Long, Double, Double)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[(Long, Double, Double, Double, Double)]) =>
          var (n, mean, m2, m3, m4) =
            state.getOption.getOrElse((0L, 0.0, 0.0, 0.0, 0.0))
          val out = scala.collection.mutable.ListBuffer[(Long, Long, Double, Double)]()
          rows.toSeq.sortBy(_._2).foreach { case (_, id, v) =>
            val n1 = n + 1
            val delta = v - mean
            val dn = delta / n1
            val term1 = delta * dn * n
            m4 += term1 * dn * dn * (n1.toDouble * n1 - 3.0 * n1 + 3.0) +
              6.0 * dn * dn * m2 - 4.0 * dn * m3
            m3 += term1 * dn * (n1 - 2.0) - 3.0 * dn * m2
            m2 += term1
            mean += dn
            n = n1
            if (n >= minN && m2 > 0) {
              val nd = n.toDouble
              val skew = BigDecimal.decimal(
                  math.sqrt(nd) * m3 / math.pow(m2, 1.5))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
              val kurt = BigDecimal.decimal(nd * m4 / (m2 * m2) - 3.0)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
              out += ((key, id, skew, kurt))
            }
          }
          state.update((n, mean, m2, m3, m4))
          out.iterator
      }
  }

  /** Page's two-sided CUSUM alarm stream (Page 1954) — the ONLINE
    * changepoint detector (the batch `q_cusum` curve diagnoses a shift
    * after the fact; this one fires while it happens). Per key:
    * S⁺ = max(0, S⁺ + (v − μ0 − k)), S⁻ = max(0, S⁻ + (μ0 − k − v));
    * alarm when either exceeds h, then both reset (the standard
    * restart-after-alarm protocol). Two doubles of state per key —
    * bounded forever, no window. μ0/k/h come from the batch tier
    * (q_describe / q_cusum calibrate the target and the drift
    * allowance k, typically σ/2). Events inside a micro-batch fold in
    * id order (the house tie order), so replaying a corpus is
    * deterministic and a checkpoint kill+restart reproduces the
    * uninterrupted run (spec-pinned, the momentsStream protocol).
    * Emits (key, id, s_hi, s_lo, alarm) per event, 4dp HALF_UP like
    * the other streaming twins.
    */
  def cusumStream(ds: Dataset[(Long, Long, Double)],
      mu0: Double, k: Double, h: Double): Dataset[(Long, Long, Double, Double, Boolean)] = {
    import ds.sparkSession.implicits._
    require(h > 0, s"cusumStream: alarm threshold h must be > 0, got $h")
    def r4(x: Double): Double = BigDecimal.decimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[(Double, Double)]) =>
          var (shi, slo) = state.getOption.getOrElse((0.0, 0.0))
          val out = scala.collection.mutable.ListBuffer[(Long, Long, Double, Double, Boolean)]()
          rows.toSeq.sortBy(_._2).foreach { case (_, id, v) =>
            shi = math.max(0.0, shi + (v - mu0 - k))
            slo = math.max(0.0, slo + (mu0 - k - v))
            val alarm = shi > h || slo > h
            out += ((key, id, r4(shi), r4(slo), alarm))
            if (alarm) { shi = 0.0; slo = 0.0 }
          }
          state.update((shi, slo))
          out.iterator
      }
  }

  /** Streaming twin of [[graft.ops.Ewma]]: truncated `lags`-term EWMA
    * per key on a live event stream. State is the last (lags−1)
    * values per key — BOUNDED (seven doubles at the default), unlike
    * the true recursion's unbounded-horizon dependence, and exactly
    * reproducible from the batch op: the per-event arithmetic repeats
    * [[graft.ops.Ewma.ewma]]'s left-assoc weighted sums (a missing
    * lag adds 0.0 there, which is an IEEE no-op, so skipping it here
    * is bit-identical) and the same HALF_UP 4dp rounding. Events
    * inside a micro-batch fold in id order (the batch op's tie
    * column), so replaying a corpus through the stream reproduces the
    * batch frame row-for-row (spec-pinned).
    */
  def ewmaStream(ds: Dataset[(Long, Long, Double)], lags: Int = 8,
      decay: Double = 0.75): Dataset[(Long, Long, Double)] = {
    import ds.sparkSession.implicits._
    val ws = (0 until lags).map(i => math.pow(decay, i))
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[List[Double]]) =>
          var prev = state.getOption.getOrElse(Nil) // most recent first
          val out = scala.collection.mutable.ListBuffer[(Long, Long, Double)]()
          rows.toSeq.sortBy(_._2).foreach { case (_, id, v) =>
            var num = v * ws(0)
            var den = ws(0)
            var i = 1
            var p = prev
            while (i < lags && p.nonEmpty) {
              num += p.head * ws(i)
              den += ws(i)
              p = p.tail
              i += 1
            }
            val e = BigDecimal.decimal(num / den)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            out += ((key, id, e))
            prev = (v :: prev).take(lags - 1)
          }
          state.update(prev)
          out.iterator
      }
  }

  /** Streaming HLL distinct-count — the live tier of
    * [[graft.ops.Sketches.hllDistinct]]: per-group state is exactly
    * the m-byte register array (m = 2^p — BOUNDED regardless of how
    * many distinct keys the stream ever carries, the property that
    * makes running COUNT(DISTINCT) feasible at all: exact streaming
    * distinct state grows with cardinality). Each micro-batch folds
    * its keys into the registers ([[graft.ops.Sketches.hllFold]], the
    * same hash/idx/rank arithmetic as the batch op) and emits the
    * group's updated estimate. Replaying a corpus reproduces the
    * batch `hll_est` BIT-for-bit (integer registers are
    * order/batching-insensitive; the estimate arithmetic is mirrored
    * op-for-op incl. StrictMath.log) — spec-pinned, including across
    * micro-batch state carry. Input tuples: (group, key).
    */
  def hllDistinctStream(ds: Dataset[(String, String)], p: Int = 8): Dataset[(String, Double)] = {
    import ds.sparkSession.implicits._
    val m = 1 << p
    ds.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, String)], state: GroupState[Array[Byte]]) =>
          val regs = state.getOption.getOrElse(new Array[Byte](m))
          // null keys are dropped, matching the batch op's guard —
          // never an NPE that kills the streaming query
          rows.foreach { case (_, key) =>
            if (key != null) graft.ops.Sketches.hllFold(regs, key, p)
          }
          state.update(regs)
          (g, graft.ops.Sketches.hllEstimateScala(regs, p))
      }
  }

  /** Streaming KMV distinct-count — the bottom-k companion of
    * [[hllDistinctStream]] (error bound 1/√(k−2) INDEPENDENT of
    * cardinality, and the same state answers set-similarity):
    * per-group state is the k smallest distinct 60-bit hashes seen (a
    * sorted array, ≤ 8k bytes). Each micro-batch merges its keys'
    * hashes in and emits (group, est) with the batch op's exact
    * estimator arithmetic — groups under k distinct report exactly,
    * (k−1)·2^60/(h_k+1) above. Replaying a corpus reproduces
    * [[graft.ops.Sketches.kmvDistinct]]'s kmv_est bit-for-bit
    * (spec-pinned, incl. micro-batch state carry and a checkpoint
    * restart). Restart-k contract: lowering k over an existing
    * checkpoint re-cuts the state (a wider signature answers any
    * narrower k); RAISING k requires a fresh checkpoint — a k'-cut
    * state cannot be widened and would silently under-estimate.
    * Input: (group, key).
    */
  def kmvDistinctStream(ds: Dataset[(String, String)], k: Int = 64): Dataset[(String, Double)] = {
    import ds.sparkSession.implicits._
    require(k >= 2, s"k must be >= 2: $k")
    ds.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, String)], state: GroupState[Array[Long]]) =>
          // fold each hash into the k-capped sorted state with the
          // batch aggregate's own binary-search insert (duplicates and
          // values above the k-th rejected without allocation) — never
          // a boxed-set rebuild of state ∪ batch per micro-batch
          var merged = state.getOption.getOrElse(Array.empty[Long])
          // a checkpoint written at a LARGER k restarts cleanly: its
          // sorted prefix IS the k-signature (the kmvEstimateTable
          // property) — re-cut instead of overrunning insertSorted's
          // k-sized buffers. The converse (raising k across a restart)
          // is undetectable from the state alone and silently
          // under-estimates — documented: use a fresh checkpoint.
          if (merged.length > k) merged = java.util.Arrays.copyOf(merged, k)
          // null keys dropped, matching kmvDistinct's h IS NOT NULL
          rows.foreach { r =>
            if (r._2 != null) {
              merged = graft.functions.BottomKLongAgg.insertSorted(
                merged, k, graft.index.TrigramIndexer.hash60(r._2))
            }
          }
          state.update(merged)
          val est =
            if (merged.length < k) merged.length.toDouble
            else ((k - 1).toDouble * math.pow(2.0, 60)) / (merged(k - 1) + 1L).toDouble
          (g, est)
      }
  }

  /** Streaming Count-Min tracked-term monitor — the live tier of
    * [[graft.ops.Sketches.cmsTopK]]: per-group state is the
    * (depth × width) Count-Min table (literal-bounded ints — never
    * per-term state, the sketch's whole point), probes are a FIXED
    * broadcast-sized term list. Each micro-batch folds its tokens in
    * and emits (group, term, cms_est) for every probe, using the batch
    * op's exact hash family (md5-32bit + the MinHash multiply-shift
    * permutations), so replaying a corpus reproduces the batch
    * estimates exactly (spec-pinned) with the est ≥ exact CMS
    * guarantee. Input: (group, token).
    */
  def cmsTrackStream(ds: Dataset[(String, String)], probes: Seq[String],
      depth: Int = 4, width: Int = 1024): Dataset[(String, String, Long)] = {
    import ds.sparkSession.implicits._
    require(depth >= 1 && width >= 1, s"bad CMS shape ($depth x $width)")
    require(probes.nonEmpty, "cmsTrackStream needs at least one probe term")
    val probeList = probes.distinct
    // probe buckets are constants of the operator — computed once at
    // build time, never per batch
    val probeBuckets: Seq[(String, Array[Int])] = probeList.map { term =>
      val h = graft.ops.Sketches.cmsBaseHash(term)
      term -> Array.tabulate(depth)(d => graft.ops.Sketches.cmsBucketFromHash(h, d, width))
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, String)], state: GroupState[Array[Long]]) =>
          val cms = state.getOption.getOrElse(new Array[Long](depth * width))
          // md5 ONCE per token; per-depth buckets are pure arithmetic
          // (null tokens dropped, matching the batch explode semantics)
          rows.foreach { case (_, tok) =>
            if (tok != null) {
              val h = graft.ops.Sketches.cmsBaseHash(tok)
              var d = 0
              while (d < depth) {
                cms(d * width + graft.ops.Sketches.cmsBucketFromHash(h, d, width)) += 1L
                d += 1
              }
            }
          }
          state.update(cms)
          probeBuckets.iterator.map { case (term, buckets) =>
            var est = Long.MaxValue
            var d = 0
            while (d < depth) {
              val c = cms(d * width + buckets(d))
              if (c < est) est = c
              d += 1
            }
            (g, term, est)
          }
      }
  }

  /** Custom keyed state via mapGroupsWithState: cumulative (count, sum)
    * per key, emitted on every update.
    */
  def runningTotals(ds: Dataset[(String, Double)]): Dataset[(String, Long, Double)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[(Long, Double)]) =>
          val (c0, s0) = state.getOption.getOrElse((0L, 0.0))
          var c = c0
          var s = s0
          rows.foreach { r => c += 1; s += r._2 }
          state.update((c, s))
          (key, c, s)
      }
  }
}
