package graft.queries

import graft.Tables
import graft.ops.{Chunking, TrainStream}
import graft.text.{QualityFilter, TextFunctions}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond the reference's surface
  * (SURVEY §2 LLM-pipeline rows): token-window chunking, composite
  * quality gating, deterministic source interleaving, and fixed-budget
  * sequence packing — the post-dedup "last mile" of a pretraining
  * corpus build, each a one-scan distributed plan.
  */
object PipelineQueries extends QuerySet {

  def all: Seq[Q] = Seq(
    Q("q_chunk",
      (s, d) => Chunking.chunk(Tables.df(s, d, "documents"), "doc_id", "text",
        win = 16, stride = 8)
        .orderBy("doc_id", "chunk_idx"),
      Some(Chunking.chunkDuckSql("documents", "doc_id", "text", win = 16, stride = 8)
        + "\nORDER BY doc_id, chunk_idx")),

    Q("q_quality_filter",
      (s, d) => QualityFilter.flags(Tables.df(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(QualityFilter.flagsDuckSql("documents", "doc_id", "text")
        + "\nORDER BY doc_id")),

    Q("q_interleave",
      (s, d) => TrainStream.interleave(Tables.df(s, d, "documents"),
        "doc_id", "source", salt = "r4")
        .orderBy("round", "mix_key"),
      Some(TrainStream.interleaveDuckSql("documents", "doc_id", "source", salt = "r4")
        + "\nORDER BY round, mix_key")),

    // Temperature-weighted corpus mixing (alpha=0.5 upweights small
    // sources): deterministic hash-cutoff membership, rates computed
    // in-plan from source counts. ~200-doc budget at sf0.01.
    Q("q_mix_temperature",
      (s, d) => TrainStream.mixSample(Tables.df(s, d, "documents"),
        "doc_id", "source", alpha = 0.5, targetDocs = 200, salt = "r7")
        .orderBy("doc_id"),
      Some(TrainStream.mixSampleDuckSql("documents", "doc_id", "source",
        alpha = 0.5, targetDocs = 200, salt = "r7") + "\nORDER BY doc_id")),

    // Per-source token-budget subset in deterministic hash order —
    // distributed prefix-sum membership, no per-source global window.
    Q("q_token_budget",
      (s, d) => TrainStream.tokenBudget(Tables.df(s, d, "documents"),
        "doc_id", "source", "text", budgetPerSource = 700, salt = "r7")
        .orderBy("doc_id"),
      Some(TrainStream.tokenBudgetDuckSql("documents", "doc_id", "source", "text",
        budgetPerSource = 700, salt = "r7") + "\nORDER BY doc_id")),

    // Multimodal binary plumbing, oracle-checked: documents' text BYTES
    // stand in for an opaque media payload (cast to binary); frame
    // sampling and hashing run on the binary column exactly as they
    // would on real media. DuckDB cannot slice BLOBs, so its twin
    // slices VARCHAR — made charset-INDEPENDENT by normalizing every
    // non-printable-ASCII code point to '?' on both sides first
    // (bytes == chars then holds by construction, not by luck of the
    // corpus; md5(VARCHAR) hashes the same UTF-8 bytes as md5(binary)).
    Q("q_multimodal_meta",
      (s, d) => {
        val ascii = regexp_replace(col("text"), "[^ -~]", "?")
        val bin = ascii.cast("binary")
        val frames = graft.multimodal.Multimodal.frameSample(bin, frameSize = 64, everyN = 2)
        Tables.df(s, d, "documents").select(
          col("doc_id"),
          length(bin).as("n_bytes"),
          md5(bin).as("payload_md5"),
          size(frames).as("n_sampled"),
          md5(get(frames, lit(0))).as("first_frame_md5"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  octet_length(encode(a)) AS n_bytes,
             |  md5(a) AS payload_md5,
             |  CAST(CASE WHEN length(a) = 0 THEN 0
             |    ELSE (CAST(ceil(length(a) / 64.0) AS BIGINT) - 1) // 2 + 1 END AS INT) AS n_sampled,
             |  CASE WHEN length(a) = 0 THEN NULL
             |    ELSE md5(substring(a, 1, 64)) END AS first_frame_md5
             |FROM (SELECT doc_id, regexp_replace(text, '[^ -~]', '?', 'g') AS a
             |      FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // Per-frame rows from the video/audio frame sampler: every 2nd
    // 64-byte frame of the payload, each hashed — the shape a frame
    // feature-extraction stage consumes (posexplode of the map-only
    // frameSample expression; frame_idx is the SAMPLED index, byte
    // offset = idx*128). Same charset normalization as
    // q_multimodal_meta so DuckDB's VARCHAR slices see identical bytes.
    Q("q_frame_sample",
      (s, d) => {
        val ascii = regexp_replace(col("text"), "[^ -~]", "?")
        val frames = graft.multimodal.Multimodal.frameSample(
          ascii.cast("binary"), frameSize = 64, everyN = 2)
        Tables.df(s, d, "documents")
          .select(col("doc_id"), posexplode(frames).as(Seq("frame_idx", "frame")))
          .select(col("doc_id"), col("frame_idx"),
            md5(col("frame")).as("frame_md5"),
            length(col("frame")).cast("int").as("frame_len"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, regexp_replace(text, '[^ -~]', '?', 'g') AS a
             |  FROM documents),
             |fr AS (
             |  SELECT doc_id, a,
             |    unnest(range(0, (CAST(ceil(length(a) / 64.0) AS BIGINT) - 1) // 2 + 1)) AS s
             |  FROM base WHERE length(a) > 0)
             |SELECT doc_id, CAST(s AS INT) AS frame_idx,
             |  md5(substring(a, CAST(s * 128 + 1 AS INT), 64)) AS frame_md5,
             |  CAST(length(substring(a, CAST(s * 128 + 1 AS INT), 64)) AS INT) AS frame_len
             |FROM fr
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // Per-frame RMS energy (audio-style feature extraction over the
    // same stand-in payloads): integer-exact sum of squared samples
    // per 64-byte frame, one map-only expression per row — the
    // energy/VAD gating shape. DuckDB recomputes the identical frames
    // from the normalized-ASCII bytes.
    Q("q_audio_energy",
      (s, d) => {
        val ascii0 = regexp_replace(col("text"), "[^ -~]", "?")
        Tables.df(s, d, "documents")
          .select(col("doc_id"),
            posexplode(graft.multimodal.Multimodal.audioEnergy(ascii0, frameSize = 64))
              .as(Seq("frame_idx", "rms")))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, regexp_replace(text, '[^ -~]', '?', 'g') AS a
             |  FROM documents),
             |fr AS (
             |  SELECT doc_id, a,
             |    unnest(range(0, CAST(ceil(length(a) / 64.0) AS BIGINT))) AS f
             |  FROM base WHERE length(a) > 0)
             |SELECT doc_id, CAST(f AS INT) AS frame_idx,
             |  round(sqrt(CAST(list_sum(list_transform(
             |      range(CAST(f * 64 + 1 AS BIGINT), CAST(least((f + 1) * 64, length(a)) + 1 AS BIGINT)),
             |      i -> CAST(unicode(substring(a, CAST(i AS INT), 1)) AS BIGINT) *
             |           unicode(substring(a, CAST(i AS INT), 1)))) AS DOUBLE) /
             |    (least((f + 1) * 64, length(a)) - f * 64)), 4) AS rms
             |FROM fr
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // REAL image decode, oracle-checked end-to-end: each doc's first 64
    // normalized-ASCII bytes become an 8x8 grayscale PNG (per-partition
    // javax.imageio encode), then decodeImageMeta reads the PNG back and
    // reports dims/channels/pixel mean. PNG is lossless and the pixels
    // ARE the payload bytes, so DuckDB can state the expected decode
    // output arithmetically (unicode(char) == byte value after the
    // printable-ASCII normalization; rpad truncates-or-pads to 64 in
    // both engines).
    Q("q_image_decode",
      (s, d) => {
        val ascii = regexp_replace(col("text"), "[^ -~]", "?")
        val base = Tables.df(s, d, "documents").select(
          col("doc_id"), rpad(ascii, 64, " ").cast("binary").as("payload"))
        val png = graft.multimodal.Multimodal.encodeGrayPngCol(base, "payload", w = 8, h = 8)
        graft.multimodal.Multimodal.decodeImageMeta(png, "png")
          .select(col("doc_id"), col("img_format"), col("width"), col("height"),
            col("channels"), round(element_at(col("chan_mean"), 1), 4).as("px_mean"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, 'png' AS img_format, CAST(8 AS INT) AS width,
             |  CAST(8 AS INT) AS height, CAST(1 AS INT) AS channels,
             |  round(list_sum(list_transform(range(1, 65),
             |    i -> unicode(substring(p, i, 1)))) / 64.0, 4) AS px_mean
             |FROM (SELECT doc_id,
             |        rpad(regexp_replace(text, '[^ -~]', '?', 'g'), 64, ' ') AS p
             |      FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // Perceptual image hash (dHash) over the REAL decode path — the
    // image-dedup key (re-encodes and metadata edits change every
    // byte but not the gradient signs): encode the deterministic
    // 8×8 gray thumbnail, decode with javax.imageio, hash the
    // horizontal gradient signs into 56 bits; n_same counts docs
    // sharing a hash (the perceptual dup-group size). The oracle
    // states the hash ARITHMETICALLY from the same payload bytes
    // (lossless gray PNG ⇒ pixels == payload — the q_image_decode
    // contract), bit-for-bit as integers.
    Q("q_image_dhash",
      (s, d) => {
        val ascii = regexp_replace(col("text"), "[^ -~]", "?")
        val base = Tables.df(s, d, "documents").select(
          col("doc_id"), rpad(ascii, 64, " ").cast("binary").as("payload"))
        val png = graft.multimodal.Multimodal.encodeGrayPngCol(base, "payload", w = 8, h = 8)
        val hashed = graft.multimodal.Multimodal.dHashCol(png, "png")
        hashed
          .withColumn("n_same", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("dhash")))
          .select(col("doc_id"), col("dhash"), col("n_same"))
          .orderBy("doc_id")
      },
      Some("""WITH px AS (
             |  SELECT doc_id,
             |    rpad(regexp_replace(text, '[^ -~]', '?', 'g'), 64, ' ') AS p
             |  FROM documents),
             |h AS (
             |  SELECT doc_id,
             |    CAST(list_sum(list_transform(range(0, 56), k ->
             |      CASE WHEN unicode(substring(p, (k // 7) * 8 + (k % 7) + 1, 1))
             |             < unicode(substring(p, (k // 7) * 8 + (k % 7) + 2, 1))
             |           THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS BIGINT) AS dhash
             |  FROM px)
             |SELECT doc_id, dhash,
             |  count(*) OVER (PARTITION BY dhash) AS n_same
             |FROM h
             |ORDER BY doc_id""".stripMargin)),

    // Image NEAR-dup pairs: dHash fingerprints through the SimHash
    // pigeonhole banding (hamming ≤ 6 ⇒ one of 7 bit-chunks equal —
    // the 56-bit hash rides the 60-bit geometry, top bits always
    // equal), bucket join + exact bit_count verify, hot buckets
    // capped. The composition that makes perceptual image dedup run
    // at corpus scale with ZERO new join machinery; the oracle
    // replays the arithmetic hash + the same banding.
    Q("q_image_dhash_pairs",
      (s, d) => {
        val ascii = regexp_replace(col("text"), "[^ -~]", "?")
        val base = Tables.df(s, d, "documents").select(
          col("doc_id"), rpad(ascii, 64, " ").cast("binary").as("payload"))
        val png = graft.multimodal.Multimodal.encodeGrayPngCol(base, "payload", w = 8, h = 8)
        val fps = graft.api.CacheScope.global.persist(
          graft.multimodal.Multimodal.dHashCol(png, "png")
            .select(col("doc_id"), col("dhash").as("simhash")))
        graft.dedup.SimHash.nearDupPairsFromFingerprints(fps, "doc_id", maxDist = 6)
          .orderBy("id_a", "id_b")
      },
      {
        // same band geometry as the Spark side: Bits=60, bands=7
        val (bits, maxDist) = (60, 6)
        val bands = maxDist + 1
        val width = (bits + bands - 1) / bands
        val bandSelects = (0 until bands).map { b =>
          val lo = b * width
          val w = math.min(width, bits - lo)
          val mask = (1L << w) - 1
          s"SELECT doc_id, dhash, $b AS band, (dhash >> $lo) & $mask AS chunk FROM h"
        }.mkString("\nUNION ALL\n")
        Some(s"""WITH px AS (
                |  SELECT doc_id,
                |    rpad(regexp_replace(text, '[^ -~]', '?', 'g'), 64, ' ') AS p
                |  FROM documents),
                |h AS (
                |  SELECT doc_id,
                |    CAST(list_sum(list_transform(range(0, 56), k ->
                |      CASE WHEN unicode(substring(p, (k // 7) * 8 + (k % 7) + 1, 1))
                |             < unicode(substring(p, (k // 7) * 8 + (k % 7) + 2, 1))
                |           THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS BIGINT) AS dhash
                |  FROM px),
                |bk AS (
                |  SELECT * FROM ($bandSelects) raw
                |  QUALIFY count(*) OVER (PARTITION BY band, chunk) <= ${graft.dedup.SimHash.DefaultMaxBucket})
                |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                |  bit_count(xor(a.dhash, b.dhash)) AS dist
                |FROM bk a JOIN bk b ON a.band = b.band AND a.chunk = b.chunk
                |WHERE a.doc_id < b.doc_id
                |  AND bit_count(xor(a.dhash, b.dhash)) <= $maxDist
                |ORDER BY id_a, id_b""".stripMargin)
      }),

    // C4-style LINE-level cleaning: the corpus has no newlines, so the
    // query first manufactures lines deterministically (every 10-token
    // group gets terminal punctuation + a '|' break; the tail fragment
    // stays unpunctuated and must be dropped by the terminal-punct
    // rule). Both engines run the identical lineify regex in their own
    // replacement dialect ($1 vs \1), then the same keep-lambda.
    Q("q_c4_clean",
      (s, d) => {
        val lined = Tables.df(s, d, "documents").withColumn("text",
          regexp_replace(col("text"), "(([^ ]+ ){9}[^ ]+) ", "$1.|"))
        graft.text.Clean.c4Clean(lined, "doc_id", "text", sep = "|")
          .orderBy("doc_id")
      },
      Some("""WITH lined AS (
             |  SELECT doc_id,
             |    regexp_replace(text, '(([^ ]+ ){9}[^ ]+) ', '\1.|', 'g') AS text
             |  FROM documents)
             |""".stripMargin
        + graft.text.Clean.c4CleanDuckSql("lined", "doc_id", "text", sep = "|")
        + "\nORDER BY doc_id")),

    // Cross-document boilerplate removal: every doc gets a footer line
    // (boilerplate at any SF), even docs get a second banner line
    // (crosses the 30-doc threshold only where the corpus is big
    // enough — the threshold semantics, exercised); each doc's own
    // text stays a unique line that must survive.
    Q("q_boilerplate",
      (s, d) => {
        val withFooters = Tables.df(s, d, "documents").withColumn("text",
          concat(col("text"), lit("|all rights reserved footer."),
            when(col("doc_id") % 2 === 0,
              lit("|cookie consent banner text here.")).otherwise(lit(""))))
        graft.text.Clean.dropBoilerplate(withFooters, "doc_id", "text",
          sep = "|", minDocs = 30)
          .orderBy("doc_id")
      },
      Some("""WITH documents2 AS (
             |  SELECT doc_id,
             |    text || '|all rights reserved footer.' ||
             |    CASE WHEN doc_id % 2 = 0
             |      THEN '|cookie consent banner text here.' ELSE '' END AS text
             |  FROM documents),
             |""".stripMargin
        + graft.text.Clean.dropBoilerplateDuckSql("documents2", "doc_id", "text",
            sep = "|", minDocs = 30).stripPrefix("WITH ")
        + "\nORDER BY doc_id")),

    // Corpus-wide exact line dedup (RefinedWeb-style): keep the global
    // FIRST occurrence of every distinct line, drop every later repeat
    // — across documents and within them. Same lineify preamble as
    // q_c4_clean (the corpus is token-stream text, so lines are
    // synthesized every 10 tokens), plus a shared footer on every doc
    // and a promo line on every 3rd doc: the footer must survive in
    // exactly ONE document (the lowest doc_id) and vanish everywhere
    // else — the semantics that distinguish this from q_boilerplate,
    // which drops every copy above a df threshold.
    Q("q_line_dedup",
      (s, d) => {
        val lined = Tables.df(s, d, "documents").withColumn("text",
          concat(regexp_replace(col("text"), "(([^ ]+ ){9}[^ ]+) ", "$1.|"),
            lit("|all rights reserved footer."),
            when(col("doc_id") % 3 === 0,
              lit("|subscribe to our newsletter.")).otherwise(lit(""))))
        graft.dedup.LineDedup.dedupLines(lined, "doc_id", "text", sep = "|")
          .orderBy("doc_id")
      },
      Some("""WITH documents2 AS (
             |  SELECT doc_id,
             |    regexp_replace(text, '(([^ ]+ ){9}[^ ]+) ', '\1.|', 'g') ||
             |    '|all rights reserved footer.' ||
             |    CASE WHEN doc_id % 3 = 0
             |      THEN '|subscribe to our newsletter.' ELSE '' END AS text
             |  FROM documents),
             |""".stripMargin
        + graft.dedup.LineDedup.dedupLinesDuckSql("documents2", "doc_id", "text",
            sep = "|").stripPrefix("WITH ")
        + "\nORDER BY doc_id")),

    // The composed corpus-build pass: quality gate -> exact dedup
    // (keep-first) -> decontaminate vs the doc_id%10 eval slice ->
    // per-source token budget, end-to-end as ONE plan; the oracle
    // replays all four stages as a CTE chain over each operator's own
    // formulation — the proof the operators COMPOSE, not just pass in
    // isolation.
    Q("q_pipeline_e2e",
      (s, d) => graft.ops.CorpusBuild.trainingSubset(
        Tables.df(s, d, "documents"), "doc_id", "source", "text",
        evalPred = col("doc_id") % 10 === 0, w = 4,
        budgetPerSource = 700, salt = "e2e")
        .orderBy("doc_id"),
      Some(graft.ops.CorpusBuild.trainingSubsetDuckSql(
        "documents", "doc_id", "source", "text",
        evalPredSql = "doc_id % 10 = 0", w = 4,
        budgetPerSource = 700, salt = "e2e") + "\nORDER BY doc_id")),

    // Deterministic MLM masking (BERT-style augmentation): 15% of
    // positions by per-(doc,pos,salt) hash — reproducible examples,
    // fresh masks per epoch via the salt
    Q("q_mlm_mask",
      (s, d) => TrainStream.mlmMask(Tables.df(s, d, "documents"),
        "doc_id", "text", ratePerMille = 150, salt = "r7")
        .orderBy("doc_id"),
      Some(TrainStream.mlmMaskDuckSql("documents", "doc_id", "text",
        ratePerMille = 150, salt = "r7") + "\nORDER BY doc_id")),

    // Length-bucketed batching: power-of-two token-length buckets cut
    // into deterministic hash-order batches — padding-efficiency
    // batching with the distributed per-(len,hex)-bucket prefix idiom
    Q("q_length_batches",
      (s, d) => TrainStream.lengthBatches(Tables.df(s, d, "documents"),
        "doc_id", "text", batchSize = 32, salt = "r7")
        .orderBy("doc_id"),
      Some(TrainStream.lengthBatchesDuckSql("documents", "doc_id", "text",
        batchSize = 32, salt = "r7") + "\nORDER BY doc_id")),

    // Padding-waste roll-up of the length-bucketed batching — the ONE
    // number the batching strategy exists to minimize: 1 −
    // real_tokens / padded_tokens where each batch pads to its max
    // length. Two keyed aggregations over the q_length_batches plan;
    // ratios from exact integer sums, engines agree bit-for-bit.
    Q("q_padding_waste",
      (s, d) => TrainStream.lengthBatches(Tables.df(s, d, "documents"),
        "doc_id", "text", batchSize = 32, salt = "r7")
        .groupBy("len_bucket", "batch_id")
        .agg(count(lit(1)).as("n"), max("n_toks").as("mx"),
          sum("n_toks").as("sm"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("sm")).as("total_toks"),
          sum(col("mx") * col("n")).as("padded_toks"))
        .select(col("n_batches"), col("total_toks"), col("padded_toks"),
          // 1 - p/q = (q-p)/q — integer-exact 4dp (PortableRound)
          graft.ops.PortableRound.intRound4(
            col("padded_toks") - col("total_toks"), col("padded_toks"))
            .as("waste_frac")),
      Some(s"""WITH lb AS (
              |${TrainStream.lengthBatchesDuckSql("documents", "doc_id", "text",
                  batchSize = 32, salt = "r7")}),
              |pb AS (
              |  SELECT len_bucket, batch_id, CAST(count(*) AS BIGINT) AS n,
              |    CAST(max(n_toks) AS BIGINT) AS mx, CAST(sum(n_toks) AS BIGINT) AS sm
              |  FROM lb GROUP BY len_bucket, batch_id)
              |SELECT CAST(count(*) AS BIGINT) AS n_batches,
              |  CAST(sum(sm) AS BIGINT) AS total_toks,
              |  CAST(sum(mx * n) AS BIGINT) AS padded_toks,
              |  ${graft.ops.PortableRound.intRound4Duck(
                   "CAST(sum(mx * n) AS BIGINT) - CAST(sum(sm) AS BIGINT)",
                   "CAST(sum(mx * n) AS BIGINT)")} AS waste_frac
              |FROM pb""".stripMargin)),

    // Quality-gate ABLATION report — the filter-debugging table a
    // pipeline reads before shipping a gate stack: per-gate drop
    // counts plus every pairwise overlap ("gate A only re-drops what
    // gate B already caught" = dead weight; disjoint drops = both
    // earn their place). ONE scan: four boolean gate columns from
    // integer counts, thresholds as INTEGER cross-multiplications
    // (100·n_stop < 6·n_toks, never a float ratio compare — nothing
    // to round, nothing to drift), one global aggregate, the 10-row
    // (gate, gate) matrix + any/total exploded from literals.
    Q("q_gate_ablation",
      (s, d) => {
        val toks = split(col("text"), " ")
        val nToks = size(toks).cast("long")
        val gates: Seq[(String, org.apache.spark.sql.Column)] = Seq(
          "short" -> (nToks < 10L),
          "stop" -> (lit(100L) * TextFunctions.stopwordCount(toks).cast("long") < lit(6L) * nToks),
          "punct" -> (lit(10L) * length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("long") > length(col("text")).cast("long")),
          "rep" -> (lit(10L) * (nToks - size(array_distinct(toks)).cast("long")) > lit(3L) * nToks))
        val flagged = Tables.df(s, d, "documents").select(
          gates.map { case (n, c) => c.as(s"g_$n") } :+
            gates.map(_._2).reduce(_ || _).as("g_any"): _*)
        val cells = (gates.map(g => (g._1, g._1)) ++
          (for { i <- gates.indices; j <- (i + 1) until gates.size }
            yield (gates(i)._1, gates(j)._1))) :+ ("any", "any")
        val aggs = cells.map { case (a, b) =>
          sum(when(col(s"g_$a") && col(s"g_$b"), 1L).otherwise(0L)).as(s"n_${a}_$b")
        } :+ count(lit(1)).as("n_total")
        val agg = flagged.agg(aggs.head, aggs.tail: _*)
        val rows = array(cells.map { case (a, b) =>
          struct(lit(a).as("gate_a"), lit(b).as("gate_b"),
            col(s"n_${a}_$b").as("n_dropped"))
        } :+ struct(lit("total").as("gate_a"), lit("total").as("gate_b"),
          col("n_total").as("n_dropped")): _*)
        agg.select(explode(rows).as("r"))
          .select(col("r.gate_a"), col("r.gate_b"), col("r.n_dropped"))
          .orderBy("gate_a", "gate_b")
      },
      {
        val toks = "string_split(text, ' ')"
        val nToks = s"len($toks)"
        val gateSql = Seq(
          "short" -> s"$nToks < 10",
          "stop" -> s"100 * ${TextFunctions.stopwordCountDuck(toks)} < 6 * $nToks",
          "punct" -> s"10 * length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) > length(text)",
          "rep" -> s"10 * ($nToks - len(list_distinct($toks))) > 3 * $nToks")
        val cells = (gateSql.map(g => (g._1, g._1)) ++
          (for { i <- gateSql.indices; j <- (i + 1) until gateSql.size }
            yield (gateSql(i)._1, gateSql(j)._1))) :+ ("any", "any")
        val rows = cells.map { case (a, b) =>
          s"SELECT '$a' AS gate_a, '$b' AS gate_b, " +
            s"CAST(sum(CASE WHEN g_$a AND g_$b THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped FROM f"
        } :+ "SELECT 'total', 'total', CAST(count(*) AS BIGINT) FROM f"
        Some(s"""WITH f AS MATERIALIZED (
                |  SELECT ${gateSql.map { case (n, c) => s"($c) AS g_$n" }.mkString(",\n    ")},
                |    (${gateSql.map(g => s"g_${g._1}").mkString(" OR ")}) AS g_any
                |  FROM documents)
                |${rows.mkString("\nUNION ALL\n")}
                |ORDER BY gate_a, gate_b""".stripMargin)
      }),

    Q("q_pack_sequences",
      (s, d) => TrainStream.packSequences(Tables.df(s, d, "documents"),
        "doc_id", "text", seqLen = 256, salt = "r4")
        .orderBy("start_off"),
      Some(TrainStream.packSequencesDuckSql("documents", "doc_id", "text",
        seqLen = 256, salt = "r4") + "\nORDER BY start_off")),

    // Token-balanced shard assignment: the "write the corpus as ~equal
    // token shards" operator — hash-order layout cut at running-token
    // boundaries via the distributed hex-bucket prefix idiom (no
    // corpus sort, no partition-less window)
    Q("q_shard_assign",
      (s, d) => TrainStream.shardAssign(Tables.df(s, d, "documents"),
        "doc_id", "text", shardTokens = 4000L, salt = "r8")
        .orderBy("doc_id"),
      Some(TrainStream.shardAssignDuckSql("documents", "doc_id", "text",
        shardTokens = 4000L, salt = "r8") + "\nORDER BY doc_id"))
  )
}
