package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, quality ratios, language-ID heuristics, fingerprints.
  *
  * Everything here is a pure Catalyst expression built from Column
  * combinators (codegen'd, no UDFs, no SQL-string interpolation — safe
  * for computed/backticked input columns), and every hash is md5-derived
  * so the same computation is expressible in DuckDB for the correctness
  * oracle ([[portableHash60]] ==
  * `CAST(concat('0x', substr(md5(s),1,15)) AS UBIGINT)`).
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish word/number/punctuation chunks via regex (lowercased). */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Whitespace token COUNT without materializing the array:
    * `size(split(text, " "))` == #spaces + 1, a plain arithmetic scan.
    */
  def wsTokenCount(text: Column): Column =
    length(text) - length(translate(text, " ", "")) + 1

  /** [[regexTokens]] COUNT via the native one-pass byte scan
    * ([[graft.functions.RegexTokenCount]]) — no regex engine, no
    * per-token allocation. Callers must have registered
    * GraftFunctions (Tables/bench/verify sessions do).
    */
  def regexTokenCount(text: Column): Column =
    call_function("graft_re_token_count", lower(text))

  /** Deterministic 60-bit hash from md5 (portable to DuckDB). */
  def portableHash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  // ------------------------------------------------------- PII redaction

  /** Redaction patterns, shared verbatim with the DuckDB oracle (both
    * engines' regex dialects — java.util.regex and RE2 — agree on
    * this subset: classes, bounded repeats, \b). Order matters:
    * emails go first (their local part can contain digits and dots),
    * then IPs (four dot-separated octets — a 3-group phone can't
    * match), then dashed phones.
    */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Scrub emails/IPv4s/phone numbers to typed placeholder tags — the
    * standard pre-training privacy pass. Three chained
    * `regexp_replace` calls, all inside whole-stage codegen; a
    * map-only op at any corpus size.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        ipRe, "[IP]"),
      phoneRe, "[PHONE]")

  /** English-ish stopwords used by quality + langid heuristics. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private def stopwordArray: Column = array(stopwords.map(lit): _*)

  /** Fraction of tokens that are stopwords (0 when empty). */
  def stopwordRatio(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, x => array_contains(stopwordArray, x))).cast("double") /
        size(toks).cast("double"))

  /** The stopword list as a DuckDB array literal. */
  def stopwordArrayDuck: String =
    stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  def stopwordRatioDuck(toksSql: String): String =
    s"CASE WHEN len($toksSql) = 0 THEN 0 ELSE len(list_filter($toksSql, x -> list_contains($stopwordArrayDuck, x))) / CAST(len($toksSql) AS DOUBLE) END"

  /** [[stopwordRatio]] pre-rounded to 4dp by exact integer arithmetic
    * ([[graft.ops.PortableRound]]) — for RANKED/THRESHOLDED scores
    * (keep-best dedupe, top-quantile gates): n_stop/n_toks is an
    * integer rational, where `round(double, 4)` can flip between
    * engines on an exact decimal boundary and change which doc wins.
    */
  def stopwordRatio4(toks: Column): Column =
    graft.ops.PortableRound.intRound4(
      size(filter(toks, x => array_contains(stopwordArray, x))), size(toks))

  def stopwordRatio4Duck(toksSql: String): String =
    graft.ops.PortableRound.intRound4Duck(
      s"len(list_filter($toksSql, x -> list_contains($stopwordArrayDuck, x)))",
      s"len($toksSql)")

  /** Stopword count / token count as exact integer columns (for
    * fixed-point quantizers like the corr xi units).
    */
  def stopwordCount(toks: Column): Column =
    size(filter(toks, x => array_contains(stopwordArray, x)))

  def stopwordCountDuck(toksSql: String): String =
    s"len(list_filter($toksSql, x -> list_contains($stopwordArrayDuck, x)))"

  /** Mean token length (0 when empty). */
  def meanTokenLen(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") /
        size(toks).cast("double"))

  /** Ratio of non-alphanumeric, non-space chars to all chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double") /
        length(text).cast("double"))

  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double") /
        length(text).cast("double"))

  /** The five quality-score columns derived from ONE native byte scan
    * ([[graft.functions.TextStats]]) — bit-identical to the
    * regex/lambda formulations above (spec-asserted); use these in hot
    * per-document paths. Physical-plan common-subexpression
    * elimination evaluates the shared stats array once per row.
    */
  final case class QualityStats(nTokens: Column, meanTokLen: Column,
      stopRatio: Column, punctRatio: Column, digitRatio: Column)

  def qualityStats(text: Column): QualityStats = {
    val st = call_function("graft_text_stats", text)
    def el(i: Int): Column = element_at(st, i)
    val nToks = el(2) + 1 // whitespace tokens = spaces + 1
    QualityStats(
      nTokens = nToks.cast("int"),
      meanTokLen = (el(1) - el(2)).cast("double") / nToks.cast("double"),
      stopRatio = el(5).cast("double") / nToks.cast("double"),
      punctRatio = when(el(1) === 0, lit(0.0))
        .otherwise(el(3).cast("double") / el(1).cast("double")),
      digitRatio = when(el(1) === 0, lit(0.0))
        .otherwise(el(4).cast("double") / el(1).cast("double")))
  }

  /** [[qualityStats]] with the four ratio columns pre-rounded to 4dp
    * by exact integer arithmetic on the kernel's count array
    * ([[graft.ops.PortableRound]]) — the oracle-comparison entry
    * point: every ratio here is integer/integer, the class whose
    * `round(double, 4)` flips between engines on exact decimal
    * boundaries (the q_repetition sf1 lesson). `nTokens` stays the
    * raw count.
    */
  def qualityStats4(text: Column): QualityStats = {
    import graft.ops.PortableRound.intRound4
    val st = call_function("graft_text_stats", text)
    def el(i: Int): Column = element_at(st, i)
    val nToks = el(2) + 1
    QualityStats(
      nTokens = nToks.cast("int"),
      meanTokLen = intRound4(el(1) - el(2), nToks),
      stopRatio = intRound4(el(5), nToks),
      punctRatio = intRound4(el(3), el(1)),
      digitRatio = intRound4(el(4), el(1)))
  }

  /** DEFLATE compression ratio (compressed bytes / raw UTF-8 bytes,
    * 4dp; 0.0 for empty text) — the Gopher-family catch-all
    * repetition proxy: template spam and boilerplate floods collapse
    * toward 0 while natural prose sits ~0.4-0.7. One native call per
    * row ([[graft.functions.DeflateLen]], thread-cached Deflater) —
    * map-only at any corpus size. SPEC-covered library surface (no
    * DuckDB zlib, so no oracle-registered query — the Sketches
    * precedent).
    */
  def compressionRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      round(call_function("graft_deflate_len", text).cast("double") /
        octet_length(text).cast("double"), 4))

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * token set. Detects bag-of-words duplicates regardless of word order.
    */
  def tokenSetFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  def tokenSetFingerprintDuck(textSql: String): String =
    s"md5(array_to_string(list_sort(list_distinct(string_split($textSql, ' '))), ' '))"

  /** Token w-gram shingles (distinct). Basis for MinHash / Jaccard. */
  def shingles(text: Column, w: Int = 3): Column = {
    val t = tokens(text)
    when(size(t) < w, array().cast("array<string>")).otherwise(
      array_distinct(transform(
        sequence(lit(0), size(t) - w),
        i => concat_ws(" ", slice(t, i + lit(1), lit(w))))))
  }

  /** DuckDB equivalent of [[shingles]] (1-based, end-exclusive range:
    * shingle count = len - w + 1).
    */
  def shinglesDuck(textSql: String, w: Int = 3): String = {
    val t = s"string_split($textSql, ' ')"
    s"list_distinct(list_transform(range(1, greatest(len($t) - ${w - 2}, 1)), i -> array_to_string($t[i:i+${w - 1}], ' ')))"
  }

  /** Hash space of the integer shingles: 2^31 - 1 (keeps every
    * intermediate product < 2^52, overflow-free in both engines).
    */
  val ShingleMod = 2147483647L
  private val ShinglePrime = 1000003L

  // INTEGER shingles: each token is md5-hashed ONCE (vs one md5 per
  // shingle string — w times fewer hash calls), then shingle identity
  // is the polynomial hash of the token-hash window modulo 2^31-1.
  // Collisions (~|shingles|^2 / 2^31) trade exactness for w-fold less
  // hashing; everything downstream (MinHash, Jaccard) stays
  // deterministic and oracle-mirrored. Two-step API so the token-hash
  // array materializes once per row: first
  // `withColumn(c, expr(tokenHashesSql("text")))`, then
  // `expr(hashedShinglesFromSql(c, w))`.

  /** SQL fragment: 31-bit md5 token hashes of a text column. */
  def tokenHashesSql(textCol: String): String =
    s"transform(split($textCol, ' '), tok -> " +
      s"cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint) % $ShingleMod)"

  /** SQL fragment: distinct polynomial w-shingles of a text column,
    * self-contained. The token-hash array is bound as the FINISH-lambda
    * variable of a dummy `aggregate` — a lambda binding evaluates
    * exactly once per row and CollapseProject cannot inline it into the
    * per-shingle expression (a plain column alias gets inlined, which
    * re-ran every md5 once per shingle reference — measured 12x slower).
    */
  def hashedShinglesSql(textCol: String, w: Int = 3): String = {
    val poly = (0 until w).map(j => s"element_at(th, i + ${j + 1})")
      .foldLeft("cast(0 as bigint)")((acc, h) => s"(($acc * $ShinglePrime + $h) % $ShingleMod)")
    s"aggregate(array(0), ${tokenHashesSql(textCol)}, (acc, x) -> acc, th -> " +
      s"IF(size(th) < $w, array(), " +
      s"array_distinct(transform(sequence(0, size(th) - $w), i -> $poly))))"
  }

  /** DuckDB twin of [[tokenHashesSql]] (stage fragments — callers put
    * the token-hash list in a derived-table column, then shingle it, so
    * each evaluates once per row).
    */
  def tokenHashesDuckSql(textSql: String): String =
    s"list_transform(string_split($textSql, ' '), tok -> " +
      s"CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % $ShingleMod)"

  /** DuckDB twin of [[hashedShinglesFromSql]] over a list column.
    * NOTE: DuckDB's `list_distinct` does NOT preserve first-occurrence
    * order (Spark's `array_distinct` does) — every consumer of this
    * fragment treats hs as a SET (signatures, membership, jaccard);
    * positional consumers must use [[positionalShinglesDuckSql]].
    */
  def hashedShinglesFromDuckSql(thCol: String, w: Int = 3): String = {
    val poly = (0 until w).map(j => s"$thCol[i + $j]")
      .foldLeft(s"CAST(0 AS BIGINT)")((acc, h) => s"(($acc * $ShinglePrime + $h) % $ShingleMod)")
    s"CASE WHEN len($thCol) < $w THEN CAST([] AS BIGINT[]) ELSE " +
      s"list_distinct(list_transform(range(1, len($thCol) - ${w - 2}), i -> $poly)) END"
  }

  /** UNDEDUPED per-position w-shingle hashes: element i (0-based)
    * hashes tokens i..i+w-1, so array positions ARE token offsets —
    * the form positional span operators need (the deduped variants
    * above reorder under repetition and across engines).
    */
  def positionalShinglesSql(textCol: String, w: Int = 3): String = {
    val poly = (0 until w).map(j => s"element_at(th, i + ${j + 1})")
      .foldLeft("cast(0 as bigint)")((acc, h) => s"(($acc * $ShinglePrime + $h) % $ShingleMod)")
    s"aggregate(array(0), ${tokenHashesSql(textCol)}, (acc, x) -> acc, th -> " +
      s"IF(size(th) < $w, array(), " +
      s"transform(sequence(0, size(th) - $w), i -> $poly)))"
  }

  /** DuckDB twin of [[positionalShinglesSql]] over a list column. */
  def positionalShinglesDuckSql(thCol: String, w: Int = 3): String = {
    val poly = (0 until w).map(j => s"$thCol[i + $j]")
      .foldLeft(s"CAST(0 AS BIGINT)")((acc, h) => s"(($acc * $ShinglePrime + $h) % $ShingleMod)")
    s"CASE WHEN len($thCol) < $w THEN CAST([] AS BIGINT[]) ELSE " +
      s"list_transform(range(1, len($thCol) - ${w - 2}), i -> $poly) END"
  }
}
