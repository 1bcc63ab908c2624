package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline operators: token
  * counting, shingling, MinHash signatures, SimHash, fingerprints, quality
  * scores, language-ID. Everything is built from Spark's codegen'd builtin
  * + higher-order functions (no Scala UDFs): at 100 TB these run inside
  * whole-stage codegen over the scan, with no encoder round-trips, and are
  * embarrassingly parallel (per-row, no shuffle).
  */
object TextFunctions {

  /** Whitespace tokens. `\s+` split; empty tokens from leading space removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = textScan(text).getField("n_tokens")

  /** BPE-ish subword token count: runs of letters, digits, or single
    * non-space punctuation — the usual "word-and-punct" pre-tokenizer
    * shape. One field of the single-scan TextScanStats (formerly a
    * regexp_count whose alternation pattern dominated q_text_stats).
    */
  def bpeishTokenCount(text: Column): Column =
    textScan(text).getField("n_bpeish")

  private def native(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)
  private def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  /** Hashed char-n-gram bucket counts (graft.plans.HashedNgramCounts) —
    * the FEATURE side of the QualityClassifier space, for training:
    * identical hashing to ngramLogit, so dot(counts, w) == logit exactly.
    */
  def ngramCounts(text: Column, n: Int = QualityClassifier.N,
      dim: Int = QualityClassifier.Dim): Column =
    native(graft.plans.HashedNgramCounts(exprOf(text), n, dim))

  /** DISTINCT word k-shingles (space-joined k-grams of the whitespace
    * tokens; docs shorter than k tokens yield their whole text as the one
    * shingle). Native one-pass expression — see graft.plans.WordShingles.
    */
  def wordShingles(text: Column, k: Int): Column =
    native(graft.plans.WordShingles(exprOf(text), k))

  /** Distinct 128-bit k-token window keys (struct<h1,h2> per window) in
    * one pass — bit-identical to `explode(wordShingles(text, k))` →
    * `struct(xxhash64(w), xxhash64(lit(1), w))` without materializing a
    * window string per position. Accepts the raw text OR a pre-tokenized
    * array<string> (the spanMaximalPairs ladder tokenizes once and
    * reuses). See graft.plans.SpanKeys.
    */
  def spanKeys(textOrToks: Column, k: Int): Column =
    native(graft.plans.SpanKeys(exprOf(textOrToks), k))

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum seeded 64-bit hash over the doc's shingles (Broder '97).
    * Native single-pass expression (graft.plans.MinHashSig): one scan of
    * the shingle array with a K-wide running min, vs K array scans in the
    * higher-order formulation. No shuffle; signature length is the
    * accuracy/size tradeoff.
    */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    native(graft.plans.MinHashSig(exprOf(shingles), numHashes))

  /** LSH band keys from a MinHash signature: `bands` values, each hashing
    * `rowsPerBand` consecutive signature slots. Near-dup candidates = docs
    * sharing any band key (banding theorem: P[candidate] = 1-(1-s^r)^b).
    * The signature must have ≥ bands×rowsPerBand slots — a short signature
    * would make out-of-range bands slice empty arrays, giving EVERY doc an
    * identical band key and an accidental all-pairs O(n²) join; callers
    * that know the signature length must validate (NearDup does).
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column = {
    require(bands > 0 && rowsPerBand > 0, "bands and rowsPerBand must be positive")
    array((0 until bands).map { b =>
      xxhash64(lit(b), concat_ws(",",
        transform(slice(signature, b * rowsPerBand + 1, rowsPerBand),
          x => x.cast("string"))))
    }: _*)
  }

  /** 64-bit SimHash over whitespace tokens (Charikar '02): per bit, sum +1
    * for tokens whose 64-bit hash has the bit set, -1 otherwise; bit set
    * iff the sum is positive. Native one-pass expression
    * (graft.plans.SimHash64) — the 64-fold higher-order formulation
    * rescanned the token array per bit.
    */
  def simHash(text: Column): Column =
    native(graft.plans.SimHash64(exprOf(tokens(text))))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling (polynomial) document fingerprint over tokens:
    * fp = fold(tokens, 0, (acc, t) -> (acc * 31 + h(t)) mod p) with h(t) =
    * int(md5(t)[0:8 hex]) mod 1e9+7 and p = 2^31-1 — modular so the fold
    * never overflows Long under ANSI arithmetic, order-sensitive by design
    * (a rolling hash, not a bag hash). The token hash is an md5 prefix
    * (codegen'd, one digest per token) rather than xxhash64 so the value
    * is engine-independent — any engine with md5 reproduces it, which is
    * what lets q_fingerprint carry a cross-engine value oracle.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      pmod(acc * 31L +
        pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(1000000007L)),
        lit(2147483647L)))

  /** Punctuation character count / ratio, stopword ratio, and a composite
    * quality score in [0,1] — the standard cheap pre-filter stack for LLM
    * training data (cf. C4/Gopher rules: length bounds, symbol ratios,
    * stopword presence).
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this")

  def punctCount(text: Column): Column = textScan(text).getField("n_punct")

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(punctCount(text).cast("double") / length(text).cast("double"))

  /** One-pass text stats via the native expression (graft.plans
    * .TextScanStats): a single code-point scan yields the token trio
    * (count / total length / stopword hits — the former TokenStats) AND
    * the two regex-count stats (BPE-ish matches, punctuation chars)
    * whose java.util.regex alternations were the #3 CPU cost of the
    * sf10 bench leg. Identical semantics, property-pinned in
    * NativeExpressionsSpec.
    */
  def textScan(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.TextScanStats(
      ColumnBridge.expression(text), stopwords))
  }

  def stopwordRatio(text: Column): Column = {
    val s = textScan(text)
    when(s.getField("n_tokens") === 0, 0.0)
      .otherwise(s.getField("n_stop").cast("double") /
        s.getField("n_tokens").cast("double"))
  }

  def meanTokenLen(text: Column): Column = {
    val s = textScan(text)
    when(s.getField("n_tokens") === 0, 0.0)
      .otherwise(s.getField("sum_len").cast("double") /
        s.getField("n_tokens").cast("double"))
  }

  /** The three quality predicates, shared by the score, the declared
    * filter queries, and PipelineMain so thresholds can't diverge.
    */
  def lenOk(nChars: Column): Column   = nChars.between(50, 20000)
  def tokOk(text: Column): Column     = meanTokenLen(text).between(2.0, 12.0)
  def punctOk(text: Column): Column   = punctRatio(text) <= 0.2

  /** All three predicates at once — the pipeline's keep/drop filter. */
  def qualityOk(text: Column, nChars: Column): Column =
    lenOk(nChars) && tokOk(text) && punctOk(text)

  /** Composite quality score in [0,1]: length band + sane mean token length
    * + low punctuation. Deliberately simple arithmetic so it is
    * oracle-expressible and pushdown-friendly as a filter.
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val score =
      when(lenOk(nChars), 1.0).otherwise(0.0) +
      when(tokOk(text), 1.0).otherwise(0.0) +
      when(punctOk(text), 1.0).otherwise(0.0)
    round(score / 3.0, 4)
  }

  /** Character-class profile based language-ID heuristic. Real corpora get
    * n-gram models; the synthetic fixture is word soup, so the heuristic is
    * a deterministic scorer over script + terminal-vowel statistics that a
    * spec pins with known vectors. Returns one of a fixed label set.
    */
  def langIdHeuristic(text: Column): Column = {
    val t = lower(text)
    val cjk     = regexp_count(t, lit("[\\x{4e00}-\\x{9fff}]"))
    val umlaut  = regexp_count(t, lit("[äöüß]"))
    val enEs    = regexp_count(t, lit("\\b(el|la|los|las|una|del|que|es)\\b"))
    val en      = regexp_count(t, lit("\\b(the|and|of|to|is|that)\\b"))
    when(cjk > 0, "zh")
      .when(umlaut > 0, "de")
      .when(enEs > en, "es")
      .when(en > 0, "en")
      .otherwise("und")
  }

  /** PII patterns + scrub projection — per-row regexp, no shuffle. The
    * patterns deliberately stick to syntax shared by Java regex and
    * DuckDB's RE2 so the oracle replays them verbatim (RE2 has NO
    * lookahead, which shapes the design below); four patterns replace
    * left-to-right in the order given in [[scrubPii]].
    *
    * The IP and card patterns use open-ended repetition ({3,}) rather
    * than an exact count: with an exact count, a LONGER separated digit
    * sequence would match only its valid-length prefix at a \b boundary
    * and scrub partially — "1234-5678-9012-3456-7890" would leave a
    * "-7890" residue of the identifier it was meant to remove. Open
    * repetition swallows the whole run into one placeholder.
    */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe: String = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
  val ipRe: String = "\\b([0-9]{1,3}\\.){3,}[0-9]{1,3}\\b"
  val ccRe: String = "\\b[0-9]{4}([- ]?[0-9]{4}){3,}\\b"

  /** Scrub order matters: email first (its local part can contain
    * digits), then IP (dotted — the phone pattern cannot span the dots
    * but could eat the octet runs), then card (a 16-digit run the phone
    * pattern would otherwise swallow), then phone.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, lit(emailRe), lit("[EMAIL]")),
          lit(ipRe), lit("[IP]")),
        lit(ccRe), lit("[CARD]")),
      lit(phoneRe), lit("[PHONE]"))
}
