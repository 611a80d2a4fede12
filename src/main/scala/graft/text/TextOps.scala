package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operator pack: normalization, tokenization, quality
  * scoring, language-ID heuristics, fingerprinting.
  *
  * Mirrors the reference's text stage (Hap880_Final_Project.py:287-310:
  * lowercase → strip punctuation/digits → tokenize on \W+ → drop
  * stopwords), generalized into reusable column expressions. Everything
  * here is a pure builtin-composition expression — codegen'd, no UDFs, no
  * shuffle — so it streams over 100 TB of documents at scan speed.
  */
object TextOps {

  /** A small English stopword list (subset of the common NLTK list — public
    * domain word list, re-typed, not copied from the reference).
    */
  val stopwords: Seq[String] = Seq(
    "a", "an", "the", "and", "or", "of", "to", "in", "on", "at", "for",
    "is", "are", "was", "were", "be", "been", "it", "its", "this", "that",
    "with", "as", "by", "from", "not", "no", "but", "if", "then", "so"
  )

  /** Newline/punct/digit scrub (reference E13/E16 cleanup, py:290-306). */
  def normalize(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[\\r\\n]", " "), "[^a-z ]", " "))

  /** Lowercase alpha tokens: split on non-letters, drop empties.
    * Equivalent to the reference's `re.split('\\W+')` + isalpha filter
    * (py:306-307).
    */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z]+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count estimate: alpha runs contribute ceil(len/4)
    * pieces, digit runs 1 piece each — a cheap deterministic proxy for a
    * real tokenizer's piece count.
    */
  def tokenCountBpeIsh(c: Column): Column = {
    val alphaPieces = aggregate(
      filter(split(lower(c), "[^a-z]+"), t => t =!= ""),
      lit(0L),
      (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long")
    )
    val digitRuns = size(filter(split(c, "[^0-9]+"), t => t =!= ""))
    alphaPieces + digitRuns.cast("long")
  }

  def stopwordCount(c: Column): Column =
    size(filter(tokens(c), t => t.isin(stopwords.map(s => s: Any): _*)))

  /** Quality-score components (length / punctuation / stopword ratios).
    * Zero-length guard: 0.0/0 in doubles is NaN, which would poison
    * qualityScore and every downstream average for empty documents.
    */
  def alphaRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(length(regexp_replace(lower(c), "[^a-z]", "")).cast("double") / length(c))

  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(length(regexp_replace(c, "[^.,;:!?]", "")).cast("double") / length(c))

  def stopwordRatio(c: Column): Column =
    when(tokenCount(c) === 0, 0.0)
      .otherwise(stopwordCount(c).cast("double") / tokenCount(c))

  def meanTokenLen(c: Column): Column =
    when(tokenCount(c) === 0, 0.0)
      .otherwise(
        aggregate(tokens(c), lit(0L), (acc, t) => acc + length(t)).cast("double") /
          tokenCount(c)
      )

  /** Composite [0,1] quality score: favors texts with sane token counts,
    * high alpha ratio, some stopwords (fluent prose) and mid-length tokens.
    */
  def qualityScore(c: Column): Column = {
    val lenOk   = when(tokenCount(c).between(10, 100000), 1.0).otherwise(0.0)
    val alphaOk = when(alphaRatio(c) >= 0.6, 1.0).otherwise(alphaRatio(c) / 0.6)
    val stopOk  = when(stopwordRatio(c) >= 0.05, 1.0).otherwise(stopwordRatio(c) / 0.05)
    round((lenOk + alphaOk + stopOk) / 3.0, 4)
  }

  /** Marker-word language-ID heuristic (n-gram/stopword-hit based). CJK
    * scripts are detected by codepoint class first; Latin languages by
    * marker-word hit counts, ties broken in a fixed order.
    */
  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les"),
    "de" -> Seq("der", "die", "und", "das", "ist")
  )

  private def markerHits(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(words.map(w => w: Any): _*)))

  /** All marker words across the four Latin-script languages — the
    * "language identifiable at all" evidence set used by the curation
    * funnel's lang gate (a doc with zero marker hits and no CJK
    * codepoints is script noise / unidentifiable, the class a
    * pre-training pipeline drops first).
    */
  private[graft] val allMarkers: Seq[String] = markers.values.flatten.toSeq.distinct

  /** True iff [[langId]] has ANY evidence to work with: a CJK codepoint
    * or at least one Latin marker-word hit. Pure codegen'd expressions —
    * one pass over the token array.
    */
  def langEvident(c: Column): Column =
    c.rlike("[\\u4e00-\\u9fff]") || markerHits(c, allMarkers) > 0

  def langId(c: Column): Column = {
    val en = markerHits(c, markers("en"))
    val es = markerHits(c, markers("es"))
    val fr = markerHits(c, markers("fr"))
    val de = markerHits(c, markers("de"))
    when(c.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(en >= es && en >= fr && en >= de, "en")
      .when(es >= fr && es >= de, "es")
      .when(fr >= de, "fr")
      .otherwise("de")
  }

  /** Stable content fingerprint: md5 of the normalized token stream.
    * Identical across engines (MD5 over UTF-8 is engine-independent).
    * Token-free content (digits-only, punctuation-only, non-Latin scripts)
    * falls back to md5 of the lowercased RAW text — otherwise every such
    * document would hash to md5("") and exact dedup would collapse all of
    * them into one group (silent data loss).
    */
  def fingerprintMd5(c: Column): Column =
    when(size(tokens(c)) === 0, md5(lower(c)))
      .otherwise(md5(array_join(tokens(c), " ")))

  /** 60-bit engine-portable token hash: top 15 hex chars of md5. MD5 over
    * UTF-8 is identical in every engine (DuckDB:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`), and 60 bits keeps
    * downstream modular arithmetic inside signed 64-bit — the primitive
    * that makes rolling-hash / MinHash / SimHash outputs exactly
    * DuckDB-oracle-able (crc32/xxhash64 are engine-specific).
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Polynomial rolling hash over the token stream (base-31 mod 2^31-1) —
    * the document-fingerprint primitive for shingling. Modular so it never
    * overflows under ANSI arithmetic (acc < 2^31, token hash < 2^60 →
    * acc*31 + h < 2^61); pure higher-order-function expression;
    * deterministic and engine-portable via `md5Hash60`.
    */
  def rollingHash(c: Column): Column =
    aggregate(
      tokens(c),
      lit(17L),
      (acc, t) => pmod(acc * lit(31L) + md5Hash60(t), lit(2147483647L))
    )

  /** Word n-gram shingles of the token array (for Jaccard/MinHash dedup).
    * Guard the short-text case explicitly: Spark's `sequence(1, 0)` counts
    * DOWN rather than producing an empty array.
    *
    * PERF: prefer `shinglesFromTokens` over a materialized token COLUMN.
    * This convenience form embeds the tokenization subtree at every
    * `element_at` reference; if Catalyst doesn't hoist it, the regex
    * split re-runs per shingle element (measured 10×+ slowdowns).
    */
  def shingles(c: Column, n: Int): Column = shinglesFromTokens(tokens(c), n)

  /** Shingles from an already-computed token array column (pass an
    * attribute, i.e. a column produced by a previous projection).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        array_distinct(
          transform(
            sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)
          )
        )
      )

  // ------------------------------------------------------------------
  // PII scrubbing — the pre-training redaction pass (emails, URLs,
  // phone-shaped digit runs → typed placeholder tokens). Patterns stay
  // inside the RE2 ∩ Java-regex common subset (character classes, bounded
  // repetition, \b, \S — no backreferences/lookaround), so the DuckDB
  // oracle replays them verbatim and the scrubbed text is hash-checkable
  // across engines. Pure regexp_replace chain: codegen'd, scan-speed.
  // ------------------------------------------------------------------

  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // printable-ASCII run, NOT \S: Java counts U+000B as whitespace and RE2
  // does not, so \S+ would scrub different spans on the two engines; the
  // explicit [!-~] range means the same code points everywhere
  val urlRe: String = "https?://[!-~]+"
  val phoneRe: String = "\\b\\d{3}[-.]?\\d{3}[-.]?\\d{4}\\b"

  /** Redact PII spans in order email → URL → phone (emails must go first:
    * a URL scrub would swallow a trailing `mailto:`-style span, and the
    * placeholders themselves contain no digits/@ so later passes can't
    * re-match earlier replacements).
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        urlRe, "<URL>"),
      phoneRe, "<PHONE>")

  /** How many spans each pattern matched (counted on the RAW text). */
  def piiCounts(c: Column): (Column, Column, Column) =
    (size(regexp_extract_all(c, lit(emailRe), lit(0))),
     size(regexp_extract_all(c, lit(urlRe), lit(0))),
     size(regexp_extract_all(c, lit(phoneRe), lit(0))))
}
