package graft.ops

import graft.core.XxHash64
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline operators a large-scale training-data pipeline needs,
  * expressed Spark-first: built-in codegen'd `functions._` wherever the
  * semantics allow (language-ID, quality, token counts are pure column
  * algebra — they run inside WholeStageCodegen, no UDF), pure-Scala
  * helpers + UDFs only for the genuinely custom kernels (rolling-hash
  * fingerprint, MinHash/SimHash signatures in Dedup.scala).
  */
object TextOps {

  // ---- language ID (n-gram-free heuristic, column algebra) ---------------

  /** CJK-character count via codegen'd regexp_replace — no UDF. */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))

  def asciiLetterCount(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", ""))

  /** Heuristic language ID: zh if CJK dominates, en if ASCII letters
    * dominate, und otherwise. Deterministic, SQL-expressible (DuckDB
    * oracle uses the same formula). */
  def langId(text: Column): Column = {
    val cjk = cjkCount(text)
    val asc = asciiLetterCount(text)
    val total = length(text)
    when(cjk * 4 > total, "zh")
      .when(asc * 2 > total, "en")
      .otherwise("und")
  }

  // ---- quality scoring ----------------------------------------------------

  /** Whitespace token count without UDF: exact count of space-separated
    * non-empty tokens. */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, " "), t => length(t) > 0))

  /** BPE-ish subword count: letter runs + digit runs + single CJK chars +
    * single non-space symbols, counted with codegen'd regexp_count. */
  val SubwordPattern =
    "[A-Za-z]+|[0-9]+|[\\u4e00-\\u9fff]|[^A-Za-z0-9\\u4e00-\\u9fff\\s]"

  def subwordCount(text: Column): Column =
    regexp_count(text, lit(SubwordPattern))

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\p{Punct}。，！？]", ""))

  private val StopWords =
    Seq("the", "a", "of", "to", "and", "is", "in", "的", "了", "是")

  def stopwordCount(text: Column): Column = {
    val toks = filter(split(lower(text), " "), t => length(t) > 0)
    size(filter(toks, t => t.isin(StopWords: _*)))
  }

  /** Integer quality features + a bucket — exact integer thresholds so the
    * DuckDB oracle hashes identically (no float drift). */
  def qualityBucket(nChars: Column, nTokens: Column, nPunct: Column): Column =
    when(nChars < 100, "too_short")
      .when(nPunct * 5 > nChars, "punct_heavy")
      .when(nTokens < 10, "low_token")
      .otherwise("ok")

  // ---- Gopher/C4-style corpus gates (column algebra, integer-exact) ------
  // The standard published pre-training quality rules (Gopher §A1.1, C4
  // §2.1) re-expressed as codegen'd column algebra with integer
  // cross-multiplied thresholds — no floats, so the DuckDB oracle hashes
  // identically; no UDF, so the whole filter runs in WholeStageCodegen.

  /** Sum of token lengths under single-space tokenization (= chars minus
    * spaces) — numerator of Gopher's mean-word-length gate. */
  def tokenCharCount(text: Column): Column =
    length(regexp_replace(text, " ", ""))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(filter(split(text, " "), t => length(t) > 0)))

  /** Tokens containing at least one letter (latin or CJK) — Gopher's
    * "80% of words contain an alphabetic character" gate. */
  def alphaTokenCount(text: Column): Column =
    size(filter(split(text, " "),
      t => t.rlike("[A-Za-z\\u4e00-\\u9fff]")))

  def sentenceCount(text: Column): Column =
    regexp_count(text, lit("[.!?。！？]"))

  /** Gopher's symbol-to-word markers (hash, ellipsis). */
  def symbolCount(text: Column): Column =
    regexp_count(text, lit("[#…]"))

  /** The conjunction: Gopher word-count/mean-word-length/symbol-ratio/
    * alpha-word/stopword/repetition gates + C4 terminal-punctuation,
    * ≥3-sentence, no-brace, no-lorem-ipsum gates. All comparisons are
    * integer cross-multiplications of the metric columns. */
  def gopherC4Keep(text: Column, nWords: Column, sumLen: Column,
                   nSymbols: Column, nAlpha: Column, nStop: Column,
                   nDistinct: Column, nSentences: Column): Column =
    nWords.between(50, 100000) &&
      (lit(3) * nWords <= sumLen) && (sumLen <= lit(10) * nWords) &&
      (lit(10) * nSymbols < nWords) &&
      (lit(5) * nAlpha >= lit(4) * nWords) &&
      (nStop >= 2) &&
      (lit(10) * nDistinct >= lit(7) * nWords) &&
      (nSentences >= 3) &&
      !text.contains("{") &&
      !lower(text).contains("lorem ipsum") &&
      // \z, not $: Java-regex $ matches BEFORE a trailing newline while
      // the DuckDB oracle's RE2 $ is absolute end-of-text — a doc ending
      // in '\n' would diverge between engine and oracle under $
      text.rlike("[.!?。！？]\"?\\z")

  // ---- PII redaction (column algebra, Java-regex ≡ RE2 patterns) ---------
  // Standard pre-training scrub: emails, IPv4 addresses, CN mobile numbers
  // replaced by typed placeholders. Patterns deliberately avoid any
  // construct where Java regex and RE2 (the DuckDB oracle) diverge — no
  // backreferences, no lookaround. Replacement order matters: emails first
  // (their local parts can contain digit runs), then IPs (dotted digits),
  // then bare mobile numbers.

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val CnMobileRe = "\\b1[3-9]\\d{9}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      CnMobileRe, "<PHONE>")

  // ---- document fingerprint (rolling hash, custom kernel) ---------------

  /** Polynomial rolling hash (Rabin–Karp style) over UTF-8 bytes: a
    * 64-bit content fingerprint that is cheap, incremental and
    * order-sensitive — unlike a bag-of-words hash it distinguishes
    * permutations. */
  def rollingFingerprint(text: String): Long = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 1125899906842597L // prime
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      i += 1
    }
    // final avalanche for bit dispersion
    XxHash64.hashLong(h)
  }

  val fingerprintUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => rollingFingerprint(s))
}
