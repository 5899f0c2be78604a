package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (SURVEY §2.11), built
  * from codegen-friendly `org.apache.spark.sql.functions` + higher-order
  * functions only — no UDFs, so everything stays inside Catalyst and is
  * column-prunable/pushdown-transparent at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space; the corpus is single-spaced). */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** BPE-ish subword segmentation regex: words, numbers, or single
    * punctuation — a deterministic stand-in for a real tokenizer's pre-split.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))

  /** Let-binding for Column expressions: evaluates `value` ONCE per row (as
    * the element of a single-element array, referenced through the HOF
    * lambda variable) so `body` can use it many times. Without this, an
    * expression referenced repeatedly inside HOF lambdas is INLINED and
    * re-evaluated per reference — and per ELEMENT when it feeds a lambda
    * (e.g. re-tokenizing the document for every shingle position: the
    * unbound winnow fingerprint cost ~4 ms/doc, ~50× this form).
    */
  private def bind(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** k-word shingles as space-joined strings; fewer than k tokens → empty. */
  def wordShingles(toks: Column, k: Int): Column = bind(toks, t =>
    when(size(t) >= k,
      transform(
        sequence(lit(0), size(t) - k),
        i => concat_ws(" ", slice(t, i + 1, lit(k)))))
      .otherwise(array().cast("array<string>")))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Deterministic whole-document fingerprint: xxhash64 of the normalized
    * text (lowercased, punctuation stripped, whitespace collapsed).
    */
  def fingerprint(text: Column): Column = xxhash64(normalize(text))

  /** Winnowing-style robust fingerprint: min shingle hash of the normalized
    * token stream (survives local edits anywhere outside the min shingle).
    */
  def winnowFingerprint(text: Column, k: Int = 5): Column =
    bind(normalize(text), nt =>
      bind(wordShingles(tokens(nt), k), sh =>
        when(size(sh) > 0, array_min(transform(sh, s => xxhash64(s))))
          .otherwise(xxhash64(nt))))

  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Language-ID by stopword-marker voting (SURVEY §2.11): count marker hits
    * per language over the token set, predict the argmax with a fixed
    * tie-break order. A deterministic n-gram-free heuristic — accuracy is
    * data-dependent, determinism is guaranteed.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => markers.map(t === _).reduce(_ || _)))

  def langId(toks: Column): Column = bind(toks, bound => {
    val scores = langMarkers.map { case (lang, markers) => lang -> langScore(bound, markers) }
    // argmax with first-listed language winning ties
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lang).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }._1
  })

  /** PII patterns (email / NANP-style phone / IPv4), written in the regex
    * subset Java and RE2 interpret identically (no backreferences or
    * lookaround) so the DuckDB oracle can run the same patterns verbatim.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Redact PII spans with typed placeholders. Email first (its pattern
    * contains dots and digits that the later patterns must not see), then
    * phone, then IPv4 — the replacement tokens contain no digits, so the
    * passes cannot cascade.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Payment-card candidate runs: 13–19 digits, each adjacent pair optionally
    * split by ONE space or dash (the common grouping formats). Shared
    * Java/RE2 subset — non-capturing group + `\b` guards, no lookaround — so
    * the DuckDB oracle runs the pattern verbatim. The \b guards keep the
    * pattern from matching a 13-digit WINDOW of a longer digit run.
    */
  val cardRe = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  /** Luhn checksum over a digit-only string (ISO/IEC 7812): from the RIGHT,
    * double every second digit (subtracting 9 when the double exceeds 9) and
    * require the total ≡ 0 (mod 10). The checksum is what separates a real
    * card number from an arbitrary digit run — regex-only screens (t11's
    * shape) over-redact phone-adjacent and id-like runs, so production PII
    * redaction validates candidates before rewriting text. One `aggregate`
    * HOF over the digit positions: per-row work O(len), no shuffle, stays in
    * whole-stage codegen — the same exact-integer style as the oracle's
    * UNNEST(range) reconstruction.
    */
  def luhnValid(digits: Column): Column = bind(digits, d => {
    val n = length(d)
    val sum = aggregate(
      sequence(lit(1), n),
      lit(0),
      (acc, i) => {
        val digit = d.substr(i, lit(1)).cast("int")
        // 0-based position from the right; odd positions double.
        val doubled = when(pmod(n - i, lit(2)) === 1,
          when(digit * 2 > 9, digit * 2 - 9).otherwise(digit * 2))
          .otherwise(digit)
        acc + doubled
      })
    (pmod(sum, lit(10)) === 0) && n.between(13, 19)
  })

  /** Audit-safe display form: all but the last four digits masked. */
  def maskCard(digits: Column): Column =
    concat(lit("****"), digits.substr(length(digits) - 3, lit(4)))

  /** Longest run of identical consecutive elements — single-pass aggregate
    * HOF, so the repetition signal needs no shuffle and no explode (the
    * 100 TB shape: one projection over the corpus).
    */
  def maxRunLength(arr: Column): Column =
    aggregate(arr,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))

  /** Occurrences of the most frequent element: sort, then the longest run of
    * equal neighbors IS the mode count — per-row O(m log m), no shuffle.
    */
  def maxDupCount(arr: Column): Column = maxRunLength(array_sort(arr))

  /** Quality-score ingredients: exact integer/ratio features (SURVEY §2.11). */
  def nTokens(toks: Column): Column = size(toks)
  def nChars(text: Column): Column = length(text)
  def meanTokenLen(text: Column, toks: Column): Column =
    (length(text) - (size(toks) - 1)).cast("double") / size(toks)
}
