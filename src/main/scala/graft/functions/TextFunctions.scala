package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Text-analysis functions for large-scale training-data pipelines.
  *
  * Everything here is composed from `org.apache.spark.sql.functions._`
  * so the whole path stays inside whole-stage codegen — no UDFs, no
  * driver round-trips. Deterministic by construction, so results are
  * reproducible across runs/engines (the DuckDB oracle mirrors each
  * formula 1:1).
  */
object TextFunctions {

  /** Unicode NFC canonicalization (native codegen'd
    * [[graft.functions.expressions.NfcNormalize]]) — run FIRST in any
    * ingest that later hashes, shingles or dedups text: precomposed and
    * decomposed spellings of the same visible string must collapse to
    * one canonical form or every downstream equality silently misses. */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.NfcNormalize(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** Whitespace tokenization (empty-token free). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word unit count: letter runs, digit runs and single
    * non-space punctuation as separate units — the common pre-tokenizer
    * regex family, written without lookarounds so RE2-based engines (the
    * oracle) produce identical counts. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", ""))

  /** English-ish stopword list used by quality + language-ID scoring. */
  val stopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "or", "be")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(lower(text)), t => t.isin(stopwordsEn.map(lit): _*)))

  /** Quality score in [0,1]: blend of length saturation, low punctuation
    * density and healthy stopword ratio — the standard cheap heuristics
    * (C4/Gopher-style rules) expressed as one codegen'd expression. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChr = length(text).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(nChr, lit(1.0))
    val stopRatio = stopwordCount(text).cast("double") / greatest(nTok, lit(1.0))
    Portable.pround(lit(0.4) * lenScore
      + lit(0.3) * (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0)))
      + lit(0.3) * least(stopRatio * lit(5.0), lit(1.0)), 4)
  }

  /** Sentence count for readability scoring: runs of terminal
    * punctuation (lookaround-free, RE2-shared with the oracle). */
  def sentenceCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.!?]+"), lit(0)))

  /** Syllable proxy: vowel GROUPS in the lowercased text. Groups never
    * span whitespace, so one whole-text pass equals a per-word sum —
    * the standard cheap heuristic (exact syllabification needs a
    * dictionary; this is the deterministic, oracle-shared stand-in). */
  def syllableCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))

  /** Flesch reading ease (H26): `206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words)` with the vowel-group syllable proxy —
    * the readability gate of corpus curation (comprehensibility
    * filtering). Zero-token/zero-sentence docs score against the
    * greatest(…, 1) guards rather than NaN. The expression tree is
    * mirrored operation-for-operation in the oracle, so the IEEE
    * doubles agree bit-for-bit before the fixed-point round. */
  def fleschScore(text: Column, scale: Int = 4): Column = {
    val w = greatest(tokenCount(text), lit(1)).cast("double")
    val s = greatest(sentenceCount(text), lit(1)).cast("double")
    val sy = syllableCount(text).cast("double")
    Portable.pround(
      lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (sy / w), scale)
  }

  /** Stopword-profile language ID: score = fraction of tokens found in
    * the language's function-word list; argmax with 'und' fallback.
    * N-gram-profile heuristic in the Cavnar-Trenkle spirit, restricted
    * to word-level unigrams so the oracle can mirror it exactly. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> stopwordsEn,
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "por", "que"))

  def langScore(text: Column, words: Seq[String]): Column =
    langScoreFromTokens(tokens(lower(text)), words)

  private def langScoreFromTokens(ltok: Column, words: Seq[String]): Column =
    size(filter(ltok, t => t.isin(words.map(lit): _*))).cast("double") /
      greatest(size(ltok), lit(1)).cast("double")

  /** Predicted language: highest-scoring profile above `minScore`, ties
    * broken by profile order (en > de > fr > es), else 'und'. */
  def langId(text: Column, minScore: Double = 0.05): Column =
    langIdFromTokens(tokens(lower(text)), minScore)

  /** langId over an already-materialized lowercased token array.
    * Tokenization is an interpreted higher-order pipeline that the
    * optimizer will NOT common-out across the four profile scores
    * (CollapseProject keeps multiply-referenced non-cheap aliases in
    * their own projection) — so callers scoring several signals project
    * `tokens(lower(text))` ONCE and feed it here: one tokenize pass
    * instead of one per profile. */
  def langIdFromTokens(ltok: Column, minScore: Double = 0.05): Column = {
    val scored = profiles.map { case (l, ws) => (l, langScoreFromTokens(ltok, ws)) }
    val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (l, s)) => (when(s > bs, lit(l)).otherwise(bl), greatest(s, bs))
    }
    when(best._2 >= lit(minScore), best._1).otherwise(lit("und"))
  }

  /** All scoring counts in one native single-pass expression
    * ([[graft.functions.expressions.TextProfile]]); `lowered` must be
    * the lowercased text. Callers scoring several signals project this
    * ONCE and derive everything from the struct. */
  def textProfile(lowered: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.TextProfile(
        org.apache.spark.sql.graft.ColumnBridge.expression(lowered)))

  /** qualityScore from a [[textProfile]] struct; `text` is the RAW text
    * (char length must come from the unlowered string — lowercasing can
    * change codepoint counts in Unicode edge cases). */
  def qualityScoreFromProfile(text: Column, p: Column): Column = {
    val nTok = p.getField("n_tokens").cast("double")
    val nChr = length(text).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val punctRatio = p.getField("n_punct").cast("double") / greatest(nChr, lit(1.0))
    val stopRatio = p.getField("n_en").cast("double") / greatest(nTok, lit(1.0))
    Portable.pround(lit(0.4) * lenScore
      + lit(0.3) * (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0)))
      + lit(0.3) * least(stopRatio * lit(5.0), lit(1.0)), 4)
  }

  /** langId from a [[textProfile]] struct — same scoring fold as
    * [[langId]], zero array traversals. */
  def langIdFromProfile(p: Column, minScore: Double = 0.05): Column = {
    val nTok = greatest(p.getField("n_tokens"), lit(1)).cast("double")
    val scored = profiles.map { case (l, _) =>
      (l, p.getField(s"n_$l").cast("double") / nTok)
    }
    val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (l, s)) => (when(s > bs, lit(l)).otherwise(bl), greatest(s, bs))
    }
    when(best._2 >= lit(minScore), best._1).otherwise(lit("und"))
  }

  /** qualityScore over a pre-projected lowercased token array (`lower`
    * never changes whitespace, so token COUNT from the lowered stream
    * equals the raw-text token count the formula specifies). */
  def qualityScoreFromTokens(text: Column, ltok: Column): Column = {
    val nTok = size(ltok).cast("double")
    val nChr = length(text).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(nChr, lit(1.0))
    val nStop = size(filter(ltok, t => t.isin(stopwordsEn.map(lit): _*)))
    val stopRatio = nStop.cast("double") / greatest(nTok, lit(1.0))
    Portable.pround(lit(0.4) * lenScore
      + lit(0.3) * (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0)))
      + lit(0.3) * least(stopRatio * lit(5.0), lit(1.0)), 4)
  }

  /** Distinct word k-shingles: contiguous k-grams of the lowercased
    * token stream joined by single spaces — a native single-pass
    * [[graft.functions.expressions.WordShingles]] expression (the
    * declarative `transform`/`slice` pipeline was interpreted and
    * O(n²) to dedupe; see that class for the exact semantics). */
  def shingles(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.WordShingles(
        org.apache.spark.sql.graft.ColumnBridge.expression(lower(text)), k))

  /** Within-document repetition: 1 - distinct/total k-grams — the
    * Gopher-style repetitive-content signal (boilerplate, keyword
    * stuffing, degenerate generations). Total k-grams of an m-token doc
    * is m-k+1 (docs shorter than k tokens have exactly one shingle, so
    * ratio 0); distinct comes from the same single-pass native shingle
    * expression the dedup family uses. */
  def repetitionRatio(text: Column, k: Int): Column = {
    val nTok = tokenCount(text)
    val total = when(nTok < k, lit(1)).otherwise(nTok - (k - 1))
    Portable.pround(lit(1.0) -
      size(shingles(text, k)).cast("double") / total.cast("double"), 4)
  }

  /** Document fingerprint (winnowing-lite): the minimum md5 over the
    * document's k-shingles — a deterministic rolling-hash-family
    * fingerprint that is stable under content reordering-free edits. */
  def fingerprint(text: Column, k: Int): Column =
    array_min(transform(shingles(text, k), s => md5(s)))

  /** C4-style cleanup: strip markup tags, collapse whitespace runs to
    * one space, trim. Lookaround-free regexes so RE2 engines agree. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, "<[^>]*>", " "), "\\s+", " "))

  /** HTML → text extraction (the Common-Crawl-style ingest stage
    * [[cleanText]]'s bare tag strip is not): script/style PAYLOADS and
    * comments are dropped as blocks first — tag-stripping alone would
    * leak JS/CSS bodies into the corpus — then remaining tags go to
    * spaces, the five predefined XML entities plus `&nbsp;` decode
    * (`&amp;` LAST, so double-escapes resolve one level, the standard
    * order), and whitespace collapses. Regexes are lookaround- and
    * backreference-free; `(?is)` + lazy `.*?` are RE2-supported, so the
    * oracle engine agrees byte-for-byte. Unclosed script/style blocks
    * fall through to the tag strip (payload kept) rather than eating
    * the rest of the document. */
  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->",
      " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** PII scrub patterns (shared with the oracle 1:1). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longNumRe = "[0-9]{7,}"

  /** Redact emails and long digit runs — the cheap deterministic PII
    * pass every training-data pipeline runs before anything smarter. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), longNumRe, "<NUM>")

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailRe), lit(0)))

  def longNumCount(text: Column): Column =
    size(regexp_extract_all(text, lit(longNumRe), lit(0)))
  /** URL canonicalization (H24) — the web-ingest normalization every
    * crawl pipeline runs before URL-level dedup and domain accounting:
    * the same resource arrives spelled a dozen ways (case-shifted
    * scheme/host, explicit default ports, tracking params in random
    * order, fragments). Deterministic, regex-only (no lookarounds —
    * the RE2-based oracle mirrors each step 1:1):
    *
    *   1. scheme and host lowercase (path stays verbatim — it is
    *      case-sensitive by spec);
    *   2. explicit default ports drop (`:80` for http, `:443` for
    *      https);
    *   3. tracking params drop (`utm_*`, `fbclid`, `gclid`);
    *   4. remaining query params sort bytewise and rejoin (order never
    *      distinguishes resources);
    *   5. the `#fragment` drops (never sent to the server).
    *
    * Inputs without a `scheme://` pass through trimmed — refusing to
    * guess beats guessing wrong. A pure zero-shuffle projection. */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = lower(regexp_extract(afterScheme, "^([^/?#]*)", 1))
    val host = when(
      scheme === "http" && hostPort.endsWith(":80"),
      regexp_replace(hostPort, ":80$", ""))
      .when(
        scheme === "https" && hostPort.endsWith(":443"),
        regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathQF = regexp_replace(afterScheme, "^[^/?#]*", "")
    val path = regexp_extract(pathQF, "^([^?#]*)", 1)
    val query = regexp_extract(pathQF, "^[^?#]*\\?([^#]*)", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"), p =>
        length(p) > 0 && !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid)="))),
      "&")
    val canon = concat(scheme, lit("://"), host, path,
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
    when(length(scheme) > 0, canon).otherwise(u)
  }

  /** Line-level boilerplate filtering (H25) — the C4/RefinedWeb-style
    * pass that strips navigation chrome and fragment lines BEFORE
    * document-level quality scoring (a page whose text is 40% "Home |
    * About | Contact" scores garbage on every downstream metric):
    * a line survives when it has ≥ `minTokens` whitespace tokens AND
    * does not open with a navigation keyword (home/menu/login/...,
    * case-insensitive) AND is not a bare copyright line. Surviving
    * lines rejoin with the newline preserved; `(kept, dropped)` counts
    * ride along for the DQ report. Deterministic, regex-only,
    * zero-shuffle. */
  val navLineRe: String =
    "^(home|about( us)?|contact( us)?|login|sign (in|up)|menu|search|" +
      "privacy policy|terms of (use|service)|cookie policy|" +
      "(all rights reserved|copyright).*)$"

  def filterLines(text: Column, minTokens: Int): Column = {
    val keep = filter(split(text, "\\n"), l => {
      val t = trim(l)
      size(tokens(t)) >= minTokens && !lower(t).rlike(navLineRe)
    })
    struct(
      array_join(keep, "\n").as("clean_text"),
      size(keep).as("n_kept"),
      (size(split(text, "\\n")) - size(keep)).as("n_dropped"))
  }
}
