package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: token
  * counting, language ID, quality scoring, fingerprinting.
  *
  * All pure `Column` expressions over built-in functions — fully
  * codegen'd, no UDFs, so they stay inside WholeStageCodegen and scale
  * linearly with input partitions (no shuffle is introduced by any
  * function here; callers decide aggregation).
  *
  * Cross-engine determinism: the 60-bit hash [[h60]] is an md5 prefix,
  * reproducible in any engine (DuckDB: `CAST('0x'||substr(md5(x),1,15) AS
  * BIGINT)`), unlike xxhash64 whose seed/implementation is Spark-private.
  * Use it wherever an oracle must re-derive hashes; use xxhash64 when raw
  * speed matters more than portability (it avoids the hex round-trip).
  */
object TextOps {

  /** Word tokens (\\w+ runs), lowercased — the codegen'd
    * [[graft.functions.WordTokens]] scan, semantically identical to
    * [[tokensRegex]] (parity pinned by TextExpressionsSpec; every text
    * oracle re-derives tokens via regex in DuckDB). Sessions get the
    * function via `GraftExtensions` (`spark.sql.extensions`) or
    * `TextExpressions.register`.
    */
  def tokens(text: Column): Column =
    graft.functions.TextExpressions.toks(text)

  /** The regex formulation of [[tokens]] (the parity reference, and the
    * fallback for sessions without graft functions wired).
    */
  def tokensRegex(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\w+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Deterministic 60-bit non-negative hash: first 15 hex digits of md5.
    * 60 bits keeps it inside a signed long with no sign issues in either
    * engine.
    */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Stopword-marker hit counts for a language: how many tokens of `text`
    * appear in the marker list. Regex alternation keeps it a single
    * codegen'd pass over the string.
    */
  def langHits(text: Column, markers: Seq[String]): Column =
    size(regexp_extract_all(lower(text), lit("\\b(" + markers.mkString("|") + ")\\b"), lit(0)))

  /** Marker lists per language (tiny on purpose — a heuristic, not a
    * model; the point is the distributed scoring shape).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "los", "una"),
    "de" -> Seq("der", "die", "und", "das", "ein", "mit"),
    "fr" -> Seq("le", "les", "des", "une", "est", "dans"),
    "zh" -> Seq("的", "是", "不", "在", "了"))

  /** Argmax over [[langMarkers]] hit counts with a fixed tiebreak order
    * (list order). Expects columns named hits_<lang> to be in scope via
    * the provided accessor.
    */
  def predictedLang(hits: String => Column): Column = {
    val langs = langMarkers.map(_._1)
    langs.dropRight(1).zipWithIndex.foldRight(lit(langs.last)) {
      case ((lang, i), elseCol) =>
        val rest = langs.drop(i + 1)
        val cond = rest.map(o => hits(lang) >= hits(o)).reduce(_ && _)
        when(cond, lit(lang)).otherwise(elseCol)
    }
  }

  /** Normalized-text sha256 fingerprint: lowercase, whitespace collapsed.
    * Deterministic across engines (DuckDB sha256 of the same regex
    * normalization).
    */
  def fingerprintSha(text: Column): Column =
    sha2(regexp_replace(lower(text), "\\s+", " "), 256)

  /** Position-weighted rolling fingerprint: sum((pos+1) * (h60(token) mod
    * M)) mod M with M = 2^31-1. Order-sensitive (catches permuted
    * near-copies that a bag-of-words hash misses) yet expressible as a
    * commutative SUM, so Spark can compute it with a partial aggregate —
    * no sequential fold, which matters when one document's tokens span a
    * partition at scale.
    */
  val FpMod = 2147483647L
  def rollingFingerprint(text: Column): Column = {
    val terms = transform(tokens(text), (tok, i) =>
      (i + 1).cast("long") * (h60(tok) % FpMod))
    aggregate(terms, lit(0L), (acc, v) => acc + v) % FpMod
  }
}
