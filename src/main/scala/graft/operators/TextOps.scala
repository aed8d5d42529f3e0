package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  // --- Bigram-LM familiarity (statistical-LM fluency filter) -----------

  /** A pruned bigram language model: `transitions(w1, w2, c12)` (bigram
    * counts ≥ the prune threshold), `heads(w1, c1)` (total bigram
    * occurrences headed by w1 — UNPRUNED, summed before the prune so
    * probabilities stay calibrated), `vocab` (1 row: distinct head
    * count, the smoothing denominator's vocabulary size).
    */
  case class BigramLm(transitions: DataFrame, heads: DataFrame, vocab: DataFrame)

  /** Per-document ordered bigram pairs `(doc_id, w1, w2)` from one
    * narrow tokenize pass: the token array zipped with itself shifted by
    * one (`arrays_zip(t[0..n-2], t[1..n-1])`), then exploded — no join,
    * no carrying the full array through the explode. Documents with
    * fewer than two tokens contribute no rows (callers re-attach them
    * with a left join, see [[lmFamiliarity]]).
    */
  def bigrams(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), tokens(text).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1).as("w1"),
        slice(col("t"), lit(2), size(col("t")) - 1).as("w2"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Train a pruned bigram LM from a bigram frame ([[bigrams]]).
    *
    * ONE corpus-scan aggregation: the full transition table is the only
    * shuffle over token-row-sized data; heads (`c1 = Σ_w2 c12`) and the
    * vocabulary size then derive from that already-aggregated,
    * bigram-TYPE-sized table (Zipf-bounded — orders of magnitude smaller
    * than the corpus), which is persisted for its three consumers. The
    * `minCount` prune bounds the shipped model the way production LM
    * filters prune their KenLM tables: singleton bigrams carry no
    * generalization signal and dominate the table's mass.
    */
  def bigramLm(bi: DataFrame, minCount: Long): BigramLm = {
    val all = graft.core.Caches.persistTracked(
      bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")))
    BigramLm(
      transitions = all.filter(col("c12") >= minCount),
      heads = all.groupBy(col("w1")).agg(sum(col("c12")).as("c1")),
      vocab = all.select(col("w1")).distinct().agg(count(lit(1)).as("vocab")))
  }

  /** Score every document of `docs` by its average add-one-smoothed
    * bigram transition probability under `lm` — the statistical-LM
    * fluency filter of web-corpus pipelines (CCNet/Gopher shape): text
    * whose transitions the model has seen scores high; gibberish,
    * boilerplate soup, and wrong-language text score low. Train and
    * score corpora need not be the same (score Common Crawl under a
    * Wikipedia-trained model); heads missing from the model (unseen w1)
    * fall back to c1 = 0, i.e. the maximally-smoothed probability.
    *
    * Determinism contract: probabilities are kept RATIONAL — the usual
    * per-token log-prob sum would go through libm `log`, whose rounding
    * differs across engines (file scaladoc). Each transition scores
    * `⌊1e9·(c12+1)/(c1+V)⌋` in pure integer math, and the per-document
    * mean is an integer `DIV` — bit-identical in any engine. (At real
    * corpus scale promote the scaled product to DECIMAL(38,0); at 1e9
    * scaling a LONG holds corpora to ~9e9 occurrences of one bigram.)
    *
    * Scale shape: both model sides are broadcast (transitions pruned by
    * `minCount`, heads vocabulary-sized, vocab 1 row), so the corpus
    * side is one narrow bigram pass + ONE shuffle (the per-doc_id agg);
    * the bigram probe never shuffles the corpus.
    */
  def lmFamiliarity(docs: DataFrame, id: Column, bi: DataFrame,
      lm: BigramLm): DataFrame = {
    val scored = bi
      .join(broadcast(lm.transitions), Seq("w1", "w2"), "left")
      .join(broadcast(lm.heads), Seq("w1"), "left")
      .crossJoin(broadcast(lm.vocab))
      .select(col("doc_id"),
        expr("(1000000000L * (coalesce(c12, 0L) + 1L))" +
          " DIV (coalesce(c1, 0L) + vocab)").as("p_scaled"))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_scaled")).as("sum_p"))
    docs.select(id.as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("sum_p DIV n_bigrams"), lit(0L)).as("familiarity_scaled"))
  }
}
