package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as a distributed operator — the
  * step the text family was missing: x7/x8 count tokens under a FIXED
  * tokenizer; this LEARNS the tokenizer (the merge table) from the
  * corpus, the way an LLM pretraining pipeline derives its vocabulary
  * before any token budget can be priced.
  *
  * Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units" — the published BPE formulation): start
  * from the corpus word histogram with every word split into single
  * characters; repeatedly find the adjacent symbol pair with the highest
  * frequency (summed over word frequencies, every occurrence position
  * counted) and fuse it into one symbol everywhere, left-to-right
  * non-overlapping within a word. Ties break deterministically on
  * (pair count DESC, left ASC, right ASC) so the learned table is
  * reproducible across engines and cluster sizes.
  *
  * Scale shape — why this survives 100 TB: the ONLY corpus-sized work is
  * the word histogram (one partial-aggregated shuffle; `\w+` runs are
  * ASCII under both Java and RE2 regex so the tokenization agrees
  * byte-for-byte with the DuckDB oracle). Training then operates on the
  * top-`vocabTop` rows of the histogram — a metadata-sized table — so
  * every merge iteration costs one tiny pair-count aggregate plus a
  * 1-row `collect()` (the argmax; k collects of 1 row total, the
  * centroid-load pattern). The corpus itself is never rescanned:
  * exactly how production tokenizer training prices a 100 TB corpus
  * (the histogram dominates; the merge loop is free).
  *
  * Symbol sequences are TAB-joined strings: `\w+` words cannot contain
  * whitespace, so the tab is guaranteed out-of-alphabet for every
  * symbol at every merge depth. A merge of (l, r) is applied with the
  * doubled-separator trick — separators doubled, sequence padded, then
  * ONE literal `replace` of `\t l \t\t r \t` with `\t lr \t` — which
  * (a) anchors BOTH symbol boundaries (no prefix-collision with longer
  * symbols), and (b) leaves a separator behind for the next adjacent
  * occurrence, so `x y x y` fuses to `xy xy` in one pass while `a a a`
  * fuses left-to-right to `aa a`, exactly the reference BPE semantics
  * (and exactly what DuckDB's `replace` reproduces — both engines scan
  * literal replaces left-to-right, non-overlapping).
  */
object Bpe {

  /** One learned merge rule: at `step`, the pair (`lft`, `rgt`) with
    * corpus pair-frequency `pairCnt` fused into symbol `merged`.
    */
  final case class Merge(step: Long, lft: String, rgt: String,
      merged: String, pairCnt: Long)

  /** A word exploded into its initial symbol sequence: one character per
    * symbol, TAB-joined ("low" → "l\to\tw"). Per-char regex replace
    * rather than `split(word, "")` — the empty-pattern split's
    * trailing-empty behavior differs across engines; this formulation
    * is identical under Java regex and RE2.
    */
  def initialSeq(word: Column): Column =
    rtrim(regexp_replace(word, "(.)", "$1\t"), "\t")

  /** Apply ONE merge (lft, rgt) → merged to a TAB-joined symbol
    * sequence, left-to-right non-overlapping (see object scaladoc for
    * why the doubled-separator literal replace is exact).
    */
  def mergeOnce(seq: Column, lft: String, rgt: String): Column = {
    val doubled = replace(seq, lit("\t"), lit("\t\t"))
    val padded = concat(lit("\t"), doubled, lit("\t"))
    val fused = replace(padded,
      lit("\t" + lft + "\t\t" + rgt + "\t"),
      lit("\t" + lft + rgt + "\t"))
    // strip the padding separators with a regexp, not trim(col, "\t"):
    // the two-parameter trim Column signature is deprecated (emits a
    // FunctionResolution WARN per plan). Exactly one tab pads each end
    // (symbols are non-empty and every fuse keeps its boundary tabs),
    // so the anchored pattern is equivalent to the oracle's trim.
    replace(regexp_replace(fused, "^\t|\t$", ""), lit("\t\t"), lit("\t"))
  }

  /** The full learned chain applied to one word's initial sequence —
    * a codegen'd literal-replace pipeline (the c10 literal-centroid
    * pattern applied to tokenizer state: train once, inline the k-row
    * result into a corpus-wide projection with ZERO joins).
    */
  def applyMerges(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(initialSeq(word))((s, m) => mergeOnce(s, m.lft, m.rgt))

  /** Persist a trained merge table as a k-row zone (the
    * [[Similarity.saveCentroids]] pattern applied to tokenizer state):
    * the model artifact an encode pass loads back ([[loadMerges]], a
    * k-row driver read) instead of re-running training — and the unit
    * a scheduled corpus-level REFRESH rebuilds through
    * [[ZoneRebuild.rebuild]]'s fingerprint-guarded cutover when the
    * grown corpus's vocabulary drifts (the same fixed-at-creation →
    * refresh discipline as thresholds, centroids, and index geometry).
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], dir: String): Unit = {
    import spark.implicits._
    merges.toDF()
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)
  }

  /** Load a persisted merge table in learned order — a k-row driver
    * read (the centroid-load pattern); the caller inlines the result
    * as a literal replace chain ([[applyMerges]]), so serving an
    * encode needs zero joins against the zone.
    */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[Merge] =
    // k-row driver read through the fingerprint-guarded cache
    // (graft.core.MetaReads): re-read-per-trigger semantics preserved —
    // a refresh cutover lands new part files and misses the cache
    graft.core.MetaReads.rows(spark, dir).map(r => Merge(
        r.getAs[Long]("step"), r.getAs[String]("lft"), r.getAs[String]("rgt"),
        r.getAs[String]("merged"), r.getAs[Long]("pairCnt")))
      .sortBy(_.step).toSeq

  /** Corpus word histogram truncated to the training vocabulary: top
    * `vocabTop` words by (freq DESC, word ASC). One partial-aggregated
    * corpus shuffle; the LIMIT is a TakeOrdered, never a global sort.
    */
  def wordHistogram(docs: DataFrame, textCol: Column, vocabTop: Int): DataFrame =
    docs.select(explode(TextOps.tokens(textCol)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(vocabTop)

  /** Train `nMerges` BPE merges over the top-`vocabTop` word histogram
    * of `docs(textCol)`. Returns the merge table in learned order.
    *
    * Each iteration: adjacent-pair counts via one slice/zip_with
    * explode + partial-agg groupBy over the vocab-sized table, argmax
    * collected (1 row), then the fuse applied as a projection. The
    * evolving word table is re-persisted per step (vocab-sized — a few
    * KB) so iteration k+1 never replays the merge chain from scratch;
    * drivers release through [[graft.core.Caches]].
    */
  def train(docs: DataFrame, textCol: Column, vocabTop: Int,
      nMerges: Int): Seq[Merge] = {
    var words = graft.core.Caches.persistTracked(
      wordHistogram(docs, textCol, vocabTop)
        .select(initialSeq(col("word")).as("seq"), col("freq")))
    // step k's pair-count collect materializes `words`, which is the
    // last read of the PREVIOUS step's frame — unpersist it right
    // there (deterministic lifecycle; persistTracked stays the
    // exception-path fallback so a failed train still releases through
    // the drivers' Caches.release()).
    var spent: Option[DataFrame] = None
    val out = Seq.newBuilder[Merge]
    for (step <- 1 to nMerges) {
      val arr = split(col("seq"), "\t")
      val pairs = explode(zip_with(
        slice(arr, lit(1), size(arr) - 1),
        slice(arr, lit(2), size(arr) - 1),
        (l, r) => struct(l.as("lft"), r.as("rgt"))))
      val top = words.select(pairs.as("p"), col("freq"))
        .select(col("p.lft").as("lft"), col("p.rgt").as("rgt"), col("freq"))
        .groupBy(col("lft"), col("rgt")).agg(sum(col("freq")).as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("lft"), col("rgt"))
        .limit(1).collect()
      spent.foreach(_.unpersist())
      spent = None
      require(top.nonEmpty,
        s"BPE training exhausted pairs at step $step (every word is one symbol)")
      val (l, r, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      out += Merge(step.toLong, l, r, l + r, cnt)
      if (step < nMerges) { // the final fuse has no consumer — skip it
        spent = Some(words)
        words = graft.core.Caches.persistTracked(
          words.select(mergeOnce(col("seq"), l, r).as("seq"), col("freq")))
      }
    }
    words.unpersist()
    out.result()
  }
}
