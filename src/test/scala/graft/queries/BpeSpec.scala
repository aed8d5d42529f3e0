package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Bpe

/** x31/c18/x32: BPE tokenizer training, the trained-chain encode, and
  * the deterministic epoch shuffle.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def one(seq: String, l: String, r: String): String =
    Seq(seq).toDF("seq").select(Bpe.mergeOnce(col("seq"), l, r)).head.getString(0)

  test("mergeOnce fuses consecutive occurrences in one pass (x y x y -> xy xy)") {
    assert(one("x\ty\tx\ty", "x", "y") == "xy\txy")
  }

  test("mergeOnce is left-to-right non-overlapping (a a a -> aa a)") {
    assert(one("a\ta\ta", "a", "a") == "aa\ta")
    assert(one("a\ta\ta\ta", "a", "a") == "aa\taa")
  }

  test("mergeOnce anchors BOTH symbol boundaries (no prefix collisions)") {
    // (x, y) must not fire on the pair (x, yz) or (wx, y)
    assert(one("x\tyz", "x", "y") == "x\tyz")
    assert(one("wx\ty", "x", "y") == "wx\ty")
    // single-symbol and empty-pair-free sequences pass through
    assert(one("q", "x", "y") == "q")
  }

  test("train learns the hand-computed merge table with deterministic tiebreaks") {
    // words: low x5, lower x2, newest x3, aaa x3, banana x2, widest x3,
    // band x1. Step 1: (l,o)=7 ties (o,w)=7 -> lexicographic (l,o).
    // Step 2: (lo,w)=7. Step 3: three-way tie at 6 between (a,a)
    // [left-to-right within aaa: 2 per word], (e,s), (s,t) -> (a,a).
    val docs = Seq(
      (1L, "low low low low low lower lower newest newest aaa aaa banana"),
      (2L, "widest widest widest newest aaa banana band")).toDF("doc_id", "text")
    val m = Bpe.train(docs, col("text"), vocabTop = 1024, nMerges = 3)
    assert(m == Seq(
      Bpe.Merge(1, "l", "o", "lo", 7),
      Bpe.Merge(2, "lo", "w", "low", 7),
      Bpe.Merge(3, "a", "a", "aa", 6)))
  }

  test("applyMerges collapses a fully-learned word to one symbol") {
    val merges = Seq(
      Bpe.Merge(1, "l", "o", "lo", 0),
      Bpe.Merge(2, "lo", "w", "low", 0))
    val got = Seq("low").toDF("w")
      .select(Bpe.applyMerges(col("w"), merges)).head.getString(0)
    assert(got == "low")
    val partial = Seq("lower").toDF("w")
      .select(Bpe.applyMerges(col("w"), merges)).head.getString(0)
    assert(partial == "low\te\tr")
  }

  // ---- randomized cross-checks against an independent reference ----

  /** Direct left-to-right BPE merge over a symbol list — the textbook
    * formulation, no string tricks.
    */
  private def refMerge(syms: List[String], l: String, r: String): List[String] = {
    @annotation.tailrec
    def go(rest: List[String], acc: List[String]): List[String] = rest match {
      case a :: b :: t if a == l && b == r => go(t, (a + b) :: acc)
      case a :: t => go(t, a :: acc)
      case Nil => acc
    }
    go(syms, Nil).reverse
  }

  /** Textbook BPE trainer over a word-frequency map (every adjacent
    * position counted, (count DESC, lft, rgt) tiebreak).
    */
  private def refTrain(words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var seqs: Map[List[String], Long] =
      words.map { case (w, f) => (w.toList.map(_.toString), f) }
    (1 to k).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((s, f) <- seqs; (a, b) <- s.zip(s.tail)) counts((a, b)) += f
      val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      seqs = seqs.map { case (s, f) => (refMerge(s, l, r), f) }
      (l, r, c)
    }
  }

  test("mergeOnce matches the direct reference on 200 random symbol sequences") {
    val rnd = new scala.util.Random(41)
    val pool = Vector("a", "b", "ab", "ba", "aa", "x", "xy")
    val cases = (1 to 200).map { i =>
      val syms = List.fill(rnd.nextInt(12))(pool(rnd.nextInt(pool.size)))
      val l = pool(rnd.nextInt(pool.size))
      val r = pool(rnd.nextInt(pool.size))
      (i, syms, l, r)
    }
    // one job: every case is a row, the merge column is per-row literal-free
    // except (l, r) — group cases by (l, r) so each group shares one plan
    cases.groupBy { case (_, _, l, r) => (l, r) }.foreach { case ((l, r), cs) =>
      val df = cs.map { case (i, syms, _, _) => (i, syms.mkString("\t")) }
        .toDF("id", "seq")
      val got = df.select(col("id"), Bpe.mergeOnce(col("seq"), l, r))
        .collect().map(rw => (rw.getInt(0), rw.getString(1))).toMap
      cs.foreach { case (i, syms, _, _) =>
        val want = refMerge(syms, l, r).mkString("\t")
        assert(got(i) == want,
          s"case $i: merge ($l,$r) on ${syms.mkString("[", " ", "]")}: got '${got(i)}', want '$want'")
      }
    }
  }

  test("train matches the textbook trainer on random corpora") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val words = (1 to 30).map { _ =>
        val w = (1 to (2 + rnd.nextInt(7)))
          .map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
        w -> (1L + rnd.nextInt(9))
      }.toMap // duplicate words collapse — freqs stay deterministic per seed
      val text = words.toSeq.sortBy(_._1)
        .flatMap { case (w, f) => Seq.fill(f.toInt)(w) }.mkString(" ")
      val docs = Seq((trial.toLong, text)).toDF("doc_id", "text")
      val got = Bpe.train(docs, col("text"), vocabTop = 1024, nMerges = 4)
        .map(m => (m.lft, m.rgt, m.pairCnt))
      val want = refTrain(words, 4)
      assert(got == want, s"trial $trial: got $got, want $want")
      graft.core.Caches.release()
    }
  }

  test("epochPermutation is a permutation, equals the naive global rank, and differs per epoch") {
    val docs = (1L to 97L).map(i => (i * 13L % 997L, s"d$i")).toDF("doc_id", "text")
    val n = docs.count()
    def naive(e: Int) = docs.select(col("doc_id"),
        graft.operators.TextOps.h60(
          concat(lit(s"epoch$e:"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("pos", row_number().over(Window.orderBy(col("hk"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("pos"))
    for (e <- 0 to 1) {
      val got = TrainingData.epochPermutation(docs, e, n)
        .select(col("doc_id"), col("pos")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = naive(e).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, s"epoch $e diverges from the naive rank")
      assert(got.values.toSeq.sorted == (1L to n), s"epoch $e is not a permutation")
    }
    graft.core.Caches.release()
    val p0 = TrainingData.epochPermutation(docs, 0, n).collect().map(r => (r.getLong(1), r.getLong(2)))
    graft.core.Caches.release()
    val p1 = TrainingData.epochPermutation(docs, 1, n).collect().map(r => (r.getLong(1), r.getLong(2)))
    graft.core.Caches.release()
    assert(p0.toMap != p1.toMap, "different epochs must be different permutations")
  }

  test("saveMerges/loadMerges roundtrips the learned table in order") {
    val merges = Seq(
      Bpe.Merge(1, "l", "o", "lo", 7),
      Bpe.Merge(2, "lo", "w", "low", 7),
      Bpe.Merge(3, "a", "a", "aa", 6))
    val dir = java.nio.file.Files.createTempDirectory("bpezone").toString
    try {
      Bpe.saveMerges(spark, merges, dir)
      assert(Bpe.loadMerges(spark, dir) == merges)
      // overwrite semantics: a re-fit replaces, never appends
      Bpe.saveMerges(spark, merges.take(2), dir)
      assert(Bpe.loadMerges(spark, dir) == merges.take(2))
    } finally graft.core.Fs.deleteRecursively(spark, dir)
  }

  test("epochPackedShuffle: pos matches epochShuffle; start_off is the pos-ordered token prefix sum") {
    val docs = (1L to 91L).map(i =>
      (i * 11L % 641L, Seq.fill((i % 5L).toInt + 1)(s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val n = docs.count()
    val sh = TrainingData.epochShuffle(docs, nEpochs = 2, knownCount = n)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    graft.core.Caches.release()
    val pk = TrainingData.epochPackedShuffle(docs, nEpochs = 2, knownCount = n)
      .collect()
    graft.core.Caches.release()
    assert(pk.length == sh.size)
    pk.foreach { r =>
      assert(r.getLong(2) == sh((r.getLong(0), r.getLong(1))),
        s"pos diverged from epochShuffle for (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // within each epoch the offsets must be the exact running token sum
    // in pos order, restarting at 0, with x12's seq bounds
    for (e <- 0 to 1) {
      var cum = 0L
      pk.filter(_.getLong(0) == e).sortBy(_.getLong(2)).foreach { r =>
        val (nTok, off) = (r.getLong(3), r.getLong(4))
        assert(off == cum, s"epoch $e pos ${r.getLong(2)}: off $off != cum $cum")
        assert(r.getLong(5) == off / 2048L)
        assert(r.getLong(6) ==
          (if (nTok == 0) off / 2048L else (off + nTok - 1) / 2048L))
        cum += nTok
      }
    }
  }

  test("fused multi-epoch shuffle equals the per-epoch seam") {
    val docs = (1L to 83L).map(i => (i * 7L % 509L, s"d$i")).toDF("doc_id", "text")
    val n = docs.count()
    val fused = TrainingData.epochShuffle(docs, nEpochs = 2, knownCount = n)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    graft.core.Caches.release()
    val perEpoch = (0 to 1).flatMap { e =>
      val m = TrainingData.epochPermutation(docs, e, n)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      graft.core.Caches.release()
      m
    }.toMap
    assert(fused == perEpoch)
  }
}
