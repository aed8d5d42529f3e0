package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the bigram-LM familiarity operator ([[TextOps.bigrams]] /
  * [[TextOps.bigramLm]] / [[TextOps.lmFamiliarity]]) against
  * hand-computed counts and scaled rationals, including the
  * short-document and unseen-head edge cases the x16 oracle also
  * exercises.
  */
class LmFamiliaritySpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "zeb"),
      (4L, ""),
      (5L, "the cat")).toDF("doc_id", "text")
  }

  test("bigrams: ordered pairs, sub-2-token documents excluded") {
    val bi = TextOps.bigrams(fixture, col("doc_id"), col("text"))
    val rows = bi.orderBy("doc_id", "w1", "w2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // doc 1: 5 bigrams, doc 2: 2, doc 5: 1; docs 3 and 4 contribute none
    assert(rows.count(_._1 == 1L) == 5)
    assert(rows.count(_._1 == 2L) == 2)
    assert(!rows.exists(r => r._1 == 3L || r._1 == 4L))
    assert(rows.filter(_._1 == 5L).toSeq == Seq((5L, "the", "cat")))
  }

  test("bigramLm: transitions pruned, heads and vocab from unpruned counts") {
    val lm = TextOps.bigramLm(
      TextOps.bigrams(fixture, col("doc_id"), col("text")), minCount = 2L)
    val model = lm.transitions.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // (the,cat) appears in docs 1,2,5; (cat,sat) in docs 1,2; singletons pruned
    assert(model == Map(("the", "cat") -> 3L, ("cat", "sat") -> 2L))
    val heads = lm.heads.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // c1 sums UNPRUNED counts: "the" heads (the,cat)x3 + (the,mat)x1
    assert(heads == Map("the" -> 4L, "cat" -> 2L, "sat" -> 1L, "on" -> 1L))
    assert(lm.vocab.collect().map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("lmFamiliarity: scaled rationals match hand computation") {
    val docs = fixture
    val bi = TextOps.bigrams(docs, col("doc_id"), col("text"))
    val out = TextOps.lmFamiliarity(docs, col("doc_id"), bi,
        TextOps.bigramLm(bi, minCount = 2L))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // p(the,cat)=(3+1)/(4+4)=.5  p(cat,sat)=(2+1)/(2+4)=.5
    // p(sat,on)=p(on,the)=1/5=.2  p(the,mat)=1/8=.125  (scale 1e9)
    assert(out.toSeq == Seq(
      (1L, 5L, 305000000L), // (500+500+200+200+125)M / 5
      (2L, 2L, 500000000L),
      (3L, 0L, 0L), // single token: no bigrams
      (4L, 0L, 0L), // empty text
      (5L, 1L, 500000000L)))
  }

  test("train and score corpora can differ; unseen heads fall back to c1=0") {
    import spark.implicits._
    val lm = TextOps.bigramLm(
      TextOps.bigrams(fixture, col("doc_id"), col("text")), minCount = 2L)
    val crawl = Seq((10L, "qux zap")).toDF("doc_id", "text")
    val out = TextOps.lmFamiliarity(crawl, col("doc_id"),
        TextOps.bigrams(crawl, col("doc_id"), col("text")), lm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // unseen head "qux": p = 1e9*(0+1)/(0+4) = 250000000
    assert(out.toSeq == Seq((10L, 1L, 250000000L)))
  }
}
