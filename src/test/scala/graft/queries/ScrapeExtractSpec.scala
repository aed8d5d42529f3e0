package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x26's extraction chain replayed against the reference docstring's
  * own examples (project_catalyst/get_github_profile.py:4-23) plus the
  * branch cases the fixture cycles through — including the reference's
  * scheme-prefix quirk, which must be reproduced, not fixed.
  */
class ScrapeExtractSpec extends SparkSpec {

  test("github-profile extraction matches the reference function case for case") {
    import spark.implicits._
    val cases = Seq(
      // the three docstring examples
      ("github.com/pacu/developer-portfolio", "pacu"),
      ("github.com/pacu", "pacu"),
      ("github.com/pacu/", "pacu"),
      // whitespace strips before everything else
      ("  github.com/pacu  ", "pacu"),
      // blank / whitespace-only → empty (the falsy guard)
      ("", ""),
      ("   ", ""),
      // no prefix match → first '/'-segment of the raw string: the
      // reference returns 'https:' here, quirk replayed verbatim
      ("https://github.com/pacu", "https:"),
      ("gitlab.com/pacu/x", "gitlab.com"),
      // prefix only → empty first segment
      ("github.com/", ""))
    val out = cases.toDF("url", "want")
      .select(col("want"), TrainingData.githubProfile(col("url")).as("got"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    out.foreach { case (want, got) => assert(want == got, s"want=$want got=$got") }
    // null input (the non-str guard) → empty string
    val n = Seq(Tuple1(Option.empty[String])).toDF("url")
      .select(TrainingData.githubProfile(col("url")).as("got"))
      .collect().head.getString(0)
    assert(n == "")
  }

  test("x26 runs as one shuffle-free projection (plus the output sort)") {
    val p = TrainingData.x26GithubProfile(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("HashAggregate") && !p.contains("Join"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("company extraction matches the reference function, fused-suffix quirk included") {
    import spark.implicits._
    val cases = Seq(
      // the reference file's own "totest" URLs
      ("https://github.com/Anastasia-Labs/", "github.com/Anastasia-Labs/"),
      ("https://www.scaleway.com/en/", "scaleway"),
      ("https://www.adapix.com.br/", "adapix"),
      // prefix order: https://www. wins before https://
      ("https://www.x.com", "x"),
      ("https://x.com", "x"),
      // suffix order is semantic: .co.jp/ and .co.jp precede .co/.jp
      ("https://foo.co.jp/", "foo"),
      ("https://foo.co.jp", "foo"),
      // the missing-comma quirk: '.xyz/' and bare '.earth' fused into
      // the dead entry '.xyz/.earth' — neither ever strips
      ("corp.xyz/", "corp.xyz/"),
      ("corp.earth", "corp.earth"),
      ("corp.xyz", "corp"),    // '.xyz' itself still works
      ("corp.earth/", "corp"), // as does '.earth/'
      // whitespace strips before everything; blank guard
      ("  https://corp.ai  ", "corp"),
      ("", ""),
      ("   ", ""))
    val out = cases.toDF("url", "want")
      .select(col("want"), TrainingData.extractCompany(col("url")).as("got"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    out.foreach { case (want, got) => assert(want == got, s"want=$want got=$got") }
    val n = Seq(Tuple1(Option.empty[String])).toDF("url")
      .select(TrainingData.extractCompany(col("url")).as("got"))
      .collect().head.getString(0)
    assert(n == "")
    // the replayed list must stay the reference's effective one: 55
    // arms with the fused entry present and its two halves absent
    assert(TrainingData.companySuffixes.size == 55)
    assert(TrainingData.companySuffixes.contains(".xyz/.earth"))
    assert(!TrainingData.companySuffixes.contains(".xyz/"))
    assert(!TrainingData.companySuffixes.contains(".earth"))
  }
}
