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

  test("feasibility extraction distinguishes missing-section NULL from zero-paragraph empty") {
    // the x28 chain over sf0.001: every doc_id%7 branch appears; the
    // reference's find_feasibility_details returns None only when the
    // dl or span is absent — a found span with no <p> joins to ''
    val out = TrainingData.x28ScrapeFeasibility(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toMap
    out.foreach { case (id, v) =>
      (id % 7) match {
        case 0 => assert(v == s"feas_${id % 71}_0\nfeas_${id % 71}_1")
        case 1 => assert(v == s"feas_${id % 71}_0")
        // the empty <p></p> contributes an empty joined line, exactly
        // as p.get_text(strip=True) feeds '\n'.join
        case 2 => assert(v == s"feas_${id % 71}_0\n\nfeas_${id % 71}_2")
        case 3 => assert(v == "", s"zero-paragraph span must join to '' (doc $id)")
        case _ => assert(v == null, s"missing dl/span must be NULL (doc $id)")
      }
    }
    assert(out.nonEmpty)
  }

  test("anchor href-or-text replays Python's falsy or: empty href falls to stripped text") {
    import spark.implicits._
    val cases = Seq(
      ("<a class=\"unfurl-url classic-link\" href=\"https://x.com\">text</a>", "https://x.com"),
      ("<a class=\"unfurl-url classic-link\">  spaced text  </a>", "spaced text"),
      // the quirk: href present but empty is falsy → get_text wins
      ("<a class=\"unfurl-url classic-link\" href=\"\">fallback</a>", "fallback"),
      // href and text both empty → '' (the reference returns '' or '')
      ("<a class=\"unfurl-url classic-link\" href=\"\"></a>", ""),
      ("<p>no anchor</p>", null))
    val got = cases.toDF("html", "want")
      .select(col("want"),
        TrainingData.anchorHrefOrText(col("html"), "unfurl-url classic-link").as("got"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1)))
    got.foreach { case (want, g) => assert(want == g, s"want=$want got=$g") }
  }

  test("PC applicant extraction: case-insensitive label contains-test, stripped sibling, None paths") {
    val out = TrainingData.x30ScrapeApplicantPc(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toMap
    out.foreach { case (id, v) =>
      (id % 6) match {
        case 0 | 1 | 2 => assert(v == s"pc_applicant_${id % 61}",
          s"doc $id branch ${id % 6}: got $v")
        case _ => assert(v == null,
          s"whitespace-sibling/wrong-label/no-h3 must be NULL (doc $id)")
      }
    }
    assert(out.nonEmpty)
  }

  test("x28/x29/x30 run as shuffle-free projections (plus the output sort)") {
    Seq(TrainingData.x28ScrapeFeasibility _,
        TrainingData.x29ScrapeLinks _,
        TrainingData.x30ScrapeApplicantPc _).foreach { q =>
      val p = q(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!p.contains("HashAggregate") && !p.contains("Join"), p)
      assert(!p.contains("Exchange hashpartitioning"), p)
    }
  }
}
