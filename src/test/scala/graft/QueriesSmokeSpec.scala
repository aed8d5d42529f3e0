package graft

/** Every registered query must at least run end-to-end on the smallest
  * scale factor, and the flagship entry must return rows (the driver's t1
  * smoke).
  */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries twin") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("OPERATORS.md names only registered queries, and every query is documented") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("OPERATORS.md")))
    val mentioned = "`((?:q|x|d|m|r|c|s|st)\\d+_[a-z0-9_]+)`".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    val phantom = mentioned -- registered
    assert(phantom.isEmpty, s"documented but not registered: $phantom")
    val undocumented = registered -- mentioned
    assert(undocumented.isEmpty, s"registered but not in OPERATORS.md: $undocumented")
  }

  // Loop cores a DEDICATED suite already runs end-to-end at this same
  // SF in the same suite run (each 4-batch checkpointed loop costs
  // 70-100 s of fixed micro-batch floor — the round-15 suite-budget
  // lesson, so the suite runs each distinct core exactly once):
  // st25 ≡ SemanticLoopSpec's runSemanticAdmissionLoop, st29 ≡
  // LoopFixtures.unrefreshed (shared by ProductionPipelineSpec and
  // RefreshLoopSpec), st30 ≡ RefreshLoopSpec's refreshed run, c16 ≡
  // ReindexLoopSpec's reindexLoop, st32 ≡ TokenizerLoopSpec's two
  // runTokenizerLoop postures. st31 is NOT excluded — the five-gate
  // loop's only in-suite run is this smoke. The driver's Verify still
  // runs every registered entry (wrappers included) at sf0.01 each
  // round.
  private val coveredByDedicatedSuite = Set(
    "st25_stream_admission_loop", "st29_stream_production",
    "st30_stream_refresh_loop", "c16_reindex_loop",
    "st32_stream_tokenizer_loop")

  test("smoke exclusions are registered queries with dedicated suites") {
    assert(coveredByDedicatedSuite.subsetOf(SparkEntry.queries.keySet),
      "an excluded name is not a registered query — stale exclusion")
  }

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot(q => coveredByDedicatedSuite(q._1))
    .foreach { case (name, fn) =>
      test(s"$name runs on sf0.001") {
        val df = fn(spark, sf)
        assert(df.columns.nonEmpty)
        df.count() // materializes without throwing
      }
    }
}
