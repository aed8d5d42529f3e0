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

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // materializes without throwing
    }
  }
}
