package graft.cardano

import graft.SparkSpec

class BlockfrostSourceSpec extends SparkSpec {

  test("fixture backend fetch parses into the declared block schema") {
    import spark.implicits._
    val heights = spark.range(10, 20).map(java.lang.Long.valueOf(_))
    val blocks = BlockfrostSource.fetchBlocks(heights, new BlockfrostSource.FixtureBackend)
    // from_json yields all-nullable fields; compare names + types.
    assert(blocks.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Schemas.rawBlock.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(blocks.count() == 10)
    val h15 = blocks.filter(org.apache.spark.sql.functions.col("height") === 15).head()
    assert(h15.getAs[String]("hash").length == 64)
    assert(h15.getAs[Long]("tx_count") == 15 % 3)
  }

  test("chain linkage is consistent in the fixture backend") {
    import spark.implicits._
    val heights = spark.range(5, 8).map(java.lang.Long.valueOf(_))
    val blocks = BlockfrostSource.fetchBlocks(heights, new BlockfrostSource.FixtureBackend)
      .orderBy("height").collect()
    assert(blocks(1).getAs[String]("previous_block") == blocks(0).getAs[String]("hash"))
    assert(blocks(1).getAs[String]("next_block") == blocks(2).getAs[String]("hash"))
  }

  test("withRetry retries transient failures then succeeds") {
    var calls = 0
    val out = BlockfrostSource.withRetry(attempts = 5, baseDelayMs = 1) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(out == 42 && calls == 3)
  }

  test("withRetry exhausts attempts and rethrows") {
    var calls = 0
    val e = intercept[RuntimeException] {
      BlockfrostSource.withRetry(attempts = 4, baseDelayMs = 1) {
        calls += 1
        throw new RuntimeException("permanent")
      }
    }
    assert(e.getMessage == "permanent" && calls == 4)
  }

  test("rate limiter paces calls within a partition") {
    val rl = new BlockfrostSource.RateLimiter(100) // 10ms interval
    val t0 = System.nanoTime()
    (1 to 5).foreach(_ => rl.acquire())
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(elapsedMs >= 35) // 4 paced gaps of ~10ms after the first call
  }
}
