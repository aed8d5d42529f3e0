package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.cardano.BlockfrostSource

/** DataSource V2 surface: partition planning over the height range,
  * schema-first parse to InternalRow, REAL column pruning, and parity
  * with the mapPartitions fan-out path.
  */
class BlockfrostDataSourceSpec extends SparkSpec {

  test("format(\"blockfrost\") rows equal the mapPartitions path (blocks)") {
    import spark.implicits._
    val viaDs = spark.read.format("blockfrost")
      .option("entity", "blocks").option("start", "1").option("end", "40")
      .option("numPartitions", "4")
      .load()
    val viaMp = BlockfrostSource.fetchBlocks(
      (1L to 40L).toDS().map(java.lang.Long.valueOf(_)),
      new BlockfrostSource.FixtureBackend)
    assert(viaDs.count() == 40)
    assert(viaDs.collect().map(_.toString).sorted
      .sameElements(viaMp.collect().map(_.toString).sorted))
  }

  test("block_tx entity serves the array column; height range is partition-planned") {
    val df = spark.read.format("blockfrost")
      .option("entity", "block_tx").option("start", "1").option("end", "30")
      .option("numPartitions", "8")
      .load()
    assert(df.rdd.getNumPartitions == 8)
    val total = df.select(sum(size(col("tx_hash")))).head().getLong(0)
    // fixture: block h has h % 3 transactions
    assert(total == (1L to 30L).map(_ % 3).sum)
  }

  test("column pruning reaches the source (ReadSchema shows only projected fields)") {
    val df = spark.read.format("blockfrost")
      .option("entity", "blocks").option("start", "1").option("end", "10")
      .load()
      .select(col("height"), col("hash"))
    val scanSchema = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.readSchema()
    }
    assert(scanSchema.map(_.fieldNames.toSeq).contains(Seq("height", "hash")),
      s"expected pruned scan schema, got $scanSchema")
    assert(df.count() == 10)
  }

  test("height filters narrow the fan-out range BEFORE partitions are planned") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    // For an API source, pushdown bounds the number of HTTP calls made —
    // the filtered read must plan partitions over [10, 14] only, even
    // though the configured range is [1, 1000].
    val df = spark.read.format("blockfrost")
      .option("entity", "blocks").option("start", "1").option("end", "1000")
      .option("numPartitions", "4")
      .load()
      .filter(col("height") >= 10 && col("height") <= 14)
    val parts = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.inputPartitions
    }.get
    val ranges = parts.map(_.asInstanceOf[HeightRangePartition])
    assert(ranges.map(_.from).min == 10L && ranges.map(_.to).max == 14L,
      s"fan-out range not narrowed: $ranges")
    assert(df.select("height").collect().map(_.getLong(0)).sorted.sameElements(10L to 14L))
    // a filter-empty range is a zero-row scan, not an error
    val empty = spark.read.format("blockfrost")
      .option("entity", "blocks").option("start", "1").option("end", "1000")
      .load()
      .filter(col("height") > 50 && col("height") < 40)
    assert(empty.count() == 0)
  }

  test("uneven ranges split without loss; single-height range works") {
    val df = spark.read.format("blockfrost")
      .option("entity", "blocks").option("start", "5").option("end", "5")
      .option("numPartitions", "8")
      .load()
    assert(df.select("height").head().getLong(0) == 5L)
    val df2 = spark.read.format("blockfrost")
      .option("entity", "blocks").option("start", "1").option("end", "7")
      .option("numPartitions", "3")
      .load()
    assert(df2.select("height").collect().map(_.getLong(0)).sorted.sameElements(1L to 7L))
  }
}
