package graft.cardano

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end offline backfill (EP1+EP2 over the deterministic fixture
  * chain) + the reference's analytics queries over the loaded tables.
  */
class PipelinesSpec extends SparkSpec {

  private lazy val root = tmpDir("backfill")
  private lazy val pipelines = {
    val lake = new Lake(spark, s"$root/lake")
    val wm = new Watermarks(spark, s"$root/status")
    new Pipelines(spark, lake, s"$root/warehouse", wm,
      new BlockfrostSource.FixtureBackend, batchSize = 25)
  }

  test("full backfill loads all eight tables consistently") {
    pipelines.runFull(1, 60)

    val blocks = pipelines.readTable("cardano_blocks")
    assert(blocks.count() == 60)
    val blockTx = pipelines.readTable("cardano_block_transactions")
    assert(blockTx.count() == 60)

    // Fan-out integrity: every tx hash in block_tx landed in transactions.
    val expectedTxs = blockTx.select(explode(col("tx_hash")).as("h")).distinct().count()
    val txs = pipelines.readTable("cardano_transactions")
    assert(txs.count() == expectedTxs)

    // Every loaded tx has exactly one UTXO parent row (fixture: 1 doc per tx).
    val utxo = pipelines.readTable("cardano_tx_utxo")
    assert(utxo.count() == txs.count())

    // The sixth entity: one output_amount row per tx (fixture carries a
    // single lovelace amount), every row keyed to a loaded transaction.
    val outAmt = pipelines.readTable("cardano_tx_output_amount")
    assert(outAmt.count() == txs.count())
    assert(outAmt.join(txs.select(col("hash")), Seq("hash"), "left_anti").count() == 0)
    // ids are deterministic sha2, so the PK merge can dedup replays
    assert(outAmt.select(col("id")).distinct().count() == outAmt.count())

    // FK integrity across the five UTXO tables.
    val in = pipelines.readTable("cardano_tx_utxo_input")
    val inAmt = pipelines.readTable("cardano_tx_utxo_input_amount")
    assert(inAmt.join(in.select(col("id")),
      inAmt("parent_id") === in("id"), "left_anti").count() == 0)
  }

  test("re-running the full backfill is a no-op (watermarks + PK merge)") {
    pipelines.runFull(1, 60) // ensure loaded
    val counts = Seq("cardano_blocks", "cardano_transactions", "cardano_tx_utxo_input_amount")
      .map(t => t -> pipelines.readTable(t).count()).toMap
    pipelines.runFull(1, 60)
    counts.foreach { case (t, n) =>
      assert(pipelines.readTable(t).count() == n, s"table $t grew on re-run")
    }
  }

  test("incremental extension loads only the new range") {
    pipelines.runFull(1, 60)
    val before = pipelines.readTable("cardano_blocks").count()
    pipelines.runFull(1, 80)
    assert(pipelines.readTable("cardano_blocks").count() == before + 20)
  }

  test("analytics Q6/Q7/Q8 run over the loaded tables") {
    pipelines.runFull(1, 60)
    val in = pipelines.readTable("cardano_tx_utxo_input")
    val inAmt = pipelines.readTable("cardano_tx_utxo_input_amount")
    val txs = pipelines.readTable("cardano_transactions")

    val q6 = Analytics.topProtocolsByTxCount(in)
    assert(q6.columns.toSeq == Seq("reference_script_hash", "tx_count"))
    q6.collect() // materializes without error; fixture plants some script hashes
    assert(q6.count() >= 0)

    val q7 = Analytics.txMissingUtxo(txs, in)
    assert(q7.count() == 0) // backfill loaded UTXOs for every tx

    val q8 = Analytics.topProtocolsByVolume(in, inAmt)
    val vols = q8.collect()
    // Exact expected aggregates of the deterministic fixture chain,
    // independently derivable: n = int(txhash[12:24],16); inputs with
    // n%5==0 contribute n%2000000 lovelace to "script"+(n%7). By this
    // point the suite has extended the shared warehouse to heights 1-80
    // (the incremental test), so these are the 1-80 constants; the
    // c1_cardano_backfill_q8 driver oracle pins the fresh 1-60 run.
    val expected = Seq(
      ("script5", 6828410L), ("script1", 5937010L), ("script6", 2478630L),
      ("script2", 1763895L), ("script0", 1354600L), ("script3", 945860L),
      ("script4", 426475L))
    assert(vols.map(r => (r.getString(0),
      r.getAs[java.math.BigDecimal]("volume").longValueExact())).toSeq == expected)
  }

  test("per-batch loads read only that batch's raw dir, and record file-load watermarks") {
    import spark.implicits._
    val r = tmpDir("batchiso")
    val lake = new Lake(spark, s"$r/lake")
    val wm = new Watermarks(spark, s"$r/status")
    val p = new Pipelines(spark, lake, s"$r/warehouse", wm,
      new BlockfrostSource.FixtureBackend, batchSize = 25)
    // Poison the raw zone with a stale batch dir whose row overlaps the
    // height range but carries a bogus hash. A whole-zone glob (the
    // O(B²) re-scan) would pick it up; the per-batch read must not.
    lake.writeRawJson(Seq((5L, "bogus")).toDF("height", "hash"), "blocks", 999999L)
    p.runBlocks(1, 60)
    val blocks = p.readTable("cardano_blocks")
    assert(blocks.count() == 60)
    assert(blocks.filter(col("hash") === "bogus").count() == 0)
    // K4/Q2 wiring: every batch load recorded a lake→warehouse watermark.
    assert(wm.latestLoadedFileDate("cardano_blocks").isDefined)
  }

  test("chain-linkage validation agrees with the fixture chain") {
    pipelines.runFull(1, 60)
    val v = Transforms.validateChainLinkage(pipelines.readTable("cardano_blocks"))
    assert(v.filter(!col("prev_ok") || !col("next_ok")).count() == 0)
  }

  test("chain-linkage validation flags MISSING blocks, not just wrong hashes") {
    import spark.implicits._
    // heights 1,2,4,5 — block 3 is an ingestion hole. Both neighbors of
    // the hole must be flagged (2's next and 4's prev are underivable);
    // the true chain ends (1, 5) stay valid.
    def h(n: Long) = s"hash$n"
    val blocks = Seq(
      (1L, h(1), null.asInstanceOf[String], h(2)),
      (2L, h(2), h(1), h(3)),
      (4L, h(4), h(3), h(5)),
      (5L, h(5), h(4), null.asInstanceOf[String]))
      .toDF("height", "hash", "previous_block", "next_block")
    val v = Transforms.validateChainLinkage(blocks)
      .select("height", "prev_ok", "next_ok")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(v(1L) == ((true, true)))
    assert(v(2L) == ((true, false))) // next block 3 missing
    assert(v(4L) == ((false, true))) // prev block 3 missing
    assert(v(5L) == ((true, true)))
  }
}
