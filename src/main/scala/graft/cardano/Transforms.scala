package graft.cardano

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw→DTO projections (reference T1-T3) and the UTXO normalization
  * pipeline (T4, the flagship transform).
  *
  * Everything here is a narrow projection / generate — zero shuffles. At
  * 100 TB these run embarrassingly parallel over whatever partitioning
  * the raw zone has; Catalyst prunes unread raw columns out of the scan.
  */
object Transforms {

  import Schemas.lovelace

  private def ts(unixSeconds: Column): Column = timestamp_seconds(unixSeconds)

  /** Deterministic surrogate key: sha2 over the natural coordinates of
    * the row. Replaces the reference's random uuid4
    * (`cardano_transactions_utxo_dto.py:61-65`) so that re-running a
    * batch reproduces identical ids and the PK-merge dedups replays
    * (SURVEY §7.3/§7.4 exactly-once under task retry).
    */
  def surrogateId(parts: Column*): Column =
    sha2(concat_ws("\u0000", parts: _*), 256)

  /** T1: raw block → cardano_blocks DTO row
    * (database_transfer_objects/cardano_blocks.py:31-54): unix→timestamp,
    * string-amount→Decimal(38,0), append created_at.
    */
  def blockDto(raw: DataFrame, loadTime: Column = current_timestamp()): DataFrame =
    raw.select(
      ts(col("time")).as("time"),
      col("height"), col("hash"), col("slot"), col("epoch"), col("epoch_slot"),
      col("slot_leader"), col("size"), col("tx_count"),
      col("output").cast(lovelace).as("output"),
      col("fees").cast(lovelace).as("fees"),
      col("block_vrf"), col("op_cert"), col("op_cert_counter"),
      col("previous_block"), col("next_block"), col("confirmations"),
      loadTime.as("created_at"))

  /** T3: raw block-txs → cardano_block_transactions DTO
    * (cardano_block_transactions.py:15-23): rename block_height→block,
    * keep the hash array intact, append created_at.
    */
  def blockTransactionsDto(raw: DataFrame, loadTime: Column = current_timestamp()): DataFrame =
    raw.select(
      col("block_height").as("block"),
      col("tx_hash"),
      loadTime.as("created_at"))

  /** T2: raw tx → cardano_transactions DTO (cardano_transactions.py:35-62):
    * drops nested output_amount, casts amounts, unix→timestamp.
    */
  def transactionDto(raw: DataFrame, loadTime: Column = current_timestamp()): DataFrame =
    raw.select(
      col("hash"), col("block"), col("block_height"),
      ts(col("block_time")).as("block_time"),
      col("slot"), col("index"),
      col("fees").cast(lovelace).as("fees"),
      col("deposit").cast(lovelace).as("deposit"),
      col("size"), col("invalid_before"), col("invalid_hereafter"),
      col("utxo_count"), col("withdrawal_count"), col("mir_cert_count"),
      col("delegation_count"), col("stake_cert_count"), col("pool_update_count"),
      col("pool_retire_count"), col("asset_mint_or_burn_count"),
      col("redeemer_count"), col("valid_contract"),
      loadTime.as("created_at"))

  /** T2b: raw tx → cardano_tx_output_amount rows — the reference's
    * LAST unported entity, which it shipped broken: the table is
    * declared (cardano_tables.py:101-119) but its DTO reads fields
    * that do not exist on the raw model
    * (cardano_transactions_output_amount.py:22-23 reads `input.unit`
    * where the raw transaction carries a nested `output_amount` ARRAY
    * — raw_cardano_transactions.py:10-44) and no pipeline loads it.
    * Completed the way the data intends: posexplode the array, one row
    * per (tx, position), deterministic sha2 id over (hash, position)
    * in place of the reference's uuid4 (the [[surrogateId]] replay
    * discipline), Decimal(38,0) quantities. A null/absent array yields
    * zero rows (explode, not a null row).
    */
  def transactionOutputAmountDto(raw: DataFrame,
      loadTime: Column = current_timestamp()): DataFrame =
    raw
      .select(col("hash"), posexplode(col("output_amount")).as(Seq("pos", "amt")))
      .select(
        surrogateId(col("hash"), lit("outamt"), col("pos")).as("id"),
        col("hash"),
        col("amt.unit").as("unit"),
        col("amt.quantity").cast(lovelace).as("quantity"),
        loadTime.as("created_at"))

  /** T4: one nested UTXO doc → the five flat tables
    * (cardano_transactions_utxo_dto.py:56-121,
    * transform_cardano_tx_utxo_dto_to_df.py:21-98).
    *
    * Pure posexplode+project pipeline: parent ids are
    * sha2(tx-hash, side, position); child amount ids chain the parent id
    * with the amount position, so `parent_id` referential integrity holds
    * by construction on every replay.
    */
  case class UtxoTables(
      utxo: DataFrame,
      inputs: DataFrame,
      inputAmounts: DataFrame,
      outputs: DataFrame,
      outputAmounts: DataFrame)

  def normalizeUtxo(raw: DataFrame, loadTime: Column = current_timestamp()): UtxoTables = {
    val utxo = raw.select(col("hash"), loadTime.as("created_at"))

    val in = raw
      .select(col("hash"), posexplode(col("inputs")).as(Seq("pos", "in")))
      .select(
        surrogateId(col("hash"), lit("in"), col("pos")).as("id"),
        col("hash"),
        col("in.address").as("address"),
        col("in.tx_hash").as("tx_utxo_hash"),
        col("in.output_index").as("output_index"),
        col("in.data_hash").as("data_hash"),
        col("in.inline_datum").as("inline_datum"),
        col("in.reference_script_hash").as("reference_script_hash"),
        col("in.collateral").as("collateral"),
        col("in.reference").as("reference"),
        col("in.amount").as("amount"),
        loadTime.as("created_at"))

    val inAmt = in
      .select(col("id").as("parent_id"), posexplode(col("amount")).as(Seq("apos", "amt")),
        col("created_at"))
      .select(
        surrogateId(col("parent_id"), lit("amt"), col("apos")).as("id"),
        col("parent_id"),
        col("amt.unit").as("unit"),
        col("amt.quantity").cast(lovelace).as("quantity"),
        col("created_at"))

    val out = raw
      .select(col("hash"), posexplode(col("outputs")).as(Seq("pos", "out")))
      .select(
        surrogateId(col("hash"), lit("out"), col("pos")).as("id"),
        col("hash"),
        col("out.address").as("address"),
        col("out.output_index").as("output_index"),
        col("out.data_hash").as("data_hash"),
        col("out.inline_datum").as("inline_datum"),
        col("out.collateral").as("collateral"),
        col("out.reference_script_hash").as("reference_script_hash"),
        col("out.consumed_by_tx").as("consumed_by_tx"),
        col("out.amount").as("amount"),
        loadTime.as("created_at"))

    val outAmt = out
      .select(col("id").as("parent_id"), posexplode(col("amount")).as(Seq("apos", "amt")),
        col("created_at"))
      .select(
        surrogateId(col("parent_id"), lit("amt"), col("apos")).as("id"),
        col("parent_id"),
        col("amt.unit").as("unit"),
        col("amt.quantity").cast(lovelace).as("quantity"),
        col("created_at"))

    UtxoTables(utxo, in.drop("amount"), inAmt, out.drop("amount"), outAmt)
  }

  /** Chain-linkage validation (SURVEY §2.5): derive previous/next block
    * hashes and compare with the API-delivered linkage.
    *
    * Implemented as equi-self-joins on `height ± 1`, NOT a
    * lag/lead window over an unpartitioned `ORDER BY height` — a global
    * window funnels every block through ONE task (the one place a chain
    * validator must not serialize at 100 TB), while the self-join
    * hash-partitions on height and stays fully parallel (AQE-planned).
    * Block heights are consecutive by construction (the chain), which is
    * exactly what makes the adjacency an equi-join.
    */
  def validateChainLinkage(blocks: DataFrame): DataFrame = {
    val base = blocks.select(col("height"), col("hash"), col("previous_block"), col("next_block"))
    // Chain bounds (two scalar aggregates over a pushed-down 1-column
    // scan): a null join result is legitimate ONLY at the chain ends —
    // anywhere else it means the neighbor block is MISSING from the
    // loaded chain, which is exactly what an integrity audit must flag
    // (an unguarded null-tolerant rule would validate ingestion holes).
    val bounds = base.agg(min(col("height")), max(col("height"))).head()
    if (bounds.isNullAt(0))
      return base
        .withColumn("derived_prev", lit(null).cast("string"))
        .withColumn("derived_next", lit(null).cast("string"))
        .withColumn("prev_ok", lit(true))
        .withColumn("next_ok", lit(true))
    val (minH, maxH) = (bounds.getLong(0), bounds.getLong(1))
    val prev = base.select((col("height") + 1).as("height"), col("hash").as("derived_prev"))
    val next = base.select((col("height") - 1).as("height"), col("hash").as("derived_next"))
    base
      .join(prev, Seq("height"), "left")
      .join(next, Seq("height"), "left")
      .withColumn("prev_ok",
        when(col("height") === minH, lit(true))
          .otherwise(col("derived_prev").isNotNull &&
            (col("previous_block").isNull || col("previous_block") === col("derived_prev"))))
      .withColumn("next_ok",
        when(col("height") === maxH, lit(true))
          .otherwise(col("derived_next").isNotNull &&
            (col("next_block").isNull || col("next_block") === col("derived_next"))))
  }
}
