package graft.cardano

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants of the T4 normalization (SURVEY §5's test
  * plan): over arbitrary nested UTXO docs —
  *  - row conservation: exploded child counts equal nested element counts;
  *  - value conservation: decimal quantities survive exactly (sum of
  *    parsed BigDecimals equals sum of the Decimal column);
  *  - referential integrity: every amount row's parent_id exists;
  *  - replay determinism: ids identical across runs.
  */
class UtxoPropertySpec extends SparkSpec {

  private val hexChar = Gen.oneOf(("0123456789abcdef": Seq[Char]))
  private def hexStr(n: Int) = Gen.listOfN(n, hexChar).map(_.mkString)

  // Quantities up to 30 digits: single values can use the full
  // Numeric(38,0) envelope (see the dedicated test below), but SUMS over
  // decimal(38,0) keep precision 38, so a conservation check over many
  // near-envelope values would overflow by construction (real chain
  // amounts are <= ~1e17).
  private val amountGen = for {
    unit <- Gen.oneOf(Gen.const("lovelace"), hexStr(56))
    digits <- Gen.chooseNum(1, 30)
    q <- Gen.listOfN(digits, Gen.numChar).map(_.mkString.replaceFirst("^0+(?=.)", ""))
  } yield s"""{"unit": "$unit", "quantity": "$q"}"""

  private val inputGen = for {
    addr <- hexStr(20)
    amts <- Gen.nonEmptyListOf(amountGen).map(_.take(4))
    srcTx <- hexStr(64)
    idx <- Gen.chooseNum(0, 10)
    collateral <- Gen.oneOf(true, false)
  } yield s"""{"address": "addr_$addr", "amount": [${amts.mkString(",")}],
              |"tx_hash": "$srcTx", "output_index": $idx, "data_hash": null,
              |"inline_datum": null, "reference_script_hash": null,
              |"collateral": $collateral}""".stripMargin.replace("\n", " ")

  private val outputGen = for {
    addr <- hexStr(20)
    amts <- Gen.nonEmptyListOf(amountGen).map(_.take(3))
    idx <- Gen.chooseNum(0, 10)
  } yield s"""{"address": "addr_$addr", "amount": [${amts.mkString(",")}],
              |"output_index": $idx, "data_hash": null, "inline_datum": null,
              |"collateral": false, "reference_script_hash": null,
              |"consumed_by_tx": null}""".stripMargin.replace("\n", " ")

  private val docGen = for {
    hash <- hexStr(64)
    ins <- Gen.nonEmptyListOf(inputGen).map(_.take(3))
    outs <- Gen.nonEmptyListOf(outputGen).map(_.take(3))
  } yield s"""{"hash": "$hash", "inputs": [${ins.mkString(",")}], "outputs": [${outs.mkString(",")}]}"""

  private def parse(docs: List[String]) = {
    import spark.implicits._
    spark.read.schema(Schemas.rawTxUtxo).json(docs.toDS)
  }

  test("normalization invariants hold for arbitrary nested docs") {
    val gen = Gen.nonEmptyListOf(docGen).map(_.take(8))
    val params = Gen.Parameters.default.withSize(10)
    (1 to 15).foreach { trial =>
      val docs = gen.pureApply(params, Seed(42L + trial))
      val raw = parse(docs)
      val t = Transforms.normalizeUtxo(raw)

      // row conservation
      val nDocs = raw.count()
      assert(t.utxo.count() == nDocs)
      val nIns = raw.select(explode(col("inputs"))).count()
      assert(t.inputs.count() == nIns)
      val nInAmts = raw.select(explode(col("inputs")).as("i"))
        .select(explode(col("i.amount"))).count()
      assert(t.inputAmounts.count() == nInAmts)

      // exact decimal value conservation (string -> Decimal(38,0))
      val rawSum = raw.select(explode(col("inputs")).as("i"))
        .select(explode(col("i.amount")).as("a"))
        .select(sum(col("a.quantity").cast(Schemas.lovelace)).as("s"))
        .head().getDecimal(0)
      val dtoSum = t.inputAmounts.select(sum(col("quantity")).as("s")).head().getDecimal(0)
      assert(rawSum.compareTo(dtoSum) == 0)

      // referential integrity
      assert(t.inputAmounts.join(t.inputs.select(col("id")),
        t.inputAmounts("parent_id") === t.inputs("id"), "left_anti").count() == 0)
      assert(t.outputAmounts.join(t.outputs.select(col("id")),
        t.outputAmounts("parent_id") === t.outputs("id"), "left_anti").count() == 0)

      // replay determinism
      val ids1 = t.inputs.select("id").orderBy("id").collect().map(_.getString(0)).toSeq
      val ids2 = Transforms.normalizeUtxo(raw).inputs
        .select("id").orderBy("id").collect().map(_.getString(0)).toSeq
      assert(ids1 == ids2, s"trial $trial: ids not deterministic")
    }
  }

  test("a full 38-digit Numeric(38,0) quantity round-trips exactly") {
    val q38 = "9" * 38
    val doc =
      s"""{"hash": "${"ab" * 32}",
         |"inputs": [{"address": "a", "amount": [{"unit": "lovelace", "quantity": "$q38"}],
         |  "tx_hash": "${"cd" * 32}", "output_index": 0, "data_hash": null,
         |  "inline_datum": null, "reference_script_hash": null, "collateral": false}],
         |"outputs": []}""".stripMargin.replace("\n", " ")
    val t = Transforms.normalizeUtxo(parse(List(doc)))
    val got = t.inputAmounts.head().getAs[java.math.BigDecimal]("quantity")
    assert(got.compareTo(new java.math.BigDecimal(q38)) == 0)
  }
}
