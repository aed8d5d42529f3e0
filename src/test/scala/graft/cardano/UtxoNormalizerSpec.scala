package graft.cardano

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** T4 normalization against the reference's canonical fixture
  * (FIXTURES.md §4; `unit_tests/src/dto/test_cardano_tx_utxo_dto.py`):
  * one doc with a 2-asset input and a datum-bearing output must yield
  * 1 utxo / 1 input / 2 input_amounts / 1 output / 1 output_amount with
  * exact values, deterministic ids, and parent_id integrity.
  */
class UtxoNormalizerSpec extends SparkSpec {

  private val fixture =
    """{"hash": "e68aee4ca7d0993c1f06eb3024d53b1fb34ca79663814bd9b86666a1d0ec8d7f",
      |"inputs": [{
      |  "address": "addr1q93l79hdpvaeqnnmdkshmr4mpjvxnacqxs967keht465tt2dn0z9uhgereqgjsw33ka6c8tu5um7hqsnf5fd50fge9gq4lu2ql",
      |  "amount": [
      |    {"unit": "lovelace", "quantity": "2000000"},
      |    {"unit": "29d222ce763455e3d7a09a665ce554f00ac89d2e99a1a83d267170c64d494e",
      |     "quantity": "50000000000"}],
      |  "tx_hash": "1a689447f5d8b770a7da5c8b6a7ca224ae83dae3ed746d839dc379eeaef06f14",
      |  "output_index": 1, "data_hash": null, "inline_datum": null,
      |  "reference_script_hash": null, "collateral": false}],
      |"outputs": [{
      |  "address": "addr1w8p79rpkcdz8x9d6tft0x0dx5mwuzac2sa4gm8cvkw5hcnqst2ctf",
      |  "amount": [{"unit": "lovelace", "quantity": "682590846"}],
      |  "output_index": 0,
      |  "data_hash": "8829fad87e1064de529788f5f2ac69604096e43cb8223aaf90edbbab91662408",
      |  "inline_datum": "d8799fff", "collateral": false,
      |  "reference_script_hash": null,
      |  "consumed_by_tx": "df4cfde288ad2d6f250da775404da97a0f43167fd858b1731d865bd7ab160bf5"}]}"""
      .stripMargin.replace("\n", " ")

  private def rawDoc = {
    import spark.implicits._
    spark.read.schema(Schemas.rawTxUtxo).json(Seq(fixture).toDS)
  }

  test("one nested doc explodes into the five expected frames") {
    val t = Transforms.normalizeUtxo(rawDoc)
    assert(t.utxo.count() == 1)
    assert(t.inputs.count() == 1)
    assert(t.inputAmounts.count() == 2)
    assert(t.outputs.count() == 1)
    assert(t.outputAmounts.count() == 1)
  }

  test("field-exact values incl. string-decimal fidelity") {
    val t = Transforms.normalizeUtxo(rawDoc)
    val in = t.inputs.head()
    assert(in.getAs[String]("hash") ==
      "e68aee4ca7d0993c1f06eb3024d53b1fb34ca79663814bd9b86666a1d0ec8d7f")
    assert(in.getAs[String]("tx_utxo_hash") ==
      "1a689447f5d8b770a7da5c8b6a7ca224ae83dae3ed746d839dc379eeaef06f14")
    assert(in.getAs[Long]("output_index") == 1L)
    assert(!in.getAs[Boolean]("collateral"))

    val amts = t.inputAmounts.orderBy(col("unit")).collect()
    assert(amts(1).getAs[String]("unit") == "lovelace")
    assert(amts(1).getAs[java.math.BigDecimal]("quantity")
      .compareTo(new java.math.BigDecimal("2000000")) == 0)
    assert(amts(0).getAs[java.math.BigDecimal]("quantity")
      .compareTo(new java.math.BigDecimal("50000000000")) == 0)

    val out = t.outputs.head()
    assert(out.getAs[String]("data_hash") ==
      "8829fad87e1064de529788f5f2ac69604096e43cb8223aaf90edbbab91662408")
    assert(out.getAs[String]("consumed_by_tx") ==
      "df4cfde288ad2d6f250da775404da97a0f43167fd858b1731d865bd7ab160bf5")
  }

  test("surrogate ids are deterministic across replays (not uuid4)") {
    val a = Transforms.normalizeUtxo(rawDoc).inputs.select("id").head().getString(0)
    val b = Transforms.normalizeUtxo(rawDoc).inputs.select("id").head().getString(0)
    assert(a == b)
    assert(a.length == 64) // sha2-256 hex
  }

  test("parent_id referential integrity holds for every amount row") {
    val t = Transforms.normalizeUtxo(rawDoc)
    val orphanIn = t.inputAmounts
      .join(t.inputs.select(col("id")), t.inputAmounts("parent_id") === t.inputs("id"), "left_anti")
    val orphanOut = t.outputAmounts
      .join(t.outputs.select(col("id")), t.outputAmounts("parent_id") === t.outputs("id"), "left_anti")
    assert(orphanIn.count() == 0)
    assert(orphanOut.count() == 0)
  }

  test("amount-count conservation over a varied synthetic corpus") {
    import spark.implicits._
    val backend = new BlockfrostSource.FixtureBackend
    val hashes = (0 until 40).map(i =>
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"doc:$i".getBytes).map("%02x".format(_)).mkString)
    val docs = spark.read.schema(Schemas.rawTxUtxo)
      .json(hashes.flatMap(backend.txUtxo).toDS)
    val expectedInAmts = docs
      .select(explode(col("inputs")).as("in"))
      .select(size(col("in.amount")).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    val t = Transforms.normalizeUtxo(docs)
    assert(t.inputAmounts.count() == expectedInAmts)
    assert(t.utxo.count() == 40)
  }
}
