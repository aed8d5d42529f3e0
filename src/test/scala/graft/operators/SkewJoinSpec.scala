package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the unsalted result on a hot key") {
    import spark.implicits._
    // 5 ultra-hot keys over 10k fact rows — maximal skew.
    val fact = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"), col("value"))
    val dim = fact.select(col("event_type")).distinct()
      .withColumn("type_uc", upper(col("event_type")))

    val plain = fact.join(dim, Seq("event_type"))
      .orderBy("event_id").collect().toSeq
    val salted = SkewJoin.saltedJoin(fact, dim, "event_type", nSalts = 8)
      .select(col("event_type"), col("event_id"), col("value"), col("type_uc"))
      .orderBy("event_id").collect().toSeq

    val plainNorm = plain.map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
      r.getAs[Double]("value"), r.getAs[String]("type_uc")))
    val saltedNorm = salted.map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
      r.getAs[Double]("value"), r.getAs[String]("type_uc")))
    assert(saltedNorm == plainNorm)
  }

  test("salted join spreads a hot key across salt values") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (i.toLong, "hot")).toDF("id", "k")
    val dim = Seq(("hot", 1)).toDF("k", "attr")
    val salts = fact.withColumn("_salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(8L)))
      .select(countDistinct(col("_salt"))).head().getLong(0)
    assert(salts == 8) // content-derived salt actually uses all buckets
    assert(SkewJoin.saltedJoin(fact, dim, "k", 8).count() == 1000)
  }
}
