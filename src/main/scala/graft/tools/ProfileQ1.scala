package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev-only: isolate q1's slowness — filter vs decimal-agg vs double-agg. */
object ProfileQ1 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", sys.env.getOrElse("ANSI", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f  rows=$n")
      }
    }
    println(s"partitions=${li.rdd.getNumPartitions}")
    time("count_only") { li.count() }
    time("filter_count") {
      li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp")).count()
    }
    time("double_agg") {
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity"), sum($"l_extendedprice"), count(lit(1))).count()
    }
    time("decimal_agg") {
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity".cast(DecimalType(18, 2))),
          sum($"l_extendedprice".cast(DecimalType(18, 2))), count(lit(1))).count()
    }
    time("decimal_mult_agg") {
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_extendedprice".cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - $"l_discount".cast(DecimalType(18, 2))))).count()
    }
    spark.stop()
  }
}
