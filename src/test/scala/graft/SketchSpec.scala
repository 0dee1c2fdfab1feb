package graft

import org.apache.spark.sql.functions._
import graft.sketch.Sketches

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL aggregator: accurate approx-distinct, merge-correct across " +
       "partitions") {
    val df = spark.range(0, 100000).repartition(8)
      .select(concat(lit("key-"), pmod(col("id"), lit(5000))).as("k"))
    val est = df.agg(Sketches.hllDistinct(col("k"))).as[Long].head()
    assert(math.abs(est - 5000) < 5000 * 0.05, s"estimate $est")
  }

  test("HLL aggregator: nulls ignored, grouped aggregation") {
    val df = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", null),
      ("b", "z")).toDF("g", "v").repartition(4)
    val got = df.groupBy("g").agg(Sketches.hllDistinct(col("v")).as("d"))
      .orderBy("g").as[(String, Long)].collect()
    assert(got.toSeq == Seq(("a", 2L), ("b", 1L)))
  }

  test("t-digest aggregator: quantiles of a known distribution") {
    val df = spark.range(1, 100001).repartition(8)
      .select(col("id").cast("double").as("v"))
    val qs = df.agg(Sketches.tdigestQuantiles(col("v"),
      Seq(0.5, 0.95, 0.99))).as[Seq[Double]].head()
    assert(math.abs(qs(0) - 50000) < 2000)  // ~2% at the median
    assert(math.abs(qs(1) - 95000) < 1000)
    assert(math.abs(qs(2) - 99000) < 500)   // tails are tighter (t-digest)
  }

  test("sketches beat exact distinct on plan shape: partial aggregation, " +
       "single small-payload shuffle") {
    val df = spark.range(0, 1000)
      .select(concat(lit("k"), pmod(col("id"), lit(7))).as("g"),
        col("id").cast("string").as("v"))
    val plan = df.groupBy("g").agg(Sketches.hllDistinct(col("v")))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate with a partial stage before the exchange
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("Exchange") || plan.contains("ShuffleExchange"))
  }
}
