package graft

import org.apache.spark.sql.functions._

/** scratch: dump formatted physical plans for review (not driver contract) */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("8")
    val sf = "/root/testdata/sf0.01"
    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    show("q_broadcast_join")(SparkEntry.queries("q_broadcast_join")(spark, sf))
    show("q_anti_referential")(
      SparkEntry.queries("q_anti_referential")(spark, sf))
    show("q_uniqueness")(SparkEntry.queries("q_uniqueness")(spark, sf))
    show("pushdown-check: filter+project on lineitem")(
      spark.read.parquet(s"$sf/lineitem.parquet")
        .where(col("l_shipdate") > "1995-01-01" && col("l_quantity") > 40)
        .select("l_orderkey", "l_quantity"))
    show("validator-verdicts")(
      graft.engine.Validator.partitionVerdicts(
        graft.engine.Validator.validate(
          graft.sources.RecordTable.synthesize(spark, 100))))
    show("minhash-lsh")(graft.operators.Dedup.minhashLsh(
      spark.read.parquet(s"$sf/documents.parquet")))
    spark.stop()
  }
}
