package graft

import graft.engine.Validator
import graft.sources.RecordTable

/** scratch: long-running validator loop for stack-sampling (not driver
  * contract). Runs forceAll passes until killed or maxPasses. */
object HotLoop {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val n = sys.env.getOrElse("SPARK_GRAFT_ROWS", "400000").toLong
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "12").toInt
    val records = RecordTable.synthesize(spark, n)
    (1 to passes).foreach { i =>
      val (_, sec) = Bench.time(Bench.forceAll(Validator.validate(records)))
      System.err.println(f"[hotloop] pass $i: $sec%.1fs (${n / sec}%.0f rows/s)")
    }
    spark.stop()
  }
}
