package graft

import graft.engine.Validator
import graft.sources.RecordTable

/** scratch: driver-side planning cost of the validator actions (not
  * driver contract) — how much of each bench pass is analysis/
  * optimization/physical planning vs execution. */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val n = sys.env.getOrElse("SPARK_GRAFT_ROWS", "200000").toLong
    val records = RecordTable.synthesize(spark, n)
    (1 to 8).foreach { i =>
      val (_, tPlanV) = Bench.time {
        Validator.violations(Validator.validate(records))
          .queryExecution.executedPlan
      }
      val (_, tPlanP) = Bench.time {
        Validator.partitionVerdicts(Validator.validate(records))
          .queryExecution.executedPlan
      }
      val (_, tFull) = Bench.time(Bench.forceAll(Validator.validate(records)))
      System.err.println(f"[plantime] #$i violations-plan $tPlanV%.2fs " +
        f"verdicts-plan $tPlanP%.2fs full-pass $tFull%.2fs")
    }
    // per-rule planning time attribution (driver): top Catalyst rules by
    // cumulative wall time for one verdicts planning run
    val qe = Validator.partitionVerdicts(Validator.validate(records))
      .queryExecution
    qe.executedPlan
    val rules = qe.tracker.rules.toSeq
      .sortBy(-_._2.totalTimeNs)
      .take(20)
    rules.foreach { case (name, m) =>
      System.err.println(f"[ruletime] ${m.totalTimeNs / 1e6}%8.1f ms " +
        f"inv=${m.numInvocations}%4d eff=${m.numEffectiveInvocations}%3d " +
        s"${name.split('.').last}")
    }
    spark.stop()
  }
}
