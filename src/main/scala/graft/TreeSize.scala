package graft

import org.apache.spark.sql.catalyst.expressions.Expression
import graft.engine.Validator
import graft.sources.RecordTable

/** scratch: expression-tree node counts of the validator plan (not driver
  * contract) — planning cost is proportional to tree size x optimizer
  * passes, so this finds the subtrees worth shrinking. */
object TreeSize {
  def count(e: Expression): Int = 1 + e.children.map(count).sum
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("4")
    val records = RecordTable.synthesize(spark, 100)
    val v = Validator.validate(records)
    // per-column node counts on the ANALYZED plan's output projection
    val plan = v.queryExecution.analyzed
    var total = 0
    plan.foreach { node =>
      node.expressions.foreach { e => total += count(e) }
    }
    println(s"[treesize] analyzed-plan total expr nodes: $total")
    val opt = v.queryExecution.optimizedPlan
    var tot2 = 0
    opt.foreach { node => node.expressions.foreach { e => tot2 += count(e) } }
    println(s"[treesize] optimized-plan total expr nodes: $tot2")
    // attribute: top-level projections by name
    opt.foreach { node =>
      node.expressions.foreach { e =>
        val n = count(e)
        if (n > 200) {
          val name = e match {
            case a: org.apache.spark.sql.catalyst.expressions.Alias => a.name
            case other => other.prettyName
          }
          println(f"[treesize]   $name%-24s $n%6d nodes")
        }
      }
    }
    // violations + verdicts plans
    Seq("violations" -> Validator.violations(v),
        "verdicts" -> Validator.partitionVerdicts(v)).foreach {
      case (nm, df) =>
        var t = 0
        df.queryExecution.optimizedPlan.foreach { node =>
          node.expressions.foreach { e => t += count(e) } }
        println(s"[treesize] $nm optimized total: $t")
    }
    spark.stop()
  }
}
