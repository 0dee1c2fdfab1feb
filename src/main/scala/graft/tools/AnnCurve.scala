package graft.tools

import org.apache.spark.sql.functions._
import graft.{Bench, SparkEntry}
import graft.operators.Similarity

/** Measured IVF recall@10 vs nprobe on the synthetic testdata embedding
  * corpus (BASELINE.md evidence). That corpus is near-ISOTROPIC (top-10
  * cosines ~0.3 against a 0.125-sigma noise floor), the adversarial
  * regime where no bucketing scheme concentrates neighbors — the curve
  * quantifies exactly what the margin-guided multi-probe buys there.
  * The realistic clustered regime is pinned at recall >= 0.9 in
  * OperatorsSpec instead.
  *
  * Usage: `sbt "runMain graft.tools.AnnCurve"` (env SPARK_GRAFT_SF_DIR).
  */
object AnnCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val bf = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val curve = Seq(1, 2, 4, 8, 16, 32).map { np =>
      val ivf = Similarity.ivfTopK(emb, queries, k = 10, bits = 6,
          nprobe = np)
        .select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (bf & ivf).size.toDouble / bf.size
      s""""nprobe_$np":${math.round(recall * 1000) / 1000.0}"""
    }
    println(s"""{"metric":"ann_recall_at_10","sf":"$sfDir","bits":6,""" +
      s""""queries":20,${curve.mkString(",")}}""")
    spark.stop()
  }
}
