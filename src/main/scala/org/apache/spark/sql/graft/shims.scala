package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge.
  *
  * Spark 4 moved `Column` to a connect-agnostic API; the classic
  * converters live in `org.apache.spark.sql.classic` with private[sql]
  * visibility, so libraries that define native Catalyst expressions reach
  * them through an in-package shim (the same pattern third-party Spark
  * extension libraries use). */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an already-computed `InternalRow` RDD (the backbone of
    * iterative-algorithm lineage truncation: the returned frame's logical
    * plan is a flat `LogicalRDD`, however deep the plan that produced the
    * rows was). Same `private[sql]` entry point `Dataset.checkpoint` /
    * `localCheckpoint` use internally. */
  def internalDf(spark: org.apache.spark.sql.SparkSession,
                 rdd: org.apache.spark.rdd.RDD[
                   org.apache.spark.sql.catalyst.InternalRow],
                 schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
