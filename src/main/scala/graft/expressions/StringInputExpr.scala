package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.types.StringType

/** Shared input-type contract for the unary string-input kernels
  * (JsonFacts, Misspelled, TitleWords): one place for the
  * DataTypeMismatch shape instead of a copy per expression. */
private[expressions] trait StringInputExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.DataTypeMismatch(
      errorSubClass = "UNEXPECTED_INPUT_TYPE",
      messageParameters = Map("paramIndex" -> "1",
        "requiredType" -> "\"STRING\"",
        "inputSql" -> child.sql, "inputType" -> child.dataType.sql))
}
