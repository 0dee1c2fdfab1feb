package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native in-bucket cosine pair generator for the embedding near-dup
  * operator ([[graft.operators.Dedup.embeddingNearDupFromSigs]]): given
  * one bucket's sorted members `struct(id, norm, vec)`, emit every (i,
  * j > i) pair whose exact cosine — `dot(vec_a, vec_b) / (norm_a *
  * norm_b)`, the same left-to-right [[VectorOps.dot]] fold — passes the
  * threshold, as `(id_a, id_b, cosine)` structs.
  *
  * Replaces the interpreted `bucketPairs` HOF (nested transform + slice
  * lambdas re-entering the expression interpreter per pair). Survivor
  * semantics match the declarative `where(cosine >= threshold)` exactly,
  * including Spark's NaN ordering (NaN compares GREATER than any double,
  * so a 0/0 cosine passes the filter) and null absorption (a null dot —
  * length-mismatched or null-element vectors — drops the pair). The id
  * type is carried opaquely, so string ids work like the declarative
  * form. Parity pinned in OptimizationParitySpec.
  */
case class CosinePairs(child: Expression, threshold: Double)
    extends UnaryExpression {
  private lazy val memberType: StructType = child.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val idType: DataType = memberType(0).dataType
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", idType), StructField("id_b", idType),
    StructField("cosine", DoubleType))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 3 &&
        s(1).dataType == DoubleType &&
        s(2).dataType.isInstanceOf[ArrayType] &&
        s(2).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.DataTypeMismatch(
      errorSubClass = "UNEXPECTED_INPUT_TYPE",
      messageParameters = Map("paramIndex" -> "1",
        "requiredType" -> "\"ARRAY<STRUCT<id, norm DOUBLE, vec ARRAY<DOUBLE>>>\"",
        "inputSql" -> child.sql, "inputType" -> child.dataType.sql))
  }
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the kernel needs the (plan-time) id DataType to read the opaque id
    // field, so codegen calls back into this instance instead of a
    // static — still one precompiled JVM call per bucket row
    val ref = ctx.addReferenceObj("cosinePairsKernel", this,
      classOf[CosinePairs].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  def compute(members: ArrayData): ArrayData = {
    val m = members.numElements()
    // unpack once: ids stay opaque (copied for safety against buffer
    // reuse), norms/vecs read into locals
    val ids = new Array[Any](m)
    val norms = new Array[Double](m)
    val normNull = new Array[Boolean](m)
    val vecs = new Array[ArrayData](m)
    var i = 0
    while (i < m) {
      val row = members.getStruct(i, 3)
      ids(i) = if (row.isNullAt(0)) null
        else InternalRowCopy.copyValue(row.get(0, idType))
      normNull(i) = row.isNullAt(1)
      norms(i) = if (normNull(i)) 0.0 else row.getDouble(1)
      vecs(i) = if (row.isNullAt(2)) null
        else row.getArray(2).copy()
      i += 1
    }
    val out = new ArrayBuffer[Any](8)
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        val d = VectorOps.dot(vecs(i), vecs(j))
        if (d != null && !normNull(i) && !normNull(j)) {
          val den = norms(i) * norms(j)
          // ANSI mode (Spark 4 default): Divide THROWS on a zero
          // divisor, even for doubles — reproduce rather than emit
          // NaN/Inf (only a zero vector can get here; the declarative
          // query crashes on it identically)
          if (den == 0.0)
            throw new ArithmeticException(
              "[DIVIDE_BY_ZERO] Division by zero (cosine_pairs: " +
                "zero-norm member, matching ANSI Divide)")
          val c = d.doubleValue() / den
          // Spark double ordering: NaN > everything, so `cosine >=
          // threshold` KEEPS NaN — reproduce exactly
          if (java.lang.Double.isNaN(c) || c >= threshold) {
            val r = new Array[Any](3)
            r(0) = ids(i); r(1) = ids(j)
            r(2) = java.lang.Double.valueOf(c)
            out += new GenericInternalRow(r)
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "cosine_pairs"
}

/** copy helper for opaquely-carried values that may alias codegen's
  * reused row buffers (UTF8String, structs, arrays; primitives and
  * boxed numerics pass through) */
private[expressions] object InternalRowCopy {
  def copyValue(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
    case a: ArrayData => a.copy()
    case r: org.apache.spark.sql.catalyst.InternalRow => r.copy()
    case other => other
  }
}

object CosinePairs {
  def cosinePairs(members: Column, threshold: Double): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(CosinePairs(shims.expression(members), threshold))
  }
}
