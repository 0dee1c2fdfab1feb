package graft.sketch

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union => HllUnion}
import org.apache.datasketches.memory.{Memory, WritableMemory}
import org.apache.datasketches.tdigest.TDigestDouble
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass sketch aggregators over datasketches-java 6.2.0 (shipped in
  * `/opt/spark/jars`) — the custom-UDAF path of SURVEY.md §2.8 / A6 for
  * when the built-ins don't fit:
  *
  *  - [[HllDistinct]]: HLL(lgK) approx-distinct whose BINARY sketch is
  *    mergeable across runs — unlike `approx_count_distinct`, which yields
  *    only the final number, the serialized sketch can live in the metrics
  *    ledger and be unioned with tomorrow's partial (incremental profiling
  *    at 100 TB without rescanning history).
  *  - [[TDigestQuantiles]]: t-digest quantile sketch, same mergeability,
  *    with better tail accuracy than `percentile_approx`'s summary at
  *    extreme quantiles (p99.9 of content length).
  *
  * Both are `Aggregator`s registered via `udaf(...)`; Spark plans them as
  * `ScalaAggregator` (a `TypedImperativeAggregate`) under
  * ObjectHashAggregate — partial sketches merge map-side, and the shuffle
  * carries |groups| sketch blobs, not rows. The HLL buffer uses
  * datasketches DIRECT mode: the aggregation buffer byte array IS the
  * sketch's writable memory, so per-row updates are in-place with no
  * serialization round-trip.
  */
object Sketches {

  private val LgK = 12 // ~1.6% rsd

  class HllDistinct extends Aggregator[String, Array[Byte], Long] {
    private def maxBytes =
      HllSketch.getMaxUpdatableSerializationBytes(LgK, TgtHllType.HLL_8)
    def zero: Array[Byte] = {
      val buf = new Array[Byte](maxBytes)
      new HllSketch(LgK, TgtHllType.HLL_8, WritableMemory.writableWrap(buf))
      buf
    }
    def reduce(buf: Array[Byte], v: String): Array[Byte] = {
      if (v != null)
        HllSketch.writableWrap(WritableMemory.writableWrap(buf)).update(v)
      buf
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val u = new HllUnion(LgK)
      u.update(HllSketch.heapify(Memory.wrap(a)))
      u.update(HllSketch.heapify(Memory.wrap(b)))
      // re-materialize at full capacity so later in-place updates can
      // grow list -> set -> hll without relocating out of the buffer
      val img = u.getResult(TgtHllType.HLL_8).toUpdatableByteArray
      val out = new Array[Byte](math.max(maxBytes, img.length))
      System.arraycopy(img, 0, out, 0, img.length)
      out
    }
    def finish(buf: Array[Byte]): Long =
      math.round(HllSketch.heapify(Memory.wrap(buf)).getEstimate)
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** t-digest over doubles; finish returns the requested quantiles. */
  class TDigestQuantiles(quantiles: Seq[Double], k: Short = 200)
      extends Aggregator[Double, Array[Byte], Seq[Double]] {
    private def digestOf(b: Array[Byte]): TDigestDouble =
      TDigestDouble.heapify(Memory.wrap(b))
    def zero: Array[Byte] = new TDigestDouble(k).toByteArray
    def reduce(buf: Array[Byte], v: Double): Array[Byte] = {
      val d = digestOf(buf); d.update(v); d.toByteArray
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val d = digestOf(a); d.merge(digestOf(b)); d.toByteArray
    }
    def finish(buf: Array[Byte]): Seq[Double] = {
      val d = digestOf(buf)
      if (d.isEmpty) quantiles.map(_ => Double.NaN)
      else quantiles.map(q => d.getQuantile(q))
    }
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  def hllDistinct(c: Column): Column = udaf(new HllDistinct).apply(c)

  def tdigestQuantiles(c: Column, qs: Seq[Double]): Column =
    udaf(new TDigestQuantiles(qs)).apply(c)
}
