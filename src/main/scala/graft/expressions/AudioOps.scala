package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Audio feature extraction over REAL decoded PCM samples — the audio
  * analog of [[ImageOps]]: WAV/PCM is a plain byte layout (Microsoft
  * RIFF spec / RFC 2361), so sample DATA decode needs no codec library
  * and the multimodal stub shrinks to lossy codecs only on the audio
  * side too (reference scope: pywcmp treats linked media as opaque
  * URLs — these are the training-data-pipeline stages beyond it).
  *
  *  - [[AudioOps.synthWav]]: a deterministic WAV ENCODER
  *    ([[AudioOps.encodeWav]] is the public kernel), seed -> bytes.
  *    The synthetic signal is a silence prefix followed by a square
  *    wave whose amplitude, length and prefix are pure seed arithmetic,
  *    so every feature below has a closed form an independent engine
  *    (the DuckDB oracle) can recompute from the seed alone.
  *  - [[AudioFeatures]]: one pass over the PCM frames ->
  *    `(n_frames, duration_ms, peak, rms, silence_ratio)`; peak/rms are
  *    normalized to full scale [0,1], silence is |x| below 1% full
  *    scale on every channel. These are the audio QC signals a corpus
  *    pipeline filters on (dead air, clipping-adjacent peaks, loudness
  *    strata).
  *
  * Kernels obey the untrusted-bytes contract (never throw, null on
  * malformed/non-PCM/truncated-header input — FuzzSpec) and a
  * decoded-size bomb cap. 8/16/24/32-bit integer PCM, any channel
  * count; a truncated `data` payload is decoded to the frames actually
  * present (same metadata-only tolerance as [[WavMeta]]).
  */
object AudioOps {
  /** bomb cap on decoded PCM bytes actually walked (64 MiB) */
  val MaxPcm: Int = 1 << 26
  /** silence threshold: 1% of full scale */
  val SilenceFrac: Double = 0.01

  /** Minimal spec-complete WAV encoder: integer PCM, `bits` of
    * 8 (unsigned, 128-offset per spec) / 16 / 24 / 32 (signed LE),
    * `samples` channel-interleaved signed values at full `bits` scale.
    * Encode/decode round-trip through [[features]] is exact. */
  def encodeWav(samples: Array[Int], channels: Int, rate: Int,
                bits: Int): Array[Byte] = {
    require(channels > 0 && rate > 0, "channels/rate must be positive")
    require(bits == 8 || bits == 16 || bits == 24 || bits == 32,
      s"bits $bits")
    require(samples.length % channels == 0, "partial final frame")
    val bytesPer = bits / 8
    val blockAlign = channels * bytesPer
    val dataSize = samples.length * bytesPer
    val out = new Array[Byte](44 + dataSize)
    def tag(i: Int, s: String): Unit = {
      var k = 0
      while (k < 4) { out(i + k) = s.charAt(k).toByte; k += 1 }
    }
    def le32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    def le16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
    }
    tag(0, "RIFF"); le32(4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM
    le16(22, channels); le32(24, rate)
    le32(28, rate * blockAlign); le16(32, blockAlign); le16(34, bits)
    tag(36, "data"); le32(40, dataSize)
    var i = 0
    while (i < samples.length) {
      val v = if (bits == 8) samples(i) + 128 else samples(i)
      var k = 0
      while (k < bytesPer) {
        out(44 + i * bytesPer + k) = (v >>> (8 * k)).toByte
        k += 1
      }
      i += 1
    }
    out
  }

  /** Deterministic test-signal WAV from `seed`: 16-bit mono 8000 Hz;
    * `s = seed mod 100` silent frames then `n - s` frames of a
    * period-8 square wave at amplitude `A = 32767` (exactly full scale)
    * when `seed mod 7 = 6`, else `A = 1000 + (seed mod 7) * 4000`,
    * total `n = 400 + (seed mod 5) * 100` frames. Closed forms the
    * oracle recomputes from the seed: `peak = A/32768`,
    * `rms = A * sqrt((n-s)/n) / 32768` (exact in IEEE doubles: every
    * partial sum of the kernel's sum-of-squares is an integer below
    * 2^53, so both engines feed sqrt the identical quotient),
    * `silence_ratio = s/n`, `duration_ms = n*1000 div 8000`. */
  def synthWav(seed: Long): Array[Byte] = {
    def m(k: Long): Int = java.lang.Math.floorMod(seed, k).toInt
    val n = 400 + m(5) * 100
    val s = m(100)
    val amp = if (m(7) == 6) 32767 else 1000 + m(7) * 4000
    val samples = new Array[Int](n)
    var i = s
    while (i < n) {
      samples(i) = if (((i - s) / 4) % 2 == 0) amp else -amp
      i += 1
    }
    encodeWav(samples, 1, 8000, 16)
  }

  val featureType: StructType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("peak", DoubleType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("silence_ratio", DoubleType, nullable = false)))

  /** WAV bytes -> feature row, or null when the payload is not a
    * decodable integer-PCM WAV (bad RIFF frame, no/ non-PCM `fmt `,
    * no `data`, unsupported depth). A `data` chunk whose declared size
    * exceeds the bytes present (or [[MaxPcm]]) is decoded to the whole
    * frames actually available. */
  def features(b: Array[Byte]): InternalRow = {
    val n = b.length
    def u8(i: Int): Int = b(i) & 0xFF
    def leU16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def leU32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
        (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String): Boolean =
      i + 4 <= n && b(i) == s.charAt(0).toByte &&
        b(i + 1) == s.charAt(1).toByte &&
        b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte
    if (n < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return null

    var fmtOk = false
    var channels = 0; var rate = 0L; var bits = 0
    var dataAt = -1; var dataLen = 0L
    var i = 12
    var guard = 0
    while (i + 8 <= n && guard < 4096) {
      guard += 1
      val size = leU32(i + 4)
      if (tag(i, "fmt ") && size >= 16 && i + 8 + 16 <= n) {
        val audioFormat = leU16(i + 8)
        channels = leU16(i + 10)
        rate = leU32(i + 12)
        bits = leU16(i + 22)
        fmtOk = audioFormat == 1 && channels > 0 && rate > 0 &&
          (bits == 8 || bits == 16 || bits == 24 || bits == 32)
      } else if (tag(i, "data") && dataAt < 0) {
        dataAt = i + 8
        dataLen = size
      }
      val next = i.toLong + 8L + size + (size & 1L) // word-aligned; Long
      i = if (next >= n) n else next.toInt
    }
    if (!fmtOk || dataAt < 0) return null

    val bytesPer = bits / 8
    val blockAlign = channels * bytesPer
    val avail = math.min(math.min(dataLen, (n - dataAt).toLong),
      MaxPcm.toLong)
    val frames = avail / blockAlign
    val fullScale = 1L << (bits - 1)
    val silenceAbs = fullScale * SilenceFrac
    var peakAbs = 0L
    var sumSq = 0.0
    var silentFrames = 0L
    var f = 0L
    while (f < frames) {
      var frameSilent = true
      var c = 0
      while (c < channels) {
        val at = dataAt + (f * blockAlign).toInt + c * bytesPer
        var v = 0L
        var k = 0
        while (k < bytesPer) { v |= u8(at + k).toLong << (8 * k); k += 1 }
        // sign-extend (8-bit PCM is unsigned with a 128 offset)
        val x =
          if (bits == 8) v - 128
          else (v << (64 - bits)) >> (64 - bits)
        val ax = math.abs(x)
        if (ax > peakAbs) peakAbs = ax
        if (ax >= silenceAbs) frameSilent = false
        sumSq += x.toDouble * x.toDouble
        c += 1
      }
      if (frameSilent) silentFrames += 1
      f += 1
    }
    val scale = fullScale.toDouble
    new GenericInternalRow(Array[Any](
      java.lang.Long.valueOf(frames),
      java.lang.Long.valueOf(frames * 1000L / rate),
      java.lang.Double.valueOf(peakAbs / scale),
      java.lang.Double.valueOf(
        if (frames == 0) 0.0
        else math.sqrt(sumSq / (frames * channels).toDouble) / scale),
      java.lang.Double.valueOf(
        if (frames == 0) 0.0 else silentFrames.toDouble / frames)))
  }

  def synthWav(seed: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(SynthWav(shims.expression(seed)))
  }
  def audioFeatures(media: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(AudioFeatures(shims.expression(media)))
  }
}

/** seed long -> WAV bytes (codegen'd; never null). */
case class SynthWav(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.DataTypeMismatch(
      errorSubClass = "UNEXPECTED_INPUT_TYPE",
      messageParameters = Map("paramIndex" -> "1",
        "requiredType" -> "\"BIGINT\"",
        "inputSql" -> child.sql, "inputType" -> child.dataType.sql))
  override def nullSafeEval(seed: Any): Any =
    AudioOps.synthWav(seed.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    defineCodeGen(ctx, ev,
      s => s"graft.expressions.AudioOps.synthWav($s)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "synth_wav"
}

/** WAV bytes -> PCM feature struct (null on non-PCM/undecodable). */
case class AudioFeatures(child: Expression) extends MediaProbe {
  override def dataType: DataType = AudioOps.featureType
  protected val kernel = "graft.expressions.AudioOps.features"
  override def nullSafeEval(input: Any): Any =
    AudioOps.features(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "audio_features"
}
