package graft

import org.apache.spark.sql.functions._
import graft.expressions.AudioOps

/** The audio pipeline over REAL decoded PCM samples: WAV encode
  * (AudioOps.encodeWav), RIFF walk + sample decode (AudioOps.features)
  * and the closed-form synth signal (AudioOps.synthWav) the oracle
  * recomputes from seed arithmetic. The JDK's own javax.sound WAV
  * reader serves as the independent decode oracle for the encoder. */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  private def feat(b: Array[Byte]) = AudioOps.features(b)

  test("encodeWav round-trips through the JDK's independent WAV reader " +
       "(javax.sound.sampled), sample-for-sample") {
    val samples = Array.tabulate(200)(i => (i * 251 - 20000) % 30000)
    val wav = AudioOps.encodeWav(samples, 1, 8000, 16)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getChannels == 1 && fmt.getSampleRate == 8000f &&
      fmt.getSampleSizeInBits == 16)
    val raw = in.readAllBytes()
    assert(raw.length == 400)
    for (i <- samples.indices) {
      val v = ((raw(i * 2) & 0xFF) | (raw(i * 2 + 1) << 8)).toShort.toInt
      assert(v == samples(i), s"sample $i")
    }
  }

  test("features decodes every integer PCM depth exactly: known peak, " +
       "rms, silence over crafted frames") {
    // 4 frames mono: 0, +1/2 FS, -1/2 FS, 0  ->  peak 0.5,
    // rms = sqrt((0 + FS^2/4 + FS^2/4 + 0) / 4)/FS = sqrt(1/8),
    // silence_ratio = 0.5
    for (bits <- Seq(8, 16, 24, 32)) {
      val half = 1 << (bits - 2)
      val f = feat(AudioOps.encodeWav(Array(0, half, -half, 0), 1, 8000, bits))
      assert(f != null, s"bits=$bits")
      assert(f.getLong(0) == 4 && f.getLong(1) == 0) // 4 frames, 0 ms
      assert(f.getDouble(2) == 0.5, s"peak bits=$bits")
      assert(math.abs(f.getDouble(3) - math.sqrt(0.125)) < 1e-15,
        s"rms bits=$bits")
      assert(f.getDouble(4) == 0.5, s"silence bits=$bits")
    }
    // stereo: a frame is silent only when BOTH channels are
    val st = feat(AudioOps.encodeWav(
      Array(0, 16384, 0, 0, 16384, 0), 2, 48000, 16))
    assert(st.getLong(0) == 3 && st.getDouble(4) == 1.0 / 3)
  }

  test("features matches the synthWav closed forms for every seed class") {
    for (seed <- 0L until 70L) {
      val n = 400 + (seed % 5) * 100
      val s = seed % 100
      val a = if (seed % 7 == 6) 32767 else 1000 + (seed % 7) * 4000
      val f = feat(AudioOps.synthWav(seed))
      assert(f.getLong(0) == n && f.getLong(1) == n * 1000 / 8000)
      assert(f.getDouble(2) == a / 32768.0, s"peak seed=$seed")
      assert(f.getDouble(3) ==
        math.sqrt(((n - s) * a * a) / n.toDouble) / 32768.0,
        s"rms seed=$seed (must be bit-identical, not just close)")
      assert(f.getDouble(4) == s.toDouble / n, s"silence seed=$seed")
    }
  }

  test("undecodable payloads are null, not a throw: non-RIFF, non-PCM " +
       "fmt, missing data chunk, truncated data tolerated") {
    assert(feat("not audio".getBytes) == null)
    assert(feat(Array[Byte]()) == null)
    val wav = AudioOps.encodeWav(Array(100, -100, 100, -100), 1, 8000, 16)
    // flip the fmt audioFormat to 3 (IEEE float): declared non-PCM
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(feat(nonPcm) == null)
    // chop the data payload mid-frame: decodes the whole frames present
    val truncated = feat(wav.take(44 + 5))
    assert(truncated != null && truncated.getLong(0) == 2)
    // declared data size beyond the buffer: same tolerance
    val overdeclared = wav.clone(); overdeclared(40) = 0x7F.toByte
    assert(feat(overdeclared).getLong(0) == 4)
  }

  test("the audioFeatures expression evaluates identically interpreted " +
       "and codegen'd, over synthWav as a column") {
    val df = spark.range(0, 64).select(
      AudioOps.synthWav(col("id")).as("media"))
    val viaExpr = df.select(AudioOps.audioFeatures(col("media")).as("f"))
      .select("f.n_frames", "f.peak", "f.rms", "f.silence_ratio")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    val viaKernel = df.collect().map { r =>
      val f = AudioOps.features(r.getAs[Array[Byte]](0))
      (f.getLong(0), f.getDouble(2), f.getDouble(3), f.getDouble(4))
    }.toSeq
    assert(viaExpr == viaKernel)
  }
}
