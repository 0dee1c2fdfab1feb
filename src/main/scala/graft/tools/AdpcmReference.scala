package graft.tools

import java.nio.{ByteBuffer, ByteOrder}

/** INDEPENDENT reference decoder for IMA ADPCM WAV — the oracle twin of
  * the production kernel (`expressions.AudioOps.adpcmFeatures`), written
  * the way `BpeReference` twins the BPE kernel: same public
  * specification (IMA ADPCM reference algorithm, 1992; Microsoft WAVE
  * block layout), deliberately different structure so a transcription
  * bug cannot appear in both. Differences by construction:
  *
  *  - parsing via little-endian `ByteBuffer` views, not manual byte
  *    arithmetic;
  *  - the whole file decodes to one flat `Vector[Int]` of
  *    channel-interleaved samples first; features are then computed by
  *    a separate pass over that collection (the production kernel
  *    streams block-buffer-at-a-time and never materializes the file);
  *  - decode state is an immutable case class threaded through a fold,
  *    not a packed-int mutable register.
  *
  * `q_audio_adpcm` dumps this decoder's per-document features to
  * parquet; DuckDB compares them against the engine's — adaptive coding
  * has no closed form, so cross-implementation agreement on every
  * document is the strongest available zero-egress oracle (hand-derived
  * golden vectors pin the nibble arithmetic itself in AudioSpec).
  */
object AdpcmReference {
  private val Steps = Vector(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val IndexAdj = Vector(-1, -1, -1, -1, 2, 4, 6, 8)

  final case class State(pred: Int, index: Int) {
    def step(nibble: Int): State = {
      val st = Steps(index)
      val magnitude = (st >> 3) +
        (if ((nibble & 4) != 0) st else 0) +
        (if ((nibble & 2) != 0) st >> 1 else 0) +
        (if ((nibble & 1) != 0) st >> 2 else 0)
      val p = if ((nibble & 8) != 0) pred - magnitude else pred + magnitude
      State(math.max(-32768, math.min(32767, p)),
        math.max(0, math.min(88, index + IndexAdj(nibble & 7))))
    }
  }

  final case class Features(nFrames: Long, durationMs: Long, peak: Double,
                            rms: Double, silenceRatio: Double)

  /** MS ADPCM per-channel decode state (immutable, folded):
    * `(sample1, sample2, delta)` with the fixed `(c1, c2)` pair. The
    * `>> 8` convention matches the production kernel's documented
    * choice. */
  final case class MsState(s1: Int, s2: Int, delta: Int, c1: Int, c2: Int) {
    def step(nibble: Int): MsState = {
      val signed = if (nibble >= 8) nibble - 16 else nibble
      val pred = (s1 * c1 + s2 * c2) >> 8
      val sample = math.max(-32768, math.min(32767, pred + signed * delta))
      val d = math.max(16, (AdaptMs(nibble) * delta) >> 8)
      MsState(sample, s1, d, c1, c2)
    }
  }
  private val AdaptMs = Vector(
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  /** WAV bytes -> channel-interleaved decoded samples, or None when the
    * file is not a well-formed IMA or MS ADPCM WAV this reference
    * accepts. */
  def decodeSamples(wav: Array[Byte]): Option[(Vector[Int], Int, Long)] = {
    if (wav.length < 12) return None
    val bb = ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(at: Int): String =
      new String(wav.slice(at, at + 4), "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None

    // (tag, channels, rate, blockAlign, coefficient pairs for MS)
    var fmt: Option[(Int, Int, Long, Int, Vector[(Int, Int)])] = None
    var data: Option[(Int, Int)] = None // (offset, length)
    var at = 12
    while (at + 8 <= wav.length) {
      val id = fourcc(at)
      val size = bb.getInt(at + 4).toLong & 0xFFFFFFFFL
      if (id == "fmt " && size >= 16 && at + 8 + 16 <= wav.length) {
        val tag = bb.getShort(at + 8) & 0xFFFF
        val ch = bb.getShort(at + 10) & 0xFFFF
        val rate = bb.getInt(at + 12).toLong & 0xFFFFFFFFL
        val align = bb.getShort(at + 20) & 0xFFFF
        val bits = bb.getShort(at + 22) & 0xFFFF
        if (tag == 0x11 && bits == 4 && ch > 0 && rate > 0)
          fmt = Some((tag, ch, rate, align, Vector.empty))
        else if (tag == 0x02 && bits == 4 && ch > 0 && rate > 0 &&
                 size >= 22 && at + 8 + 22 <= wav.length) {
          val numCoef = bb.getShort(at + 28) & 0xFFFF
          if (numCoef >= 1 && size >= 22 + 4 * numCoef &&
              at + 8 + 22 + 4 * numCoef <= wav.length) {
            val pairs = (0 until numCoef).toVector.map { k =>
              (bb.getShort(at + 30 + 4 * k).toInt,
                bb.getShort(at + 32 + 4 * k).toInt)
            }
            fmt = Some((tag, ch, rate, align, pairs))
          }
        }
      } else if (id == "data" && data.isEmpty) {
        data = Some((at + 8,
          math.min(size, (wav.length - at - 8).toLong).toInt))
      }
      val next = at.toLong + 8 + size + (size & 1)
      at = if (next > Int.MaxValue) wav.length else next.toInt
    }
    fmt.flatMap { case (tag, channels, rate, blockAlign, pairs) =>
      data.flatMap { case (dataAt, dataLen) =>
        if (tag == 0x11) decodeIma(wav, bb, channels, rate, blockAlign,
          dataAt, dataLen)
        else decodeMs(wav, bb, channels, rate, blockAlign, pairs,
          dataAt, dataLen)
      }
    }
  }

  private def decodeIma(wav: Array[Byte], bb: ByteBuffer, channels: Int,
                        rate: Long, blockAlign: Int, dataAt: Int,
                        dataLen: Int): Option[(Vector[Int], Int, Long)] = {
    if (!(blockAlign > 4 * channels &&
          (blockAlign - 4 * channels) % (4 * channels) == 0)) return None
    val groups = (blockAlign - 4 * channels) / (4 * channels)
    val blocks = dataLen / blockAlign
    val perChannel: Vector[Vector[Vector[Int]]] = // block -> channel -> samples
      (0 until blocks).toVector.map { blk =>
        val base = dataAt + blk * blockAlign
        (0 until channels).toVector.map { c =>
          val pred = bb.getShort(base + 4 * c).toInt
          val idx = math.min(88, wav(base + 4 * c + 2) & 0xFF)
          val nibbles = (0 until groups).toVector.flatMap { g =>
            val gAt = base + 4 * channels + (g * channels + c) * 4
            (0 until 4).flatMap { k =>
              val v = wav(gAt + k) & 0xFF
              Seq(v & 0xF, v >> 4)
            }
          }
          val states = nibbles.scanLeft(State(pred, idx))(_.step(_))
          states.map(_.pred) // head = header sample, then one per nibble
        }
      }
    val interleaved = perChannel.flatMap { chans =>
      val frames = chans.head.length
      (0 until frames).toVector.flatMap(f => chans.map(_(f)))
    }
    Some((interleaved, channels, rate))
  }

  private def decodeMs(wav: Array[Byte], bb: ByteBuffer, channels: Int,
                       rate: Long, blockAlign: Int,
                       pairs: Vector[(Int, Int)], dataAt: Int,
                       dataLen: Int): Option[(Vector[Int], Int, Long)] = {
    if (blockAlign <= 7 * channels || pairs.isEmpty) return None
    val dataBytes = blockAlign - 7 * channels
    if (dataBytes * 2 % channels != 0) return None
    val blocks = dataLen / blockAlign
    val perBlock: Vector[Option[Vector[Int]]] =
      (0 until blocks).toVector.map { blk =>
        val base = dataAt + blk * blockAlign
        val preds = (0 until channels).toVector.map(c => wav(base + c) & 0xFF)
        if (preds.exists(_ >= pairs.length)) None
        else {
          val init = (0 until channels).toVector.map { c =>
            val (c1, c2) = pairs(preds(c))
            MsState(
              s1 = bb.getShort(base + 3 * channels + 2 * c).toInt,
              s2 = bb.getShort(base + 5 * channels + 2 * c).toInt,
              delta = math.max(16,
                bb.getShort(base + channels + 2 * c).toInt),
              c1, c2)
          }
          val nibbles = (0 until dataBytes).toVector.flatMap { k =>
            val v = wav(base + 7 * channels + k) & 0xFF
            Seq(v >> 4, v & 0xF) // HIGH nibble first
          }
          // fold the nibble stream frame-major across channels
          val (finalStates, decoded) =
            nibbles.zipWithIndex.foldLeft((init, Vector.empty[Int])) {
              case ((st, outAcc), (nib, k)) =>
                val c = k % channels
                val ns = st(c).step(nib)
                (st.updated(c, ns), outAcc :+ ns.s1)
            }
          val _ = finalStates
          // first two frames per channel are sample2 then sample1
          val head = (0 until channels).toVector.map(c => init(c).s2) ++
            (0 until channels).toVector.map(c => init(c).s1)
          Some(head ++ decoded)
        }
      }
    if (perBlock.exists(_.isEmpty)) None
    else Some((perBlock.flatMap(_.get), channels, rate))
  }

  /** WAV bytes -> the engine's feature tuple, computed over the flat
    * decoded collection (functional second pass). */
  def features(wav: Array[Byte]): Option[Features] =
    decodeSamples(wav).map { case (samples, channels, rate) =>
      val frames = samples.length / channels
      val silenceAbs = 32768.0 * 0.01
      val peak = if (samples.isEmpty) 0.0
        else samples.iterator.map(s => math.abs(s.toDouble)).max
      val sumSq = samples.iterator.map(s => s.toDouble * s).sum
      val silent = (0 until frames).count { f =>
        (0 until channels).forall(c =>
          math.abs(samples(f * channels + c)) < silenceAbs)
      }
      Features(frames.toLong, frames.toLong * 1000L / rate,
        peak / 32768.0,
        if (frames == 0) 0.0
        else math.sqrt(sumSq / (frames.toLong * channels)) / 32768.0,
        if (frames == 0) 0.0 else silent.toDouble / frames)
    }
}
