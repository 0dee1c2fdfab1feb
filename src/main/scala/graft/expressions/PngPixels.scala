package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL pixel decode for PNG — the JDK ships the only codec PNG needs
  * (`java.util.zip.Inflater` for the zlib/DEFLATE stream), so unlike the
  * lossy formats (JPEG/video/audio codecs, which stay behind the declared
  * stub) PNG raster data is fully decodable in-sandbox: signature + chunk
  * walk (PNG spec, RFC 2083 / W3C PNG), IDAT concatenation + inflate,
  * then per-scanline filter reconstruction (None/Sub/Up/Average/Paeth).
  *
  * Declared subset: bit depth 8, color types 0 (gray), 2 (RGB),
  * 4 (gray+alpha), 6 (RGBA), non-interlaced. Sub-byte depths, 16-bit
  * channels, palette images and Adam7 interlacing return null (the
  * format-metadata probe `Multimodal.decodeImage` still covers them).
  *
  * Scale guards, because this runs inside executor tasks against
  * untrusted corpus bytes:
  *  - decompression-bomb cap: a raster larger than [[PngPixels.MaxRaster]]
  *    (64 MiB) returns null instead of allocating — a few hundred bytes
  *    of IDAT can legally declare a multi-GiB image;
  *  - the chunk walk advances in Long so forged u32 lengths cannot wrap
  *    Int and re-walk the buffer;
  *  - truncated / corrupt DEFLATE streams (DataFormatException, short
  *    output) return null, never throw — one corrupt blob must not abort
  *    a 100 TB scan.
  */
case class PngPixels(child: Expression) extends MediaProbe {
  override def dataType: DataType = PngPixels.pixType
  protected val kernel = "graft.expressions.PngPixels.pixels"
  override def nullSafeEval(input: Any): Any =
    PngPixels.pixels(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "png_pixels"
}

object PngPixels {
  /** decompression-bomb cap on the decoded raster (bytes) */
  val MaxRaster: Long = 64L * 1024 * 1024

  val pixType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixels", BinaryType, nullable = false)))

  private val Sig = Array[Int](0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  /** (byte[]) -> InternalRow(width, height, channels, raster) or null.
    * Raster layout: scanline-major, channel-interleaved, exactly as the
    * defiltered PNG stream orders it (top row first). */
  def pixels(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 8 + 25) return null
    var s = 0
    while (s < 8) { if ((b(s) & 0xFF) != Sig(s)) return null; s += 1 }
    def u32(i: Int): Long =
      ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
    def tag(i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    var width = -1; var height = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8L
    var sawEnd = false
    while (pos + 8 <= n && !sawEnd) {
      val len = u32(pos.toInt)
      val typ = tag(pos.toInt + 4)
      val payload = pos + 8
      if (payload + len > n) return null // truncated chunk
      typ match {
        case "IHDR" =>
          if (len < 13) return null
          val p = payload.toInt
          val w = u32(p); val h = u32(p + 4)
          val depth = b(p + 8) & 0xFF
          val colorType = b(p + 9) & 0xFF
          val interlace = b(p + 12) & 0xFF
          channels = colorType match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => -1
          }
          if (depth != 8 || channels < 0 || interlace != 0) return null
          // per-dimension cap BEFORE the product: w and h are raw u32s
          // (up to 2^32-1), so (w*channels+1)*h could wrap Long negative
          // and sneak a forged IHDR past a product-only check (then the
          // Int casts below would overflow into a NegativeArraySize
          // throw). With both factors <= MaxRaster the Long product is
          // exact (< 2^54).
          if (w <= 0 || h <= 0 || w > MaxRaster || h > MaxRaster) return null
          if ((w * channels + 1L) * h > MaxRaster) return null // bomb cap
          width = w.toInt; height = h.toInt
        case "IDAT" =>
          if (width < 0) return null // IDAT before IHDR: corrupt
          idat.write(b, payload.toInt, len.toInt)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunk: skip
      }
      pos = payload + len + 4 // + CRC
    }
    if (width < 0 || idat.size() == 0) return null

    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    try {
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(idat.toByteArray)
        var off = 0
        while (off < raw.length && !inf.finished()) {
          val got = inf.inflate(raw, off, raw.length - off)
          // any zero-progress state is terminal for untrusted bytes:
          // short stream (needsInput), preset-dictionary demand
          // (needsDictionary — a crafted FDICT zlib header would
          // otherwise return 0 forever: an executor-task infinite loop)
          if (got == 0) return null
          off += got
        }
        if (off < raw.length) return null
      } finally inf.end()
    } catch { case _: java.util.zip.DataFormatException => return null }

    // filter reconstruction (PNG spec §6): a = left, bb = up, c = up-left
    val out = new Array[Byte](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xFF
      if (filter > 4) return null
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val v = raw(src + x) & 0xFF
        val a = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
        val bb = if (y > 0) out(dst - stride + x) & 0xFF else 0
        val c = if (y > 0 && x >= bpp) out(dst - stride + x - bpp) & 0xFF
                else 0
        val rec = filter match {
          case 0 => v
          case 1 => v + a
          case 2 => v + bb
          case 3 => v + ((a + bb) >> 1)
          case 4 => // Paeth predictor
            val p = a + bb - c
            val pa = math.abs(p - a); val pb = math.abs(p - bb)
            val pc = math.abs(p - c)
            v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c)
        }
        out(dst + x) = (rec & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    new GenericInternalRow(Array[Any](width, height, channels, out))
  }

  def pngPixels(c: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(PngPixels(shims.expression(c)))
  }
}
