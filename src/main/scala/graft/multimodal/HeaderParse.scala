package graft.multimodal

/** Deterministic media-payload fixtures: REAL byte layouts for the three
  * public container formats the sniffer recognizes (PNG, JFIF/JPEG,
  * RIFF/WAVE), synthesized from `(doc_id, text)` so the whole
  * encode → decode round trip is exercised end-to-end and the expected
  * header fields are a closed form of the row — which is what lets a SQL
  * oracle hash-check [[HeaderParseDecoder]]'s output without any codec
  * libraries: both sides derive the SAME numbers, one through genuine
  * binary headers, one through arithmetic. */
object MediaFixtures {

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var o = 0
    parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
    out
  }

  /** PNG: 8-byte signature + IHDR (real CRC32) + IEND, with `pad`
    * appended as trailing junk (decoders ignore bytes past IEND).
    * 45 bytes + pad. bitDepth 8, colorType 6 (RGBA → 4 channels). */
  def pngBytes(width: Int, height: Int, pad: Array[Byte]): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrData = cat(be32(width), be32(height),
      Array(8.toByte /* bit depth */ , 6.toByte /* RGBA */ ,
        0.toByte, 0.toByte, 0.toByte))
    val typeAndData = cat("IHDR".getBytes("US-ASCII"), ihdrData)
    val crc = new java.util.zip.CRC32
    crc.update(typeAndData)
    val ihdr = cat(be32(ihdrData.length), typeAndData, be32(crc.getValue))
    val iendCrc = new java.util.zip.CRC32
    iendCrc.update("IEND".getBytes("US-ASCII"))
    val iend = cat(be32(0), "IEND".getBytes("US-ASCII"), be32(iendCrc.getValue))
    cat(sig, ihdr, iend, pad)
  }

  /** JFIF JPEG: SOI + APP0 (16-byte JFIF segment) + SOF0 (3 components)
    * + EOI, `pad` appended after EOI. 41 bytes + pad. */
  def jpegBytes(width: Int, height: Int, pad: Array[Byte]): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val app0 = cat(Array(0xff, 0xe0).map(_.toByte), be16(16),
      "JFIF".getBytes("US-ASCII"), Array(0.toByte),
      Array(1.toByte, 1.toByte) /* version */ , Array(0.toByte) /* units */ ,
      be16(1), be16(1), Array(0.toByte, 0.toByte))
    val sof0 = cat(Array(0xff, 0xc0).map(_.toByte), be16(17),
      Array(8.toByte) /* precision */ , be16(height), be16(width),
      Array(3.toByte) /* components */ ,
      Array(1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte))
    val eoi = Array(0xff, 0xd9).map(_.toByte)
    cat(soi, app0, sof0, eoi, pad)
  }

  /** Canonical 44-byte WAV header (PCM, 8-bit) + `data` as the sample
    * bytes. 44 bytes + data. */
  def wavBytes(sampleRate: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    val byteRate = sampleRate * channels // bitsPerSample = 8
    cat(
      "RIFF".getBytes("US-ASCII"), le32(36L + data.length), "WAVE".getBytes("US-ASCII"),
      "fmt ".getBytes("US-ASCII"), le32(16), le16(1) /* PCM */ ,
      le16(channels), le32(sampleRate), le32(byteRate),
      le16(channels) /* blockAlign */ , le16(8) /* bitsPerSample */ ,
      "data".getBytes("US-ASCII"), le32(data.length), data)
  }

  /** The per-document fixture: `doc_id % 3` selects the format, header
    * fields are small moduli of `doc_id`, and the UTF-8 text bytes ride
    * along (as trailing padding for png/jpeg, as the sample data for
    * wav). The closed forms here are mirrored verbatim in the
    * `q_media_features` oracle SQL. */
  def forDoc(docId: Long, text: String): Array[Byte] = {
    val bytes = text.getBytes("UTF-8")
    (docId % 3) match {
      case 0 => pngBytes((16 + docId % 617).toInt, (16 + (docId * 7) % 413).toInt, bytes)
      case 1 => jpegBytes((16 + docId % 619).toInt, (16 + (docId * 11) % 421).toInt, bytes)
      case _ => wavBytes((8000 + (docId % 8) * 4000).toInt, (1 + docId % 2).toInt, bytes)
    }
  }
}

/** REAL pure-JVM header parser for the public container formats — no
  * codec libraries, just the published byte layouts (PNG spec §5/§11,
  * JPEG/JFIF marker structure, RIFF/WAVE chunk layout). Parses by magic
  * bytes (defensive: ignores the caller-supplied type tag). Output is a
  * fixed 8-float vector:
  *
  *  - png:  `[1, width, height, bitDepth, channels, 0, 0, nBytes]`
  *  - jpeg: `[2, width, height, precision, components, 0, 0, nBytes]`
  *  - wav:  `[3, sampleRate, channels, bitsPerSample, dataBytes, durationMs, 0, nBytes]`
  *  - anything else / malformed: `[0, 0, 0, 0, 0, 0, 0, nBytes]`
  *
  * All fields fit a Float exactly (< 2^24). Malformed payloads fall back
  * to the unknown vector instead of throwing — a 100 TB scrape contains
  * garbage, and one bad blob must not kill a task. */
final class HeaderParseDecoder extends MediaDecoder {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, "US-ASCII")

  private val unknown = (n: Int) => Array(0f, 0f, 0f, 0f, 0f, 0f, 0f, n.toFloat)

  override def decode(mediaType: String, payload: Array[Byte]): Array[Float] = {
    val n = payload.length
    try {
      if (n >= 26 && be32(payload, 0) == 0x89504e47L && be32(payload, 4) == 0x0d0a1a0aL)
        parsePng(payload)
      else if (n >= 4 && u8(payload, 0) == 0xff && u8(payload, 1) == 0xd8 && u8(payload, 2) == 0xff)
        parseJpeg(payload)
      else if (n >= 12 && ascii(payload, 0, 4) == "RIFF" && ascii(payload, 8, 4) == "WAVE")
        parseWav(payload)
      else unknown(n)
    } catch { case _: RuntimeException => unknown(n) }
  }

  /** PNG spec: the IHDR chunk MUST come first — width/height at fixed
    * offsets 16/20 (big-endian), bit depth 24, color type 25. */
  private def parsePng(b: Array[Byte]): Array[Float] = {
    if (ascii(b, 12, 4) != "IHDR") return unknown(b.length)
    val width = be32(b, 16)
    val height = be32(b, 20)
    val bitDepth = u8(b, 24)
    val channels = u8(b, 25) match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => 0
    }
    Array(1f, width.toFloat, height.toFloat, bitDepth.toFloat, channels.toFloat,
      0f, 0f, b.length.toFloat)
  }

  /** JPEG marker scan: skip segments until a start-of-frame marker
    * (0xC0–0xCF excluding DHT 0xC4, JPG 0xC8, DAC 0xCC); its payload is
    * `[len][precision][height][width][components]`. Stops at SOS/EOI. */
  private def parseJpeg(b: Array[Byte]): Array[Float] = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return unknown(b.length) // marker desync
      val marker = u8(b, i + 1)
      if (marker == 0xd8 || marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone marker, no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return unknown(b.length) // hit EOI/SOS without a frame header
      } else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return unknown(b.length)
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          val precision = u8(b, i + 4)
          val height = be16(b, i + 5)
          val width = be16(b, i + 7)
          val components = u8(b, i + 9)
          return Array(2f, width.toFloat, height.toFloat, precision.toFloat,
            components.toFloat, 0f, 0f, b.length.toFloat)
        }
        i += 2 + len
      }
    }
    unknown(b.length)
  }

  /** RIFF chunk walk: find `fmt ` (channels, sample rate, byte rate, bits
    * per sample) and `data` (sample byte count); duration =
    * `dataBytes * 1000 / byteRate`, floored — exact integer arithmetic. */
  private def parseWav(b: Array[Byte]): Array[Float] = {
    var i = 12
    var channels = 0; var sampleRate = 0L; var byteRate = 0L; var bits = 0
    var dataBytes = -1L
    while (i + 8 <= b.length && (channels == 0 || dataBytes < 0)) {
      val id = ascii(b, i, 4)
      val size = le32(b, i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length) {
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
        bits = le16(b, i + 22)
      } else if (id == "data") {
        dataBytes = size
      }
      // Malformed chunk sizes (e.g. 0xFFFFFFF8 truncated to a negative Int)
      // could zero or reverse the step and hang the walk; a chunk that cannot
      // fit the remaining payload degrades to the unknown vector instead.
      if (size < 0L || size > b.length.toLong - i - 8) return unknown(b.length)
      i += 8 + size.toInt + (size.toInt & 1) // RIFF chunks are word-aligned
    }
    if (channels == 0 || dataBytes < 0 || byteRate <= 0) unknown(b.length)
    else Array(3f, sampleRate.toFloat, channels.toFloat, bits.toFloat,
      dataBytes.toFloat, (dataBytes * 1000L / byteRate).toFloat, 0f, b.length.toFloat)
  }
}
