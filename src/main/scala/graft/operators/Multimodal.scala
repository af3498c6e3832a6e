package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2b): media as opaque `binary` columns
  * plus typed metadata, with the decode/feature-extract step batched per
  * partition (the shape a Pandas-UDF / mapInPandas pipeline has in
  * production). CONTAINER parsing is real — PNG/JPEG dimensions and
  * WAV sample-rate/channels are read from the actual header bytes
  * ([[parseImageHeader]], [[parseWavHeader]]; no external libs needed:
  * these formats carry their metadata in fixed-layout segments). Content
  * decoding is real too, all JDK-only: PNG pixels via IDAT inflate +
  * scanline unfiltering ([[pngPixelBytes]]), JPEG pixels via the
  * `javax.imageio` baseline reader canonicalized to row-major RGB
  * ([[jpegPixelBytes]]), WAV PCM via the RIFF data chunk
  * ([[wavPcmBytes]]). The deterministic stub remains only for payloads
  * OUTSIDE those containers (unknown formats) so the Spark-side schema,
  * partitioning and batch plumbing stay exercised end-to-end on any corpus.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("payload", BinaryType),
    StructField("n_bytes", LongType)))

  /** Wrap a text corpus as a fake media table: payload = utf-8 bytes.
    * In production this column would be the raw image/audio bytes read from
    * a binary-file source (`spark.read.format("binaryFile")`).
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      (when(col(idCol) % 2 === 0, "image").otherwise("audio")).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"))

  /** Real image-container parser: width/height/format read from the actual
    * header bytes. PNG stores dimensions at fixed offsets in the IHDR chunk
    * (always the first chunk after the 8-byte signature: width big-endian at
    * byte 16, height at 20). JPEG stores them in the start-of-frame (SOFn)
    * segment, found by walking the marker stream — each non-standalone
    * marker is FF xx followed by a 2-byte big-endian length that includes
    * itself; SOFn is FF C0–CF excluding C4 (DHT), C8 (JPG ext) and CC (DAC),
    * with payload [precision:1][height:2][width:2]. Returns None for
    * anything that is not a well-formed PNG/JPEG prefix — the caller falls
    * back to the deterministic stub, so corrupt bytes degrade, not throw.
    */
  private[operators] def parseImageHeader(p: Array[Byte]): Option[(Long, Long, String)] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
        ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)
    if (p.length >= 24 &&
        u8(0) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
        u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R') {
      Some((u32(16), u32(20), "png"))
    } else if (p.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 3 < p.length) {
        if (u8(i) != 0xFF) return None // expected a marker: corrupt stream
        val m = u8(i + 1)
        if (m == 0xFF) i += 1 // fill byte before a marker
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2 // standalone
        else {
          val len = u16(i + 2)
          if (len < 2) return None
          val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
          if (isSof) {
            // dims sit at payload offsets 3..6, so a valid SOF length is
            // >= 7 (len counts itself) — shorter means the bytes at
            // i+5..i+8 belong to the NEXT segment, not this one
            if (len < 7 || i + 8 >= p.length) return None
            return Some((u16(i + 7).toLong, u16(i + 5).toLong, "jpeg"))
          }
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** Real audio-container parser: sample rate / channel count read from an
    * actual RIFF/WAVE header. Layout: "RIFF" + 4-byte LE riff size +
    * "WAVE", then a chunk stream of (4-byte id, 4-byte LE size, payload) —
    * the "fmt " chunk holds [audioFormat:2][channels:2 LE][sampleRate:4 LE]
    * [byteRate:4][blockAlign:2][bitsPerSample:2]. Returns None for
    * anything that is not a well-formed WAV prefix (caller falls back to
    * the stub, same contract as [[parseImageHeader]]).
    */
  private[operators] def parseWavHeader(p: Array[Byte]): Option[(Long, Long)] = {
    def u16le(i: Int): Int = (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
    def u32le(i: Int): Long =
      (p(i) & 0xFFL) | ((p(i + 1) & 0xFFL) << 8) |
        ((p(i + 2) & 0xFFL) << 16) | ((p(i + 3) & 0xFFL) << 24)
    def tag(i: Int, s: String): Boolean =
      i + 3 < p.length && p(i) == s(0).toByte && p(i + 1) == s(1).toByte &&
        p(i + 2) == s(2).toByte && p(i + 3) == s(3).toByte
    if (p.length < 28 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    // the cursor is Long and every declared size is range-checked BEFORE
    // advancing: a malicious chunk size near 2^31 (or 2^32-1) must return
    // None, never wrap the cursor negative into an ArrayIndexOutOfBounds —
    // one corrupt blob would otherwise fail the whole decode task instead
    // of degrading to the stub
    var i = 12L
    while (i + 8 <= p.length) {
      val ii = i.toInt
      val size = u32le(ii + 4)
      if (tag(ii, "fmt ")) {
        if (size < 16 || i + 8 + 16 > p.length) return None
        val channels = u16le(ii + 10).toLong
        val sampleRate = u32le(ii + 12)
        if (channels < 1 || sampleRate < 1) return None
        return Some((sampleRate, channels))
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8L + size + (size & 1L)
    }
    None
  }

  /** Rolling content checksum — the same 31-fold mod 1e9+7 the payload
    * checksum uses, over DECODED content bytes (PNG pixels / WAV PCM).
    */
  private def rollsum(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc = (acc * 31 + (bytes(i) & 0xFF)) % 1000000007L; i += 1 }
    acc
  }

  /** Cap on decompressed pixel-buffer size per blob (64 MiB): a PNG header
    * declaring absurd dimensions must degrade to header-only metadata, not
    * allocate executor memory on attacker-controlled numbers.
    */
  private final val MaxPixelBytes = 64L << 20

  /** REAL PNG pixel decode, JDK-only: concatenate the IDAT chunks' zlib
    * stream, inflate it with `java.util.zip.Inflater`, and reconstruct the
    * scanlines through the five standard PNG filters (None/Sub/Up/Average/
    * Paeth — plain byte arithmetic). Returns the unfiltered pixel bytes in
    * scanline order (the exact byte layout the IHDR declares: `channels ×
    * bit-depth` bits per pixel, rows padded to whole bytes), or None for
    * anything outside the decodable envelope — interlaced images (Adam7
    * needs seven sub-image passes; out of scope), declared buffers over
    * [[MaxPixelBytes]], truncated/corrupt zlib streams — so bad blobs
    * degrade to header-only metadata, never throw. Chunk CRCs are not
    * verified: corruption surfaces as an inflate failure, and a CRC pass
    * over every blob would double the per-byte cost for no extra signal.
    */
  private[operators] def pngPixelBytes(p: Array[Byte]): Option[Array[Byte]] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def u32(i: Int): Long =
      ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
        ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)
    if (p.length < 33) return None
    val width = u32(16)
    val height = u32(20)
    val depth = u8(24)
    val colorType = u8(25)
    val interlace = u8(28)
    if (interlace != 0 || width < 1 || height < 1) return None
    val channels = colorType match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette indices (the pixel bytes ARE the indices)
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    if (!Set(1, 2, 4, 8, 16).contains(depth)) return None
    val bitsPerPixel = channels * depth
    val rowBytes = (width * bitsPerPixel + 7) / 8
    val bpp = math.max(1, bitsPerPixel / 8) // filter step, whole bytes
    // cap each factor BEFORE multiplying: 2^31-scale declared dimensions
    // would overflow the Long product, wrap negative, and sail past the
    // size cap into a garbage allocation
    if (rowBytes > MaxPixelBytes || height > MaxPixelBytes) return None
    val rawSize = (rowBytes + 1) * height // +1 filter byte per scanline
    if (rawSize > MaxPixelBytes) return None
    // gather the IDAT zlib stream (IDAT chunks must be consecutive per the
    // spec, but the walk tolerates interleaved ancillary chunks)
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8L
    var sawEnd = false
    while (!sawEnd && i + 8 <= p.length) {
      val ii = i.toInt
      val len = u32(ii)
      if (i + 12 + len > p.length) return None // truncated chunk
      val typ = new String(p, ii + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(p, ii + 8, len.toInt)
      else if (typ == "IEND") sawEnd = true
      i += 12 + len
    }
    val z = idat.toByteArray
    if (z.isEmpty) return None
    val raw = new Array[Byte](rawSize.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(z)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // truncated stream, or a preset-dictionary stream (illegal in PNG)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
      if (off < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // unfilter in place into the pixel buffer (filter bytes dropped)
    val out = new Array[Byte]((rowBytes * height).toInt)
    val rb = rowBytes.toInt
    var r = 0
    while (r < height) {
      val filter = raw(r * (rb + 1)) & 0xFF
      val src = r * (rb + 1) + 1
      val dst = r * rb
      var x = 0
      while (x < rb) {
        val a = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0 // left
        val b = if (r > 0) out(dst - rb + x) & 0xFF else 0 // up
        val c = if (r > 0 && x >= bpp) out(dst - rb + x - bpp) & 0xFF else 0
        val rec = filter match {
          case 0 => raw(src + x) & 0xFF
          case 1 => (raw(src + x) & 0xFF) + a
          case 2 => (raw(src + x) & 0xFF) + b
          case 3 => (raw(src + x) & 0xFF) + ((a + b) >> 1)
          case 4 =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (raw(src + x) & 0xFF) + pred
          case _ => return None // invalid filter type
        }
        out(dst + x) = (rec & 0xFF).toByte
        x += 1
      }
      r += 1
    }
    Some(out)
  }

  /** REAL JPEG pixel decode, JDK-only: `javax.imageio.ImageIO`'s baseline
    * JPEG reader (the huffman/DCT entropy decode a hand-rolled parser can't
    * reasonably provide — same public-knowledge JDK class the PNG spec
    * already uses as its reference encoder). Output is CANONICALIZED to
    * row-major RGB triplets via `getRGB`, so the checksum does not depend
    * on the reader's internal raster layout (TYPE_3BYTE_BGR vs banded).
    * Dimensions are read from the reader BEFORE `read(0)` and checked
    * against [[MaxPixelBytes]] — attacker-declared dimensions must degrade
    * to header-only metadata, never allocate. Any decode failure
    * (truncated entropy stream, CMYK/arithmetic-coded variants the JDK
    * reader rejects) returns None: bad blobs degrade, never throw.
    */
  private[operators] def jpegPixelBytes(p: Array[Byte]): Option[Array[Byte]] = {
    var iis: javax.imageio.stream.ImageInputStream = null
    var reader: javax.imageio.ImageReader = null
    try {
      // MemoryCacheImageInputStream DIRECTLY, not ImageIO.createImageInputStream:
      // the factory defaults to a FileCacheImageInputStream (getUseCache=true),
      // which spools every in-memory payload to a disk temp file per decode —
      // doubled I/O and file-handle churn on the executor hot path
      iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(p))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      reader = readers.next()
      reader.setInput(iis, true, true)
      val w = reader.getWidth(0)
      val h = reader.getHeight(0)
      if (w < 1 || h < 1 || 3L * w * h > MaxPixelBytes) return None
      val img = reader.read(0)
      val out = new Array[Byte](3 * w * h)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val o = (y * w + x) * 3
          out(o) = ((rgb >> 16) & 0xFF).toByte
          out(o + 1) = ((rgb >> 8) & 0xFF).toByte
          out(o + 2) = (rgb & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      Some(out)
    } catch {
      case _: Exception => None
    } finally {
      if (reader != null) reader.dispose()
      if (iis != null) try iis.close() catch { case _: Exception => () }
    }
  }

  /** REAL WAV sample extraction: the PCM bytes of the `data` chunk, found
    * by the same range-checked RIFF walk as [[parseWavHeader]]. None when
    * the chunk is missing or its declared size runs past the payload.
    */
  private[operators] def wavPcmBytes(p: Array[Byte]): Option[Array[Byte]] = {
    def u32le(i: Int): Long =
      (p(i) & 0xFFL) | ((p(i + 1) & 0xFFL) << 8) |
        ((p(i + 2) & 0xFFL) << 16) | ((p(i + 3) & 0xFFL) << 24)
    def tag(i: Int, s: String): Boolean =
      i + 3 < p.length && p(i) == s(0).toByte && p(i + 1) == s(1).toByte &&
        p(i + 2) == s(2).toByte && p(i + 3) == s(3).toByte
    if (p.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12L
    while (i + 8 <= p.length) {
      val ii = i.toInt
      val size = u32le(ii + 4)
      if (tag(ii, "data")) {
        if (i + 8 + size > p.length) return None // declared size overruns
        return Some(java.util.Arrays.copyOfRange(p, ii + 8, (i + 8 + size).toInt))
      }
      i += 8L + size + (size & 1L)
    }
    None
  }

  /** STUB decoder: deterministic fake for payloads [[parseImageHeader]] /
    * [[parseWavHeader]] cannot handle (unknown containers, pixel-level
    * features). A real pipeline swaps this for the codec call; everything
    * around it (partition batching, output schema, null passthrough) is
    * production-shaped.
    */
  private def decodeStub(checksum: Long): (Long, Long) = {
    // deterministic fake derived from the payload checksum (a real codec
    // goes here); takes the checksum, not the bytes, so the corpus-sized
    // hot loop folds each payload exactly once
    val w = 16 + (checksum % 1920)
    val h = 16 + ((checksum / 7) % 1080)
    (w, h)
  }

  /** Header parse first (image, then audio), stub fallback:
    * (width, height, sample_rate, channels, checksum, content_checksum,
    * format). `format` is the parsed container ("png"/"jpeg"/"wav") or null
    * when the metadata came from the stub — downstream can filter on real
    * decodes. `content_checksum` is the rolling checksum of the DECODED
    * content — PNG unfiltered pixel bytes ([[pngPixelBytes]]: real IDAT
    * inflate + scanline reconstruction), JPEG canonical RGB raster
    * ([[jpegPixelBytes]]: the JDK ImageIO entropy decode), or WAV PCM data
    * bytes ([[wavPcmBytes]]) — null only for payloads outside the
    * decodable envelope; the header fields keep
    * whatever the container parse produced either way. Image rows carry
    * null audio fields and vice versa (a metadata table over a mixed
    * corpus is sparse by nature; readers select their modality).
    */
  private def decodeOne(payload: Array[Byte])
      : (java.lang.Long, java.lang.Long, java.lang.Long, java.lang.Long, Long, java.lang.Long, String) = {
    val checksum = rollsum(payload) // same fold; the helper avoids per-byte boxing
    parseImageHeader(payload) match {
      case Some((w, h, fmt)) =>
        val cc: java.lang.Long =
          if (fmt == "png") pngPixelBytes(payload).map(b => Long.box(rollsum(b))).orNull
          else jpegPixelBytes(payload).map(b => Long.box(rollsum(b))).orNull
        (w, h, null, null, checksum, cc, fmt)
      case None => parseWavHeader(payload) match {
        case Some((sr, ch)) =>
          val cc: java.lang.Long =
            wavPcmBytes(payload).map(b => Long.box(rollsum(b))).orNull
          (null, null, sr, ch, checksum, cc, "wav")
        case None =>
          val (w, h) = decodeStub(checksum)
          (w, h, null, null, checksum, null, null)
      }
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("sample_rate", LongType),
    StructField("channels", LongType),
    StructField("checksum", LongType),
    StructField("content_checksum", LongType),
    StructField("format", StringType)))

  /** Batched decode: one stub call per row, executed per partition — no
    * per-row task overhead, no driver involvement; the 100 TB path just
    * raises partition count.
    */
  // read nullable long columns as raw boxed values: getAs[Long] would unbox
  // a NULL to 0L, silently corrupting ids (and colliding with doc_id 0)
  private def raw(r: Row, name: String): Any = r.get(r.fieldIndex(name))

  def decode(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select("doc_id", "media_type", "payload", "n_bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          if (payload == null) {
            // null passthrough: missing blobs keep their row, metadata null
            Row(raw(r, "doc_id"), r.getAs[String]("media_type"),
              raw(r, "n_bytes"), null, null, null, null, null, null, null)
          } else {
            val (w, h, sr, ch, cs, cc, fmt) = decodeOne(payload)
            Row(raw(r, "doc_id"), r.getAs[String]("media_type"),
              raw(r, "n_bytes"), w, h, sr, ch, cs, cc, fmt)
          }
        }
      }(enc)
  }

  /** Same decode with explicit intra-partition micro-batches — the batch
    * shape a Pandas-UDF/`mapInPandas` (or Arrow-batched JNI codec) pipeline
    * has: the codec is handed `batchSize` payloads at once and returns a
    * batch of results, amortizing per-call overhead. Output is identical to
    * [[decode]].
    */
  def decodeBatched(media: DataFrame, batchSize: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select("doc_id", "media_type", "payload", "n_bytes")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // a real pipeline passes the whole batch to the codec in one call
          val decoded = batch.map { r =>
            Option(r.getAs[Array[Byte]]("payload")).map(decodeOne)
          }
          batch.iterator.zip(decoded.iterator).map {
            case (r, Some((w, h, sr, ch, cs, cc, fmt))) =>
              Row(raw(r, "doc_id"), r.getAs[String]("media_type"),
                raw(r, "n_bytes"), w, h, sr, ch, cs, cc, fmt)
            case (r, None) =>
              Row(raw(r, "doc_id"), r.getAs[String]("media_type"),
                raw(r, "n_bytes"), null, null, null, null, null, null, null)
          }
        }
      }(enc)
  }
}
