package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time per partition.
  *
  * The decode boundary (r11): REAL decode everywhere the JDK can do it —
  * [[decodePpm]] (binary PPM "P6": header parse + raw RGB planes) and
  * [[decodeWav]] (RIFF/WAVE chunk walk + 16-bit PCM samples) are pure
  * byte parsers with no dependency at all; PNG/JPEG/BMP/GIF/TIFF decode
  * through the JDK's built-in `javax.imageio` readers ([[decodeImage]])
  * and AIFF/AU (plus non-PCM WAVE variants) through
  * `javax.sound.sampled.AudioSystem` ([[decodeAudio]]) — both ship with
  * every stock JDK, zero added dependencies. [[decodeMedia]] dispatches
  * on magic bytes. `decodeStub` is now reserved for codecs the JDK
  * genuinely lacks (webp/mp3/h264/av1); the Spark-side shape is
  * identical either way — binary schema, per-partition batched
  * processing (the Scala analogue of `mapInPandas`), explicit output
  * schema — so an external codec for those drops into the same dispatch.
  */
object Multimodal {

  // ImageIO's default stream cache is a TEMP FILE per createImage{Input,
  // Output}Stream call (FileCacheImage*Stream) — every encode/decode of a
  // KB-sized in-memory payload paid a disk create+write+delete, and N
  // concurrent tasks contend on the temp filesystem (measured r19:
  // q_multimodal_resize 32-way REGRESSED 2.6 -> 4.6 s on a slow-I/O box
  // with the file cache; 0.9 s without it). Payloads here are bounded
  // in-memory byte arrays, so the memory-cached stream is strictly
  // better. JVM-global, set on class load in driver and executors alike
  // (every call site lives in this object).
  javax.imageio.ImageIO.setUseCache(false)

  /** Output schema of the decode stage. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = false)))

  /** Deterministic fake decode: dimensions/format/feature vector derived
    * from the payload bytes. Replace with a real codec in production. */
  def decodeStub(bytes: Array[Byte]): (String, Int, Int, Array[Double]) = {
    val n = bytes.length
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    // 8-dim "embedding": byte-sum histogram over 8 strides, normalized
    val feat = new Array[Double](8)
    var i = 0
    while (i < n) { feat(i % 8) += (bytes(i) & 0xFF); i += 1 }
    (fmt, width, height, feat.map(v => if (n > 0) v / n else 0.0))
  }

  // ------------------------------------------------------------------
  // REAL decoders for uncompressed containers (no codec dependency)
  // ------------------------------------------------------------------

  /** Binary PPM ("P6"): ASCII header `P6 <w> <h> <maxval>` (arbitrary
    * whitespace, `#` comments) then one whitespace byte, then w*h raw
    * RGB triplets. Returns (width, height, per-channel byte sums) or
    * None when the payload is not a well-formed P6 with maxval <= 255.
    */
  def decodePpm(b: Array[Byte]): Option[(Int, Int, Array[Long])] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var pos = 2
    def nextInt(): Option[Int] = {
      // skip whitespace and '#'-to-EOL comments
      var inComment = false
      while (pos < b.length && (inComment || b(pos).toChar.isWhitespace || b(pos) == '#')) {
        if (b(pos) == '#') inComment = true
        else if (b(pos) == '\n') inComment = false
        pos += 1
      }
      var v = 0L; var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); any = true; pos += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- nextInt(); h <- nextInt(); maxv <- nextInt()
      if w > 0 && h > 0 && maxv > 0 && maxv <= 255
      // exactly ONE whitespace byte separates the header from the planes
      if pos < b.length && b(pos).toChar.isWhitespace
      start = pos + 1
      if b.length - start >= 3L * w * h
    } yield {
      val sums = new Array[Long](3)
      var i = start
      val end = start + 3 * w * h
      while (i < end) { sums((i - start) % 3) += (b(i) & 0xFF); i += 1 }
      (w, h, sums)
    }
  }

  /** RIFF/WAVE with 16-bit PCM: walks the chunk list (fmt / data in any
    * order, odd-size padding honored). Returns (sampleRate, channels,
    * nSamples, sum of |sample|) or None when not a PCM-16 WAVE.
    */
  def decodeWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u16(o: Int) = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    def u32(o: Int) = (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    def tag(o: Int, s: String) = b.length >= o + 4 &&
      b(o) == s(0).toByte && b(o + 1) == s(1).toByte &&
      b(o + 2) == s(2).toByte && b(o + 3) == s(3).toByte
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    // LONG chunk positions throughout: a corrupt size near Int.MaxValue
    // must read as a malformed payload (None -> stub fallback), not wrap
    // negative past the loop guard and index b(negative)
    var pos = 12L
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1L; var dataLen = -1L
    while (pos + 8 <= b.length) {
      val p = pos.toInt
      val size = u32(p + 4)
      val body = pos + 8
      if (tag(p, "fmt ") && size >= 16 && body + 16 <= b.length) {
        val fmtCode = u16(body.toInt)
        if (fmtCode != 1) return None // PCM only
        channels = u16(body.toInt + 2)
        rate = u32(body.toInt + 4).toInt
        bits = u16(body.toInt + 14)
      } else if (tag(p, "data")) {
        dataOff = body; dataLen = size
      }
      pos = body + size + (size & 1L) // chunks pad to even
    }
    if (rate <= 0 || channels <= 0 || bits != 16 ||
        dataOff < 0 || dataOff + dataLen > b.length) return None
    val nSamples = (dataLen / 2).toInt // dataOff+dataLen <= b.length: fits Int
    var sumAbs = 0L
    var i = dataOff.toInt
    val end = dataOff.toInt + nSamples * 2
    while (i < end) {
      val s = ((b(i) & 0xFF) | (b(i + 1) << 8)).toShort.toInt
      sumAbs += math.abs(s)
      i += 2
    }
    Some((rate, channels, nSamples, sumAbs))
  }

  /** Nearest-neighbor resize of a binary PPM — a REAL pixel operation on
    * the decoded plane, re-encoded as P6 (the resize step of an
    * image-curation pipeline, runnable with zero codec deps on
    * uncompressed data). Returns None for non-P6 input. */
  def resizePpm(b: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] = {
    // target-dimension guard (ADVICE r10): the decoder paths return None
    // on malformed INPUT, so malformed TARGETS must not be the one way to
    // throw — non-positive dims would NegativeArraySizeException and
    // large ones overflow 3*newW*newH in Int arithmetic
    if (newW <= 0 || newH <= 0 || 3L * newW * newH > Int.MaxValue - 64L) return None
    decodePpm(b).map { case (w, h, _) =>
      // locate the plane start the same way the decoder did
      val headerEnd = {
        var pos = 2; var seen = 0; var inComment = false
        while (seen < 3 && pos < b.length) {
          if (b(pos) == '#') inComment = true
          else if (b(pos) == '\n') inComment = false
          if (!inComment && b(pos) >= '0' && b(pos) <= '9') {
            while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') pos += 1
            seen += 1
          } else pos += 1
        }
        pos + 1 // the single whitespace after maxval
      }
      val header = s"P6\n$newW $newH\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + 3 * newW * newH)
      System.arraycopy(header, 0, out, 0, header.length)
      var y = 0
      while (y < newH) {
        val sy = y.toLong * h / newH
        var x = 0
        while (x < newW) {
          val sx = x.toLong * w / newW
          val src = headerEnd + 3 * (sy.toInt * w + sx.toInt)
          val dst = header.length + 3 * (y * newW + x)
          out(dst) = b(src); out(dst + 1) = b(src + 1); out(dst + 2) = b(src + 2)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  // ------------------------------------------------------------------
  // JDK-built-in codec decoders (javax.imageio / javax.sound.sampled) —
  // present in every stock JDK, no external dependency
  // ------------------------------------------------------------------

  /** Magic-byte sniff for the formats the JDK's ImageIO readers cover.
    * Returns the canonical format name, or None. Trusting our own sniff
    * (not `reader.getFormatName`) keeps the emitted format string
    * deterministic across JDK vendors. */
  def sniffImageFormat(b: Array[Byte]): Option[String] = {
    if (b.length < 4) None
    else if ((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') Some("png")
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF) Some("jpeg")
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("gif")
    else if (b(0) == 'B' && b(1) == 'M') Some("bmp")
    else if ((b(0) == 'I' && b(1) == 'I' && (b(2) & 0xFF) == 0x2A && b(3) == 0) ||
             (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xFF) == 0x2A)) Some("tiff")
    else None
  }

  /** REAL compressed-image decode via the JDK's built-in `javax.imageio`
    * readers (PNG/JPEG/BMP/GIF/TIFF — all present in a stock JDK).
    * Returns (format, width, height, per-channel RGB sums) or None when
    * the payload is not one of those formats or fails to decode. PNG/BMP
    * /GIF are lossless, so the channel sums of a payload we encoded from
    * seeded pixels replay EXACTLY — the oracle hook. JPEG dims/format
    * are exact; its pixel sums are codec-defined (lossy DCT). */
  def decodeImage(b: Array[Byte]): Option[(String, Int, Int, Array[Long])] =
    sniffImageFormat(b).flatMap { fmt =>
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, true, true)
              val img = reader.read(0)
              val w = img.getWidth; val h = img.getHeight
              // bulk ARGB grab — one array copy, not w*h getRGB calls
              val px = img.getRGB(0, 0, w, h, null, 0, w)
              val sums = new Array[Long](3)
              var i = 0
              while (i < px.length) {
                val p = px(i)
                sums(0) += (p >> 16) & 0xFF
                sums(1) += (p >> 8) & 0xFF
                sums(2) += p & 0xFF
                i += 1
              }
              Some((fmt, w, h, sums))
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }
    }

  /** REAL audio decode via `javax.sound.sampled.AudioSystem` for the
    * containers the pure WAV parser doesn't cover: AIFF and AU (both
    * JDK-built-in), plus any RIFF/WAVE variant `decodeWav` rejects
    * (e.g. float PCM). Returns (container, sampleRate, channels,
    * nSamples, sumAbs over 16-bit samples) or None. Non-16-bit streams
    * decode metadata-only (sumAbs = 0). */
  def decodeAudio(b: Array[Byte]): Option[(String, Int, Int, Int, Long)] = {
    def tag4(o: Int, s: String) = b.length >= o + 4 &&
      b(o) == s(0).toByte && b(o + 1) == s(1).toByte &&
      b(o + 2) == s(2).toByte && b(o + 3) == s(3).toByte
    val container =
      if (tag4(0, "FORM") && (tag4(8, "AIFF") || tag4(8, "AIFC"))) "aiff"
      else if (tag4(0, ".snd")) "au"
      else if (tag4(0, "RIFF") && tag4(8, "WAVE")) "wav"
      else return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val fmt = ais.getFormat
        val data = ais.readAllBytes()
        val sixteenBitPcm =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16
        val nSamples = if (sixteenBitPcm) data.length / 2 else 0
        var sumAbs = 0L
        if (sixteenBitPcm) {
          var i = 0
          while (i + 1 < data.length) {
            val s =
              if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort.toInt
              else ((data(i) & 0xFF) | (data(i + 1) << 8)).toShort.toInt
            sumAbs += math.abs(s)
            i += 2
          }
        }
        Some((container, fmt.getSampleRate.toInt, fmt.getChannels, nSamples, sumAbs))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Nearest-neighbor resize of any ImageIO-decodable payload
    * (PNG/JPEG/BMP/GIF/TIFF), re-encoded as PNG — the compressed-format
    * counterpart of [[resizePpm]], with the SAME explicit pixel loop
    * (Graphics2D scaling filters vary by implementation; an own NN loop
    * plus lossless PNG re-encode keeps the byte output deterministic
    * for a given input). Returns None for non-image payloads or
    * malformed target dims. */
  def resizeImage(b: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] = {
    if (newW <= 0 || newH <= 0 || 3L * newW * newH > Int.MaxValue - 64L) return None
    sniffImageFormat(b).flatMap { _ =>
      try {
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (src == null) None
        else {
          val w = src.getWidth; val h = src.getHeight
          val out = new java.awt.image.BufferedImage(
            newW, newH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < newH) {
            val sy = (y.toLong * h / newH).toInt
            var x = 0
            while (x < newW) {
              val sx = (x.toLong * w / newW).toInt
              out.setRGB(x, y, src.getRGB(sx, sy) & 0xFFFFFF)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      } catch { case _: Exception => None }
    }
  }

  /** Output schema of the media decode stage: one row per payload with
    * the union of image and audio metadata (unused slots zeroed) plus
    * exact integer features (channel byte sums / abs-amplitude sum) so
    * results stay hashable cross-engine. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("feat_sums", ArrayType(LongType), nullable = false)))

  /** Batched per-partition media decode with REAL decoders, dispatched
    * on magic bytes: P6 -> pure PPM parser, RIFF/WAVE -> pure PCM-16
    * chunk walk, PNG/JPEG/BMP/GIF/TIFF -> JDK `javax.imageio`,
    * AIFF/AU (+ non-PCM16 WAVE fallback) -> JDK `javax.sound.sampled`.
    * Only formats the JDK has no codec for (webp/mp3/h264/...) reach the
    * documented stub (format "stub/<ext>"). */
  def decodeMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val rows = df.select(col(idCol).cast("long"), col(payloadCol))
    val enc = Encoders.row(mediaSchema)
    rows.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        decodePpm(bytes) match {
          case Some((w, h, sums)) =>
            Row(id, "ppm", w, h, 3, 0, w.toLong * h, sums.toSeq)
          case None => decodeWav(bytes) match {
            case Some((rate, ch, n, sumAbs)) =>
              Row(id, "wav", 0, 0, ch, rate, n.toLong, Seq(sumAbs))
            case None => decodeImage(bytes) match {
              case Some((fmt, w, h, sums)) =>
                Row(id, fmt, w, h, 3, 0, w.toLong * h, sums.toSeq)
              case None => decodeAudio(bytes) match {
                case Some((container, rate, ch, n, sumAbs)) =>
                  Row(id, container, 0, 0, ch, rate, n.toLong, Seq(sumAbs))
                case None =>
                  val (fmt, w, h, _) = decodeStub(bytes)
                  Row(id, s"stub/$fmt", w, h, 0, 0, 0L, Seq.empty[Long])
              }
            }
          }
        }
      }
    }(enc)
  }

  /** Batched per-partition decode over a (id, payload binary) frame —
    * the Scala analogue of mapInPandas: one iterator pass per partition,
    * no per-row task overhead, output schema declared up front.
    */
  def decode(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val rows = df.select(col(idCol).cast("long"), col(payloadCol))
    val enc = Encoders.row(decodedSchema)
    rows.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (fmt, w, h, feat) = decodeStub(bytes)
        Row(id, bytes.length, fmt, w, h, feat.toSeq)
      }
    }(enc)
  }

  /** Deterministic P6 payload for doc `id` — the fixture the catalog
    * entry feeds [[decodeMedia]]: dims and every pixel byte are pure
    * arithmetic in `id`, so a DuckDB oracle replays the decoded metadata
    * WITHOUT parsing bytes, and any off-by-one in the real parser breaks
    * the hash compare. */
  def syntheticPpm(id: Long): Array[Byte] = {
    val w = (id % 13 + 2).toInt; val h = (id % 7 + 2).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var j = 0
    while (j < 3 * w * h) {
      out(header.length + j) = ((id * 31 + j) % 256).toByte
      j += 1
    }
    out
  }

  /** Deterministic COMPRESSED image payload for doc `id`, encoded with
    * the JDK's own `ImageIO.write` (`fmt` = "png" | "jpeg" | "bmp" |
    * "gif"): dims and every pixel channel are the SAME arithmetic in
    * `id` as [[syntheticPpm]] (channel j of the row-major RGB plane =
    * (id*31 + j) % 256), so for the lossless formats (png/bmp) a DuckDB
    * oracle replays the decoded width/height AND channel sums without
    * touching bytes — the real ImageIO decode round-trip is what's under
    * test. JPEG's sums are lossy-codec-defined; its dims/format still
    * replay. */
  def syntheticImage(id: Long, fmt: String): Array[Byte] = {
    val w = (id % 13 + 2).toInt; val h = (id % 7 + 2).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      val j = 3L * p
      val r = ((id * 31 + j) % 256).toInt
      val g = ((id * 31 + j + 1) % 256).toInt
      val b = ((id * 31 + j + 2) % 256).toInt
      img.setRGB(p % w, p / w, (r << 16) | (g << 8) | b)
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, fmt, bos))
      throw new IllegalArgumentException(s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  /** Deterministic PCM-16 WAVE payload for doc `id` (canonical 44-byte
    * header, mono, 8 kHz): sample i = (id*7 + 13i) % 2001 - 1000. Same
    * oracle-replayability contract as [[syntheticPpm]]. */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = (id % 50 + 10).toInt
    val dataLen = 2 * n
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      buf.putShort((((id * 7 + 13L * i) % 2001) - 1000).toShort)
      i += 1
    }
    buf.array()
  }

  /** Deterministic AIFF payload for doc `id`, encoded with the JDK's own
    * `AudioSystem.write` (mono PCM-16 big-endian, 8 kHz): sample i =
    * (id*7 + 13i) % 2001 - 1000 — the SAME arithmetic as
    * [[syntheticWav]], so the oracle replays the decoded sample count
    * and |sample| sum while the real `javax.sound` container parse is
    * what's under test. */
  def syntheticAiff(id: Long): Array[Byte] = {
    val n = (id % 50 + 10).toInt
    val pcm = java.nio.ByteBuffer.allocate(2 * n) // AIFF PCM is big-endian
    var i = 0
    while (i < n) {
      pcm.putShort((((id * 7 + 13L * i) % 2001) - 1000).toShort)
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    bos.toByteArray
  }

  /** Frame-sampling stub for video-ish payloads: emits every `stride`-th
    * 1 KiB chunk as a "frame" with its offset — the partitioning/explode
    * shape of real frame extraction. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   stride: Int = 4): DataFrame = {
    val nChunks = ceil(octet_length(col(payloadCol)) / lit(1024.0)).cast("int")
    df.select(col(idCol), col(payloadCol),
        posexplode(sequence(lit(0), greatest(nChunks - 1, lit(0)), lit(stride))))
      .select(col(idCol), col("col").as("frame_idx"),
        col(payloadCol).substr(col("col") * 1024 + 1, lit(1024)).as("frame_bytes"))
  }
}
