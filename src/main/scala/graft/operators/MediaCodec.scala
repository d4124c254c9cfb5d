package graft.operators

/** Pure-JVM decoders (and test encoders) for the media formats the
  * pipeline meets: BMP (uncompressed 24-bpp), binary PPM (P6), and WAV
  * (PCM) are header-parse + raw-sample formats decoded byte-for-byte
  * here; PNG and JPEG decode through the JDK's built-in
  * `javax.imageio` readers (part of every JDK — no external codec
  * library). Width/height/frames/brightness always come from the
  * actual bytes; formats with no JVM decoder (e.g. H.264) yield None
  * and the caller emits a typed "undecodable" row.
  *
  * Feature mapping for audio (documented contract): `width` carries the
  * sample rate, `height` the channel count, `n_frames` the per-channel
  * sample-frame count, `brightness` the mean absolute amplitude
  * normalized to [0, 1].
  *
  * Everything here is per-row byte work with no Spark dependency — it
  * runs inside `mapPartitions` batches and scales with the partition
  * count, exactly like a JNI codec would.
  */
object MediaCodec {

  // ImageIO's default stream cache is DISK-BACKED: every read(), even
  // of an in-memory byte array, creates and deletes a temp file. For
  // per-row decodes inside mapPartitions that temp-file churn dominates
  // the actual decode (measured ~2× on the m7 bench). One per-JVM flag
  // set at class-init time (each executor pays it once) switches
  // ImageIO to in-memory stream caching.
  //
  // GLOBAL SIDE EFFECT (r10 advice): `setUseCache` mutates
  // process-wide JVM state — any co-hosted code using ImageIO in the
  // same executor JVM loses disk-backed stream caching from the moment
  // this object first loads. That trade is right for this engine (all
  // decode inputs are in-memory byte arrays; disk spooling is pure
  // overhead for them), but a co-tenant decoding multi-GB streams from
  // slow channels would want the flag set/restored around these call
  // sites instead. Kept global here because per-call toggling races
  // across decoder threads within one executor.
  javax.imageio.ImageIO.setUseCache(false)

  final case class Decoded(
      mime: String, width: Int, height: Int, nFrames: Int, brightness: Double)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Sniff + parse. None = not a format this engine decodes (caller
    * emits a typed "undecodable" row, never fabricated features). */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E') decodeWav(bytes)
    else if (isPng(bytes)) decodeImageIo(bytes, "image/png")
    else if (isJpeg(bytes)) decodeImageIo(bytes, "image/jpeg")
    else None

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  /** PNG / JPEG via the JDK's built-in ImageIO readers (javax.imageio —
    * part of the JDK, no external deps, headless-safe). Brightness =
    * mean of the R,G,B channel bytes / 255 over all pixels — the same
    * statistic [[decodeBmp]] computes over its raw 24-bpp bytes. */
  private def decodeImageIo(b: Array[Byte], mime: String): Option[Decoded] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some(Decoded(mime, w, h, 1, sum.toDouble / (3.0 * w * h) / 255.0))
      }
      // NonFatal, not just IOException: ImageIO readers throw UNCHECKED
      // exceptions on malformed payloads (CMMException on bad ICC
      // profiles, IllegalArgumentException / array-bounds on crafted
      // headers). A corrupt blob must yield the typed "undecodable"
      // row, never crash the Spark task.
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Uncompressed 24-bpp BMP (BITMAPINFOHEADER). Brightness = mean pixel
    * byte / 255 over the pixel array, EXCLUDING the per-row padding that
    * pads strides to 4 bytes. */
  private def decodeBmp(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 54) return None
    val pixelOff = le32(b, 10)
    val width = le32(b, 18)
    val heightRaw = le32(b, 22)
    val height = math.abs(heightRaw)
    val bpp = le16(b, 28)
    if (width <= 0 || height == 0 || bpp != 24 || pixelOff < 54) return None
    // all size math in Long: a hostile width up to 2^31-1 overflows
    // Int (negative stride) and would defeat the bound check below
    val rowBytesL = width.toLong * 3
    val strideL = (rowBytesL + 3) / 4 * 4
    if (pixelOff.toLong + strideL * height > b.length) return None
    val rowBytes = rowBytesL.toInt
    val stride = strideL.toInt
    var sum = 0L
    var r = 0
    while (r < height) {
      val base = pixelOff + r * stride
      var i = 0
      while (i < rowBytes) { sum += b(base + i) & 0xff; i += 1 }
      r += 1
    }
    val n = rowBytes.toLong * height
    Some(Decoded("image/bmp", width, height, 1, sum.toDouble / n / 255.0))
  }

  /** ONE P6 header parse shared by [[decodePpm]] and [[grayPixels]]:
    * "P6" <ws> width <ws> height <ws> maxval <single ws>, '#' comments
    * allowed; returns (width, height, maxval, pixelStart) with the
    * `pixelStart + 3·w·h <= length` bound already validated — the two
    * consumers can't drift apart on bounds (r6 advice). */
  private def ppmHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var pos = 2
    def skipWs(): Unit = {
      var in = true
      while (in && pos < b.length) {
        val c = b(pos)
        if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else in = false
      }
    }
    def readInt(): Option[Int] = {
      skipWs()
      var v = 0L
      var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); any = true; pos += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- readInt()
      h <- readInt()
      maxv <- readInt()
      // 8-bit samples only (maxval < 256); 2-byte samples not needed here
      if w > 0 && h > 0 && maxv > 0 && maxv < 256 && pos < b.length
      _ = { pos += 1 } // the single whitespace after maxval
      if pos + w.toLong * h * 3 <= b.length
    } yield (w, h, maxv, pos)
  }

  /** Binary PPM: header via [[ppmHeader]]; brightness = mean sample /
    * maxval. */
  private def decodePpm(b: Array[Byte]): Option[Decoded] =
    ppmHeader(b).map { case (w, h, maxv, start) =>
      val n = w.toLong * h * 3
      var sum = 0L
      var i = 0
      while (i < n) { sum += b(start + i) & 0xff; i += 1 }
      Decoded("image/x-portable-pixmap", w, h, 1, sum.toDouble / n / maxv)
    }

  /** RIFF/WAVE with PCM "fmt " + "data" chunks. 8-bit unsigned or
    * 16-bit signed little-endian samples. */
  /** One RIFF chunk-walk shared by [[decodeWav]] and [[pcmSamples16]]:
    * (channels, sampleRate, bits, dataOff, dataLen) for a well-formed
    * uncompressed-PCM WAV; None otherwise. Keeps the hostile-size
    * bounds and the frame-alignment validation in ONE place so the two
    * consumers can't drift apart. */
  private def wavPcmLayout(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (b.length < 12 ||
      new String(b, 0, 4, java.nio.charset.StandardCharsets.US_ASCII) != "RIFF" ||
      new String(b, 8, 4, java.nio.charset.StandardCharsets.US_ASCII) != "WAVE")
      return None
    var pos = 12
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var dataOff = -1
    var dataLen = 0
    while (pos + 8 <= b.length) {
      val id = new String(b, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, pos + 4)
      // Long bound check: a hostile ~2^31 declared size overflows Int
      // and would slip past an Int comparison into the read loops
      if (size < 0 || pos.toLong + 8 + size > b.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = le16(b, pos + 8)
          if (audioFormat != 1) return None // PCM only
          channels = le16(b, pos + 10)
          sampleRate = le32(b, pos + 12)
          bits = le16(b, pos + 22)
        case "data" =>
          dataOff = pos + 8
          dataLen = size
        case _ => ()
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (channels <= 0 || sampleRate <= 0 || dataOff < 0 || (bits != 8 && bits != 16))
      return None
    val bytesPerFrame = channels * bits / 8
    if (bytesPerFrame == 0 || dataLen % bytesPerFrame != 0) return None
    Some((channels, sampleRate, bits, dataOff, dataLen))
  }

  private def decodeWav(b: Array[Byte]): Option[Decoded] = {
    val (channels, sampleRate, bits, dataOff, dataLen) = wavPcmLayout(b) match {
      case Some(layout) => layout
      case None => return None
    }
    val nFrames = dataLen / (channels * bits / 8)
    val nSamples = dataLen / (bits / 8)
    var sum = 0.0
    var i = 0
    while (i < nSamples) {
      sum += (if (bits == 8) math.abs((b(dataOff + i) & 0xff) - 128) / 128.0
              else math.abs(le16(b, dataOff + i * 2).toShort.toInt) / 32768.0)
      i += 1
    }
    val brightness = if (nSamples == 0) 0.0 else sum / nSamples
    Some(Decoded("audio/wav", sampleRate, channels, nFrames, brightness))
  }

  /** Grayscale pixel matrix of a BMP or PPM payload: (width, height,
    * gray) with gray(y * width + x) = r + g + b (0..765) in TOP-DOWN
    * row order — BMP's bottom-up storage is flipped here so spatial
    * operators (resize, cropping, grid features) see one orientation
    * regardless of the container. None for non-image payloads. */
  def grayPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    // BMP branch: same header fields decodeBmp validates
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') {
      val pixelOff = le32(b, 10)
      val width = le32(b, 18)
      val heightRaw = le32(b, 22)
      val height = math.abs(heightRaw)
      val bpp = le16(b, 28)
      if (width <= 0 || height == 0 || bpp != 24 || pixelOff < 54) return None
      val rowBytesL = width.toLong * 3
      val strideL = (rowBytesL + 3) / 4 * 4
      if (pixelOff.toLong + strideL * height > b.length) return None
      if (width.toLong * height > Int.MaxValue / 4) return None
      val stride = strideL.toInt
      val gray = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        // positive height = bottom-up storage; negative = top-down
        val srcRow = if (heightRaw > 0) height - 1 - y else y
        val base = pixelOff + srcRow * stride
        var x = 0
        while (x < width) {
          val i = base + x * 3
          gray(y * width + x) = (b(i) & 0xff) + (b(i + 1) & 0xff) + (b(i + 2) & 0xff)
          x += 1
        }
        y += 1
      }
      Some((width, height, gray))
    } else if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
      // PPM P6 is already top-down; pixel start + bounds come from the
      // SAME header parse decodePpm uses (ppmHeader validates
      // start + 3·w·h <= length, so the loop below can't walk off the end)
      ppmHeader(b) match {
        case Some((w, h, _, start)) if w.toLong * h <= Int.MaxValue / 4 =>
          val gray = new Array[Int](w * h)
          var p = 0
          while (p < w * h) {
            val i = start + p * 3
            gray(p) = (b(i) & 0xff) + (b(i + 1) & 0xff) + (b(i + 2) & 0xff)
            p += 1
          }
          Some((w, h, gray))
        case _ => None
      }
    } else if (isPng(b) || isJpeg(b)) {
      // ImageIO containers: BufferedImage is already top-down
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0 ||
          img.getWidth.toLong * img.getHeight > Int.MaxValue / 4) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val gray = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              gray(y * w + x) =
                ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          Some((w, h, gray))
        }
        // same NonFatal contract as decodeImageIo: hostile bytes → None
      } catch { case scala.util.control.NonFatal(_) => None }
    } else None
  }

  /** Raw 16-bit PCM samples of a WAV payload: (sampleRate, channels,
    * interleaved samples). The frame-sampling/windowing operators need
    * the samples themselves, not the summary [[decode]] returns. Bounds
    * and layout validation are [[wavPcmLayout]]'s — shared with
    * [[decodeWav]], not duplicated. */
  def pcmSamples16(b: Array[Byte]): Option[(Int, Int, Array[Short])] =
    wavPcmLayout(b) match {
      case Some((channels, sampleRate, 16, dataOff, dataLen)) =>
        val out = new Array[Short](dataLen / 2)
        var i = 0
        while (i < out.length) { out(i) = le16(b, dataOff + i * 2).toShort; i += 1 }
        Some((sampleRate, channels, out))
      case _ => None // absent, malformed, or 8-bit PCM
    }

  // ---- encoders: deterministic payload builders for the synthetic
  // corpus and the round-trip specs (ground truth by construction) ----

  /** 24-bpp BMP filled with one byte value (all three channels). */
  def encodeBmp(width: Int, height: Int, fill: Byte): Array[Byte] = {
    val rowBytes = width * 3
    val stride = (rowBytes + 3) / 4 * 4
    val pixelBytes = stride * height
    val out = new Array[Byte](54 + pixelBytes)
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putLe32(off: Int, v: Int): Unit = {
      putLe16(off, v & 0xffff); putLe16(off + 2, (v >>> 16) & 0xffff)
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, out.length); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, width); putLe32(22, height)
    putLe16(26, 1); putLe16(28, 24)
    putLe32(34, pixelBytes)
    var r = 0
    while (r < height) {
      var i = 0
      while (i < rowBytes) { out(54 + r * stride + i) = fill; i += 1 }
      r += 1
    }
    out
  }

  /** 24-bpp BMP from a top-down per-pixel function (all three channels
    * get `pix(x, y)`); rows are stored bottom-up as positive-height
    * BMPs require, so [[grayPixels]] must flip them back. */
  def encodeBmpPixels(width: Int, height: Int, pix: (Int, Int) => Byte): Array[Byte] = {
    val out = encodeBmp(width, height, 0.toByte)
    val stride = (width * 3 + 3) / 4 * 4
    var y = 0
    while (y < height) {
      val base = 54 + (height - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < width) {
        val v = pix(x, y)
        out(base + x * 3) = v; out(base + x * 3 + 1) = v; out(base + x * 3 + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- multi-frame container (the "video" envelope for the
  // frame-sampling path): "GFTV" + u32 frame count + per frame a u32
  // length prefix and the raw frame payload (any decodable format) ----

  /** Encode frames into the GFTV container. */
  def encodeFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(4 + _.length).sum
    val out = new Array[Byte](total)
    out(0) = 'G'; out(1) = 'F'; out(2) = 'T'; out(3) = 'V'
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(4, frames.length)
    var pos = 8
    frames.foreach { f =>
      putLe32(pos, f.length); pos += 4
      System.arraycopy(f, 0, out, pos, f.length); pos += f.length
    }
    out
  }

  /** Split a GFTV container back into frame payloads; None if the
    * magic is absent or any declared length walks out of bounds. */
  def frames(b: Array[Byte]): Option[Array[Array[Byte]]] = {
    if (b.length < 8 || b(0) != 'G' || b(1) != 'F' || b(2) != 'T' || b(3) != 'V')
      return None
    val n = le32(b, 4)
    if (n < 0 || n > b.length) return None // a frame needs >= 4 bytes of header
    val out = new Array[Array[Byte]](n)
    var pos = 8
    var i = 0
    while (i < n) {
      if (pos + 4 > b.length) return None
      val len = le32(b, pos)
      pos += 4
      if (len < 0 || pos.toLong + len > b.length) return None
      out(i) = java.util.Arrays.copyOfRange(b, pos, pos + len)
      pos += len
      i += 1
    }
    Some(out)
  }

  /** P6 PPM filled with one sample value, maxval 255. */
  def encodePpm(width: Int, height: Int, fill: Byte): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    java.util.Arrays.fill(out, header.length, out.length, fill)
    out
  }

  /** Mono/stereo 16-bit PCM WAV from explicit samples (interleaved). */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putLe32(off: Int, v: Int): Unit = {
      putLe16(off, v & 0xffff); putLe16(off + 2, (v >>> 16) & 0xffff)
    }
    def putAscii(off: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    putAscii(0, "RIFF"); putLe32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16); putLe16(20, 1); putLe16(22, channels)
    putLe32(24, sampleRate); putLe32(28, sampleRate * channels * 2)
    putLe16(32, channels * 2); putLe16(34, 16)
    putAscii(36, "data"); putLe32(40, dataLen)
    var i = 0
    while (i < samples.length) { putLe16(44 + i * 2, samples(i) & 0xffff); i += 1 }
    out
  }

  private def solidImage(width: Int, height: Int, fill: Byte) = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val v = fill & 0xff
    val rgb = (v << 16) | (v << 8) | v
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    img
  }

  private def writeImageIo(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Solid-fill PNG via the JDK ImageIO writer. PNG is lossless, so the
    * decoded pixels are EXACTLY the fill value — pinned-pixel oracle. */
  def encodePng(width: Int, height: Int, fill: Byte): Array[Byte] =
    writeImageIo(solidImage(width, height, fill), "png")

  /** Solid-fill JPEG via the JDK ImageIO writer. Lossy: a solid image
    * quantizes to within a few gray levels of the fill (DC-only blocks),
    * so consumers check |mean − fill/255| within a small tolerance. */
  def encodeJpeg(width: Int, height: Int, fill: Byte): Array[Byte] =
    writeImageIo(solidImage(width, height, fill), "jpg")

  /** Grayscale PNG from a top-down per-pixel function (all three
    * channels get `pix(x, y)`) — the lossless ImageIO counterpart of
    * [[encodeBmpPixels]], so the perceptual-dedup corpus can carry the
    * SAME pixel pattern in two byte-incompatible containers. */
  def encodePngPixels(width: Int, height: Int, pix: (Int, Int) => Byte): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = pix(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    writeImageIo(img, "png")
  }

  // dHash geometry: a (DHASH_COLS+1)×DHASH_ROWS pooled grid yields
  // DHASH_COLS horizontal gradients per row = 64 bits total
  val DHASH_COLS = 8
  val DHASH_ROWS = 8

  /** 64-bit difference hash (dHash) of a decoded grayscale matrix —
    * the perceptual fingerprint that survives re-encoding and integer
    * resizing: the image is average-pooled to a 9×8 grid (integer cell
    * bounds `gx·w/9 … (gx+1)·w/9`, exact sums), and bit `gy·8+gx` is
    * set iff the pooled mean strictly increases from cell gx to gx+1
    * (cross-multiplied — no division, no rounding). Pooling is scale-
    * invariant for integer upscales (a w=9s image pools each source
    * cell exactly), and any monotone per-pixel transform (lossless
    * re-encode, channel-summed gray) preserves every comparison — so
    * byte-different containers of the same picture hash identically,
    * which is exactly the near-dup class md5 digest dedup (m6) misses.
    * None for images smaller than the pooled grid (no cell may be
    * empty — undersized thumbnails are not meaningfully comparable). */
  def dHash64(width: Int, height: Int, gray: Array[Int]): Option[Long] = {
    val cols = DHASH_COLS + 1
    if (width < cols || height < DHASH_ROWS) return None
    // pooled sums + areas per cell (areas differ when w % 9 != 0)
    val sums = new Array[Long](cols * DHASH_ROWS)
    val areas = new Array[Long](cols * DHASH_ROWS)
    var gy = 0
    while (gy < DHASH_ROWS) {
      val y0 = gy * height / DHASH_ROWS
      val y1 = (gy + 1) * height / DHASH_ROWS
      var gx = 0
      while (gx < cols) {
        val x0 = gx * width / cols
        val x1 = (gx + 1) * width / cols
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += gray(y * width + x); x += 1 }
          y += 1
        }
        sums(gy * cols + gx) = sum
        areas(gy * cols + gx) = (x1 - x0).toLong * (y1 - y0)
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    gy = 0
    while (gy < DHASH_ROWS) {
      var gx = 0
      while (gx < DHASH_COLS) {
        val i = gy * cols + gx
        // mean(gx+1) > mean(gx) via cross-multiplication — exact
        if (sums(i + 1) * areas(i) > sums(i) * areas(i + 1))
          hash |= 1L << (gy * DHASH_COLS + gx)
        gx += 1
      }
      gy += 1
    }
    Some(hash)
  }

  /** 64-bit delta-sign fingerprint of a PCM sample stream — the audio
    * twin of [[dHash64]] (the sign-of-difference primitive behind
    * Haitsma–Kalker-style audio fingerprints): bit i is set iff sample
    * i+1 strictly exceeds sample i over the first 65 samples. The
    * comparison chain is invariant under any positive gain (volume
    * re-mastering scales every sample by the same factor — exactly the
    * byte-different/perceptually-identical duplicate class for audio),
    * and integer-exact (no FFT, no floats). None for clips shorter
    * than 65 samples — too short to fingerprint comparably. */
  def audioDeltaHash64(samples: Array[Short]): Option[Long] = {
    if (samples.length < 65) return None
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (samples(i + 1) > samples(i)) hash |= 1L << i
      i += 1
    }
    Some(hash)
  }
}
