package graft.operators

/** Pure-JVM media container codecs — REAL byte-level parsers/writers, no
  * native libraries: binary PPM (P6) for uncompressed images, RIFF/WAV
  * PCM-16 for audio, back-to-back PPM frames for video (the MJPEG
  * pattern with raw frames), and — via the JDK's built-in `javax.imageio`
  * plugins, so still no external dependency — PNG and JPEG for
  * compressed images ([[ImageIoCodec]]). These let the multimodal stages
  * do genuine decode/transform work — header parsing, dimension
  * validation, pixel-grid resampling, sample-domain features — with the
  * stub codec remaining ONLY as the stand-in for formats outside that
  * set (H.264 et al.).
  */
object PpmCodec {
  /** Strict binary-PPM header: `P6\n<w> <h>\n255\n` + w*h*3 RGB bytes. */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != $w x $h x 3")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse just the P6 header starting at `off`: Some((w, h, absolute
    * raster start)) after validating that the full raster is present —
    * no byte copying, so concatenated-frame scans stay O(total bytes). */
  def parseHeaderAt(payload: Array[Byte], off: Int): Option[(Int, Int, Int)] = {
    if (payload.length - off < 2 || payload(off) != 'P' || payload(off + 1) != '6') return None
    var i = off + 2
    def skipWs(): Unit = {
      while (i < payload.length && (payload(i) == ' ' || payload(i) == '\n' ||
        payload(i) == '\t' || payload(i) == '\r')) i += 1
    }
    def readInt(): Int = {
      skipWs()
      var v = 0L
      var any = false
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        // saturating: absurd digit runs must not wrap an Int (the raster
        // bound below then rejects them)
        v = math.min(v * 10 + (payload(i) - '0'), Int.MaxValue.toLong)
        i += 1; any = true
      }
      if (any) v.toInt else -1
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    if (w <= 0 || h <= 0 || maxv != 255) return None
    // the mandatory single whitespace after maxval — anything else is a
    // malformed header, not a one-byte raster shift
    if (i >= payload.length ||
      !(payload(i) == ' ' || payload(i) == '\n' || payload(i) == '\t' || payload(i) == '\r'))
      return None
    i += 1
    // long math: adversarial header dims must yield None, not int overflow
    val raster = w.toLong * h * 3
    if (raster > Int.MaxValue || payload.length - i < raster) return None
    Some((w, h, i))
  }

  /** Parse a binary PPM; None if the payload is not a well-formed P6
    * with maxval 255 and a complete raster. */
  def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    parseHeaderAt(payload, 0).map { case (w, h, start) =>
      (w, h, java.util.Arrays.copyOfRange(payload, start, start + w * h * 3))
    }

  /** Nearest-neighbor resample on the real pixel grid (per-channel). */
  def resizeNearest(w: Int, h: Int, rgb: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * h / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * w / outW).toInt
        val src = (sy * w + sx) * 3
        val dst = (y * outW + x) * 3
        out(dst) = rgb(src); out(dst + 1) = rgb(src + 1); out(dst + 2) = rgb(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** 16-dim image features: 3 channel means + 13-bin luminance histogram
    * (all in [0, 1]). */
  def features(w: Int, h: Int, rgb: Array[Byte]): Array[Float] = {
    val out = new Array[Float](Multimodal.StubCodec.FeatureDim)
    val n = w * h
    if (n == 0) return out
    val hist = new Array[Int](13)
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < n) {
      val rv = rgb(3 * i) & 0xFF; val gv = rgb(3 * i + 1) & 0xFF; val bv = rgb(3 * i + 2) & 0xFF
      r += rv; g += gv; b += bv
      val luma = (rv * 299 + gv * 587 + bv * 114) / 1000
      hist(math.min(12, luma * 13 / 256)) += 1
      i += 1
    }
    out(0) = r.toFloat / n / 255f; out(1) = g.toFloat / n / 255f; out(2) = b.toFloat / n / 255f
    var j = 0
    while (j < 13) { out(3 + j) = hist(j).toFloat / n; j += 1 }
    out
  }
}

object WavCodec {
  /** Minimal RIFF/WAVE writer: PCM 16-bit mono little-endian. */
  def encode(sampleRateHz: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRateHz).putInt(sampleRateHz * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a PCM-16 mono WAV; None unless the fmt/data chunks are sane. */
  def decode(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); bb.get(riff)
    if (new String(riff, "US-ASCII") != "RIFF") return None
    bb.getInt()
    val wave = new Array[Byte](4); bb.get(wave)
    if (new String(wave, "US-ASCII") != "WAVE") return None
    val fmt = new Array[Byte](4); bb.get(fmt)
    if (new String(fmt, "US-ASCII") != "fmt ") return None
    val fmtLen = bb.getInt()
    if (fmtLen < 16) return None
    val audioFormat = bb.getShort(); val channels = bb.getShort()
    val rate = bb.getInt(); bb.getInt(); bb.getShort()
    val bits = bb.getShort()
    if (audioFormat != 1 || channels != 1 || bits != 16) return None
    // malformed fmt lengths must yield None, not a buffer exception
    if (fmtLen < 0 || 20L + fmtLen + 8 > payload.length) return None
    bb.position(20 + fmtLen)
    val dataTag = new Array[Byte](4); bb.get(dataTag)
    if (new String(dataTag, "US-ASCII") != "data") return None
    val dataLen = bb.getInt()
    if (dataLen < 0 || dataLen > bb.remaining()) return None
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) { samples(i) = bb.getShort(); i += 1 }
    Some((rate, samples))
  }

  /** 16-dim audio features: RMS energy, zero-crossing rate, then 14
    * windowed RMS energies over equal time slices (all in [0, 1]). */
  def features(samples: Array[Short]): Array[Float] = {
    val out = new Array[Float](Multimodal.StubCodec.FeatureDim)
    val n = samples.length
    if (n == 0) return out
    var energy = 0.0
    var zc = 0
    var i = 0
    while (i < n) {
      val s = samples(i) / 32768.0
      energy += s * s
      if (i > 0 && ((samples(i) >= 0) != (samples(i - 1) >= 0))) zc += 1
      i += 1
    }
    out(0) = math.sqrt(energy / n).toFloat
    out(1) = zc.toFloat / n
    val win = 14
    var wi = 0
    while (wi < win) {
      val from = (wi.toLong * n / win).toInt
      val to = ((wi + 1).toLong * n / win).toInt
      var e = 0.0
      var j = from
      while (j < to) { val s = samples(j) / 32768.0; e += s * s; j += 1 }
      out(2 + wi) = if (to > from) math.sqrt(e / (to - from)).toFloat else 0f
      wi += 1
    }
    out
  }
}

/** Pure-JVM DSP for the audio feature path: an iterative radix-2
  * Cooley-Tukey FFT (no external libraries, executor-safe, allocation-
  * free transform) and framed power-spectrum features. Spec-checked
  * against the O(n²) DFT definition and Parseval's identity, so the
  * fast path is gated by the math, not by eyeballing. */
object Dsp {
  /** In-place radix-2 FFT. Length must be a power of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && n > 0 && (n & (n - 1)) == 0,
      s"fft length $n is not a power of 2")
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blockStart = 0
      while (blockStart < n) {
        var cwr = 1.0
        var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blockStart + k
          val b = a + len / 2
          val vr = re(b) * cwr - im(b) * cwi
          val vi = re(b) * cwi + im(b) * cwr
          re(b) = re(a) - vr; im(b) = im(a) - vi
          re(a) += vr; im(a) += vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr
          cwr = nwr
          k += 1
        }
        blockStart += len
      }
      len <<= 1
    }
  }

  /** O(n²) DFT by definition — the independent reference [[fft]] is
    * spec-checked against. */
  private[graft] def dftRef(re: Array[Double], im: Array[Double])
      : (Array[Double], Array[Double]) = {
    val n = re.length
    val or = new Array[Double](n)
    val oi = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      val c = math.cos(ang); val s = math.sin(ang)
      or(k) += re(t) * c - im(t) * s
      oi(k) += re(t) * s + im(t) * c
    }
    (or, oi)
  }

  /** Analysis geometry: 512-point frames, half-frame hop, 12 log-spaced
    * bands. At 16 kHz a frame is 32 ms — the standard speech/audio
    * analysis scale. */
  val Nfft = 512
  val Hop = 256
  val Bands = 12

  /** Hann-windowed framed mean power spectrum (Welch-style average over
    * half-overlapping frames; one zero-padded frame for clips shorter
    * than [[Nfft]]): Nfft/2 + 1 bins. */
  def meanPowerSpectrum(samples: Array[Short]): Array[Double] = {
    val half = Nfft / 2 + 1
    val acc = new Array[Double](half)
    val n = samples.length
    if (n == 0) return acc
    val hann = Array.tabulate(Nfft)(i =>
      0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (Nfft - 1))))
    val re = new Array[Double](Nfft)
    val im = new Array[Double](Nfft)
    var frames = 0
    var start = 0
    while (start == 0 || start + Nfft <= n) {
      java.util.Arrays.fill(im, 0.0)
      var i = 0
      while (i < Nfft) {
        re(i) = if (start + i < n) (samples(start + i) / 32768.0) * hann(i) else 0.0
        i += 1
      }
      fft(re, im)
      var k = 0
      while (k < half) {
        acc(k) += (re(k) * re(k) + im(k) * im(k)) / Nfft
        k += 1
      }
      frames += 1
      start += Hop
    }
    var k = 0
    while (k < half) { acc(k) /= frames; k += 1 }
    acc
  }

  /** Spectral shape features from a PCM-16 clip: centroid and 85%%
    * rolloff in Hz, spectral flatness (geometric/arithmetic power mean —
    * ~1 for noise, ~0 for tones), and [[Bands]] log-spaced band energies
    * normalized to sum to 1 (zeros for silence). DC is excluded from
    * every statistic. */
  def spectralFeatures(sampleRateHz: Int, samples: Array[Short])
      : (Double, Double, Double, Array[Float]) = {
    val ps = meanPowerSpectrum(samples)
    val binHz = sampleRateHz.toDouble / Nfft
    var total = 0.0
    var k = 1
    while (k < ps.length) { total += ps(k); k += 1 }
    val bands = new Array[Float](Bands)
    if (total <= 0.0) return (0.0, 0.0, 0.0, bands)
    var centroid = 0.0
    k = 1
    while (k < ps.length) { centroid += k * binHz * ps(k); k += 1 }
    centroid /= total
    var cum = 0.0
    var rolloffBin = ps.length - 1
    k = 1
    var found = false
    while (k < ps.length && !found) {
      cum += ps(k)
      if (cum >= 0.85 * total) { rolloffBin = k; found = true }
      k += 1
    }
    val nBins = ps.length - 1
    var logSum = 0.0
    k = 1
    while (k < ps.length) { logSum += math.log(ps(k) + 1e-20); k += 1 }
    val flatness = math.exp(logSum / nBins) / (total / nBins + 1e-20)
    // log-spaced band edges from bin 1 to Nyquist
    val fMin = binHz
    val fMax = sampleRateHz / 2.0
    k = 1
    while (k < ps.length) {
      val f = k * binHz
      val b = math.min(Bands - 1, math.max(0,
        (math.log(f / fMin) / math.log(fMax / fMin) * Bands).toInt))
      bands(b) = (bands(b) + (ps(k) / total)).toFloat
      k += 1
    }
    (centroid, rolloffBin * binHz, flatness, bands)
  }

  /** Hash geometry: 8 time segments × 8 adjacent-band comparisons. */
  val HashSegments = 8
  val HashBandCmps = 8

  /** 64-bit perceptual audio hash (chromaprint-style, reduced to one
    * word per clip): the clip's frames are pooled into [[HashSegments]]
    * equal time segments; per segment, [[HashBandCmps]] bits record the
    * SIGN of adjacent log-band energy differences (is band d louder
    * than band d+1 in this part of the clip). Comparisons make the hash
    * exactly invariant to uniform gain (scaling every sample scales
    * every band energy equally) and robust to mild noise/re-encoding —
    * the audio analogue of [[graft.operators.Multimodal.dHash64]]'s
    * neighbor comparisons. Silence hashes to 0 (all-equal bands): a
    * silent-clip hub is exactly what the hamming join's hot-chunk cap
    * bounds. */
  def audioHash64(sampleRateHz: Int, samples: Array[Short]): Long = {
    val n = samples.length
    if (n == 0) return 0L
    val hann = Array.tabulate(Nfft)(i =>
      0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (Nfft - 1))))
    val nFrames = math.max(1, (n - Nfft) / Hop + 1)
    val segBands = Array.fill(HashSegments)(new Array[Double](Bands))
    val re = new Array[Double](Nfft)
    val im = new Array[Double](Nfft)
    val binHz = sampleRateHz.toDouble / Nfft
    val fMin = binHz
    val fMax = sampleRateHz / 2.0
    var frame = 0
    while (frame < nFrames) {
      val start = frame * Hop
      java.util.Arrays.fill(im, 0.0)
      var i = 0
      while (i < Nfft) {
        re(i) = if (start + i < n) (samples(start + i) / 32768.0) * hann(i) else 0.0
        i += 1
      }
      fft(re, im)
      val seg = frame * HashSegments / nFrames
      var k = 1
      while (k < Nfft / 2 + 1) {
        val f = k * binHz
        val b = math.min(Bands - 1, math.max(0,
          (math.log(f / fMin) / math.log(fMax / fMin) * Bands).toInt))
        segBands(seg)(b) += (re(k) * re(k) + im(k) * im(k)) / Nfft
        k += 1
      }
      frame += 1
    }
    var hash = 0L
    var s = 0
    while (s < HashSegments) {
      var segTotal = 0.0
      var b = 0
      while (b < Bands) { segTotal += segBands(s)(b); b += 1 }
      // dead zone: a bit is set only when the adjacent-band difference
      // clears 1% of the segment's total energy. Without it, bands the
      // signal leaves empty are compared noise-against-noise and each
      // such bit is a fair coin per clip — twin clips then differ by
      // more bits than the pigeonhole join's radius even at 34 dB SNR
      // (measured: hamming 6 -> 1 on the planted twins)
      val dead = 0.01 * segTotal
      var d = 0
      while (d < HashBandCmps) {
        if (segBands(s)(d) - segBands(s)(d + 1) > dead)
          hash |= 1L << (s * HashBandCmps + d)
        d += 1
      }
      s += 1
    }
    hash
  }
}

/** Compressed-image codec over the JDK's built-in `javax.imageio` PNG and
  * JPEG plugins — no external dependency, pure JVM, executor-safe (the
  * disk-backed stream cache is disabled so decode never touches local
  * tmp). Decoded pixels surface in the SAME packed-RGB shape as
  * [[PpmCodec]], so every downstream stage (features, resample, frame
  * split) is container-agnostic.
  *
  * Adversarial-payload posture (multimodal corpora are untrusted bytes):
  * the reader parses the HEADER first and rejects images whose claimed
  * raster exceeds [[ImageIoCodec.MaxPixels]] BEFORE any pixel allocation
  * — a crafted IHDR claiming a 10^9-pixel image must yield None, not an
  * executor OOM — and every plugin exception (truncated stream, bad CRC,
  * malformed markers) is caught to None, never thrown.
  */
object ImageIoCodec {
  javax.imageio.ImageIO.setUseCache(false)

  /** Pixel cap applied from the header, before raster allocation. Peak
    * decode memory is ~11 bytes/pixel HELD SIMULTANEOUSLY (the plugin's
    * BufferedImage raster + the getRGB int array + the packed-RGB
    * output), so 16 MPx ≈ 180 MB peak per in-flight image — above any
    * sane training-corpus image, and bounded enough that a few
    * concurrent task threads on one executor cannot OOM it. */
  val MaxPixels: Long = 16L * 1024 * 1024

  /** Decode PNG/JPEG (or any other installed ImageIO plugin format) to
    * (width, height, packed RGB) — None for unparseable, truncated,
    * oversized, or non-image payloads. */
  def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < 8) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
          val img = reader.read(0)
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            rgb(3 * i) = ((p >> 16) & 0xFF).toByte
            rgb(3 * i + 1) = ((p >> 8) & 0xFF).toByte
            rgb(3 * i + 2) = (p & 0xFF).toByte
            i += 1
          }
          Some((w, h, rgb))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode packed RGB as PNG (lossless: [[decode]] of the result gives
    * back the exact pixels — spec-asserted). */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    encodeVia("png", w, h, rgb)

  /** Encode packed RGB as baseline JPEG (lossy: decode approximates the
    * input; dimensions and container validity are exact). */
  def encodeJpeg(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    encodeVia("jpg", w, h, rgb)

  /** Encode packed RGB as 24-bit BMP (lossless like PNG, zero
    * compression — the dumbest real container in the mix, which is
    * exactly why corpora contain it). */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    encodeVia("bmp", w, h, rgb)

  /** Encode packed RGB as GIF. Palettized: for images with <= 256
    * distinct colors the palette is built from the EXACT colors (the
    * JDK writer handed a direct-color image would quantize to the web
    * palette even when the true palette fits), so decode round-trips the
    * pixels; beyond 256 colors the writer's quantization applies and
    * only dimensions are exact. */
  def encodeGif(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != $w x $h x 3")
    val colors = new java.util.LinkedHashSet[Integer]()
    var i = 0
    while (i < w * h && colors.size <= 256) {
      colors.add(((rgb(3 * i) & 0xFF) << 16) |
        ((rgb(3 * i + 1) & 0xFF) << 8) | (rgb(3 * i + 2) & 0xFF))
      i += 1
    }
    if (colors.size > 256) return encodeVia("gif", w, h, rgb)
    val palette = new Array[Int](colors.size)
    val it = colors.iterator()
    var j = 0
    while (it.hasNext) { palette(j) = it.next(); j += 1 }
    val icm = new java.awt.image.IndexColorModel(
      8, palette.length, palette, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val px = new Array[Int](w * h)
    i = 0
    while (i < px.length) {
      px(i) = 0xFF000000 | ((rgb(3 * i) & 0xFF) << 16) |
        ((rgb(3 * i + 1) & 0xFF) << 8) | (rgb(3 * i + 2) & 0xFF)
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    // write NON-interlaced explicitly: the JDK writer's default
    // (interlaced) mode silently row-shifts images with fewer rows than
    // the interlace pass structure (empirically: every image under ~25px
    // with w > 2 decodes wrong; probed on Temurin 17) — a default
    // ImageIO.write(img, "gif", ...) ships that corruption
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  private def encodeVia(fmt: String, w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != $w x $h x 3")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      px(i) = ((rgb(3 * i) & 0xFF) << 16) |
        ((rgb(3 * i + 1) & 0xFF) << 8) | (rgb(3 * i + 2) & 0xFF)
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, fmt, bos)
    require(ok, s"no ImageIO writer for $fmt")
    bos.toByteArray
  }
}
