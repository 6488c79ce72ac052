package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: opaque `binary` payloads with typed
  * metadata, processed in partition-sized batches.
  *
  * Real media decode libraries are not in this container, so the decode
  * kernel is a clearly-marked deterministic STUB — but everything Spark
  * cares about is real: the binary column plumbing, the typed Dataset
  * schema, the mapPartitions batch shape (one decoder init per partition,
  * streamed rows), and the partitioning story. The kernel is pluggable:
  * every operator takes a [[PayloadDecoder]] (default [[StubDecoder]]),
  * so a real JNI/ffmpeg/pillow-server decoder drops in without touching
  * query code or plan shape.
  */
object Multimodal {

  /** The decode kernel contract. Implementations must be Serializable —
    * the decoder object ships to executors, and [[PayloadDecoder.init]]
    * runs ONCE PER PARTITION before any row is decoded (open the codec,
    * map the model, start the sidecar process); the per-row calls then
    * stream through it. Keeping the kernel behind this trait is what
    * makes the stub honest: swapping in a real decoder changes no
    * operator, no schema, and no partitioning.
    */
  trait PayloadDecoder extends Serializable {
    /** One-time per-partition initialisation; default no-op. */
    def init(): Unit = ()
    /** payload → (width, height, n_frames). */
    def dims(payload: Array[Byte]): (Int, Int, Int)
    /** payload → (width, height) only — no frame counting. The default
      * derives from [[dims]]; decoders where the frame count costs a
      * full stream scan (ImageIO's getNumImages(true) walks every block
      * of a large animation) override this so still images pay header
      * cost only. Callers that will discard the count (metadata passes
      * over non-video media) should call this, not [[dims]].
      */
    def dimsOnly(payload: Array[Byte]): (Int, Int) = {
      val (w, h, _) = dims(payload)
      (w, h)
    }
    /** Bytes of sampled frame `idx` of a video payload. */
    def frame(payload: Array[Byte], idx: Int): Array[Byte]
    /** Bytes of every sampled frame in `idxs` (STRICTLY ascending),
      * LAZILY, in order. The default maps [[frame]]; decoders where
      * each frame call re-opens and re-walks the stream (ImageIO's GIF
      * path must recomposite frames 0..idx per call — O(F²/k) for
      * every-k sampling) override this to decode the stream ONCE,
      * yielding each frame as it is reached so a long animation never
      * has all its sampled frames in memory at once. Samplers should
      * call this, not [[frame]] in a loop.
      */
    def frames(payload: Array[Byte], idxs: Seq[Int]): Iterator[Array[Byte]] =
      idxs.iterator.map(frame(payload, _))
    /** Thumbnail bytes for a payload resized to (w, h). */
    def thumb(payload: Array[Byte], w: Int, h: Int): Array[Byte]
    /** Bounded resize: target dims + thumbnail bytes for a maxDim
      * bound, in ONE call. The default composes [[dims]] + [[thumb]];
      * decoders where each call is a full media decode override this
      * to decode the payload exactly once.
      */
    def scaled(payload: Array[Byte], maxDim: Int): (Int, Int, Array[Byte]) = {
      val (w, h, _) = dims(payload)
      val (tw, th) = fitWithin(w, h, maxDim)
      (tw, th, thumb(payload, tw, th))
    }
  }

  /** Scale (w, h) to fit within maxDim, preserving aspect, min 1px. */
  private def fitWithin(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
    (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
  }

  /** STUB decoder: dimensions derived deterministically from the payload
    * bytes; frame/thumb bytes are deterministic slices. Replace with a
    * real decoder behind the same trait.
    *
    * The fold is wrap-free (mod 1e9+7, the same family as
    * `TextAnalysis.fingerprint`) so the stub's outputs are reproducible
    * by ANY engine in plain arithmetic — which is what lets the three
    * multimodal queries carry full DuckDB oracles pinning the batch
    * plumbing (schema, row expansion, byte slicing) cross-engine
    * instead of rows-only.
    */
  object StubDecoder extends PayloadDecoder {
    def dims(payload: Array[Byte]): (Int, Int, Int) = {
      var h = 1125899906842597L % 1000000007L
      payload.foreach(b => h = (h * 31 + (b & 0xFF)) % 1000000007L)
      val w = 64 + (h % 1024).toInt
      val ht = 64 + ((h >> 10) % 1024).toInt
      val frames = 1 + ((h >> 20) % 240).toInt
      (w, ht, frames)
    }
    def frame(payload: Array[Byte], idx: Int): Array[Byte] = {
      val off = math.min(idx % math.max(1, payload.length), payload.length)
      payload.slice(off, math.min(off + 16, payload.length))
    }
    def thumb(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      payload.take(math.min(64, payload.length))
  }

  /** REAL image decoder over the JDK's built-in `javax.imageio` codecs
    * (PNG, BMP, GIF, JPEG — no external dependency): `dims` reads ONLY
    * the image header (reader.getWidth/getHeight — no pixel decode),
    * `thumb` renders a true nearest-neighbor downscale and re-encodes
    * it as PNG, and `frame(idx)` decodes exactly frame `idx` (animated
    * GIFs really have many). `scaled` decodes the pixels exactly once
    * per payload. n_frames is the reader's true image count — 1 for
    * stills, the frame count for animations. Proves the [[PayloadDecoder]]
    * plumbing end-to-end on genuine bytes — same operators, same
    * schema, same mapPartitions batch shape as the stub; only the
    * kernel differs. `init` is a no-op: the IIORegistry is populated at
    * class load, and scanForPlugins() from concurrent task threads
    * would mutate the shared static registry under readers.
    * Nearest-neighbor (not bilinear) scaling keeps the thumbnail bytes
    * deterministic across JVMs: it is pure pixel selection, no fp
    * resampling.
    */
  object ImageIODecoder extends PayloadDecoder {
    private def read(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      img
    }
    private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    private def scaleTo(src: java.awt.image.BufferedImage,
                        w: Int, h: Int): java.awt.image.BufferedImage = {
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(src, 0, 0, w, h, null); ()
      } finally g.dispose()
      dst
    }
    private def withReader[A](payload: Array[Byte])(
        f: javax.imageio.ImageReader => A): A = {
      // memory-backed explicitly: the ImageIO factory default is a
      // FileCacheImageInputStream (temp-file create/write/delete PER
      // CALL when useCache is on) — pure waste over an in-heap byte
      // array, and dims/dimsOnly run once per corpus row
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "payload is not a decodable image")
        val r = readers.next()
        try { r.setInput(iis); f(r) } finally r.dispose()
      } finally iis.close()
    }
    // Dimensions come from the format header (no pixel decode); the
    // frame count from the reader's block scan (getNumImages(true)),
    // which walks every data block of the stream — cheap for stills,
    // linear in payload size for long animations. Metadata passes that
    // will discard the count (still images) call dimsOnly instead.
    def dims(payload: Array[Byte]): (Int, Int, Int) =
      withReader(payload)(r =>
        (r.getWidth(0), r.getHeight(0), r.getNumImages(true)))
    // Header-only: getWidth/getHeight(0) parse just the first image
    // header — no block scan, no pixel decode. This is the path still
    // images take through decodeMeta, so a 100 MB single-frame payload
    // pays header cost, not a full-stream walk for a count it discards.
    override def dimsOnly(payload: Array[Byte]): (Int, Int) =
      withReader(payload)(r => (r.getWidth(0), r.getHeight(0)))
    // Decodes frame `idx` specifically — the PayloadDecoder contract —
    // not frame 0 regardless (an animated GIF sampled every-k must
    // yield DIFFERENT frames, or the sampler silently collapses every
    // animation to its first frame). GIF frames are COMPOSITED: a
    // frame-optimized animation stores each frame as a partial rect at
    // an offset plus a disposal method, so the raw stored image is not
    // the frame a viewer shows. We replay frames 0..idx onto a
    // logical-screen canvas (offsets + disposal per the GIF89a spec via
    // the reader's per-frame metadata), so every sampled frame has the
    // logical screen's dims and full visible content. Non-GIF
    // multi-image formats store self-contained frames — raw read.
    def frame(payload: Array[Byte], idx: Int): Array[Byte] =
      frames(payload, Seq(idx)).next() // full consumption closes resources

    /** Batch sampling decodes the stream ONCE and yields LAZILY: one
      * reader session, one canvas walk 0..max(idxs) emitting a PNG
      * snapshot as each sampled index is reached — linear in frames
      * where per-idx [[frame]] calls are quadratic, and O(one canvas)
      * memory where an eager batch would hold every sampled PNG of a
      * long animation at once. Resources are byte-array-backed (no OS
      * handles), released on exhaustion; an abandoned iterator leaves
      * only heap for the GC.
      */
    override def frames(payload: Array[Byte],
                        idxs: Seq[Int]): Iterator[Array[Byte]] =
      if (idxs.isEmpty) Iterator.empty
      else {
        require(idxs.lazyZip(idxs.tail).forall(_ < _),
          "frame indices must be strictly ascending")
        // MemoryCacheImageInputStream EXPLICITLY: the ImageIO factory
        // defaults to a FileCacheImageInputStream (temp file + open fd)
        // when useCache is on, and a lazy iterator cannot guarantee its
        // close runs (abandonment, early limit()). Memory-backed means
        // an abandoned iterator truly leaves only heap for the GC.
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) {
          iis.close()
          throw new IllegalArgumentException("payload is not a decodable image")
        }
        val r = readers.next()
        try {
          r.setInput(iis)
          // the count scan here is a SECOND block walk when the caller
          // already paid dims() for the same payload (frameSample) —
          // an accepted ≤2x constant on the scan portion, buying eager
          // index validation (errors at call time, not mid-iteration)
          val n = r.getNumImages(true)
          idxs.foreach(i =>
            require(i >= 0 && i < n, s"frame index $i out of range [0, $n)"))
          if (r.getFormatName.equalsIgnoreCase("gif")) new GifFrames(r, iis, idxs)
          else new Iterator[Array[Byte]] {
            private var k = 0
            def hasNext: Boolean = k < idxs.length
            def next(): Array[Byte] = {
              if (!hasNext) throw new NoSuchElementException("frames exhausted")
              // a decode failure must release the reader AND leave the
              // iterator terminally exhausted — a caller catching the
              // error and continuing must see "exhausted", not a
              // disposed reader
              val b =
                try png(r.read(idxs(k)))
                catch { case t: Throwable =>
                  k = idxs.length; r.dispose(); iis.close(); throw t
                }
              k += 1
              if (!hasNext) { r.dispose(); iis.close() }
              b
            }
          }
        } catch { case t: Throwable => r.dispose(); iis.close(); throw t }
      }

    /** Lazy GIF walk: replay frames 0..max(idxs) onto an ARGB canvas —
      * draw each stored rect at its (left, top) offset, snapshot the
      * canvas as PNG when a sampled index is reached, then apply the
      * frame's disposal before the next: restoreToBackgroundColor
      * clears the rect to transparent (the modern-viewer reading of
      * "background"), restoreToPrevious restores the canvas as it was
      * before the frame drew, none/doNotDispose leaves the pixels.
      * Every snapshot has the logical screen's dimensions and lands
      * BEFORE its own frame's disposal runs — exactly what a viewer
      * shows at that frame.
      */
    private final class GifFrames(r: javax.imageio.ImageReader,
                                  iis: javax.imageio.stream.ImageInputStream,
                                  idxs: Seq[Int])
        extends Iterator[Array[Byte]] {
      private val maxIdx = idxs.last // strictly ascending by contract
      private val (sw, sh) = gifScreen(r)
      private val canvas = new java.awt.image.BufferedImage(
        sw, sh, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      private val g = canvas.createGraphics()
      private var i = 0 // next stream frame to draw
      private var k = 0 // next sampled position
      def hasNext: Boolean = k < idxs.length
      def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException("frames exhausted")
        val target = idxs(k)
        var snap: Array[Byte] = null
        try while (i <= target) {
          val (left, top, disposal) = gifFrameMeta(r, i)
          val img = r.read(i)
          val saved =
            if (i < maxIdx && disposal == "restoreToPrevious")
              canvas.getRGB(0, 0, sw, sh, null, 0, sw)
            else null
          g.drawImage(img, left, top, null)
          if (i == target) snap = png(canvas)
          if (i < maxIdx) disposal match {
            case "restoreToBackgroundColor" =>
              // clear ONLY the frame's rect; java.awt.AlphaComposite
              // Clear writes transparent pixels regardless of source
              val prev = g.getComposite
              g.setComposite(java.awt.AlphaComposite.Clear)
              g.fillRect(left, top, img.getWidth, img.getHeight)
              g.setComposite(prev)
            case "restoreToPrevious" =>
              canvas.setRGB(0, 0, sw, sh, saved, 0, sw)
            case _ => () // none / doNotDispose: pixels persist
          }
          i += 1
        } catch { case t: Throwable =>
          // a decode/metadata failure mid-walk must release resources
          // and leave the iterator terminally exhausted (see the
          // non-GIF twin): k jumps past the end so hasNext is false
          k = idxs.length
          g.dispose(); r.dispose(); iis.close(); throw t
        }
        k += 1
        if (!hasNext) { g.dispose(); r.dispose(); iis.close() }
        snap
      }
    }

    private val GifImageFmt = "javax_imageio_gif_image_1.0"
    private val GifStreamFmt = "javax_imageio_gif_stream_1.0"

    private def childElem(tree: org.w3c.dom.Node,
                          name: String): Option[org.w3c.dom.Element] = {
      val kids = tree.getChildNodes
      (0 until kids.getLength).iterator.map(kids.item).collectFirst {
        case e: org.w3c.dom.Element if e.getNodeName == name => e
      }
    }

    /** (left, top, disposalMethod) for GIF frame i, from the reader's
      * standard per-image metadata tree (ImageDescriptor +
      * GraphicControlExtension nodes).
      */
    private def gifFrameMeta(r: javax.imageio.ImageReader,
                             i: Int): (Int, Int, String) = {
      val tree = r.getImageMetadata(i).getAsTree(GifImageFmt)
      val desc = childElem(tree, "ImageDescriptor")
      def attr(e: org.w3c.dom.Element, a: String): Int = {
        val v = e.getAttribute(a); if (v.isEmpty) 0 else v.toInt
      }
      val left = desc.map(attr(_, "imageLeftPosition")).getOrElse(0)
      val top = desc.map(attr(_, "imageTopPosition")).getOrElse(0)
      val disposal = childElem(tree, "GraphicControlExtension")
        .map(_.getAttribute("disposalMethod")).filter(_.nonEmpty)
        .getOrElse("none")
      (left, top, disposal)
    }

    /** Logical screen size from the GIF stream metadata, falling back
      * to the frame-0 extent when the descriptor is absent.
      */
    private def gifScreen(r: javax.imageio.ImageReader): (Int, Int) = {
      val fromStream =
        for {
          sm <- Option(r.getStreamMetadata)
          lsd <- childElem(sm.getAsTree(GifStreamFmt), "LogicalScreenDescriptor")
          w = lsd.getAttribute("logicalScreenWidth")
          h = lsd.getAttribute("logicalScreenHeight")
          if w.nonEmpty && h.nonEmpty
        } yield (w.toInt, h.toInt)
      fromStream.getOrElse {
        val (l, t, _) = gifFrameMeta(r, 0)
        (l + r.getWidth(0), t + r.getHeight(0))
      }
    }

    def thumb(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      png(scaleTo(read(payload), w, h))
    // One full decode per payload: dims from the decoded pixels, scale
    // from the same BufferedImage.
    override def scaled(payload: Array[Byte], maxDim: Int): (Int, Int, Array[Byte]) = {
      val src = read(payload)
      val (tw, th) = fitWithin(src.getWidth, src.getHeight, maxDim)
      (tw, th, png(scaleTo(src, tw, th)))
    }
  }

  /** REAL audio header/PCM parsing over RIFF/WAVE payloads — the audio
    * twin of [[ImageIODecoder]]: zero external dependencies (the RIFF
    * container walk and little-endian PCM16 reads are ~30 lines of
    * plain byte arithmetic), genuine bytes in tests (ApiSpec plants
    * WAVs written by the JDK's own javax.sound.sampled encoder), and
    * the same mapPartitions batch shape as every other multimodal
    * operator. The stub remains the oracle default for the synthetic
    * corpus, whose payloads are UTF-8 text bytes, not media.
    */
  object WavCodec {

    /** (sample_rate, channels, bits_per_sample, n_frames) from the
      * RIFF/WAVE `fmt `/`data` chunk headers — no sample decode, so
      * metadata over a multi-GB payload costs a header walk. n_frames
      * counts inter-channel sample frames (dataBytes / blockAlign).
      */
    def header(payload: Array[Byte]): (Int, Int, Int, Long) = {
      val (rate, ch, bits, blockAlign, dataLen) = fmtAndData(payload)
      (rate, ch, bits, dataLen / math.max(1, blockAlign))
    }

    /** Full fmt-chunk view: (rate, channels, bits, blockAlign, dataLen).
      * blockAlign is the container's declared per-frame stride — legal
      * WAVs may pad it past channels*bits/8, so every sample walk must
      * stride by THIS, not by a recomputed 2*channels (keeps
      * [[energyWindows]] consistent with [[header]]'s frame count).
      */
    private[multimodal] def fmtAndData(
        payload: Array[Byte]): (Int, Int, Int, Int, Long) = {
      require(payload.length >= 12 &&
        payload(0) == 'R' && payload(1) == 'I' &&
        payload(2) == 'F' && payload(3) == 'F' &&
        new String(payload, 8, 4, "US-ASCII") == "WAVE",
        "payload is not RIFF/WAVE")
      def le16(i: Int): Int =
        (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
      def le32(i: Int): Int =
        (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8) |
        ((payload(i + 2) & 0xff) << 16) | ((payload(i + 3) & 0xff) << 24)
      var off = 12
      var rate = -1; var ch = -1; var bits = -1
      var blockAlign = -1; var dataLen = -1L
      while (off + 8 <= payload.length && (rate < 0 || dataLen < 0)) {
        val id = new String(payload, off, 4, "US-ASCII")
        val sz = le32(off + 4)
        require(sz >= 0, s"corrupt RIFF chunk size at offset $off")
        if (id == "fmt " && sz >= 16) {
          require(off + 24 <= payload.length, "truncated fmt chunk")
          ch = le16(off + 10); rate = le32(off + 12)
          blockAlign = le16(off + 20); bits = le16(off + 22)
        } else if (id == "data") {
          // clamp to the bytes actually present (truncated uploads lie
          // in their headers) — keeps n_frames consistent with what
          // energyWindows will actually read via dataChunk's clamp
          dataLen = math.min(sz.toLong, (payload.length - off - 8).toLong)
        }
        // advance in Long: a huge declared size must end the walk, not
        // wrap Int-negative and re-enter the loop at a bogus offset
        val next = off.toLong + 8L + sz.toLong + (sz & 1)
        off = if (next > payload.length) payload.length else next.toInt
      }
      require(rate > 0 && dataLen >= 0, "missing fmt /data chunk")
      require(ch >= 1, s"corrupt channel count $ch")
      (rate, ch, bits, blockAlign, dataLen)
    }

    /** Byte offset and length of the PCM `data` chunk. */
    private[multimodal] def dataChunk(payload: Array[Byte]): (Int, Int) = {
      def le32(i: Int): Int =
        (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8) |
        ((payload(i + 2) & 0xff) << 16) | ((payload(i + 3) & 0xff) << 24)
      var off = 12
      while (off + 8 <= payload.length) {
        val id = new String(payload, off, 4, "US-ASCII")
        val sz = le32(off + 4)
        require(sz >= 0, s"corrupt RIFF chunk size at offset $off")
        if (id == "data")
          return (off + 8, math.min(sz, payload.length - off - 8))
        val next = off.toLong + 8L + sz.toLong + (sz & 1)
        off = if (next > payload.length) payload.length else next.toInt
      }
      throw new IllegalArgumentException("missing data chunk")
    }

    /** Per-window energy features over PCM16 samples, channel 0:
      * (sum of squares, peak magnitude, n samples) per fixed-size
      * window — all EXACT integers (sum_sq ≤ 2³⁰ per sample, no fp),
      * so results are bit-identical on any engine and any partitioning.
      * The loudness/silence primitive audio curation filters build on.
      */
    def energyWindows(payload: Array[Byte],
                      windowFrames: Int): Seq[(Int, Long, Int, Int)] = {
      require(windowFrames > 0, "windowFrames must be positive")
      val (_, ch, bits, blockAlign, _) = fmtAndData(payload)
      require(bits == 16, s"PCM16 expected, got $bits-bit")
      require(blockAlign >= 2 * ch,
        s"blockAlign $blockAlign smaller than frame size ${2 * ch}")
      val (dOff, dLen) = dataChunk(payload)
      // stride by the container's declared blockAlign (may exceed
      // 2*channels for padded alignments); channel 0 read per frame
      val step = blockAlign
      val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Int, Int)]()
      var win = 0
      var i = dOff
      val end = dOff + dLen - 1
      while (i + 1 <= end) {
        var sumSq = 0L; var peak = 0; var n = 0
        while (n < windowFrames && i + 1 <= end) {
          val s = ((payload(i) & 0xff) | (payload(i + 1) << 8)).toShort.toInt
          sumSq += s.toLong * s
          val m = math.abs(s)
          if (m > peak) peak = m
          n += 1; i += step
        }
        out += ((win, sumSq, peak, n))
        win += 1
      }
      out.toSeq
    }
  }

  /** REAL video container metadata over MP4/ISO-BMFF payloads — the
    * video twin of [[WavCodec]]: a header-only box walk (ISO/IEC
    * 14496-12, public spec) pulling dims, duration, and frame count
    * from `moov/trak/tkhd`, `mdia/mdhd`, and `stbl/stsz` without
    * touching a single `mdat` byte, so metadata over a multi-GB clip
    * costs a few hundred header bytes. Same corrupt-input discipline as
    * the audio walk: Long-advanced offsets (a lying 32-bit size must
    * end the walk, not wrap Int), 64-bit largesize and size==0
    * (to-end-of-file) boxes handled, child boxes clamped to their
    * parent's extent.
    */
  object Mp4Codec {

    private def be32(p: Array[Byte], i: Int): Long =
      ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
        ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)

    private def be64(p: Array[Byte], i: Int): Long =
      (be32(p, i) << 32) | be32(p, i + 4)

    /** (width_px, height_px, n_frames, media_timescale, media_duration)
      * from the moov header boxes. Width/height are tkhd's 16.16
      * fixed-point values truncated to pixels; timescale/duration come
      * from the media header (mdhd), v0 and v1 layouts both supported.
      * The FIRST trak carrying a non-zero tkhd width wins (the video
      * track; audio traks declare 0x0).
      */
    def videoMeta(payload: Array[Byte]): (Int, Int, Long, Long, Long) = {
      val (w, h, f, ts, dur, _) = scan(payload)
      (w, h, f, ts, dur)
    }

    /** [[videoMeta]] plus the video trak's sample-entry codec fourcc
      * (stbl/stsd first entry: avc1/hev1/mp4v/av01...). Containers
      * without an stsd box fail the contract require — callers that
      * tolerate codec-less headers use [[videoMeta]].
      */
    def videoMetaCodec(payload: Array[Byte]): (Int, Int, Long, Long, Long,
        String) = {
      val m = scan(payload)
      require(m._6 != null, "missing stsd sample-entry codec")
      m
    }

    private def scan(payload: Array[Byte]): (Int, Int, Long, Long, Long,
        String) = {
      var width = -1; var height = -1
      var frames = -1L; var ts = -1L; var dur = -1L
      var codec: String = null
      var inVideoTrak = false
      def walk(start: Long, end: Long): Unit = {
        var off = start
        while (off + 8 <= end) {
          val size32 = be32(payload, off.toInt)
          val typ = new String(payload, off.toInt + 4, 4, "US-ASCII")
          var hdr = 8L
          val size: Long =
            if (size32 == 1L) {
              require(off + 16 <= end, "truncated largesize box")
              hdr = 16L
              be64(payload, off.toInt + 8)
            } else if (size32 == 0L) end - off // box extends to end
            else size32
          require(size >= hdr, s"corrupt box size $size at offset $off")
          // clamp to the bytes actually present: truncated uploads lie
          val boxEnd = math.min(off + size, end)
          val po = (off + hdr).toInt
          typ match {
            case "moov" | "mdia" | "minf" | "stbl" =>
              walk(off + hdr, boxEnd)
            case "trak" =>
              val was = inVideoTrak
              walk(off + hdr, boxEnd)
              inVideoTrak = was
            case "tkhd" if width < 0 =>
              // version byte read needs its own guard: a bare 8-byte
              // box header at EOF passes the loop's off+8 check with an
              // EMPTY body — contract exception, not a bounds error
              require(po < boxEnd, "truncated tkhd box")
              val v = payload(po) & 0xff
              val wOff = po + (if (v == 1) 88 else 76)
              require(wOff + 8 <= boxEnd, "truncated tkhd box")
              val w = (be32(payload, wOff) >> 16).toInt
              val h = (be32(payload, wOff + 4) >> 16).toInt
              if (w > 0) { width = w; height = h; inVideoTrak = true }
            case "mdhd" if inVideoTrak && ts < 0 =>
              require(po < boxEnd, "truncated mdhd box")
              val v = payload(po) & 0xff
              val tOff = po + (if (v == 1) 20 else 12)
              require(tOff + (if (v == 1) 12 else 8) <= boxEnd,
                "truncated mdhd box")
              ts = be32(payload, tOff)
              dur = if (v == 1) be64(payload, tOff + 4)
                    else be32(payload, tOff + 4)
            case "stsz" if inVideoTrak && frames < 0 =>
              require(po + 12 <= boxEnd, "truncated stsz box")
              frames = be32(payload, po + 8)
            case "stsd" if inVideoTrak && codec == null =>
              // body: version/flags(4) entry_count(4) then the first
              // sample entry: size(4) format-fourcc(4)
              require(po + 16 <= boxEnd, "truncated stsd box")
              codec = new String(payload, po + 12, 4, "US-ASCII")
            case _ => ()
          }
          // advance in Long: a huge declared size ends the walk cleanly
          off = if (off + size <= off) end else math.min(off + size, end)
        }
      }
      require(payload.length >= 8, "payload too short for ISO-BMFF")
      walk(0L, payload.length.toLong)
      require(width >= 0 && frames >= 0 && ts > 0,
        "missing moov/tkhd/mdhd/stsz metadata")
      (width, height, frames, ts, dur, codec)
    }
  }

  /** Build a minimal ISO-BMFF container with real ftyp/moov/mdat boxes:
    * mvhd + one video trak (tkhd with 16.16 dims, mdhd v0 with
    * timescale/duration, stbl/stsz with the frame count). Gives the
    * synthetic corpus REAL parseable video payloads the same way
    * [[buildWav]] does for audio: the parameters are derived from
    * relational columns, so an independent engine recomputes the
    * expected metadata from the table while Spark goes through genuine
    * container construction + [[Mp4Codec]] parsing.
    */
  private[graft] def buildMp4(width: Int, height: Int, nFrames: Long,
                              timescale: Long, duration: Long,
                              audioTrakFirst: Boolean = false,
                              codec: String = ""): Array[Byte] = {
    require(codec.isEmpty || codec.length == 4,
      s"codec fourcc must be 4 chars, got '$codec'")
    def box(typ: String, content: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + content.length)
      out.putInt(8 + content.length).put(typ.getBytes("US-ASCII"))
        .put(content)
      out.array()
    }
    def full(typ: String, body: java.nio.ByteBuffer => Unit,
             size: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(size + 4)
      b.putInt(0) // version 0 + flags
      body(b)
      box(typ, b.array())
    }
    def trakBox(w: Int, h: Int, frames: Long, ts: Long,
                dur: Long, fourcc: String): Array[Byte] = {
      val tkhd = full("tkhd", b => {
        b.putInt(0).putInt(0).putInt(1).putInt(0).putInt(dur.toInt)
          .putInt(0).putInt(0)
          .putShort(0).putShort(0).putShort(0).putShort(0)
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt)
        b.putInt(w << 16).putInt(h << 16)
      }, 80)
      val mdhd = full("mdhd", b => {
        b.putInt(0).putInt(0).putInt(ts.toInt).putInt(dur.toInt)
          .putShort(0x55c4.toShort).putShort(0) // language "und"
      }, 20)
      val stsz = full("stsz", b => {
        b.putInt(0).putInt(frames.toInt) // sample_size=0, sample_count
      }, 8)
      // stsd with one minimal 16-byte sample entry (size + fourcc +
      // 6 reserved bytes + data_reference_index) when a codec is set
      val stsd =
        if (fourcc.isEmpty) Array.emptyByteArray
        else full("stsd", b => {
          b.putInt(1) // entry_count
          b.putInt(16).put(fourcc.getBytes("US-ASCII"))
          b.putInt(0).putShort(0).putShort(1) // reserved + dref index
        }, 20)
      box("trak", tkhd ++ box("mdia", mdhd ++ box("minf",
        box("stbl", stsd ++ stsz))))
    }
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(8)
      .put("isom".getBytes("US-ASCII")).putInt(0x200).array())
    val mvhd = full("mvhd", b => {
      b.putInt(0).putInt(0) // creation, modification
        .putInt(timescale.toInt).putInt(duration.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
        .putInt(0).putInt(0)
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt)
      (1 to 6).foreach(_ => b.putInt(0))
      b.putInt(3) // next track id
    }, 96)
    // an audio trak declares 0x0 dims and its OWN timescale/duration —
    // a correct walk must skip past it to the video trak's metadata
    // the audio trak carries its own stsd ("mp4a") — a correct codec
    // walk must skip it along with the rest of the audio metadata
    val audio =
      if (audioTrakFirst)
        trakBox(0, 0, 777L, 44100L, 999999L,
          if (codec.isEmpty) "" else "mp4a")
      else Array.emptyByteArray
    val video = trakBox(width, height, nFrames, timescale, duration, codec)
    val moov = box("moov", mvhd ++ audio ++ video)
    val mdat = box("mdat", Array.emptyByteArray)
    ftyp ++ moov ++ mdat
  }

  /** One video payload's header metadata (exact integers). */
  final case class VideoMeta(doc_id: Long, width: Long, height: Long,
                             n_frames: Long, duration_ms: Long)

  /** Header-only video metadata computed by round-tripping REAL
    * ISO-BMFF containers: each doc's relational columns parameterize
    * [[buildMp4]], and Spark parses the bytes back through the real
    * [[Mp4Codec]] box walk — so a relational oracle can recompute the
    * expected output from the columns alone while the genuine parser
    * sits in the checked loop (the [[audioEnergyFromText]] technique).
    */
  def videoMetaFromCols(spark: SparkSession, docs: DataFrame,
                        idCol: String, nCharsCol: String): Dataset[VideoMeta] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(nCharsCol).cast("long"))
      // a future testdata regen with NULL n_chars must drop the row on
      // both engines, not zero-fill it through the tuple encoder
      .filter(col(idCol).isNotNull && col(nCharsCol).isNotNull)
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, nChars) =>
          val width = (16 + (id % 240) * 8).toInt
          val height = (16 + (nChars % 135) * 8).toInt
          val frames = 1 + (nChars % 240)
          val timescale = 600L
          val duration = frames * 25L
          val mp4 = buildMp4(width, height, frames, timescale, duration)
          val (w, h, f, ts, dur) = Mp4Codec.videoMeta(mp4)
          VideoMeta(id, w.toLong, h.toLong, f, dur * 1000L / ts)
        }
      }
  }

  /** One video payload's codec + dims (exact integers + fourcc). */
  final case class VideoCodec(doc_id: Long, codec: String, width: Long,
                              height: Long)

  /** Codec identification through the real stsd walk: containers built
    * with a per-row fourcc (avc1/hev1/mp4v/av01 by id mod 4) AND a
    * leading audio trak carrying its own "mp4a" stsd that the walk must
    * skip — the codec-demux pass a video curation pipeline runs before
    * routing clips to format-specific decoders. Oracle recomputes the
    * fourcc from the id arithmetic alone ([[videoMetaFromCols]]'s
    * technique).
    */
  def videoCodecFromCols(spark: SparkSession, docs: DataFrame,
                         idCol: String,
                         nCharsCol: String): Dataset[VideoCodec] = {
    import spark.implicits._
    val fourccs = Array("avc1", "hev1", "mp4v", "av01")
    docs.select(col(idCol).cast("long"), col(nCharsCol).cast("long"))
      .filter(col(idCol).isNotNull && col(nCharsCol).isNotNull)
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, nChars) =>
          val width = (16 + (id % 240) * 8).toInt
          val height = (16 + (nChars % 135) * 8).toInt
          val frames = 1 + (nChars % 240)
          val mp4 = buildMp4(width, height, frames, 600L, frames * 25L,
            audioTrakFirst = true, codec = fourccs((id % 4).toInt))
          val (w, h, _, _, _, cc) = Mp4Codec.videoMetaCodec(mp4)
          VideoCodec(id, cc, w.toLong, h.toLong)
        }
      }
  }

  /** Build a minimal canonical RIFF/WAVE container (44-byte header +
    * PCM data). Input is truncated to whole sample frames. Used to give
    * the synthetic corpus REAL parseable audio payloads: the text bytes
    * become the PCM stream, so an independent engine can recompute any
    * sample-level result from the text alone while Spark goes through
    * genuine container construction + [[WavCodec]] parsing.
    */
  private[graft] def buildWav(pcm0: Array[Byte], rate: Int, channels: Int,
                              bits: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val pcm = pcm0.take(pcm0.length - (pcm0.length % blockAlign))
    val out = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    out.array()
  }

  /** Windowed PCM16 energy over a WAV whose samples ARE the document's
    * UTF-8 bytes (consecutive byte pairs, little-endian): each doc's
    * text becomes a real RIFF/WAVE payload ([[buildWav]]) and is parsed
    * back through the real [[WavCodec]] — container walk, fmt/data
    * chunks, sample decode — not a stub. Because the byte→sample map is
    * plain arithmetic, a relational engine can replay the exact
    * integers from the text column, giving the audio path a full
    * cross-engine oracle (the image twin of this technique is the
    * mod-1e9+7 stub; here the REAL parser is in the checked loop).
    */
  def audioEnergyFromText(spark: SparkSession, docs: DataFrame,
                          idCol: String, textCol: String,
                          windowFrames: Int): Dataset[AudioWindow] = {
    import spark.implicits._
    docs.select(col(idCol), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          // the cross-engine oracle replays these bytes via per-CHAR
          // ascii() arithmetic, which is only byte-faithful for pure
          // ASCII (char count == UTF-8 byte count). A non-ASCII doc in a
          // future testdata generation must fail loudly here, not
          // silently diverge from the oracle.
          require(bytes.length == text.length,
            s"doc $id: non-ASCII text (${text.length} chars, " +
              s"${bytes.length} UTF-8 bytes) breaks the byte-replay oracle")
          if (bytes.length < 2) Iterator.empty
          else {
            val wav = buildWav(bytes, rate = 8000, channels = 1, bits = 16)
            WavCodec.energyWindows(wav, windowFrames).iterator.map {
              case (w, sumSq, peak, n) => AudioWindow(id, w, sumSq, peak, n)
            }
          }
        }
      }
  }

  /** Header-only audio metadata through the same text-as-PCM oracle
    * loop as [[audioEnergyFromText]]: each doc's UTF-8 bytes become the
    * PCM stream of a real RIFF/WAVE container, and the REAL
    * [[WavCodec.header]] walk parses it back — every emitted field is
    * plain arithmetic over the text length, so a relational engine
    * replays it exactly while Spark exercises genuine container
    * construction + parsing.
    */
  def audioMetaFromText(spark: SparkSession, docs: DataFrame,
                        idCol: String, textCol: String): Dataset[AudioMeta] = {
    import spark.implicits._
    docs.select(col(idCol), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          require(bytes.length == text.length,
            s"doc $id: non-ASCII text breaks the byte-replay oracle")
          val wav = buildWav(bytes, rate = 8000, channels = 1, bits = 16)
          val (rate, ch, bits, frames) = WavCodec.header(wav)
          AudioMeta(id, wav.length.toLong, rate, ch, bits, frames,
            frames * 1000L / rate)
        }
      }
  }

  /** Audio metadata parsed from a RIFF/WAVE payload header. */
  final case class AudioMeta(doc_id: Long, n_bytes: Long, sample_rate: Int,
                             channels: Int, bits_per_sample: Int,
                             n_frames: Long, duration_ms: Long)

  /** One fixed-size energy window of an audio payload (exact integers). */
  final case class AudioWindow(doc_id: Long, win_idx: Int, sum_sq: Long,
                               peak: Int, n_samples: Int)

  /** Header-only audio metadata for every audio-typed payload — the
    * [[decodeMeta]] shape specialized to sound: mapPartitions batches,
    * no sample decode, duration derived exactly from frames and rate.
    */
  def audioMeta(spark: SparkSession, docs: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    withPayload(docs)
      .filter(col("media_type").startsWith("audio"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (rate, ch, bits, frames) = WavCodec.header(payload)
          AudioMeta(id, payload.length.toLong, rate, ch, bits, frames,
            frames * 1000L / rate)
        }
      }
  }

  /** Windowed PCM energy features for every audio-typed payload — the
    * row-expanding feature-extraction pass (1 clip → n windows), the
    * batch shape an FFT/embedding extractor would use. Exact integer
    * outputs (see [[WavCodec.energyWindows]]).
    */
  def audioEnergy(spark: SparkSession, docs: DataFrame,
                  windowFrames: Int): Dataset[AudioWindow] = {
    import spark.implicits._
    withPayload(docs)
      .filter(col("media_type").startsWith("audio"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          WavCodec.energyWindows(payload, windowFrames).iterator.map {
            case (w, sumSq, peak, n) => AudioWindow(id, w, sumSq, peak, n)
          }
        }
      }
  }

  /** Media metadata extracted (stub-)decoding a payload. */
  final case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                             width: Int, height: Int, n_frames: Int)

  /** Resize/frame-sample output: metadata + a (stub) thumbnail payload. */
  final case class Thumb(doc_id: Long, width: Int, height: Int,
                         thumb: Array[Byte])

  /** One sampled video frame: index + (stub) frame bytes. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Attach a synthetic binary payload + media type to the documents
    * table — a stand-in for a real corpus's image/audio bytes. Payload =
    * UTF-8 bytes of the text (deterministic); media type derived from
    * doc_id. A frame that ALREADY carries `payload` + `media_type`
    * columns (a real media corpus) passes through untouched, so the
    * same operators run over genuine image bytes — see
    * [[ImageIODecoder]].
    */
  def withPayload(docs: DataFrame): DataFrame = {
    val hasPayload = docs.columns.contains("payload")
    val hasType = docs.columns.contains("media_type")
    // Half-shaped input fails LOUDLY: silently synthesizing over a
    // frame that already carries real payload bytes (but e.g. names its
    // type column mime_type) would clobber genuine media with text
    // bytes and produce garbage dims downstream with no error.
    require(hasPayload == hasType,
      s"media frame must carry BOTH payload and media_type or neither; " +
        s"found payload=$hasPayload media_type=$hasType")
    if (hasPayload) docs
    else docs
      .withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))
      .withColumn("media_type",
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")))
  }

  /** Decode metadata for every payload. mapPartitions so the decoder is
    * initialised once per partition and fed a streamed batch of rows —
    * the Scala twin of `mapInPandas` batch processing.
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame,
                 decoder: PayloadDecoder = StubDecoder): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        decoder.init() // once per partition, before any row
        rows.map { case (id, mt, payload) =>
          // Non-video media forces n_frames=1, so counting frames would
          // be pure waste — dimsOnly skips it (for ImageIODecoder that
          // is the difference between a header read and a full-stream
          // block scan per still image).
          if (mt.startsWith("video")) {
            val (w, h, f) = decoder.dims(payload)
            MediaMeta(id, mt, payload.length.toLong, w, h, f)
          } else {
            val (w, h) = decoder.dimsOnly(payload)
            MediaMeta(id, mt, payload.length.toLong, w, h, 1)
          }
        }
      }
  }

  /** Frame sampling for video payloads: every k-th frame of the (stub-)
    * decoded stream — a row-expanding mapPartitions (1 video → n frames),
    * the batch shape a real ffmpeg-style sampler would use. Non-video
    * rows are dropped.
    */
  def frameSample(spark: SparkSession, docs: DataFrame, everyK: Int,
                  decoder: PayloadDecoder = StubDecoder): Dataset[Frame] = {
    import spark.implicits._
    withPayload(docs)
      .filter(col("media_type") === "video/mp4")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        decoder.init()
        rows.flatMap { case (id, payload) =>
          val (_, _, nFrames) = decoder.dims(payload)
          val idxs = 0 until nFrames by everyK
          // batch path: one stream decode per payload, not one per frame
          decoder.frames(payload, idxs).zip(idxs.iterator).map {
            case (bytes, idx) => Frame(id, idx, bytes)
          }
        }
      }
  }

  /** Resize/frame-sample stub: emits target dims + a byte-sliced
    * "thumbnail" of the payload, preserving batch shape.
    */
  def resize(spark: SparkSession, docs: DataFrame, maxDim: Int,
             decoder: PayloadDecoder = StubDecoder): Dataset[Thumb] = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        decoder.init()
        rows.map { case (id, payload) =>
          // scaled() = one decode per payload for real decoders
          val (tw, th, bytes) = decoder.scaled(payload, maxDim)
          Thumb(id, tw, th, bytes)
        }
      }
  }
}
