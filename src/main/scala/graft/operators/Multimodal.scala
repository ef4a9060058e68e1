package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The IMAGE decode path is REAL: [[decodeFeatures]] / [[imageMeta]] run
  * `javax.imageio` (PNG/BMP/GIF/JPEG readers ship with the JDK — no
  * external codec needed) over each payload, producing true width/height
  * and a pixel-luminance histogram. AUDIO METADATA is also real:
  * [[audioMeta]] parses WAV/AIFF containers with JDK-only
  * `javax.sound.sampled.AudioSystem` (sample rate, channels, frame count,
  * duration). MULTI-FRAME extraction is real for `image/gif`
  * ([[frameSample]] via the JDK GIF reader's `getNumImages`/`read(i)`).
  * What stays STUBBED is audio CONTENT decode and video frames
  * ([[decodeStub]] / [[frameSample]]'s byte-offset branch: the JDK ships
  * no mp3/aac/video codecs) with deterministic fakes — the media schema,
  * batched `mapPartitions` shape (the Scala analogue of `mapInPandas`
  * batch processing) and partitioning contract are identical, so a real
  * codec drops in by replacing one function.
  */
object Multimodal {

  /** Schema of a media column: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a binary payload column into the media struct. */
  def asMedia(bytes: org.apache.spark.sql.Column, mime: String): org.apache.spark.sql.Column =
    struct(bytes.as("bytes"), lit(mime).as("mime"),
      lit(null).cast(IntegerType).as("width"), lit(null).cast(IntegerType).as("height"))

  /** Cheap metadata over the payload — pure built-ins, no decode:
    * byte length + sha256 content hash (dedup key for media).
    */
  def binaryMeta(df: DataFrame, idCol: String, mediaCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(s"$mediaCol.bytes")).cast("long").as("byte_len"),
      sha2(col(s"$mediaCol.bytes"), 256).as("content_sha256"),
      col(s"$mediaCol.mime").as("mime"))

  final case class MediaFeature(id: Long, dim: Int, value: Double)
  final case class MediaDims(id: Long, mime: String, width: Option[Int], height: Option[Int])

  /** JDK-only image decode (`javax.imageio` — PNG/BMP/GIF/JPEG readers are
    * part of the JDK). Returns (width, height, 4-bin luminance-histogram
    * density over the decoded pixels); None when no installed reader
    * accepts the payload. Deterministic for lossless formats (PNG/BMP):
    * the pixel values are exact, so the histogram is engine-independent.
    */
  private[operators] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            hist(lum / 64) += 1
            x += 1
          }
          y += 1
        }
        val n = math.max(1L, w.toLong * h).toDouble
        Some((w, h, hist.map(_ / n)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode + feature extraction with the REAL image path: payloads whose
    * mime is `image/ *` go through [[decodeImage]] (luminance histogram
    * over actual pixels); every other mime — and any image payload no
    * reader accepts — falls back to the deterministic byte histogram
    * ([[decodeStub]]'s fake, kept for the codec-less audio/video classes).
    * Output schema matches [[decodeStub]]: (id, dim, value).
    */
  def decodeFeatures(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"),
      col(s"$mediaCol.bytes").as("bytes"), col(s"$mediaCol.mime").as("mime"))
    implicit val enc = Encoders.product[MediaFeature]
    input.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val decoded =
          if (mime != null && mime.startsWith("image/")) decodeImage(bytes) else None
        decoded match {
          case Some((_, _, hist)) =>
            hist.toIndexedSeq.zipWithIndex.map { case (v, d) => MediaFeature(id, d, v) }
          case None =>
            val hist = new Array[Long](4)
            var i = 0
            while (i < bytes.length) { hist((bytes(i) & 0xff) / 64) += 1; i += 1 }
            val n = math.max(1, bytes.length).toDouble
            (0 until 4).map(d => MediaFeature(id, d, hist(d) / n))
        }
      }
    }.toDF("id", "dim", "value")
  }

  /** Fill width/height in the media metadata from a real decode: one row
    * per input with the decoded dimensions for image payloads, nulls for
    * everything else (the media-schema population step of an ingest
    * pipeline; [[mediaSchema]] carries the dims from here on).
    */
  def imageMeta(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"),
      col(s"$mediaCol.bytes").as("bytes"), col(s"$mediaCol.mime").as("mime"))
    implicit val enc = Encoders.product[MediaDims]
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val dims =
          if (mime != null && mime.startsWith("image/")) decodeImage(bytes) else None
        MediaDims(id, mime, dims.map(_._1), dims.map(_._2))
      }
    }.toDF("id", "mime", "width", "height")
  }

  final case class AudioMetaRow(id: Long, sample_rate: Option[Long],
    channels: Option[Long], frames: Option[Long], duration_us: Option[Long])

  final case class VideoMetaRow(id: Long, container: Option[String],
    duration_ms: Option[Long], width: Option[Long], height: Option[Long],
    n_tracks: Option[Long])

  /** Minimal-but-REAL MP4 container (ISO/IEC 14496-12 box layout, public
    * spec): `ftyp` + `moov[mvhd + n×trak[tkhd]]`, all fields big-endian,
    * v0 boxes, 16.16 fixed-point track dims. Headers-only (no mdat) — a
    * metadata probe never needs media data, and that is exactly what a
    * pipeline filter reads at 100 TB: the first KB of each object.
    */
  def mp4Bytes(timescale: Int, duration: Int, width: Int, height: Int,
      tracks: Int): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", {
      val bb = java.nio.ByteBuffer.allocate(8)
      bb.put("isom".getBytes("US-ASCII")).putInt(0x200)
      bb.array()
    })
    val mvhd = box("mvhd", {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // creation, modification
        .putInt(timescale).putInt(duration)
        .putInt(0x00010000) // rate 1.0
        .putShort(0x0100.toShort) // volume 1.0
        .putShort(0).putLong(0L) // reserved
      // identity matrix
      bb.putInt(0x00010000).putInt(0).putInt(0)
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
      (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
      bb.putInt(tracks + 1) // next_track_ID
      bb.array()
    })
    val traks = (1 to tracks).map { tid =>
      box("trak", box("tkhd", {
        val bb = java.nio.ByteBuffer.allocate(84)
        bb.putInt(0x00000007) // v0, flags: enabled|in_movie|in_preview
          .putInt(0).putInt(0) // creation, modification
          .putInt(tid).putInt(0) // track_ID, reserved
          .putInt(duration)
          .putLong(0L) // reserved
          .putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/vol/resv
        bb.putInt(0x00010000).putInt(0).putInt(0)
          .putInt(0).putInt(0x00010000).putInt(0)
          .putInt(0).putInt(0).putInt(0x40000000)
        bb.putInt(width << 16).putInt(height << 16) // 16.16 fixed
        bb.array()
      }))
    }
    val moov = box("moov", (mvhd +: traks).reduce(_ ++ _))
    ftyp ++ moov
  }

  /** Minimal-but-REAL AVI container (RIFF 'AVI ' with LIST hdrl/avih —
    * the public Microsoft RIFF layout, little-endian): the avih main
    * header carries µs-per-frame, total frames, stream count and dims —
    * the fields a pipeline filter reads.
    */
  def aviBytes(usPerFrame: Int, totalFrames: Int, width: Int, height: Int,
      streams: Int): Array[Byte] = {
    val avih = java.nio.ByteBuffer.allocate(8 + 56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.put("avih".getBytes("US-ASCII")).putInt(56)
      .putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(totalFrames).putInt(0).putInt(streams).putInt(0)
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    val hdrlPayload = "hdrl".getBytes("US-ASCII") ++ avih.array()
    val list = java.nio.ByteBuffer.allocate(8 + hdrlPayload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    list.put("LIST".getBytes("US-ASCII")).putInt(hdrlPayload.length)
      .put(hdrlPayload)
    val riffPayload = "AVI ".getBytes("US-ASCII") ++ list.array()
    val riff = java.nio.ByteBuffer.allocate(8 + riffPayload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes("US-ASCII")).putInt(riffPayload.length)
      .put(riffPayload)
    riff.array()
  }

  /** JDK-only video CONTAINER header parse — MP4 box walk (moov→mvhd for
    * timescale/duration, trak count, first tkhd for 16.16 dims; v0 and v1
    * boxes both handled) and RIFF/AVI chunk walk (LIST hdrl→avih).
    * Returns (container, duration_ms, width, height, n_tracks); None when
    * neither layout matches. duration_ms is exact integer floor division
    * (mp4: duration·1000/timescale; avi: µsPerFrame·frames/1000) — the
    * oracle-mirrorable arithmetic. This is deliberately METADATA-level:
    * the JDK ships no video codecs, so frame DECODE stays stubbed
    * ([[frameSample]]), but the filter-relevant header fields parse for
    * real — the same JDK-feasible boundary as the WAV/AIFF audio parse.
    */
  private[operators] def decodeVideoMeta(
      bytes: Array[Byte]): Option[(String, Long, Long, Long, Long)] = {
    def ascii(b: Array[Byte], off: Int): String =
      if (off + 4 <= b.length) new String(b, off, 4, "US-ASCII") else ""
    try {
      if (bytes.length >= 12 && ascii(bytes, 0) == "RIFF" && ascii(bytes, 8) == "AVI ") {
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var pos = 12
        while (pos + 8 <= bytes.length) {
          val tpe = ascii(bytes, pos)
          val size = bb.getInt(pos + 4)
          if (tpe == "LIST" && ascii(bytes, pos + 8) == "hdrl") {
            var p = pos + 12
            val end = math.min(bytes.length, pos + 8 + size)
            while (p + 8 <= end) {
              if (ascii(bytes, p) == "avih") {
                val usPerFrame = bb.getInt(p + 8).toLong & 0xffffffffL
                val frames = bb.getInt(p + 24).toLong & 0xffffffffL
                val streams = bb.getInt(p + 32).toLong & 0xffffffffL
                val w = bb.getInt(p + 40).toLong & 0xffffffffL
                val h = bb.getInt(p + 44).toLong & 0xffffffffL
                return Some(("avi", usPerFrame * frames / 1000L, w, h, streams))
              }
              p += 8 + bb.getInt(p + 4) + (bb.getInt(p + 4) & 1) // chunks pad to even
            }
            return None // hdrl without avih: not a parseable AVI
          }
          pos += 8 + size + (size & 1)
        }
        None
      } else {
        // MP4: top-level box walk to moov, then one child walk
        val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian default
        var pos = 0
        var moov = -1
        var moovEnd = -1
        while (pos + 8 <= bytes.length && moov < 0) {
          val size = bb.getInt(pos)
          if (size < 8) return None
          if (ascii(bytes, pos + 4) == "moov") {
            moov = pos + 8; moovEnd = math.min(bytes.length, pos + size)
          }
          pos += size
        }
        if (moov < 0) return None
        var p = moov
        var timescale = 0L
        var duration = 0L
        var tracks = 0L
        var w = 0L
        var h = 0L
        while (p + 8 <= moovEnd) {
          val size = bb.getInt(p)
          if (size < 8) return None
          ascii(bytes, p + 4) match {
            case "mvhd" =>
              val version = bytes(p + 8) & 0xff
              if (version == 1) {
                timescale = bb.getInt(p + 8 + 4 + 16).toLong & 0xffffffffL
                duration = bb.getLong(p + 8 + 4 + 20)
              } else {
                timescale = bb.getInt(p + 8 + 4 + 8).toLong & 0xffffffffL
                duration = bb.getInt(p + 8 + 4 + 12).toLong & 0xffffffffL
              }
            case "trak" =>
              tracks += 1
              // child walk for tkhd (dims from the FIRST trak)
              var c = p + 8
              val trakEnd = math.min(moovEnd, p + size)
              while (c + 8 <= trakEnd) {
                val csize = bb.getInt(c)
                if (csize < 8) return None
                if (ascii(bytes, c + 4) == "tkhd" && w == 0L) {
                  val version = bytes(c + 8) & 0xff
                  // v0: verflags 4 + times 8 + id/resv 8 + dur 4 = 24;
                  // v1 times are 8 bytes each and dur 8 → 40
                  val afterDur = c + 8 + (if (version == 1) 4 + 16 + 8 + 8 else 4 + 8 + 8 + 4)
                  // + reserved 8 + layer/alt/volume/resv 8 + matrix 36
                  val dimsOff = afterDur + 8 + 8 + 36
                  w = (bb.getInt(dimsOff).toLong & 0xffffffffL) >> 16
                  h = (bb.getInt(dimsOff + 4).toLong & 0xffffffffL) >> 16
                }
                c += csize
              }
            case _ => ()
          }
          p += size
        }
        if (timescale <= 0 || tracks == 0) None
        else Some(("mp4", duration * 1000L / timescale, w, h, tracks))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL video-container metadata: parse each `video/ *` payload's MP4 or
    * AVI header with [[decodeVideoMeta]] and emit (id, container,
    * duration_ms, width, height, n_tracks); non-video mimes and
    * unparseable payloads yield nulls. Same batched `mapPartitions`
    * contract as [[audioMeta]].
    */
  def videoMeta(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"),
      col(s"$mediaCol.bytes").as("bytes"), col(s"$mediaCol.mime").as("mime"))
    implicit val enc = Encoders.product[VideoMetaRow]
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val meta =
          if (mime != null && mime.startsWith("video/")) decodeVideoMeta(bytes)
          else None
        meta match {
          case Some((container, durMs, w, h, tracks)) =>
            VideoMetaRow(id, Some(container), Some(durMs), Some(w), Some(h),
              Some(tracks))
          case None => VideoMetaRow(id, None, None, None, None, None)
        }
      }
    }.toDF(idCol, "container", "duration_ms", "width", "height", "n_tracks")
  }

  /** Fixture-in-query video containers (the video analogue of [[docWav]]):
    * even ids become headers-only MP4s, odd ids AVIs, every header field
    * an arithmetic function of the id — so [[videoMeta]]'s REAL box/RIFF
    * walk runs end-to-end while the oracle recomputes
    * duration/dims/tracks from the id alone.
    */
  def docVideo(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"))
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY, Encoders.STRING)
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        if (id % 2 == 0)
          (id, mp4Bytes(timescale = 600,
            duration = (1000 + id * 37 % 100000).toInt,
            width = (160 + id % 32).toInt, height = (90 + id % 18).toInt,
            tracks = (1 + id % 3).toInt), "video/mp4")
        else
          (id, aviBytes(usPerFrame = 33333,
            totalFrames = (10 + id % 100).toInt,
            width = (320 + id % 16).toInt, height = (240 + id % 9).toInt,
            streams = (1 + id % 2).toInt), "video/x-msvideo")
      }
    }.toDF("id", "payload", "mime")
      .select(col("id").as(idCol),
        struct(col("payload").as("bytes"), col("mime").as("mime"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"))
          .as("media"))
  }

  /** Canonical 16-bit PCM WAV container around `data` (RIFF/fmt/data, the
    * 44-byte header layout): a JVM-side writer used by the declared audio
    * query's fixture-in-query and by the golden-bytes spec. `data` is
    * truncated to whole frames (blockAlign = 2·channels).
    */
  def wavBytes(sampleRate: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    val blockAlign = 2 * channels
    val dataLen = (data.length / blockAlign) * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(data, 0, dataLen)
    bb.array()
  }

  /** JDK-only audio container parse (`javax.sound.sampled.AudioSystem` —
    * WAV/AIFF/AU readers ship with the JDK): (sampleRate, channels,
    * frameLength); None when no installed reader accepts the payload.
    */
  private[operators] def decodeAudio(bytes: Array[Byte]): Option[(Long, Long, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        // PCM container rates are whole numbers; the float→long round is
        // exact for every real WAV/AIFF header
        Some((math.round(fmt.getSampleRate.toDouble),
          fmt.getChannels.toLong, in.getFrameLength))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL audio metadata: parse each `audio/ *` payload with
    * [[decodeAudio]] and emit (id, sample_rate, channels, frames,
    * duration_us); non-audio mimes and unparseable payloads yield nulls.
    * duration_us = frames·10⁶ / rate in exact Long arithmetic (floor —
    * oracle-mirrorable integer division). Same batched `mapPartitions`
    * contract as the image path.
    */
  def audioMeta(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"),
      col(s"$mediaCol.bytes").as("bytes"), col(s"$mediaCol.mime").as("mime"))
    implicit val enc = Encoders.product[AudioMetaRow]
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val meta =
          if (mime != null && mime.startsWith("audio/")) decodeAudio(bytes) else None
        meta match {
          case Some((rate, ch, fr)) =>
            AudioMetaRow(id, Some(rate), Some(ch), Some(fr),
              Some(if (rate > 0) fr * 1000000L / rate else 0L))
          case None => AudioMetaRow(id, None, None, None, None)
        }
      }
    }.toDF(idCol, "sample_rate", "channels", "frames", "duration_us")
  }

  /** Fixture-in-query WAV wrapper (the audio analogue of MultimodalSpec's
    * rendered golden PNG): wrap each doc's text bytes in a canonical PCM
    * WAV container whose rate/channels derive from the id — so the
    * declared audio query exercises the REAL `AudioSystem` parse path
    * end-to-end while staying arithmetically oracle-checkable (the oracle
    * recomputes rate/channels/frames/duration from id and byte length).
    */
  def docWav(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("data"))
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        val data = r.getAs[Array[Byte]](1)
        val rate = 8000 + (id % 8).toInt * 1000
        val channels = 1 + (id % 2).toInt
        (id, wavBytes(rate, channels, data))
      }
    }.toDF("id", "wav")
      .select(col("id").as(idCol), asMedia(col("wav"), "audio/wav").as("media"))
  }

  /** Minimal animated-GIF encoder over the JDK's own `ImageIO` GIF writer
    * (`prepareWriteSequence`/`writeToSequence` — multi-image GIF89a).
    * Every frame is a uniform gray `g` over an EXPLICIT 256-gray
    * `IndexColorModel`, so the indexed round trip is exact: pixel index g
    * → palette entry (g, g, g) → decoded luminance g, no quantizer in the
    * loop. Used by [[docGif]] and the golden-GIF spec.
    */
  def gifBytes(frameGrays: Seq[Int], w: Int, h: Int): Array[Byte] = {
    val ramp = Array.tabulate[Byte](256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frameGrays.foreach { g =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        img.getRaster.setSamples(0, 0, w, h, 0, Array.fill(w * h)(g))
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** REAL multi-frame GIF decode (the JDK's GIF reader exposes
    * `getNumImages(true)` + `read(i)` — no external codec): one
    * (width, height, mean pixel luminance) per frame; None when no reader
    * accepts the payload. Mean luminance uses the integer per-pixel
    * (r+g+b)/3 then averages in double — exact for uniform frames.
    */
  private[operators] def decodeGifFrames(
      bytes: Array[Byte]): Option[IndexedSeq[(Int, Int, Double)]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          val n = reader.getNumImages(true)
          Some((0 until n).map { i =>
            val img = reader.read(i)
            val w = img.getWidth
            val h = img.getHeight
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                x += 1
              }
              y += 1
            }
            (w, h, sum.toDouble / math.max(1L, w.toLong * h))
          })
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fixture-in-query animated GIF (the video-family analogue of
    * [[docWav]]): each doc becomes an 8×8 GIF of `1 + id % 5` uniform-gray
    * frames, gray `(id·31 + frame·7) % 256` — so [[frameSample]]'s REAL
    * multi-frame decode path runs end-to-end while staying arithmetically
    * oracle-checkable (the oracle recomputes frame count and per-frame
    * luminance from the id; a corrupt encode, palette drift, or misparse
    * anywhere breaks the hash).
    */
  def docGif(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"))
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = 1 + (id % 5).toInt
        val grays = (0 until n).map(f => (((id * 31 + f * 7) % 256 + 256) % 256).toInt)
        (id, gifBytes(grays, 8, 8))
      }
    }.toDF("id", "gif")
      .select(col("id").as(idCol), asMedia(col("gif"), "image/gif").as("media"))
  }

  final case class FrameRow(id: Long, frame_offset: Long,
    width: Option[Int], height: Option[Int], mean_lum: Option[Double])

  /** Frame sampling with a REAL decode for the one moving-image container
    * the JDK ships a codec for: `image/gif` payloads go through
    * [[decodeGifFrames]] and emit every `frameStride`-th frame with its
    * true width/height/mean-luminance. Video mimes (and any payload no
    * reader accepts) keep the deterministic byte-offset STUB — every
    * `byteStride`-th offset, decode columns null — because the JDK ships
    * no video codecs; a real codec drops in by extending the decode
    * branch. One unified schema so the dispatch is a column-level fact.
    */
  def frameSample(
      df: DataFrame,
      idCol: String,
      mediaCol: String,
      frameStride: Int,
      byteStride: Int): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"),
      col(s"$mediaCol.bytes").as("bytes"), col(s"$mediaCol.mime").as("mime"))
    implicit val enc = Encoders.product[FrameRow]
    input.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val gif = if (mime == "image/gif") decodeGifFrames(bytes) else None
        gif match {
          case Some(frames) =>
            (0 until frames.length by frameStride).map { i =>
              val (w, h, lum) = frames(i)
              FrameRow(id, i.toLong, Some(w), Some(h), Some(lum))
            }
          case None =>
            // byte-offset stub, same shape as the former frameSampleStub:
            // offsets 0..len-1 step byteStride. An EMPTY payload yields no
            // rows — the same contract as the oracle's
            // range(0, octet_length, stride), which emits nothing at
            // length 0 (a synthetic offset-0 row for zero bytes diverged
            // cross-engine and only passed by fixture luck)
            (0 until bytes.length by byteStride)
              .map(off => FrameRow(id, off.toLong, None, None, None))
        }
      }
    }.toDF("id", "frame_offset", "width", "height", "mean_lum")
  }

  final case class ResizeRow(id: Long, orig_w: Int, orig_h: Int,
    new_w: Int, new_h: Int, lum_sum: Long, n_px: Long)

  /** REAL image resize: ImageIO decode → aspect-preserving fit into a
    * `box`×`box` bounding box → re-encode to PNG. The resample kernel is
    * a FULLY-SPECIFIED integer nearest-neighbor — dst(x,y) =
    * src(x·w ÷ dw, y·h ÷ dh), floor division — rather than AWT's
    * interpolator, because the kernel's output must be engine-independent
    * arithmetic (AffineTransformOp's sample positions are implementation
    * detail; floor-NN is three integer ops an SQL oracle reproduces
    * exactly). Geometry: scale = box/max(w,h) applied as integer floor
    * division with a ≥1 clamp — new_w = max(1, w·box ÷ max(w,h)).
    *
    * Returns (id, orig_w, orig_h, new_w, new_h, lum_sum, n_px): the
    * resized dims plus the SUM of per-pixel integer luminance
    * ((r+g+b)÷3) over the resized image — exact integers end-to-end, so
    * a declared query over a derived fixture is hash-checkable while the
    * engine really decodes, really resamples, and really re-encodes (the
    * resized PNG is produced and re-decoded to read the reported dims —
    * a corrupt encode breaks the row). Non-image payloads and
    * undecodable images are DROPPED (a resize has no meaningful output
    * row for them; callers wanting per-row presence join back on id).
    */
  def resizeFit(df: DataFrame, idCol: String, mediaCol: String, box: Int): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"),
      col(s"$mediaCol.bytes").as("bytes"), col(s"$mediaCol.mime").as("mime"))
    implicit val enc = Encoders.product[ResizeRow]
    input.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val img =
          if (mime != null && mime.startsWith("image/"))
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            catch { case scala.util.control.NonFatal(_) => None }
          else None
        img.map { src =>
          val w = src.getWidth
          val h = src.getHeight
          val m = math.max(w, h)
          val dw = math.max(1, w * box / m)
          val dh = math.max(1, h * box / m)
          val dst = new java.awt.image.BufferedImage(dw, dh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < dh) {
            var x = 0
            while (x < dw) {
              dst.setRGB(x, y, src.getRGB(x * w / dw, y * h / dh))
              x += 1
            }
            y += 1
          }
          // real re-encode + re-decode: the reported dims come from the
          // produced PNG, not the in-memory buffer
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", out)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(out.toByteArray))
          var lum = 0L
          y = 0
          while (y < back.getHeight) {
            var x = 0
            while (x < back.getWidth) {
              val rgb = back.getRGB(x, y)
              lum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              x += 1
            }
            y += 1
          }
          ResizeRow(id, w, h, back.getWidth, back.getHeight,
            lum, back.getWidth.toLong * back.getHeight)
        }
      }
    }.toDF("id", "orig_w", "orig_h", "new_w", "new_h", "lum_sum", "n_px")
  }

  /** Fixture-in-query two-tone PNG (the resize analogue of [[docGif]]):
    * each doc becomes a (8 + id%16) × (8 + id%8) image whose LEFT half
    * (x·2 < w) is gray `(id·13) % 256` and right half `(id·29) % 256`,
    * PNG-encoded by the same ImageIO that decodes it. Two tones make the
    * resize CONTENT check real: the oracle recomputes the resized
    * luminance sum from the nearest-neighbor sample positions, so a
    * kernel that sampled wrong positions (or a codec that shifted
    * pixels) breaks the hash.
    */
  def docPng(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"))
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = 8 + (id % 16).toInt
        val h = 8 + (id % 8).toInt
        val ga = (((id * 13) % 256 + 256) % 256).toInt
        val gb = (((id * 29) % 256 + 256) % 256).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = if (x * 2 < w) ga else gb
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        (id, out.toByteArray)
      }
    }.toDF("id", "png")
      .select(col("id").as(idCol), asMedia(col("png"), "image/png").as("media"))
  }

  /** STUB decode + feature extraction, batched per partition (the real
    * implementation would hand each batch to a codec library). The fake
    * "feature" is a deterministic 4-bin byte histogram density — keeps the
    * batch shape, schema and partitioning contract of the real thing.
    */
  def decodeStub(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"), col(s"$mediaCol.bytes").as("bytes"))
    implicit val enc = Encoders.product[MediaFeature]
    input.mapPartitions { rows: Iterator[Row] =>
      // batch loop: in a real decoder this is where a codec processes a
      // whole Arrow batch; here we fold bytes into a fixed histogram.
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Long](4)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) / 64) += 1; i += 1 }
        val n = math.max(1, bytes.length).toDouble
        (0 until 4).map(d => MediaFeature(id, d, hist(d) / n))
      }
    }.toDF("id", "dim", "value")
  }

}
