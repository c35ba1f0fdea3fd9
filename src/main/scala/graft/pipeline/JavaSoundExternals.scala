package graft.pipeline

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

/** [[Externals]] with a REAL compressed-audio decode binding: the JDK's
  * `javax.sound.sampled` SPI chain (reference decodes mp3 via librosa,
  * pre_processing/process_all.py:382-392). Out of the box the JDK SPIs
  * cover wav/au/aiff in any PCM width plus ULAW/ALAW; MPEG audio routes
  * to the native zero-payload Layer III decode
  * ([[graft.operators.AudioOps.decodeMp3Silent]] — real framing/side
  * info, spec-exact silence PCM) and spectral-payload streams raise a
  * pointed error until an mp3/ogg SPI jar lands on the executor
  * classpath, which extends coverage with no code change — the point of
  * the trait boundary. Everything non-audio still delegates to
  * [[StubExternals]]' deterministic fakes.
  *
  * Decode path: container parse -> convert to 16-bit signed little-endian
  * PCM at the source rate -> mono mixdown by channel average (librosa
  * mono=True semantics, same as AudioOps.decodePcm16Wav).
  */
object JavaSoundExternals extends Externals {

  override def fetchBookMetadata(url: String): BookMeta =
    StubExternals.fetchBookMetadata(url)

  /** Real PDFs (by the `%PDF-` magic, §7.5.2) route to the native
    * extractor ([[graft.operators.PdfText]] — linear object scan,
    * Inflater-backed FlateDecode, BT/ET text operators; r13, the
    * decodeAudio/Mp3Layer3 precedent). Non-PDF payloads keep the
    * fixture stub semantics (the reference fixtures use ASCII
    * payloads as stand-in "PDFs"). */
  override def extractPdfText(bytes: Array[Byte]): String =
    if (bytes != null && bytes.length >= 5 &&
        bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
        bytes(3) == 'F' && bytes(4) == '-')
      graft.operators.PdfText.extract(bytes)
    else StubExternals.extractPdfText(bytes)

  override def transcribe(samples: Array[Float], refText: String): String =
    StubExternals.transcribe(samples, refText)

  override def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    StubExternals.resizeImage(bytes, w, h)

  override def decodeAudio(bytes: Array[Byte]): (Array[Float], Int) = {
    // MPEG audio first: stock JDK SPIs reject it, and Layer III decodes
    // natively for Mp3Layer3's class (spectral count1 lines, silence,
    // ID3/APE tags). Streams needing ISO print tables fall through with
    // a pointed UnsupportedOperationException naming the SPI seam.
    val mpegSync = bytes.length >= 4 &&
      ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xe0) == 0xe0 ||
        bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3')
    if (mpegSync) // disjoint from RIFF/FORM/.snd magics the SPIs handle
      return graft.operators.AudioOps.decodeMp3(bytes)
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val base = in.getFormat
      val ch = math.max(base.getChannels, 1)
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        base.getSampleRate, 16, ch, ch * 2, base.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, in)
      try {
        val buf = pcm.readAllBytes()
        val n = buf.length / 2 / ch
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          var acc = 0.0f
          var c = 0
          while (c < ch) {
            val off = (i * ch + c) * 2
            val s = ((buf(off) & 0xff) | (buf(off + 1) << 8)).toShort
            acc += s / 32768.0f
            c += 1
          }
          out(i) = acc / ch
          i += 1
        }
        (out, base.getSampleRate.toInt)
      } finally pcm.close()
    } finally in.close()
  }
}
