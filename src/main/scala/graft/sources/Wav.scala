package graft.sources

import javax.sound.sampled.AudioSystem

/** WAV decoding — the reference's audio ingestion (`librosa.load(path,
  * sr=16000, mono=True)`, `dpl/wav2vec/dataset.py:23-27`) via
  * `javax.sound.sampled` (ships with the JVM): PCM bytes -> mono float
  * samples in [-1, 1] + sample rate, with linear resampling to a target
  * rate through the same interp kernel used for feature series.
  */
object Wav {

  final case class Decoded(sampleRate: Int, samples: Array[Double])

  /** Decode PCM WAV bytes to mono doubles (channel-averaged, like
    * librosa's mono=True). Supports 16/24/32-bit signed and 8-bit
    * unsigned/signed PCM; other encodings (float, u-law, a-law) are
    * rejected so callers route them to the error channel. */
  def decode(bytes: Array[Byte]): Decoded = {
    val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      require(enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED || unsigned,
        s"unsupported WAV encoding: $enc (only signed/unsigned PCM)")
      val frameSize = fmt.getFrameSize
      val channels = fmt.getChannels
      val bits = fmt.getSampleSizeInBits
      val bytesPerSample = bits / 8
      val data = in.readAllBytes()
      val nFrames = data.length / frameSize
      val out = new Array[Double](nFrames)
      val max = (1L << (bits - 1)).toDouble
      var f = 0
      while (f < nFrames) {
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val off = f * frameSize + c * bytesPerSample
          var v = 0L
          if (fmt.isBigEndian) {
            var k = 0
            while (k < bytesPerSample) { v = (v << 8) | (data(off + k) & 0xffL); k += 1 }
          } else {
            var k = bytesPerSample - 1
            while (k >= 0) { v = (v << 8) | (data(off + k) & 0xffL); k -= 1 }
          }
          // 8-bit WAV PCM is unsigned (offset-128); wider widths are signed
          val sample =
            if (unsigned) v - (1L << (bits - 1))
            else { val shift = 64 - bits; v << shift >> shift }
          acc += sample.toDouble / max
          c += 1
        }
        out(f) = acc / channels
        f += 1
      }
      Decoded(fmt.getSampleRate.toInt, out)
    } finally in.close()
  }

  /** Decode and linearly resample to `targetRate` (mono). */
  def decodeTo(bytes: Array[Byte], targetRate: Int = 16000): Array[Double] = {
    val d = decode(bytes)
    if (d.sampleRate == targetRate) d.samples
    else {
      val num = math.round(d.samples.length.toDouble * targetRate / d.sampleRate).toInt
      graft.functions.LinearResample.resample(d.samples, math.max(num, 1),
        d.sampleRate.toDouble)
    }
  }
}
