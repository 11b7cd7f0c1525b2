package graft.functions

/** Deterministic, VALID canonical WAV payloads whose PCM samples are a
  * pure formula of the id — the audio analog of [[SyntheticImage]]
  * (the q179 oracle discipline): the engine decodes the container and
  * the sample bytes for real, while the DuckDB oracle computes the
  * same per-channel statistics straight from the formula without
  * parsing a byte — cross-engine agreement proves encoder, container
  * AND decoder.
  *
  * Stream parameters (a formula of id): channels = id%2+1,
  * bits = 8 when id%3==0 else 16, rate = 8000+(id%5)·1000,
  * frames = id%40+50. Interleaved sample s = f·ch + c carries
  *   8-bit (unsigned):  (id·7 + s·13) mod 256
  *   16-bit (signed LE): ((id·11 + s·17) mod 65536) − 32768
  * Every 11th id (id % 11 == 3) ships a TRUNCATED 10-byte header —
  * the malformed row the decoder must degrade on, never throw.
  *
  * Planted RE-ENCODES (q206's audio content dedup): every
  * id % 13 == 9 doc (id ≥ 9, non-recursive — plants only source from
  * base ids) carries id−9's exact sample content (channels, bit
  * depth, frame count, samples all via srcOf) in a fresh container
  * with its OWN sample rate — same audio, different mux.
  */
object SyntheticAudio {

  /** The content-source id: id − 9 for the planted re-encodes. */
  def srcOf(id: Long): Long =
    if (id % 13 == 9 && id >= 9 &&
        !((id - 9) % 13 == 9 && id - 9 >= 9)) id - 9
    else id

  def payload(id: Long): Array[Byte] = {
    val src = srcOf(id)
    val ch = (src % 2 + 1).toInt
    val bits = if (src % 3 == 0) 8 else 16
    val rate = (8000 + (id % 5) * 1000).toInt // container param: raw id
    val frames = (src % 40 + 50).toInt
    val stride = ch * bits / 8
    val dataSize = frames * stride
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(36 + dataSize)
    bb.put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")).putInt(16)
    bb.putShort(1)                      // PCM
    bb.putShort(ch.toShort).putInt(rate)
    bb.putInt(rate * stride)            // byte rate
    bb.putShort(stride.toShort).putShort(bits.toShort)
    bb.put("data".getBytes("ASCII")).putInt(dataSize)
    var s = 0
    val total = frames * ch
    while (s < total) {
      if (bits == 8) bb.put(((src * 7 + s * 13) % 256).toByte)
      else bb.putShort((((src * 11 + s * 17) % 65536) - 32768).toShort)
      s += 1
    }
    val full = bb.array()
    if (id % 11 == 3) full.take(10) else full
  }
}
