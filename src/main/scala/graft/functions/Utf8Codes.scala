package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Shared UTF-8 → code-point decode for the rolling-hash kernels
  * ([[WinnowMins]], [[GramHashes]]) — ONE spelling of the malformed-byte
  * convention so the two fingerprint families can never drift.
  */
private[functions] object Utf8Codes {

  /** Code points straight off the UTF-8 bytes (no intermediate UTF-16
    * String); the returned count n = numChars (what `length(text)`
    * counts); the array is an upper-bound buffer — read only `[0, n)`.
    * ASCII — the dominant corpus case — is the single-compare fast path.
    *
    * Malformed UTF-8 (a stray continuation byte 0x80–0xBF, an invalid
    * lead ≥ 0xF8, or a multi-byte sequence truncated by end-of-string)
    * advances ONE byte and contributes the unsigned byte value —
    * Spark's own UTF8String convention (numBytesForFirstByte maps
    * invalid leads to 1), and the only out-of-bounds-free choice.
    * Dirty web corpora DO carry such bytes (parquet strings are not
    * validated on write); DuckDB rejects invalid UTF-8 at ingest, so
    * the oracle only ever replays the valid branches.
    */
  def decode(s: UTF8String): (Array[Long], Int) = {
    val bytes = s.getBytes
    val byteLen = bytes.length
    var n = 0
    var ci = 0
    val codes = new Array[Long](byteLen) // upper bound; n ≤ byteLen
    while (ci < byteLen) {
      val b0 = bytes(ci)
      if (b0 >= 0) { codes(n) = b0.toLong; ci += 1 }
      else if ((b0 & 0xE0) == 0xC0 && ci + 1 < byteLen) {
        codes(n) = (((b0 & 0x1F) << 6) | (bytes(ci + 1) & 0x3F)).toLong
        ci += 2
      } else if ((b0 & 0xF0) == 0xE0 && ci + 2 < byteLen) {
        codes(n) = (((b0 & 0x0F) << 12) | ((bytes(ci + 1) & 0x3F) << 6) |
          (bytes(ci + 2) & 0x3F)).toLong
        ci += 3
      } else if ((b0 & 0xF8) == 0xF0 && ci + 3 < byteLen) {
        codes(n) = (((b0 & 0x07) << 18) | ((bytes(ci + 1) & 0x3F) << 12) |
          ((bytes(ci + 2) & 0x3F) << 6) | (bytes(ci + 3) & 0x3F)).toLong
        ci += 4
      } else {
        codes(n) = (b0 & 0xFF).toLong
        ci += 1
      }
      n += 1
    }
    (codes, n)
  }
}
