package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Shared UTF-8 → code-point decode for the rolling-hash kernels
  * ([[WinnowMins]], [[GramHashes]]) — ONE spelling of the malformed-byte
  * convention so the two fingerprint families can never drift.
  */
private[functions] object Utf8Codes {

  /** Code points straight off the UTF-8 bytes (no intermediate UTF-16
    * String); the returned count n EQUALS `UTF8String.numChars` (what
    * `length(text)` counts) BY CONSTRUCTION: the advance per character is
    * Spark's own `numBytesForFirstByte`, clamped at end-of-string exactly
    * the way numChars' loop is. The array is an upper-bound buffer — read
    * only `[0, n)`. ASCII — the dominant corpus case — is the w == 1 fast
    * path.
    *
    * Malformed UTF-8 matters here (dirty web corpora carry it; parquet
    * strings are not validated on write): a stray continuation byte or
    * invalid lead advances 1 and contributes the unsigned byte value,
    * and a multi-byte sequence TRUNCATED at end-of-string counts as ONE
    * character consuming the tail — the earlier hand-rolled widths
    * counted each truncated-tail byte separately, which diverged from
    * numChars and would have mis-based every downstream `substring`/
    * `length` position computed from these codes (review r16;
    * [[GramHashes]]' span arithmetic is position-load-bearing, unlike
    * the original [[WinnowMins]] consumer). DuckDB rejects invalid UTF-8
    * at ingest, so the oracle only ever replays the valid branches.
    */
  def decode(s: UTF8String): (Array[Long], Int) = {
    val bytes = s.getBytes
    val byteLen = bytes.length
    var n = 0
    var ci = 0
    val codes = new Array[Long](byteLen) // upper bound; n ≤ byteLen
    while (ci < byteLen) {
      val b0 = bytes(ci)
      val w = UTF8String.numBytesForFirstByte(b0)
      if (w <= 1) { codes(n) = (b0 & 0xFF).toLong; ci += 1 }
      else if (ci + w > byteLen) {
        // truncated tail: numChars advances past the end counting ONE
        // character — mirror it (lead's unsigned value, consume the rest)
        codes(n) = (b0 & 0xFF).toLong
        ci = byteLen
      } else if (w == 2) {
        codes(n) = (((b0 & 0x1F) << 6) | (bytes(ci + 1) & 0x3F)).toLong
        ci += 2
      } else if (w == 3) {
        codes(n) = (((b0 & 0x0F) << 12) | ((bytes(ci + 1) & 0x3F) << 6) |
          (bytes(ci + 2) & 0x3F)).toLong
        ci += 3
      } else if (w == 4) {
        codes(n) = (((b0 & 0x07) << 18) | ((bytes(ci + 1) & 0x3F) << 12) |
          ((bytes(ci + 2) & 0x3F) << 6) | (bytes(ci + 3) & 0x3F)).toLong
        ci += 4
      } else {
        // widths numBytesForFirstByte can report for historic 5/6-byte
        // leads: no code point to build — opaque lead value, same advance
        codes(n) = (b0 & 0xFF).toLong
        ci += w
      }
      n += 1
    }
    (codes, n)
  }
}
