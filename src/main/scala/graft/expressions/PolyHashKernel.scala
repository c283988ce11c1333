package graft.expressions

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions.{HashBase, HashMod}

/** The one polynomial-hash kernel every polyhash form delegates to:
  * fold over the string's UNICODE CODE POINTS,
  * `h -> (h * 131 + cp) mod 1e9+7`.
  *
  * Code points — not UTF-8 bytes, not UTF-16 units — because that is
  * what the declarative spec computes (`ascii(substr(s, i, 1))` yields
  * the i-th code point; Spark's `Ascii` is `codePointAt(0)`) and what
  * the DuckDB oracle's `list_transform(range(...), i -> ascii(text[i]))`
  * computes. Round-6 change: the native loop previously hashed raw
  * UTF-8 bytes under a doc-only "ASCII corpus" contract, which made
  * [[RewritePolyHash]] silently value-changing on non-ASCII input;
  * folding code points makes native == HOF == JVM == oracle on ALL
  * valid UTF-8, so the rewrite is universally value-preserving
  * (law-pinned in ExpressionSpec's non-ASCII test). On ASCII input the
  * output is byte-for-byte what the old loop produced — no corpus
  * fingerprint changes.
  *
  * A top-level object so the mirror class carries static forwarders —
  * generated code calls `graft.expressions.PolyHashKernel.hash(s)`
  * directly inside whole-stage codegen, no per-row allocation.
  */
object PolyHashKernel {

  /** In-place UTF-8 decode + fold; no allocation. Total on ALL byte
    * sequences, valid or not, and equal to the HOF spec on all of
    * them: chars are segmented exactly as `UTF8String
    * .numBytesForFirstByte` does (stray continuation bytes and
    * 0xF8–0xFF lead bytes are 1-byte chars — that is how `substr`
    * slices), and any malformed char (bad continuation, truncation,
    * overlong form, CESU surrogate, > U+10FFFF) folds U+FFFD — the
    * replacement char `ascii(substr(s, i, 1))` yields for it, because
    * UTF8String→String runs the JDK's REPLACE decoder. On valid
    * UTF-8 the fold is the plain code-point sequence, byte-identical
    * to the pre-round-7 loop (no corpus fingerprint changes); the
    * DuckDB oracle only ever holds valid UTF-8, so oracle parity is
    * unchanged. ExpressionSpec pins the malformed-input parity. */
  def hash(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      // segmentation table of UTF8String.numBytesForFirstByte: leads
      // that can never start a valid char (continuations, overlong
      // C0/C1, F5+) count as 1-byte chars, NOT their nominal widths
      val len =
        if (b < 0xC2) 1 // ASCII, stray continuation, overlong C0/C1
        else if (b < 0xE0) 2
        else if (b < 0xF0) 3
        else if (b <= 0xF4) 4
        else 1 // F5-FF can encode nothing <= U+10FFFF
      def cont(k: Int): Boolean =
        i + k < n && (s.getByte(i + k) & 0xC0) == 0x80
      def cb(k: Int): Int = s.getByte(i + k) & 0x3F
      val cp: Int =
        if (b < 0x80) b
        else if (len == 2 && b >= 0xC2 && cont(1)) // 0xC0/0xC1 overlong
          ((b & 0x1F) << 6) | cb(1)
        else if (len == 3 && cont(1) && cont(2) && {
          val b1 = s.getByte(i + 1) & 0xFF
          (b != 0xE0 || b1 >= 0xA0) && // overlong
            (b != 0xED || b1 <= 0x9F) // CESU-8 surrogate half
        })
          ((b & 0x0F) << 12) | (cb(1) << 6) | cb(2)
        else if (len == 4 && b <= 0xF4 && cont(1) && cont(2) && cont(3) && {
          val b1 = s.getByte(i + 1) & 0xFF
          (b != 0xF0 || b1 >= 0x90) && // overlong
            (b != 0xF4 || b1 <= 0x8F) // > U+10FFFF
        })
          ((b & 0x07) << 18) | (cb(1) << 12) | (cb(2) << 6) | cb(3)
        else 0xFFFD
      h = (h * HashBase + cp) % HashMod
      i += len
    }
    h
  }

  /** UTF-16 `String` twin for JVM-side kernels ([[graft.functions
    * .TextFunctions.polyHashJvm]]): same fold over `codePointAt`,
    * surrogate pairs consumed as one code point. */
  def hashString(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * HashBase + cp) % HashMod
      i += Character.charCount(cp)
    }
    h
  }
}
