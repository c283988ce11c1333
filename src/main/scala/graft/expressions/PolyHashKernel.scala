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

  /** In-place UTF-8 decode + fold; no allocation. Assumes valid UTF-8
    * (UTF8String's own invariant); a truncated trailing sequence is
    * folded from the bytes present rather than thrown on. */
  def hash(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      var cp = b
      var len = 1
      if (b >= 0x80) {
        if ((b & 0xE0) == 0xC0) { cp = b & 0x1F; len = 2 }
        else if ((b & 0xF0) == 0xE0) { cp = b & 0x0F; len = 3 }
        else { cp = b & 0x07; len = 4 }
        var k = 1
        while (k < len && i + k < n) {
          cp = (cp << 6) | (s.getByte(i + k) & 0x3F)
          k += 1
        }
      }
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
