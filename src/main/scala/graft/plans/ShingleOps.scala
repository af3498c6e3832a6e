package graft.plans

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level word-shingle kernels shared by the fused native expressions
  * ([[ShingleMinHash]], [[ShingleHashes]]) and callable directly from
  * generated code (one static call per row keeps the expressions inside
  * whole-stage codegen while the loop itself stays plain JVM code).
  *
  * The key identity these exploit: `TextFns.tokens` is `split(trim(text),
  * " ")`, and `TextFns.shingles` joins n consecutive tokens with a single
  * space — so every shingle string is EXACTLY the contiguous byte range of
  * the trimmed text from the start of token i to the end of token i+n-1
  * (empty tokens from doubled spaces reproduce the doubled spaces). Hashing
  * that byte range in place therefore produces bit-identical hashes to
  * materializing the shingle strings first, with zero per-shingle
  * allocation and a single pass over the document bytes.
  */
object ShingleOps {

  private final val Seed1 = 42L // xxhash64's default seed — parity with xxhash64(shingle)
  private final val Seed2 = 77L // second K–M hash, parity with MinHashSignature

  /** Byte offsets (relative to the UTF8String payload) where each token
    * starts, over the space-trimmed range; the returned array has one extra
    * trailing slot holding `end + 1` so `starts(i + n) - 1` is the
    * exclusive end of the shingle beginning at token i. Returns null when
    * the trimmed text is empty (split("") = [""], a single empty token —
    * handled by the callers' token-count check, but an all-space input has
    * no bytes to hash at all and short-circuits here).
    */
  private def tokenStarts(text: UTF8String): Array[Int] = {
    val nb = text.numBytes
    var s = 0
    while (s < nb && text.getByte(s) == 0x20) s += 1
    var e = nb - 1
    while (e >= s && text.getByte(e) == 0x20) e -= 1
    if (e < s) return null // all spaces or empty: zero tokens of content
    var spaces = 0
    var i = s
    while (i <= e) { if (text.getByte(i) == 0x20) spaces += 1; i += 1 }
    val starts = new Array[Int](spaces + 2)
    starts(0) = s
    var t = 1
    i = s
    while (i <= e) {
      if (text.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(t) = e + 2 // sentinel: end+1 position "one past a virtual space"
    starts
  }

  /** MinHash signature of the word n-gram shingle multiset, fused from raw
    * text: for each shingle byte-range two base XXH64 hashes, then
    * Kirsch–Mitzenmacher h1 + p·h2 per permutation — bit-identical to
    * `MinHashSignature(TextFns.shingles(text, n), numPerms)` (min over the
    * multiset equals min over the distinct set) for every document with
    * actual content. Null when the text has fewer than n tokens (the
    * composed path's empty-shingle NULL).
    *
    * ONE deliberate divergence: at n = 1 on an empty/all-space document,
    * `split(trim(""), " ")` is `[""]` — one empty token — so the composed
    * path emits a signature of the empty string, making every blank doc a
    * perfect near-duplicate of every other (exactly the false-clique
    * MinHashSignature's own empty-set NULL exists to prevent). The fused
    * kernels treat no-content as no-tokens and return NULL/empty instead
    * (spec-asserted).
    */
  def minhash(text: UTF8String, n: Int, numPerms: Int): Array[Long] = {
    val starts = tokenStarts(text)
    if (starts == null) return null
    val tokens = starts.length - 1
    if (tokens < n) return null
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i <= tokens - n) {
      val b0 = starts(i)
      val len = starts(i + n) - 1 - b0
      val h1 = XXH64.hashUnsafeBytes(base, off + b0, len, Seed1)
      val h2 = XXH64.hashUnsafeBytes(base, off + b0, len, Seed2)
      var p = 0
      while (p < numPerms) {
        val h = h1 + p * h2
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    mins
  }

  /** Distinct xxhash64 values (seed 42 — the `xxhash64` SQL function) of
    * the word n-gram shingles, fused from raw text: bit-identical to
    * `xxhash64(explode(TextFns.shingles(text, n)))` collected per doc, in
    * first-occurrence order (array_distinct's order). Empty array when the
    * text has fewer than n tokens. Dedup is an open-addressed long table —
    * O(shingles), no boxing.
    */
  def distinctHashes(text: UTF8String, n: Int): Array[Long] = {
    val starts = tokenStarts(text)
    if (starts == null) return Array.emptyLongArray
    val tokens = starts.length - 1
    if (tokens < n) return Array.emptyLongArray
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val m = tokens - n + 1
    var cap = Integer.highestOneBit(math.max(4, m * 2) - 1) << 1 // next pow2 >= 2m
    if (cap < 4) cap = 4
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](m)
    var outN = 0
    val mask = cap - 1
    var i = 0
    while (i < m) {
      val b0 = starts(i)
      val len = starts(i + n) - 1 - b0
      val h = XXH64.hashUnsafeBytes(base, off + b0, len, Seed1)
      var slot = (h ^ (h >>> 32)).toInt & mask
      var dup = false
      var probing = true
      while (probing) {
        if (!used(slot)) probing = false
        else if (table(slot) == h) { dup = true; probing = false }
        else slot = (slot + 1) & mask
      }
      if (!dup) {
        used(slot) = true
        table(slot) = h
        out(outN) = h
        outN += 1
      }
      i += 1
    }
    if (outN == m) out else java.util.Arrays.copyOf(out, outN)
  }

  /** Distinct xxhash64 values (seed 42) of the CHARACTER n-grams of the
    * text — the exact-substring dedup unit (codepoint-indexed, so a gram is
    * `substr(text, i, n)` in engines that count characters, not bytes).
    * One UTF-8 walk with a ring buffer of the last n+1 codepoint byte
    * offsets; each gram is hashed as its byte range in place. Empty array
    * when the text has fewer than n codepoints.
    */
  def charGramHashes(text: UTF8String, n: Int): Array[Long] = {
    val nb = text.numBytes
    val base = text.getBaseObject
    val off = text.getBaseOffset
    // byte offsets of codepoint starts, ring of n+1 entries:
    // ring(i % (n+1)) = start of codepoint i; gram ending at codepoint i
    // spans [start(i - n + 1), start(i + 1))
    val ring = new Array[Int](n + 1)
    var cp = 0
    var b = 0
    var outN = 0
    var out: Array[Long] = null
    var table: Array[Long] = null
    var used: Array[Boolean] = null
    var mask = 0
    while (b < nb) {
      ring(cp % (n + 1)) = b
      // Spark's own first-byte table (invalid lead bytes advance 1, exactly
      // like UTF8String.numChars/substringSQL), clamped so a truncated
      // multi-byte sequence at the tail can't step past the payload — the
      // hashed range must stay inside the string even for invalid UTF-8
      // (e.g. cast(binary as string)).
      b += UTF8String.numBytesForFirstByte(text.getByte(b))
      if (b > nb) b = nb
      cp += 1
      if (cp >= n) {
        if (out == null) {
          // total codepoints unknown without a pre-pass; size for the
          // remaining-bytes upper bound (ASCII worst case)
          val maxGrams = nb - n + 1
          out = new Array[Long](math.max(maxGrams, 1))
          var c = Integer.highestOneBit(math.max(4, maxGrams * 2) - 1) << 1
          if (c < 4) c = 4
          table = new Array[Long](c)
          used = new Array[Boolean](c)
          mask = c - 1
        }
        val b0 = ring((cp - n) % (n + 1))
        val h = XXH64.hashUnsafeBytes(base, off + b0, b - b0, Seed1)
        var slot = (h ^ (h >>> 32)).toInt & mask
        var dup = false
        var probing = true
        while (probing) {
          if (!used(slot)) probing = false
          else if (table(slot) == h) { dup = true; probing = false }
          else slot = (slot + 1) & mask
        }
        if (!dup) {
          used(slot) = true
          table(slot) = h
          out(outN) = h
          outN += 1
        }
      }
    }
    if (out == null) Array.emptyLongArray
    else if (outN == out.length) out
    else java.util.Arrays.copyOf(out, outN)
  }
}
