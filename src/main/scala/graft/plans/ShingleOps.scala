package graft.plans

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
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
    // `m * 2` must not overflow Int (the charBigramCounts guard): a
    // wrapped-negative size would either throw NegativeArraySize or build
    // a 4-slot table whose probe loop can never terminate
    require(m <= (1 << 29),
      s"distinctHashes supports < ${1 << 29} shingles per document, got $m")
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
          // overflow guard (the charBigramCounts contract): a wrapped
          // `maxGrams * 2` would build a too-small table and probe forever
          require(maxGrams <= (1 << 29),
            s"charGramHashes supports documents < 512 MiB, got $nb bytes")
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

  /** POSITION-ORDERED char n-gram hashes: element i of the result is the
    * xxhash64 (seed 42, identical to [[charGramHashes]]) of the gram
    * starting at codepoint i — NO dedup, one entry per gram instance, so
    * `posexplode` over the array recovers (start-codepoint, gram-hash)
    * pairs directly. The position-aware twin [[charGramHashes]] cannot be:
    * its open-addressed dedup drops repeat instances, and duplicated-span
    * COVERAGE (merge the [i, i+n) intervals of duplicated grams, measure
    * the merged length) needs every instance's offset. Same walk, same
    * lead-byte table and tail clamp, same hash — a gram hash from this
    * array joins against [[charGramHashes]] output bit-for-bit. Empty
    * array when the text has fewer than n codepoints.
    */
  def charGramHashSeq(text: UTF8String, n: Int): Array[Long] = {
    val nb = text.numBytes
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val ring = new Array[Int](n + 1)
    var cp = 0
    var b = 0
    var outN = 0
    var out: Array[Long] = null
    while (b < nb) {
      ring(cp % (n + 1)) = b
      b += UTF8String.numBytesForFirstByte(text.getByte(b))
      if (b > nb) b = nb
      cp += 1
      if (cp >= n) {
        if (out == null) {
          val maxGrams = nb - n + 1
          require(maxGrams <= (1 << 29),
            s"charGramHashSeq supports documents < 512 MiB, got $nb bytes")
          out = new Array[Long](math.max(maxGrams, 1))
        }
        val b0 = ring((cp - n) % (n + 1))
        out(outN) = XXH64.hashUnsafeBytes(base, off + b0, b - b0, Seed1)
        outN += 1
      }
    }
    if (out == null) Array.emptyLongArray
    else if (outN == out.length) out
    else java.util.Arrays.copyOf(out, outN)
  }

  /** Unicode-script class of a codepoint under graft's FIXED, engine-portable
    * range table (documented in SURVEY §2b q100): 0 latin (ASCII letters +
    * Latin-1/Extended letters, excluding × ÷), 1 cyrillic, 2 greek,
    * 3 arabic, 4 hebrew, 5 cjk (unified ideographs + kana), 6 hangul,
    * 7 digit, 8 space (the portable [ \t\n\r\f] class — Java \s and RE2 \s
    * disagree on \x0B); −1 = none (counted as "other" by subtraction).
    * Deliberately NOT Character.getType/UnicodeScript: those tables move
    * with the JDK Unicode version, and a script verdict must be
    * bit-reproducible across engines and upgrades.
    */
  private def scriptClass(cp: Int): Int = {
    if (cp < 0x80) {
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) 0
      else if (cp >= '0' && cp <= '9') 7
      else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == '\f') 8
      else -1
    }
    else if (cp >= 0x00C0 && cp <= 0x024F) {
      if (cp == 0x00D7 || cp == 0x00F7) -1 else 0
    }
    else if (cp >= 0x0370 && cp <= 0x03FF) 2
    else if (cp >= 0x0400 && cp <= 0x04FF) 1
    else if (cp >= 0x0590 && cp <= 0x05FF) 4
    else if (cp >= 0x0600 && cp <= 0x06FF) 3
    else if (cp >= 0x3040 && cp <= 0x30FF) 5
    else if (cp >= 0x4E00 && cp <= 0x9FFF) 5
    else if (cp >= 0xAC00 && cp <= 0xD7A3) 6
    else -1
  }

  /** Per-script codepoint counts in ONE UTF-8 walk: a 9-long array in
    * [[scriptClass]] order. The walk uses the same lead-byte table and tail
    * clamp as every other kernel here, so the number of STEPS equals
    * `length(text)` (Spark's numChars) exactly — "other" is recoverable as
    * `length(text) − sum(counts)` with no second pass. Codepoints are
    * decoded inline (standard UTF-8 bit assembly); an invalid lead byte or
    * a truncated tail sequence decodes to no class and lands in "other",
    * mirroring what a regex engine does with replacement-decoded garbage.
    */
  def scriptCounts(text: UTF8String): Array[Long] = {
    val nb = text.numBytes
    val out = new Array[Long](9)
    // continuation byte = 10xxxxxx; a malformed sequence (bad continuation,
    // overlong 2/3/4-byte form, lead > 0xF4) must decode to NO class — a
    // raw 0xD0 'A' pair (reachable via cast(binary as string)) would
    // otherwise assemble a spurious U+0401 and count as cyrillic, and an
    // E0-overlong like 0xE0 0x90 0x80 would fabricate U+0400 (both caught
    // by review r11 passes). Surrogate forms (0xED 0xA0-0xBF ..) decode to
    // 0xD800-0xDFFF, which no class covers, so they land in "other"
    // without an explicit check.
    def cont(i: Int): Boolean = (text.getByte(i) & 0xC0) == 0x80
    var b = 0
    while (b < nb) {
      val lead = text.getByte(b)
      val b0 = lead & 0xFF
      val len = UTF8String.numBytesForFirstByte(lead)
      var cp = -1
      if (b0 < 0x80) cp = b0
      else if (len == 2 && b + 1 < nb && b0 >= 0xC2 && cont(b + 1))
        cp = ((b0 & 0x1F) << 6) | (text.getByte(b + 1) & 0x3F)
      else if (len == 3 && b + 2 < nb && cont(b + 1) && cont(b + 2) &&
          !(b0 == 0xE0 && (text.getByte(b + 1) & 0xFF) < 0xA0))
        cp = ((b0 & 0x0F) << 12) | ((text.getByte(b + 1) & 0x3F) << 6) |
          (text.getByte(b + 2) & 0x3F)
      else if (len == 4 && b + 3 < nb && b0 <= 0xF4 &&
          cont(b + 1) && cont(b + 2) && cont(b + 3) &&
          !(b0 == 0xF0 && (text.getByte(b + 1) & 0xFF) < 0x90))
        cp = ((b0 & 0x07) << 18) | ((text.getByte(b + 1) & 0x3F) << 12) |
          ((text.getByte(b + 2) & 0x3F) << 6) | (text.getByte(b + 3) & 0x3F)
      if (cp >= 0) {
        val cls = scriptClass(cp)
        if (cls >= 0) out(cls) += 1
      }
      b += len
      if (b > nb) b = nb
    }
    out
  }

  /** Fused char-bigram LM scoring: one UTF-8 walk over the document,
    * hashing each adjacent-codepoint bigram's byte range in place and
    * looking it up in the SORTED model-key array (binary search; the model
    * is ≤ |charset|² entries). Returns {matched-bigram count, permille
    * sum} — the two integers `Scoring.scoreCharBigramLm`'s
    * explode + broadcast-join + groupBy pipeline aggregates, without the
    * per-position row amplification (~|text| rows per document).
    *
    * Parity: position i's bigram is `substr(text, i, 2)` under
    * codepoint-counting engines — the byte range [start(i), start(i+2))
    * from the same lead-byte table `UTF8String.substringSQL` walks, with
    * the same tail clamp as [[charGramHashes]]; model keys are XXH64 over
    * the bigram strings' own bytes (seed 42), so kernel-side range hashes
    * and driver-side string hashes coincide exactly. Unmatched bigrams
    * count nothing (the inner-join semantics). The hash-keyed lookup
    * carries the dedup family's documented 2⁻⁶⁴ collision class.
    */
  /** [[charBigramCounts]] packed as Catalyst array-of-struct data — ONE
    * static call per row from generated code (the [[CharBigramCounts]]
    * expression's eval).
    */
  def charBigramCountsData(
      text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val (bgs, cnts) = charBigramCounts(text)
    val rows = new Array[Any](bgs.length)
    var i = 0
    while (i < bgs.length) {
      rows(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bgs(i), cnts(i)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** Fused hashed-linear document scoring: one pass over the trimmed text,
    * computing each whitespace token's rolling fingerprint (the EXACT
    * [[RollingFingerprint]] walk — *31 mod 1e9+7 over codepoints, with its
    * own lead-byte decode — so `fingerprint(token) % numBuckets` parity is
    * bit-for-bit) and folding the dense per-bucket weight table riding in
    * `weights` (−1 = bucket absent from the model, the inner-join
    * semantics: such tokens count nothing). Split semantics match
    * `split(trim(text), " ")` exactly, INCLUDING empty tokens from doubled
    * spaces and the single empty token of an all-space document (both hash
    * to bucket 0, as the composed path does). Returns {matched-token
    * count, weight sum}.
    */
  def hashedLinearScore(text: UTF8String, weights: Array[Int]): Array[Long] = {
    val nb = text.numBytes
    val numBuckets = weights.length
    // trim: the token walk covers [s, e], both ends non-space
    var s = 0
    while (s < nb && text.getByte(s) == 0x20) s += 1
    var e = nb - 1
    while (e >= s && text.getByte(e) == 0x20) e -= 1
    var n = 0L
    var sum = 0L
    def scoreToken(from: Int, until: Int): Unit = {
      // RollingFingerprint's own decode (invalid lead bytes take the
      // 4-byte branch); continuation reads clamp at the TOKEN end — the
      // composed path fingerprints each token string in isolation, so the
      // clamp boundary is the next space, exactly `until`
      var j = from
      var acc = 0L
      while (j < until) {
        val lead = text.getByte(j) & 0xFF
        var cp = 0
        var len = 1
        if (lead < 0x80) cp = lead
        else if ((lead & 0xE0) == 0xC0) { len = 2; cp = lead & 0x1F }
        else if ((lead & 0xF0) == 0xE0) { len = 3; cp = lead & 0x0F }
        else { len = 4; cp = lead & 0x07 }
        var k = 1
        while (k < len && j + k < until) {
          cp = (cp << 6) | (text.getByte(j + k) & 0x3F)
          k += 1
        }
        acc = (acc * 31 + cp) % 1000000007L
        j += len
      }
      val w = weights((acc % numBuckets).toInt)
      if (w >= 0) { n += 1L; sum += w }
    }
    if (e < s) scoreToken(0, 0) // split("") = [""]: ONE empty token
    else {
      // tokens = segments between spaces over [s, e]; adjacent spaces
      // yield EMPTY segments, exactly split(trim(text), " ")
      var tokStart = s
      var i = s
      while (i <= e + 1) {
        if (i == e + 1 || text.getByte(i) == 0x20) {
          scoreToken(tokStart, i)
          tokStart = i + 1
        }
        i += 1
      }
    }
    Array(n, sum)
  }

  /** Driver-side twin of [[charLmScore]]'s in-place range hash: the key a
    * model bigram STRING contributes — same bytes, same seed, so string
    * hashes and kernel range hashes coincide exactly.
    */
  def modelKey(bg: UTF8String): Long =
    XXH64.hashUnsafeBytes(bg.getBaseObject, bg.getBaseOffset, bg.numBytes, Seed1)

  /** Per-document adjacent-codepoint bigram COUNTS in one UTF-8 walk:
    * parallel arrays (bigram strings in first-occurrence order, counts).
    * The char-LM training unit — the composed pipeline explodes one row
    * per character position (~|text| rows) before its group-by; this
    * emits one row per DISTINCT bigram per document with the multiplicity
    * already folded, so the Generate fan-out drops to the per-doc bigram
    * vocabulary and no per-position substring is ever allocated.
    *
    * Within-document counting is EXACT (open addressing on the range
    * hash, byte-compare on hash hit — a 2⁻⁶⁴ collision cannot merge two
    * distinct bigrams); the emitted strings are byte copies of the ranges
    * `substr(text, i, 2)` would produce, so corpus-wide grouping on them
    * is bit-identical to the composed formulation.
    */
  def charBigramCounts(text: UTF8String): (Array[UTF8String], Array[Long]) = {
    val nb = text.numBytes
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var b = 0
    var cp = 0
    var prevStart = 0
    // open-addressed (hash → slot) with range+count payloads; sized for
    // the remaining-bytes upper bound on distinct bigrams (ASCII worst)
    var cap = 0
    var mask = 0
    var used: Array[Boolean] = null
    var hashes: Array[Long] = null
    var starts: Array[Int] = null
    var ends: Array[Int] = null
    var counts: Array[Long] = null
    var order: Array[Int] = null
    var distinct = 0
    while (b < nb) {
      val start = b
      b += UTF8String.numBytesForFirstByte(text.getByte(b))
      if (b > nb) b = nb
      if (cp >= 1) {
        if (used == null) {
          val maxBigrams = nb - 1 // byte upper bound on positions
          // `maxBigrams * 2` must not overflow Int (a ≥ 1 GiB single
          // document): fail with a clear contract instead of wrapping
          // negative and probing a too-small table forever
          require(maxBigrams <= (1 << 29),
            s"charBigramCounts supports documents < 512 MiB, got $nb bytes")
          var c = Integer.highestOneBit(math.max(4, maxBigrams * 2) - 1) << 1
          if (c < 4) c = 4
          cap = c; mask = c - 1
          used = new Array[Boolean](cap)
          hashes = new Array[Long](cap)
          starts = new Array[Int](cap)
          ends = new Array[Int](cap)
          counts = new Array[Long](cap)
          order = new Array[Int](maxBigrams)
        }
        val h = XXH64.hashUnsafeBytes(base, off + prevStart, b - prevStart, Seed1)
        var slot = (h ^ (h >>> 32)).toInt & mask
        var probing = true
        while (probing) {
          if (!used(slot)) {
            used(slot) = true; hashes(slot) = h
            starts(slot) = prevStart; ends(slot) = b; counts(slot) = 1L
            order(distinct) = slot; distinct += 1
            probing = false
          } else if (hashes(slot) == h &&
              ends(slot) - starts(slot) == b - prevStart && {
                // byte-compare on hash hit: within-doc counting stays
                // exact even under a 2^-64 range-hash collision
                var i = 0
                val len = b - prevStart
                var same = true
                while (same && i < len) {
                  if (text.getByte(starts(slot) + i) != text.getByte(prevStart + i))
                    same = false
                  i += 1
                }
                same
              }) {
            counts(slot) += 1L
            probing = false
          } else slot = (slot + 1) & mask
        }
      }
      prevStart = start
      cp += 1
    }
    if (distinct == 0) (Array.empty[UTF8String], Array.emptyLongArray)
    else {
      val bgs = new Array[UTF8String](distinct)
      val cnts = new Array[Long](distinct)
      var i = 0
      while (i < distinct) {
        val slot = order(i)
        val len = ends(slot) - starts(slot)
        val bytes = new Array[Byte](len)
        org.apache.spark.unsafe.Platform.copyMemory(base,
          off + starts(slot), bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)
        bgs(i) = UTF8String.fromBytes(bytes)
        cnts(i) = counts(slot)
        i += 1
      }
      (bgs, cnts)
    }
  }

  /** Fused blocklist scan (the C4-style bad-word filter's hot loop): ONE
    * walk over the text with `split(trim(text), " ")` token semantics —
    * empty tokens from doubled spaces and the single empty token of an
    * all-space document are COUNTED (matching `len(string_split(...))`)
    * though never matched, since a blocklist holds no empty word. Each
    * token's byte range is hashed in place (XXH64 seed 42, the [[modelKey]]
    * identity) and membership is CONFIRMED by byte comparison against the
    * parallel word array (equal-hash runs scanned to their left edge), so
    * the result is exact — a 2⁻⁶⁴ hash collision can neither fabricate nor
    * merge a match. Returns [n_tokens, n_hits, n_terms]: total tokens,
    * blocked-token occurrences, distinct blocked terms matched.
    */
  def blocklistHits(text: UTF8String, sortedHashes: Array[Long],
                    words: Array[UTF8String]): Array[Long] = {
    val nb = text.numBytes
    var s = 0
    while (s < nb && text.getByte(s) == 0x20) s += 1
    var e = nb - 1
    while (e >= s && text.getByte(e) == 0x20) e -= 1
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var nTokens = 0L
    var nHits = 0L
    var nTerms = 0L
    var matched: Array[Boolean] = null
    def scanToken(from: Int, until: Int): Unit = {
      nTokens += 1L
      val len = until - from
      val h = XXH64.hashUnsafeBytes(base, off + from, len, Seed1)
      var idx = java.util.Arrays.binarySearch(sortedHashes, h)
      if (idx < 0) return
      while (idx > 0 && sortedHashes(idx - 1) == h) idx -= 1
      var i = idx
      while (i < sortedHashes.length && sortedHashes(i) == h) {
        val w = words(i)
        if (w.numBytes == len && org.apache.spark.unsafe.array.ByteArrayMethods
              .arrayEquals(base, off + from, w.getBaseObject, w.getBaseOffset, len)) {
          nHits += 1L
          if (matched == null) matched = new Array[Boolean](words.length)
          if (!matched(i)) { matched(i) = true; nTerms += 1L }
          return
        }
        i += 1
      }
    }
    if (e < s) scanToken(0, 0) // split("") = [""]: ONE empty token, counted
    else {
      var tokStart = s
      var i = s
      while (i <= e + 1) {
        if (i == e + 1 || text.getByte(i) == 0x20) {
          scanToken(tokStart, i)
          tokStart = i + 1
        }
        i += 1
      }
    }
    Array(nTokens, nHits, nTerms)
  }

  /** Decode a UTF8String to its codepoint array in one walk — the
    * random-access view the banded DP needs (UTF-8 has no O(1) char
    * access; Spark's own levenshtein re-seeks the byte stream per DP cell,
    * which is what makes it ~milliseconds per ~300-char pair). The walk
    * ADVANCES by `UTF8String.numBytesForFirstByte` — Spark's own lead-byte
    * classification — so the codepoint COUNT always equals `length()` /
    * `numChars()`: the char-length prefilter upstream of the DP and the
    * kernel itself then agree on the edit unit even for invalid UTF-8
    * (an independent classification would let the prefilter prune pairs
    * the kernel could confirm). Continuation reads clamp at the payload
    * end; on valid UTF-8 the decode is the standard one.
    */
  def codepoints(s: UTF8String): Array[Int] = {
    val nb = s.numBytes
    val out = new Array[Int](nb) // byte count bounds the codepoint count
    var b = 0
    var i = 0
    while (b < nb) {
      val lead = s.getByte(b) & 0xFF
      var len = UTF8String.numBytesForFirstByte(s.getByte(b))
      if (b + len > nb) len = nb - b // truncated tail: clamp
      var cp =
        if (lead < 0x80) lead
        else if ((lead & 0xE0) == 0xC0) lead & 0x1F
        else if ((lead & 0xF0) == 0xE0) lead & 0x0F
        else lead & 0x07
      var k = 1
      while (k < len) {
        cp = (cp << 6) | (s.getByte(b + k) & 0x3F)
        k += 1
      }
      out(i) = cp
      i += 1
      b += len
    }
    if (i == out.length) out else java.util.Arrays.copyOf(out, i)
  }

  /** Banded threshold Levenshtein over pre-decoded codepoint arrays:
    * O(min(len)·maxDist) cells, each O(1) — vs Spark's built-in, which
    * seeks the UTF-8 byte stream per cell comparison (quadratic in
    * practice; measured ~100× slower on ~300-char docs at maxDist 12,
    * SURVEY §5). Returns the edit distance, or -1 when it exceeds
    * `maxDist` — the same contract as `levenshtein(l, r, threshold)`, and
    * the same codepoint edit unit, so results are identical on valid
    * UTF-8 (property-spec'd against the builtin).
    */
  def editDistance(a: UTF8String, b: UTF8String, maxDist: Int): Int = {
    if (maxDist < 0) return -1
    val ca = codepoints(a)
    val cb = codepoints(b)
    val n = ca.length
    val m = cb.length
    if (n == 0) return if (m <= maxDist) m else -1
    if (m == 0) return if (n <= maxDist) n else -1
    if (math.abs(n - m) > maxDist) return -1
    val inf = maxDist + 1
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = if (j <= maxDist) j else inf; j += 1 }
    var i = 1
    while (i <= m) {
      val from = math.max(1, i - maxDist)
      val to = math.min(n, i + maxDist)
      cur(0) = if (i <= maxDist) i else inf
      if (from > 1) cur(from - 1) = inf // left band edge: unreachable
      var rowMin = inf
      j = from
      while (j <= to) {
        val cost = if (ca(j - 1) == cb(i - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf // clamp: sentinels must not creep upward
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (to < n) cur(to + 1) = inf // right band edge for the next row
      if (rowMin >= inf) return -1 // whole band over budget: early abort
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(n) > maxDist) -1 else prev(n)
  }

  def charLmScore(text: UTF8String, sortedKeys: Array[Long],
                  permille: Array[Int]): Array[Long] = {
    val nb = text.numBytes
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var b = 0
    var cp = 0
    var prevStart = 0 // byte start of codepoint cp-1 (valid once cp >= 1)
    var n = 0L
    var sum = 0L
    while (b < nb) {
      val start = b
      b += UTF8String.numBytesForFirstByte(text.getByte(b))
      if (b > nb) b = nb // truncated tail sequence: clamp, like charGramHashes
      if (cp >= 1) {
        val h = XXH64.hashUnsafeBytes(base, off + prevStart, b - prevStart, Seed1)
        val idx = java.util.Arrays.binarySearch(sortedKeys, h)
        if (idx >= 0) { n += 1L; sum += permille(idx) }
      }
      prevStart = start
      cp += 1
    }
    Array(n, sum)
  }

  /** Duplicated-span coverage in ONE per-document pass (r12, the q98 sf10
    * fix): merged codepoint length of the [pos, pos+n) intervals of every
    * gram instance whose hash is in `shared` (membership via an
    * open-addressed probe). Replaces the corpus-by-positions
    * posexplode -> shuffle-on-hash -> per-doc window pipeline with a
    * map-side fold over [[charGramHashSeq]]'s instance array: positions
    * arrive ascending by construction, so the interval merge is the
    * running-max-end recurrence the old window computed - bit-identical
    * (`contrib = max(0, pos+n - max(prev_end, pos))`, prev_end over
    * PRIOR shared instances only), oracle-asserted.
    */
  def coveredSpanLength(text: UTF8String, shared: ArrayData, n: Int): Long = {
    val s = shared.numElements()
    if (s == 0) return 0L
    val seq = charGramHashSeq(text, n)
    if (seq.isEmpty) return 0L
    // open-addressed membership set, 0 as the empty sentinel (a real 0
    // hash - possible, if astronomically rare, from xxhash64 - is
    // tracked by a flag)
    var cap = 4
    while (cap < s * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var hasZero = false
    var i = 0
    while (i < s) {
      val v = shared.getLong(i)
      if (v == 0L) hasZero = true
      else {
        var j = java.lang.Long.hashCode(v * -7046029254386353131L) & mask
        while (table(j) != 0L && table(j) != v) j = (j + 1) & mask
        table(j) = v
      }
      i += 1
    }
    var prevEnd = 0L
    var tot = 0L
    var pos = 0
    while (pos < seq.length) {
      val v = seq(pos)
      val hit =
        if (v == 0L) hasZero
        else {
          var j = java.lang.Long.hashCode(v * -7046029254386353131L) & mask
          while (table(j) != 0L && table(j) != v) j = (j + 1) & mask
          table(j) == v
        }
      if (hit) {
        val end = pos.toLong + n
        val start = math.max(prevEnd, pos.toLong)
        if (end > start) tot += end - start
        if (end > prevEnd) prevEnd = end
      }
      pos += 1
    }
    tot
  }
}
