package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash and SimHash signatures for near-dup detection (SURVEY §2b).
  * Built on `xxhash64` (codegen'd) with per-permutation seeds — the classic
  * "k hash functions" construction without any UDF.
  */
object HashFns {

  // NOTE: a composed `minhashSignature` twin used to live here, but its
  // hash derivation (per-perm xxhash64 seeds) could never reproduce the
  // native MinHashSignature's Kirsch–Mitzenmacher signatures — joining the
  // two silently finds zero duplicates. The native expression
  // (NativeFns.minhashSig) is the only signature producer; removed rather
  // than kept as a misleading "reference impl" (same call as VecFns' LSH).

  /** LSH band keys: split the signature into bands of `rowsPerBand` and hash
    * each band. Docs sharing any band key are candidate pairs.
    */
  def bandKeys(signature: Column, numPerms: Int, rowsPerBand: Int): Column = {
    require(numPerms % rowsPerBand == 0,
      s"numPerms ($numPerms) must be divisible by rowsPerBand ($rowsPerBand) — " +
        "trailing permutations would be silently ignored")
    val bands = numPerms / rowsPerBand
    // xxhash64 directly over the sliced array<long> — Spark's hash
    // expressions fold arrays element-wise with seed chaining, fully
    // codegen'd. The previous formulation stringified every signature slot
    // (`transform` + cast + concat_ws), which both allocated per band and
    // dropped the whole projection out of whole-stage codegen (`transform`
    // is an interpreted higher-order function).
    val keys = array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(slice(signature, b * rowsPerBand + 1, rowsPerBand)).as("key"))
    }: _*)
    // a signature shorter than numPerms would slice EMPTY arrays past its
    // end: every row then shares those bands' constant keys and the LSH
    // candidate join degenerates quadratic with no error — fail loudly
    // (assert_true is NULL on success, so the `when` passes keys through).
    // NULL signatures (null text, docs with fewer than shingleN tokens —
    // ShingleMinHash returns NULL for both) must pass through as NULL, not
    // trip the assert: size(NULL) is -1 under legacy sizeOfNull and callers
    // (lshBandIndex, fuzzyDedupStream) filter nulls AFTER this projection.
    when(signature.isNull, lit(null).cast("array<struct<band:int,key:bigint>>"))
      .otherwise(
        when(assert_true(size(signature) === numPerms,
          lit(s"bandKeys: signature length must equal numPerms=$numPerms")).isNull,
          keys))
  }

  /** Fraction of equal signature positions — unbiased Jaccard estimate. */
  def signatureAgreement(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1.0).otherwise(0.0)),
      lit(0.0), (acc, v) => acc + v) / size(sigA).cast("double")

  /** 64-bit SimHash over the token multiset: bit i is the sign of
    * sum over tokens of (bit i of xxhash64(token) ? +1 : -1).
    */
  def simhash64(tokensArr: Column): Column = {
    val counters = aggregate(
      tokensArr,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        val deltas = array((0 until 64).map(i =>
          shiftrightunsigned(h, i).bitwiseAND(1L) * 2L - 1L): _*)
        zip_with(acc, deltas, (c, d) => c + d)
      })
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(counters, powers, (c, p) => when(c > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }

  /** 16-bit band of a 64-bit simhash (blocking key for hamming search:
    * hamming ≤ 3 bands' worth of difference ⇒ at least one identical band).
    */
  def simhashBand(sim: Column, band: Int): Column = simhashBand(sim, band, 16)

  /** `width`-bit band of a 64-bit simhash. width = 64 (one band) makes the
    * blocking key the WHOLE signature — candidates iff simhashes are equal,
    * the provably-exact configuration the driver-checked twin runs.
    */
  def simhashBand(sim: Column, band: Int, width: Int): Column = {
    val shifted = shiftrightunsigned(sim, band * width)
    if (width == 64) shifted else shifted.bitwiseAND((1L << width) - 1L)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")
}
