package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Buffer for [[DfCappedPairsAgg]]: the EXACT row count (the df) plus the
  * (id, size) entries, stored only while fewer than `cap` have arrived —
  * a bucket whose df exceeds the cap is dead on arrival, so its entries
  * stop being kept the moment that is locally provable. Entry storage is
  * therefore bounded at `cap` per buffer at every stage of the aggregate
  * (map partial, shuffle, merge), whatever the true df of a hot shingle.
  */
final class DfCappedBuf(var cnt: Long, var ids: Array[Long], var ns: Array[Long],
                        var len: Int)

/** One-pass df-capped pair generation for the shingle-blocking dedup
  * family (r15, the q52/q108 shuffle trim — guide §1.2 "the distributed
  * algorithm" / §2.4 "remove shuffles outright").
  *
  * The r14 shape ran THREE jobs over the inverted index to produce
  * candidate pairs: a df count per shingle (shuffle 1), a join of the full
  * index back to the surviving shingles (shuffle 2), and a
  * `sort_array(collect_list)` + pair expansion over the joined result
  * (reusing shuffle 2's partitioning). The df count exists only to keep
  * `collect_list` away from hot shingles — an UNBOUNDED list over a
  * boilerplate shingle in 10⁶ docs is an OOM. This aggregate fuses the
  * cap INTO the collection, which removes the separate df pass and the
  * join outright:
  *
  *  - the buffer counts every row exactly (`cnt` — the df), but stores at
  *    most `maxDf + 1` (id, size) entries; once a buffer holds `maxDf + 1`
  *    entries its bucket is PROVABLY over the cap (df >= len > maxDf) and
  *    later entries are dropped unstored — bounded memory at every stage,
  *    the same guarantee the old count-then-join shape had;
  *  - eval returns NULL when df > maxDf (the bucket the old `rare` filter
  *    dropped) or fewer than 2 ids were stored (the old `size(ds) > 1`),
  *    else the SORTED id list's ordered pair expansion — exactly
  *    `explode(pairCombos(sort_array(collect_list(...))))` per bucket.
  *
  * EQUALITY with the old shape (spec-asserted): when df <= maxDf, NO
  * buffer ever saturates (each partial's stored count <= its row count <=
  * df <= maxDf < maxDf + 1), so the merged entry set is complete and the
  * emitted pairs are identical to the old collect-after-join's; when df >
  * maxDf the bucket emits nothing, exactly like the old `df <= maxDocFreq`
  * filter. Like `count(lit(1))`, `cnt` counts EVERY row; like
  * `collect_list`, entries with a NULL id are counted but not stored.
  *
  * Each entry carries the doc's FULL shingle-set size alongside its id, so
  * the emitted pair rows (doc_a, na, doc_b, nb) already hold the jaccard /
  * containment denominators — the downstream per-pair size joins of the
  * r14 shape are gone too (§8's rule: attach the tiny metadata to the
  * proxy rows instead of re-joining it after the decision).
  */
case class DfCappedPairsAgg(child: Expression, maxDf: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DfCappedBuf]
    with UnaryLike[Expression] {

  require(maxDf >= 1 && maxDf <= DfCappedPairsAgg.MaxSupportedDf,
    s"graft_df_capped_pairs needs 1 <= maxDf <= ${DfCappedPairsAgg.MaxSupportedDf}, " +
      s"got $maxDf — an (effectively) uncapped pair generation must use the " +
      "streaming self-join shape, which never materializes a bucket")

  private val cap = maxDf + 1

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 2 && s(0).dataType == LongType &&
        s(1).dataType == LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_df_capped_pairs expects struct<id:bigint,n:bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("na", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("nb", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_df_capped_pairs"

  override def createAggregationBuffer(): DfCappedBuf =
    new DfCappedBuf(0L, new Array[Long](8), new Array[Long](8), 0)

  private def store(buf: DfCappedBuf, id: Long, n: Long): Unit = {
    if (buf.len >= cap) return
    if (buf.len == buf.ids.length) {
      val next = math.min(cap, math.max(buf.ids.length * 2, 8))
      buf.ids = java.util.Arrays.copyOf(buf.ids, next)
      buf.ns = java.util.Arrays.copyOf(buf.ns, next)
    }
    buf.ids(buf.len) = id
    buf.ns(buf.len) = n
    buf.len += 1
  }

  override def update(buf: DfCappedBuf, input: InternalRow): DfCappedBuf = {
    val v = child.eval(input)
    if (v == null) return buf // struct itself null: not a row of the bucket
    buf.cnt += 1L
    val row = v.asInstanceOf[InternalRow]
    if (!row.isNullAt(0) && !row.isNullAt(1))
      store(buf, row.getLong(0), row.getLong(1))
    buf
  }

  override def merge(a: DfCappedBuf, b: DfCappedBuf): DfCappedBuf = {
    a.cnt += b.cnt
    var i = 0
    while (i < b.len && a.len < cap) { store(a, b.ids(i), b.ns(i)); i += 1 }
    a
  }

  override def eval(buf: DfCappedBuf): Any = {
    if (buf.cnt > maxDf || buf.len < 2) return null
    // sort entries by id (ids are per-bucket unique — the index is per-doc
    // distinct — but the sort is total regardless): same order as
    // sort_array(collect_list(id))
    val idx = Array.range(0, buf.len)
    val sorted = idx.sortBy(buf.ids(_))
    val nPairs = buf.len * (buf.len - 1) / 2
    val out = new Array[Any](nPairs)
    var k = 0
    var i = 0
    while (i < buf.len) {
      val ii = sorted(i)
      var j = i + 1
      while (j < buf.len) {
        val jj = sorted(j)
        out(k) = InternalRow(buf.ids(ii), buf.ns(ii), buf.ids(jj), buf.ns(jj))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: DfCappedBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + 16 * buf.len)
    val out = new DataOutputStream(bos)
    out.writeLong(buf.cnt)
    out.writeInt(buf.len)
    var i = 0
    while (i < buf.len) { out.writeLong(buf.ids(i)); out.writeLong(buf.ns(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DfCappedBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val cnt = in.readLong()
    val len = in.readInt()
    val ids = new Array[Long](math.max(len, 8))
    val ns = new Array[Long](math.max(len, 8))
    var i = 0
    while (i < len) { ids(i) = in.readLong(); ns(i) = in.readLong(); i += 1 }
    new DfCappedBuf(cnt, ids, ns, len)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DfCappedPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DfCappedPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): DfCappedPairsAgg =
    copy(child = c)
}

object DfCappedPairsAgg {
  /** Largest cap the one-pass aggregate accepts: cap² pair structs per
    * bucket must stay a sane in-memory array (4096² / 2 ≈ 8.4M structs is
    * already generous); beyond it callers keep the streaming join.
    */
  val MaxSupportedDf = 4096

  /** Column front door: the child must be `struct(id, n)` with both longs. */
  def dfCappedPairs(idAndSize: Column, maxDf: Int): Column =
    ColumnBridge.column(
      DfCappedPairsAgg(ColumnBridge.expression(idAndSize), maxDf)
        .toAggregateExpression())
}
