package graft.plans

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, J.Algorithms'05) as a typed
  * imperative aggregate: a `depth × width` grid of counters where row `r`
  * increments cell `h_r(token)`. Point estimate = min over rows — always an
  * OVERestimate (counters only add), with the classic bound
  * `err ≤ e/width · n` at probability `1 - e^-depth` per query.
  *
  * The complement to [[MisraGriesAgg]]: MG yields a candidate SET with
  * underestimates, CMS yields per-item count estimates (overestimates) for
  * ANY probe token, including ones never stored. Both are mergeable
  * summaries (Agarwal et al., PODS'12) — CMS trivially so, since partials
  * combine by elementwise addition, which is order- and
  * partitioning-independent. That makes the whole sketch DETERMINISTIC for
  * a given multiset of tokens: at 100 TB each map task ships exactly
  * `depth·width` longs (32 KiB at 4×1024) regardless of input size, and the
  * final grid is bit-identical to a single-threaded build.
  *
  * The row hash is deliberately engine-portable (the q96/q31
  * reproduce-the-hash-in-SQL precedent): row `r`'s bucket is the `r`-th
  * 32-bit slice of ONE `md5(token)` digest, mod `width` (see
  * [[CountMin.md5Bucket]] for the exact Spark-SQL/DuckDB twins). Every
  * cell of the sketch, and hence every estimate, is directly checkable by
  * a flat SQL oracle (no sampling, no twin) — and the digest is computed
  * once per token, not once per row.
  *
  * eval returns the grid row-major as `array<long>` (cell `(r, b)` at index
  * `r·width + b`), so probing stays in codegen'd Catalyst:
  * `least(element_at(grid, r·width + h_r(tok) + 1) …)`.
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 4,
    s"graft_count_min needs 1 <= depth <= 4 (one 16-byte md5 digest = four " +
      s"32-bit row slices; error prob e^-4 per probe is the standard CMS " +
      s"operating point), got $depth")
  require(width >= 2 && width <= (1 << 20),
    s"graft_count_min needs 2 <= width <= 2^20, got $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_count_min expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  // one provider lookup per task, not per row (update runs once per token
  // instance — 26M times at sf10); digest() resets the instance after use
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    // ONE digest per token, 4 bytes per row (measured 4x cheaper than a
    // salted digest per row at sf10's 26M shingle instances)
    val d = md.digest(v.asInstanceOf[UTF8String].getBytes)
    var r = 0
    while (r < depth) {
      buf(r * width + CountMin.sliceBucket(d, r, width)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
}

object CountMin {
  /** Row-`r` bucket of `token`: bytes `4r..4r+3` of ONE `md5(token)` digest
    * (= hex chars `8r+1..8r+8`), mod `width` — in Spark SQL
    * `conv(substring(md5(tok), 1 + 8·r, 8), 16, 10) % width`, in DuckDB
    * `CAST(concat('0x', substr(md5(tok), 1 + 8*r, 8)) AS BIGINT) % width`.
    * One digest serves all four rows (the digest is the per-token cost that
    * dominates the sketch build at corpus scale); the four 32-bit slices of
    * an md5 are independent for CMS purposes. CountMinSpec pins the
    * Java/Catalyst agreement; the driver oracle pins DuckDB.
    */
  def md5Bucket(token: String, row: Int, width: Int): Int =
    sliceBucket(MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8")), row, width)

  private[plans] def sliceBucket(digest: Array[Byte], row: Int, width: Int): Int = {
    val o = row * 4
    val h = ((digest(o) & 0xFFL) << 24) | ((digest(o + 1) & 0xFFL) << 16) |
      ((digest(o + 2) & 0xFFL) << 8) | (digest(o + 3) & 0xFFL)
    (h % width).toInt
  }

  /** Aggregate column front door: one `array<long>` grid per group. */
  def countMin(tokens: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(tokens), depth, width)
        .toAggregateExpression())
}
