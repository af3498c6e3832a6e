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
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter CANDIDATE summary as a typed imperative
  * aggregate: a mergeable ≤ k-entry (token, count) map per partition, so
  * finding frequent tokens never shuffles the full vocabulary — the only
  * bytes that move are k entries per partial.
  *
  * The classic guarantee survives arbitrary merge trees (Agarwal et al.,
  * "Mergeable Summaries", PODS'12): after summarizing n total tokens, every
  * token with true frequency > n/(k+1) is PRESENT in the summary (counts
  * are underestimates; the summary may also hold infrequent tokens). The
  * scalable exact-heavy-hitter pipeline is therefore two passes: this
  * aggregate proposes ≤ k candidates, a broadcast semi-join recounts ONLY
  * them exactly, and the threshold filter `cnt·(k+1) > n` (integer form of
  * cnt > n/(k+1)) makes the result EXACTLY the set the guarantee covers —
  * independent of partitioning, hence oracle-checkable
  * ([[graft.operators.Scoring.heavyHitters]]).
  *
  * eval returns the candidate tokens sorted lexicographically (the SET is
  * partitioning-dependent within the guarantee's slack; downstream exact
  * recount is what restores determinism).
  */
case class MisraGriesAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1, s"graft_misra_gries needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_misra_gries expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](k * 2)

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    // toString copies out of the (reused) unsafe row backing — a retained
    // UTF8String view would alias the next row's bytes
    val s = v.asInstanceOf[UTF8String].toString
    val cur = buf.get(s)
    if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + 1L)
    else if (buf.size < k) buf.put(s, 1L)
    else decrementAll(buf, 1L)
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
                     b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > k) {
      // reduce to <= k entries: subtract the (k+1)-th largest count from
      // everything and drop the non-positive — the merge-tree-safe MG
      // reduction (each subtraction is <= the allowed n/(k+1) slack)
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(a.size - k - 1) // (k+1)-th largest
      decrementAll(a, d)
    }
    a
  }

  private def decrementAll(m: java.util.HashMap[String, Long], d: Long): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
    }
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val toks = new Array[String](buf.size)
    buf.keySet().toArray(toks)
    java.util.Arrays.sort(toks, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(toks.map(UTF8String.fromString))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](math.max(n * 2, 4))
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}

object HeavyHitters {
  /** Column front door: `misraGries(col, k)` as an aggregate column. */
  def misraGries(tokens: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(tokens), k).toAggregateExpression())
}
