package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded multiset of (score, id) pairs: k smallest with MULTIPLICITY.
  * A plain TreeSet would silently collapse duplicate (score, id) rows —
  * a divergence from the `collect_list` + `array_sort` + `slice`
  * spelling this aggregate replaces, which keeps duplicates and so
  * shifts the k-th element when dupes exist. The map carries pair →
  * count; `n` tracks total multiplicity so the trim stays O(log k). */
private[functions] final class TopKBuf {
  val m: scala.collection.mutable.TreeMap[(Double, Long), Int] =
    scala.collection.mutable.TreeMap.empty[(Double, Long), Int]
  var n: Int = 0

  def add(p: (Double, Long), c: Int): Unit = {
    m.update(p, m.getOrElse(p, 0) + c); n += c
  }

  def trim(k: Int): Unit = while (n > k) {
    val last = m.lastKey
    val c = m(last)
    val drop = math.min(c, n - k)
    if (drop == c) m.remove(last) else m.update(last, c - drop)
    n -= drop
  }
}

/** `graft_topk_min(score, id, k)` — bounded top-k aggregate: keeps the
  * k smallest (score, id) pairs in (score asc, id asc) order — counting
  * duplicates, exactly like the `collect_list` + `array_sort` + `slice`
  * spelling it replaces — and returns them as
  * `array<struct<score: double, id: bigint>>`.
  *
  * The point is the STATE BOUND: `collect_list` + `array_sort` +
  * `slice` computes the same answer but its aggregation buffer is the
  * whole input group — in a streaming aggregation that buffer lives in
  * the state store per key, so a retrieval query scored against an
  * N-candidate pool kept O(N) state per query. This buffer holds at
  * most k pairs of total multiplicity at every moment (update and merge
  * both trim), so per-query streaming state is O(k) regardless of pool
  * size — the property the streaming ANN/PQ retrieval operators need at
  * scale. Top-k-LARGEST callers negate the score (the id tiebreak stays
  * ascending), the same trick the window twin's `(-cos, cid)` sort
  * uses. */
case class TopKMin(score: Expression, id: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  private lazy val k: Int = {
    require(kExpr.foldable, "graft_topk_min: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"graft_topk_min: k must be positive, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): TopKBuf = new TopKBuf

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      b.add((s.asInstanceOf[Double], i.asInstanceOf[Long]), 1)
      b.trim(k)
    }
    b
  }

  override def merge(a: TopKBuf, other: TopKBuf): TopKBuf = {
    other.m.foreach { case (p, c) => a.add(p, c); a.trim(k) }
    a
  }

  override def eval(b: TopKBuf): Any =
    new GenericArrayData(b.m.iterator.flatMap { case ((s, i), c) =>
      Iterator.fill(c)(InternalRow(s, i): Any)
    }.toArray)

  // wire format: [version: Byte][count: Int][(score: Double, id: Long,
  // multiplicity: Int)*]. The leading version byte makes a state-store
  // checkpoint written by a different binary restore-or-fail LOUDLY
  // (a format change bumps FORMAT_VERSION and old state raises below)
  // instead of reading garbage — buffers cross checkpoint boundaries
  // in streaming restarts.
  private final val FORMAT_VERSION: Byte = 2

  override def serialize(b: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(1 + 4 + b.m.size * 20)
    bb.put(FORMAT_VERSION)
    bb.putInt(b.m.size)
    b.m.foreach { case ((s, i), c) => bb.putDouble(s); bb.putLong(i); bb.putInt(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val ver = bb.get()
    if (ver != FORMAT_VERSION)
      throw new IllegalStateException(
        s"graft_topk_min buffer format $ver does not match this binary's " +
          s"$FORMAT_VERSION — the streaming checkpoint was written by an " +
          "incompatible version; restart from a fresh checkpoint")
    val n = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b.add((bb.getDouble, bb.getLong), bb.getInt); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKMin =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "graft_topk_min"
}
