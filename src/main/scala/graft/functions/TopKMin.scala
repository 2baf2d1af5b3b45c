package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_topk_min(score, id, k)` — bounded top-k aggregate: keeps the
  * k smallest (score, id) pairs in (score asc, id asc) order and
  * returns them as `array<struct<score: double, id: bigint>>`.
  *
  * The point is the STATE BOUND: `collect_list` + `array_sort` +
  * `slice` computes the same answer but its aggregation buffer is the
  * whole input group — in a streaming aggregation that buffer lives in
  * the state store per key, so a retrieval query scored against an
  * N-candidate pool kept O(N) state per query. This buffer holds at
  * most k pairs at every moment (update and merge both trim), so
  * per-query streaming state is O(k) regardless of pool size — the
  * property the streaming ANN/PQ retrieval operators need at scale.
  * Top-k-LARGEST callers negate the score (the id tiebreak stays
  * ascending), the same trick the window twin's `(-cos, cid)` sort
  * uses. */
case class TopKMin(score: Expression, id: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[(Double, Long)]] {

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

  override def createAggregationBuffer(): scala.collection.mutable.TreeSet[(Double, Long)] =
    scala.collection.mutable.TreeSet.empty[(Double, Long)]

  override def update(b: scala.collection.mutable.TreeSet[(Double, Long)],
      input: InternalRow): scala.collection.mutable.TreeSet[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      b += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (b.size > k) b -= b.lastKey
    }
    b
  }

  override def merge(a: scala.collection.mutable.TreeSet[(Double, Long)],
      other: scala.collection.mutable.TreeSet[(Double, Long)]): scala.collection.mutable.TreeSet[(Double, Long)] = {
    other.foreach { p => a += p; if (a.size > k) a -= a.lastKey }
    a
  }

  override def eval(b: scala.collection.mutable.TreeSet[(Double, Long)]): Any =
    new GenericArrayData(b.toArray.map { case (s, i) =>
      InternalRow(s, i): Any
    })

  override def serialize(b: scala.collection.mutable.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.size * 16)
    bb.putInt(b.size)
    b.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b += ((bb.getDouble, bb.getLong)); i += 1 }
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
