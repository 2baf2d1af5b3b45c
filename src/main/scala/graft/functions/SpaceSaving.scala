package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Bounded space-saving counter set: at most k (term → upper, lower)
  * counters. `upper` is the classic space-saving count (an
  * OVERestimate: true count ≤ upper always); `lower` is count − error
  * (an UNDERestimate: true count ≥ lower always). `minUpper` — the
  * smallest tracked upper when full, 0 otherwise — bounds the true
  * count of every UNtracked term, which is both the eviction rule and
  * the merge rule's absent-term term. */
private[functions] final class SpaceSavingBuf(val k: Int) {
  val m: scala.collection.mutable.HashMap[String, (Long, Long)] =
    scala.collection.mutable.HashMap.empty

  def minUpper: Long =
    if (m.size < k) 0L
    else m.valuesIterator.map(_._1).min

  def addOne(t: String): Unit = m.get(t) match {
    case Some((u, l)) => m.update(t, (u + 1, l + 1))
    case None if m.size < k => m.update(t, (1L, 1L))
    case None =>
      // evict the min-upper counter (ties → lexicographically largest
      // term goes, a deterministic rule); the newcomer inherits the
      // evictee's upper as its error: upper = min+1, lower = 1
      val (evict, (mu, _)) =
        m.iterator.maxBy { case (t0, (u, _)) => (-u, t0) }
      m.remove(evict)
      m.update(t, (mu + 1, 1L))
  }

  /** Mergeable-summaries merge (Agarwal, Cormode, Huang, Phillips, Wei
    * & Yi, "Mergeable Summaries", PODS 2012 §3): uppers add with the
    * other side's minUpper standing in for absent terms (an untracked
    * term's true count is ≤ that bound), lowers add with 0 standing in
    * (nothing is guaranteed for absent terms), then trim back to the k
    * largest uppers (ties → term asc survives). Both error directions
    * stay sound; the bound degrades additively, never silently. */
  def mergeIn(o: SpaceSavingBuf): Unit = {
    val minA = minUpper
    val minB = o.minUpper
    val keys = m.keySet ++ o.m.keySet
    val combined = keys.iterator.map { t =>
      val (ua, la) = m.getOrElse(t, (minA, 0L))
      val (ub, lb) = o.m.getOrElse(t, (minB, 0L))
      t -> (ua + ub, la + lb)
    }.toSeq
    m.clear()
    combined.sortBy { case (t, (u, _)) => (-u, t) }.take(k)
      .foreach { case (t, ul) => m.update(t, ul) }
  }
}

/** `graft_space_saving(term, k)` — the space-saving heavy-hitters
  * sketch (Metwally, Agrawal & El Abbadi, "Efficient Computation of
  * Frequent and Top-k Elements in Data Streams", ICDT 2005) as a
  * bounded TypedImperativeAggregate: k counters of state per group AT
  * EVERY MOMENT (update and merge both trim), so a streaming
  * aggregation keeps O(k) state per key no matter how many distinct
  * terms flow past — the property the exact heavy-hitters aggregate
  * (state = whole vocabulary) cannot give at open-vocabulary scale.
  *
  * Output: `array<struct<term: string, count_lower: bigint,
  * count_upper: bigint>>`, upper desc / term asc. ERROR CONTRACT
  * (spec-pinned): count_lower ≤ true count ≤ count_upper for every
  * emitted term, and every term with true count > n/k (n = stream
  * length) is present — the classic space-saving guarantee, with merge
  * degrading the gap additively per the mergeable-summaries rule.
  * The VALUES of the bounds (not their validity) depend on partial-
  * aggregation merge order, like every sketch: consumers read the
  * interval, not a point. */
object SpaceSaving {
  /** Sequential replay of the PRODUCTION counter algebra over an
    * ordered term stream: the single-stream special case of the
    * aggregate (no merges), returning the final counters in the
    * aggregate's own eval order (upper desc, term asc) as
    * (term, lower, upper). This is what makes a hash-exact twin of the
    * sketch possible (`ds_heavy_hitters_sketch1`): given a pinned
    * stream order the ICDT-2005 update rule is deterministic, and the
    * twin replays THIS code — the same `addOne` increments, inserts,
    * and min-upper/lexicographically-largest-tie evictions the
    * distributed aggregate runs per partition — so a DuckDB recursive
    * CTE over the same ordered stream can hash-check the algebra. */
  def replay(terms: Iterator[String], k: Int): Seq[(String, Long, Long)] = {
    val b = new SpaceSavingBuf(k)
    terms.foreach(b.addOne)
    b.m.toSeq.sortBy { case (t, (u, _)) => (-u, t) }
      .map { case (t, (u, l)) => (t, l, u) }
  }
}

case class SpaceSaving(term: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuf] {

  private lazy val k: Int = {
    require(kExpr.foldable, "graft_space_saving: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"graft_space_saving: k must be positive, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(term, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType),
    StructField("count_lower", LongType),
    StructField("count_upper", LongType))))

  override def createAggregationBuffer(): SpaceSavingBuf = new SpaceSavingBuf(k)

  override def update(b: SpaceSavingBuf, input: InternalRow): SpaceSavingBuf = {
    val t = term.eval(input)
    if (t != null) b.addOne(t.toString)
    b
  }

  override def merge(a: SpaceSavingBuf, other: SpaceSavingBuf): SpaceSavingBuf = {
    a.mergeIn(other)
    a
  }

  override def eval(b: SpaceSavingBuf): Any =
    new GenericArrayData(b.m.toSeq.sortBy { case (t, (u, _)) => (-u, t) }
      .map { case (t, (u, l)) =>
        InternalRow(UTF8String.fromString(t), l, u): Any
      }.toArray)

  // wire format: [version: Byte][count: Int][(len: Int, utf8 bytes,
  // upper: Long, lower: Long)*] — versioned for the same loud
  // restore-or-fail contract as graft_topk_min (buffers cross
  // streaming checkpoint boundaries).
  private final val FORMAT_VERSION: Byte = 1

  override def serialize(b: SpaceSavingBuf): Array[Byte] = {
    val entries = b.m.toSeq.map { case (t, ul) =>
      (t.getBytes(StandardCharsets.UTF_8), ul)
    }
    val bb = ByteBuffer.allocate(
      1 + 4 + entries.map(e => 4 + e._1.length + 16).sum)
    bb.put(FORMAT_VERSION)
    bb.putInt(entries.size)
    entries.foreach { case (bytes, (u, l)) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(u); bb.putLong(l)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val ver = bb.get()
    if (ver != FORMAT_VERSION)
      throw new IllegalStateException(
        s"graft_space_saving buffer format $ver does not match this " +
          s"binary's $FORMAT_VERSION — the streaming checkpoint was " +
          "written by an incompatible version; restart from a fresh one")
    val n = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      b.m.update(new String(arr, StandardCharsets.UTF_8), (bb.getLong, bb.getLong))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSaving =
    copy(term = newChildren(0), kExpr = newChildren(1))
  override def prettyName: String = "graft_space_saving"
}
