package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Scale-safe replacements for unpartitioned window functions.
  *
  * `Window.orderBy(...)` with no partition funnels the ENTIRE relation
  * through one task (Spark warns "Moving all data to a single
  * partition") — fatal at cluster scale. Both utilities here produce the
  * identical result through a range-partitioned shuffle plus a
  * two-phase offset computation, so every stage stays parallel:
  *
  *  1. `repartitionByRange` on the order keys (the same shuffle a global
  *     sort performs) + `sortWithinPartitions`;
  *  2. one tiny per-partition metadata job (counts / per-group totals —
  *     O(partitions + groups) rows collected, never O(rows));
  *  3. a map stage that adds the offset to the local running value.
  *
  * The sorted RDD is PERSISTED across the two jobs: both phases must see
  * byte-identical partition contents, and relying on shuffle-file reuse
  * alone breaks if the files are evicted and a non-deterministic
  * upstream recomputes differently. The cache is released by Spark's
  * ContextCleaner once the result is materialized and dereferenced.
  *
  * Callers must pass a TOTAL order (include a tiebreak key) for a
  * deterministic result, and must materialize non-deterministic order
  * expressions (e.g. `rand()`) into a column first —
  * `repartitionByRange` would otherwise re-evaluate them inconsistently
  * between its sampling and partitioning passes.
  */
object Distributed {

  private def shufflePartitions(df: DataFrame): Int =
    math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Global 1-based row numbers by a total order, without a
    * single-partition window. `zipWithIndex` runs the per-partition
    * count job and offset arithmetic of phase 2–3. */
  def withRowNumber(df: DataFrame, outCol: String, order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(shufflePartitions(df), order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    // zipWithIndex runs a count job then a map job — pin the partition
    // contents between them (see scaladoc above)
    val pinned = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val rdd = pinned.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Inclusive running sum of a LongType column per group over a total
    * order, without any window. Rows are range-partitioned by
    * (group, order) so each group is contiguous across partitions; the
    * collected per-(partition, group) totals are therefore bounded by
    * partitions + groups entries. Pass `groupCols = Seq.empty` for one
    * global prefix sum. */
  def groupedPrefixSum(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      valueCol: String, outCol: String): DataFrame =
    groupedPrefixSumWithTotals(df, groupCols, order, valueCol, outCol)._1

  /** As [[groupedPrefixSum]], but also returns the per-group grand
    * totals — they fall out of the phase-2 metadata for free, saving
    * callers (percentiles need n per column) a full extra pass over the
    * result. */
  def groupedPrefixSumWithTotals(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], valueCol: String,
      outCol: String): (DataFrame, Map[Seq[Any], Long]) = {
    val spark = df.sparkSession
    val sortKeys = groupCols.map(col) ++ order
    val sorted = df.repartitionByRange(shufflePartitions(df), sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
    val schema = sorted.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val vIdx = schema.fieldIndex(valueCol)
    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    // phase 2: per-(partition, group) totals, in group order of appearance
    val partTotals: Array[(Int, Seq[(Seq[Any], Long)])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val acc = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
        it.foreach { r =>
          val k = gIdx.map(r.get)
          acc.update(k, acc.getOrElse(k, 0L) + r.getLong(vIdx))
        }
        Iterator.single((pid, acc.toSeq))
      }.collect()
    val offsets = Map.newBuilder[(Int, Seq[Any]), Long]
    val running = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
    partTotals.sortBy(_._1).foreach { case (pid, totals) =>
      totals.foreach { case (k, tot) =>
        offsets += ((pid, k) -> running.getOrElse(k, 0L))
        running.update(k, running.getOrElse(k, 0L) + tot)
      }
    }
    val bc = spark.sparkContext.broadcast(offsets.result())
    // phase 3: local running sums + broadcast offsets
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: Seq[Any] = null
      var run = 0L
      it.map { r =>
        val k = gIdx.map(r.get)
        if (cur == null || k != cur) {
          cur = k
          run = bc.value.getOrElse((pid, k), 0L)
        }
        run += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    (spark.createDataFrame(out, schema.add(outCol, LongType, nullable = false)),
      running.toMap)
  }
}
