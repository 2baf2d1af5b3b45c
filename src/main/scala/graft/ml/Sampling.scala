package graft.ml

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Train/test sampling + split — reference semantics from
  * `/root/reference/src/orm/sampling.rs:48-66` and
  * `/root/reference/src/orm/snapshot.rs:803-819`.
  *
  * `ORDER BY RANDOM()` becomes `orderBy(rand(seed), tieBreak)` — seeded so
  * snapshots are reproducible (the reference's snapshots are only
  * reproducible because it materializes them; ours are reproducible by
  * construction). The stratified variant fixes the reference's projection
  * bug (it selects only the label columns, `sampling.rs:57-60`, yet
  * downstream reads features — we select *).
  *
  * Scale note: a global `orderBy(rand)` is a full range-partitioned
  * shuffle — unavoidable for a true random *order*, but the split itself
  * only needs a per-row hash test, so `splitByFraction` (hash-based,
  * shuffle-free) is the 100 TB path; the ordered variants exist for
  * reference parity and `last` sampling.
  */
object Sampling {
  sealed trait Strategy
  case object RandomSampling extends Strategy
  case object LastSampling extends Strategy
  case object StratifiedSampling extends Strategy

  def parse(s: String): Strategy = s.toLowerCase match {
    case "random" => RandomSampling
    case "last" => LastSampling
    case "stratified" => StratifiedSampling
    case other => throw new IllegalArgumentException(s"unknown sampling: $other")
  }

  /** Reference split arithmetic (`snapshot.rs:803-819`): test_size > 1 ⇒
    * absolute row count; else round(n·test_size) half-away-from-zero
    * (f32 `.round()`); errors when the train side would be empty. */
  def trainTestCounts(numRows: Long, testSize: Double): (Long, Long) = {
    val numTest =
      if (testSize > 1.0) testSize.toLong
      else math.round(numRows * testSize)
    val numTrain = numRows - numTest
    require(numTrain > 0,
      s"test_size = $numTest is too large. There are only $numRows samples.")
    (numTrain, numTest)
  }

  /** Apply a sampling strategy, producing a deterministic ordering column
    * `__order` used by the head/tail split. Global numbering goes through
    * `Distributed.withRowNumber` (range-partitioned two-phase), never an
    * unpartitioned window — every stage stays parallel at cluster scale.
    * Random permutations materialize `rand(seed)` into a column first;
    * they are reproducible for a fixed input partitioning (same files,
    * same conf), which is the Spark-native analogue of the reference's
    * seeded `ORDER BY RANDOM()`. */
  def ordered(df: DataFrame, strategy: Strategy, labelCols: Seq[String],
      orderCols: Seq[String], seed: Long): DataFrame = strategy match {
    case RandomSampling =>
      val tagged = df.withColumn("__rand", rand(seed))
      graft.operators.Distributed
        .withRowNumber(tagged, "__order", col("__rand") +: orderCols.map(col))
        .drop("__rand")
    case LastSampling =>
      // "table order" is undefined on a distributed store; we require an
      // explicit natural-order key (e.g. the primary key / ingest time).
      graft.operators.Distributed.withRowNumber(df, "__order", orderCols.map(col))
    case StratifiedSampling =>
      // Proportional interleave: rank within class by rand, then order
      // globally by the FRACTIONAL within-class position rn/|class|. The
      // reference orders by raw rn (`sampling.rs:61-64`), which dumps the
      // majority class's excess rows at the tail — on imbalanced data its
      // head/tail split produces a single-class test set. Fractional
      // position keeps every class uniformly spread, so any head/tail cut
      // is label-balanced (this is the fix, like the projection-bug fix).
      // The within-class windows are partitioned by label — parallel.
      val inClass = Window.partitionBy(labelCols.map(col): _*)
        .orderBy((rand(seed) +: orderCols.map(col)): _*)
      val classN = Window.partitionBy(labelCols.map(col): _*)
      val tagged = df.withColumn("__rn", row_number().over(inClass))
        .withColumn("__frac", col("__rn").cast("double") / count(lit(1)).over(classN))
        .withColumn("__rand", rand(seed + 1))
      graft.operators.Distributed
        .withRowNumber(tagged, "__order",
          Seq(col("__frac"), col("__rand")) ++ orderCols.map(col))
        .drop("__rn", "__frac", "__rand")
  }

  /** Head/tail split after ordering: first numTrain rows are train. */
  def headTailSplit(ordered: DataFrame, numTrain: Long): (DataFrame, DataFrame) =
    (ordered.filter(col("__order") <= numTrain).drop("__order"),
      ordered.filter(col("__order") > numTrain).drop("__order"))

  def split(df: DataFrame, strategy: Strategy, labelCols: Seq[String],
      orderCols: Seq[String], testSize: Double, seed: Long = 42L): (DataFrame, DataFrame) = {
    val n = df.count()
    val (numTrain, _) = trainTestCounts(n, testSize)
    headTailSplit(ordered(df, strategy, labelCols, orderCols, seed), numTrain)
  }

  /** Shuffle-free hash split for cluster scale: deterministic per-row
    * membership from a seeded hash — no global sort, no window, fully
    * parallel. Fractions are approximate (±binomial noise), matching
    * `DataFrame.randomSplit` behavior but reproducible row-wise. */
  def splitByFraction(df: DataFrame, keyCols: Seq[String], testSize: Double,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    // test_size > 1 means an ABSOLUTE row count (`snapshot.rs:803-819`,
    // honored by train()'s ordered split): resolve it to a fraction
    // here, else `h < testSize·1e6` is true for every row and the whole
    // corpus silently becomes the test set (train == test under the
    // tiny-relation fallback → leaked, inflated metrics)
    val frac =
      if (testSize > 1.0) math.min(1.0, testSize / math.max(df.count(), 1L))
      else testSize
    val h = abs(xxhash64((lit(seed) +: keyCols.map(col)): _*)) % 1000000L
    val isTest = h < (frac * 1000000L).toLong
    (df.filter(!isTest), df.filter(isTest))
  }
}
