package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
object ScalarProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    val df = graft.Tables.lineitem(s, args(0))
    val cols = Seq("l_quantity","l_extendedprice","l_discount","l_tax")
    val dec4 = DecimalType(28,4); val dec6 = DecimalType(28,6)
    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      val aggs = cols.flatMap { c0 => val c = col(c0).cast("double")
        Seq(min(c), max(c), max(abs(c)), sum(c.cast(dec4)), sum((c*c).cast(dec6)),
          count(when(c.isNull || isnan(c),1)), count(c)) }
      df.agg(aggs.head, aggs.tail:_*).head()
      println(f"scalar_agg ${(System.nanoTime()-t0)/1e9}%.2f")
      t0 = System.nanoTime()
      graft.ml.Stats.exactPercentilesMulti(df, cols, Seq(0.5))
      println(f"pct_median ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    s.stop()
  }
}
