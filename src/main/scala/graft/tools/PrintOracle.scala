package graft.tools

/** Print one oracle SQL string from SparkEntry (debugging aid: lets the
  * DuckDB twin be smoke-tested without a Spark run). */
object PrintOracle {
  def main(args: Array[String]): Unit =
    println(graft.SparkEntry.oracleSql(args(0)))
}
