package graft

/** Debug aid: print ONE registered query's oracle SQL (for piping into
  * DuckDB without a full Verify run). Usage: runMain graft.DumpOracle <name>. */
object DumpOracle {
  def main(args: Array[String]): Unit =
    args.foreach(n => println(SparkEntry.oracleSql(n) + "\n;;;"))
}
