package graft

/** Dev tool (test scope): print one oracle's SQL for direct DuckDB
  * iteration — `Test/runMain graft.DumpOracle q69_fuzzy_decontam`. */
object DumpOracle {
  def main(a: Array[String]): Unit =
    println(SparkEntry.oracleSql(a(0)))
}
