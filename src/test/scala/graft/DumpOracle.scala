object DumpOracle {
  def main(a: Array[String]): Unit = {
    println(graft.queries.HygieneQueries.oracles(a(0)))
  }
}
