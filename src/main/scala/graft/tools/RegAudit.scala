package graft.tools
object RegAudit {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println("queries without oracle: " + (q -- o).toSeq.sorted.mkString(",")) 
    println("oracles without query: " + (o -- q).toSeq.sorted.mkString(","))
  }
}
