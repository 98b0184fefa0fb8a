package graft.examples
import java.nio.file.{Files, Paths}
/** Dump oracle SQL for a subset of queries (targeted oracle_check runs).
  * Usage: runMain graft.examples.DumpSql <outDir> <name1> <name2> ... */
object DumpSql {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    val names = args.tail.toSet
    val m = graft.SparkEntry.oracleSql.filter(kv => names(kv._1))
    val json = m.map { case (k, v) =>
      "\"" + k + "\": " + com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(v)
    }.mkString("{", ", ", "}")
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"wrote ${m.size} sqls")
  }
}
