package graft.tools

import java.nio.file.{Files, Paths}
import graft.SparkEntry

/** Dev-only: dump oracle_sql.json WITHOUT executing any query — feeds
  * tools/check_oracle_types.py, the static DESCRIBE sweep that rejects
  * HUGEINT/DECIMAL oracle output columns (the round-4 driver-red class:
  * DuckDB sum(BIGINT)→HUGEINT renders as float via pandas .df() while
  * Spark emits int). No SparkSession needed; runs in ~2 s.
  * Usage: DumpOracleSql <outFile>
  */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    System.err.println(s"[dump] ${SparkEntry.oracleSql.size} oracle SQLs -> $out")
  }
}
