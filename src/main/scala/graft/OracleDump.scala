package graft
import java.nio.file.{Files, Paths}

/** Dev tool: dump SparkEntry.oracleSql as JSON WITHOUT starting Spark or
 * running queries — lets tools/check_oracles.py syntax-check new DuckDB
 * oracles cheaply (no cluster time). */
object OracleDump {
  def main(args: Array[String]): Unit = {
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
    Files.writeString(Paths.get(args(0)), json)
  }
}
