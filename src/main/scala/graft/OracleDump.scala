package graft

import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql as oracle_sql.json WITHOUT running any
  * query — lets a DuckDB parity pass start on already-written Verify
  * outputs while a long full-surface Verify run is still going
  * (PARITY_ONLY drives the per-query selection). Same JSON escaping as
  * Verify.
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("oracle_sql.json")
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
    println(s"[oracle-dump] ${SparkEntry.oracleSql.size} oracles -> $out")
  }
}
