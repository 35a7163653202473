package graft.tools
import java.nio.file.{Files, Paths}
/** Dev probe: dump one or more SparkEntry queries (comma-separated) +
  * their oracles for tools/check.py — the targeted inner loop next to
  * the full graft.Verify run. */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/root/repo/target/verify_one"
    val spark = graft.GraftSession.builder("8").appName("probe-one").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.toSeq
      .flatMap(n => graft.SparkEntry.oracleSql.get(n).map(sql =>
        s"${q(n)}: ${q(graft.PipelineEntries.resolveOracle(sql, sfDir))}"))
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
