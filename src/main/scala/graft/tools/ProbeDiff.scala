package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeDiff {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val json = """{"select":["day",{"COUNT":"value"},{"AVG":"value"},{"MIN":"value"}],"from":"events","group_by":["day"]}"""
    val prepared = graft.SparkEntry.preparedEngine(spark, "/root/testdata/sf0.001", cacheResults = false)
    val scan = graft.engine.Engine.forDir(spark, "/root/testdata/sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.map {
        case d: Double => f"$d%.4f"; case null => "NULL"; case v => v.toString }.mkString("|")).sorted.toSeq
    val a = canon(prepared.executeJson(json))
    val b = canon(scan.executeJson(json))
    println("routed_n=" + a.size + " scanned_n=" + b.size)
    a.zip(b).filter(p => p._1 != p._2).take(5).foreach { case (x, y) =>
      println("ROUTED  " + x); println("SCANNED " + y) }
    println("schema routed: " + prepared.executeJson(json).schema.simpleString)
    println("schema scanned: " + scan.executeJson(json).schema.simpleString)
    spark.stop()
  }
}
