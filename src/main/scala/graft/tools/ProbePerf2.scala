package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object ProbePerf2 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PERF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.ParquetNanos.read(spark, "/root/testdata/sf0.1/documents.parquet")
    docs.count()
    val toks = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    t("split_explode")(docs.select(explode(toks)).count())
    // current: slice+concat_ws per position
    val cnt = size(toks)
    val shA = array_distinct(when(cnt >= 3,
      transform(sequence(lit(1), cnt - lit(2)), i => concat_ws(" ", slice(toks, i, lit(3)))))
      .otherwise(array(concat_ws(" ", toks))))
    t("shingles_slice")(docs.select(explode(shA)).count())
    t("shingles_slice2")(docs.select(explode(shA)).count())
    // element_at variant
    val shB = array_distinct(when(cnt >= 3,
      transform(sequence(lit(1), cnt - lit(2)), i => concat_ws(" ",
        element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array(concat_ws(" ", toks))))
    t("shingles_element_at")(docs.select(explode(shB)).count())
    t("shingles_element_at2")(docs.select(explode(shB)).count())
    // pre-projected tokens (barrier test: does a separate select help?)
    val tokDf = docs.select(col("doc_id"), toks.as("t"))
    val cnt2 = size(col("t"))
    val shC = array_distinct(when(cnt2 >= 3,
      transform(sequence(lit(1), cnt2 - lit(2)), i => concat_ws(" ",
        element_at(col("t"), i), element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
      .otherwise(array(concat_ws(" ", col("t")))))
    t("shingles_preproj")(tokDf.select(explode(shC)).count())
    // relational window variant
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val rel = docs.select(col("doc_id"), posexplode(toks))
      .withColumnRenamed("col","tok").withColumnRenamed("pos","pos")
      .withColumn("sh", concat_ws(" ", col("tok"), lead("tok",1).over(w), lead("tok",2).over(w)))
    t("shingles_window")(rel.count())
    spark.stop()
  }
}
