package graft
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Spark.session()
    val df = SparkEntry.entry(spark)
    println(s"SMOKE rows=${df.count()} cols=${df.columns.mkString(",")}")
    df.show(3)
    spark.stop()
  }
}
