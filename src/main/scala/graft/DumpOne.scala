package graft
import org.apache.spark.sql.SparkSession
object DumpOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1); val out = args(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, dir).coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(out)
    spark.stop()
  }
}
