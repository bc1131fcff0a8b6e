package graft.tools
import org.apache.spark.sql.SparkSession
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, dir) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.analytics.Registry.byName(name).fn(spark, dir).count()
    println(s"RUNONE $name rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
