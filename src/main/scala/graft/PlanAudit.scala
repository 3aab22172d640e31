package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc plan inspection (not part of the driver contract). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    args.drop(1).foreach { q =>
      println(s"########## $q")
      val df = SparkEntry.queries(q)(spark, d)
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
