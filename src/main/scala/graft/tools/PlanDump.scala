package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: print the executed plan of named queries at sf0.001. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.EngineSession.builder("local[4]", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
