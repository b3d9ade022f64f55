package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Library facade: the reference's name-keyed function registry (U1,
  * `mapper/src/available_functions.py:5-19`) generalized to named
  * DataFrame pipelines, with the reference's raise-on-unknown-name
  * semantics (`FunctionRegistry.get_function`, which raises ValueError).
  */
object Engine {

  /** All registered pipelines, by name. */
  def pipelines: Map[String, (SparkSession, String) => DataFrame] = SparkEntry.queries

  /** Resolve a pipeline by name; unknown names fail fast with the
    * available catalog in the message.
    */
  def pipeline(name: String): (SparkSession, String) => DataFrame =
    pipelines.getOrElse(name, throw new NoSuchElementException(
      s"unknown pipeline '$name'; available: ${pipelines.keys.toSeq.sorted.mkString(", ")}"))

  /** Run a named pipeline against a corpus directory. */
  def run(spark: SparkSession, name: String, dir: String): DataFrame =
    pipeline(name)(spark, dir)
}
