package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** SQL DUAL-EXECUTION PARITY GATE (r18 VERDICT ask #2): every oracle in
  * `SparkEntry.oracleSql` is ANSI SQL the driver runs through DuckDB —
  * this spec runs each one through the ENGINE's OWN `spark.sql` against
  * the registered fixture views and asserts the result equals the
  * registered DataFrame pipeline's, pinning DataFrame-vs-SQL-surface
  * parity across the whole query surface (the reference's U1 registry
  * analogue for a SQL entry point).
  *
  * Three mechanical, semantics-preserving dialect rewrites are applied
  * before `spark.sql` (each is pure syntax — the plan semantics are
  * identical):
  *   - `AS MATERIALIZED` → `AS` (a DuckDB planner hint);
  *   - `FILTER (cond)` → `FILTER (WHERE cond)` (ANSI spelling);
  *   - `strftime(ts, '%…')` → `date_format(ts, '…')` with the format
  *     token map %Y→yyyy, %m→MM, %d→dd, %H→HH, %M→mm, %S→ss.
  *
  * Oracles written in genuinely DuckDB-specific SQL (list lambdas,
  * unnest-with-alias, recursive enumeration, epoch_ns, `//`, typed `[]`
  * literals…) are NAMED in `skips` with the blocking construct, and the
  * skip itself is asserted real: a skip-listed oracle that starts
  * parsing in Spark fails its test, forcing the list to shrink as the
  * surfaces converge.
  */
class SqlParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = sys.env.getOrElse("GRAFT_SQL_PARITY_SF",
    "/root/testdata/sf0.001")

  /** The fixture views, registered exactly as DuckDB sees them — raw
    * parquet, except `events`, which surfaces the SAME normalized µs
    * `ts` both engines key on (Tables.events' nanos adaptation).
    */
  private lazy val ready: Boolean = {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      graft.sources.Tables.tbl(spark, dir, t).createOrReplaceTempView(t)
    graft.sources.Tables.events(spark, dir).withColumnRenamed("t", "ts")
      .createOrReplaceTempView("events")
    true
  }

  private def sparkize(sql: String): String = {
    var s = sql
      .replace(" AS MATERIALIZED", " AS")
      .replaceAll("FILTER \\((?!WHERE)", "FILTER (WHERE ")
      .replace("strftime(", "date_format(")
    for ((d, j) <- Seq("%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
        "%H" -> "HH", "%M" -> "mm", "%S" -> "ss"))
      s = s.replace(d, j)
    s
  }

  private def cellStr(v: Any): String = v match {
    case null => "∅"
    case a: scala.collection.Seq[_] => a.map(cellStr).mkString("[", ",", "]")
    case x => x.toString
  }

  private def canon(df: DataFrame): (Seq[String], Seq[Seq[String]]) = {
    val cols = df.columns.sorted.toSeq
    val rows = df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(cellStr)).toSeq.sortBy(_.mkString(""))
    (cols, rows)
  }

  /** name → the DuckDB-specific construct that blocks `spark.sql`. */
  private val skips: Map[String, String] = SqlParitySpec.skips

  private val oracleNames = SparkEntry.oracleSql.keys.toSeq.sorted

  if (sys.env.contains("GRAFT_SQL_PARITY_EXPLORE")) {
    // dev mode: one sweeping test that CLASSIFIES every oracle instead
    // of asserting — the output is the data the skip list is built from
    test("explore: classify every oracle under spark.sql") {
      assert(ready)
      for (name <- oracleNames) {
        val sql = sparkize(SparkEntry.oracleSql(name))
        val status =
          try {
            val got = canon(spark.sql(sql))
            val want = canon(SparkEntry.queries(name)(spark, dir))
            if (got == want) "MATCH"
            else if (got._1 != want._1) s"SCHEMA got=${got._1} want=${want._1}"
            else "MISMATCH"
          } catch { case e: Throwable =>
            "ERR " + Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString.take(160)
          }
        println(s"[sqlparity] $name\t$status")
      }
    }
  } else {
    for (name <- oracleNames) skips.get(name) match {
      case Some(reason) =>
        test(s"sql-parity skip is real: $name [$reason]") {
          assert(ready)
          // the skip must stay justified: the oracle text (post-rewrite)
          // must still be un-runnable by Spark SQL
          intercept[Throwable] {
            spark.sql(sparkize(SparkEntry.oracleSql(name))).collect(): Unit
          }
        }
      case None =>
        test(s"sql parity: $name") {
          assert(ready)
          val viaSql = canon(spark.sql(sparkize(SparkEntry.oracleSql(name))))
          val viaDf = canon(SparkEntry.queries(name)(spark, dir))
          assert(viaSql._1 === viaDf._1, "column sets differ")
          assert(viaSql._2 === viaDf._2, "result rows differ")
        }
    }
  }
}

object SqlParitySpec {
  /** The named DuckDB-specific skip list — see the class doc. */
  private[graft] val skips: Map[String, String] = Map.empty
}
