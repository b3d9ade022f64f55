package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary: the driver regenerates /root/testdata between
  * rounds, and a silent physical-type change cascades into many opaque
  * failures (r10: events.ts flipped TIMESTAMP(NANOS)→timestamp[us] and took
  * out 8 queries + 10 tests with DATATYPE_MISMATCH). This suite opens every
  * fixture parquet once and asserts the engine's expected logical schema,
  * so the NEXT drift is one test failure that names the drifted
  * column/type instead of a cascade.
  *
  * Columns with several acceptable physical encodings (the events `ts`
  * generations `Tables.events` adapts to) list every permitted type.
  */
class TestdataCanarySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // expected logical schema per table: column -> permitted Spark types.
  // Timestamp columns admit NTZ and session-tz flavors (reader inference
  // config chooses); events.ts additionally admits LongType (the
  // nanos-as-long escape hatch reading of a TIMESTAMP(NANOS) generation).
  private val ts: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private def one(t: DataType): Set[DataType] = Set(t)

  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> one(IntegerType), "r_name" -> one(StringType)),
    "nation" -> Seq("n_nationkey" -> one(IntegerType), "n_name" -> one(StringType),
      "n_regionkey" -> one(IntegerType)),
    "customer" -> Seq("c_custkey" -> one(LongType), "c_name" -> one(StringType),
      "c_nationkey" -> one(IntegerType), "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Seq("s_suppkey" -> one(LongType), "s_name" -> one(StringType),
      "s_nationkey" -> one(IntegerType), "s_acctbal" -> one(DoubleType)),
    "part" -> Seq("p_partkey" -> one(LongType), "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> one(IntegerType), "p_retailprice" -> one(DoubleType)),
    "orders" -> Seq("o_orderkey" -> one(LongType), "o_custkey" -> one(LongType),
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> one(StringType)),
    "lineitem" -> Seq("l_orderkey" -> one(LongType), "l_partkey" -> one(LongType),
      "l_suppkey" -> one(LongType), "l_linenumber" -> one(IntegerType),
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> ts),
    "events" -> Seq("event_id" -> one(LongType),
      "ts" -> (ts + LongType), "user_id" -> one(LongType),
      "event_type" -> one(StringType), "value" -> one(DoubleType),
      "props" -> one(StringType)),
    "documents" -> Seq("doc_id" -> one(LongType), "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> one(LongType)),
    "embeddings" -> Seq("vec_id" -> one(LongType),
      "embedding" -> one(ArrayType(FloatType, containsNull = true)),
      "label" -> one(IntegerType))
  )

  // Content canary, not just schema: the q_resize / q_frame_sample
  // oracles equate char offsets with byte offsets and md5(chars) with
  // md5(bytes) — sound only while documents.text is pure ASCII — and
  // skip the empty-payload branch because the shortest doc is ≥ 47
  // chars. A generator drift to non-ASCII or shorter docs would surface
  // as opaque md5 hash mismatches; this test makes it name itself.
  // Checked at both gate scales (sf0.001 tests, sf0.01 driver oracle).
  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"testdata canary: $sf documents.text is pure ASCII with min length >= 47") {
      import org.apache.spark.sql.functions._
      val row = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .agg(
          sum(when(col("text").rlike("[^\\x00-\\x7F]"), 1L).otherwise(0L))
            .as("non_ascii_docs"),
          min(length(col("text"))).as("min_len"))
        .head()
      assert(row.getLong(0) === 0L,
        s"$sf/documents.parquet now carries non-ASCII text — the " +
          "q_resize/q_frame_sample oracles' chars==bytes assumption broke")
      assert(row.getInt(1) >= 47,
        s"$sf shortest doc is ${row.getInt(1)} chars (< 47) — the resize " +
          "oracle's no-empty-payload assumption broke")
    }
  }

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"testdata canary: $table.parquet matches the engine's expected schema") {
      val actual = spark.read.parquet(s"$dir/$table.parquet").schema
      val drift = new StringBuilder
      for ((name, permitted) <- cols) {
        actual.find(_.name == name) match {
          case None =>
            drift ++= s"\n  MISSING column `$name` (expected ${permitted.mkString(" | ")})"
          case Some(f) if !permitted.contains(f.dataType) =>
            drift ++= s"\n  DRIFTED column `$name`: testdata now carries ${f.dataType}, " +
              s"engine expects ${permitted.mkString(" | ")}"
          case _ => ()
        }
      }
      val extra = actual.map(_.name).toSet -- cols.map(_._1).toSet
      if (extra.nonEmpty)
        drift ++= s"\n  NEW columns ${extra.toSeq.sorted.mkString(", ")} (harmless unless a loader breaks; update the canary)"
      assert(drift.isEmpty,
        s"testdata schema drift in $table.parquet — fix the loader (sources/Tables.scala) " +
          s"or update this canary:${drift.toString}")
    }
  }
}
