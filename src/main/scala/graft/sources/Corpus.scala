package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus ingestion (reference S1-S3).
  *
  * The engine's canonical corpus is a parquet `documents` table
  * (`doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG`);
  * `url` is synthesized as `doc://<source>/<doc_id>` where the reference
  * shape needs one. Dense sequential doc_ids are assigned once at ingestion
  * (reference `master/src/coordinator.py:57`), never re-derived downstream.
  */
object Corpus {

  /** Primary source: parquet documents table with a synthesized url. */
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("url", concat(lit("doc://"), col("source"), lit("/"), col("doc_id")))

  /** Reference S2: a JSON array-of-strings URL list (e.g. the reference's
    * `artist_URIs.json`). Assigns dense positional doc_ids exactly like the
    * master's chunk-offset scheme — `zipWithIndex`, NOT
    * `monotonically_increasing_id` (non-dense). One extra job, paid once.
    */
  def fromUrlList(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val urls = spark.read.option("multiLine", true).json(path).as[String]
    urls.rdd.zipWithIndex.map { case (u, i) => (i, u) }.toDF("doc_id", "url")
  }

  /** Reference S3 (live HTTP fetch + HTML text extraction) is deliberately a
    * driver-opt-in, never used in tests (hermetic builds). The fetch is plain
    * `mapPartitions` with one HTTP client per partition; failures yield EMPTY
    * TEXT, not dropped rows, so doc_ids keep their gaps (reference
    * `mapper/src/processor.py:184-187`). Network is unavailable in this
    * environment, so the transport is stubbed: a deterministic fake that
    * derives pseudo-content from the url. The Spark-side plumbing (schema,
    * partition-local client lifecycle, failure semantics) is the real design.
    */
  def fetchText(urlsDf: DataFrame, fetcher: String => String = stubFetcher): DataFrame = {
    val spark = urlsDf.sparkSession
    import spark.implicits._
    val fetchUdf = udf((url: String) =>
      try fetcher(url) catch { case _: Exception => "" })
    urlsDf.withColumn("text", fetchUdf(col("url")))
  }

  /** Deterministic stand-in for the HTTP+jsoup fetcher (no egress here). */
  private[graft] def stubFetcher(url: String): String =
    s"stub content for ${url.toLowerCase}"
}
