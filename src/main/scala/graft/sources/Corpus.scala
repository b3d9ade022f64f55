package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

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

  /** Reference S2: a JSON array-of-strings URL list (the reference's
    * `artist_URIs.json` shape). `posexplode` of the parsed array assigns
    * dense positional doc_ids exactly like the master's chunk-offset
    * scheme — array order IS document identity, with no RDD round-trip.
    * (Spark's JSON *source* cannot infer scalar-element top-level arrays —
    * it yields only `_corrupt_record` — so the file is read as whole text
    * and parsed with `from_json`.)
    */
  def fromUrlList(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", true).text(path)
      .select(posexplode(from_json(col("value"), ArrayType(StringType))))
      .select(col("pos").cast("long").as("doc_id"), col("col").as("url"))

  /** Reference S3 (per-document fetch + extract). The transport is a
    * partition-local client built ONCE per partition inside
    * `mapPartitions` — the distributed-fetch shape (never per-row client
    * construction, never a driver loop). Failures yield EMPTY TEXT, not
    * dropped rows, so doc_ids keep their gaps (reference
    * `mapper/src/processor.py:184-187`).
    *
    * No egress exists in this environment, so the default factory is a
    * deterministic stub; a real deployment passes e.g.
    * `() => url => Html.extractText(httpGet(url))` with an HTTP client
    * held per partition. The Spark-side plumbing (schema, client
    * lifecycle, failure semantics) is the real design and is what tests
    * cover.
    */
  def fetchText(urlsDf: DataFrame,
                fetcherFactory: () => String => String = () => stubFetcher): DataFrame = {
    val spark = urlsDf.sparkSession
    import spark.implicits._
    urlsDf.select(col("doc_id"), col("url")).as[(Long, String)]
      .mapPartitions { it =>
        val fetch = fetcherFactory() // one client per partition
        it.map { case (id, url) =>
          (id, url, try fetch(url) catch { case _: Exception => "" })
        }
      }
      .toDF("doc_id", "url", "text")
  }

  /** Deterministic stand-in for the HTTP+parser fetcher (no egress here). */
  private[graft] def stubFetcher(url: String): String =
    s"stub content for ${url.toLowerCase}"

  /** Documents from CSV (`doc_id,text,...` with header) — format breadth
    * on the same corpus contract; schema is declared, not inferred, so
    * the scan stays single-pass.
    */
  def documentsFromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", true)
      .schema("doc_id LONG, text STRING, source STRING")
      .csv(path)
      .withColumn("url", concat(lit("doc://"), col("source"), lit("/"), col("doc_id")))

  /** Documents from JSON-lines (one object per line). */
  def documentsFromJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("doc_id LONG, text STRING, source STRING")
      .json(path)
      .withColumn("url", concat(lit("doc://"), col("source"), lit("/"), col("doc_id")))

  /** Reference S1: build the URL corpus from already-fetched category
    * listing pages (driver-side, exactly like the reference's
    * single-threaded crawl — `master/src/master.py:48-86`). Pagination is
    * the caller's loop: fetch page → `Html.nextPageLink` → fetch next;
    * this function takes the accumulated page HTMLs and assigns dense
    * positional doc_ids across them in order.
    */
  def fromCategoryHtml(spark: SparkSession, pages: Seq[String]): DataFrame = {
    import spark.implicits._
    pages.flatMap(Html.wikiLinks).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
  }
}
