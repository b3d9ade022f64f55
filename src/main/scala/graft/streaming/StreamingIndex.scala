package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Streaming index build (SURVEY §2.2): the SAME tokenize → distinct →
  * explode pipeline as the batch `InvertedIndex.postings`, declared over
  * a document stream. Emits the posting relation incrementally in append
  * mode; a downstream `writeStream.format("parquet")` lands it
  * partition-by-partition, and the batch K2 bucketed sink compacts
  * periodically.
  *
  * Cross-batch (term, doc) dedupe uses `dropDuplicatesWithinWatermark`:
  * re-deliveries inside the watermark horizon are dropped and state is
  * EVICTED once the watermark passes — state stays bounded by stream lag
  * (the reference's R3 dedupe assumes a finite batch; an unbounded
  * stream needs exactly this horizon trade-off).
  *
  * Input schema: `doc_id LONG, url STRING, text STRING, ingest_t
  * TIMESTAMP` (arrival time for the watermark).
  */
object StreamingIndex {

  def postingsStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ingest_t", watermark)
      .select(col("doc_id"), col("url"), col("ingest_t"),
        explode(Text.terms(col("text"))).as("term"))
      .dropDuplicatesWithinWatermark("term", "doc_id")
      .select("term", "doc_id", "url")
}
