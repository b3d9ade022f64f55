package graft.functions

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.model.{DocRef, Posting, PostingList}

/** Typed aggregation surface (SURVEY §2.2 UDF/UDAF row): a Spark
  * `Aggregator` that builds the reference's posting list directly —
  * partial (per-partition `reduce`) + final (`merge`) phases mirror the
  * reference's mapper-side grouping (G1) and reducer merge (R1-R3).
  *
  * The built-in `sort_array(collect_list(...))` path
  * (`InvertedIndex.index`) is the default — it is codegen'd and needs no
  * object serialization. This Aggregator exists for callers who need
  * custom merge logic (e.g. capped lists, first-url-wins tie-breaks)
  * where built-ins stop composing; dedupe here keeps the MINIMUM url per
  * doc_id, the engine's canonical tie-break (SURVEY §7.3).
  */
object PostingListAgg extends Aggregator[Posting, List[DocRef], Seq[DocRef]] {

  override def zero: List[DocRef] = Nil

  override def reduce(buf: List[DocRef], p: Posting): List[DocRef] =
    DocRef(p.doc_id, p.url) :: buf

  override def merge(a: List[DocRef], b: List[DocRef]): List[DocRef] = a ::: b

  override def finish(buf: List[DocRef]): Seq[DocRef] =
    buf.groupBy(_.doc_id).view
      .map { case (_, refs) => refs.minBy(_.url) }
      .toSeq.sortBy(r => (r.doc_id, r.url))

  override def bufferEncoder: Encoder[List[DocRef]] = Encoders.kryo[List[DocRef]]
  override def outputEncoder: Encoder[Seq[DocRef]] = Encoders.kryo[Seq[DocRef]]

  /** Typed index build: `Dataset[Posting]` → `Dataset[PostingList]`. */
  def buildIndex(postings: Dataset[Posting]): Dataset[PostingList] = {
    val spark = postings.sparkSession
    import spark.implicits._
    postings
      .groupByKey(_.term)
      .agg(PostingListAgg.toColumn.name("postings"))
      .map { case (term, refs) => PostingList(term, refs) }
  }
}
