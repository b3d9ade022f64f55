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
  * custom merge logic where built-ins stop composing; the buffer
  * preserves arrival order (reduce prepends, merge keeps reversed
  * concatenation) so subclasses can implement order-sensitive
  * tie-breaks.
  */
sealed abstract class PostingListAggBase
    extends Aggregator[Posting, List[DocRef], Seq[DocRef]] {

  /** Collapse the ARRIVAL-ORDERED refs to one ref per doc_id. */
  protected def pick(arrival: Seq[DocRef]): Seq[DocRef]

  override def zero: List[DocRef] = Nil

  override def reduce(buf: List[DocRef], p: Posting): List[DocRef] =
    DocRef(p.doc_id, p.url) :: buf

  // buffers hold REVERSED arrival order, so merged arrival order is
  // reverse(a) ++ reverse(b) = reverse(b ::: a)
  override def merge(a: List[DocRef], b: List[DocRef]): List[DocRef] = b ::: a

  override def finish(buf: List[DocRef]): Seq[DocRef] =
    pick(buf.reverse).sortBy(r => (r.doc_id, r.url))

  override def bufferEncoder: Encoder[List[DocRef]] = Encoders.kryo[List[DocRef]]
  override def outputEncoder: Encoder[Seq[DocRef]] = Encoders.kryo[Seq[DocRef]]
}

/** Canonical R3 dedupe: MINIMUM url per doc_id — order-independent and
  * therefore deterministic under ANY partitioning / merge order, the
  * engine's default tie-break (documented deviation from the reference,
  * SURVEY §7.3).
  */
object PostingListAgg extends PostingListAggBase {

  override protected def pick(arrival: Seq[DocRef]): Seq[DocRef] =
    arrival.groupBy(_.doc_id).view
      .map { case (_, refs) => refs.minBy(_.url) }
      .toSeq

  /** Typed index build: `Dataset[Posting]` → `Dataset[PostingList]`. */
  def buildIndex(postings: Dataset[Posting]): Dataset[PostingList] =
    buildIndexWith(postings, this)

  private[graft] def buildIndexWith(postings: Dataset[Posting],
                                    agg: PostingListAggBase): Dataset[PostingList] = {
    val spark = postings.sparkSession
    import spark.implicits._
    postings
      .groupByKey(_.term)
      .agg(agg.toColumn.name("postings"))
      .map { case (term, refs) => PostingList(term, refs) }
  }
}

/** STRICT reference-parity R3 tie-break: the FIRST-ARRIVING url per
  * (term, doc_id) wins, exactly like the reference reducer's "keep the
  * url already seen" rule (`reducer/src/processor.py:69-77`). The
  * reference is a single sequential reducer, so "first" is well-defined
  * there; on a distributed engine it is deterministic only when the
  * input is processed in one ordered partition (mirror the reference's
  * runtime to mirror its output bit-for-bit). For multi-partition runs
  * prefer the order-independent min-url default.
  */
object FirstUrlPostingListAgg extends PostingListAggBase {

  // Scala 2.13 distinctBy keeps the FIRST occurrence
  override protected def pick(arrival: Seq[DocRef]): Seq[DocRef] =
    arrival.distinctBy(_.doc_id)

  /** Typed index build under strict first-url-wins parity. */
  def buildIndex(postings: Dataset[Posting]): Dataset[PostingList] =
    PostingListAgg.buildIndexWith(postings, this)
}
