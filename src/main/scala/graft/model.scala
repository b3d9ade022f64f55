package graft

/** Typed data model (SURVEY §1.3): case classes backing the `Dataset[T]`
  * core API. `DataFrame` remains the relational surface; these encoders
  * give compile-time safety where pipelines are composed in Scala.
  */
object model {

  /** A corpus document: dense positional id, source url, extracted text. */
  final case class Doc(doc_id: Long, url: String, text: String)

  /** The reference's fundamental row (`mapper/src/processor.py:191-192`):
    * one per unique (term, doc).
    */
  final case class Posting(term: String, doc_id: Long, url: String)

  /** One occurrence inside a posting list. */
  final case class DocRef(doc_id: Long, url: String)

  /** Final index row (`reducer/src/processor.py:98-110`): term with its
    * doc_id-sorted, deduplicated posting list.
    */
  final case class PostingList(term: String, postings: Seq[DocRef])
}
