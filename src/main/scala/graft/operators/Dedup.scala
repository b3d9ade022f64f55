package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Deduplication operators for large-scale corpus curation — exact,
  * MinHash-LSH near-dup (with n-gram-Jaccard verification), and SimHash
  * fingerprints. None of these exist in the reference (its R3 dedupe is
  * per-(term, doc) distinct inside the index build,
  * `reducer/src/processor.py:69-77`); they are the ⊕ LLM-pipeline
  * extensions from SURVEY §2.2.
  *
  * Scale design rules baked in:
  *   - NEVER all-pairs: near-dup candidates come from LSH band buckets
  *     (`groupBy(band, signature)`), so the join is linear in bucket mass,
  *     not quadratic in corpus size.
  *   - All hashing is built on `md5` over strings — a codegen'd built-in
  *     with identical output in any engine, which keeps every operator
  *     DuckDB-oracle-checkable bit-for-bit (no engine-private hash seeds).
  *   - Signatures are computed map-side in one projection per document;
  *     the only shuffles are the band-bucket exchange and the tiny
  *     candidate-pair verify join.
  */
object Dedup {

  /** Exact dedup on normalized text: fingerprint = md5(normalize(text)).
    * One shuffle (the fingerprint window); output marks every row with its
    * group's canonical (minimum) doc_id so callers can either filter
    * `is_dup` or keep the canonical representative.
    */
  def exact(docs: DataFrame): DataFrame = {
    val fp = docs.select(col("doc_id"), md5(Text.normalize(col("text"))).as("fp"))
    val w = Window.partitionBy("fp")
    fp.withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
  }

  /** Distinct word-n-gram shingle sets per document; documents shorter than
    * `n` tokens produce an empty set and are excluded (they cannot carry a
    * MinHash signature).
    */
  def shingleSets(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), array_distinct(Text.shingles(col("text"), n)).as("sh"))
      .filter(size(col("sh")) > 0)

  /** MinHash band signatures: for band i, sig_i = min over shingles of
    * md5("i:" || shingle). One row per (doc, band). The signature
    * computation is a pure map-side projection over the shingle array.
    */
  def minhashBands(shingles: DataFrame, numBands: Int): DataFrame = {
    val bands = array((0 until numBands).map { i =>
      struct(
        lit(i).as("band"),
        array_min(transform(col("sh"), s => md5(concat(lit(s"$i:"), s)))).as("sig"))
    }: _*)
    shingles
      .select(col("doc_id"), explode(bands).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Near-duplicate pairs via MinHash-LSH + exact n-gram-Jaccard verify.
    *
    * 1. bucket: docs sharing any band signature become candidates
    *    (`groupBy`-shaped self-join on (band, sig) — never all-pairs);
    * 2. verify: exact Jaccard over the distinct shingle sets, keep pairs
    *    ≥ `threshold`.
    *
    * With band size r=1 and b bands, recall for true Jaccard J is
    * 1-(1-J)^b (b=12, J=0.5 → 0.9998). For adversarial corpora with hot
    * shingles, raise r (band key = concat of r minhashes) to trade recall
    * for bucket-size robustness; candidate skew is also AQE-handled since
    * the verify join keys are the pair's doc_ids.
    */
  def nearDuplicates(docs: DataFrame, n: Int = 3, numBands: Int = 12,
                     threshold: Double = 0.5): DataFrame = {
    val sh = shingleSets(docs, n)
    val sigs = minhashBands(sh, numBands)
    val cands = sigs.as("a")
      .join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val jac = (size(array_intersect(col("sa"), col("sb"))).cast("double") /
      size(array_union(col("sa"), col("sb"))))
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash fingerprint per document as a 16-char hex string.
    *
    * Per distinct term: take the first 16 hex nibbles of md5(term) (64
    * bits). Per bit position: majority vote across the document's terms
    * (strict majority sets the bit; ties clear it). The heavy part is a
    * single groupBy (doc_id, nibble position) aggregation — one shuffle of
    * |terms per doc| × 16 narrow rows; everything else is projection.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val hexChars = "0123456789abcdef"
    val perTerm = docs
      .select(col("doc_id"), explode(Text.terms(col("text"))).as("term"))
      .select(col("doc_id"), substring(md5(col("term")), 1, 16).as("h"))
    // nibble value 0..15 of this term at hex position p, decoded from the
    // ascii code of the hex char ('0'-'9' → 0-9, 'a'-'f' → 10-15).
    val withV = perTerm
      .select(col("doc_id"), explode(sequence(lit(0), lit(15))).as("p"), col("h"))
      .withColumn("c", ascii(col("h").substr(col("p") + 1, lit(1))))
      .withColumn("v", when(col("c") <= 57, col("c") - 48).otherwise(col("c") - 87))
    val agg = withV.groupBy("doc_id", "p").agg(
      count(lit(1)).as("n"),
      sum(floor(col("v") / 8) % 2).as("s3"),
      sum(floor(col("v") / 4) % 2).as("s2"),
      sum(floor(col("v") / 2) % 2).as("s1"),
      sum(col("v") % 2).as("s0"))
    def bit(s: Column, n: Column): Column = when(s * 2 > n, 1).otherwise(0)
    val nib = agg.select(col("doc_id"), col("p"),
      (bit(col("s3"), col("n")) * 8 + bit(col("s2"), col("n")) * 4 +
        bit(col("s1"), col("n")) * 2 + bit(col("s0"), col("n"))).as("nv"))
    nib
      .select(col("doc_id"), struct(col("p"), lit(hexChars).substr(col("nv") + 1, lit(1)).as("c")).as("pc"))
      .groupBy("doc_id")
      .agg(array_join(transform(sort_array(collect_list(col("pc"))), x => x.getField("c")), "")
        .as("simhash"))
  }
}
