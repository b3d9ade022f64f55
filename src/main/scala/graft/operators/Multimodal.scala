package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling (⊕ LLM-pipeline): image/audio/video
  * payloads travel as opaque `binary` columns with a typed metadata
  * struct alongside; compute-heavy decode runs batched per partition.
  *
  * What is REAL here (and tested): the schema contract, the byte-level
  * operators (size/digest/magic-byte sniffing/frame slicing — all
  * codegen'd built-ins), and the `mapPartitions` decode plumbing with its
  * per-partition initialization and fixed feature shape.
  *
  * What is a STUB: `decodeFeaturesStub`'s math. No image/audio codec
  * ships in this container, so the "decode" is a deterministic byte
  * histogram standing in for a real `decoder.decode(bytes)` call; a
  * deployment swaps exactly that one line (the partition-local `codec`
  * value) for a JNI/ffi codec handle, keeping the batching, schema, and
  * lifecycle unchanged.
  */
object Multimodal {

  /** Wrap a binary payload with typed metadata: byte length, md5 digest,
    * and a sniffed format from magic bytes (the real detection shape —
    * extend the `when` chain per format). Pure projections, no shuffle.
    */
  def withMeta(df: DataFrame, payload: Column): DataFrame = {
    val magic = hex(substring(payload, 1, 4))
    df.withColumn("meta", struct(
      length(payload).cast("long").as("n_bytes"),
      md5(payload).as("digest"),
      when(magic.startsWith("FFD8"), "jpeg")
        .when(magic.startsWith("89504E47"), "png")
        .when(magic.startsWith("52494646"), "riff")
        .otherwise("unknown").as("format")))
  }

  /** k evenly-spaced fixed-width binary slices ("frames") of a payload —
    * the video/audio frame-sampling shape, as a pure column expression.
    */
  def frameSample(payload: Column, k: Int, frameBytes: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i => {
      val step = greatest((length(payload) - frameBytes) / math.max(1, k - 1), lit(0))
      substring(payload, (i * step + 1).cast("int"), lit(frameBytes))
    })

  /** Batched per-partition decode: `(id, payload)` → fixed-dim feature
    * vector. The codec is initialized once per partition (the expensive
    * part with a real decoder); rows stream through it.
    *
    * STUB: features are a normalized 16-bin byte histogram — a
    * deterministic fake with the correct shape/lifecycle, NOT a real
    * decoder (none exists in this environment).
    */
  def decodeFeaturesStub(df: DataFrame, dims: Int = 16,
                         batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // partition-local "codec" — swap this for a real decoder handle.
        // The BATCH signature is the real contract: hardware decoders and
        // vectorized runtimes amortize per-call overhead across a batch,
        // so rows flow through in `batchSize` groups (same shape a Pandas
        // UDF sees its Arrow batches in), never one call per row.
        val codecBatch: Seq[Array[Byte]] => Seq[Array[Float]] = _.map { bytes =>
          val hist = new Array[Float](dims)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) % dims) += 1f; i += 1 }
          val n = math.max(1, bytes.length).toFloat
          hist.map(_ / n)
        }
        it.grouped(batchSize).flatMap { batch =>
          val feats = codecBatch(batch.map(b => Option(b._2).getOrElse(Array.empty[Byte])))
          batch.map(_._1).zip(feats)
        }
      }
      .toDF("doc_id", "features")
  }
}
