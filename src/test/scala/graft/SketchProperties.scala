package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.Sketches

/** Property invariants for the sketch aggregators' DETERMINISTIC
  * guarantees — the theorems the r11 checked projections (and their
  * DuckDB oracles) rely on — over arbitrary streams, capacities, and
  * partitionings. Pure state-level checks (reduce/merge on the
  * aggregator objects directly, no Spark jobs), so hundreds of cases run
  * in milliseconds; the corpus-level oracle covers the DataFrame wiring.
  */
object SketchProperties extends Properties("Sketches") {

  private val key = Gen.oneOf((1 to 20).map(i => s"k$i"))
  // skewed streams: a hot key block prepended to a random tail, then
  // shuffled — exercises both the decrement path and the merge cap
  private val streamGen: Gen[List[String]] = for {
    hot <- Gen.choose(0, 60)
    hotKey <- key
    tail <- Gen.choose(0, 120).flatMap(n => Gen.listOfN(n, key))
    shuffled <- Gen.const(scala.util.Random.shuffle(List.fill(hot)(hotKey) ++ tail))
  } yield shuffled

  private val capGen = Gen.choose(1, 8)

  /** Split a stream at arbitrary points — the distributed partials
    * shape shared by every merge theorem here.
    */
  private def splitParts(stream: List[String], cuts: List[Int]): List[List[String]] = {
    val sorted = cuts.map(c => math.abs(c % (stream.length + 1))).sorted.distinct
    (0 :: sorted ::: List(stream.length)).distinct.sorted
      .sliding(2).collect { case List(a, b) if b > a => stream.slice(a, b) }
      .toList match {
      case Nil => List(stream)
      case ps => ps
    }
  }

  /** Fold a stream into MG partial states split at arbitrary points,
    * then merge — the distributed execution shape.
    */
  private def mgRun(stream: List[String], cap: Int,
                    cuts: List[Int]): Sketches.MGState = {
    val agg = new Sketches.MisraGriesAgg(cap)
    splitParts(stream, cuts).map(p => p.foldLeft(agg.zero)(agg.reduce))
      .reduceOption(agg.merge).getOrElse(agg.zero)
  }

  property("Bloom: OR-merge over any split is BIT-EXACT vs the single-pass build") =
    forAll(streamGen, Gen.listOf(Gen.choose(0, 200))) { (stream, cuts) =>
      // the theorem StreamingSketch's bloom family rests on: per-part
      // filters with identical geometry OR-merge to the filter of the
      // union stream, serialized-byte-identical — so the incremental
      // store's guarantee projection is indistinguishable from a batch
      // build's (no false negatives regardless of how ingestion split)
      def fresh() = org.apache.spark.util.sketch.BloomFilter.create(256, 0.01)
      def ser(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream(); bf.writeTo(o); o.toByteArray
      }
      val single = fresh()
      stream.foreach(single.putString)
      val merged = splitParts(stream, cuts)
        .map { p => val f = fresh(); p.foreach(f.putString); f }
        .foldLeft(fresh())((a, b) => a.mergeInPlace(b))
      java.util.Arrays.equals(ser(single), ser(merged)) &&
        stream.forall(merged.mightContainString)
    }

  property("MG: completeness + bounded undercount + exact n, any split") =
    forAll(streamGen, capGen, Gen.listOf(Gen.choose(0, 200))) { (stream, cap, cuts) =>
      val state = mgRun(stream, cap, cuts)
      val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = stream.length.toLong
      val floor = n / (cap + 1L)
      val complete = exact.forall { case (k, c) =>
        c <= floor || state.counters.contains(k)
      }
      val sound = state.counters.forall { case (k, w) =>
        val e = exact.getOrElse(k, 0L)
        w <= e && e - w <= floor
      }
      state.n == n && complete && sound && state.counters.size <= cap
    }

  property("CMS: est >= exact for every key, any split; total in last slot") =
    forAll(streamGen, Gen.choose(1, 4), Gen.oneOf(16, 64, 256),
           Gen.listOf(Gen.choose(0, 200))) { (stream, depth, width, cuts) =>
      val agg = new Sketches.CountMinAgg(depth, width)
      val parts = {
        val sorted = cuts.map(c => math.abs(c % (stream.length + 1))).sorted.distinct
        (0 :: sorted ::: List(stream.length)).distinct.sorted
          .sliding(2).collect { case List(a, b) if b > a => stream.slice(a, b) }
          .toList match {
          case Nil => List(stream)
          case ps => ps
        }
      }
      val sketch = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
        .reduceOption(agg.merge).getOrElse(agg.zero)
      val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val estOk = exact.forall { case (k, c) => agg.estimate(sketch, k) >= c }
      val absentOk = agg.estimate(sketch, "never-seen-key") >= 0
      estOk && absentOk && sketch.last == stream.length.toLong
    }
}
