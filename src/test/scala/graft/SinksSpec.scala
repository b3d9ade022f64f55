package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.InvertedIndex
import graft.sources.Sinks

class SinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "u1", "the cat sat"),
    (2L, "u2", "the dog ran"),
    (3L, "u3", "cat and dog played")
  ).toDF("doc_id", "url", "text")

  test("K2 parquet sink round-trips and the lookup plan prunes buckets") {
    val path = Files.createTempDirectory("graft_sink").toString + "/idx"
    Sinks.writeIndex(InvertedIndex.postings(docs), "t_sink_spec", path, buckets = 8)
    val back = spark.table("t_sink_spec")
    assert(back.count() === 7) // cat,sat ×(1); dog,ran; cat,dog,played
    val lookup = InvertedIndex.lookup(back, "cat")
    assert(lookup.as[(Long, String)].collect().map(_._1).sorted === Seq(1L, 3L))
    val plan = lookup.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"), s"no bucket pruning in:\n$plan")
    assert(!plan.toLowerCase.contains("exchange"), "point lookup must not shuffle")
  }

  test("K2 JSON envelope has the reference shape") {
    val out = Files.createTempDirectory("graft_json").toString + "/index.json"
    Sinks.writeJsonEnvelope(InvertedIndex.index(docs), out)
    val txt = Files.readString(Paths.get(out))
    // reference shape: {"metadata": {...num_terms...}, "index": {term: [{doc_id, url}...]}}
    assert(txt.startsWith("""{"metadata": {"creation_time":"""))
    assert(txt.contains(""""num_terms": 5"""))
    assert(txt.contains(""""cat":[{"doc_id":1,"url":"u1"},{"doc_id":3,"url":"u3"}]"""))
  }

  test("JSON envelope round-trips: write then read equals the in-memory index") {
    val out = Files.createTempDirectory("graft_rt").toString + "/index.json"
    val idx = InvertedIndex.index(docs)
    Sinks.writeJsonEnvelope(idx, out)
    val back = Sinks.readJsonEnvelope(spark, out)
      .as[(String, Seq[(Long, String)])].collect().toMap
    val orig = idx.as[(String, Seq[(Long, String)])].collect().toMap
    assert(back === orig)
  }

  test("partitioned sink: partition filter prunes directories at planning time") {
    val path = Files.createTempDirectory("graft_part").toString + "/docs"
    val df = Seq(
      (1L, "en", "hello"), (2L, "en", "world"), (3L, "de", "hallo"), (4L, "fr", "salut")
    ).toDF("doc_id", "lang", "text")
    Sinks.writePartitioned(df, path, partitionCol = "lang", sortCol = "doc_id")
    val back = spark.read.parquet(path).filter($"lang" === "en")
    assert(back.select("doc_id").as[Long].collect().sorted === Seq(1L, 2L))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), s"no partition pruning:\n$plan")
    // partition pruning is directory-level: only the lang=en files are listed
    assert(!plan.toLowerCase.contains("exchange"))
  }

  test("K1 raw mapper envelope round-trips and carries reference metadata") {
    val out = Files.createTempDirectory("graft_k1").toString + "/mapper_3_part0.json"
    val postings = InvertedIndex.postings(docs)
    Sinks.writeMapperEnvelope(postings, mapperId = 3, out)
    val txt = Files.readString(Paths.get(out))
    assert(txt.contains(""""mapper_id": 3"""))
    assert(txt.contains(""""num_terms": 7"""))
    assert(txt.contains(""""creation_time""""))
    val back = Sinks.readMapperEnvelope(spark, out)
      .as[(String, Long, String)].collect().toSet
    assert(back === postings.as[(String, Long, String)].collect().toSet)
  }

  test("K1 shuffled envelope groups occurrences per term and round-trips") {
    val out = Files.createTempDirectory("graft_k1s").toString + "/shuffled_mapper_3.json"
    val postings = InvertedIndex.postings(docs)
    Sinks.writeShuffledEnvelope(postings, mapperId = 3, out)
    val txt = Files.readString(Paths.get(out))
    assert(txt.contains(""""shuffled": true"""))
    assert(txt.contains(""""unique_terms": 5"""))
    assert(txt.contains(""""num_terms": 7"""))
    assert(txt.contains(""""shuffle_time""""))
    // grouped shape: one entry per term with its occurrence list
    assert(txt.contains(""""cat","occurrences":[{"doc_id":1,"url":"u1"},{"doc_id":3,"url":"u3"}]"""))
    val back = Sinks.readShuffledEnvelope(spark, out)
      .as[(String, Long, String)].collect().toSet
    assert(back === postings.as[(String, Long, String)].collect().toSet)
  }

  test("K1 envelopes of an EMPTY posting relation are valid, not an NPE") {
    val dir = Files.createTempDirectory("graft_k1e").toString
    val empty = docs.filter($"doc_id" < 0)
    Sinks.writeMapperEnvelope(InvertedIndex.postings(empty), 1, s"$dir/raw.json")
    Sinks.writeShuffledEnvelope(InvertedIndex.postings(empty), 1, s"$dir/shuf.json")
    assert(Files.readString(Paths.get(s"$dir/raw.json")).contains(""""num_terms": 0"""))
    val shuf = Files.readString(Paths.get(s"$dir/shuf.json"))
    assert(shuf.contains(""""num_terms": 0""") && shuf.contains(""""unique_terms": 0"""))
    assert(Sinks.readShuffledEnvelope(spark, s"$dir/shuf.json").count() === 0)
  }

  test("IndexStore builds once and serves bucket-pruned boolean queries") {
    val p1 = graft.sources.IndexStore.postings(spark, "/root/testdata/sf0.001")
    val p2 = graft.sources.IndexStore.postings(spark, "/root/testdata/sf0.001")
    assert(p1.count() === p2.count())
    val plan = p1.filter($"term" === "spark").queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 32"), s"no pruning in:\n$plan")
  }
}
