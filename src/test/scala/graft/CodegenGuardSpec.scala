package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Guards against the silent-interpreted-fallback failure class that hit
  * BENCH_r03: a native expression whose generated Java does not compile
  * makes Spark fall back to interpreted evaluation with only an ERROR log
  * — correctness holds, throughput collapses (q_curate ran 7× slow).
  *
  * Two layers:
  *   1. a static lint on every native expression's generated snippet —
  *      no line may begin with '|', because Spark operator templates
  *      splice snippets into `s"""…""".stripMargin` strings
  *      (ProjectExec.doConsume et al.) and stripMargin runs AFTER
  *      interpolation, silently eating the spliced '|' (the exact
  *      BENCH_r03 bug, Md5Prefix32's byte-packing line);
  *   2. an execution pass per expression under CODEGEN_ONLY factory mode
  *      with whole-stage fallback disabled, so a compile failure is a
  *      test failure instead of a 25× slowdown.
  */
class CodegenGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def nativeExprs: Map[String, Expression] = Map(
    "md5_prefix32" -> graft.plans.Md5Prefix32(
      BoundReference(0, ArrayType(StringType), nullable = true)),
    "minhash_sigs" -> graft.plans.MinHashSigs(
      BoundReference(0, ArrayType(LongType), nullable = true),
      Literal(24), Literal(3)),
    "word_shingles" -> graft.plans.WordShingles(
      BoundReference(0, ArrayType(StringType), nullable = true), Literal(3)),
    "hamming_hex" -> graft.plans.HammingHex(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, StringType, nullable = true)),
    "rolling_hashes" -> graft.plans.RollingHashes(
      BoundReference(0, StringType, nullable = true), Literal(4)),
    "simhash_hex" -> graft.plans.SimHashHex(
      BoundReference(0, ArrayType(StringType), nullable = true)),
    "dot_f64" -> graft.plans.DotF64(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, ArrayType(DoubleType), nullable = true)),
    "run_stats" -> graft.plans.RunStats(
      BoundReference(0, ArrayType(StringType), nullable = true)),
    "entropy_stats" -> graft.plans.EntropyStats(
      BoundReference(0, ArrayType(StringType), nullable = true)),
    "gram_buckets" -> graft.plans.GramBuckets(
      BoundReference(0, StringType, nullable = true), Literal(3), Literal(16)),
    "bloom_contains" -> {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(64, 0.01)
      bf.putString("seed")
      graft.plans.BloomContains(
        Literal(graft.plans.BloomContains.serialize(bf), BinaryType),
        BoundReference(0, StringType, nullable = true))
    })

  test("no generated snippet line begins with '|' (stripMargin splice hazard)") {
    spark // force session init (codegen touches SQLConf.get)
    for ((name, expr) <- nativeExprs) {
      val ctx = new CodegenContext
      val code = expr.genCode(ctx).code.toString
      val bad = code.linesIterator.zipWithIndex
        .filter { case (l, _) => l.dropWhile(_.isWhitespace).startsWith("|") }
        .toSeq
      assert(bad.isEmpty,
        s"$name generated code has line(s) starting with '|' — enclosing " +
          s"stripMargin templates will corrupt them: $bad")
    }
  }

  /** Run `body` with codegen forced (compile failures throw instead of
    * falling back to interpreted eval / non-wholestage plans).
    */
  private def withCodegenOnly[A](body: => A): A = {
    val conf = spark.conf
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally {
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
    }
  }

  // NOTE: every execution check below reads the real corpus — a
  // Seq(...).toDF source would be folded by ConvertToLocalRelation at
  // optimize time (interpreted eval) and never exercise codegen.

  test("md5_prefix32 + minhash_sigs + word_shingles compile and run CODEGEN_ONLY") {
    withCodegenOnly {
      val docs = graft.sources.Corpus.documents(spark, "/root/testdata/sf0.001")
      // shingleSets → word_shingles; hashValues → md5_prefix32;
      // minhashBands → minhash_sigs — the full q_dedup_near hash pipeline
      // at real corpus widths; a wrong-compile throws before any row
      val hv = graft.operators.Dedup.hashValues(
        graft.operators.Dedup.shingleSets(docs, 3))
      val sigs = graft.operators.Dedup.minhashBands(hv, 24, 3)
      assert(sigs.count() > 0)
    }
  }

  test("hamming_hex + rolling_hashes + simhash_hex compile and run CODEGEN_ONLY") {
    withCodegenOnly {
      val docs = graft.sources.Corpus.documents(spark, "/root/testdata/sf0.001")
      // simhashPairs fingerprints with simhash_hex and verifies
      // candidates with hamming_hex
      val pairs = graft.operators.Dedup.simhashPairs(docs)
      assert(pairs.count() >= 0)
      val fp = docs.select(
        graft.plans.RollingHashes.rollingHashes(col("text"), 16).as("h"))
      assert(fp.selectExpr("sum(size(h))").head().getLong(0) > 0)
    }
  }

  test("dot_f64 compiles and runs CODEGEN_ONLY") {
    withCodegenOnly {
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      // the q_sim_topk inner loop at real embedding widths
      val top = graft.operators.Similarity.topK(emb, queryId = 0L, k = 5)
      assert(top.count() === 5)
    }
  }

  test("bloom_contains compiles and runs CODEGEN_ONLY") {
    withCodegenOnly {
      val docs = graft.sources.Corpus.documents(spark, "/root/testdata/sf0.001")
      // the q_bloom_decontaminate probe at real corpus widths: bench =
      // the eval slice, corpus scan filtered by the codegen'd probe
      val sh = graft.operators.Dedup.shingleSets(docs, 3)
      val flagged = graft.operators.Dedup.decontaminateBloom(
        sh.filter(col("doc_id") % 97 =!= 0), sh.filter(col("doc_id") % 97 === 0))
      assert(flagged.count() > 0)
    }
  }

  test("gram_buckets compiles and runs CODEGEN_ONLY") {
    withCodegenOnly {
      val docs = graft.sources.Corpus.documents(spark, "/root/testdata/sf0.001")
      // the q_quality_ft featurizer at real corpus widths: every
      // histogram must hold exactly the gram count and d cells
      val toks = graft.functions.Text.tokenize(col("text"))
      val s = array_join(toks, " ")
      val r = docs.select(length(s).as("len"),
        graft.plans.GramBuckets.gramBuckets(s, 3, 16).as("h"))
      assert(r.filter(size(col("h")) =!= 16).count() === 0)
      // total mass = number of 3-gram windows, row by row
      assert(r.filter(aggregate(col("h"), lit(0L), (a, x) => a + x)
        =!= greatest(col("len") - 2, lit(0))).count() === 0)
    }
  }

  test("run_stats compiles and runs CODEGEN_ONLY") {
    withCodegenOnly {
      val docs = graft.sources.Corpus.documents(spark, "/root/testdata/sf0.001")
      // the q_repetition projection at real corpus widths
      val (top2, dup5) = graft.functions.TextAnalysis.repetitionFracs(
        graft.functions.Text.tokenize(col("text")))
      val r = docs.select(top2.as("t"), dup5.as("d"))
      assert(r.agg(sum(col("t") + col("d"))).head().getDouble(0) > 0)
    }
  }

  test("entropy_stats compiles and runs CODEGEN_ONLY") {
    withCodegenOnly {
      val docs = graft.sources.Corpus.documents(spark, "/root/testdata/sf0.001")
      // the q_entropy projection at real corpus widths
      val es = graft.plans.EntropyStats.entropyStats(
        graft.functions.Text.tokenize(col("text"))).as("es")
      val r = docs.select(es).select(col("es.dl"), col("es.s_micros"))
      assert(r.agg(sum(col("dl") + col("s_micros"))).head().getLong(0) > 0)
    }
  }
}
