package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{AnalysisQueries, DedupQueries}

/** Crafted-input references for the r16 pipeline operators (CDC merge,
  * EWMA trend, interval overlap join, line-level boilerplate removal,
  * URL canonicalization) — each case exercises a branch the fixture
  * corpus cannot: tombstone deletion and µs tie-breaks, missing days in
  * the EWMA lookback, hour-boundary and bucket-duplicate session pairs,
  * source-scoped boilerplate with an all-boilerplate doc, and every
  * canonicalization rule individually.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Long, String, Double)]) =
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("tss")).as("t"),
        col("user_id"), col("event_type"), col("value"))

  test("cdcMergeOf: latest change wins, tombstones delete, ties break on event_id") {
    val events = ev(Seq(
      // user 1: normal history, latest = purchase
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 11:00:00", 1L, "purchase", 9.5),
      // user 2: latest change is the tombstone → deleted from the merge
      (3L, "2024-01-01 10:00:00", 2L, "view", 2.0),
      (4L, "2024-01-01 12:00:00", 2L, "error", 0.0),
      // user 3: two changes at the SAME µs — the larger event_id wins
      (5L, "2024-01-01 10:30:00", 3L, "click", 3.0),
      (6L, "2024-01-01 10:30:00", 3L, "view", 4.0),
      // user 4: a tombstone SUPERSEDED by a later change → user survives
      (7L, "2024-01-01 09:00:00", 4L, "error", 0.0),
      (8L, "2024-01-01 09:30:00", 4L, "signup", 5.0)))
    val got = AnalysisQueries.cdcMergeOf(events)
      .as[(Long, Long, String, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 3L, 4L)) // user 2 tombstoned away
    assert(got(1L) === ((1L, 2L, "purchase", 9.5, 2L)))
    assert(got(3L) === ((3L, 6L, "view", 4.0, 2L))) // event_id tie-break
    assert(got(4L) === ((4L, 8L, "signup", 5.0, 2L))) // tombstone superseded
  }

  test("ewmaOf: hand-computed weights over a day spine with a gap") {
    // days d, d+1, d+3 (day d+2 missing): the d+3 window sees d+1 at
    // gap 2 and d at gap 3 — absent days contribute nothing
    val events = ev(Seq(
      (1L, "2024-03-01 05:00:00", 1L, "view", 0.0),
      (2L, "2024-03-01 06:00:00", 1L, "view", 0.0), // day 0: c=2
      (3L, "2024-03-02 05:00:00", 1L, "view", 0.0), // day 1: c=1
      (4L, "2024-03-04 05:00:00", 1L, "view", 0.0),
      (5L, "2024-03-04 06:00:00", 1L, "view", 0.0),
      (6L, "2024-03-04 07:00:00", 1L, "view", 0.0))) // day 3: c=3
    val got = AnalysisQueries.ewmaOf(events)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w = (k: Int) => math.pow(0.7, k) // reference arithmetic, plain doubles
    assert(got.map(g => (g._1, g._2)).toSeq ===
      Seq(("2024-03-01", 2L), ("2024-03-02", 1L), ("2024-03-04", 3L)))
    assert(got(0)._3 === r6(2.0)) // first day: own value
    assert(got(1)._3 === r6((1 * w(0) + 2 * w(1)) / (w(0) + w(1))))
    assert(got(2)._3 === r6((3 * w(0) + 1 * w(2) + 2 * w(3)) / (w(0) + w(2) + w(3))))
  }

  test("intervalJoinOf: hour-boundary candidates found once, touching/zero-length excluded") {
    val events = ev(Seq(
      // user 1: one session 10:50 → 12:10 (spans THREE hour buckets)
      (1L, "2024-01-01 10:50:00", 1L, "view", 0.0),
      (2L, "2024-01-01 11:15:00", 1L, "view", 0.0),
      (3L, "2024-01-01 11:40:00", 1L, "view", 0.0),
      (4L, "2024-01-01 12:10:00", 1L, "view", 0.0),
      // user 2: session 10:55 → 11:20 — shares TWO hour buckets (10 and
      // 11) with user 1's session → two candidate rows that must
      // collapse to ONE reported overlap
      (5L, "2024-01-01 10:55:00", 2L, "view", 0.0),
      (6L, "2024-01-01 11:20:00", 2L, "view", 0.0),
      // user 3: session 12:10 → 12:30 TOUCHES user 1's end exactly —
      // strict overlap excludes it
      (7L, "2024-01-01 12:10:00", 3L, "view", 0.0),
      (8L, "2024-01-01 12:30:00", 3L, "view", 0.0),
      // user 4: single-event (zero-length) session inside user 1's —
      // excluded by the multi-event contract
      (9L, "2024-01-01 11:30:00", 4L, "view", 0.0)))
    val got = AnalysisQueries.intervalJoinOf(events)
      .as[(Long, Long, Long, Long)].collect().toSet
    // overlap(user1, user2) = 11:20 − 10:55 = 25 min, reported ONCE
    assert(got === Set((1L, 2L, 1L, 25L * 60L * 1000000L)))
  }

  test("lineDedupOf: source-scoped boilerplate, partial tail, all-boiler doc") {
    // segment S = exactly 8 tokens; banner enrichment targets even ids,
    // so every crafted id is ODD — the operator's own enrichment is
    // inert and the crafted segments alone decide
    val s = "one two three four five six seven eight"
    val mk = (extra: String) => if (extra.isEmpty) s else s + " " + extra
    val docsDf = Seq(
      // source A: S in 3 docs → boilerplate there
      (1L, "A", mk("tail tokens kept")), // S + 3-token partial tail
      (3L, "A", mk("unique alpha beta gamma delta eps zeta eta")),
      (5L, "A", s), // ALL segments boilerplate → NULL digest
      // source B: S in only 2 docs → kept (scoping: global df is 5)
      (7L, "B", mk("")),
      (9L, "B", mk("other text here")),
      (11L, "B", "completely different words in this document body")).toDF("doc_id", "source", "text")
    val got = DedupQueries.lineDedupOf(docsDf)
      .as[(Long, Long, Long, Long, Option[String])].collect()
      .map(r => r._1 -> r).toMap
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1: 2 segments, S removed, tail kept (3 tokens)
    assert(got(1L) === ((1L, 2L, 1L, 3L, Some(md5hex("tail tokens kept")))))
    // doc 5: everything boilerplate → zero kept, NULL digest
    assert(got(5L) === ((5L, 1L, 1L, 0L, None)))
    // source B docs keep S (df=2 within B < 3) — nothing removed
    assert(got(7L) === ((7L, 1L, 0L, 8L, Some(md5hex(s)))))
    assert(got(9L)._3 === 0L && got(11L)._3 === 0L)
    // doc 3's unique second segment survives with S removed
    assert(got(3L) === ((3L, 2L, 1L, 8L,
      Some(md5hex("unique alpha beta gamma delta eps zeta eta")))))
  }

  test("Pca.topComponent recovers a known principal axis, invariant under repartitioning") {
    // points along the unit axis (0.6, 0.8, 0, …) in 8 dims with a tiny
    // off-axis wobble on dim 3 — the dominant eigenvector is the axis
    val axis = Array(0.6f, 0.8f) ++ Array.fill(6)(0.0f)
    val pts = (0 until 40).map { k =>
      val t = (k - 20) / 4.0f // spread along the axis, mean ≈ 0
      val wobble = if (k % 2 == 0) 0.01f else -0.01f
      val v = axis.map(_ * t)
      v(2) = wobble
      (k.toLong, v)
    }
    val df = pts.toDF("vec_id", "embedding")
    val got = graft.operators.Pca.topComponent(df, dims = 8)
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    val loadings = got.map(_._3)
    assert(math.abs(loadings(0) - 0.6) < 1e-3, s"dim1 loading ${loadings(0)}")
    assert(math.abs(loadings(1) - 0.8) < 1e-3, s"dim2 loading ${loadings(1)}")
    assert(loadings.drop(2).forall(math.abs(_) < 1e-2))
    assert(got.head._5 > 0.99) // essentially all variance on the axis
    // sign convention: largest-|loading| dim positive
    assert(loadings(1) > 0)
    // exact-DECIMAL sums ⇒ bit-identical under any partitioning
    val re = graft.operators.Pca.topComponent(df.repartition(7), dims = 8)
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(re.toSeq === got.toSeq)
  }

  test("Pca.fit deflation: recovers two separated axes in order, orthogonal at 6dp, partition-invariant") {
    // three mutually orthogonal axes with separated variances
    // (≈4.7 ≫ 0.06 ≫ 0.005) — deflation must peel them in order
    val a1 = Array(0.6, 0.8) ++ Array.fill(6)(0.0)
    val a2 = Array(-0.8, 0.6) ++ Array.fill(6)(0.0)
    val a3 = Array(0.0, 0.0, 1.0) ++ Array.fill(5)(0.0)
    val pts = (0 until 60).map { k =>
      val t1 = (k - 30) / 8.0
      val t2 = (k % 7 - 3) / 8.0
      val t3 = (k % 5 - 2) / 20.0
      (k.toLong,
        Array.tabulate(8)(i => (a1(i) * t1 + a2(i) * t2 + a3(i) * t3).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val m = graft.operators.Pca.fit(df, dims = 8, k = 3)
    val vs = m.comps.map(_.v)
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map(t => t._1 * t._2).sum
    // component 1 = the high-variance axis, component 2 = the orthogonal
    assert(math.abs(math.abs(dot(vs(0), a1)) - 1.0) < 1e-2, s"c1 off-axis: ${vs(0).toSeq}")
    assert(math.abs(math.abs(dot(vs(1), a2)) - 1.0) < 1e-2, s"c2 off-axis: ${vs(1).toSeq}")
    assert(math.abs(math.abs(dot(vs(2), a3)) - 1.0) < 1e-2, s"c3 off-axis: ${vs(2).toSeq}")
    // DEFLATION ORTHOGONALITY on the 6dp grid: every pair essentially
    // perpendicular (separated spectrum ⇒ tight)
    for (x <- 0 until 3; y <- x + 1 until 3)
      assert(math.abs(dot(vs(x), vs(y))) < 1e-3,
        s"components ${x + 1},${y + 1} not orthogonal: ${dot(vs(x), vs(y))}")
    // eigenvalues peel in non-increasing order
    assert(m.comps.map(_.eig).sliding(2).forall(p => p.head >= p.last + -1e-9))
    // exact-decimal protocol ⇒ bit-identical under any partitioning
    val re = graft.operators.Pca.fit(df.repartition(7), dims = 8, k = 3)
    assert(re.comps.map(_.v.toSeq) === m.comps.map(_.v.toSeq))
    assert(re.comps.map(_.eig) === m.comps.map(_.eig))
  }

  test("Pca.whiten: whitened coordinates are unit-variance, centered, decorrelated on a separated spectrum") {
    val a1 = Array(0.6, 0.8) ++ Array.fill(6)(0.0)
    val a2 = Array(-0.8, 0.6) ++ Array.fill(6)(0.0)
    val pts = (0 until 60).map { k =>
      val t1 = (k - 30) / 8.0
      val t2 = (k % 7 - 3) / 8.0
      (k.toLong, Array.tabulate(8)(i => (a1(i) * t1 + a2(i) * t2).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val model = graft.operators.Pca.fit(df, dims = 8, k = 2)
    val z = graft.operators.Pca.whiten(df, model, dims = 8)
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    assert(z.length === 60 && z.forall(_._2.length === 2))
    val n = z.length.toDouble
    def col(m: Int) = z.map(_._2(m))
    for (m <- 0 until 2) {
      val mean = col(m).sum / n
      val varz = col(m).map(x => x * x).sum / n
      assert(math.abs(mean) < 1e-3, s"comp ${m + 1} mean $mean")
      assert(math.abs(varz - 1.0) < 0.05, s"comp ${m + 1} variance $varz")
    }
    val cross = col(0).zip(col(1)).map(t => t._1 * t._2).sum / n
    assert(math.abs(cross) < 0.05, s"whitened cross-correlation $cross")
  }

  test("Pca.fit rank-deficiency guard: k beyond the corpus rank fails loudly on the deflation path") {
    // an exactly rank-1 corpus (mass on dim 0 only): component 1 peels
    // the whole spectrum, so component 2's eigenvalue is EXACTLY zero
    // at the 6dp grid — the engine would keep a basis vector while the
    // oracle's 0/0 normalize NaNs, so fit(k > 1) must raise instead
    val rank1 = (0 until 20).map(k =>
      (k.toLong, Array((k - 10) / 4.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Pca.fit(rank1, dims = 4, k = 2)
    }
    assert(e.getMessage.contains("rank-deficient"))
    // k = 1 keeps the legacy contract (deterministic output, eig > 0 here)
    assert(graft.operators.Pca.fit(rank1, dims = 4, k = 1).comps.head.eig > 0)
  }

  test("Pca magnitude guard: an out-of-contract element fails LOUDLY, never wraps (r16 ADVICE)") {
    // |x| = 400 > the ±300 contract: 64·(4e8)² would overflow the Long
    // spill window — the old code wrapped silently below the ~9.2e12
    // longValueExact ceiling
    val bad = Seq((0L, Array(400.0f, 0.0f)), (1L, Array(-1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      graft.operators.Pca.topComponent(bad, dims = 2).collect()
    }
    assert(e.getMessage.contains("magnitude contract") ||
      Option(e.getCause).exists(_.getMessage.contains("magnitude contract")))
    // the boundary itself is inside the contract
    val ok = Seq((0L, Array(300.0f, 0.0f)), (1L, Array(-300.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    assert(graft.operators.Pca.topComponent(ok, dims = 2).count() === 2L)
  }

  test("joinCardinalityChecked: containment formula holds uniform, breaks on hidden skew") {
    import graft.operators.Sketches
    // uniform fan-3 join: est = 100·300/max(ndv) = 300 = exact → in band
    val left = (1L to 100L).map(Tuple1(_)).toDF("k")
    val right = (1L to 100L).flatMap(k => Seq.fill(3)(Tuple1(k))).toDF("k")
    val u = Sketches.joinCardinalityChecked(left, "k", right, "k")
      .as[(Long, Long, Long, Long, Long, Boolean, Boolean, Boolean)].head()
    assert(u === ((100L, 300L, 100L, 100L, 300L, true, true, true)))
    // hidden skew: one hot key carries 1000 of the right side's rows —
    // the uniformity assumption divides the hot mass across 1000 NDVs
    // and underestimates ~500×; the band flag must read FALSE (this is
    // the known CBO failure mode the checked flag exists to surface)
    val lh = Seq(Tuple1(1L)).toDF("k")
    val rh = (Seq.fill(1000)(1L) ++ (2L to 1000L)).map(Tuple1(_)).toDF("k")
    val h = Sketches.joinCardinalityChecked(lh, "k", rh, "k")
      .as[(Long, Long, Long, Long, Long, Boolean, Boolean, Boolean)].head()
    assert(h._5 === 1000L) // true cardinality: the hot key's fan
    assert(!h._8, "skewed join must fall outside the estimate band")
  }

  test("snapshotDiffOf: every diff arm classified; absent-in-both vanishes; short texts pin the truncation subtlety") {
    // text > 40 chars so the modified-rule truncation actually moves
    // the digest — a ≤40-char doc hit by the rule reads 'unchanged'
    // (substr == full text), which the long-text arm here rules out
    val t = ("alpha beta gamma delta " * 4).trim // 95 chars
    val docsDf = Seq(
      (1L, "A", t), // no rule → unchanged
      (3L, "A", t), // %11 = 3 → absent from OLD → added
      (5L, "A", t), // %13 = 5 → absent from NEW → removed
      (7L, "A", t), // %7 = 0 → old text truncated → changed
      (135L, "A", t)) // added AND removed → in NEITHER snapshot → no row
      .toDF("doc_id", "source", "text")
    val got = graft.queries.AnalysisQueries.snapshotDiffOf(docsDf)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("A", "unchanged", 1L), ("A", "added", 1L),
      ("A", "removed", 1L), ("A", "changed", 1L)))
  }

  test("kAnonOf: violating cells counted, exposed users deduped across a type's cells") {
    // type A: (day1, b0) holds 5 users — meets k; (day1, b1) = {1, 2}
    // and (day2, b0) = {2, 3} violate; user 2 is in BOTH violating
    // cells and must count once → exposed = |{1, 2, 3}| = 3
    val events = ev(
      (1L to 5L).map(u => (u, "2024-01-01 10:00:00", u, "A", 5.0)) ++ Seq(
        (6L, "2024-01-01 10:00:00", 1L, "A", 15.0),
        (7L, "2024-01-01 11:00:00", 2L, "A", 15.0),
        (8L, "2024-01-02 10:00:00", 2L, "A", 5.0),
        (9L, "2024-01-02 11:00:00", 3L, "A", 5.0),
        // type B: one singleton cell → violating, one exposed user
        (10L, "2024-01-01 10:00:00", 9L, "B", 5.0)))
    val got = graft.queries.AnalysisQueries.kAnonOf(events)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("A") === (("A", 3L, 2L, 3L)))
    assert(got("B") === (("B", 1L, 1L, 1L)))
  }

  test("pitFeaturesOf: features strictly pre-cutoff, label strictly post, late-born users absent") {
    // cutoff = 2024-01-24 00:00:00 UTC
    val events = ev(Seq(
      // user 1: 3 pre-cutoff events (2 in the trailing week), a
      // purchase inside [cutoff, cutoff+7d) → label true
      (1L, "2024-01-10 09:00:00", 1L, "view", 1.0),
      (2L, "2024-01-20 09:00:00", 1L, "click", 5.0),
      (3L, "2024-01-23 09:00:00", 1L, "view", 2.5),
      (4L, "2024-01-26 09:00:00", 1L, "purchase", 9.0),
      // user 2: born AFTER the cutoff → no feature row at all
      (5L, "2024-01-25 09:00:00", 2L, "view", 1.0),
      // user 3: pre-cutoff activity, purchase OUTSIDE the label week
      (6L, "2024-01-15 09:00:00", 3L, "view", 1.0),
      (7L, "2024-02-01 09:00:00", 3L, "purchase", 9.0)))
    val got = graft.queries.AnalysisQueries.pitFeaturesOf(events)
      .as[(Long, Long, Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 3L))
    // gap: last pre-cutoff event 01-23 09:00 → 0 full days... the µs
    // difference is 15 h = 0 days under integer division
    assert(got(1L) === ((1L, 3L, 2L, 7.5, 0L, true)))
    assert(got(3L) === ((3L, 1L, 0L, 0.0, 8L, false)))
  }

  test("retrievalEval: the quality gate separates index configs (nProbe 1 vs 2)") {
    import graft.operators.Similarity
    import graft.sources.VectorStore
    val dir = "/root/testdata/sf0.001"
    val (assigned, cents) = VectorStore.ivf(spark, dir, nCells = 16, iters = 0)
    val vs = VectorStore.vectors(spark, dir).select("vec_id", "v", "norm")
    val qs = vs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"))
    val exact = Similarity.knnJoin(vs, qs, k = 10, knownQueryCount = Some(10L))
    def meanRecall(nProbe: Int): Double =
      Similarity.retrievalEval(
        Similarity.ivfKnnJoin(assigned, cents, qs, k = 10, nProbe = nProbe),
        exact, k = 10).agg(avg(col("recall"))).head().getDouble(0)
    val (r1, r2) = (meanRecall(1), meanRecall(2))
    // probing more cells can only widen the candidate set per query —
    // the gate must read monotonically, and the 2-probe config must be
    // a usable index on the fixture
    assert(r2 >= r1, s"recall fell when probing more cells: $r1 -> $r2")
    assert(r2 >= 0.5, s"2-probe mean recall unusably low: $r2")
  }

  test("marginPairs: IVF candidate recall vs exact cross-kNN is usable; margin gate separates") {
    import graft.operators.Similarity
    import graft.sources.VectorStore
    val dir = "/root/testdata/sf0.001"
    val (assigned, cents) = VectorStore.ivf(spark, dir, nCells = 16, iters = 0)
    val lab = graft.sources.Tables.tbl(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val asg = assigned.join(lab, "vec_id")
    val aSide = asg.filter(col("label") === 0).drop("label")
    val bSide = asg.filter(col("label") === 1).drop("label")
    val qA = aSide.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("norm").as("qn"))
    // recall-vs-exact: the IVF-probed candidate top-4 against the exact
    // cross-side top-4 (the spec the mining run would gate its index on)
    val exact = Similarity.knnJoin(
      bSide.select("vec_id", "v", "norm"), qA, k = 4, knownQueryCount = Some(64L))
    def recallAt(nProbe: Int): Double = Similarity.retrievalEval(
        Similarity.ivfCrossKnn(bSide, cents, qA, k = 4, nProbe = nProbe),
        exact, k = 4)
      .agg(avg(col("recall"))).head().getDouble(0)
    // a ~46-vector side spread over 16 cells: 2-probe coverage is
    // ~1/8 of the side, so the honest floor is well above random but
    // below dense-index recall; probing more cells must monotonically
    // recover the exact ranking (16-probe = exhaustive = recall 1)
    val (r2, r4, r16) = (recallAt(2), recallAt(4), recallAt(16))
    assert(r2 >= 0.15, s"IVF cross-kNN 2-probe mean recall below floor: $r2")
    assert(r4 >= r2, s"recall fell when probing more cells: $r2 -> $r4")
    assert(r16 === 1.0, s"exhaustive probe must equal exact kNN: $r16")
    // the margin gate must separate: some candidates pass, some fail
    val all = Similarity.marginPairs(aSide, bSide, cents, k = 4, nProbe = 2,
      threshold = Double.NegativeInfinity).collect()
    val kept = Similarity.marginPairs(aSide, bSide, cents, k = 4, nProbe = 2,
      threshold = 1.002).collect()
    assert(all.nonEmpty && kept.nonEmpty && kept.length < all.length,
      s"margin gate degenerate: ${kept.length} of ${all.length}")
  }

  test("retrievalEval: NDCG discounts and IDCG derive from the caller's k (r16 ADVICE)") {
    import graft.operators.Similarity
    // a perfect approx == exact ranking must score NDCG exactly 1.0 at
    // ANY k — with the old k=10-hard-coded table, k=5 read a stale
    // IDCG and k=15 silently zeroed ranks past 10
    for (k <- Seq(5, 10, 15)) {
      val ranks = (1 to k).map(r => (0L, r.toLong, r.toLong))
        .toDF("qid", "vec_id", "rank")
      val exact = ranks.select(col("qid"), col("vec_id"), col("rank"))
      val got = Similarity.retrievalEval(ranks, exact, k)
        .select("recall", "rr", "ndcg").as[(Double, Double, Double)].head()
      assert(got === ((1.0, 1.0, 1.0)), s"perfect ranking at k=$k scored $got")
    }
    // and the discount table itself carries k entries on the 12dp grid
    assert(Similarity.ndcgDiscounts(15).length === 15)
    assert(Similarity.ndcgIdcg(5) < Similarity.ndcgIdcg(10))
  }

  test("r17 plan pins: scalar-broadcast Q11, no forced broadcast in margin mining, exchange-reuse in the BPE sweep") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val dir = "/root/testdata/sf0.001"
    def plan(q: String) = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
    // Q11 shape: the global 1-row relation broadcasts (a 1-row BNLJ is
    // the scalar-subquery plan); never a real cartesian, and the
    // per-part aggregate pre-aggregates map-side
    val ip = plan("q_important_parts")
    assert(PlanScans.nodes(ip) { case j: CartesianProductExec => j }.isEmpty,
      s"q_important_parts must broadcast the 1-row global side:\n$ip")
    assert(ip.toString.contains("partial_sum"),
      s"per-part revenue must pre-aggregate map-side:\n$ip")
    // margin mining: candidate cell joins carry NO FORCED broadcast of
    // the corpus-sized probe relation — the hint is absent by design
    // (ivfCrossKnn), so at scale AQE sizes the strategy; top-k plans as
    // WindowGroupLimit bounded heaps
    val mp = SparkEntry.queries("q_margin_pairs")(spark, dir)
    val analyzed = mp.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"q_margin_pairs must not force a broadcast hint:\n$analyzed")
    assert(mp.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "per-query top-k must plan as bounded heaps")
    // BPE sweep: ONE corpus scan — all three measures (n_bpe, n_words,
    // vocab) fuse into a single aggregate over one exploded relation
    // (a first cut's separate total branch forked the scan under
    // column pruning into three corpus reads)
    val bs = plan("q_bpe_sweep")
    assert(PlanScans.fileScans(bs).size === 1,
      s"q_bpe_sweep must read the corpus exactly once:\n$bs")
  }

  test("r16 plan pins: aggregation-only merges, banded joins, partition-sharing windows") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val dir = "/root/testdata/sf0.001"
    def plan(q: String) = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
    def windows(p: org.apache.spark.sql.execution.SparkPlan) =
      PlanScans.nodes(p) { case w: WindowExec => w }
    def exchanges(p: org.apache.spark.sql.execution.SparkPlan) =
      PlanScans.nodes(p) { case e: ShuffleExchangeExec => e }
    def nestedLoops(p: org.apache.spark.sql.execution.SparkPlan) =
      PlanScans.nodes(p) {
        case j: BroadcastNestedLoopJoinExec => j
        case j: CartesianProductExec => j
      }
    // CDC merge: latest-wins is ONE partial/final max_by aggregate —
    // never a per-key row_number window, exactly one key exchange
    val cdc = plan("q_cdc_merge")
    assert(windows(cdc).isEmpty, "q_cdc_merge must not plan a Window")
    assert(exchanges(cdc).size === 1, s"q_cdc_merge exchanges:\n$cdc")
    // PIT features: one conditional pass — one exchange, no window
    val pit = plan("q_pit_features")
    assert(windows(pit).isEmpty && exchanges(pit).size === 1,
      s"q_pit_features must be one windowless aggregate pass:\n$pit")
    // EWMA: the lookback is a contribution-explode EQUI-join — a
    // `gap BETWEEN` formulation would plan a nested-loop join
    assert(nestedLoops(plan("q_ewma")).isEmpty,
      "q_ewma must not plan a nested-loop/cartesian join")
    // interval join: hour-banded equi-join candidates — never the
    // quadratic non-equi join (which only the ORACLE runs, by design)
    assert(nestedLoops(plan("q_interval_join")).isEmpty,
      "q_interval_join must not plan a nested-loop/cartesian join")
    // grouped percentiles: both windows and the final aggregate share
    // the source partitioning — ONE exchange end to end
    val gp = plan("q_group_percentiles")
    assert(exchanges(gp).size === 1,
      s"q_group_percentiles must reuse the source partitioning:\n$gp")
  }

  test("schema-evolution store: merged schema, NULL back-fill, and gen partition pruning") {
    import graft.queries.AnalysisQueries
    val p = AnalysisQueries.SchemaEvoStore.path(spark, "/root/testdata/sf0.001")
    val df = spark.read.option("mergeSchema", "true").option("basePath", p).parquet(p)
    // the union schema carries the later column; gen is a partition key
    assert(df.columns.toSet === Set("doc_id", "text", "lang", "gen"))
    // generation-1 files predate lang → NULL back-fill, never a crash
    assert(df.filter(col("gen") === 1 && col("lang").isNotNull).count() === 0L)
    assert(df.filter(col("gen") === 2 && col("lang").isNull).count() === 0L)
    // the generation key prunes at planning time like any Hive partition
    val plan = df.filter(col("gen") === 2).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("gen"),
      s"expected gen partition filter in:\n$plan")
  }

  test("IntervalJoin.overlapPairs: band width is caller-set, long intervals match once, fan cap trips loudly") {
    import graft.operators.IntervalJoin
    // A's interval spans MANY bands; B overlaps it near the end; C is
    // disjoint; D same owner as A (never paired)
    val iv = Seq(
      (1L, 1L, 0L, 1000L),     // owner 1: long interval, 0..1000
      (2L, 1L, 950L, 1200L),   // owner 2: overlaps [950, 1000)
      (3L, 1L, 2000L, 2100L),  // owner 3: disjoint
      (1L, 2L, 900L, 980L))    // owner 1 again: same-owner, excluded
      .toDF("owner", "iid", "s_us", "e_us")
    // band = 10 → interval A explodes 101 buckets; the overlapping pair
    // must still surface EXACTLY once despite sharing several buckets
    val got = IntervalJoin.overlapPairs(iv, bandUs = 10L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSet === Set(
      (1L, 1L, 2L, 1L, 0L, 1000L, 950L, 1200L),
      (1L, 2L, 2L, 1L, 900L, 980L, 950L, 1200L)))
    // band choice changes the plan's fan, never the answer
    val wide = IntervalJoin.overlapPairs(iv, bandUs = 100000L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(wide.toSet === got.toSet)
    // the fan contract is LOUD: an interval wider than maxBuckets bands
    // raises instead of silently exploding its task
    val e = intercept[Exception] {
      IntervalJoin.overlapPairs(iv, bandUs = 10L, maxBuckets = 50L).collect()
    }
    assert(e.getMessage.contains("fan contract") ||
      Option(e.getCause).exists(_.getMessage.contains("fan contract")),
      s"unexpected error: ${e.getMessage}")
  }

  test("bad-records quarantine: corrupt lines NULL every data field (partial results pinned off)") {
    // r16 ADVICE: spark.sql.json.enablePartialResults could retain
    // already-parsed top-level fields on some malformed inputs after a
    // jar bump, silently flipping n_parsed/parsed_id_sum. Pin the
    // quarantine identity LOUDLY: every line is parsed XOR corrupt.
    val q = graft.SparkEntry.queries("q_bad_records")
    val r = q(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()(0)
    val (nLines, nParsed, nCorrupt, _) = r
    assert(nCorrupt > 0L, "fixture must contain corrupt lines")
    assert(nParsed === nLines - nCorrupt,
      s"quarantine identity broken: $nParsed parsed of $nLines with " +
        s"$nCorrupt corrupt — a partially-parsed corrupt record leaked data fields")
    // and a corrupt record carries NO data fields at all
    val p = graft.queries.AnalysisQueries.BadRecordsStore.path(spark, "/root/testdata/sf0.001")
    val raw = spark.read
      .schema("doc_id LONG, source STRING, _corrupt_record STRING")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(p)
    assert(raw.filter(col("_corrupt_record").isNotNull &&
      (col("doc_id").isNotNull || col("source").isNotNull)).count() === 0L)
  }

  test("urlCanonOf: every canonicalization rule collapses onto the base URL") {
    // one doc per variant arm (ids 0..3 hit each %4 branch; 0 and 3
    // also get the %3 extra) — every family must collapse to its base
    val docsDf = Seq(
      (0L, "sa", "t"), (1L, "sa", "t"), (2L, "sa", "t"), (3L, "sa", "t"))
      .toDF("doc_id", "source", "text")
    val got = AnalysisQueries.urlCanonOf(docsDf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.length === 1)
    val (_, nUrls, nCanon, maxFam, ratio) = got(0)
    // urls: doc0 base+slash+extra (3), doc1 base+query (2),
    // doc2 base+fragment (2), doc3 base+www (2) + extra (3) → 10 total
    assert(nUrls === 10L)
    assert(nCanon === 4L) // one canonical per doc — every rule collapsed
    assert(maxFam === 3L)
    assert(ratio === 2.5)
  }
}
