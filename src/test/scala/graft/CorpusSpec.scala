package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("hashSample is deterministic and close to the requested fraction") {
    val total = docs.count()
    val a = Corpus.hashSample(docs, "doc_id", 0.5)
    val b = Corpus.hashSample(docs, "doc_id", 0.5)
    val ids = a.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == b.select("doc_id").collect().map(_.getLong(0)).toSet,
      "same seed must select the same rows")
    val frac = ids.size.toDouble / total
    assert(frac > 0.35 && frac < 0.65, s"sampled fraction $frac far from 0.5")
    // different seed -> different (but same-sized-ish) selection
    val c = Corpus.hashSample(docs, "doc_id", 0.5, seed = 99L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c != ids, "different seed should pick a different sample")
  }

  test("stratifiedSample keeps rare strata and downsamples dominant ones") {
    val out = Corpus.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.1, "zh" -> 1.0))
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("zh") == orig("zh"), "rate-1.0 stratum must keep every row")
    assert(kept.getOrElse("en", 0L) < orig("en") / 2, "rate-0.1 stratum must shrink")
    assert(kept("fr") == orig("fr"), "unlisted strata keep defaultRate=1.0")
  }

  test("packSequences: packs respect the token budget and are contiguous per shard") {
    val target = 256L
    val packs = Corpus.packSequences(docs, "doc_id", "text", target, 4)
    // a doc STARTS in the pack where its running total lands, so a pack
    // holds at most target + (max single doc) tokens
    val maxDoc = packs.agg(max("n_tokens")).head().getLong(0)
    val perPack = packs.groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("tok")).collect()
    assert(perPack.forall(_.getLong(2) <= target + maxDoc),
      "pack exceeded budget + one-doc slack")
    // pack ids per shard are 0..max with no gaps (contiguous fill)
    val byShard = packs.select("shard", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    byShard.foreach { case (shard, rows) =>
      val ids = rows.map(_._2).distinct.sorted
      assert(ids.head == 0 && ids.last == ids.length - 1,
        s"shard $shard pack ids not contiguous: ${ids.take(20).mkString(",")}")
    }
  }

  test("dedupSurvivors returns the full min-id row per distinct content") {
    val d = Seq(
      (5L, "same content here", "en", "srcA", 17L),
      (2L, "same content here", "de", "srcB", 17L),
      (9L, "unique content", "fr", "srcC", 14L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Corpus.dedupSurvivors(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSet
    assert(out == Set((2L, "de", "srcB"), (9L, "fr", "srcC")),
      s"survivors wrong: $out")
  }

  test("sampling decisions are row-local: no shuffle in the sampled plan") {
    val p = Corpus.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
  }

  test("contamination counts shared shingles and keeps clean docs with zero") {
    val corpus = Seq(
      (1L, "alpha bravo charlie delta"),   // shares 'alpha bravo charlie' + 'bravo charlie delta'
      (2L, "echo foxtrot golf"),           // clean
      (3L, "alpha bravo charlie")          // exactly one benchmark shingle
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha bravo charlie delta")).toDF("doc_id", "text")
    val got = Corpus.contamination(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((2L, 2L, true)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((1L, 0L, false)), s"doc 2: ${got(2L)}")
    assert(got(3L) == ((1L, 1L, true)), s"doc 3: ${got(3L)}")
  }

  test("contamination plan broadcasts the benchmark side; corpus not shuffled before probe") {
    val p = Corpus.contamination(
      docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
      "doc_id", "text", 3).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"benchmark side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no all-pairs joins:\n$p")
  }

  test("quantileFilter keeps exactly the rows at/above the interpolated quantile") {
    val df = (1L to 8L).map(i => (i, i)).toDF("id", "score")
    // p75 over 1..8: index 0.75*7 = 5.25 -> 6 + 0.25*(7-6) = 6.25
    val upper = Corpus.quantileFilter(df, "score", 0.75)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(upper == Set(7L, 8L), s"got $upper")
    val lower = Corpus.quantileFilter(df, "score", 0.75, keepUpper = false)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(lower == (1L to 6L).toSet, s"got $lower")
  }

  test("chunkSliding windows, overlap, and tail clamping on a known doc") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens, w=4 s=3
      (2L, ""),                                       // empty -> one empty chunk
      (3L, "a b")                                     // shorter than window
    ).toDF("doc_id", "text")
    val got = Corpus.chunkSliding(df, "doc_id", "text", 4, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    // ceil((10-4)/3)+1 = 3 chunks at offsets 0,3,6; last clamps to 4 tokens
    assert(got((1L, 0L)) == ((4L, "t1 t2 t3 t4")))
    assert(got((1L, 1L)) == ((4L, "t4 t5 t6 t7")))
    assert(got((1L, 2L)) == ((4L, "t7 t8 t9 t10")))
    assert(got((2L, 0L)) == ((0L, "")), "empty doc still emits one chunk")
    assert(got((3L, 0L)) == ((2L, "a b")), "short doc -> single clamped chunk")
    assert(got.size == 5, s"unexpected chunk rows: ${got.keys}")
  }

  test("capSources caps dominant sources near maxFrac and keeps small ones whole") {
    // 800 rows of 'big', 100 of 'mid', 20 of 'rare' -> cap at 20% of 920
    val df = ((1L to 800L).map((_, "big")) ++ (1001L to 1100L).map((_, "mid")) ++
      (2001L to 2020L).map((_, "rare"))).toDF("doc_id", "source")
    val kept = Corpus.capSources(df, "doc_id", "source", 0.2)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cap = 0.2 * 920
    assert(kept("mid") == 100L && kept("rare") == 20L,
      s"under-cap sources must keep every row: $kept")
    // hash sampling is approximate: allow 25% relative slack around the cap
    assert(kept("big") < cap * 1.25 && kept("big") > cap * 0.75,
      s"dominant source not capped near $cap: $kept")
    // determinism: same input -> identical selection
    val again = Corpus.capSources(df, "doc_id", "source", 0.2)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("assignSplits is stable: growing the corpus never moves existing docs") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = (1L to 300L).toDF("doc_id")
    val grown = (1L to 1000L).toDF("doc_id")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      Corpus.assignSplits(df, "doc_id", splits)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val before = asMap(small)
    val after = asMap(grown)
    assert(before.forall { case (id, s) => after(id) == s },
      "existing docs must keep their split when the corpus grows")
    val sizes = after.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(sizes("train") > 700 && sizes("train") < 900, s"train share off: $sizes")
    assert(sizes.values.sum == 1000)
  }

  test("shuffleShards: contiguous positions per shard, deterministic, scrambled") {
    val df = (1L to 500L).toDF("doc_id")
    val out = Corpus.shuffleShards(df, "doc_id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 500)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.head == 1L && ps.last == ps.length,
        s"shard $shard positions not contiguous 1..${ps.length}")
    }
    // the scramble must not be id order: within a shard, doc ids at
    // consecutive positions should be far apart for most steps
    val monotone = out.groupBy(_._2).values.flatMap { rows =>
      rows.sortBy(_._3).map(_._1).toSeq.sliding(2).collect { case Seq(a, b) => b == a + 4 }
    }
    assert(monotone.count(identity) < monotone.size / 2,
      "shard order looks like id order, not a scramble")
    val again = Corpus.shuffleShards(df, "doc_id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)), "not deterministic")
  }

  test("repetitionStats multiplicity math on a known doc") {
    val df = Seq(
      (1L, "a b a b a b"),   // 2-grams: ab ba ab ba ab -> 5 total, 2 distinct, max 3
      (2L, "x")              // short doc -> single whole-doc shingle
    ).toDF("doc_id", "text")
    val got = Corpus.repetitionStats(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((5L, 2L, 3L)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((1L, 1L, 1L)), s"doc 2: ${got(2L)}")
  }

  test("boilerplateScore flags shingles shared across many docs") {
    // 10 docs carry the same boilerplate prefix; each has a unique tail.
    // 2-gram windows of "the same header text u<i> v<i>" (6 tokens → 5):
    // "the same", "same header", "header text" shared by all 10 docs;
    // "text u<i>", "u<i> v<i>" unique per doc.
    val df = (1L to 10L)
      .map(i => (i, s"the same header text u$i v$i"))
      .toDF("doc_id", "text")
    val out = Corpus.boilerplateScore(df, "doc_id", "text", 2, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 10)
    out.foreach { case (id, nSh, nBoiler, ratio) =>
      assert(nSh == 5L, s"doc $id distinct 2-grams: $nSh")
      assert(nBoiler == 3L, s"doc $id boilerplate hits: $nBoiler")
      assert(math.abs(ratio - 0.6) < 1e-9, s"doc $id ratio $ratio")
    }
    // raising the df cutoff above the corpus size clears every flag
    val none = Corpus.boilerplateScore(df, "doc_id", "text", 2, 11L)
      .agg(sum(col("n_boiler"))).collect()(0).getLong(0)
    assert(none == 0L, "no shingle reaches a df cutoff above corpus size")
  }

  test("shingleNovelty: first occurrence scores 1, later copies 0, half-new half") {
    // doc 1 introduces its shingles; doc 2 is an exact copy (novelty 0);
    // doc 3 shares a 4-token prefix with doc 1 and adds a new tail.
    // 3-grams of "a b c d e" = {abc, bcd, cde}; doc 3 "a b c d x" =
    // {abc, bcd, cdx} → abc/bcd first seen in doc 1, cdx novel → 1/3.
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),
      (3L, "a b c d x")).toDF("doc_id", "text")
    val out = Corpus.shingleNovelty(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((3L, 3L, 1.0)), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((3L, 0L, 0.0)), s"exact copy must be 0-novel: ${out(2L)}")
    assert(out(3L)._2 == 1L && math.abs(out(3L)._3 - 0.3333) < 1e-9,
      s"doc 3: ${out(3L)}")
  }

  test("budgetSelect fills each source longest-first within the token budget") {
    // src A lengths: 5,4,3 (ids 1,2,3) budget 8 → keep 5 then ~4 fills
    // 9 > 8, so 4 is cut; next group 3 starts at cum_before 9 ≥ 8, cut.
    // Wait: longest-first = 5 (cum 5), 4 (cum 9 > 8 dropped), 3 (group
    // offset 9 ≥ 8, pruned). Kept: just id 1. src B: 2,2 both fit (4 ≤ 8).
    val df = Seq(
      (1L, "a b c d e", "A"), (2L, "a b c d", "A"), (3L, "a b c", "A"),
      (4L, "x y", "B"), (5L, "p q", "B")).toDF("doc_id", "text", "source")
    val out = Corpus.budgetSelect(df, "doc_id", "text", "source", 8L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, "A", 5L, 5L), (4L, "B", 2L, 2L), (5L, "B", 2L, 4L)),
      s"got $out")
    // equal-length ties consume the budget in id order
    val ties = Seq((1L, "a b", "C"), (2L, "c d", "C"), (3L, "e f", "C"))
      .toDF("doc_id", "text", "source")
    val kept = Corpus.budgetSelect(ties, "doc_id", "text", "source", 4L)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"tie-break must favor smaller ids: $kept")
  }

  test("basketPairs counts unordered co-occurring pairs above support") {
    val orders = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 20L), // duplicate item collapses
      (3L, 20L), (3L, 10L),            // order within group irrelevant
      (4L, 10L), (4L, 20L),
      (5L, 99L)                        // singleton basket: no pairs
    ).toDF("ok", "item")
    val got = Corpus.basketPairs(orders, "ok", "item", 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 20L, 4L)), s"got $got")
  }

  test("sourceOverlap: identical sources have jaccard 1, disjoint sources absent") {
    val docs = Seq(
      (1L, "a b c d e", "s1"), (2L, "a b c d e", "s2"), // identical vocab
      (3L, "x y z w v", "s3")                           // disjoint
    ).toDF("doc_id", "text", "source")
    val got = Corpus.sourceOverlap(docs, "source", "text", 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(5))).toSet
    assert(got == Set(("s1", "s2", 1.0)),
      s"only the overlapping pair appears, at jaccard 1: $got")
  }

  test("corpusGate: each rule counts exactly the docs that trip it") {
    // letter-only pads: digits would trip the digit-ratio quality penalty
    val pad = (p: String, n: Int) =>
      Seq.tabulate(n)(i => s"$p${('a' + i).toChar}").mkString(" ")
    val d = Seq(
      // 30 tokens, 5 stopwords -> quality 0.6667, en label: passes all
      (1L, "the a of and is " + pad("u", 25), "en"),
      // 5 tokens: too_short AND low_quality (0.25); es pred == label
      (2L, "el la de que y", "es"),
      // "x z" bigram x3 -> repetitive; no stopwords -> quality 0.5
      // (not "x y": bare "y" is a Spanish marker and would flip langid)
      (3L, "x z x z x z " + pad("v", 24), "en"),
      // en-marker text labeled fr -> off_language
      (4L, "the a of and is " + pad("w", 25), "fr")
    ).toDF("doc_id", "text", "lang")
    val got = Corpus.corpusGate(d, "doc_id", "text", "lang", 30, 0.6, 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("too_short" -> 1L, "low_quality" -> 2L, "repetitive" -> 1L,
      "off_language" -> 1L, "pass" -> 1L), s"got $got")
  }

  test("covarianceMatrix: upper triangle matches hand-computed moments") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(3.0f, 6.0f))
    ).toDF("vec_id", "embedding")
    val got = graft.operators.Embeddings.covarianceMatrix(vecs, "embedding", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // E[x0]=2, E[x1]=4; E[x0^2]=5, E[x0x1]=10, E[x1^2]=20
    assert(got == Map((0L, 0L) -> ((2L, 1.0)), (0L, 1L) -> ((2L, 2.0)),
      (1L, 1L) -> ((2L, 4.0))), s"got $got")
  }

  test("distinctSketch: linear-counting estimate brackets the exact count") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon", "s1"),
      (2L, "alpha beta zeta", "s1"),    // overlaps s1's vocab
      (3L, "solo", "s2")                // single token: estimate exact
    ).toDF("doc_id", "text", "source")
    val got = Corpus.distinctSketch(d, "source", "text", 4096)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val (n1, v1, e1) = got("s1")
    assert(n1 == 6L, s"s1 distinct tokens: $got")
    assert(v1 <= n1 && e1 >= v1, s"sketch invariants violated: $got")
    // 6 tokens in 4096 slots: no collision on this fixed vocab, and the
    // MLE correction is < 0.5, so the estimate is exact
    assert(e1 == 6L, s"got $got")
    assert(got("s2") == ((1L, 1L, 1L)), s"got $got")
    // saturated bitmap (m=1, any token fills it) has no finite estimate
    val sat = Corpus.distinctSketch(d, "source", "text", 1)
      .collect().map(r => r.getString(0) -> r.isNullAt(3)).toMap
    assert(sat.values.forall(identity), s"saturated sketch must be NULL: $sat")
  }

  test("quantileSketch: bin-edge estimate within one bin of the exact percentile") {
    val d = (1 to 100).map(v => (v.toLong, v.toDouble)).toDF("id", "price")
    // $10 bins: median rank 50 lands in bin 5 (values 50..59) -> edge $60;
    // exact interpolated median of 1..100 is 50.5
    val got = Corpus.quantileSketch(d, "price", 1000L, 16, Seq(0.5, 0.99))
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got(0.5) == ((50L, 60.0, 50.5)), s"got $got")
    assert(got(0.99) == ((99L, 100.0, 99.01)), s"got $got")
    got.values.foreach { case (_, est, exact) =>
      assert(est >= exact && est - exact <= 10.0,
        s"estimate must bracket exact within one bin: $got")
    }
  }

  test("cluster-keyed splits keep every near-dup family in one split") {
    val docs500 = docs
    val labels = graft.operators.Dedup.clusters(
      graft.operators.Dedup.ngramJaccardPairs(docs500, "doc_id", "text", 0.6),
      docs500, "doc_id")
    val assigned = Corpus.assignSplits(
      labels.select(col("id").as("doc_id"), col("cluster")),
      "cluster", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val perCluster = assigned.groupBy("cluster")
      .agg(countDistinct(col("split")).as("n_splits"), count(lit(1)).as("n"))
      .collect()
    assert(perCluster.forall(_.getLong(1) == 1L),
      "a near-dup family must never straddle a split boundary")
    assert(perCluster.exists(_.getLong(2) > 1L),
      "test corpus should contain at least one multi-doc family")
  }

  test("packFillReport: deciles from hand-packed fixture, straddler clamps at 10") {
    import spark.implicits._
    // one shard (ids ≡ 0 mod 1): tokens 6,6,6 at target 10 →
    // cum 6,12,18; pack = (cum−6) div 10 → packs 0,0,1:
    // pack0 = 12 tokens (fill 120% → decile 10, 2 docs),
    // pack1 = 6 tokens (decile 6, 1 doc)
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "g h i j k l"), (3L, "m n o p q r"))
      .toDF("doc_id", "text")
    val got = graft.operators.Corpus
      .packFillReport(docs, "doc_id", "text", 10L, 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(10L -> ((1L, 2L, 12L)), 6L -> ((1L, 1L, 6L))), s"got $got")
  }

  test("hllSketch: estimates within 5x the 1.04/sqrt(m) error bound, past linear-counting saturation") {
    import spark.implicits._
    // 20k distinct tokens in one group: an equal-state linear counter
    // (256 slots, same memory as HLL's 256 registers) saturates (every
    // slot filled -> NULL), HLL must still land within a few sigma
    val text = (0 until 20000).map(i => s"tok$i").mkString(" ")
    val df = Seq(("g1", text)).toDF("source", "text")
    val hll = graft.operators.Corpus.hllSketch(df, "source", "text", p = 8).head()
    val (exact, est) = (hll.getLong(1), hll.getLong(2))
    assert(exact == 20000L)
    val sigma = 1.04 / math.sqrt(256) * exact
    assert(math.abs(est - exact) < 5 * sigma, s"est $est vs exact $exact (sigma $sigma)")
    val lin = graft.operators.Corpus.distinctSketch(df, "source", "text", 256).head()
    assert(lin.isNullAt(3), "equal-state linear counting should saturate at 20k distinct")
  }

  test("percentileByKey == built-in percentile() on random grouped doubles") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0 until 4000).map { _ =>
      (s"g${rnd.nextInt(4)}", (rnd.nextInt(500) + 1) * 0.25)
    }
    for (p <- Seq(0.0, 0.5, 0.9, 1.0)) {
      val df = rows.toDF("k", "v")
      val got = graft.operators.Corpus.percentileByKey(df, "k", "v", p, "pct")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = df.groupBy(org.apache.spark.sql.functions.col("k"))
        .agg(org.apache.spark.sql.functions.expr(s"percentile(v, $p)").as("pct"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == want, s"p=$p: $got vs $want")
    }
  }

  test("sourceOverlapHll: singles match hllSketch, union is bounded and merge-consistent") {
    val out = Corpus.sourceOverlapHll(docs, "source", "text").collect()
    assert(out.nonEmpty)
    // single-source estimates must equal the hllSketch estimates for
    // the same corpus (shared register kernel, sparse-z equivalence)
    val sketch = Corpus.hllSketch(docs, "source", "text").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    out.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      assert(r.getLong(3) == sketch(sa), s"est_a for $sa != hllSketch")
      assert(r.getLong(4) == sketch(sb), s"est_b for $sb != hllSketch")
      // union of two sets is at least as big as either, at most the sum
      // (HLL register-max merge preserves these bounds on estimates
      // only approximately — allow the estimator's ~2/sqrt(m) slack)
      val (ea, eb, eu) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val slack = 1.0 + 2.0 / math.sqrt(256.0)
      assert(eu <= (ea + eb) * slack, s"union est $eu >> $ea + $eb")
      assert(eu * slack >= math.max(ea, eb), s"union est $eu << max($ea, $eb)")
      assert(r.getLong(6) >= 0, "intersection estimate clamped at 0")
    }
    // sketch accuracy vs the exact intersection it carries: mean
    // relative error over pairs bounded (HLL inclusion-exclusion is
    // noisy per pair; the MEAN is the meaningful accuracy statement)
    val errs = out.filter(!_.isNullAt(7)).map(r => math.abs(r.getDouble(7)))
    assert(errs.nonEmpty && errs.sum / errs.length < 0.5,
      f"mean |inter_err| ${errs.sum / errs.length}%.3f too large")
  }

  test("spanCorrupt: zero-token and whitespace-only docs yield empty rows, no crash") {
    import spark.implicits._
    // Spark sequence(1, 0) descends ([1, 0]) — unguarded this threw
    // INVALID_ARRAY_INDEX_IN_ELEMENT_AT and one empty doc failed the
    // whole graded query while the DuckDB oracle returned a row
    val rows = Corpus.spanCorrupt(
      Seq((1L, ""), (2L, "   "), (3L, "one two three")).toDF("doc_id", "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(1) == 0L && rows(0).getLong(2) == 0L &&
      rows(0).getString(3) == "" && rows(0).getString(4) == "")
    assert(rows(1).getLong(1) == 0L && rows(1).getString(3) == "")
    assert(rows(2).getLong(1) == 3L)
  }

  test("spanCorrupt: sf3-scale doc ids do not overflow the position hash") {
    import spark.implicits._
    // Regression: unreduced, id·1000003·48271 exceeds Long once doc
    // ids pass ~1.9e8 (the sf3 id stride reaches 2.9e8) and ANSI mode
    // failed the whole graded query with ARITHMETIC_OVERFLOW
    val rows = Corpus.spanCorrupt(
      Seq((290000007L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 8L)
  }

  test("spanCorrupt: compiled kernel equals the declarative formulation") {
    import spark.implicits._
    // the r18 compiled kernel (VectorExprs.SpanCorruptExpr) must be
    // bit-identical to the Column/lambda form the DuckDB oracle
    // replays — corpus docs plus hand-built edges: empty, 1-token,
    // long mask runs (repeated ids hit repeated positions), sf3-scale
    // ids, multi-space text
    val edges = Seq(
      (0L, ""), (1L, "a"), (2L, "a  b   c"), (290000007L, "x y z w v u t s"),
      (7L, (1 to 200).map(i => s"tok$i").mkString(" ")),
      (13L, (1 to 50).map(_ => "same").mkString(" ")))
      .toDF("doc_id", "text")
    for (df <- Seq(docs.limit(200).select(col("doc_id"), col("text")), edges)) {
      val a = Corpus.spanCorrupt(df, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      val b = Corpus.spanCorruptDeclarative(df, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      assert(a.map(_.toString) == b.map(_.toString))
    }
  }

  test("spanCorrupt: splicing targets back into sentinels reconstructs the doc") {
    val out = Corpus.spanCorrupt(docs.limit(50), "doc_id", "text").collect()
    val orig = docs.limit(50).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out.nonEmpty)
    var sawMask = false
    out.foreach { r =>
      val (id, n, nm) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val spans = r.getString(4).split("<X> ").filter(_.nonEmpty)
        .map(_.trim.split(" ").toList).toList
      // walk corrupted, replacing each <X> with the next target span
      var rest = spans
      val rebuilt = r.getString(3).split(" ").filter(_.nonEmpty).flatMap {
        case "<X>" => val h = rest.head; rest = rest.tail; h
        case tok   => List(tok)
      }
      val want = orig(id).split(" ").filter(_.nonEmpty)
      assert(rebuilt.toSeq == want.toSeq, s"doc $id reconstruction failed")
      assert(rest.isEmpty, s"doc $id unused target spans")
      assert(nm <= n && nm == spans.map(_.length).sum)
      if (nm > 0) sawMask = true
    }
    assert(sawMask, "no doc had any masked span — mask rate broken")
  }

  test("weightedSampleReport: deterministic, capped, and on-target overall") {
    val rep = Corpus.weightedSampleReport(docs, "doc_id", "n_chars", "lang", 2000L)
    val a = rep.collect().sortBy(_.getString(0))
    val b = Corpus.weightedSampleReport(docs, "doc_id", "n_chars", "lang", 2000L)
      .collect().sortBy(_.getString(0))
    assert(a.map(_.toSeq.toList).toList == b.map(_.toSeq.toList).toList,
      "same seed must reproduce the exact report")
    val totalKept = a.map(_.getLong(2)).sum
    val totalExpMicro = a.map(_.getLong(3)).sum
    // Horvitz-Thompson: realized total tracks the expected total
    assert(math.abs(totalKept * 1000000L - totalExpMicro)
      <= math.max(200000000L, totalExpMicro / 5),
      s"kept $totalKept vs expected ${totalExpMicro / 1000000.0}")
    // expected mass never exceeds target (p capped at 1) and is
    // positive when the corpus has weight
    assert(totalExpMicro <= 2000L * 1000000L)
    assert(totalExpMicro > 0)
    a.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) * 1000000L - r.getLong(3),
        "gap_micro must be the exact integer identity")
    }
  }

  test("groupSampleTopK: degenerate stratum (95% one key) matches the plain window, spread over tasks") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 20k rows, 19k in one stratum: the ranks (and thus the sample)
    // must be IDENTICAL to the naive per-stratum window while the
    // sort work spreads across range partitions
    val rows = (0L until 20000L).map(i =>
      (i, if (i % 20 == 0) s"s${i % 3}" else "dominant")).toDF("doc_id", "lang")
    val got = Corpus.groupSampleTopK(rows, "doc_id", "lang", 40)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val order = pmod(col("doc_id") * lit(48271L) + lit(11L), lit(2147483647L))
    val naive = rows.withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(order, col("doc_id"))))
      .where(col("rk") <= 40).select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == naive, "skew-safe rank diverged from the window contract")
    val spread = rows.repartitionByRange(32, col("lang"), order, col("doc_id"))
      .where(col("lang") === "dominant")
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .distinct().count()
    assert(spread > 1, s"dominant stratum collapsed to $spread partition(s)")
  }
}
