package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again today"), // near dup of 1
    (4L, "completely different content about spark partitions and shuffles here"),
    (5L, "unrelated words describing window functions and watermark semantics now")
  ).toDF("doc_id", "text")

  test("substringDupStats: interval-union coverage matches hand computation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),       // shares "a b c","b c d" with doc 2
      (2L, "a b c d x"),
      (3L, "z z z z z z z"),   // 5 identical windows: within-doc dups
      (4L, "q r s")            // single unique whole window
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.substringDupStats(docs, "doc_id", "text", 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // docs 1/2: dup windows at pos 0,1 -> covered = 3 + min(3,1) = 4 of 5
    assert(got(1L) == ((5L, 3L, 2L, 0.8)), s"got $got")
    assert(got(2L) == ((5L, 3L, 2L, 0.8)))
    // doc 3: ps=[0..4] -> covered = 3 + 4*1 = 7 of 7
    assert(got(3L) == ((7L, 5L, 5L, 1.0)))
    assert(got(4L) == ((3L, 1L, 0L, 0.0)))
  }

  test("clustersIncremental: delta links merge prior families without re-mining") {
    import spark.implicits._
    // yesterday: families {1,2,3} and {7,8}; singletons 10, 20
    val prev = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L,
      10L -> 10L, 20L -> 20L).toDF("id", "cluster")
    // today: 20 joins {7,8}; a bridge 3-7 merges the two families
    val newPairs = Seq((7L, 20L), (3L, 7L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 7L, 8L, 10L, 20L).toDF("doc_id")
    val got = graft.operators.Dedup
      .clustersIncremental(prev, newPairs, ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 8L -> 1L,
      20L -> 1L, 10L -> 10L), s"got $got")
  }

  test("clusterSizeReport: family-size histogram with exact removable mass") {
    import spark.implicits._
    // families: {1,2,3} (size 3), {7,8} (size 2), singletons 10, 11
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L,
      10L -> 10L, 11L -> 11L).toDF("id", "cluster")
    val got = graft.operators.Dedup.clusterSizeReport(labels)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 2L, 0L)),   // 2 singleton families, nothing removable
      2L -> ((1L, 2L, 1L)),
      3L -> ((1L, 3L, 2L))), s"got $got")
  }

  test("NFC dedup folds composed/decomposed twins the plain chain misses") {
    import graft.operators.Dedup
    // same sentence, composed U+00E9 vs decomposed e + U+0301: raw
    // canonicalization strips the composed char whole but keeps the
    // decomposed ASCII base letter, so the twins hash apart; NFC-first
    // folds them to one survivor
    val docs = Seq((1L, "x caf\u00e9"), (2L, "x cafe\u0301"))
      .toDF("doc_id", "text")
    assert(Dedup.exactNormalized(docs, "doc_id", "text").count() == 2)
    val nfc = Dedup.exactNormalizedNfc(docs, "doc_id", "text").collect()
    assert(nfc.length == 1 && nfc.head.getLong(1) == 1L
      && nfc.head.getLong(2) == 2L, s"got ${nfc.toSeq}")
  }

  test("exact dedup keeps one survivor per distinct content") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .select("doc_id", "n_copies").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("exactIncremental keeps only batch content unseen in the existing corpus") {
    import spark.implicits._
    val existing = Seq((100L, "known content"), (101L, "other known")).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "known content"),  // already in corpus -> dropped
      (12L, "fresh content"),  // new, unique -> survives
      (14L, "fresh dupe"), (13L, "fresh dupe") // new, min-id 13 survives with 2 copies
    ).toDF("doc_id", "text")
    val out = Dedup.exactIncremental(batch, existing, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(12L -> 1L, 13L -> 2L), s"got $out")
  }

  test("clusterSurvivors picks max score, ties to min id, counts members") {
    import spark.implicits._
    val d = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), // cluster 1: 2 and 3 tie on score -> 2 wins
      (7L, 5L),                        // singleton
      (8L, 9L), (9L, 12L)              // cluster 8: 9 wins outright
    ).toDF("doc_id", "score")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 8L), (9L, 8L))
      .toDF("id", "cluster")
    val out = Dedup.clusterSurvivors(labels, d, "doc_id", "score")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((2L, 30L, 3L)),
      7L -> ((7L, 5L, 1L)),
      8L -> ((9L, 12L, 2L))), s"got $out")
  }

  test("minhash LSH finds exact and near duplicates, skips distinct docs") {
    val pairs = Dedup.minHashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact dup pair missed")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)), "near dup pair missed")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "false positive with distinct doc")
  }

  test("minhash agrees with exact ngram jaccard on real documents") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val mh = Dedup.minHashNearDups(d, "doc_id", "text", 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex = Dedup.ngramJaccardPairs(d, "doc_id", "text", 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == ex, s"minhash=$mh exact=$ex")
  }

  test("minhash plan contains no cartesian product (bucketed join only)") {
    val plan = Dedup.minHashNearDups(docs, "doc_id", "text", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
  }

  test("ngram jaccard computes correct coefficient") {
    val two = Seq(
      (1L, "a b c d e"), // shingles: abc bcd cde
      (2L, "a b c d x")  // shingles: abc bcd cdx -> intersect 2, union 4 -> J=0.5
    ).toDF("doc_id", "text")
    val rows = Dedup.ngramJaccardPairs(two, "doc_id", "text", 0.4).collect()
    assert(rows.length == 1)
    assert(math.abs(rows.head.getAs[Double]("jaccard") - 0.5) < 1e-12)
  }

  test("simhash: near-identical docs collide, distinct docs don't") {
    val pairs = Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "identical docs must have hamming 0")
    assert(!pairs.exists(p => p._2 == 4L && p._1 != 4L || p._1 == 4L),
      "distinct doc should not be within hamming 3")
  }

  test("simhash of identical content is identical (deterministic)") {
    val sh = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(4L))
  }

  test("clusters: connected components from pair lists (chain and singleton)") {
    import spark.implicits._
    // chain 1-2-3 plus pair 10-11 plus singleton 20
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val out = Dedup.clusters(pairs, ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("exact128 groups identically to exact on duplicate content") {
    val out = Dedup.exact128(docs, "doc_id", "text")
      .select("doc_id", "n_copies").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("clusters: maxIters caps propagation (long chain partially converges)") {
    import spark.implicits._
    val chain = (1L to 5L).sliding(2).map(w => (w(0), w(1))).toSeq.toDF("id_a", "id_b")
    val ids = (1L to 5L).toDF("doc_id")
    // maxIters=0 = just the pre-pass (neighbor-min + pointer jump):
    // 3 reaches 1 via its label's label, 4/5 land on their
    // neighbor-min's jumped label
    val zero = Dedup.clusters(chain, ids, "doc_id", maxIters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
    // the pre-pass buys a round: one loop iteration now finishes the
    // 5-chain (pre-round-1 labels reach distance ≤2, the round + jump
    // close the rest)
    val one = Dedup.clusters(chain, ids, "doc_id", maxIters = 1)
      .collect().map(r => r.getLong(1)).distinct
    assert(one.toSeq == Seq(1L))
    val full = Dedup.clusters(chain, ids, "doc_id", maxIters = 10)
      .collect().map(r => r.getLong(1)).distinct
    assert(full.toSeq == Seq(1L)) // fully converged: single component
  }

  test("minHashNearDupsIncremental links batch docs to corpus, never corpus to itself") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // corpus-internal dup
      (3L, "completely different content about spark physical plans")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1 and 2
      (11L, "novel text that matches nothing in the accumulated corpus")).toDF("doc_id", "text")
    val out = Dedup.minHashNearDupsIncremental(batch, corpus, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 1L), (10L, 2L)),
      s"expected batch->corpus links only, got $out")
  }

  test("clusters: pointer jumping converges a 64-node chain in <=8 rounds") {
    import spark.implicits._
    // plain min-label propagation needs 63 rounds for this worst-case
    // path graph; the jump makes depth shrink superlinearly — the
    // large-component guard for web-scale duplicate clusters
    val chain = (1L to 64L).sliding(2).map(w => (w(0), w(1))).toSeq.toDF("id_a", "id_b")
    val ids = (1L to 64L).toDF("doc_id")
    val out = Dedup.clusters(chain, ids, "doc_id", maxIters = 8)
      .collect().map(r => r.getLong(1)).distinct
    assert(out.toSeq == Seq(1L), s"chain not fully converged: ${out.toSeq}")
  }

  test("substringDedupApply keeps first occurrence, strips repeats, leaves unique docs alone") {
    val run = (1 to 20).map(i => s"dup$i").mkString(" ")   // 20-token duplicated run
    val uniqA = (1 to 10).map(i => s"ua$i").mkString(" ")
    val uniqB = (1 to 10).map(i => s"ub$i").mkString(" ")
    val docs = Seq(
      (1L, s"$uniqA $run"),         // first occurrence of the run
      (2L, s"$run $uniqB"),         // repeat: run must vanish, tail survives
      (3L, "totally unique text with enough tokens to stand alone")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedupApply(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 wins every window of the run -> unchanged
    assert(out(1L).getString(3) == s"$uniqA $run", "winner doc must keep its text")
    // doc 2 loses all 20 run tokens (the 5 dup windows tile the run),
    // keeps its unique tail
    assert(out(2L).getString(3) == uniqB,
      s"repeat doc kept: ${out(2L).getString(3)}")
    assert(out(2L).getLong(2) == 10L)
    // doc 3 untouched
    assert(out(3L).getString(3) == "totally unique text with enough tokens to stand alone")
    // within-doc repeat: the second copy of a run inside ONE doc goes too
    val self = Seq((7L, s"$run middle filler tokens here $run")).toDF("doc_id", "text")
    val s7 = Dedup.substringDedupApply(self, "doc_id", "text", 16).head()
    assert(s7.getString(3).startsWith(run), "first in-doc copy survives")
    assert(!s7.getString(3).drop(run.length).contains("dup1 dup2"),
      s"second in-doc copy not removed: ${s7.getString(3)}")
  }

  test("lineDedupApply: global first-occurrence wins, order-preserving reassembly") {
    import spark.implicits._
    // 2-token lines: doc 1 = [a b][c d], doc 2 = [c d][e f] (line [c d]
    // duplicated across docs), doc 3 = [a b][a b] (within-doc dup),
    // doc 4 = [c d] alone (loses everything to doc 1)
    val docs = Seq(
      (1L, "a b c d"), (2L, "c d e f"), (3L, "a b a b"), (4L, "c d")
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedupApply(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 2L, "a b\nc d")))      // owns both lines
    assert(got(2L) == ((2L, 1L, "e f")))           // [c d] lost to doc 1
    assert(got(3L) == ((2L, 0L, "")))              // both copies of [a b] lost
    assert(got(4L) == ((1L, 0L, "")))              // whole doc was a dup line
  }

  test("lineDedupApply: a short tail line keeps its exact remainder tokens") {
    import spark.implicits._
    val docs = Seq((9L, "p q r s t")).toDF("doc_id", "text") // lines [p q][r s][t]
    val r = Dedup.lineDedupApply(docs, "doc_id", "text", 2).head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getString(3) == "p q\nr s\nt")
  }

  test("lineDedupApply: zero-token docs yield zero lines, not phantom empties") {
    import spark.implicits._
    // sequence(1, 0) DESCENDS in Spark — unguarded, each empty doc
    // would manufacture two phantom '' lines that join the global
    // winner election (one doc would report n_kept=1) and diverge
    // from the oracle's generate_series(1, 0) = []
    val docs = Seq((1L, ""), (2L, "   "), (3L, "a b")).toDF("doc_id", "text")
    val got = Dedup.lineDedupApply(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((0L, 0L, "")), s"empty doc: ${got(1L)}")
    assert(got(2L) == ((0L, 0L, "")), s"whitespace doc: ${got(2L)}")
    assert(got(3L) == ((1L, 1L, "a b")))
  }
}
