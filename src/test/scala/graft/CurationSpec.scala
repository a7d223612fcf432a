package graft

import graft.operators.Curation

import org.apache.spark.sql.functions._

import scala.util.Random

/** Curation-family properties: Bloom filter soundness (zero false
  * negatives) and a measured false-positive bound, Gopher rule gate
  * semantics, BM25 ranking sanity and determinism across partition
  * layouts, blocked-ER symmetry with brute force, and Z-order key
  * bijectivity + locality of the file layout.
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("NB quality classifier: total output, prior-only zero-token docs, consistency") {
    val docs = Seq(
      (1L, "the a of and is it that for good day"), // gopher keep
      (2L, "1 1 1 1 1 1"),                          // digit-heavy: fail
      (3L, ""),                                     // zero tokens: fail
      (4L, "the of is in it and a that for morning walk")
    ).toDF("doc_id", "text")
    val out = Curation.nbQualityClassifier(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3), r.getBoolean(4),
          r.getBoolean(5)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "every doc scores, even token-free ones")
    // zero-evidence doc scores exactly the class prior
    val (lab3, n3, mbits3, pred3, agree3) = out(3L)
    assert(!lab3 && n3 == 0L)
    // prior = floor(log2((d_pos+1)/(d_neg+1))*1e6 + 0.5), d_pos=2 d_neg=2
    assert(mbits3 == math.floor(math.log(3.0 / 3.0) / math.log(2.0) * 1e6 + 0.5).toLong)
    assert(!pred3 && agree3 == (pred3 == lab3))
    // n_toks is the token-instance count; agree is consistent everywhere
    assert(out(1L)._2 == 10L)
    out.values.foreach { case (lab, _, mbits, pred, agree) =>
      assert(pred == (mbits > 0) && agree == (pred == lab))
    }
    // deterministic under re-run
    val again = Curation.nbQualityClassifier(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    out.foreach { case (id, (_, _, mbits, _, _)) => assert(again(id) == mbits) }
  }

  test("bloom: every inserted key probes true (no false negatives)") {
    val keys = (0L until 5000L).map(_ * 7919L)
    val df = keys.toDF("k")
    val bits = Curation.bloomBuild(df, col("k"), 1 << 17, 5)
    val hit = df.where(Curation.bloomMightContain(bits, 1 << 17, 5, col("k"))).count()
    assert(hit == keys.size)
  }

  test("bloom: false-positive rate on disjoint keys is near (kn/m)^k") {
    val m = 1 << 17
    val k = 5
    val inserted = (0L until 5000L).map(_ * 2L).toDF("k") // even keys
    val bits = Curation.bloomBuild(inserted, col("k"), m, k)
    val probes = (0L until 20000L).map(_ * 2L + 1L).toDF("k") // odd keys
    val fp = probes.where(Curation.bloomMightContain(bits, m, k, col("k"))).count()
    val expected = math.pow(k.toDouble * 5000 / m, k)
    // generous 5x headroom over the analytic estimate (~0.0008)
    assert(fp.toDouble / 20000 < math.max(5 * expected, 0.01),
      s"fp rate ${fp.toDouble / 20000} vs expected ~$expected")
  }

  test("bloom semi join equals exact semi join (pruning never drops a match)") {
    val rnd = new Random(7)
    val fact = (0 until 20000).map(i => (rnd.nextInt(1000).toLong, i)).toDF("key", "v")
    val dim = (0 until 300).map(i => (i * 3L)).toDF("key").where(col("key") % 2 === 0)
    val bits = Curation.bloomBuild(dim, col("key"), 1 << 16, 5)
    val viaBloom = fact
      .where(Curation.bloomMightContain(bits, 1 << 16, 5, col("key")))
      .join(dim, Seq("key"), "left_semi").count()
    val exact = fact.join(dim, Seq("key"), "left_semi").count()
    assert(viaBloom == exact)
  }

  test("gopher rules: keep is the conjunction and rules fire as designed") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog and it runs for fun"),
      (2L, "a b"), // too few tokens
      (3L, "zz " * 200 + "the of and is to"), // dup-ratio collapse
      (4L, "the 12345 67890 11111 22222 33333 44444 55555 of rate is 99999")
    ).toDF("doc_id", "text")
    val out = docs.select((col("doc_id") +: Curation.gopherFlags(col("text"))): _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(out(1L).fieldIndex("keep")))
    assert(!out(2L).getBoolean(out(2L).fieldIndex("r_word_count")))
    assert(!out(3L).getBoolean(out(3L).fieldIndex("r_dup")))
    assert(!out(4L).getBoolean(out(4L).fieldIndex("r_digit")))
    Seq(2L, 3L, 4L).foreach(id =>
      assert(!out(id).getBoolean(out(id).fieldIndex("keep")), s"doc $id"))
  }

  test("bm25: exact-match doc outranks partial, absent terms score zero") {
    val docs = Seq(
      (1L, "spark hash merge window join scan"),
      (2L, "spark table scan row batch fast slow key value part"),
      (3L, "completely unrelated words about nothing at all here")
    ).toDF("doc_id", "text")
    val out = Curation.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "hash", "merge", "window"), 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // 3 filtered (score 0)
    assert(out(0).getLong(1) > out(1).getLong(1))
  }

  test("bm25: scores identical across partition layouts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Curation.bm25TopK(docs.repartition(1), "doc_id", "text",
      Seq("spark", "hash"), 20).collect().toSeq
    val b = Curation.bm25TopK(docs.repartition(7), "doc_id", "text",
      Seq("spark", "hash"), 20).collect().toSeq
    assert(a == b)
  }

  test("sorted-neighborhood ER matches the in-memory reference, never crosses blocks") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Curation.blockedPairs(docs, "doc_id", "text",
      Seq("lang", "source"), prefixLen = 32, maxDist = 18, window = 8)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    val rows = docs.select("doc_id", "lang", "source", "text")
      .as[(Long, String, String, String)].collect()
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    // reference: per block, sort by (prefix, id), compare pairs within
    // 8 rank positions — the exact SNM contract
    val want = rows.groupBy(r => (r._2, r._3)).values.flatMap { block =>
      val sorted = block.map(r => (r._1, r._4.take(32))).sortBy(x => (x._2, x._1))
      for {
        i <- sorted.indices; j <- (i + 1) until math.min(i + 9, sorted.length)
        d = lev(sorted(i)._2, sorted(j)._2) if d <= 18
      } yield (math.min(sorted(i)._1, sorted(j)._1),
        math.max(sorted(i)._1, sorted(j)._1), d)
    }.toSet
    assert(got == want)
    // a window >= every block size degenerates to the full blocked
    // join: the exact duplicate pair must always be caught
    val dup = got.filter(_._3 == 0)
    val fullDup = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._2 == b._2 && a._3 == b._3 &&
        a._4.take(32) == b._4.take(32)
    } yield (a._1, b._1, 0)).toSet
    assert(dup == fullDup, "SNM missed an exact-duplicate pair (sorts adjacent)")
  }

  test("blockRank: degenerate block (one key = 100% of rows) ranks exactly, spread over many tasks") {
    // 20k rows all sharing ONE block key: the old per-block window
    // would sort all of them in a single task; blockRank must spread
    // the sort across range partitions and still produce the exact
    // window ranks
    val rnd = new Random(13)
    val rows = (0 until 20000).map { i =>
      (i.toLong, rnd.alphanumeric.take(12).mkString, "only-block")
    }.toDF("doc_id", "pref", "blk")
    val ranked = Curation.blockRank(rows, Seq("blk"), "doc_id")
    val got = ranked.select("doc_id", "rn").as[(Long, Long)].collect().toMap
    val want = rows.select("doc_id", "pref").as[(Long, String)].collect()
      .sortBy { case (id, pref) => (pref, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    assert(got == want, "blockRank diverged from the window-rank contract")
    // bounded per-task work: the single block's rows occupy >1 range
    // partition (the local-rank sort never sees the whole block)
    val spread = rows.repartitionByRange(32, col("blk"), col("pref"), col("doc_id"))
      .select(spark_partition_id().as("p")).distinct().count()
    assert(spread > 1, s"degenerate block collapsed to $spread partition(s)")
  }

  test("join size estimate: exact side is the true cardinality, CMS never undercounts") {
    val rnd = new Random(11)
    val left = (0 until 5000).map(_ => rnd.nextInt(400).toLong).toDF("k")
    val right = (0 until 1000).map(_ => rnd.nextInt(400).toLong).toDF("k")
    val row = Curation.joinSizeEstimate(left, col("k"), right, col("k"), 4, 1024).head()
    val (exact, est) = (row.getLong(0), row.getLong(1))
    val lc = left.collect().map(_.getLong(0)).groupBy(identity).view.mapValues(_.length)
    val rc = right.collect().map(_.getLong(0)).groupBy(identity).view.mapValues(_.length)
    val brute = lc.map { case (k, n) => n.toLong * rc.getOrElse(k, 0) }.sum
    assert(exact == brute, s"exact $exact != brute $brute")
    assert(est >= exact, "CMS inner product must upper-bound the join size")
    // 400 keys in 1024 slots: collisions inflate, but not catastrophically
    assert(est <= exact * 3, s"estimate $est implausibly far from $exact")
  }

  test("join size estimate: disjoint keys give exact 0") {
    val left = (0L until 100L).toDF("k")
    val right = (1000L until 1100L).toDF("k")
    val row = Curation.joinSizeEstimate(left, col("k"), right, col("k"), 4, 1024).head()
    assert(row.getLong(0) == 0L)
    assert(row.isNullAt(2), "err is null when the exact count is zero")
  }

  test("zorder key is a bijection on the 8-bit grid and interleaves correctly") {
    val grid = (for (x <- 0 until 256; y <- 0 until 256) yield (x, y)).toDF("x", "y")
    val keyed = grid.select(col("x"), col("y"),
      Curation.zOrderKey(col("x"), col("y"), bits = 8).as("z"))
    assert(keyed.select("z").distinct().count() == 256L * 256L)
    // hand-check a known value: x=0b0011, y=0b0101 -> z interleaves to 0b00100111
    val z = keyed.where(col("x") === 3 && col("y") === 5).head().getLong(2)
    assert(z == 0x27L, s"z(3,5) = $z")
  }

  test("zorder layout: per-file spans are rectangles far narrower than the domain") {
    val n = 1 << 14
    val rows = (0 until n).map { i =>
      val h = i * 2654435761L
      ((h & 0xffff).toLong, ((h >> 16) & 0xffff).toLong)
    }.toDF("x", "y")
    val files = Curation.zOrderLayout(rows, col("x"), col("y"), fileBits = 4)
      .collect()
    assert(files.nonEmpty)
    files.foreach { r =>
      val (xm, xx) = (r.getLong(2), r.getLong(3))
      val (ym, yx) = (r.getLong(4), r.getLong(5))
      // top-4-bit z bucket = 2 bits of x and 2 of y: span <= 2^14 each
      assert(xx - xm < (1 << 14), s"x span ${xx - xm}")
      assert(yx - ym < (1 << 14), s"y span ${yx - ym}")
    }
  }
}
