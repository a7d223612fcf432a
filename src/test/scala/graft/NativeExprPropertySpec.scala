package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.operators.Dedup

/** Property-style checks of the native Catalyst expressions against
  * independent pure-Scala reference implementations over seeded random
  * inputs (deterministic, 100 cases each). The expressions carry the
  * dedup/similarity kernels, so divergence from spec = silent wrong
  * dedup decisions at scale.
  */
class NativeExprPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)
  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet")

  private def randomDoc(): String =
    Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  /** Pure-Scala FNV-1a shingle hash set mirroring ShingleSet's spec. */
  private def refShingleSet(text: String, n: Int): Seq[Long] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val windows =
      if (toks.isEmpty) Seq(Seq.empty[String])
      else if (toks.length >= n) toks.sliding(n).map(_.toSeq).toSeq
      else Seq(toks.toSeq)
    windows.map { w =>
      var h = 0xcbf29ce484222325L
      w.foreach { t =>
        t.getBytes("UTF-8").foreach(b => h = (h ^ (b & 0xffL)) * 0x100000001b3L)
        h = (h ^ 0x20L) * 0x100000001b3L
      }
      h
    }.distinct.sorted
  }

  test("ShingleSet matches the pure-Scala reference on 100 random docs") {
    val docs = (0 until 100).map(i => (i.toLong, randomDoc()))
    val got = docs.toDF("id", "text")
      .select(col("id"), Dedup.hashedShingleSet(col("text"), 3).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refShingleSet(text, 3), s"doc $id: '$text'")
    }
  }

  /** Pure-Scala repetition stats: group the raw STRING shingles (no
    * hashing at all), so the test also covers hash injectivity on
    * real multisets.
    */
  private def refShingleStats(text: String, n: Int): (Long, Long, Long, Long) = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val windows =
      if (toks.isEmpty) Seq("")
      else if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toSeq
      else Seq(toks.mkString(" "))
    val counts = windows.groupBy(identity).map(_._2.size.toLong)
    (windows.size.toLong, counts.size.toLong, counts.max,
      counts.map(c => c * c).sum)
  }

  test("ShingleStats matches string-level multiplicity stats on 100 random docs") {
    // small vocab + short docs force many repeated shingles
    val docs = (0 until 100).map(i => (i.toLong, randomDoc()))
    val got = docs.toDF("id", "text")
      .select(col("id"),
        VectorExprs.shingleStats(
          graft.operators.TextAnalysis.tokens(col("text")), 2).as("s"))
      .select(col("id"), col("s.n_shingles"), col("s.n_distinct"), col("s.max_repeat"),
        col("s.sum_sq"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refShingleStats(text, 2), s"doc $id: '$text'")
    }
  }

  test("BpeTokenCount matches the regexp_extract_all definition on adversarial strings") {
    val gen = new scala.util.Random(42L)
    val alphabet = "abz09 ,.!?-_\n\tÉé中文🙂 ".toCharArray
    val cases = (0 until 200).map { i =>
      (i.toLong, Seq.fill(gen.nextInt(40))(alphabet(gen.nextInt(alphabet.length))).mkString)
    } ++ Seq((1000L, ""), (1001L, "   "), (1002L, "abc123abc"), (1003L, "a1 b2"))
    val df = cases.toDF("id", "text")
    val got = df.select(col("id"),
      VectorExprs.bpeCount(lower(col("text"))).as("native"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("regex"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"id ${r.getLong(0)}: native ${r.getInt(1)} != regex ${r.getInt(2)}")
    }
  }

  test("FrozenVecSum/Min2ByVid == declarative formulations under adversarial partitioning") {
    // the typed aggregates exist for stage count, not semantics: their
    // (update, merge, serialize) path must reproduce the posexplode /
    // min+min_by formulations bit-for-bit at ANY partitioning (merge()
    // runs only when partial aggregation actually splits a group)
    val gen = new scala.util.Random(11L)
    val rows = (0 until 400).map { i =>
      (i.toLong, i.toLong % 7, Array.fill(8)(gen.nextDouble() * 2 - 1))
    }
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("vid", "node", "cv").repartition(parts).cache()
      val fused = df.groupBy(col("node"))
        .agg(graft.functions.VectorAggs.frozenVecSum(col("cv")).as("s"))
        .select(col("node"), col("s.sx"), col("s.nx"))
        .collect().map(r => (r.getLong(0),
          r.getSeq[Long](1).toList, r.getLong(2))).sortBy(_._1).toList
      val ref = df.select(col("node"), posexplode(col("cv")).as(Seq("dim", "x")))
        .groupBy(col("node"), col("dim"))
        .agg(sum(floor(col("x") * lit(1048576.0) + lit(0.5)).cast("long")).as("sx"),
          count(lit(1)).as("nx"))
        .groupBy(col("node"))
        .agg(transform(sort_array(collect_list(struct(col("dim"), col("sx")))),
          t => t.getField("sx")).as("sxs"), max(col("nx")).as("nx"))
        .collect().map(r => (r.getLong(0),
          r.getSeq[Long](1).toList, r.getLong(2))).sortBy(_._1).toList
      assert(fused == ref, s"FrozenVecSum diverges at parts=$parts")
      val seeds = df.groupBy(col("node"))
        .agg(graft.functions.VectorAggs.min2ByVid(col("vid"), col("cv")).as("s2"))
        .select(col("node"), col("s2.c0"), col("s2.c1"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toList,
          Option(r.getSeq[Double](2)).map(_.toList)))
        .sortBy(_._1).toList
      val refSeeds = rows.groupBy(_._2).map { case (n, rs) =>
        val sorted = rs.sortBy(_._1)
        (n, sorted.head._3.toList,
          sorted.lift(1).map(_._3.toList))
      }.toList.sortBy(_._1)
      assert(seeds == refSeeds, s"Min2ByVid diverges at parts=$parts")
      df.unpersist()
    }
    // single-row groups: c1 must be NULL, not a duplicate of c0
    val one = Seq((5L, 0L, Array(1.0, 2.0))).toDF("vid", "node", "cv")
      .groupBy(col("node"))
      .agg(graft.functions.VectorAggs.min2ByVid(col("vid"), col("cv")).as("s2"))
      .select(col("s2.c1")).collect()(0)
    assert(one.isNullAt(0))
  }

  test("BpeMerge native kernel == declarative mergePositions/mergeApply on random runs") {
    val gen = new scala.util.Random(7L)
    // heavy-run alphabet so merge adjacencies (incl. even/odd runs of
    // the same symbol) are common; also a plain-Scala reference fold
    def refMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    val cases = (0 until 300).map { i =>
      val syms = Seq.fill(gen.nextInt(12))(Seq("a", "b", "ab")(gen.nextInt(3)))
      (i.toLong, syms, Seq("a", "b", "ab")(gen.nextInt(3)), Seq("a", "b")(gen.nextInt(2)))
    } :+ ((1000L, Seq.empty[String], "a", "a")) :+ ((1001L, Seq("a"), "a", "a"))
    val df = cases.toDF("id", "syms", "l", "r")
    val got = df.select(col("id"),
      VectorExprs.bpeMerge(col("syms"), col("l"), col("r")).as("native"),
      graft.operators.TextAnalysis.mergeApply(col("syms"),
        graft.operators.TextAnalysis.mergePositions(col("syms"), col("l"), col("r")),
        col("l"), col("r")).as("decl"))
      .collect()
    val byId = cases.map(c => c._1 -> c).toMap
    got.foreach { row =>
      val (_, syms, l, r) = byId(row.getLong(0))
      val expect = refMerge(syms, l, r)
      assert(row.getSeq[String](1) == expect,
        s"id ${row.getLong(0)}: native ${row.getSeq[String](1)} != $expect")
      assert(row.getSeq[String](2) == expect,
        s"id ${row.getLong(0)}: declarative ${row.getSeq[String](2)} != $expect")
    }
    // NULL rule (absent merge step) is the identity in the native path
    val nullRule = Seq((1L, Seq("a", "a"))).toDF("id", "syms")
      .select(VectorExprs.bpeMerge(col("syms"),
        lit(null).cast("string"), lit(null).cast("string")).as("out"))
      .collect()(0).getSeq[String](0)
    assert(nullRule == Seq("a", "a"))
  }

  test("SortedIntersectSize matches Scala set intersection on 100 random pairs") {
    val cases = (0 until 100).map { i =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(30).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(30).toLong).distinct.sorted
      (i.toLong, a, b)
    }
    val got = cases.toDF("id", "a", "b")
      .select(col("id"), VectorExprs.sortedIntersectSize(col("a"), col("b")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    cases.foreach { case (id, a, b) =>
      assert(got(id) == (a.toSet & b.toSet).size, s"case $id: $a vs $b")
    }
  }

  test("DotProduct matches a sequential Scala fold exactly on 100 random vectors") {
    val cases = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() - 0.5), Array.fill(64)(rnd.nextDouble() - 0.5))
    }
    val got = cases.toDF("id", "a", "b")
      .select(col("id"), VectorExprs.dotp(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cases.foreach { case (id, a, b) =>
      var s = 0.0
      var k = 0
      while (k < 64) { s += a(k) * b(k); k += 1 }
      assert(got(id) == s, s"case $id") // bitwise equality
    }
  }

  test("MinHashSig: same input same signature; supersets only lower slots") {
    val base = Seq.fill(40)(rnd.nextLong()).distinct
    val superset = base ++ Seq.fill(10)(rnd.nextLong())
    val df = Seq((1L, base), (2L, base), (3L, superset)).toDF("id", "hs")
      .select(col("id"), VectorExprs.minhashSig(col("hs"), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(df(1L) == df(2L), "identical input must give identical signature")
    df(1L).zip(df(3L)).foreach { case (s1, s3) =>
      assert(s3 <= s1, "adding elements can only lower a min-hash slot")
    }
  }

  test("minhash jaccard estimate tracks true jaccard on random doc pairs") {
    // signature agreement rate ≈ J within sampling error (128 slots)
    val doc1 = Seq.fill(60)(rnd.nextLong()).distinct
    val overlap = doc1.take(30)
    val doc2 = (overlap ++ Seq.fill(30)(rnd.nextLong())).distinct
    val trueJ = (doc1.toSet & doc2.toSet).size.toDouble / (doc1.toSet | doc2.toSet).size
    val sigs = Seq((1L, doc1), (2L, doc2)).toDF("id", "hs")
      .select(col("id"), VectorExprs.minhashSig(col("hs"), 128).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agree = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b } / 128.0
    assert(math.abs(agree - trueJ) < 0.15, s"estimate $agree vs true $trueJ")
  }

  test("L2Normalize matches a sequential Scala reference bitwise; zero vector maps to zero") {
    val cases = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() - 0.5))
    } :+ (100L, Array.fill(64)(0.0))
    val got = cases.toDF("id", "v")
      .select(col("id"), VectorExprs.l2Normalize(col("v")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    cases.foreach { case (id, v) =>
      var s = 0.0
      var k = 0
      while (k < v.length) { s += v(k) * v(k); k += 1 }
      val norm = math.sqrt(s)
      val ref = if (norm == 0.0) v.map(_ => 0.0).toSeq else v.map(_ / norm).toSeq
      assert(got(id) == ref, s"case $id") // bitwise equality per component
    }
  }

  test("QuantizeI8 codes are in [-127,127], recover sign/magnitude order, zero vector -> zeros") {
    val cases = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 10 - 5))
    } :+ (100L, Array.fill(64)(0.0))
    val got = cases.toDF("id", "v")
      .select(col("id"), VectorExprs.quantizeI8(col("v")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    cases.foreach { case (id, v) =>
      val m = v.map(math.abs).max
      val s = if (m == 0.0) 0.0 else 127.0 / m
      val ref = v.map(x => math.floor(x * s + 0.5).toInt).toSeq
      assert(got(id) == ref, s"case $id")
      assert(got(id).forall(q => q >= -127 && q <= 127), s"range case $id")
    }
    assert(got(100L).forall(_ == 0), "zero vector must quantize to zeros")
  }

  test("quantization round-trip error is bounded by scale/2 per component") {
    val v = Array.fill(64)(rnd.nextDouble() * 4 - 2)
    val m = v.map(math.abs).max
    val s = 127.0 / m
    val row = Seq((1L, v)).toDF("id", "v")
      .select(VectorExprs.quantizeI8(col("v")).as("q")).collect().head
    val q = row.getSeq[Int](0)
    v.zip(q).foreach { case (x, qi) =>
      assert(math.abs(qi / s - x) <= 0.5 / s + 1e-12, s"component $x -> $qi")
    }
  }

  test("parseImageMeta never throws on arbitrary bytes (1000 fuzz cases)") {
    // a header parser fed corpus-scale binary columns will see every
    // possible byte soup; malformed media must be data, not exceptions
    import graft.operators.Multimodal
    (0 until 1000).foreach { i =>
      val len = rnd.nextInt(64)
      val bs = new Array[Byte](len)
      rnd.nextBytes(bs)
      // bias half the cases toward magic prefixes so the PNG/JPEG
      // branches (not just the unknown fallthrough) get fuzzed
      if (i % 4 == 0 && len >= 4) {
        bs(0) = 0x89.toByte; bs(1) = 0x50; bs(2) = 0x4E; bs(3) = 0x47
      } else if (i % 4 == 1 && len >= 3) {
        bs(0) = 0xFF.toByte; bs(1) = 0xD8.toByte; bs(2) = 0xFF.toByte
      }
      val (kind, w, h) = Multimodal.parseImageMeta(bs)
      assert(Set("png", "jpeg", "unknown")(kind))
      assert(w >= 0 && h >= 0, s"negative dims on case $i")
    }
  }

  test("hyperplaneBucketAt on random vectors: bit b at offset o == global bit o+b") {
    (0 until 50).foreach { _ =>
      val v = Array.fill(16)(rnd.nextDouble() * 2 - 1)
      val row = Seq(Tuple1(v)).toDF("v").select(
        VectorExprs.hyperplaneBucket(col("v"), 40).as("wide"),
        VectorExprs.hyperplaneBucketAt(col("v"), 8, 17).as("slice"))
        .collect().head
      assert(row.getLong(1) == ((row.getLong(0) >> 17) & 0xFFL))
    }
  }
}
