package graft

import org.apache.spark.sql.functions._

/** End-to-end scenarios mirroring /root/reference/tests/test_integration.py. */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("ETL pattern: extract-filter-shape (test_etl_pattern)") {
    val raw = Seq(
      ("Alice", 25, 50000), ("Bob", 30, 60000),
      ("Charlie", 35, 70000), ("David", 28, 55000)
    ).toDF("name", "age", "salary")
    val (rows, _) = Pipeline(raw)
      .transform(_.filter(col("age") > 28 && col("salary") > 55000)
        .map(col("name")))
      .toList()
    assert(rows.map(_.getString(0)).sorted == Seq("Bob", "Charlie"))
  }

  test("data validation pattern: try-convert, count valid, drop invalid (test_data_validation_pattern)") {
    val raw = Seq("1", "2", "3.0", "invalid", "5", null, "7").toDF("raw")
    val p = Pipeline(raw)
    val attempt = Transformer.identity
      .map(col("raw"), expr("try_cast(raw AS double)").as("num"))
    val (rows, ctx) = p
      .transform(_.catchErrors(attempt, col("num").isNull)
        .tapCount("valid_count")
        .map(col("num").cast("int").as("n")))
      .toList()
    assert(rows.map(_.getInt(0)).sorted == Seq(1, 2, 3, 5, 7))
    assert(ctx("valid_count") == 5L)
  }

  test("multi-stage context accumulation (stage1/stage2 processors)") {
    val p = Pipeline((1 to 10).toDF("x"))
    val stage1 = Transformer.identity
      .tapCount("stage1_processed")
      .map((col("x") * 2).as("x"))
    val stage2 = Transformer.identity
      .tapCount("stage2_processed")
      .map((col("x") + 10).as("x"))
    val (rows, ctx) = p.apply(stage1.andThen(stage2)).toList()
    assert(rows.map(_.getInt(0)).sorted == (1 to 10).map(_ * 2 + 10))
    assert(ctx("stage1_processed") == 10L)
    assert(ctx("stage2_processed") == 10L)
  }

  test("context counters classify evens/odds during transform (count_and_transform)") {
    val p = Pipeline((1 to 9).toDF("x"))
    val classify = Transformer { (df, c) =>
      val evens = c.counter("even_count")
      val odds  = c.counter("odd_count")
      df.mapPartitions { it =>
        it.map { r =>
          if (r.getInt(0) % 2 == 0) evens.add(1) else odds.add(1)
          r
        }
      }(org.apache.spark.sql.Encoders.row(df.schema))
    }
    val (_, ctx) = p.apply(classify.andThen(
      Transformer.identity.map((col("x") * 3).as("x")))).consume()
    assert(ctx("even_count") == 4L && ctx("odd_count") == 5L)
  }

  test("bigramCondProb: conditional probabilities ratio exact counts, top-k deterministic") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat"),
      (4L, "the cat sat")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bigramCondProb(docs, "text", 1L, 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // "the" starts all 4 docs: 3x "the cat", 1x "the dog"
    assert(got(("the", "cat")) == ((3L, 4L, 0.75)), s"got $got")
    assert(got(("the", "dog")) == ((1L, 4L, 0.25)))
    // "cat" continues 2x to "sat", 1x to "ran" -> 2/3 rounded half-up at 1e-6
    assert(got(("cat", "sat")) == ((2L, 3L, 0.666667)))
  }

  test("freqSketchEval: estimates dominate exact counts; wide sketch is exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x y y z"), (2L, "x y w v"), (3L, "x q r s t u")
    ).toDF("doc_id", "text")
    // wide sketch (1024 slots, 9 tokens): no collisions, estimate exact
    val wide = graft.operators.TextAnalysis.freqSketchEval(docs, "text", 4, 1024, 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(wide("x") == ((5L, 5L)) && wide("y") == ((3L, 3L)), s"got $wide")
    assert(wide.values.forall { case (ex, est) => est == ex },
      s"collision in a 1024-slot sketch over 9 tokens: $wide")
    // cramped sketch (4 slots): estimates still DOMINATE exact counts
    val tight = graft.operators.TextAnalysis.freqSketchEval(docs, "text", 2, 4, 10)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(tight.forall { case (ex, est) => est >= ex },
      s"CMS must never underestimate: ${tight.toSeq}")
  }

  test("docPerplexity: micro-bit surprisal matches hand-computed LM exactly") {
    import spark.implicits._
    // LM over both docs: c(a,b)=2 c(b,a)=1 c(a,c)=1; c(a,.)=3 c(b,.)=1
    // ubits: (a,b) -log2(2/3)*1e6 -> 584963; (b,a) log2(1)=0 -> 0;
    //        (a,c) -log2(1/3)*1e6 -> 1584963
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.docPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc1: (584963*2 + 0)/3 = 389975.33 -> half-up floor 389975
    assert(got(1L) == ((3L, 0.389975)), s"got $got")
    assert(got(2L) == ((1L, 1.584963)))
    // single-token and empty docs carry no bigram: absent, not NaN
    val edge = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    assert(graft.operators.TextAnalysis.docPerplexity(edge, "doc_id", "text").isEmpty)
  }

  test("dsirWeights: target-domain docs score positive, off-domain negative") {
    import spark.implicits._
    // disjoint vocabularies: target bigrams are frequent in-target and
    // absent elsewhere, so the smoothed log-ratio must split by sign
    val docs = Seq(
      (1L, "t", "x y x y x y"), (2L, "t", "x y x y"),
      (3L, "c", "p q p q p q"), (4L, "c", "p q p q")).toDF("doc_id", "d", "text")
    val got = graft.operators.TextAnalysis
      .dsirWeights(docs, "doc_id", "text", col("d") === "t")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L)._2 && got(2L)._2, s"target docs not target_like: $got")
    assert(!got(3L)._2 && !got(4L)._2, s"off-domain docs flagged: $got")
    assert(got(1L)._1 > 0 && got(3L)._1 < 0)
    // weights are deterministic integers (rerun identical)
    val again = graft.operators.TextAnalysis
      .dsirWeights(docs, "doc_id", "text", col("d") === "t")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == got.map { case (k, v) => k -> v._1 })
  }

  test("semanticContamination: flags only corpus vectors near a benchmark vector") {
    import spark.implicits._
    val bench = Seq((1L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(0.95f, 0.05f, 0.0f)),  // near bench 1
      (11L, Array(0.0f, 1.0f, 0.0f)),    // orthogonal
      (12L, Array(-1.0f, 0.0f, 0.0f))    // opposite
    ).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .semanticContamination(corpus, bench, "vec_id", "embedding", 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got(10L)._2, s"near-duplicate of benchmark not flagged: $got")
    assert(!got(11L)._2 && !got(12L)._2, s"unrelated vectors flagged: $got")
    assert(got(11L)._1 == 0.0 && got(12L)._1 == -1.0)
  }

  test("qualityBuckets: tercile cutoffs per language, degenerate lang goes head") {
    import spark.implicits._
    val scored = (Seq.tabulate(6)(i => (i + 1L, "en", (i + 1).toDouble)) :+
      ((9L, "fr", 9.0))).toDF("doc_id", "lang", "score")
    val got = graft.operators.Corpus.qualityBuckets(scored, "doc_id", "lang", "score")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // en cutoffs: t1 = 2.667, t2 = 4.333 (interpolated percentile)
    assert(got(1L) == "head" && got(2L) == "head", s"got $got")
    assert(got(3L) == "middle" && got(4L) == "middle")
    assert(got(5L) == "tail" && got(6L) == "tail")
    // a single-doc language is its own cutoff: head, deterministically
    assert(got(9L) == "head")
  }

  test("full document pipeline: dedup -> quality filter -> language split (LLM pipeline shape)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val (outs, _) = Pipeline(docs)
      .transform(_.withField("quality",
        graft.operators.TextAnalysis.qualityScore(col("text"), toks))
        .filter(col("quality") > 0.3)
        .withField("lang_pred", graft.operators.TextAnalysis.langId(toks)))
      .branchBroadcast(Seq(
        ("en", col("lang_pred") === "en", Transformer.identity),
        ("other", col("lang_pred") =!= "en", Transformer.identity)))
    val en = outs("en").count()
    val other = outs("other").count()
    assert(en + other > 0)
    assert(outs("en").columns.contains("quality"))
  }

  test("bpeTrainSteps: hand-computed merge sequence, greedy left-to-right runs") {
    import spark.implicits._
    // word freqs: aaab x2, ab x1
    val docs = Seq("aaab aaab ab").toDF("text")
    val steps = graft.operators.TextAnalysis.bpeTrainSteps(docs, "text", 3)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // step1: (a,a)=4 beats (a,b)=3; merge is GREEDY: aaab -> [aa,a,b]
    // step2: (a,b)=3 beats (aa,a)=2
    // step3: aaab is [aa,ab] -> (aa,ab)=2
    assert(steps.toSeq == Seq(
      (1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L)),
      s"got ${steps.toSeq}")
  }

  test("preTokens: GPT-2-style split of mixed text/punct, hand-checked") {
    import spark.implicits._
    val got = Seq("It's doc-42, OK!! can't 3.14 'x '").toDF("t")
      .select(graft.operators.TextAnalysis.preTokens(col("t")))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("it", "'s", "doc", "-", "42", ",", "ok", "!!",
      "can", "'t", "3", ".", "14", "'", "x", "'"), s"got $got")
  }

  test("bpeTrainStepsPretok: punctuation can never merge across a pre-token boundary") {
    import spark.implicits._
    // whitespace words would be "ab!" and learn (b,!) merges; pretok
    // splits [ab][!] so only letter-letter pairs exist
    val docs = Seq("ab! ab! ab! cd cd").toDF("text")
    val steps = graft.operators.TextAnalysis.bpeTrainStepsPretok(docs, "text", 2)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // pre-tokens: ab x3, ! x3, cd x2 -> step1 (a,b)=3, step2 (c,d)=2;
    // a (b,!) pair never forms
    assert(steps.toSeq == Seq((1L, "a", "b", 3L), (2L, "c", "d", 2L)),
      s"got ${steps.toSeq}")
  }

  test("bpeEncode equals the trainer's final symbol state on its own training words") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab baa")).toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.bpeTrainSteps(docs, "text", 3)
    val enc = graft.operators.TextAnalysis
      .bpeEncode(docs, "doc_id", "text", merges, 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // corpus words: aaab x3, ab x1, baa x1. merges: (a,a) cnt7 ->
    // (a,b) cnt4 -> (aa,ab) cnt3. final states: aaab=[aaab] 1 sym,
    // ab=[ab] 1, baa=[b,aa] 2.
    assert(enc.toSeq == Seq((1L, 3L, 3L), (2L, 2L, 3L)), s"got ${enc.toSeq}")
  }

  test("canonical Sennrich merges on even and odd symbol runs") {
    import spark.implicits._
    // the r12-era literal string replace consumed the shared delimiter
    // on runs >= 4 ("aaaa"+(a,a) -> [aa,a,a]); canonical left-to-right
    // non-overlapping merging gives the reference-BPE states
    val docs = Seq((1L, "aaaa"), (2L, "aaaaa")).toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.bpeTrainSteps(docs, "text", 1)
    val m = merges.collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq(("a", "a", 7L)), s"got ${m.toSeq}") // 3 + 4 adjacencies
    val enc = graft.operators.TextAnalysis
      .bpeEncode(docs, "doc_id", "text", merges, 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    // aaaa -> [aa,aa] (2 symbols), aaaaa -> [aa,aa,a] (3 symbols); the
    // old replace yielded [aa,a,a] (3) and [aa,a,aa] (3, wrong shape)
    assert(enc.toSeq == Seq((1L, 2L), (2L, 3L)), s"got ${enc.toSeq}")
  }

  test("byteToUnicode is the GPT-2 bijection (256 entries, printable identity)") {
    val t = graft.operators.TextAnalysis.byteToUnicode
    assert(t.length == 256)
    assert(t.distinct.length == 256, "must be a bijection")
    // printable bytes map to themselves
    assert(t('a'.toInt) == "a" && t('!'.toInt) == "!" && t(255) == "ÿ")
    // non-printable bytes map to 256+n in ascending byte order:
    // byte 0 -> U+0100, space (32) -> U+0120, DEL (127) -> U+0121,
    // soft hyphen (173) -> U+0143 (the last of the 68 shifted bytes)
    assert(t(0) == "Ā" && t(32) == "Ġ"
      && t(127) == "ġ" && t(173) == "Ń")
  }

  test("byteSymbols: UTF-8 byte count, multi-byte chars split into base symbols") {
    import spark.implicits._
    val got = Seq(("ab", 0), ("é", 1), ("東", 2)).toDF("w", "i")
      .select(col("i"), graft.operators.TextAnalysis.byteSymbols(col("w")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(got(0) == Seq("a", "b"))
    // é is 0xC3 0xA9: both printable-range bytes map to themselves
    assert(got(1) == Seq("Ã", "©"))
    // 東 is 0xE6 0x9D 0xB1: 0x9D is non-printable -> shifted symbol
    assert(got(2).length == 3)
    assert(got(2)(0) == "æ" && got(2)(2) == "±")
  }

  test("byteSymbols: compiled kernel equals the declarative hex-pair formulation") {
    import spark.implicits._
    // every byte value once (as latin-1 chars, so each is one byte in
    // the 0-255 range after encode) plus multi-byte UTF-8 and empties
    val words = (0 to 255).map(b => new String(Array(b.toByte), "ISO-8859-1")) ++
      Seq("", "a", "é東ü", "it's doc-42, ok!", "ĀĠ mixed Ń")
    val df = words.zipWithIndex.map { case (w, i) => (i, w) }.toDF("i", "w")
    val a = df.select(col("i"),
        graft.operators.TextAnalysis.byteSymbols(col("w")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    val b = df.select(col("i"),
        graft.operators.TextAnalysis.byteSymbolsDeclarative(col("w")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(a == b)
  }

  test("bpeTrainStepsBytes learns multi-byte merges; encode matches trainer state") {
    import spark.implicits._
    // 'éé' x3: bytes [C3 A9 C3 A9]; step1 must merge (Ã,©) — the
    // two-byte é becoming atomic — and step2 (Ã©,Ã©)
    val docs = Seq((1L, "éé éé éé"), (2L, "éé ab")).toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.bpeTrainStepsBytes(docs, "text", 2)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1L, "Ã", "©", 8L), (2L, "Ã©", "Ã©", 4L)),
      s"got ${merges.toSeq}")
    val enc = graft.operators.TextAnalysis.bpeEncodeBytes(
      docs, "doc_id", "text",
      graft.operators.TextAnalysis.bpeTrainStepsBytes(docs, "text", 2), 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1: éé x3 -> 1 symbol each; doc2: éé (1) + ab (2 syms, no
    // letter merge learned)
    assert(enc.toSeq == Seq((1L, 3L, 3L), (2L, 2L, 3L)), s"got ${enc.toSeq}")
  }

  test("bpeVocabFromMerges == bpeVocab (train-once artifact is hash-identical)") {
    // the memoized family path derives the vocabulary from the learned
    // 5-row merge table instead of refolding the trainer — outputs
    // must be identical row sets (fold state after k merges IS the
    // initial state with rules 1..k applied in order)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = graft.operators.TextAnalysis.bpeTrainSteps(docs, "text", 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val fresh = rows(graft.operators.TextAnalysis.bpeVocab(docs, "text", 5))
    val derived = rows(graft.operators.TextAnalysis
      .bpeVocabFromMerges(docs, "text", merges, 5))
    assert(derived == fresh,
      s"derived vocab diverged: ${derived.diff(fresh)} / ${fresh.diff(derived)}")
    // and the graded memoized queries replay the fresh trainer exactly
    val q1 = SparkEntry.queries("bpe_train_steps")(spark, sfDir).collect()
      .map(_.toSeq).toSet
    val q2 = SparkEntry.queries("bpe_train_steps")(spark, sfDir).collect()
      .map(_.toSeq).toSet
    val freshTrain = merges.collect().map(_.toSeq).toSet
    assert(q1 == freshTrain && q2 == freshTrain,
      "memoized merge table diverged from the fresh trainer")
  }

  test("bpeVocabFromMergesBytes: derived byte vocab is the trainer's final state") {
    import spark.implicits._
    // the éé corpus from the byte-trainer spec: after the two learned
    // merges (Ã,©) then (Ã©,Ã©), word 'éé' (freq 4) collapses to ONE
    // symbol 'Ã©Ã©' and 'ab' (freq 1) stays [a, b] — the derived
    // vocab must be exactly that fold state, hand-checked
    val docs = Seq((1L, "éé éé éé"), (2L, "éé ab")).toDF("doc_id", "text")
    val vocab = graft.operators.TextAnalysis.bpeVocabFromMergesBytes(
      docs, "text",
      graft.operators.TextAnalysis.bpeTrainStepsBytes(docs, "text", 2), 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(vocab == Set(("Ã©Ã©", 4L, 1L),
      ("a", 1L, 1L), ("b", 1L, 1L)), s"got $vocab")
  }

  test("BPE degenerate corpus: fewer mergeable pairs than steps is lossless, never NULL/empty") {
    import spark.implicits._
    // single-char words: ZERO mergeable pairs exist, so all 3 steps
    // are absent — encode must fall back to identity replaces (not
    // NULL the encoded word) and vocab must keep the untouched symbols
    val docs = Seq((1L, "a b a"), (2L, "b")).toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.bpeTrainSteps(docs, "text", 3)
    assert(merges.count() == 0, "no merges should be learnable")
    val enc = graft.operators.TextAnalysis
      .bpeEncode(docs, "doc_id", "text", merges, 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.toSeq == Seq((1L, 3L, 3L), (2L, 1L, 1L)), s"got ${enc.toSeq}")
    val vocab = graft.operators.TextAnalysis.bpeVocab(docs, "text", 3)
      .orderBy("symbol").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // word table: "a" freq 2, "b" freq 2 — each symbol in ONE word form
    assert(vocab.toSeq == Seq(("a", 2L, 1L), ("b", 2L, 1L)), s"got ${vocab.toSeq}")
    // one learnable pair, three requested steps: step 1 merges, the
    // absent steps 2-3 are identity
    val docs2 = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m2 = graft.operators.TextAnalysis.bpeTrainSteps(docs2, "text", 3)
    assert(m2.count() == 1)
    val enc2 = graft.operators.TextAnalysis
      .bpeEncode(docs2, "doc_id", "text", m2, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc2.toSeq == Seq((1L, 2L, 2L)), s"got ${enc2.toSeq}")
  }
}
