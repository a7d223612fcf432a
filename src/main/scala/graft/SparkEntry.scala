package graft

import graft.operators.Caching.TrackedDf
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Curation, Dedup, Embeddings, Multimodal, Similarity, Skew, Temporal, TextAnalysis, Warc}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from SURVEY.md §2/§2b,
  * expressed through the graft API (Pipeline/Transformer/operators);
  * `oracleSql` carries the DuckDB-equivalent SQL with IDENTICAL column
  * names/aliases. Float aggregates are rounded on both sides; dot
  * products / folds use a fixed sequential operation order so doubles
  * are bit-identical across engines.
  */
object SparkEntry {

  /** Table reads memoized per (session, path): repeated queries in one
    * run skip re-listing files and re-reading parquet footers — the
    * per-query fixed cost that dominates a 40-query benchmark sweep.
    */
  private val tableCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    // evict plans owned by STOPPED sessions so a long-lived JVM that
    // cycles sessions doesn't pin their state (live sessions keep theirs)
    tableCache.keys.filter(k => (k._1 ne s) && k._1.sparkContext.isStopped)
      .foreach(tableCache.remove)
    tableCache.getOrElseUpdate((s, s"$dir/$name.parquet"), {
      val raw = s.read.parquet(s"$dir/$name.parquet")
      // drift insurance (the round-7 events-encoding lesson): the
      // vector kernels are typed array<float>, so a driver-side
      // regeneration of embeddings as array<double> would break every
      // similarity/ANN query at ANALYSIS time. Normalize on read —
      // a no-op (no cast node) when the schema is already float.
      raw.schema.fields.find(_.name == "embedding") match {
        case Some(f) if f.dataType ==
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, true) ||
            f.dataType == org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, false) =>
          raw.withColumn("embedding", col("embedding").cast("array<float>"))
        case _ => raw
      }
    })
  }

  /** Bit-deterministic half-up rounding: floor(x·10ⁿ + 0.5)/10ⁿ uses
    * only IEEE ops, so Spark and the DuckDB oracle compute the exact
    * same double — unlike engine round(), whose decimal-vs-binary
    * tie-breaking differs on row-level products that land on .xx5.
    */
  private def r2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100
  private def r4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000
  private def r6(c: Column): Column = floor(c * 1000000 + lit(0.5)) / 1000000

  /** Merge-rule count shared by the bpe_train_steps / bpe_encode
    * queries and their oracles (the plans unroll per step).
    */
  private val bpeSteps = 5

  /** DuckDB replay of `TextAnalysis.canonicalMerge` part 1 — the
    * merge START positions of pair (l, r) in symbol list `syms`: an
    * append-only list_reduce (a position merges iff it matches and
    * the previous position did not merge). The accumulator is NEVER
    * returned unchanged from a CASE branch — always
    * list_concat(acc, …) — the DuckDB 1.0.0 list_reduce corruption
    * workaround (see semdedup_fidelity_eval). NULL l/r → no matches →
    * empty positions → identity merge.
    */
  private def duckMergePos(syms: String, l: String, r: String): String =
    s"""list_reduce(
         list_prepend(CAST([] AS BIGINT[]),
           list_transform(generate_series(1, len($syms) - 1), i -> [i])),
         (acc, xi) -> list_concat(acc,
           CASE WHEN $syms[xi[1]] = $l AND $syms[xi[1] + 1] = $r
                 AND (len(acc) = 0 OR acc[-1] != xi[1] - 1)
                THEN [xi[1]] ELSE [] END))"""

  /** Part 2 — rebuild the symbol list from merge positions `mp`:
    * merged positions emit l||r, their right symbols drop, everything
    * else passes through.
    */
  private def duckMergeApply(
      syms: String, mp: String, l: String, r: String): String =
    s"""list_filter(list_transform(generate_series(1, len($syms)), i ->
         CASE WHEN list_contains($mp, i) THEN $l || $r
              WHEN list_contains($mp, i - 1) THEN NULL
              ELSE $syms[i] END), x -> x IS NOT NULL)"""

  /** The BPE trainer replayed as DuckDB CTEs — words → seqs0 → K
    * rounds of (pair-explode → weighted count → deterministic argmax
    * b$s → CANONICAL Sennrich merge via [[duckMergePos]] +
    * [[duckMergeApply]], the same left-to-right non-overlapping rule
    * as the engine). Shared by the trainer oracle (reads b1..bK) and
    * the encoder oracle (joins b1..bK against the per-document token
    * stream). Word state is a symbol LIST throughout.
    */
  private val bpeTrainCtes: String = {
    // the step's (l, r) rule rides as COLUMNS via a 1-row aggregate
    // cross join (max over the ≤1-row b$s; NULL when absent) — DuckDB
    // rejects scalar subqueries INSIDE lambda expressions, but lambda
    // capture of outer columns is fine
    def ruleJoin(st: Int) = s"(SELECT max(l) AS rl, max(r) AS rr FROM b$st) jr$st"
    val stepCtes = (1 to bpeSteps).map { s =>
      s"""pr$s AS (SELECT unnest(list_transform(generate_series(1, len(syms) - 1),
             i -> struct_pack(l := syms[i], r := syms[i + 1]))) AS p, freq
           FROM seqs${s - 1} WHERE len(syms) >= 2),
         pc$s AS (SELECT p.l AS l, p.r AS r, sum(freq)::BIGINT AS cnt
                  FROM pr$s GROUP BY 1, 2),
         b$s AS MATERIALIZED (SELECT $s::BIGINT AS step, l, r, cnt FROM pc$s
                 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         mp$s AS MATERIALIZED (SELECT syms, freq, rl, rr,
             ${duckMergePos("syms", "rl", "rr")} AS mp
           FROM seqs${s - 1}, ${ruleJoin(s)}),
         seqs$s AS MATERIALIZED (SELECT
             ${duckMergeApply("syms", "mp", "rl", "rr")} AS syms, freq
           FROM mp$s)"""
    }.mkString(",\n         ")
    s"""toks AS (SELECT unnest(list_filter(string_split(
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             ' +', ' ', 'g')), ' '), x -> x <> '')) AS w FROM documents),
       words AS (SELECT w, count(*)::BIGINT AS freq FROM toks GROUP BY 1),
       seqs0 AS MATERIALIZED (SELECT
             list_transform(generate_series(1, length(w)), i -> w[i]) AS syms,
             freq FROM words),
       $stepCtes"""
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Region×year revenue rollup: broadcast dim joins, single fact scan.
    * The same shape is registered (and oracle-graded) as
    * `queries("entry")` at the driver's correctness scale.
    */
  def entry(spark: SparkSession): DataFrame =
    entryRollup(spark, "/root/testdata/sf0.001")

  private def entryRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o  = t(spark, dir, "orders")
    val c  = t(spark, dir, "customer")
    val n  = t(spark, dir, "nation")
    val r  = t(spark, dir, "region")
    // customer is CORPUS-PROPORTIONAL (sf×150k rows): no broadcast
    // hint — AQE broadcasts it while it fits and shuffles it at 100 TB,
    // where a forced broadcast would OOM the driver. nation/region are
    // constant-cardinality (25/5 rows) so their hints are always right.
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ portableTpch.map { case (name, (tables, sql)) =>
      name -> (((s: SparkSession, dir: String) => {
        tables.foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(sql)
      }): (SparkSession, String) => DataFrame)
    }

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the flagship rollup, graded at the driver's correctness scale
    // (the driver also smoke-runs the sf0.001 `entry` overload)
    "entry" -> ((s, dir) => entryRollup(s, dir)),

    // ---- §2 rows 1-3: map / filter / flatten ------------------------
    "map_project" -> ((s, dir) =>
      Pipeline(t(s, dir, "lineitem"))
        .transform(_.map(
          col("l_orderkey"), col("l_linenumber"),
          r2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue")))
        .toDF),

    "filter_rows" -> ((s, dir) =>
      Pipeline(t(s, dir, "lineitem"))
        .transform(_.filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
          .map(col("l_orderkey"), col("l_linenumber"), col("l_quantity")))
        .toDF),

    "flatten_explode" -> ((s, dir) =>
      Pipeline(t(s, dir, "documents"))
        .transform(_.map(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
          .flatten(col("toks"), "token")
          .map(col("doc_id"), col("token")))
        .toDF),

    // ---- §2 rows 7-8: reduce ----------------------------------------
    "reduce_global" -> ((s, dir) =>
      Pipeline(t(s, dir, "lineitem"))
        .transform(_.reduceGlobal(
          count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_rev")))
        .toDF),

    "reduce_per_key" -> ((s, dir) =>
      Pipeline(t(s, dir, "lineitem"))
        .transform(_.reducePerKey(
          Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            count(lit(1)).as("count_order"))))
        .toDF),

    // ---- §2 row 26: first(n) with pushed-down limit ------------------
    "first_n" -> ((s, dir) =>
      Pipeline(t(s, dir, "orders"))
        .transform(_.mapPlan(_.orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10))
          .map(col("o_orderkey"), col("o_totalprice")))
        .toDF),

    // ---- §2 row 18: multi-source union chain ------------------------
    "union_chain" -> ((s, dir) =>
      Pipeline(
        t(s, dir, "customer").select(col("c_name").as("name"),
          col("c_acctbal").as("acctbal"), lit("customer").as("src")),
        t(s, dir, "supplier").select(col("s_name").as("name"),
          col("s_acctbal").as("acctbal"), lit("supplier").as("src")))
        .toDF),

    // ---- joins (implicit in any real pipeline) ----------------------
    "join_broadcast" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
    }),

    "join_shuffle" -> ((s, dir) =>
      t(s, dir, "orders").join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 2).as("total"))),

    // Semi join: orders having at least one returned lineitem — the
    // probe side carries only the join key (no payload duplication,
    // no fan-out), the exact shape EXISTS subqueries compile to.
    "join_semi" -> ((s, dir) => {
      val returned = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
      t(s, dir, "orders")
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
    }),

    // Anti join: orders with NO returned lineitem — NOT EXISTS as a
    // hash anti join, never a filtered outer join materializing nulls.
    "join_anti" -> ((s, dir) => {
      val returned = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
      t(s, dir, "orders")
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // ---- §2 rows 28-30: branch --------------------------------------
    "branch_fanout" -> ((s, dir) => {
      val byStatus = Transformer.identity.reducePerKey(
        Seq(col("o_orderstatus").as("k")), Seq(count(lit(1)).as("v")))
      val byPrio = Transformer.identity.reducePerKey(
        Seq(col("o_orderpriority").as("k")), Seq(count(lit(1)).as("v")))
      val (outs, _) = Pipeline(t(s, dir, "orders"))
        .branch(Seq("by_status" -> byStatus, "by_priority" -> byPrio))
      outs("by_status").withColumn("branch", lit("by_status"))
        .unionByName(outs("by_priority").withColumn("branch", lit("by_priority")))
        .select(col("branch"), col("k"), col("v"))
    }),

    "branch_router" -> ((s, dir) => {
      val agg = Transformer.identity.reduceGlobal(
        count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      val (outs, _) = Pipeline(t(s, dir, "orders")).branchRouter(Seq(
        ("urgent", col("o_orderpriority") === "1-URGENT", agg),
        ("high", col("o_orderpriority") === "2-HIGH", agg),
        ("other", lit(true), agg)))
      outs.toSeq.sortBy(_._1).map { case (name, df) =>
        df.withColumn("branch", lit(name)).select(col("branch"), col("n"), col("total"))
      }.reduce(_.unionByName(_))
    }),

    "branch_broadcast" -> ((s, dir) => {
      val agg = Transformer.identity.reduceGlobal(
        count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      val (outs, _) = Pipeline(t(s, dir, "orders")).branchBroadcast(Seq(
        ("bigspender", col("o_totalprice") > 200000, agg),
        ("urgentish", col("o_orderpriority").isin("1-URGENT", "2-HIGH"), agg)))
      outs.toSeq.sortBy(_._1).map { case (name, df) =>
        df.withColumn("branch", lit(name)).select(col("branch"), col("n"), col("total"))
      }.reduce(_.unionByName(_))
    }),

    // ---- §2 row 4: tap via observe ----------------------------------
    "tap_observe" -> ((s, dir) =>
      Pipeline(t(s, dir, "events"))
        .transform(_.tap("tap_metrics", count(lit(1)).as("n_seen"), sum(col("value")).as("sum_value"))
          .filter(col("event_type") === "purchase")
          .map(col("event_id"), col("user_id"), col("value")))
        .toDF),

    // ---- §2 rows 5,13: compose / from_transformer -------------------
    "compose_apply" -> ((s, dir) => {
      val extract = Transformer.identity.filter(col("p_size") > 20)
      val shape   = Transformer.identity.map(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      Pipeline(t(s, dir, "part")).apply(extract.andThen(shape)).toDF
    }),

    // ---- §2 row 6: loop ---------------------------------------------
    "loop_converge" -> ((s, dir) => {
      val body = Transformer.identity.withField("v",
        when(col("v") > 1000, col("v") / 2).otherwise(col("v")))
      Pipeline(t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice").as("v")))
        .transform(_.loop(body, df => !df.where(col("v") > 1000).isEmpty, 32)
          .map(col("o_orderkey"), r4(col("v")).as("v")))
        .toDF
    }),

    // ---- §2 rows 9,11: catch / on_error quarantine ------------------
    "catch_quarantine" -> ((s, dir) => {
      val attempt = Transformer.identity.map(
        col("doc_id"),
        try_divide(lit(1000.0), col("n_chars") % 7).as("result"),
        lit("ok").as("status"))
      Pipeline(t(s, dir, "documents"))
        .transform(_.catchErrors(attempt, isError = col("result").isNull,
          handler = ErrorHandler.quarantine((bad, _) => bad.withColumn("status", lit("error"))))
          .map(col("doc_id"), round(col("result"), 4).as("result"), col("status")))
        .toDF
    }),

    // ---- §2 row 10: short_circuit -----------------------------------
    "short_circuit" -> ((s, dir) =>
      Pipeline(t(s, dir, "lineitem"))
        .transform(_.shortCircuit((df, _) => !df.where(col("l_quantity") < 0).isEmpty)
          .reducePerKey(Seq(col("l_returnflag")), Seq(count(lit(1)).as("n"))))
        .toDF),

    // ---- §2 rows 19,31,32: shared context ---------------------------
    "context_broadcast" -> ((s, dir) =>
      Pipeline(t(s, dir, "events"))
        .withContext("multiplier" -> "3", "threshold" -> "100")
        .transform(_.mapCtx(ctx => Seq(
          col("event_id"), col("event_type"),
          (col("value") * ctx.litConfDouble("multiplier")).as("scaled")))
          .filterCtx(ctx => col("scaled") > ctx.litConfDouble("threshold"))
          .reducePerKey(Seq(col("event_type")),
            Seq(count(lit(1)).as("n"), round(sum(col("scaled")), 2).as("sum_scaled"))))
        .toDF),

    // ---- §2 row 22: buffer ------------------------------------------
    "buffer_repartition" -> ((s, dir) =>
      Pipeline(t(s, dir, "events"))
        .buffer(8)
        .transform(_.reducePerKey(Seq(col("event_type")),
          Seq(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))))
        .toDF),

    // ---- §2 row 12: set_chunker -------------------------------------
    "set_chunker" -> ((s, dir) =>
      Pipeline(t(s, dir, "orders"))
        .transform(_.setChunker(8, pmod(col("o_orderkey"), lit(8)))
          .withField("chunk", pmod(col("o_orderkey"), lit(8)))
          .reducePerKey(Seq(col("chunk")),
            Seq(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))))
        .toDF),

    // ---- windowed analytics -----------------------------------------
    // ntile quartiles + integer rank positions per partition (rank
    // arithmetic instead of percent_rank's double division keeps the
    // output exactly integral and engine-portable)
    "window_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("long").as("quartile"),
          rank().over(w).cast("long").as("rnk"))
        .where(col("rnk") <= 100)
    }),

    // pivot: per-priority order counts spread across status columns —
    // compiles to one partial-agg pass with CASE projections, never a
    // per-pivot-value scan
    "pivot_status" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("o_orderpriority"), col("F").as("n_f"),
          col("O").as("n_o"), col("P").as("n_p"))),

    "window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events").select(col("event_id"), col("user_id"),
        round(sum(col("value")).over(w), 2).as("running_value"))
    }),

    "window_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
        .select(col("o_orderpriority"), col("rank"), col("o_orderkey"), col("o_totalprice"))
    }),

    "events_sessionize" -> ((s, dir) => {
      val order = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val run   = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // epoch-µs event time, robust to ns-long vs timestamp[us] parquet
      // encodings (Temporal.epochUs); matches the oracle's epoch_us.
      val ev = t(s, dir, "events")
      ev.select(col("user_id"), col("event_id"), col("value"),
          Temporal.epochUs(ev, "ts").as("tus"))
        .withColumn("is_new",
          when(lag(col("tus"), 1).over(order).isNull ||
            col("tus") - lag(col("tus"), 1).over(order) > 1800000000L, 1).otherwise(0))
        .withColumn("session_seq", sum(col("is_new")).over(run))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
    }),

    // ---- §2b: temporal joins ----------------------------------------
    // As-of join: each purchase matched to the user's most recent prior
    // click (LEFT OUTER — purchases with no prior click keep nulls).
    // One union shuffle + one window walk; the oracle replays the same
    // windowed formulation, so the match is deterministic by
    // construction (ties on click ts broken by largest event_id).
    "asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val e = ev
        .select(col("event_id"), col("user_id"), col("event_type"),
          Temporal.epochUs(ev, "ts").as("tus"), col("value"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tus"), col("value"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_event_id"),
          col("tus").as("click_tus"))
      Temporal.asofJoin(purchases, clicks, "user_id", "tus", "click_tus", "click_event_id")
        .select(col("event_id"), col("user_id"), col("tus"), col("value"),
          col("click_event_id"), col("click_tus"),
          (col("tus") - col("click_tus")).as("gap_us"))
    }),

    // forward direction: each purchase matched to the NEXT click at or
    // after it — same one-shuffle window walk, frame flipped
    "asof_join_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val e = ev
        .select(col("event_id"), col("user_id"), col("event_type"),
          Temporal.epochUs(ev, "ts").as("tus"), col("value"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tus"), col("value"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_event_id"),
          col("tus").as("click_tus"))
      Temporal.asofJoinForward(purchases, clicks, "user_id", "tus", "click_tus",
        "click_event_id")
        .select(col("event_id"), col("user_id"), col("tus"), col("value"),
          col("click_event_id"), col("click_tus"),
          (col("click_tus") - col("tus")).as("gap_us"))
    }),

    // Interval join via bin-explode + equi-join (bands overlap, so this
    // is a genuine interval join); the exact range predicate filters
    // candidates, so bin width affects cost only, never results.
    "range_join_bands" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq(("low", 0.0, 50.0), ("mid", 40.0, 200.0), ("high", 150.0, 500.0))
        .toDF("band", "lo", "hi")
      val e = t(s, dir, "events").select(col("event_id"), col("value"))
      Temporal.rangeJoinBinned(e, "value", bands, "lo", "hi", 25.0)
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
    }),

    // Trailing 1-hour per-user features via a RANGE window frame.
    // Money is summed in integer cents (floor(v*100+0.5) is exact on
    // 2-decimal doubles), so the running sums hash-match bit-exactly
    // regardless of either engine's frame evaluation order.
    "window_time_range" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val e = ev
        .select(col("event_id"), col("user_id"), Temporal.epochUs(ev, "ts").as("tus"),
          floor(col("value") * 100 + lit(0.5)).as("cents"))
      Temporal.trailingRange(e, "user_id", "tus", 3600000000L,
        "trailing_n" -> count(lit(1)),
        "trailing_cents" -> sum(col("cents")))
        .select(col("event_id"), col("user_id"), col("tus"),
          col("trailing_n"), col("trailing_cents"))
    }),

    // Ordered conversion funnel over the event log: all joins/aggs
    // keyed on user_id (one shuffle reused across steps).
    "events_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val e = ev
        .select(col("user_id"), col("event_type"), Temporal.epochUs(ev, "ts").as("tus"))
      Temporal.funnel(e, "user_id", "event_type", "tus",
        Seq("view", "click", "purchase"))
    }),

    // ---- §2b: dedup -------------------------------------------------
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_copies"))),

    // production-default exact dedup: hash the CANONICAL form (case/
    // punctuation/whitespace-insensitive) so trivially-reformatted
    // copies collapse too
    "dedup_normalized" -> ((s, dir) =>
      Dedup.exactNormalized(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_copies"))),

    // daily-increment dedup: new batch (id%10 != 0) vs the existing
    // corpus's hash index (id%10 == 0) — anti join on 8-byte hashes
    "dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.exactIncremental(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text")
    }),

    "ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", 0.6)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))),

    // threshold 0.8: with 32 bands x 4 rows, P(LSH misses a pair at
    // exactly J=0.8) = (1-0.8^4)^32 ≈ 5e-8, so the exact-SQL oracle is
    // safe for any data; at 0.6 the boundary miss rate would be ~1.2%
    // per pair (data-dependently green only). Lower thresholds remain
    // available on the operator with the recall math documented.
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minHashNearDups(t(s, dir, "documents"), "doc_id", "text", 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simHashNearDups(t(s, dir, "documents"), "doc_id", "text", 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))),

    // measured minhash recall vs exact PPJoin ground truth at 0.6 —
    // the threshold where band recall is NOT provably ~1; the oracle
    // replays the SplitMix64 permutations and FNV shingle hashes
    // bit-exactly, so even WHICH pairs slip is verified
    "minhash_recall_eval" -> ((s, dir) =>
      Dedup.minHashRecallEval(t(s, dir, "documents"), "doc_id", "text", 0.6)),

    // incremental near-dup: the daily batch (doc_id%10=0) banded
    // against the corpus index (%10≠0) — never corpus×corpus; at
    // t=0.8 the 32×4 band miss probability (≈5e-8) makes the exact
    // cross-Jaccard oracle sound
    "neardup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.minHashNearDupsIncremental(
        docs.where(col("doc_id") % 10 === 0),
        docs.where(col("doc_id") % 10 =!= 0),
        "doc_id", "text", 0.8)
        .select(col("id_new"), col("id_old"), round(col("jaccard"), 4).as("jaccard"))
    }),

    // Lee-et-al-style duplicated-span stats: positioned 16-token
    // window hashes (8-byte FNV, text never shuffled), hash-keyed dup
    // count, exact interval-union coverage in closed integer form
    "substring_dup_stats" -> ((s, dir) =>
      Dedup.substringDupStats(t(s, dir, "documents"), "doc_id", "text", 16)),

    // the ACTION step: cleaned corpus with every duplicated 16-token
    // span removed except its globally-first occurrence — the
    // drop-the-span policy substring_dup_stats prices
    "substring_dedup_apply" -> ((s, dir) =>
      Dedup.substringDedupApply(t(s, dir, "documents"), "doc_id", "text", 16)),

    // clustering input is the EXACT Jaccard pair set (PPJoin), not
    // minhash: LSH recall at threshold 0.6 is ~98.8% per pair, which
    // would make the recursive-CTE oracle only data-dependently green;
    // exact pairs make the green hash provable for any corpus
    "dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.6)
      Dedup.clusters(pairs, docs, "doc_id")
        .select(col("id").as("doc_id"), col("cluster"))
    }),

    // multi-signal dedup: one cluster graph over BOTH channels — text
    // n-gram Jaccard pairs ∪ embedding cosine pairs (vec_id == doc_id)
    // — so a doc caught by either signal joins the family; same
    // log-convergence label propagation downstream. NO distinct() on
    // the union: min-label propagation is idempotent to duplicate
    // edges, and the dedup shuffle of the full pair set bought nothing
    "dedup_multisignal" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val textPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.6)
        .select(col("id_a"), col("id_b"))
      val vecPairs = Similarity.nearDupCosineBanded(
        t(s, dir, "embeddings"), "vec_id", "embedding", 0.4)
        .select(col("id_a"), col("id_b"))
      Dedup.clusters(textPairs.unionByName(vecPairs), docs, "doc_id")
        .select(col("id").as("doc_id"), col("cluster"))
    }),

    // production-shaped multisignal variant: the text channel is the
    // banded MinHash path (the 100 TB input — band equi-join on 8-byte
    // signatures) instead of exact PPJoin; same clustering downstream.
    // The oracle replays the SplitMix64 permutations bit-exactly, so
    // even WHICH boundary pairs the bands miss is verified.
    "dedup_multisignal_lsh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val textPairs = Dedup.minHashNearDups(docs, "doc_id", "text", 0.6)
        .select(col("id_a"), col("id_b"))
      val vecPairs = Similarity.nearDupCosineBanded(
        t(s, dir, "embeddings"), "vec_id", "embedding", 0.4)
        .select(col("id_a"), col("id_b"))
      Dedup.clusters(textPairs.unionByName(vecPairs), docs, "doc_id")
        .select(col("id").as("doc_id"), col("cluster"))
    }),

    // incremental clustering: yesterday's corpus labels (a persisted
    // table in production — here derived in-query) + today's links
    // (batch-internal + batch×corpus minhash at 0.8, where band
    // recall makes the exact oracle sound) → labels for ALL docs.
    // The oracle IS the full recompute over every pair, so the green
    // hash proves incremental == from-scratch.
    "dedup_clusters_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val batch = docs.where(col("doc_id") % 10 === 0)
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
      val prev = Dedup.clusters(
        Dedup.minHashNearDups(corpus, "doc_id", "text", 0.8)
          .select(col("id_a"), col("id_b")), corpus, "doc_id")
      val cross = Dedup.minHashNearDupsIncremental(batch, corpus, "doc_id", "text", 0.8)
        .select(col("id_new").as("id_a"), col("id_old").as("id_b"))
      val within = Dedup.minHashNearDups(batch, "doc_id", "text", 0.8)
        .select(col("id_a"), col("id_b"))
      Dedup.clustersIncremental(prev, cross.unionByName(within), docs, "doc_id")
        .select(col("id").as("doc_id"), col("cluster"))
    }),

    // dedup audit report: family-size histogram + removable-doc mass
    // per size class — two fixed-width keyed aggs over the label table
    "dedup_cluster_sizes" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val labels = Dedup.clusters(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.6), docs, "doc_id")
      Dedup.clusterSizeReport(labels)
    }),

    // keep the BEST copy of each duplicate family: longest doc wins,
    // ties to smallest id (partial-aggregable argmax, no window)
    "cluster_survivors" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val labels = Dedup.clusters(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.6), docs, "doc_id")
      Dedup.clusterSurvivors(labels, docs, "doc_id", "n_chars")
    }),

    // ---- §2b: similarity --------------------------------------------
    // Graded scale path: SELF-SCALING hyperplane-LSH bands — bit count
    // from the corpus size (lshPlanBits: expected bucket ≤ 64 rows at
    // ANY n; 3 bits here, 24 bits at 10⁹ rows), 6 OR-ed tables for
    // recall, exact cosine verify on bucket collisions only. Candidates
    // ≈ tables·n·64/2 — linear in n, never n²/2^const. The oracle
    // replays the integer bits-from-n rule AND the ±1 sign matrix, so
    // the exact candidate set is verified; lsh_recall_eval_deployed
    // measures recall at this exact operating point. The O(n²) exact
    // variant (nearDupCosineExact) is a spec-only verification tool.
    "neardup_cosine_bucketed" -> ((s, dir) =>
      Similarity.nearDupCosineBanded(t(s, dir, "embeddings"), "vec_id", "embedding",
        0.4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))),

    // measured recall of the DEPLOYED banded config (auto bits, 6
    // tables) vs exact ground truth on the id%2 sample — the number
    // that prices the graded parameters (LSH recall at near-orthogonal
    // thresholds is the honest cost of sub-quadratic candidates)
    "lsh_recall_eval_deployed" -> ((s, dir) =>
      Similarity.bandedRecallEval(t(s, dir, "embeddings"), "vec_id", "embedding",
        0.4, 64, 6, 2)),

    // incremental banded cosine: the daily batch (vec_id%10=0) banded
    // against the corpus index (%10≠0) — never corpus×corpus; bits
    // follow the CORPUS size, the side that grows
    "neardup_cosine_incremental" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.nearDupCosineBandedIncremental(
        emb.where(col("vec_id") % 10 === 0), emb.where(col("vec_id") % 10 =!= 0),
        "vec_id", "embedding", 0.4)
        .select(col("id_new"), col("id_old"), round(col("cosine"), 6).as("cosine"))
    }),

    // semantic (embedding-space) decontamination: max cosine vs the
    // broadcast-packed benchmark computed row-locally in the scan
    // stage — zero shuffle, the shingle gate's paraphrase-proof twin
    "decontaminate_semantic" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.semanticContamination(
        emb.where(col("vec_id") >= 10), emb.where(col("vec_id") < 10),
        "vec_id", "embedding", 0.35)
    }),

    "ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.annTopKBruteForce(
        emb.where(col("vec_id") < 10), emb.where(col("vec_id") >= 10),
        "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
    }),

    "ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.annIvf(
        emb.where(col("vec_id") < 10), emb.where(col("vec_id") >= 10),
        "vec_id", "embedding", 5, 16, 4)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
    }),

    // FAISS-shaped two-stage ANN: IVF prunes (probed cells only), PQ
    // code-table sums score the candidates in exact integer nano-units
    // (order-independent), exact cosine reranks only the shortlist
    "ann_ivf_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.annIvfPq(
        emb.where(col("vec_id") < 10), emb.where(col("vec_id") >= 10),
        "vec_id", "embedding", k = 5, nCells = 16, nProbe = 4,
        dims = 64, nSub = 8, nCodes = 16, shortlist = 20)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
    }),

    // measured recall@5 of the TRAINED IVF path (integer-frozen
    // k-means, 3 Lloyd iterations) at the deployed (16 cells, 4
    // probes) point vs brute-force truth — the ann twin of
    // lsh_recall_eval_deployed: every approximate channel ships with
    // a number, including the trained one
    "ann_recall_eval" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.annRecallEval(
        emb.where(col("vec_id") < 10), emb.where(col("vec_id") >= 10),
        "vec_id", "embedding", k = 5, nCells = 16, nProbe = 4, iters = 3)
    }),

    // SemDeDup (Abbas et al. 2023): embedding-space dedup made
    // tractable by clustering — pairs form only INSIDE a cell, prune
    // the cluster-mates an eps-neighbor dominates (keep the one
    // farthest from the centroid, the paper's keep rule). Cells come
    // from the log-depth bisecting tree (one frozen Lloyd refinement
    // per split level): train+assign is O(n·log nCells) where the
    // flat broadcast argmax was n²/64 under the self-scaling rule —
    // the one super-linear term the round-12 chain measured. nCells
    // is SELF-SCALING (cellsPlan: expected cell ≤ 64 rows at ANY n —
    // a fixed count makes the intra-cell join quadratic under corpus
    // growth); the oracle replays the same count-derived value and
    // unrolls the same tree
    "semdedup_prune" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.semDedup(emb, "vec_id", "embedding",
        nCells = Similarity.cellsPlan(emb.count(), 64), iters = 1, eps = 0.4,
        targetRows = 64)
        .select(col("vec_id"), col("cell_id").cast("long").as("cell_id"),
          col("cent_cos_micro"), col("kept"))
    }),

    // distributed kNN JOIN — top-k retrieval for EVERY row of a large
    // query set (the kNN-LM / RAG-pretraining shape): both sides stay
    // distributed, candidates meet on IVF cell_id in a plain equi-join
    // Catalyst/AQE is free to plan; only the k·d centroid table is
    // ever broadcast. Parity split stands in for train-vs-retrieval
    // corpora of the SAME order of magnitude (what the broadcast
    // operators can't do).
    // measured fidelity of semDedup's order-independent DOMINANCE keep
    // rule vs the paper's SEQUENTIAL GREEDY scan at the same deployed
    // point — the two differ on eps-chains by design; this puts exact
    // integer numbers on the divergence (per cell: items, kept by
    // each rule, kept by both). Greedy runs as a row-local fold over
    // each cell's sorted member array — bounded because cellsPlan
    // bounds expected cell size at ANY corpus size
    // the eps OPERATING CURVE for the same dedup — prune rate at each
    // eps from ONE pair join (per-row max better-priority cosine ranks
    // against every eps at once); the knob the paper itself sweeps
    "semdedup_rate_curve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.semDedupRateCurve(emb, "vec_id", "embedding",
        nCells = Similarity.cellsPlan(emb.count(), 64), iters = 1,
        epss = Seq(0.2, 0.3, 0.4, 0.5, 0.6), targetRows = 64)
    }),

    "semdedup_fidelity_eval" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.semDedupFidelityEval(emb, "vec_id", "embedding",
        nCells = Similarity.cellsPlan(emb.count(), 64), iters = 1, eps = 0.4,
        targetRows = 64)
    }),

    // measured recall@3 of the BOTH-SIDES-DISTRIBUTED kNN join at its
    // deployed (cellsPlan cells, 2 probes) point vs brute-force truth
    // — the distributed path carries its own number instead of
    // borrowing ann_recall_eval's broadcast-path figure; query side
    // sampled to an absolute ~256 bound (the lshRecallEval rule,
    // modulus replayed by the oracle from its own count)
    "knn_recall_eval" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") % 2 === 1)
      Similarity.knnJoinRecallEval(
        emb.where(col("vec_id") % 2 === 0), corpus,
        "vec_id", "embedding", k = 3,
        nCells = Similarity.cellsPlan(corpus.count(), 64), nProbe = 2,
        iters = 1, sampleMod = 1, targetRows = 64)
    }),

    // the recall-vs-nProbe OPERATING CURVE for the same join — tree
    // and brute-force truth built once, one beam descent per probe
    // width, exact integer hit counts per point; this is how a
    // consumer picks the probe width for a recall target (SURVEY
    // names the >=0.9 point measured here)
    "knn_recall_curve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") % 2 === 1)
      Similarity.knnJoinRecallCurve(
        emb.where(col("vec_id") % 2 === 0), corpus,
        "vec_id", "embedding", k = 3,
        nCells = Similarity.cellsPlan(corpus.count(), 64),
        nProbes = Seq(2, 4, 8, 16), iters = 1, sampleMod = 1, targetRows = 64)
    }),

    // nCells follows the CORPUS side's count via cellsPlan (expected
    // cell ≤ 64 rows at ANY n): candidates ≈ nQueries·nProbe·64,
    // linear, where a fixed count is quadratic under growth; corpus
    // assignment and query probing both walk the log-depth bisecting
    // tree (beam descent), so no side ever scores all nCells cells
    "knn_join_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") % 2 === 1)
      Similarity.knnJoinIvf(
        emb.where(col("vec_id") % 2 === 0), corpus,
        "vec_id", "embedding", k = 3,
        nCells = Similarity.cellsPlan(corpus.count(), 64), nProbe = 2, iters = 1,
        targetRows = 64)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
    }),

    // ---- §2b: embedding preparation ---------------------------------
    // Unit-normalize every vector with the native one-pass kernel;
    // sequential-order square sum + IEEE-exact sqrt/divide make every
    // output component bit-identical to the oracle's index-order fold.
    // Components exploded to scalar rows (driver compare can't hash
    // list cells), which pins every dimension of every vector.
    "embed_normalize" -> ((s, dir) =>
      Embeddings.normalize(t(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), col("norm"), posexplode(col("unit")))
        .select(col("vec_id"), col("norm"), col("pos").cast("long").as("dim"),
          col("col").as("unit_val"))),

    // product-quantization encode: 64 dims → 8 sub-vector codes against
    // broadcast per-subspace codebooks; the ×16 join blowup collapses
    // map-side via partial min-agg — no window, no n×codes shuffle
    "embed_pq_encode" -> ((s, dir) =>
      Embeddings.pqEncode(t(s, dir, "embeddings"), "vec_id", "embedding",
        dims = 64, nSub = 8, nCodes = 16)),

    // Symmetric int8 quantization (native kernel, scan-stage, zero
    // shuffle); floor-based rounding so codes are engine-portable.
    "embed_quantize" -> ((s, dir) =>
      Embeddings.quantizeI8(t(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), col("scale"), posexplode(col("qvec")))
        .select(col("vec_id"), col("scale"), col("pos").cast("long").as("dim"),
          col("col").as("q"))),

    // Per-label norm statistics summed in exact integer 1e-4 units —
    // order-independent reduction, safe under partial aggregation.
    "embed_norm_stats" -> ((s, dir) =>
      Embeddings.normStats(t(s, dir, "embeddings"), "embedding", "label")),

    // Per-label centroids with components fixed to integer millionths
    // BEFORE summing — associative adds, partition-order-independent.
    "embed_centroids" -> ((s, dir) =>
      Embeddings.centroids(t(s, dir, "embeddings"), "embedding", "label")),

    // embedding-space regression test between snapshots (vec_id
    // parity stands in for old/new crawls): per-label centroid cosine
    // + L2 shift, exact integer component sums, dim-ordered row-local
    // folds — deterministic at any parallelism
    "embed_drift" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Embeddings.centroidDrift(
        emb.where(col("vec_id") % 2 === 0),
        emb.where(col("vec_id") % 2 =!= 0),
        "embedding", "label")
    }),

    // dedup burden per source: which sources pay the near-dup tax —
    // docs in ≥1 minhash@0.8 pair (band miss ≈5e-8, so the exact-SQL
    // oracle is sound), rolled up as an exact-integer rate
    "neardup_rate_by_source" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minHashNearDups(docs, "doc_id", "text", 0.8)
      val members = pairs.select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
        .distinct()
      docs.join(members.withColumn("hit", lit(1)), Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), count(col("hit")).as("n_near_dup"))
        .select(col("source"), col("n_docs"), col("n_near_dup"),
          (floor(col("n_near_dup").cast("double") / col("n_docs") * 10000 + lit(0.5))
            / 10000).as("dup_rate"))
    }),

    // ---- §2b: text analysis -----------------------------------------
    "text_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.langId(TextAnalysis.tokens(col("text"))).as("lang_pred"))),

    // langid EVAL: confusion matrix of the heuristic against labels —
    // approximations ship with numbers (the recall-harness principle
    // applied to classification); one vocabulary-bounded agg
    "langid_confusion" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"),
          TextAnalysis.langId(TextAnalysis.tokens(col("text"))).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))),

    "text_quality" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        round(TextAnalysis.tokenCharSum(toks).cast("double") /
          greatest(size(toks), lit(1)).cast("double"), 4).as("avg_token_len"),
        round(TextAnalysis.stopwordHits(toks).cast("double") /
          greatest(size(toks), lit(1)).cast("double"), 4).as("stop_ratio"),
        round(TextAnalysis.qualityScore(col("text"), toks), 4).as("quality"))
    }),

    "text_tokens" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_ws_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"))),

    "text_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(TextAnalysis.tokens(col("text"))).as("fp"))),

    // Corpus-wide top-k terms: partial count per term, shuffle bounded
    // by vocabulary size, TakeOrderedAndProject (per-partition k-heap,
    // no global sort). Deterministic tie-break by term text.
    "corpus_top_terms" -> ((s, dir) =>
      TextAnalysis.topTerms(t(s, dir, "documents"), "text", 20)),

    // ---- §2b: multimodal plumbing -----------------------------------
    // REAL container headers round-tripped: the synthetic tables carry
    // no media bytes, so the query manufactures valid PNG/JPEG headers
    // (dimensions derived from row fields), then the partition-parallel
    // JVM parser (IHDR read / generic JPEG marker walk) must invert
    // them — the oracle recomputes the expected fields from the source
    // columns, so any parse or construction bug breaks the hash
    "multimodal_meta" -> ((s, dir) => {
      val w = (lit(16) + col("doc_id") % 1904).cast("int")
      val h = (lit(16) + col("n_chars") % 1064).cast("int")
      val payload = when(col("doc_id") % 2 === 0,
        Multimodal.pngPayload(w, h)).otherwise(Multimodal.jpegPayload(w, h))
      Multimodal.imageMeta(
        t(s, dir, "documents").select(col("doc_id"), payload.as("payload")),
        "doc_id", "payload")
    }),

    "multimodal_frames" -> ((s, dir) =>
      Multimodal.frameSample(
        t(s, dir, "documents").withColumn("payload", Multimodal.utf8Payload(col("text"))),
        "doc_id", "payload", 4)),

    // FULL pixel decode (not just headers): construct a real BMP
    // 24-bit (even ids: LE headers, bottom-up rows, BGR, padded
    // stride) or PPM P6 (odd ids: comment-bearing ASCII header) per
    // doc from its id, decode it back, and emit exact-integer plain +
    // position-weighted per-channel sums. The pixel formula
    // (id + 3p + c) mod 256 has a closed form the oracle replays, and
    // the weighted sums are order-sensitive — a decoder that misreads
    // row order, channel order, or stride padding fails the hash.
    "multimodal_decode" -> ((s, dir) =>
      Multimodal.pixelStats(
        Multimodal.syntheticImages(t(s, dir, "documents").select(col("doc_id")), "doc_id"),
        "doc_id", "img")),

    // PNG is NOT stubbed: java.util.zip IS zlib, so construct real
    // compressed PNGs (per-row filters cycling through all five types)
    // and fully decode them back — chunk walk, CRC32 verify, inflate,
    // unfilter. Same closed-form position-weighted oracle as above;
    // only entropy-coded JPEG remains a documented decode stub.
    "multimodal_png_decode" -> ((s, dir) =>
      Multimodal.pixelStats(
        Multimodal.syntheticPngImages(t(s, dir, "documents").select(col("doc_id")), "doc_id"),
        "doc_id", "img")),

    // JPEG is no longer stubbed either: Jpeg.scala is a REAL baseline
    // JFIF codec (standard-table Huffman, FF00 stuffing, dequant,
    // IDCT, fixed-point YCbCr->RGB). Per-block-CONSTANT synthetics are
    // DC-only under the DCT, so even an entropy-coded lossy format
    // round-trips bit-exactly and the oracle replays the decode in
    // closed form.
    "multimodal_jpeg_decode" -> ((s, dir) =>
      Multimodal.pixelStats(
        Multimodal.syntheticJpegImages(t(s, dir, "documents").select(col("doc_id")), "doc_id"),
        "doc_id", "img")),

    // progressive (SOF2) closes the r9 "last codec a crawl actually
    // hits" gap: ten scans — interleaved DC, split spectral AC bands,
    // successive-approximation refinement passes with EOB-run and
    // correction-bit coding — decoded by the same Jpeg.scala through
    // per-component coefficient accumulation + one final IDCT pass.
    // Block-constant content keeps the decode bit-exact, so the same
    // closed-form oracle replays a genuinely multi-scan payload.
    "multimodal_jpeg_progressive" -> ((s, dir) =>
      Multimodal.pixelStats(
        Multimodal.syntheticProgressiveJpegImages(
          t(s, dir, "documents").select(col("doc_id")), "doc_id"),
        "doc_id", "img")),

    // GIF closes the palette-indexed tier: REAL GIF89a payloads (LZW
    // sub-blocks, comment + graphic-control extensions, odd ids
    // interlaced) decoded back through variable-width LZW expansion,
    // palette mapping, and the four-pass de-interlace. Conformance is
    // pinned both directions against the JDK's ImageIO plugin in
    // GifSpec, so encoder and decoder can't share a compensating bug;
    // the decoded RGB has the closed form the oracle replays.
    "multimodal_gif_decode" -> ((s, dir) =>
      Multimodal.pixelStats(
        Multimodal.syntheticGifImages(t(s, dir, "documents").select(col("doc_id")), "doc_id"),
        "doc_id", "img")),

    // video completes the set: an uncompressed AVI is a RIFF container
    // (the WAV walk) of DIB rasters (the BMP row rules), so REAL frame
    // extraction needs no codec either — one output row per decoded
    // frame, the shape downstream frame sampling/dedup consumes.
    "multimodal_avi_frames" -> ((s, dir) =>
      Multimodal.videoFrameStats(
        Multimodal.syntheticVideos(t(s, dir, "documents").select(col("doc_id")), "doc_id"),
        "doc_id", "avi")),

    // audio is real too: WAV/PCM is uncompressed, so construct genuine
    // RIFF/WAVE clips (mono AND stereo, ancillary LIST chunk) and decode
    // them back — chunk walk, fmt validation, s16le samples; exact
    // integer per-channel plain + position-weighted sums, closed-form
    // oracle. Entropy-coded audio (MP3/AAC) would be the stub tier.
    "multimodal_wav_decode" -> ((s, dir) =>
      Multimodal.audioStats(
        Multimodal.syntheticAudio(t(s, dir, "documents").select(col("doc_id")), "doc_id"),
        "doc_id", "wav")),

    // G.711 A-law/µ-law expansion (WAVE formats 6/7): samples are
    // canonical decode levels, so the companded round trip is exact
    // and the oracle inlines the decode tables (single source of
    // truth: Multimodal.alawDecodeTable/mulawDecodeTable)
    "multimodal_companded_decode" -> ((s, dir) =>
      Multimodal.audioStats(
        Multimodal.syntheticCompandedAudio(
          t(s, dir, "documents").select(col("doc_id")), "doc_id"),
        "doc_id", "wav")),

    // IMA ADPCM block decode (WAVE format 0x11): per-block-constant
    // signals reproduce exactly through the lossy coder (header sample
    // verbatim + zero-delta nibbles), pinning the block walk, header
    // parse, and nibble unpacking against a closed-form oracle
    "multimodal_adpcm_decode" -> ((s, dir) =>
      Multimodal.audioStats(
        Multimodal.syntheticAdpcmAudio(
          t(s, dir, "documents").select(col("doc_id")), "doc_id"),
        "doc_id", "wav")),

    // REAL FLAC round trip — the lossless entropy-coded audio tier
    // (Rice-coded fixed/LPC prediction, CRC-8/16 + MD5 verified):
    // construct side covers all four stereo assignments, fixed and
    // LPC predictors, and partition orders 0-2 per id; samples are
    // the same closed form as multimodal_wav_decode so the oracle is
    // byte-for-byte the WAV one — lossless coding is the claim
    "multimodal_flac_decode" -> ((s, dir) =>
      Multimodal.audioStats(
        Multimodal.syntheticFlacAudio(
          t(s, dir, "documents").select(col("doc_id")), "doc_id"),
        "doc_id", "flac", codec = "flac")),

    // ---- §2b: PII scan / semi-structured / temporal -----------------
    "text_pii" -> ((s, dir) =>
      t(s, dir, "documents").select(
        (col("doc_id") +: TextAnalysis.piiCounts(col("text")) :+
          TextAnalysis.piiFlag(col("text")).as("has_pii")): _*)),

    // PII scrubbing: typed-tag redaction of flagged docs (the action
    // downstream of the text_pii scan)
    "pii_redact" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(TextAnalysis.piiFlag(col("text")))
        .select(col("doc_id"), TextAnalysis.piiRedact(col("text")).as("redacted"))),

    "events_json" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))),

    "orders_by_month" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))),

    "token_cooccurrence" -> ((s, dir) =>
      TextAnalysis.tokenCooccurrence(t(s, dir, "documents"), "doc_id", "text", 50L)
        .select(col("tok_a"), col("tok_b"), col("n_pair"), round(col("lift"), 6).as("lift"))),

    // ---- §2b: corpus assembly ---------------------------------------
    // deterministic language-mix rebalancing: per-stratum keep rates
    // decided by a row-local Lehmer hash (reproducible in any engine)
    "sample_stratified" -> ((s, dir) =>
      Corpus.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.8, "es" -> 0.5, "de" -> 0.5, "fr" -> 0.3, "zh" -> 0.1))
        .select(col("doc_id"), col("lang"), col("source"))),

    // T5-style denoising pairs: ~15% of tokens masked in spans, runs
    // collapsed to <X> sentinels, target = the masked spans — the
    // corpus→training-pairs step, deterministic per (doc, position)
    "span_corrupt" -> ((s, dir) =>
      Corpus.spanCorrupt(t(s, dir, "documents"), "doc_id", "text")),

    // EXACT k per stratum (rate-based sampling only hits k in
    // expectation): deterministic Lehmer-hash rank within each
    // language, first 50 survive
    "group_sample_topk" -> ((s, dir) =>
      Corpus.groupSampleTopK(t(s, dir, "documents"), "doc_id", "lang", 50)
        .select(col("doc_id"), col("lang"), col("source"))),

    // crawl-container surface: one .warc blob per source (records in
    // doc order), parsed back record-by-record from raw bytes — the
    // parser only sees bytes, the oracle only sees source fields
    "warc_roundtrip" -> ((s, dir) =>
      Warc.roundTrip(t(s, dir, "documents"), "doc_id", "text", "source")),

    // the same round trip through PER-RECORD GZIP MEMBERS — the
    // .warc.gz layout CommonCrawl actually ships (one RFC 1952 member
    // per record, members concatenated); lenient multi-member gunzip
    // feeds the same stops-never-throws record walker
    "warc_gzip_roundtrip" -> ((s, dir) =>
      Warc.roundTrip(t(s, dir, "documents"), "doc_id", "text", "source",
        gzipMembers = true)),

    // serialization surface: documents → JSONL lines → parsed back,
    // graded against the source fields — proves the to_json/from_json
    // loop is lossless including text escaping
    "jsonl_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, lang STRING, text STRING")
      docs.select(to_json(struct(col("doc_id"), col("lang"), col("text"))).as("line"))
        .select(from_json(col("line"), schema).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
          col("r.text").as("text"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          sum(length(col("text")).cast("long")).as("sum_text_len"))
    }),

    // quality-weighted Poisson sampling: inclusion probability ∝ the
    // doc's weight (n_chars here), frozen row-locally in exact integer
    // micro-units — with the Horvitz-Thompson realized-vs-expected gap
    // per language as the in-query sanity check
    "weighted_sample" -> ((s, dir) =>
      Corpus.weightedSampleReport(t(s, dir, "documents"), "doc_id", "n_chars",
        "lang", 2000L)),

    // training-shard assembly: token-budget packing, windowed per shard
    "pack_sequences" -> ((s, dir) =>
      Corpus.packSequences(t(s, dir, "documents"), "doc_id", "text", 512L, 4)
        .select(col("doc_id"), col("shard"), col("n_tokens"), col("pack_id"))),

    // shard-assembly QA: pack-fill decile histogram over the same
    // packing — ≤11 exact-integer rows out of one (shard, pack) agg
    "pack_fill_report" -> ((s, dir) =>
      Corpus.packFillReport(t(s, dir, "documents"), "doc_id", "text", 512L, 4)),

    // exact-dedup survivor ROWS (min-id winner with full payload)
    "dedup_survivors" -> ((s, dir) =>
      Corpus.dedupSurvivors(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))),

    // benchmark decontamination: distinct 3-gram overlap of each corpus
    // doc against the "eval set" (docs with id % 10 == 0); benchmark
    // shingle hashes broadcast, corpus never shuffled
    "decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.contamination(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", 3)
    }),

    // repetition quality signal: n-gram multiplicity stats per doc
    // (total / distinct / most-repeated 2-gram)
    "repetition_stats" -> ((s, dir) =>
      Corpus.repetitionStats(t(s, dir, "documents"), "doc_id", "text", 2)),

    // lexical diversity per doc: Simpson index + effective vocabulary
    // from exact integer Σc² — row-local one-pass kernel, zero shuffle
    "token_diversity" -> ((s, dir) =>
      Corpus.tokenDiversity(t(s, dir, "documents"), "doc_id", "text")),

    // global-quantile quality gate: keep docs at/above the corpus-wide
    // p75 of BPE-ish token count — one scalar agg broadcast into a
    // row-local filter, corpus never shuffled or ranked
    "quantile_gate" -> ((s, dir) =>
      Corpus.quantileFilter(
        t(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens")),
        "n_bpe_tokens", 0.75)),

    // bounded-state variant of the quantile gate: threshold from the
    // 1024-bin histogram sketch (nBins counters of agg state at ANY
    // corpus size vs exact percentile's per-distinct-value state);
    // exact quantile rides along so thr_err is measured in-query
    "quantile_gate_sketch" -> ((s, dir) =>
      Corpus.quantileFilterSketch(
        t(s, dir, "documents").select(col("doc_id"),
          TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens")),
        "n_bpe_tokens", 0.75, 100L, 1024)),

    // context-window preparation: overlapping token chunks (w=64, s=48)
    // — row-local explode+slice, no shuffle, bounded blowup n/s
    "chunk_sliding" -> ((s, dir) =>
      Corpus.chunkSliding(t(s, dir, "documents"), "doc_id", "text", 64, 48)),

    // mixture capping: no source may exceed 30% of the corpus; rate
    // table broadcast into the deterministic hash filter
    "source_cap" -> ((s, dir) =>
      Corpus.capSources(t(s, dir, "documents"), "doc_id", "source", 0.3)
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))),

    // stable train/val/test assignment: per-doc split + per-split
    // counts — adding docs never moves existing docs between splits
    "split_assign" -> ((s, dir) =>
      Corpus.assignSplits(t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .groupBy(col("split")).agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"))),

    // deterministic training-order shuffle: nShards independent
    // scramble-ordered windows, never one global ORDER BY
    "shuffle_shards" -> ((s, dir) =>
      Corpus.shuffleShards(t(s, dir, "documents"), "doc_id", 8)),

    // boilerplate scoring: fraction of each doc's distinct 2-gram
    // shingles that recur across ≥30 docs (C4-style repeated-content
    // signal); df aggregation on 8-byte hashes, frequent set broadcast
    "boilerplate_score" -> ((s, dir) =>
      Corpus.boilerplateScore(t(s, dir, "documents"), "doc_id", "text", 2, 30L)
        .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
          r4(col("boiler_ratio")).as("boiler_ratio"))),

    // grouped exact percentile bands (boxplot stats): one partial-
    // aggregable pass per group — quartiles in integer cents, computed
    // by the same interpolated-percentile both engines implement
    "group_boxplot" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("cents"))
      li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(cents, array(0.25, 0.5, 0.75))").as("qs"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("n"),
          posexplode(col("qs")).as(Seq("q_idx", "q_value")))
        .select(col("l_returnflag"), col("n"), col("q_idx").cast("long").as("q_idx"),
          col("q_value"))
    }),

    // RFM customer segmentation: recency/frequency/monetary per
    // customer, quartile labels against EXACT interpolated thresholds
    // computed in one partial-aggregable scan and broadcast back (the
    // quantile_gate pattern ×9 scalars) — customers are never globally
    // ranked; monetary stays in integer cents
    "orders_rfm" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(
          max(expr("unix_timestamp(o_orderdate) div 86400")).as("recency_day"),
          count(lit(1)).as("frequency"),
          sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("monetary_cents"))
      val thr = base.agg(
        expr("percentile(recency_day, 0.25)").as("r1"),
        expr("percentile(recency_day, 0.5)").as("r2"),
        expr("percentile(recency_day, 0.75)").as("r3"),
        expr("percentile(frequency, 0.25)").as("f1"),
        expr("percentile(frequency, 0.5)").as("f2"),
        expr("percentile(frequency, 0.75)").as("f3"),
        expr("percentile(monetary_cents, 0.25)").as("m1"),
        expr("percentile(monetary_cents, 0.5)").as("m2"),
        expr("percentile(monetary_cents, 0.75)").as("m3"))
      def qlabel(c: Column, t1: Column, t2: Column, t3: Column) =
        (lit(1) + (c >= t1).cast("int") + (c >= t2).cast("int")
          + (c >= t3).cast("int")).cast("long")
      base.crossJoin(broadcast(thr)).select(
        col("c_custkey"), col("recency_day"), col("frequency"), col("monetary_cents"),
        qlabel(col("recency_day"), col("r1"), col("r2"), col("r3")).as("r_q"),
        qlabel(col("frequency"), col("f1"), col("f2"), col("f3")).as("f_q"),
        qlabel(col("monetary_cents"), col("m1"), col("m2"), col("m3")).as("m_q"))
    }),

    // market-basket pair mining: parts co-purchased in the same order,
    // kept above a support threshold. ONE shuffle collects each
    // order's basket; pair generation is row-local over the sorted
    // basket array (bounded by order size ~7, never a corpus
    // self-join), and pair counts partial-agg before the pair-keyed
    // shuffle
    "basket_pairs" -> ((s, dir) =>
      Corpus.basketPairs(t(s, dir, "lineitem"), "l_orderkey", "l_partkey", 3L)),

    // pairwise source-overlap matrix: exact Jaccard between sources'
    // distinct shingle vocabularies — the "are these two crawls the
    // same sites?" gate run before mixture weights are chosen. Corpus
    // collapses to distinct (source, 8-byte shingle hash) in the scan
    // stage; per-hash join blowup bounded by nSources²
    "source_overlap" -> ((s, dir) =>
      Corpus.sourceOverlap(t(s, dir, "documents"), "source", "text", 3)),

    // ANALYZE-style planner statistics in one scan: per-column row/
    // null counts, lexicographic min/max, mean width, and NDV from
    // m-bounded HLL registers with the exact NDV carried as the
    // in-query error oracle
    "column_stats" -> ((s, dir) =>
      Corpus.columnStats(t(s, dir, "documents"),
        Seq("lang", "source", "doc_id", "n_chars"))),

    // the BOUNDED-STATE twin: pairwise source token-vocabulary
    // union/intersection from HLL registers (register-wise max = the
    // lossless merge, inclusion-exclusion for the intersection), exact
    // intersection carried so the sketch error is measured in-query —
    // at 100 TB the register table (2 KB/source) replaces the
    // vocabulary shuffle the exact path pays
    "source_overlap_hll" -> ((s, dir) =>
      Corpus.sourceOverlapHll(t(s, dir, "documents"), "source", "text")),

    // distributed BPE tokenizer training: the first 5 merge rules
    // learned from the corpus's own word-frequency table — pair
    // counting stays a map-side partial agg per step, the argmax is
    // one TakeOrderedAndProject row broadcast back into a row-local
    // literal replace; deterministic tie-break makes the merge table
    // engine-reproducible
    "bpe_train_steps" -> ((s, dir) =>
      TextAnalysis.bpeTrainSteps(t(s, dir, "documents"), "text", bpeSteps)),

    // APPLY the learned merges back to the corpus — the train→apply
    // loop closed: per-doc word and BPE-symbol counts after encoding
    // with the 5-rule table the trainer produced. The merge table is
    // one broadcast row; encoding is row-local string arithmetic with
    // zero extra shuffle beyond the per-doc count agg
    "bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.bpeEncode(docs, "doc_id", "text",
        TextAnalysis.bpeTrainSteps(docs, "text", bpeSteps), bpeSteps)
    }),

    // the learned tokenizer artifact as inspectable rows: every
    // symbol in the trainer's final vocabulary state with its
    // corpus-weighted token mass — same vocabulary-bounded fold, one
    // extra explode+agg
    "bpe_vocab" -> ((s, dir) =>
      TextAnalysis.bpeVocab(t(s, dir, "documents"), "text", bpeSteps)),

    // corpus bigram LM table: top continuations by count with exact
    // integer-ratio conditional probability; row-local bigram
    // generation, vocabulary-bounded aggs, TakeOrderedAndProject top-k
    "bigram_condprob" -> ((s, dir) =>
      TextAnalysis.bigramCondProb(t(s, dir, "documents"), "text", 5L, 50)),

    // per-source distinct-token estimate via linear counting on the
    // deterministic FNV hash: m-bounded sketch shuffle, exact side
    // carried to measure the estimate's error
    "cardinality_sketch" -> ((s, dir) =>
      Corpus.distinctSketch(t(s, dir, "documents"), "source", "text", 4096)),

    // Count-Min frequency sketch vs exact counts for the top-20
    // tokens: d×w counter table (order-independent sums — the only
    // deterministic CMS variant), min-over-rows estimate
    "freq_sketch" -> ((s, dir) =>
      TextAnalysis.freqSketchEval(t(s, dir, "documents"), "text", 4, 1024, 20)),

    // histogram quantile sketch vs exact percentiles: 1024 fixed bins
    // (one-bin-width error by construction), integer-count cumulative
    // walk on the bounded table, exact side measured alongside
    "quantile_sketch" -> ((s, dir) =>
      Corpus.quantileSketch(t(s, dir, "orders"), "o_totalprice", 65536L, 1024,
        Seq(0.5, 0.9, 0.99))),

    // ---- streaming replay: driver-graded streaming mirrors ----------
    // Each runs the Structured-Streaming mirror one-shot
    // (Trigger.AvailableNow) over the SAME graded parquet, folds the
    // final mapGroupsWithState emissions into its batch twin's exact
    // schema, and is checked by the SAME DuckDB oracle SQL — putting
    // the streaming state path inside the correctness gate, not only
    // the spec-level batch↔streaming equivalence harness (VERDICT r8
    // item 6). Monotone-state rule: emissions only grow (bitmap fills,
    // counters sum, ranks rise), so "final state" is the max-emission
    // per group even if AvailableNow split the input into several
    // micro-batches.

    // linear-counting distinct sketch: stream maintains the m-bit slot
    // bitmap per source (O(m) state), exact side batch-computed as in
    // the batch twin — oracle: cardinality_sketch's, verbatim
    "stream_cardinality_sketch" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val stream = graft.sources.Sources
        .streamTable(s, dir, "documents", docs.schema)
        .where(col("doc_id").isNotNull && col("text").isNotNull
          && col("source").isNotNull)
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .as[(String, String)]
      val out = graft.streaming.Streams.distinctSketchStream(stream, 4096)
        .toDF("source", "v_filled", "n_est")
      graft.streaming.Streams.runToMemoryAvailableNow(out, "g_stream_card",
        org.apache.spark.sql.streaming.OutputMode.Update())
      val fin = s.table("g_stream_card").groupBy(col("source"))
        .agg(max(struct(col("v_filled"), col("n_est"))).as("st"))
        .select(col("source"), col("st.v_filled"), col("st.n_est"))
      val exact = docs.select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .distinct().groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
      exact.join(fin, "source")
        .select(col("source"), col("n_exact"), col("v_filled"), col("n_est"))
    }),

    // HLL: stream holds m register BYTES per source (256 B at p=8 —
    // bounded at any vocabulary, unlike the linear-counting bitmap
    // which saturates); the last micro-batch's estimate is
    // bit-identical to the batch kernel — oracle: cardinality_hll's,
    // verbatim
    "stream_cardinality_hll" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val stream = graft.sources.Sources
        .streamTable(s, dir, "documents", docs.schema)
        .where(col("doc_id").isNotNull && col("text").isNotNull
          && col("source").isNotNull)
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .as[(String, String)]
      val out = graft.streaming.Streams.hllSketchStream(stream, 8)
        .toDF("source", "seq", "n_est")
      graft.streaming.Streams.runToMemoryAvailableNow(out, "g_stream_hll",
        org.apache.spark.sql.streaming.OutputMode.Update())
      val fin = s.table("g_stream_hll").groupBy(col("source"))
        .agg(max(struct(col("seq"), col("n_est"))).as("st"))
        .select(col("source"), col("st.n_est").as("n_est_hll"))
      val exact = docs.select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .distinct().groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
      exact.join(fin, "source")
        .select(col("source"), col("n_exact"), col("n_est_hll"))
    }),

    // Count-Min sketch: stream holds d counter rows (O(d·w) state);
    // top-k token list and slot mapping are batch-side as in the batch
    // twin, estimates read from the STREAMED counters — oracle:
    // freq_sketch's, verbatim
    "stream_freq_sketch" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.VectorExprs
      val docs = t(s, dir, "documents")
      val stream = graft.sources.Sources
        .streamTable(s, dir, "documents", docs.schema)
        .where(col("doc_id").isNotNull && col("text").isNotNull)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok")).as[String]
      val out = graft.streaming.Streams.freqSketchStream(stream, 4, 1024)
        .toDF("i", "counters")
      graft.streaming.Streams.runToMemoryAvailableNow(out, "g_stream_cms",
        org.apache.spark.sql.streaming.OutputMode.Update())
      val cms = s.table("g_stream_cms")
        .withColumn("tot", aggregate(col("counters"), lit(0L), _ + _))
        .groupBy(col("i")).agg(max_by(col("counters"), col("tot")).as("counters"))
        .select(col("i"), posexplode(col("counters")).as(Seq("slot", "c")))
        .select(col("i"), col("slot").cast("long").as("slot"), col("c"))
      val cnts = docs.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .persistTracked
      val sigd = cnts.select(col("tok"), col("n"),
        posexplode(VectorExprs.minhashSig(
          array(VectorExprs.tokenHash64(col("tok"))), 4)).as(Seq("i", "perm")))
        .select(col("tok"), col("i"), (col("perm") % 1024).as("slot"))
      val topk = cnts.orderBy(col("n").desc, col("tok")).limit(20)
      topk.join(sigd, Seq("tok"))
        .join(cms, Seq("i", "slot"))
        .groupBy(col("tok"), col("n"))
        .agg(min(col("c")).as("n_est"))
        .select(col("tok"), col("n").as("n_exact"), col("n_est"))
    }),

    // histogram quantile sketch: stream folds ONE nBins histogram
    // (O(nBins) state) and replays the cumulative walk per emission;
    // exact percentile side batch-computed as in the batch twin —
    // oracle: quantile_sketch's, verbatim
    "stream_quantile_sketch" -> ((s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val stream = graft.sources.Sources
        .streamTable(s, dir, "orders", orders.schema)
        .where(col("o_orderkey").isNotNull && col("o_totalprice").isNotNull)
        .select(col("o_totalprice")).as[Double]
      val out = graft.streaming.Streams
        .quantileSketchStream(stream, 65536L, 1024, Seq(0.5, 0.9, 0.99))
        .toDF("q", "rank", "est_upper")
      graft.streaming.Streams.runToMemoryAvailableNow(out, "g_stream_quant",
        org.apache.spark.sql.streaming.OutputMode.Update())
      val fin = s.table("g_stream_quant").groupBy(col("q"))
        .agg(max(struct(col("rank"), col("est_upper"))).as("st"))
        .select(col("q"), col("st.rank"), col("st.est_upper"))
      val exact = orders.agg(expr(
        "percentile(CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT), " +
          "array(0.5D, 0.9D, 0.99D))").as("exs"))
      fin.crossJoin(broadcast(exact))
        .withColumn("qi",
          when(col("q") === 0.5, 1).when(col("q") === 0.9, 2).otherwise(3))
        .select(col("q"), col("rank"), col("est_upper"),
          (floor(element_at(col("exs"), col("qi")) / 100 * 10000 + lit(0.5)) / 10000)
            .as("exact"))
    }),

    // daily anomaly gate in the lambda shape: watermarked day-window
    // counts on the stream (O(types) live state), z-scored against the
    // batch-side stats table through the shared zFlag expression —
    // oracle: event_daily_anomaly's, verbatim
    "stream_daily_anomaly" -> ((s, dir) => {
      val raw = t(s, dir, "events")
      val stats = Temporal.dailyStats(Temporal.dailyCounts(raw, "ts", "event_type"))
      val stream0 = graft.sources.Sources
        .streamTable(s, dir, "events", raw.schema)
        .where(col("event_type").isNotNull)
      val stream = stream0.withColumn("event_time",
        timestamp_micros(Temporal.epochUs(stream0, "ts")))
      val out = graft.streaming.Streams.dailyAnomalyStream(
        stream, stats, "event_time", "event_type", 2.0)
      graft.streaming.Streams.runToMemoryAvailableNow(out, "g_stream_anom",
        org.apache.spark.sql.streaming.OutputMode.Complete())
      s.table("g_stream_anom")
    }),

    // filter-funnel report: per-gate drop counts + pass count in ONE
    // corpus scan (row-local kernels, sum-of-CASEs, stack unpivot)
    "corpus_gate" -> ((s, dir) =>
      Corpus.corpusGate(t(s, dir, "documents"), "doc_id", "text", "lang",
        30, 0.6, 2L)),

    // upper-triangular feature covariance (first 16 dims): row-local
    // pair products in integer 1e-8 units, d²-bounded shuffle,
    // broadcast mean centering — the PCA/whitening/drift statistic
    "embed_covariance" -> ((s, dir) =>
      Embeddings.covarianceMatrix(t(s, dir, "embeddings"), "embedding", 16)),

    // per-doc surprisal under the corpus's own bigram LM: conditional
    // bits frozen once per (w1,w2) as integer micro-bits, so the
    // per-doc mean is an order-independent integer sum
    "doc_perplexity" -> ((s, dir) =>
      TextAnalysis.docPerplexity(t(s, dir, "documents"), "doc_id", "text")),

    // DSIR importance weights: target-LM vs corpus-LM log-ratio per
    // doc (target = English subcorpus), log-ratios frozen once per
    // bigram as integer micro-bits — the data-selection tilt toward a
    // target domain, as an order-independent integer sum
    "dsir_weights" -> ((s, dir) =>
      TextAnalysis.dsirWeights(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")),

    // CCNet-style head/middle/tail terciles per language by LM
    // surprisal: two broadcast percentile cutoffs per lang, bucket
    // assignment in the scan stage — no ntile window, no per-lang sort
    "quality_buckets" -> ((s, dir) => {
      val ppl = TextAnalysis.docPerplexity(t(s, dir, "documents"), "doc_id", "text")
      val scored = t(s, dir, "documents").select(col("doc_id"), col("lang"))
        .join(ppl, "doc_id")
        .select(col("doc_id"), col("lang"), col("avg_bits"))
      Corpus.qualityBuckets(scored, "doc_id", "lang", "avg_bits")
    }),

    // daily-volume anomaly gate: days where an event type's count is
    // ≥2 population σ from its mean — moments from exact integer
    // Σc/Σc² so the flagged set is parallelism-independent
    "event_daily_anomaly" -> ((s, dir) =>
      Temporal.dailyAnomaly(t(s, dir, "events"), "ts", "event_type", 2.0)),

    // exact triangle count over the co-purchase graph via
    // degree-ordered orientation: wedges only leave each triangle's
    // minimum-(deg,id) vertex, so the join blowup is O(Σ outdeg²) =
    // O(m^1.5) instead of hub-degree² — the clustering-coefficient
    // numerator at graph scale
    "graph_triangles" -> ((s, dir) =>
      operators.Graph.triangles(
        Corpus.basketPairs(t(s, dir, "lineitem"), "l_orderkey", "l_partkey", 2L)
          .select(col("part_a").as("u"), col("part_b").as("v")))),

    // deterministic integer PageRank over the co-purchase graph: ranks
    // in integer micro-units, per-edge contribution = rank div outdeg,
    // damping as integer (85·s) div 100 — every operation is an
    // associative integer op, so 5 fixed iterations are bit-identical
    // at any parallelism and in any engine (float PageRank can't make
    // that promise). Per iteration: one src-keyed join + one dst-keyed
    // partial-agg shuffle; localCheckpoint cuts lineage
    "graph_pagerank" -> ((s, dir) => {
      val pairs = Corpus
        .basketPairs(t(s, dir, "lineitem"), "l_orderkey", "l_partkey", 3L)
        .select(col("part_a").as("pa"), col("part_b").as("pb"))
      // persist the EDGE LIST, not just the joined contrib base: edges
      // feed deg, the contrib join, and the rank init — unpersisted,
      // the expensive basket-pairs subplan above would run 3x (it
      // dominated this query's bench time before the pin). Both
      // orientations come from ONE pass (a union of two selects would
      // mine the baskets twice before the persist materializes)
      val edges = pairs.select(explode(array(
        struct(col("pa").as("src"), col("pb").as("dst")),
        struct(col("pb").as("src"), col("pa").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .persistTracked
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      val contribBase = edges.join(deg, Seq("src"))
        .persistTracked
      var rank = edges.select(col("src").as("node")).distinct()
        .select(col("node"), lit(1000000L).as("r"))
        .localCheckpoint(false)
      for (_ <- 0 until 5) {
        rank = contribBase
          .join(rank.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst"), expr("r div d").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("s"))
          .select(col("dst").as("node"),
            expr("150000 + (85 * s) div 100").as("r"))
          .localCheckpoint(false)
      }
      rank.select(col("node").as("part"), col("r").as("rank_e6"))
    }),

    // data-quality audit: rule -> violation count. All row-local rules
    // evaluate in ONE fact scan (sum of CASEs, unpivoted via stack);
    // relational rules are an anti join (orphans) and a keyed agg
    // (duplicate pk) — the validation pass a pipeline runs before
    // training jobs consume a drop
    "dq_audit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val rowLocal = li.agg(
        sum(when(col("l_orderkey").isNull, 1).otherwise(0)).cast("long").as("nk"),
        sum(when(col("l_extendedprice") <= 0, 1).otherwise(0)).cast("long").as("np"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.5, 1).otherwise(0))
          .cast("long").as("bd"))
        .selectExpr("""stack(3,
          'lineitem_null_orderkey', nk,
          'lineitem_nonpositive_price', np,
          'lineitem_discount_range', bd) AS (rule, n_bad)""")
      val orphan = o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_bad"))
        .select(lit("orders_orphan_customer").as("rule"), col("n_bad"))
      val dupPk = li.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("c")).where(col("c") > 1)
        .agg(coalesce(sum(col("c")), lit(0L)).cast("long").as("n_bad"))
        .select(lit("lineitem_dup_pk").as("rule"), col("n_bad"))
      rowLocal.unionByName(orphan).unionByName(dupPk)
    }),

    // per-source token-budget fill: longest-first selection until each
    // source hits its token quota; histogram-level offsets broadcast,
    // per-doc running sums windowed per (source, length) group — never
    // one reducer per source
    "budget_select" -> ((s, dir) =>
      Corpus.budgetSelect(t(s, dir, "documents"), "doc_id", "text", "source", 800L)),

    // epoch expansion by mixture weight: small sources repeat
    // ceil-sqrt-proportionally (temperature upweighting realized as
    // integer repeat factors); the repeat table is a tiny agg
    // broadcast back, expansion is a row-local sequence explode —
    // corpus scanned once, output = Σ repeats_s·n_s rows
    "mixture_epochs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val reps = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val nMax = reps.agg(max(col("n")).as("n_max"))
      val factors = reps.crossJoin(broadcast(nMax))
        .select(col("lang"),
          ceil(sqrt(col("n_max").cast("double") / col("n"))).cast("long")
            .as("repeats"))
      docs.join(broadcast(factors), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("repeats"),
          explode(sequence(lit(1L), col("repeats"))).as("epoch"))
    }),

    // snapshot diff: the re-crawl report (added/removed/changed/
    // unchanged per doc) that gates incremental reprocessing; both
    // sides reduce to (id, hash) in their scans — text never shuffles.
    // Simulated snapshots: old = %7≠0, new = %5≠0 with %13 edits
    "snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val oldSnap = docs.where(col("doc_id") % 7 =!= 0).select(col("doc_id"), col("text"))
      val newSnap = docs.where(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev")))
            .otherwise(col("text")).as("text"))
      Corpus.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
        .select(col("id").as("doc_id"), col("status"))
    }),

    // novelty scoring: fraction of each doc's distinct 3-gram shingles
    // first seen in THIS doc (id-ordered corpus scan) — snapshot
    // freshness; duplicate-of-earlier docs score ≈0. One 8-byte-hash
    // shuffle; the novel count is the first-seen table re-grouped
    "shingle_novelty" -> ((s, dir) =>
      Corpus.shingleNovelty(t(s, dir, "documents"), "doc_id", "text", 3)),

    // temperature-based mixture weights (α=0.5): per-source sampling
    // weight ∝ sqrt(n) — the standard upweight-the-tail policy for
    // multi-source training mixes. sqrt is correctly rounded IEEE, and
    // the normalizer folds the per-source terms in source order, so
    // every weight is bit-reproducible on any engine. Two tiny aggs;
    // the corpus is scanned once and never shuffled.
    "source_mixture_weights" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val total = counts.agg(
        aggregate(
          transform(sort_array(collect_list(struct(col("source"), col("n_docs")))),
            x => sqrt(x.getField("n_docs"))),
          lit(0.0), (acc, x) => acc + x).as("tot"))
      counts.crossJoin(broadcast(total))
        .select(col("source"), col("n_docs"),
          r6(sqrt(col("n_docs")) / col("tot")).as("weight"))
    }),

    // cohort retention: users bucketed by first-activity week, activity
    // counted per (cohort week, weeks-since). ONE shuffle on user_id
    // collects each user's distinct active days; cohort and offsets
    // derive array-locally from that row (per-user state is bounded by
    // active days, KBs at worst), then one cell agg — never a
    // self-join of the event log, never a third pass
    "events_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev
        .select(col("user_id"), Temporal.epochDay(ev, "ts").as("day"))
        .groupBy(col("user_id")).agg(collect_set(col("day")).as("days"))
        .withColumn("cohort_day", array_min(col("days")))
        .select(col("user_id"),
          (col("cohort_day") / lit(7)).cast("long").as("cohort_week"),
          explode(array_distinct(transform(col("days"),
            d => ((d - col("cohort_day")) / lit(7)).cast("long")))).as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // distribution windows: percent_rank / cume_dist are ratios of
    // small exact integers — bit-identical across engines; ordering
    // made total with the event_id tie-break
    "window_cume" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      t(s, dir, "events").select(col("event_id"), col("user_id"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
    }),

    // leakage-safe splits: the split decision hashes the near-dup
    // CLUSTER label, so every member of a duplicate family lands in
    // the same split — the anti-leakage property per-doc hashing lacks
    "split_cluster_safe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val labels = Dedup.clusters(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.6), docs, "doc_id")
      Corpus.assignSplits(
        labels.select(col("id").as("doc_id"), col("cluster")),
        "cluster", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("cluster"), col("split"))
    }),

    // cross-modal: text-quality gate joined to the embedding table.
    // BOTH sides are corpus-proportional (filtered documents ×
    // embeddings), so no broadcast hint: AQE broadcasts the quality
    // side while it fits and falls back to a shuffle join at 100 TB —
    // a forced broadcast of a corpus-sized side would OOM the driver
    "crossmodal_join" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      val quality = t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text"), toks).as("quality"))
        .where(col("quality") > 0.5)
      t(s, dir, "embeddings")
        .join(quality, col("vec_id") === col("doc_id"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), round(avg(col("quality")), 4).as("avg_quality"))
    }),

    // raw single-node throughput probe: 100M-row generated scan
    // through filter+map+agg, entirely inside whole-stage codegen —
    // the shape laygo's per-item Python loops benchmark, at JVM speed
    "throughput_rangescan" -> ((s, _) =>
      Pipeline(s.range(100000000L).toDF("x"))
        .transform(_.filter(col("x") % 3 === 0)
          .map((col("x") * 2).as("y"))
          .reduceGlobal(count(lit(1)).as("n"), sum(col("y")).as("total")))
        .toDF),

    "distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))),

    "filtered_agg" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
          round(sum(when(col("o_totalprice") > 200000, col("o_totalprice"))), 2).as("big_total"),
          count(lit(1)).as("n"))),

    "string_shape" -> ((s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        upper(substring(col("c_name"), 1, 8)).as("prefix"),
        length(col("c_name")).cast("long").as("name_len"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"))),

    // ---- OLAP coverage: lag windows, rollup, exact percentiles ------
    "window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").select(col("event_id"), col("user_id"),
        round(col("value") - lag(col("value"), 1).over(w), 2).as("delta"))
    }),

    "rollup_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("g"), count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(col("l_returnflag"), col("l_linestatus"), col("g"), col("n"), col("sum_qty"))),

    "cube_agg" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("g"), count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("g"), col("n"), col("total"))),

    // exact interpolated percentiles with BOUNDED agg state: built-in
    // percentile() buffers every distinct value (O(n) memory — the
    // 100 TB OOM the 3-point sweep's steep sf3 segment flagged);
    // Corpus.percentileByKey reads them off a value-domain-bounded
    // counts table instead — same numbers, different memory contract
    "percentile_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Corpus.percentileByKey(li, "l_returnflag", "l_quantity", 0.5, "med_raw")
        .join(Corpus.percentileByKey(li, "l_returnflag", "l_extendedprice", 0.9, "p90_raw"),
          "l_returnflag")
        .select(col("l_returnflag"), round(col("med_raw"), 4).as("med_qty"),
          round(col("p90_raw"), 4).as("p90_price"))
    }),

    // ---- SQL surface: classic TPC-H shapes via spark.sql ------------
    "sql_tpch_q6" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
           FROM lineitem
           WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
             AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")
    }),

    // TPC-H Q1: the canonical partial-agg benchmark — nine aggregates
    // over a date-filtered scan, one shuffle of (flag,status) groups.
    "sql_tpch_q1" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             round(avg(l_quantity), 2) AS avg_qty,
             round(avg(l_extendedprice), 2) AS avg_price,
             round(avg(l_discount), 2) AS avg_disc,
             count(*) AS count_order
           FROM lineitem
           WHERE l_shipdate <= '1998-09-02'
           GROUP BY l_returnflag, l_linestatus""")
    }),

    // Q18-style: IN subquery with HAVING — Catalyst decorrelates to a
    // semi join against the pre-aggregated key set (one extra shuffle,
    // no per-row subquery execution).
    "sql_tpch_q18" -> ((s, dir) => {
      Seq("orders", "lineitem").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(
        """SELECT o_orderkey, o_orderdate::STRING AS orderdate, o_totalprice,
             round(sum(l_quantity), 2) AS total_qty
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                                GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
           GROUP BY o_orderkey, o_orderdate, o_totalprice""")
    }),

    // Scalar subquery: global average computed once, broadcast into
    // the row filter; threshold rounded to cents via the floor(+0.5)
    // protocol so both engines cut on the identical value.
    "scalar_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderstatus, count(*) AS n_above,
             round(sum(o_totalprice), 2) AS total_above
           FROM orders
           WHERE o_totalprice >
             (SELECT floor(avg(o_totalprice) * 100 + 0.5) / 100 FROM orders)
           GROUP BY o_orderstatus""")
    }),

    "sql_tpch_q3" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(
        """SELECT l_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             CAST(o_orderdate AS STRING) AS orderdate,
             o_orderpriority AS priority
           FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < '1995-03-15' AND l_shipdate > '1995-03-15'
           GROUP BY l_orderkey, o_orderdate, o_orderpriority
           ORDER BY revenue DESC, orderdate, l_orderkey LIMIT 10""")
    }),

    "sql_tpch_q5" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(
        """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA'
             AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
           GROUP BY n_name""")
    }),

    // TPC-H Q7: volume shipping between two nations by year — the
    // two-role dimension join (nation joined twice under different
    // aliases), both sides broadcast; one shuffle on the group key.
    "sql_tpch_q7" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem", "supplier", "nation")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(
        """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
             AND l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
           GROUP BY 1, 2, 3""")
    }),

    // TPC-H Q10: returned-item revenue per customer, top 20 — grouped
    // top-n over a fact-fact join (TakeOrderedAndProject, no global
    // sort materialization); deterministic tie-break on custkey.
    "sql_tpch_q10" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(
        """SELECT c_custkey, c_name,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
               AS DOUBLE) / 100.0 AS revenue,
             c_acctbal
           FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
             AND l_returnflag = 'R'
           GROUP BY c_custkey, c_name, c_acctbal
           ORDER BY revenue DESC, c_custkey LIMIT 20""")
    }),

    // TPC-H Q14: promo revenue share — the cross-engine-exact ratio
    // pattern: revenue fixed to integer cents per ROW (identical
    // doubles both engines), summed exactly (order-independent), the
    // percentage derived from the two exact integers.
    "sql_tpch_q14" -> ((s, dir) => {
      Seq("lineitem", "part").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(
        """WITH l AS (SELECT
               CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents,
               p_type
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01')
           SELECT
             CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT) AS promo_cents,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             CAST(floor(1000000.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS DOUBLE)
                   / sum(cents) + 0.5) AS DOUBLE) / 10000 AS promo_pct
           FROM l""")
    }),

    // TPC-H Q8 (adapted: p_type in place of the missing p_container
    // taxonomy): national market share — two-role nation join plus a
    // region filter, ratio derived from exact integer cents (the q14
    // protocol) so the share is bit-identical cross-engine.
    "sql_tpch_q8" -> ((s, dir) => {
      Seq("part", "supplier", "lineitem", "orders", "customer", "nation", "region")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(
        """WITH v AS (SELECT
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents,
               n2.n_name AS supp_nation
             FROM part JOIN lineitem ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n1 ON c_nationkey = n1.n_nationkey
             JOIN region ON n1.n_regionkey = r_regionkey
             JOIN nation n2 ON s_nationkey = n2.n_nationkey
             WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
               AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01')
           SELECT o_year,
             CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             CAST(floor(1000000.0 * CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN cents ELSE 0 END) AS DOUBLE)
                   / sum(cents) + 0.5) AS DOUBLE) / 10000 AS mkt_share_pct
           FROM v GROUP BY o_year""")
    }),

    // TPC-H Q9 (adapted: no partsupp table in the schema, so profit =
    // discounted revenue): profit by supplier nation × order year over
    // a part-name substring filter.
    "sql_tpch_q9" -> ((s, dir) => {
      Seq("part", "supplier", "lineitem", "orders", "nation")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(
        """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
               AS DOUBLE) / 100.0 AS profit
           FROM lineitem JOIN part ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE p_name LIKE '%red%'
           GROUP BY n_name, year(o_orderdate)""")
    }),

    // TPC-H Q13: customer order-count distribution — the left-outer
    // join with an ON-clause filter (unmatched customers count 0) and
    // a two-level aggregation.
    "sql_tpch_q13" -> ((s, dir) => {
      Seq("customer", "orders").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(
        """SELECT c_count, count(*) AS custdist
           FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                 FROM customer LEFT JOIN orders
                   ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
                 GROUP BY c_custkey) AS c_orders
           GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")
    }),

    // TPC-H Q17 (adapted: p_type for the missing p_container):
    // small-quantity revenue via a correlated scalar subquery (per-part
    // average quantity) — quantities are integral so the 0.2·avg
    // threshold is exact in both engines; the output derives from
    // integer cents (floor(x/7+0.5) instead of round to dodge
    // half-even vs half-up ties).
    "sql_tpch_q17" -> ((s, dir) => {
      Seq("lineitem", "part").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(
        """SELECT
             CAST(sum(cents) AS BIGINT) AS total_cents,
             CAST(floor(CAST(sum(cents) AS DOUBLE) / 7.0 + 0.5) AS DOUBLE) / 100.0 AS avg_yearly
           FROM (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
                 FROM lineitem JOIN part ON p_partkey = l_partkey
                 WHERE p_brand = 'Brand#1' AND p_type = 'SMALL'
                   AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                                     FROM lineitem l2
                                     WHERE l2.l_partkey = p_partkey)) AS small_qty""")
    }),

    // TPC-H Q22 (adapted: nationkey bucket for the missing phone
    // country code): positive-balance customers above the mean with no
    // recent orders — anti join + uncorrelated scalar subquery, the
    // mean compared in exact integer cents.
    "sql_tpch_q22" -> ((s, dir) => {
      Seq("customer", "orders").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(
        """WITH avg_bal AS (
             SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) * 1.0 / count(*) AS avg_cents
             FROM customer WHERE c_acctbal > 0.0)
           SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
             count(*) AS numcust,
             CAST(sum(cents) AS BIGINT) AS totacctbal_cents
           FROM (SELECT c_custkey, c_nationkey,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
                 FROM customer CROSS JOIN avg_bal
                 WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) > avg_cents
                   AND NOT EXISTS (SELECT 1 FROM orders
                                   WHERE o_custkey = c_custkey
                                     AND o_orderdate >= '2000-01-01')) AS rich_idle
           GROUP BY c_nationkey % 5 ORDER BY cntrycode""")
    }),

    // Per-document top-k TF-IDF terms: broadcast vocabulary-sized df
    // probe, integer-scaled idf (no logarithms), WindowGroupLimit
    // top-k per doc.
    "tfidf_top_terms" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", 3)),

    // ---- skew mitigation (SURVEY §4) --------------------------------
    "skew_salted_join" -> ((s, dir) =>
      Skew.saltedJoin(t(s, dir, "orders"), t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey", saltFactor = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))),

    "skew_two_phase" -> ((s, dir) =>
      Skew.twoPhaseSum(t(s, dir, "lineitem"), col("l_partkey"), col("l_quantity"), 8)
        .select(col("k"), round(col("total"), 2).as("total"))),

    // pre-flight skew audit: top-20 hottest event users with exact
    // per-mille share + count/mean ratio in integer micro-units — the
    // measurement that picks plain join vs salting vs AQE skew split
    "hot_key_report" -> ((s, dir) =>
      Skew.hotKeyReport(t(s, dir, "events"), "user_id", 20)),

    // hub-skew stress: every 5th orderkey collapses onto order 1, so
    // ONE join key holds ~20% of the fact side — the heavy-tailed
    // shape that puts a single shuffle partition hours behind at
    // 100 TB. The declarative plan leaves mitigation to the engine:
    // AQE's OptimizeSkewedJoin splits the hub partition at runtime
    // (PlanAuditSpec proves the mechanism ENGAGES on exactly this
    // query, not just that the config is set); Skew.saltedJoin is the
    // deterministic fallback, proven equivalent on the same data.
    "join_skew_hub" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("hub_key",
        when(col("l_orderkey") % 5 === 0, lit(1L)).otherwise(col("l_orderkey")))
      li.join(t(s, dir, "orders"), col("hub_key") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
    }),

    // approximate scale-path variant: recall < 1 by LSH construction,
    // but the hyperplane sign matrix is deterministic, so the oracle
    // replays the identical bucketing and the result is hash-checked
    "neardup_cosine_lsh" -> ((s, dir) =>
      Similarity.nearDupCosineLsh(t(s, dir, "embeddings"), "vec_id", "embedding",
        0.4, dims = 64, nBits = 8)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))),

    // measured recall of the production LSH near-dup: exact ground
    // truth on a deterministic half-sample (brute force is the POINT
    // of an eval harness — bounded by sampleMod, never the corpus),
    // LSH side is the deployed full-corpus operator
    "lsh_recall_eval" -> ((s, dir) =>
      Similarity.lshRecallEval(t(s, dir, "embeddings"), "vec_id", "embedding",
        0.4, dims = 64, nBits = 8, sampleMod = 2)),

    // contrastive triplets: nearest-neighbor positives + Lehmer-hash
    // deterministic negatives (row-local keep test sizes the pool, so
    // the corpus never ranks whole) — embedding-training data mining
    "contrastive_triplets" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.contrastiveTriplets(
        emb.where(col("vec_id") < 10), emb.where(col("vec_id") >= 10),
        "vec_id", "embedding", nAnchors = 10, negK = 3,
        poolKeepMod = 1000, poolKeepLt = 250)
        .select(col("anchor_id"), col("pos_id"), round(col("pos_cos"), 6).as("pos_cos"),
          col("neg_id"), col("slot"))
    }),

    // the recall lever lsh_recall_eval motivates: 3 OR-ed bucket
    // tables from ONE packed kernel pass (per-table bucket = bit
    // slice); candidate = collision in any table. Bits follow the
    // corpus (lshPlanBits, the graded scale rule — fixed 8 bits was
    // quadratic by construction, 19s at sf3 in the 3-point sweep),
    // capped at 16/table by the 63-bit packing this one-pass variant
    // trades for (beyond ~4M rows the per-table-kernel banded
    // operator is the deployed path)
    "neardup_cosine_lsh_multi" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val bits = math.min(Similarity.lshPlanBits(emb.count(), 64), 16)
      Similarity.nearDupCosineLshMulti(emb, "vec_id", "embedding",
        0.4, dims = 64, nBits = bits, nTables = 3)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
    }),

    // ---- curation family (round 9) ----------------------------------
    // Gopher-style rule gate: every rule a row-local boolean, pure scan
    // stage — runs before dedup so junk never reaches the shuffles
    "gopher_rules" -> ((s, dir) =>
      t(s, dir, "documents").select(
        (col("doc_id") +: Curation.gopherFlags(col("text"))): _*)),

    // Bloom-pruned semi join: the probe side is compressed to a
    // 128 KB bitmap literal evaluated at SCAN time; the exact semi
    // join afterwards only sees Bloom survivors, so the result is
    // exact while the shuffle carries ~priority-fraction of lineitem
    "bloom_semi_join" -> ((s, dir) => {
      val mBits = 1 << 20
      val urgent = t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
      val bits = Curation.bloomBuild(urgent, col("o_orderkey"), mBits, 5)
      t(s, dir, "lineitem")
        .where(Curation.bloomMightContain(bits, mBits, 5, col("l_orderkey")))
        .join(urgent.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
    }),

    // BM25 relevance over a fixed query-term set; integer-frozen idf,
    // fixed-order float sum (see Curation.bm25TopK exactness protocol)
    "bm25_topk" -> ((s, dir) =>
      Curation.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "hash", "merge", "window"), 50)),

    // blocked fuzzy ER via sorted neighborhood: rank-window candidates
    // (n·window comparisons, linear) + bounded-prefix levenshtein
    "er_blocked_pairs" -> ((s, dir) =>
      Curation.blockedPairs(t(s, dir, "documents"), "doc_id", "text",
        Seq("lang", "source"), prefixLen = 32, maxDist = 18, window = 8)
        .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))),

    // Z-order layout audit: value-based file assignment from the top
    // z bits (scan-local, no global sort) + per-file min/max spans —
    // the zone-map evidence that makes 2-D scan pruning work at 100 TB
    "zorder_layout" -> ((s, dir) =>
      Curation.zOrderLayout(t(s, dir, "lineitem"),
        col("l_partkey"), col("l_suppkey"), fileBits = 6)),

    // HyperLogLog per-source distinct tokens vs exact — the at-scale
    // successor to cardinality_sketch's linear counting (which
    // saturates); integer register ranks, exact-integer harmonic sum
    "cardinality_hll" -> ((s, dir) =>
      Corpus.hllSketch(t(s, dir, "documents"), "source", "text", p = 8)),

    // CMS inner-product join-cardinality estimate vs exact — the
    // planner statistic that flags exploding joins before paying for
    // them; sketch tables are d·w integers at ANY key cardinality
    "join_size_estimate" -> ((s, dir) =>
      Curation.joinSizeEstimate(
        t(s, dir, "lineitem"), col("l_orderkey"),
        t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT"),
        col("o_orderkey"), d = 4, w = 1024)),

    // telemetry dedup: drop repeats of the same (user, event_type)
    // within 60s of the previous occurrence — ONE shuffle on the
    // window key, O(1) lag state per partition stream; the per-type
    // survival counts are the monitoring signal
    "events_dedup_window" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("tus"), col("event_id"))
      ev.select(col("user_id"), col("event_type"), col("event_id"),
          Temporal.epochUs(ev, "ts").as("tus"))
        .withColumn("keep",
          lag(col("tus"), 1).over(w).isNull ||
            col("tus") - lag(col("tus"), 1).over(w) > 60000000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"))
    }),

    // driver-graded streaming replay of events_sessionize: AvailableNow
    // over the graded parquet through the O(1)-state lag-rule session
    // machine, final (user, session) rollup batch-side — oracle is the
    // batch twin's SQL verbatim
    "stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      val raw = t(s, dir, "events")
      val st0 = graft.sources.Sources.streamTable(s, dir, "events", raw.schema)
      val st = st0.select(col("user_id").as("user"), col("event_id").as("eventId"),
          Temporal.epochUs(st0, "ts").as("ts"), col("value"))
        .as[graft.streaming.Streams.SessIn]
      val out = graft.streaming.Streams.sessionizeStream(st, 1800000000L)
      graft.streaming.Streams.runToMemoryAvailableNow(out.toDF, "g_stream_sess",
        org.apache.spark.sql.streaming.OutputMode.Append())
      s.table("g_stream_sess")
        .groupBy(col("user"), col("sessionSeq"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
        .select(col("user").as("user_id"), col("sessionSeq").as("session_seq"),
          col("n_events"), col("session_value"))
    }),

    // driver-graded streaming replay of events_dedup_window: one long
    // of state per (user, event_type) — bounded unlike watermarked
    // dropDuplicates — same per-type survival counts as batch
    "stream_dedup_window" -> ((s, dir) => {
      import s.implicits._
      val raw = t(s, dir, "events")
      val st0 = graft.sources.Sources.streamTable(s, dir, "events", raw.schema)
      val st = st0.select(col("user_id").as("user"), col("event_type").as("eventType"),
          col("event_id").as("eventId"), Temporal.epochUs(st0, "ts").as("ts"))
        .as[graft.streaming.Streams.WDedupIn]
      val out = graft.streaming.Streams.dedupWindowStream(st, 60000000L)
      graft.streaming.Streams.runToMemoryAvailableNow(out.toDF, "g_stream_wdedup",
        org.apache.spark.sql.streaming.OutputMode.Append())
      s.table("g_stream_wdedup")
        .groupBy(col("eventType"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"))
        .select(col("eventType").as("event_type"), col("n_total"),
          col("n_kept"), col("n_dropped"))
    }),

    // per-user inter-event gap statistics (liveness/telemetry QA):
    // lag diff then a keyed agg — gaps are exact integer µs so the
    // sums are order-independent at any parallelism
    "events_gap_stats" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      ev.select(col("user_id"), col("event_id"), Temporal.epochUs(ev, "ts").as("tus"))
        .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          count(col("gap")).as("n_gaps"),
          min(col("gap")).as("min_gap_us"),
          max(col("gap")).as("max_gap_us"),
          floor(sum(col("gap")) / greatest(count(col("gap")), lit(1L)))
            .cast("long").as("avg_gap_us"))
    })
  )

  /** Deterministic derivation CTEs that reconstruct the TPC-H columns
    * the 7-table testdata lacks (partsupp, l_commitdate/l_receiptdate/
    * l_shipmode/l_shipinstruct, p_mfgr/p_container, s_address/s_phone/
    * s_comment), so q2/q4/q11/q12/q16/q19/q20/q21 can run with their
    * LITERAL spec structure instead of schema-adapted stand-ins
    * (VERDICT r8 item 4). Every derivation is a pure key-modulo
    * function computed identically by Spark and DuckDB from the same
    * SQL text — the single-source-of-truth property of [[portableTpch]]
    * is preserved, and cross-engine portability of each construct
    * (inline VALUES, window row_number/count, `||`, CASE over fixed
    * INTERVAL literals, CAST AS STRING) is pinned by the oracle gate
    * itself. Scale note: these CTEs are test scaffolding that makes the
    * spec shapes runnable on this corpus — `sup`'s global row_number is
    * a single-partition sort of the SUPPLIER dim (the broadcast-side
    * table by assumption), and `partsupp` is part×4 with a broadcast
    * join; both scan-linear in the fact tables' terms.
    */
  private val tpchSupCte: String =
    """sup AS (
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
               row_number() OVER (ORDER BY s_suppkey) - 1 AS sidx,
               'Address#' || CAST(s_suppkey AS STRING) AS s_address,
               '27-' || CAST(s_suppkey % 900 + 100 AS STRING) || '-' ||
                 CAST(s_suppkey * 7 % 9000 + 1000 AS STRING) AS s_phone,
               CASE WHEN s_suppkey % 13 = 2
                    THEN 'wake Customer slyly Complaints about the even deposits'
                    ELSE 'blithely regular requests haggle carefully' END AS s_comment
        FROM supplier)"""

  /** partsupp: 4 suppliers per part, TPC-H-style, with ps_suppkey drawn
    * from the ACTUAL supplier key domain via the sup index (so it also
    * works on DataGen key-shifted replicas); ps_supplycost is integer
    * cents per the money protocol. The supplier count is hoisted into a
    * 1-row cross join so the bucket key is computed entirely on the
    * probe side — with `% sup.scnt` inline, the join condition
    * referenced sup on BOTH sides and Spark planned a
    * BroadcastNestedLoopJoin: |part|·4 × |supplier| comparisons,
    * invisible at sf0.01 and quadratic at sf3 (q11 98s → the r9
    * 3-point scaling sweep caught it). With the scalar hoisted it is a
    * plain broadcast hash equi-join on sidx.
    */
  private val tpchPartsuppCte: String =
    """partsupp AS (
        SELECT ps_partkey, sup.s_suppkey AS ps_suppkey, ps_availqty, ps_supplycost
        FROM (SELECT p_partkey AS ps_partkey,
                     (p_partkey * 4 + g.i) % sc.n AS sidx_key,
                     (p_partkey * 13 + g.i * 7) % 9999 + 1 AS ps_availqty,
                     (p_partkey * 31 + g.i * 17) % 100000 + 100 AS ps_supplycost
              FROM part
              CROSS JOIN (VALUES (0), (1), (2), (3)) AS g(i)
              CROSS JOIN (SELECT count(*) AS n FROM supplier) AS sc)
        JOIN sup ON sup.sidx = sidx_key)"""

  /** lineitem + commit/receipt dates (fixed-interval offsets from
    * shipdate, branch by key modulo — ~50% of lines arrive after the
    * commit date, matching the spec's intent for q4/q12/q21) and
    * shipmode/shipinstruct over the spec value domains.
    */
  private val tpchLineitemCte: String =
    """lineitem_d AS (
        SELECT lineitem.*,
          CASE (l_orderkey * 3 + l_linenumber) % 5
            WHEN 0 THEN l_shipdate - INTERVAL 10 DAY
            WHEN 1 THEN l_shipdate + INTERVAL 5 DAY
            WHEN 2 THEN l_shipdate + INTERVAL 12 DAY
            WHEN 3 THEN l_shipdate + INTERVAL 25 DAY
            ELSE l_shipdate + INTERVAL 40 DAY END AS l_commitdate,
          CASE (l_orderkey + l_linenumber * 7) % 4
            WHEN 0 THEN l_shipdate + INTERVAL 3 DAY
            WHEN 1 THEN l_shipdate + INTERVAL 8 DAY
            WHEN 2 THEN l_shipdate + INTERVAL 18 DAY
            ELSE l_shipdate + INTERVAL 30 DAY END AS l_receiptdate,
          CASE (l_orderkey * 5 + l_linenumber) % 7
            WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL'
            WHEN 3 THEN 'SHIP' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL'
            ELSE 'FOB' END AS l_shipmode,
          CASE (l_orderkey + l_linenumber) % 4
            WHEN 0 THEN 'DELIVER IN PERSON' WHEN 1 THEN 'COLLECT COD'
            WHEN 2 THEN 'NONE' ELSE 'TAKE BACK RETURN' END AS l_shipinstruct
        FROM lineitem)"""

  /** part + p_mfgr (5 manufacturers keyed off partkey, dbgen-style) and
    * p_container over the spec's 5×8 container grid.
    */
  private val tpchPartCte: String =
    """part_d AS (
        SELECT part.*,
          'Manufacturer#' || CAST(p_partkey % 5 + 1 AS STRING) AS p_mfgr,
          CASE p_partkey % 5 WHEN 0 THEN 'SM' WHEN 1 THEN 'MED' WHEN 2 THEN 'LG'
            WHEN 3 THEN 'JUMBO' ELSE 'WRAP' END || ' ' ||
          CASE (p_partkey * 3) % 8 WHEN 0 THEN 'CASE' WHEN 1 THEN 'BOX'
            WHEN 2 THEN 'BAG' WHEN 3 THEN 'JAR' WHEN 4 THEN 'PKG'
            WHEN 5 THEN 'PACK' WHEN 6 THEN 'CAN' ELSE 'DRUM' END AS p_container
        FROM part)"""

  /** Builds one WITH block from derivation CTEs + query-specific CTEs,
    * then the query body — keeps each [[portableTpch]] entry's body the
    * literal TPC-H text (modulo the _d table-name suffixes and the
    * integer-cents money protocol).
    */
  private def tpchSql(ctes: Seq[String], body: String): String =
    ctes.mkString("WITH ", ", ", "\n") + body

  /** TPC-H shapes whose SQL is engine-portable verbatim: registered as
    * Spark queries AND as their own DuckDB oracles from one source of
    * truth (no drift possible). Together with the hand-built
    * q1/q3/q5/q6/q7/q8/q9/q10/q13/q14/q17/q18/q22 this completes all
    * 22 TPC-H query shapes. q2/q4/q11/q12/q16/q19/q20/q21 run the
    * LITERAL spec structure over the derivation CTEs above (predicate
    * constants adapted to this corpus's value domains so each query is
    * non-degenerate). Money follows the integer-cents protocol; every
    * ratio output is computed in doubles (never Spark DECIMAL division).
    */
  private val portableTpch: Map[String, (Seq[String], String)] = Map(

    // Q2 LITERAL: min-cost supplier per part, correlated min subquery
    // over partsupp re-restricted to the region — decorrelates to one
    // aggregate + self-join, no per-row probe. Constants adapted to the
    // corpus domain (p_type has no BRASS; ends-with LIKE preserved).
    "sql_tpch_q2" -> (Seq("part", "supplier", "nation", "region") ->
      tpchSql(Seq(tpchSupCte, tpchPartsuppCte, tpchPartCte),
        """SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr,
             s_address, s_phone, s_comment
         FROM part_d, sup, partsupp, nation, region
         WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
           AND p_size = 20 AND p_type LIKE '%DARD'
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND ps_supplycost = (
             SELECT min(ps_supplycost)
             FROM partsupp, sup, nation, region
             WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
               AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
               AND r_name = 'ASIA')
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""")),

    // Q4 LITERAL: priority count of orders with at least one line
    // received after its commit date — correlated EXISTS = left semi
    // hash join against the derived lineitem.
    "sql_tpch_q4" -> (Seq("orders", "lineitem") ->
      tpchSql(Seq(tpchLineitemCte),
        """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
           AND EXISTS (SELECT 1 FROM lineitem_d
                       WHERE l_orderkey = o_orderkey
                         AND l_commitdate < l_receiptdate)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Q11 LITERAL: partsupp stock value per part for one nation's
    // suppliers, kept above a fraction of the global total — the
    // HAVING scalar subquery recomputes the same aggregate (spec
    // shape); sums are exact integer cents·qty, the fraction multiply
    // is a double on values < 2^53 so both engines agree bit-exactly.
    // Fraction 0.003 (spec: 0.0001/SF) sized to this corpus so the
    // filter genuinely splits the groups.
    "sql_tpch_q11" -> (Seq("part", "supplier", "nation") ->
      tpchSql(Seq(tpchSupCte, tpchPartsuppCte),
        """SELECT ps_partkey,
           CAST(sum(ps_supplycost * ps_availqty) AS BIGINT) AS value_cents
         FROM partsupp, sup, nation
         WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
           AND n_name = 'NATION_1'
         GROUP BY ps_partkey
         HAVING sum(ps_supplycost * ps_availqty) > (
           SELECT sum(ps_supplycost * ps_availqty) * 0.003
           FROM partsupp, sup, nation
           WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
             AND n_name = 'NATION_1')
         ORDER BY value_cents DESC, ps_partkey""")),

    // Q12 LITERAL: shipmode receipt-discipline pivot — the canonical
    // conditional-count over a fact-fact join, with the spec's full
    // commit/receipt/ship ordering predicate.
    "sql_tpch_q12" -> (Seq("orders", "lineitem") ->
      tpchSql(Seq(tpchLineitemCte),
        """SELECT l_shipmode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM orders JOIN lineitem_d ON o_orderkey = l_orderkey
         WHERE l_shipmode IN ('MAIL', 'SHIP')
           AND l_commitdate < l_receiptdate
           AND l_shipdate < l_commitdate
           AND l_receiptdate >= '1996-01-01' AND l_receiptdate < '1997-01-01'
         GROUP BY l_shipmode ORDER BY l_shipmode""")),

    // Q15: top supplier by quarterly revenue — the view + scalar-max
    // pattern; the revenue CTE is evaluated once per consumer side
    // (aggregate reuse), max compared in exact integer cents.
    "sql_tpch_q15" -> (Seq("supplier", "lineitem") ->
      """WITH revenue AS (SELECT l_suppkey AS supplier_no,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS total_cents
           FROM lineitem
           WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, CAST(total_cents AS BIGINT) AS total_cents
         FROM supplier JOIN revenue ON s_suppkey = supplier_no
         WHERE total_cents = (SELECT max(total_cents) FROM revenue)
         ORDER BY s_suppkey"""),

    // Q16 LITERAL: distinct-supplier counts per part attribute over
    // partsupp, excluding complaint suppliers via NOT IN — the
    // null-aware anti join shape (the subquery's LIKE hits the
    // deterministic complaint fraction baked into sup.s_comment).
    "sql_tpch_q16" -> (Seq("part", "supplier") ->
      tpchSql(Seq(tpchSupCte, tpchPartsuppCte),
        """SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
         FROM partsupp JOIN part ON p_partkey = ps_partkey
         WHERE p_brand <> 'Brand#21' AND p_type NOT LIKE 'MEDIUM%'
           AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
           AND ps_suppkey NOT IN (
             SELECT s_suppkey FROM sup
             WHERE s_comment LIKE '%Customer%Complaints%')
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // Q19 LITERAL: disjunction of brand×container×size×quantity blocks
    // with the spec's shipmode/shipinstruct conjuncts — Catalyst
    // extracts the common conjuncts (shipmode IN, shipinstruct =) into
    // the scan and plans ONE hash join over the union of ranges, not
    // three scans. Brand/size windows adapted to the corpus domain so
    // every block is non-empty.
    "sql_tpch_q19" -> (Seq("lineitem", "part") ->
      tpchSql(Seq(tpchLineitemCte, tpchPartCte),
        """SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS revenue_cents
         FROM lineitem_d JOIN part_d ON p_partkey = l_partkey
         WHERE (p_brand = 'Brand#12'
                AND p_container IN ('SM CASE', 'SM BOX', 'SM PACK', 'SM PKG')
                AND l_quantity >= 1 AND l_quantity <= 21
                AND p_size BETWEEN 1 AND 15
                AND l_shipmode IN ('AIR', 'REG AIR')
                AND l_shipinstruct = 'DELIVER IN PERSON')
            OR (p_brand = 'Brand#23'
                AND p_container IN ('MED BAG', 'MED BOX', 'MED PKG', 'MED PACK')
                AND l_quantity >= 10 AND l_quantity <= 30
                AND p_size BETWEEN 1 AND 25
                AND l_shipmode IN ('AIR', 'REG AIR')
                AND l_shipinstruct = 'DELIVER IN PERSON')
            OR (p_brand = 'Brand#15'
                AND p_container IN ('LG CASE', 'LG BOX', 'LG PACK', 'LG PKG')
                AND l_quantity >= 20 AND l_quantity <= 40
                AND p_size BETWEEN 1 AND 35
                AND l_shipmode IN ('AIR', 'REG AIR')
                AND l_shipinstruct = 'DELIVER IN PERSON')""")),

    // Q20 LITERAL: suppliers of 'red' parts holding more stock than
    // half a year's shipments — nested IN over partsupp with the
    // correlated 0.5·sum(l_quantity) scalar subquery; quantities are
    // integral so the double threshold is exact. Pairs with no 1996
    // shipments compare against NULL and drop, in both engines alike.
    "sql_tpch_q20" -> (Seq("supplier", "lineitem", "part", "nation") ->
      tpchSql(Seq(tpchSupCte, tpchPartsuppCte),
        """SELECT s_name, s_address
         FROM sup, nation
         WHERE s_suppkey IN (
             SELECT ps_suppkey FROM partsupp
             WHERE ps_partkey IN (
                 SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
               AND ps_availqty > (
                 SELECT 0.5 * sum(l_quantity) FROM lineitem
                 WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                   AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'))
           AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
         ORDER BY s_name""")),

    // Q21 LITERAL: the EXISTS + NOT EXISTS pair over the derived
    // lineitem — semi join and anti join against the same subplan, the
    // q21 signature shape; late = l_receiptdate > l_commitdate per
    // spec (the derivation makes that true for ~50% of lines).
    "sql_tpch_q21" -> (Seq("supplier", "lineitem", "orders", "nation") ->
      tpchSql(Seq(tpchLineitemCte),
        """SELECT s_name, count(*) AS numwait
         FROM supplier, lineitem_d l1, orders, nation
         WHERE s_suppkey = l1.l_suppkey
           AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
           AND l1.l_receiptdate > l1.l_commitdate
           AND EXISTS (SELECT 1 FROM lineitem_d l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem_d l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_receiptdate > l3.l_commitdate)
           AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
         GROUP BY s_name ORDER BY numwait DESC, s_name"""))
  )

  /** DuckDB dot-product snippet with the same sequential left-to-right
    * fold order as the native DotProduct expression — bit-identical
    * doubles on both engines.
    */
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($a)), " +
      s"i -> $a[i] * $b[i])), (acc, x) -> acc + x)"

  /** DuckDB cosine(a,b) built from [[duckDot]] folds. */
  private def duckCos(a: String, b: String): String =
    s"(${duckDot(a, b)} / sqrt(${duckDot(a, a)} * ${duckDot(b, b)}))"

  /** Bisecting-tree CTE unroll over a prior CTE `c(nid, ce)` — the
    * DuckDB replay of [[graft.operators.Similarity.bisectAssigned]]:
    * ⌈log₂ nCells⌉ deterministic 2-way splits (seeds = the node's two
    * lowest-nid vectors; `iters` integer-frozen 2-means refinements
    * per level; child = 2·node + {0,1} by (cosine desc, child asc)
    * argmax on the SAME sequential-fold doubles as the engine),
    * followed by up to 4 SIZE-GUARDED extension levels in which only
    * nodes still holding more than `target` rows keep splitting —
    * the guard is the per-node integer member count, recomputed per
    * level from the same data as the engine's.
    *
    * The nominal depth `dd` is a scalar CTE computed from the SAME
    * count-derived cell expression as the engine's
    * (`Similarity.treeDepth(cellsPlan(n, t))` as pure integers);
    * levels are unrolled to `maxDepth` with act-guarded no-ops beyond
    * (a level where no node is active rewrites nothing), so one
    * static SQL replays any corpus whose dd + 4 ≤ maxDepth (maxDepth
    * = 10 covers corpora to ~4k rows at target 64; grading runs at
    * ≤2k). Emits per level the node-count table `ns$l(node, cnt,
    * act)`, the child tables `bk${l}_0..iters(node, child, ctv)`
    * plus the level's EFFECTIVE kid table `bkx$l` (refined kids on
    * nominal levels or when an active node exceeds 2x target, seed
    * kids otherwise — the engine's refinement-skip rule; the beam
    * replay probes `bkx$l`) and finally `fasg(nid,
    * ce, cell_id, cent_cos)` where cent_cos is the row's last
    * assignment cosine (never-split rows: cosine to the corpus'
    * frozen mean — the flat k=1 behavior).
    *
    * Every CTE is MATERIALIZED: the level chain references its
    * predecessor multiple times, and DuckDB's inliner would
    * otherwise re-expand the parquet scan exponentially in depth
    * (observed as a file-handle exhaustion at 10 levels).
    */
  private def duckBisectTree(
      iters: Int, maxDepth: Int, ncells: String, target: Int): String = {
    require(target > 0, "size guard needs a positive row target")
    val dd = "(SELECT dd FROM dp)"
    def level(l: Int): String = {
      val refine = (1 to iters).map { j =>
        s"""ba${l}_$j AS MATERIALIZED (SELECT nid, ce, node, child FROM (
               SELECT a.nid, a.ce, a.node, k.child,
                 row_number() OVER (PARTITION BY a.nid
                   ORDER BY ${duckCos("a.ce", "k.ctv")} DESC, k.child) AS rn
               FROM av$l a JOIN bk${l}_${j - 1} k USING (node)) WHERE rn = 1),
           bm${l}_$j AS MATERIALIZED (SELECT node, child, d,
                 CAST(sum(CAST(floor(ce[d] * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / CAST(count(*) * 1048576 AS DOUBLE) AS m
               FROM ba${l}_$j, generate_series(1, 64) t(d) GROUP BY node, child, d),
           bk${l}_$j AS MATERIALIZED (SELECT node, child, list(m ORDER BY d) AS ctv
               FROM bm${l}_$j GROUP BY node, child)"""
      }.mkString(",\n")
      val refineBlock = if (refine.isEmpty) "" else s"$refine,\n"
      s"""ns$l AS MATERIALIZED (SELECT node, count(*) AS cnt,
             (($l < $dd) OR ($l < $dd + 4 AND count(*) > $target)) AS act
           FROM lv$l GROUP BY node),
         av$l AS MATERIALIZED (SELECT a.nid, a.ce, a.node, a.acs
           FROM lv$l a JOIN ns$l n USING (node) WHERE n.act),
         bk${l}_0 AS MATERIALIZED (SELECT node, rn - 1 AS child, ce AS ctv FROM (
             SELECT node, ce, row_number() OVER (PARTITION BY node ORDER BY nid) AS rn
             FROM av$l) WHERE rn <= 2),
         ${refineBlock}bkx$l AS MATERIALIZED (
           -- the engine's refinement-skip rule, replayed from the same
           -- integer counts: extension levels (l >= dd) whose active
           -- nodes are ALL within 2x target use the seed kids
           SELECT node, child, ctv FROM bk${l}_$iters
             WHERE $l < $dd OR EXISTS (
               SELECT 1 FROM ns$l WHERE act AND cnt > 2 * $target)
           UNION ALL
           SELECT node, child, ctv FROM bk${l}_0
             WHERE NOT ($l < $dd OR EXISTS (
               SELECT 1 FROM ns$l WHERE act AND cnt > 2 * $target))),
         bf$l AS MATERIALIZED (SELECT nid, ce, node, child, kc FROM (
             SELECT a.nid, a.ce, a.node, k.child,
               ${duckCos("a.ce", "k.ctv")} AS kc,
               row_number() OVER (PARTITION BY a.nid
                 ORDER BY ${duckCos("a.ce", "k.ctv")} DESC, k.child) AS rn
             FROM av$l a JOIN bkx$l k USING (node)) WHERE rn = 1),
         lv${l + 1} AS MATERIALIZED (
           SELECT nid, ce, node * 2 + child AS node, kc AS acs FROM bf$l
           UNION ALL
           SELECT a.nid, a.ce, a.node, a.acs
           FROM lv$l a JOIN ns$l n USING (node) WHERE NOT n.act)"""
    }
    val levels = (0 until maxDepth).map(level).mkString(",\n")
    // FAIL LOUDLY when the corpus outgrows the static unroll: the
    // guarded extension needs dd + 4 <= maxDepth, i.e. the cell count
    // m <= 2^(maxDepth-4). Beyond that the replay would silently
    // truncate relative to the engine (and past 2^maxDepth the dd
    // subquery would go NULL, collapsing every row into one cell), so
    // dp raises instead of grading a diverged query.
    s"""dp AS MATERIALIZED (SELECT CASE
           WHEN m > (1::BIGINT << ${maxDepth - 4}) THEN
             error('duckBisectTree unroll overflow: nCells=' || m ||
                   ' needs depth+4 > $maxDepth levels; regenerate with larger maxDepth')
           WHEN m <= 1 THEN 0 ELSE
           (SELECT min(d) FROM generate_series(1, $maxDepth) t(d)
            WHERE (1::BIGINT << d) >= m) END AS dd
         FROM (SELECT ($ncells) AS m)),
       lv0 AS MATERIALIZED (SELECT nid, ce, 1::BIGINT AS node,
           NULL::DOUBLE AS acs FROM c),
       $levels,
       rmm AS MATERIALIZED (SELECT d,
             CAST(sum(CAST(floor(ce[d] * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / CAST(count(*) * 1048576 AS DOUBLE) AS m
           FROM c, generate_series(1, 64) t(d) GROUP BY d),
       rmv AS MATERIALIZED (SELECT list(m ORDER BY d) AS ctv FROM rmm),
       fasg AS MATERIALIZED (SELECT a.nid, a.ce, a.node AS cell_id,
           coalesce(a.acs, ${duckCos("a.ce", "r.ctv")}) AS cent_cos
         FROM lv$maxDepth a, rmv r)"""
  }

  /** Beam-descent CTE unroll over a prior CTE `q(query_id, qe)` — the
    * query-side replay of [[graft.operators.Similarity.knnJoinIvf]]'s
    * probe ladder: per level score the beam nodes' children from
    * `bkx$l` (emitted by [[duckBisectTree]] with the same
    * iters/maxDepth), keep the nProbe best by (score desc, node asc);
    * a beam node the level did not split has no child rows and passes
    * through with its carried score, competing in the same rank.
    * Emits `pr(query_id, qe, cell_id)`.
    */
  private def duckBeam(
      iters: Int, maxDepth: Int, nProbe: Int, pfx: String = ""): String = {
    // `pfx` namespaces the beam CTEs so one statement can descend the
    // same tree at several probe widths (the recall-curve oracle);
    // the final probe table is `pr$pfx`.
    def level(l: Int): String =
      s"""bx$pfx$l AS MATERIALIZED (SELECT b.query_id, b.qe,
             b.node * 2 + k.child AS cnode, ${duckCos("b.qe", "k.ctv")} AS sc
           FROM bq$pfx$l b JOIN bkx$l k USING (node)),
         bp$pfx$l AS MATERIALIZED (SELECT b.query_id, b.qe, b.node AS cnode, b.sc
           FROM bq$pfx$l b WHERE NOT EXISTS (
             SELECT 1 FROM bkx$l k WHERE k.node = b.node)),
         bq$pfx${l + 1} AS MATERIALIZED (
           SELECT query_id, qe, cnode AS node, sc FROM (
               SELECT query_id, qe, cnode, sc,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY sc DESC, cnode) AS rn
               FROM (SELECT * FROM bx$pfx$l UNION ALL SELECT * FROM bp$pfx$l))
             WHERE rn <= $nProbe)"""
    val levels = (0 until maxDepth).map(level).mkString(",\n")
    s"""bq${pfx}0 AS MATERIALIZED (SELECT query_id, qe, 1::BIGINT AS node,
           1.0::DOUBLE AS sc FROM q),
       $levels,
       pr$pfx AS MATERIALIZED (SELECT query_id, qe, node AS cell_id FROM bq$pfx$maxDepth)"""
  }

  /** Integer replay of `Similarity.cellsPlan(count(c), target)` as a
    * scalar subquery — the self-scaling cell count the engine derives
    * from the same corpus count.
    */
  private def duckCellsPlan(target: Int): String =
    s"(SELECT greatest(1, (count(*) + ${target - 1}) // $target) FROM c)"

  /** DuckDB FNV-1a 64 over a token's characters in unsigned-HUGEINT
    * mod-2^64 arithmetic — the same bit pattern as the native
    * `Fnv.mixBytes` (the xor only ever touches the low byte, so it is
    * computed on the BIGINT low byte and recombined). Tokens here are
    * ASCII, so `unicode(char)` IS the UTF-8 byte.
    */
  /** Staged-CTE replay of [[graft.functions.VectorExprs.fmix64]] (the
    * murmur3 finalizer) over an unsigned-HUGEINT hash column: xor via
    * signed-BIGINT round trips (two's complement keeps the bits), and
    * the wrapping 64-bit multiplies split at 2³² so no intermediate
    * exceeds HUGEINT range. Emits CTEs `f1..f5`; the input CTE must
    * expose (tok, h0), and `f5` exposes (tok, h).
    */
  private def duckFmixCtes(): String = {
    val u64 = "'18446744073709551616'::HUGEINT"
    def sgn(x: String) =
      s"(CASE WHEN $x >= '9223372036854775808'::HUGEINT THEN $x - $u64 ELSE $x END)::BIGINT"
    def uns(x: String) =
      s"(CASE WHEN $x < 0 THEN $x::HUGEINT + $u64 ELSE $x::HUGEINT END)"
    def xor64(a: String, b: String) = uns(s"xor(${sgn(a)}, ${sgn(b)})")
    def mulmod(u: String, c: String) =
      s"""((($u % 4294967296) * '$c'::HUGEINT +
          ((($u // 4294967296) * '$c'::HUGEINT) % 4294967296) * 4294967296) % $u64)"""
    s"""f1 AS (SELECT tok, ${xor64("h0", "(h0 // 8589934592)")} AS x1 FROM hh),
       f2 AS (SELECT tok, ${mulmod("x1", "18397679294719823053")} AS x2 FROM f1),
       f3 AS (SELECT tok, ${xor64("x2", "(x2 // 8589934592)")} AS x3 FROM f2),
       f4 AS (SELECT tok, ${mulmod("x3", "14181476777654086739")} AS x4 FROM f3),
       f5 AS (SELECT tok, ${xor64("x4", "(x4 // 8589934592)")} AS h FROM f4)"""
  }

  private def duckFnv(tok: String): String =
    s"""list_reduce(
       list_prepend('14695981039346656037'::HUGEINT,
         list_transform(generate_series(1, length($tok)), i -> unicode($tok[i])::HUGEINT)),
       (h, c) -> ((h - (h % 256) + xor((h % 256)::BIGINT, c::BIGINT)::HUGEINT)
                  * 1099511628211::HUGEINT) % '18446744073709551616'::HUGEINT)"""

  /** VALUES list (bit, 2^bit) for extracting the 64 bits of an
    * unsigned-HUGEINT hash: bit i of h = (h // 2^i) % 2.
    */
  private def duckBitPowers: String =
    (0 until 64).map(i => s"($i,'${BigInt(1) << i}'::HUGEINT)").mkString(",")

  /** The ±1 hyperplane row for one LSH bit as a DuckDB list literal —
    * the exact sign matrix of the native `HyperplaneBucket` kernel
    * (single source of truth: `VectorExprs.hyperplaneSign`).
    */
  private def duckHyperplaneArr(bit: Int, dims: Int): String =
    (0 until dims).map(d =>
      if (graft.functions.VectorExprs.hyperplaneSign(bit, d) > 0) "1.0" else "-1.0")
      .mkString("[", ",", "]")

  /** Projection of vector column `e` onto hyperplane `bit`, folded in
    * index order so the double is bit-identical to the native kernel's
    * sequential loop.
    */
  private def duckHyperplaneProj(bit: Int, dims: Int): String =
    s"""list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(e)),
       i -> e[i] * (${duckHyperplaneArr(bit, dims)})[i])), (acc, x) -> acc + x)"""

  /** The full ±1 hyperplane sign matrix (maxBits × dims) as one DuckDB
    * list-of-lists literal — single source of truth
    * `VectorExprs.hyperplaneSign`, row b = hyperplane b of the global
    * stream, so a DYNAMIC bit count (the bits-from-n rule) can index
    * it at replay time where the per-bit [[duckHyperplaneArr]] embeds
    * a static bit.
    */
  private def duckSignMatrix(maxBits: Int, dims: Int): String =
    (0 until maxBits).map(b => (0 until dims).map(d =>
      if (graft.functions.VectorExprs.hyperplaneSign(b, d) > 0) "1.0" else "-1.0")
      .mkString("[", ",", "]")).mkString("[", ",", "]")

  /** Bits-per-table ceiling the banded oracle can replay: CASE chain
    * and sign matrix are both GENERATED from this one constant, so the
    * two can never disagree. 16 bits covers n = 64·2¹⁶ ≈ 4.2M
    * embedding rows — far past any verify scale (the r6 hardcoded
    * 8-bit/48-row literal silently coupled verify coverage to tables
    * ≤ 16384 rows); beyond the ceiling the oracle still errors loudly
    * instead of replaying wrong.
    */
  private val duckBandedMaxBits: Int = 16

  /** Integer replay of `Similarity.lshPlanBits(n, 64)` from m =
    * ⌈n/64⌉: smallest nb with 2^nb ≥ m, min 1 — a generated CASE
    * chain (no log2 floats, no engine-specific bit functions).
    */
  private val duckBandedNb: String =
    (1 to duckBandedMaxBits)
      .map(b => s"WHEN m <= ${1L << b} THEN $b")
      .mkString("CASE ", " ", " ELSE CAST(error('banded oracle sign matrix supports at most " +
        s"$duckBandedMaxBits bits per table') AS INTEGER) END")

  /** CTE block replaying `Similarity.nearDupCosineBanded(_, _, _, thr,
    * 64, 6)` bit-exactly on top of a caller-supplied
    * `v(vec_id, e DOUBLE[])` CTE: bits-from-count rule (bpar), sign
    * matrix (bsgm), per-table bucket as the sign-bit sum of
    * index-order-folded projections (bbv — table t reads matrix rows
    * t·nb+1 .. t·nb+nb, matching the kernel's bitOffset = t·nBits),
    * candidate pairs from per-table bucket equality (bcand), exact
    * cosine on candidates (bpairs, unthresholded — callers filter).
    */
  private def duckBandedCtes(nTables: Int = 6, countWhere: String = ""): String =
    s"""bpar AS (SELECT $duckBandedNb AS nb
                 FROM (SELECT (count(*) + 63) // 64 AS m FROM v $countWhere)),
       bsgm AS (SELECT ${duckSignMatrix(nTables * duckBandedMaxBits, 64)} AS sm),
       bbv AS (SELECT vec_id, e, tt.tbl,
                 list_sum(list_transform(generate_series(1, nb),
                   j -> CASE WHEN list_reduce(list_prepend(0.0,
                               list_transform(generate_series(1, len(e)),
                                 i -> e[i] * sm[tbl * nb + j][i])), (acc, x) -> acc + x) > 0
                             THEN 2 ** (j - 1) ELSE 0 END))::BIGINT AS bucket
               FROM v, bsgm, bpar, generate_series(0, ${nTables - 1}) tt(tbl)),
       bcand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM bbv a JOIN bbv b
                   ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
                 GROUP BY 1, 2),
       bpairs AS (SELECT c.id_a, c.id_b, ${duckCos("va.e", "vb.e")} AS cs
                  FROM bcand c JOIN v va ON va.vec_id = c.id_a
                  JOIN v vb ON vb.vec_id = c.id_b)"""

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx ANN, simhash with engine-native hashing) → rows-only check.
    */
  def oracleSql: Map[String, String] = {
    val base = baseOracleSql
    // streaming replays are graded by their batch twins' oracles
    // VERBATIM — one source of truth, zero drift by construction
    base ++ Map(
      "stream_cardinality_sketch" -> base("cardinality_sketch"),
      "stream_cardinality_hll" -> base("cardinality_hll"),
      "stream_freq_sketch" -> base("freq_sketch"),
      "stream_quantile_sketch" -> base("quantile_sketch"),
      "stream_daily_anomaly" -> base("event_daily_anomaly"),
      "stream_sessionize" -> base("events_sessionize"),
      "stream_dedup_window" -> base("events_dedup_window"))
  }

  private def baseOracleSql: Map[String, String] = Map(
    "entry" ->
      """SELECT r_name, year(o_orderdate) AS o_year,
         floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue,
         count(*)::BIGINT AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2""",

    "map_project" ->
      """SELECT l_orderkey, l_linenumber,
         floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue FROM lineitem""",

    "filter_rows" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity > 30 AND l_returnflag = 'R'""",

    "flatten_explode" ->
      """SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
         FROM documents""",

    "reduce_global" ->
      """SELECT count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_rev FROM lineitem""",

    "reduce_per_key" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(avg(l_quantity), 4) AS avg_qty, count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "first_n" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "union_chain" ->
      """SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS src FROM customer
         UNION ALL
         SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS src FROM supplier""",

    "join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",

    "join_shuffle" ->
      """SELECT o_orderstatus, count(*) AS n_items, round(sum(l_extendedprice), 2) AS total
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderstatus""",

    "join_semi" ->
      """SELECT o_orderpriority, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY o_orderpriority""",

    "join_anti" ->
      """SELECT o_orderstatus, count(*) AS n_orders
         FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY o_orderstatus""",

    "branch_fanout" ->
      """SELECT 'by_status' AS branch, o_orderstatus AS k, count(*) AS v FROM orders GROUP BY 2
         UNION ALL
         SELECT 'by_priority' AS branch, o_orderpriority AS k, count(*) AS v FROM orders GROUP BY 2""",

    "branch_router" ->
      """SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
                     WHEN o_orderpriority = '2-HIGH' THEN 'high'
                     ELSE 'other' END AS branch,
         count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY 1""",

    "branch_broadcast" ->
      """SELECT 'bigspender' AS branch, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders WHERE o_totalprice > 200000
         UNION ALL
         SELECT 'urgentish' AS branch, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""",

    "tap_observe" ->
      """SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'""",

    "compose_apply" ->
      """SELECT p_partkey, p_brand, p_retailprice FROM part WHERE p_size > 20""",

    "loop_converge" ->
      """WITH RECURSIVE r AS (
           SELECT o_orderkey, o_totalprice AS v, 0 AS it FROM orders
           UNION ALL
           SELECT o_orderkey, v / 2, it + 1 FROM r WHERE v > 1000 AND it < 32)
         SELECT o_orderkey, floor(v * 10000 + 0.5) / 10000 AS v FROM r
         WHERE v <= 1000 OR it = 32""",

    "catch_quarantine" ->
      """SELECT doc_id,
         CASE WHEN n_chars % 7 = 0 THEN NULL
              ELSE round(1000.0 / (n_chars % 7), 4) END AS result,
         CASE WHEN n_chars % 7 = 0 THEN 'error' ELSE 'ok' END AS status
         FROM documents""",

    "short_circuit" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag""",

    "context_broadcast" ->
      """SELECT event_type, count(*) AS n, round(sum(value * 3), 2) AS sum_scaled
         FROM events WHERE value * 3 > 100 GROUP BY event_type""",

    "buffer_repartition" ->
      """SELECT event_type, count(*) AS n, round(avg(value), 4) AS avg_value
         FROM events GROUP BY event_type""",

    "set_chunker" ->
      """SELECT o_orderkey % 8 AS chunk, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY 1""",

    "window_running" ->
      """SELECT event_id, user_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
         FROM events""",

    "window_topn" ->
      """SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS rank
           FROM orders) WHERE rank <= 3""",

    "window_ntile" ->
      """SELECT o_orderkey, o_orderpriority, quartile, rnk FROM (
           SELECT o_orderkey, o_orderpriority,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             CAST(rank() OVER w AS BIGINT) AS rnk
           FROM orders
           WINDOW w AS (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey))
         WHERE rnk <= 100""",

    "pivot_status" ->
      """SELECT o_orderpriority,
           count(*) FILTER (o_orderstatus = 'F') AS n_f,
           count(*) FILTER (o_orderstatus = 'O') AS n_o,
           count(*) FILTER (o_orderstatus = 'P') AS n_p
         FROM orders GROUP BY o_orderpriority""",

    "events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts::TIMESTAMP) AS tus FROM events),
         m AS (SELECT *, CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
                 OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 1800000000
                 THEN 1 ELSE 0 END AS is_new FROM e),
         s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq FROM m)
         SELECT user_id, session_seq::BIGINT AS session_seq, count(*) AS n_events,
           round(sum(value), 2) AS session_value
         FROM s GROUP BY user_id, session_seq""",

    "asof_join_forward" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts::TIMESTAMP) AS tus, value
                    FROM events),
         p AS (SELECT event_id, user_id, tus, value FROM e WHERE event_type = 'purchase'),
         c AS (SELECT user_id, event_id AS click_event_id, tus AS click_tus FROM e
               WHERE event_type = 'click'),
         u AS (
           SELECT user_id AS k, tus AS t, 1 AS side, 0::BIGINT AS tie,
                  event_id, tus, value, NULL::BIGINT AS click_event_id, NULL::BIGINT AS click_tus
           FROM p
           UNION ALL
           SELECT user_id, click_tus, 0, click_event_id,
                  NULL, NULL, NULL, click_event_id, click_tus
           FROM c),
         m AS (SELECT *,
                 first_value(click_event_id IGNORE NULLS) OVER win AS m_id,
                 first_value(click_tus IGNORE NULLS) OVER win AS m_tus
               FROM u
               WINDOW win AS (PARTITION BY k ORDER BY t, side DESC, tie
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT event_id, k AS user_id, tus, value, m_id AS click_event_id,
           m_tus AS click_tus, m_tus - tus AS gap_us
         FROM m WHERE side = 1""",

    "asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts::TIMESTAMP) AS tus, value
                    FROM events),
         p AS (SELECT event_id, user_id, tus, value FROM e WHERE event_type = 'purchase'),
         c AS (SELECT user_id, event_id AS click_event_id, tus AS click_tus FROM e
               WHERE event_type = 'click'),
         u AS (
           SELECT user_id AS k, tus AS t, 1 AS side, 0::BIGINT AS tie,
                  event_id, tus, value, NULL::BIGINT AS click_event_id, NULL::BIGINT AS click_tus
           FROM p
           UNION ALL
           SELECT user_id, click_tus, 0, click_event_id,
                  NULL, NULL, NULL, click_event_id, click_tus
           FROM c),
         m AS (SELECT *,
                 last_value(click_event_id IGNORE NULLS) OVER win AS m_id,
                 last_value(click_tus IGNORE NULLS) OVER win AS m_tus
               FROM u
               WINDOW win AS (PARTITION BY k ORDER BY t, side, tie
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_id, k AS user_id, tus, value, m_id AS click_event_id,
           m_tus AS click_tus, tus - m_tus AS gap_us
         FROM m WHERE side = 1""",

    "range_join_bands" ->
      """SELECT band, count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events e
         JOIN (VALUES ('low', 0.0, 50.0), ('mid', 40.0, 200.0), ('high', 150.0, 500.0))
           AS b(band, lo, hi)
           ON e.value >= b.lo AND e.value < b.hi
         GROUP BY band""",

    "window_time_range" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS tus,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events)
         SELECT event_id, user_id, tus,
           count(*) OVER win AS trailing_n,
           CAST(sum(cents) OVER win AS BIGINT) AS trailing_cents
         FROM e
         WINDOW win AS (PARTITION BY user_id ORDER BY tus
                        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",

    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS tus FROM events),
         s0 AS (SELECT user_id, min(tus) AS t0 FROM e
                WHERE event_type = 'view' GROUP BY user_id),
         s1 AS (SELECT s0.user_id, min(e.tus) AS t1 FROM s0 JOIN e USING (user_id)
                WHERE e.event_type = 'click' AND e.tus >= s0.t0 GROUP BY s0.user_id),
         s2 AS (SELECT s1.user_id, min(e.tus) AS t2 FROM s1 JOIN e USING (user_id)
                WHERE e.event_type = 'purchase' AND e.tus >= s1.t1 GROUP BY s1.user_id)
         SELECT 0::BIGINT AS step_idx, 'view' AS step, (SELECT count(*) FROM s0) AS n_users
         UNION ALL
         SELECT 1, 'click', (SELECT count(*) FROM s1)
         UNION ALL
         SELECT 2, 'purchase', (SELECT count(*) FROM s2)""",

    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents GROUP BY text""",

    "dedup_normalized" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents
         GROUP BY trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))""",

    "span_corrupt" -> {
      def mk(off: Int) =
        s"(((((doc_id * 1000003 + i - $off) % 2147483647) * 48271 + 11) % 2147483647) % 1000) < 150"
      s"""WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
               AS toks FROM documents),
         m AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
             list_transform(generate_series(1, len(toks)), i -> struct_pack(
               t := toks[i],
               m := ${mk(1)},
               rs := (${mk(1)}) AND (i = 1 OR NOT (${mk(2)})))) AS mk
           FROM t)
         SELECT doc_id, n_tokens,
           len(list_filter(mk, e -> e.m))::BIGINT AS n_masked,
           coalesce(array_to_string(list_filter(list_transform(mk, e ->
             CASE WHEN e.rs THEN '<X>' WHEN NOT e.m THEN e.t END),
             x -> x IS NOT NULL), ' '), '') AS corrupted_text,
           coalesce(array_to_string(list_filter(list_transform(mk, e ->
             CASE WHEN e.rs THEN '<X> ' || e.t WHEN e.m THEN e.t END),
             x -> x IS NOT NULL), ' '), '') AS target_text
         FROM m"""
    },

    "group_sample_topk" ->
      """SELECT doc_id, lang, source FROM (
           SELECT doc_id, lang, source, row_number() OVER (
             PARTITION BY lang
             ORDER BY (doc_id * 48271 + 11) % 2147483647, doc_id) AS rk
           FROM documents) WHERE rk <= 50""",

    // strlen = BYTE count (the parser reports the WARC Content-Length,
    // written as UTF-8 octets); length() counts characters and would
    // diverge on the first multibyte character
    "warc_roundtrip" ->
      """SELECT doc_id, source, strlen(text)::BIGINT AS content_length, text
         FROM documents""",

    // gzip members are a transparent transport layer: recovery is graded
    // against the identical source-field truth
    "warc_gzip_roundtrip" ->
      """SELECT doc_id, source, strlen(text)::BIGINT AS content_length, text
         FROM documents""",

    "jsonl_roundtrip" ->
      """SELECT lang, count(*)::BIGINT AS n_docs, min(doc_id) AS min_id,
           max(doc_id) AS max_id, sum(length(text))::BIGINT AS sum_text_len
         FROM documents GROUP BY 1""",

    "bpe_train_steps" -> {
      val unions = (1 to bpeSteps).map(s => s"SELECT * FROM b$s").mkString(" UNION ALL ")
      s"""WITH $bpeTrainCtes
         SELECT step, l AS sym_left, r AS sym_right, cnt AS pair_freq
         FROM ($unions)"""
    },

    // encode = the trainer chain (b1..bK learned identically), then the
    // same per-step CANONICAL merge applied to each DOCUMENT's words
    // (duplicates kept) instead of the aggregated vocabulary
    "bpe_encode" -> {
      // absent merge rules (degenerate corpus) leave the scalar
      // subqueries NULL — the canonical merge with NULL symbols is the
      // identity, the same no-op default as the engine's bpeEncode
      val encCtes = (1 to bpeSteps).map { s =>
        s"""encm$s AS MATERIALIZED (SELECT doc_id, syms, rl, rr,
               ${duckMergePos("syms", "rl", "rr")} AS mp
             FROM enc${s - 1}, (SELECT max(l) AS rl, max(r) AS rr FROM b$s) jre$s),
           enc$s AS MATERIALIZED (SELECT doc_id,
               ${duckMergeApply("syms", "mp", "rl", "rr")} AS syms
             FROM encm$s)"""
      }.mkString(",\n         ")
      s"""WITH $bpeTrainCtes,
         dtoks AS (SELECT doc_id, unnest(list_filter(string_split(
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               ' +', ' ', 'g')), ' '), x -> x <> '')) AS w FROM documents),
         enc0 AS MATERIALIZED (SELECT doc_id,
             list_transform(generate_series(1, length(w)), i -> w[i]) AS syms
           FROM dtoks),
         $encCtes
         SELECT doc_id, count(*)::BIGINT AS n_words,
           sum(len(syms))::BIGINT AS n_bpe_tokens
         FROM enc$bpeSteps GROUP BY doc_id"""
    },

    "bpe_vocab" ->
      s"""WITH $bpeTrainCtes,
         vsyms AS (SELECT unnest(syms) AS symbol, freq FROM seqs$bpeSteps)
         SELECT symbol, sum(freq)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_occurrences
         FROM vsyms GROUP BY symbol""",

    "dedup_incremental" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         FROM documents
         WHERE doc_id % 10 <> 0
           AND text NOT IN (SELECT text FROM documents WHERE doc_id % 10 = 0)
         GROUP BY text""",

    "ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
               FROM s a JOIN s b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM p WHERE jaccard >= 0.6""",

    // positioned 16-token windows grouped by shingle TEXT (the
    // injective-in-practice FNV equivalence every shingle oracle
    // uses); coverage = win + Σ min(win, Δpos) over sorted starts —
    // exact interval union in closed integer form
    "substring_dup_stats" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         sh AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens, unnest(
                  CASE WHEN len(toks) >= 16
                    THEN list_transform(generate_series(1, len(toks) - 15),
                           i -> struct_pack(pos := (i - 1)::BIGINT,
                                            s := array_to_string(toks[i:i+15], ' ')))
                    ELSE [struct_pack(pos := 0::BIGINT, s := array_to_string(toks, ' '))]
                  END) AS w FROM t),
         ww AS (SELECT doc_id, n_tokens, w.pos AS pos, w.s AS s FROM sh),
         dup AS (SELECT s FROM (SELECT s, count(*) AS c FROM ww GROUP BY s) WHERE c >= 2),
         dp AS (SELECT doc_id, any_value(n_tokens) AS n_tokens,
                  count(*) AS n_dup_windows, list_sort(list(pos)) AS ps
                FROM ww WHERE s IN (SELECT s FROM dup) GROUP BY doc_id),
         cov AS (SELECT doc_id, n_dup_windows,
                   least(16, n_tokens)
                   + coalesce(list_sum(list_transform(generate_series(2, len(ps)),
                       i -> least(least(16, n_tokens), ps[i] - ps[i-1]))), 0) AS covered
                 FROM dp),
         tot AS (SELECT doc_id, any_value(n_tokens) AS n_tokens,
                   count(*) AS n_windows FROM ww GROUP BY doc_id)
         SELECT t.doc_id, t.n_tokens, t.n_windows,
           coalesce(c.n_dup_windows, 0)::BIGINT AS n_dup_windows,
           floor(coalesce(c.covered, 0)::DOUBLE / greatest(t.n_tokens, 1) * 10000 + 0.5)
             / 10000 AS dup_token_frac
         FROM tot t LEFT JOIN cov c USING (doc_id)""",

    "substring_dedup_apply" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         sh AS (SELECT doc_id, unnest(
                  CASE WHEN len(toks) >= 16
                    THEN list_transform(generate_series(1, len(toks) - 15),
                           i -> struct_pack(pos := (i - 1)::BIGINT,
                                            s := array_to_string(toks[i:i+15], ' ')))
                    ELSE [struct_pack(pos := 0::BIGINT, s := array_to_string(toks, ' '))]
                  END) AS w FROM t),
         ww AS (SELECT doc_id, w.pos AS pos, w.s AS s,
                  doc_id * 1048576 + w.pos AS okey FROM sh),
         wk AS (SELECT s, min(okey) AS wkey FROM ww GROUP BY 1),
         rm AS (SELECT doc_id, list_sort(list(pos)) AS rp
                FROM ww JOIN wk USING (s) WHERE okey <> wkey GROUP BY 1),
         k AS (SELECT t.doc_id, toks, coalesce(rm.rp, []) AS rp,
                 least(16, len(toks))::BIGINT AS weff
               FROM t LEFT JOIN rm USING (doc_id)),
         f AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                 list_filter(list_transform(generate_series(1, len(toks)),
                   i -> CASE WHEN len(list_filter(rp,
                          p -> p <= i - 1 AND i - 1 < p + weff)) > 0
                        THEN NULL ELSE toks[i] END), x -> x IS NOT NULL) AS kept
               FROM k)
         SELECT doc_id, n_tokens, len(kept)::BIGINT AS n_kept,
           coalesce(array_to_string(kept, ' '), '') AS cleaned_text
         FROM f""",

    "dedup_minhash" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
               FROM s a JOIN s b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM p WHERE jaccard >= 0.8""",

    "neardup_incremental" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS id_new, b.doc_id AS id_old,
                 len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
               FROM s a JOIN s b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)
         SELECT id_new, id_old, round(jaccard, 4) AS jaccard FROM p WHERE jaccard >= 0.8""",

    "dedup_clusters" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM s a JOIN s b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6),
         e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
         SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
         FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id""",

    // dedup_clusters' reach CTE over the UNION of the text-pair and
    // banded-cosine-pair predicates (both replayed exactly as in their
    // own oracles)
    "dedup_multisignal" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         tp AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM s a JOIN s b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6),
         v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ${duckBandedCtes()},
         vp AS (SELECT id_a AS ia, id_b AS ib FROM bpairs WHERE cs >= 0.4),
         p AS (SELECT ia, ib FROM tp UNION SELECT ia, ib FROM vp),
         e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
         SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
         FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id""",

    // minhash-fed multisignal: the text channel is the banded-MinHash
    // candidate set verified at 0.6 — the SplitMix64 permutations and
    // 32×4 band-equality predicate replayed as in minhash_recall_eval
    // — unioned with the banded-cosine channel, same reach CTE.
    "dedup_multisignal_lsh" -> {
      val (mas, mbs) = graft.functions.MinHashSig.coeffs(128)
      val mp = graft.functions.MinHashSig.P
      val minsSql = (0 until 128)
        .map(j => s"min((${mas(j)} * h + ${mbs(j)}) % $mp) AS m$j").mkString(", ")
      val bandEq = (0 until 32).map(b =>
        (0 until 4).map(r => s"a.m${b * 4 + r} = b.m${b * 4 + r}")
          .mkString("(", " AND ", ")")).mkString(" OR ")
      s"""WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         hs AS (SELECT doc_id,
                  ((((CASE WHEN hu >= '9223372036854775808'::HUGEINT
                       THEN hu - '18446744073709551616'::HUGEINT ELSE hu END)
                     % $mp) + $mp) % $mp)::BIGINT AS h
                FROM (SELECT doc_id, ${duckFnv("(g || ' ')")} AS hu
                      FROM (SELECT doc_id, unnest(sh) AS g FROM s))),
         sig AS (SELECT doc_id, $minsSql FROM hs GROUP BY doc_id),
         mcand AS (SELECT a.doc_id AS ia, b.doc_id AS ib
                   FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($bandEq)),
         tp AS (SELECT x.ia, x.ib FROM mcand x
                JOIN s sa ON sa.doc_id = x.ia JOIN s sb ON sb.doc_id = x.ib
                WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
                  / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.6),
         v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ${duckBandedCtes()},
         vp AS (SELECT id_a AS ia, id_b AS ib FROM bpairs WHERE cs >= 0.4),
         p AS (SELECT ia, ib FROM tp UNION SELECT ia, ib FROM vp),
         e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
         SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
         FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id"""
    },

    // THE FULL RECOMPUTE at 0.8 over every pair — deliberately not the
    // incremental composition: a green hash proves the engine's
    // incremental path (prev labels as star edges + delta links)
    // equals clustering from scratch
    "dedup_clusters_incremental" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM s a JOIN s b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
         e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
         SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
         FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id""",

    // same reach CTE as dedup_clusters; family sizes re-aggregated by
    // size class with exact integer doc/removable mass
    "dedup_cluster_sizes" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM s a JOIN s b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6),
         e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
         lab AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
                 FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id),
         m AS (SELECT cluster, count(*) AS cluster_size FROM lab GROUP BY cluster)
         SELECT cluster_size, count(*) AS n_clusters,
           (cluster_size * count(*))::BIGINT AS n_docs,
           ((cluster_size - 1) * count(*))::BIGINT AS n_removable
         FROM m GROUP BY cluster_size""",

    // same reach CTE as dedup_clusters; survivor = longest member
    // (ties to min id) via a deterministic per-cluster window
    "cluster_survivors" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM s a JOIN s b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6),
         e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
         lab AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
                 FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id),
         m AS (SELECT cluster, count(*) AS n_members FROM lab GROUP BY cluster),
         w AS (SELECT l.cluster, d.doc_id, d.n_chars,
                 row_number() OVER (PARTITION BY l.cluster
                                    ORDER BY d.n_chars DESC, d.doc_id) AS rn
               FROM lab l JOIN documents d USING (doc_id))
         SELECT w.cluster, w.doc_id, w.n_chars, m.n_members
         FROM w JOIN m USING (cluster) WHERE rn = 1""",

    // Replays the self-scaling banded path exactly: bits from the
    // integer count rule, the ±1 sign matrix as a literal, per-table
    // index-order-folded projections — so the candidate SET (not just
    // the verified pairs) is pinned by the hash match.
    "neardup_cosine_bucketed" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ${duckBandedCtes()}
         SELECT id_a, id_b, round(cs, 6) AS cosine FROM bpairs WHERE cs >= 0.4""",

    // Deployed-parameter recall harness replay: exact pairs on the
    // id%2 sample, banded pairs via the same bits-from-n + sign-matrix
    // CTEs, recall from the two exact integer counts.
    "lsh_recall_eval_deployed" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ${duckBandedCtes()},
         lshp AS (SELECT id_a, id_b FROM bpairs WHERE cs >= 0.4),
         ssm AS (SELECT greatest(2, (count(*) + 2047) // 2048) AS m FROM v),
         sv AS (SELECT v.* FROM v, ssm WHERE vec_id % ssm.m = 0),
         ex AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM sv a JOIN sv b ON a.vec_id < b.vec_id
                WHERE ${duckCos("a.e", "b.e")} >= 0.4),
         h AS (SELECT count(*) AS n_hit FROM ex
               WHERE EXISTS (SELECT 1 FROM lshp
                             WHERE lshp.id_a = ex.id_a AND lshp.id_b = ex.id_b)),
         t AS (SELECT count(*) AS n_exact FROM ex)
         SELECT (SELECT nb FROM bpar)::BIGINT AS n_bits, n_exact, n_hit,
           CASE WHEN n_exact = 0 THEN 1.0
                ELSE floor(n_hit::DOUBLE / n_exact * 10000 + 0.5) / 10000 END AS recall
         FROM t, h""",

    // batch×corpus banded replay: bits from the CORPUS-side count,
    // candidates only across the new/old boundary — the oracle pins
    // that no corpus×corpus (or batch×batch) pair can ever appear
    "neardup_cosine_incremental" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ${duckBandedCtes(6, "WHERE vec_id % 10 <> 0")},
         icand AS (SELECT a.vec_id AS id_new, b.vec_id AS id_old
                   FROM bbv a JOIN bbv b
                     ON a.tbl = b.tbl AND a.bucket = b.bucket
                     AND a.vec_id % 10 = 0 AND b.vec_id % 10 <> 0
                   GROUP BY 1, 2),
         ip AS (SELECT c.id_new, c.id_old, ${duckCos("va.e", "vb.e")} AS cs
                FROM icand c JOIN v va ON va.vec_id = c.id_new
                JOIN v vb ON vb.vec_id = c.id_old)
         SELECT id_new, id_old, round(cs, 6) AS cosine FROM ip WHERE cs >= 0.4""",

    // max over bit-identical per-pair cosines is order-independent,
    // so the aggregate max equals the packed-array row-local max
    "decontaminate_semantic" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         bench AS (SELECT vec_id, e FROM v WHERE vec_id < 10),
         corp AS (SELECT vec_id, e FROM v WHERE vec_id >= 10),
         m AS (SELECT c.vec_id, max(${duckCos("c.e", "b.e")}) AS mc
               FROM corp c CROSS JOIN bench b GROUP BY c.vec_id)
         SELECT vec_id, floor(mc * 1000000 + 0.5) / 1000000 AS max_cos,
           mc >= 0.35 AS contaminated
         FROM m""",

    // Replays the native hyperplane bucketing exactly: the ±1 sign
    // matrix is embedded as literals (same SplitMix64 derivation as
    // the kernel), and each projection folds in index order, so the
    // bucket bits — and therefore the candidate set — are identical.
    "neardup_cosine_lsh" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         bv AS (SELECT vec_id, e, ${(0 until 8).map(b =>
        s"(CASE WHEN ${duckHyperplaneProj(b, 64)} > 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")} AS bucket FROM v),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${duckCos("a.e", "b.e")} AS c
               FROM bv a JOIN bv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         SELECT id_a, id_b, round(c, 6) AS cosine FROM p WHERE c >= 0.4""",

    // Lehmer rounds and pool filter replayed verbatim; positives from
    // the exact top-1; slot = rank within the anchor's sampled pool.
    "contrastive_triplets" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         a AS (SELECT vec_id AS anchor_id, e AS ae FROM v WHERE vec_id < 10),
         c AS (SELECT vec_id, e AS ce FROM v WHERE vec_id >= 10),
         pos AS (SELECT anchor_id, pos_id, pos_cos FROM (
                   SELECT a.anchor_id, c.vec_id AS pos_id,
                     ${duckCos("a.ae", "c.ce")} AS pos_cos,
                     row_number() OVER (PARTITION BY a.anchor_id
                       ORDER BY ${duckCos("a.ae", "c.ce")} DESC, c.vec_id) AS rn
                   FROM a, c) WHERE rn = 1),
         ai AS (SELECT anchor_id,
                  row_number() OVER (ORDER BY anchor_id) - 1 AS aidx FROM a),
         s1 AS (SELECT vec_id AS neg_id,
                  (vec_id * 48271) % 2147483647 AS l1 FROM c),
         s2 AS (SELECT neg_id, l1 % 10 AS aidx,
                  (l1 * 48271) % 2147483647 AS l2 FROM s1),
         pool AS (SELECT * FROM s2 WHERE l2 % 1000 < 250),
         slotted AS (SELECT neg_id, aidx,
                       row_number() OVER (PARTITION BY aidx
                         ORDER BY l2, neg_id) AS slot FROM pool)
         SELECT ai.anchor_id, p.pos_id, round(p.pos_cos, 6) AS pos_cos,
           s.neg_id, s.slot::BIGINT AS slot
         FROM slotted s JOIN ai USING (aidx) JOIN pos p USING (anchor_id)
         WHERE s.slot <= 3 AND s.neg_id <> p.pos_id""",

    // Multi-table replay: the same hyperplane sign matrix, bits
    // t·8..t·8+7 per table, pair kept on collision in ANY table
    // (UNION dedups), exact cosine verify.
    "neardup_cosine_lsh_multi" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         lmb AS (SELECT ${(1 to 16).map(b => s"WHEN m <= ${1L << b} THEN $b")
        .mkString("CASE ", " ", " ELSE 16 END")} AS nb
                 FROM (SELECT (count(*) + 63) // 64 AS m FROM v)),
         lms AS (SELECT ${duckSignMatrix(3 * 16, 64)} AS sm),
         lmv AS (SELECT vec_id, e, tt.tbl,
                   list_sum(list_transform(generate_series(1, nb),
                     j -> CASE WHEN list_reduce(list_prepend(0.0,
                                 list_transform(generate_series(1, len(e)),
                                   i -> e[i] * sm[tbl * nb + j][i])), (acc, x) -> acc + x) > 0
                               THEN 2 ** (j - 1) ELSE 0 END))::BIGINT AS bucket
                 FROM v, lms, lmb, generate_series(0, 2) tt(tbl)),
         lmc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM lmv a JOIN lmv b
                   ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
                 GROUP BY 1, 2),
         p AS (SELECT c.id_a, c.id_b, ${duckCos("va.e", "vb.e")} AS cs
               FROM lmc c JOIN v va ON va.vec_id = c.id_a
               JOIN v vb ON vb.vec_id = c.id_b)
         SELECT id_a, id_b, round(cs, 6) AS cosine FROM p WHERE cs >= 0.4""",

    // Recall harness oracle: exact pairs on the id%2 sample, LSH pairs
    // via the same hyperplane replay as neardup_cosine_lsh, recall
    // from the two exact integer counts.
    "lsh_recall_eval" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         sm AS (SELECT greatest(2, (count(*) + 2047) // 2048) AS m FROM v),
         sv AS (SELECT v.* FROM v, sm WHERE vec_id % sm.m = 0),
         ex AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM sv a JOIN sv b ON a.vec_id < b.vec_id
                WHERE ${duckCos("a.e", "b.e")} >= 0.4),
         bv AS (SELECT vec_id, e, ${(0 until 8).map(b =>
        s"(CASE WHEN ${duckHyperplaneProj(b, 64)} > 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")} AS bucket FROM v),
         lsh AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM bv a JOIN bv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
                 WHERE ${duckCos("a.e", "b.e")} >= 0.4),
         h AS (SELECT count(*) AS n_hit FROM ex
               WHERE EXISTS (SELECT 1 FROM lsh
                             WHERE lsh.id_a = ex.id_a AND lsh.id_b = ex.id_b)),
         t AS (SELECT count(*) AS n_exact FROM ex)
         SELECT n_exact, n_hit,
           CASE WHEN n_exact = 0 THEN 1.0
                ELSE floor(n_hit::DOUBLE / n_exact * 10000 + 0.5) / 10000 END AS recall
         FROM t, h""",

    // Replays the native banded MinHash bit-exactly: shingle hash =
    // FNV-1a over the shingle text plus trailing separator (the
    // kernel's per-token `(h^0x20)*prime` IS the FNV-1a step on a
    // space byte), folded mod P with Scala floorMod semantics; the
    // 128 permutation (a,b) pairs are the kernel's own SplitMix64
    // stream embedded as literals; candidates = ≥1 of 32 four-slot
    // bands equal; recall = caught/exact at threshold 0.6.
    "minhash_recall_eval" -> {
      val (mas, mbs) = graft.functions.MinHashSig.coeffs(128)
      val mp = graft.functions.MinHashSig.P
      val minsSql = (0 until 128)
        .map(j => s"min((${mas(j)} * h + ${mbs(j)}) % $mp) AS m$j").mkString(", ")
      val bandEq = (0 until 32).map(b =>
        (0 until 4).map(r => s"a.m${b * 4 + r} = b.m${b * 4 + r}")
          .mkString("(", " AND ", ")")).mkString(" OR ")
      s"""WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                     FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         hs AS (SELECT doc_id,
                  ((((CASE WHEN hu >= '9223372036854775808'::HUGEINT
                       THEN hu - '18446744073709551616'::HUGEINT ELSE hu END)
                     % $mp) + $mp) % $mp)::BIGINT AS h
                FROM (SELECT doc_id, ${duckFnv("(g || ' ')")} AS hu
                      FROM (SELECT doc_id, unnest(sh) AS g FROM s))),
         sig AS (SELECT doc_id, $minsSql FROM hs GROUP BY doc_id),
         cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($bandEq)),
         jac AS (SELECT x.id_a, x.id_b FROM cand x
                 JOIN s sa ON sa.doc_id = x.id_a JOIN s sb ON sb.doc_id = x.id_b
                 WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
                   / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.6),
         ex AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM s a JOIN s b ON a.doc_id < b.doc_id
                WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                  / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6)
         SELECT (SELECT count(*) FROM ex)::BIGINT AS n_exact,
           (SELECT count(*) FROM jac)::BIGINT AS n_lsh,
           CASE WHEN (SELECT count(*) FROM ex) = 0 THEN 1.0
                ELSE floor((SELECT count(*) FROM jac)::DOUBLE
                  / (SELECT count(*) FROM ex) * 10000 + 0.5) / 10000 END AS recall"""
    },

    "quantile_sketch" ->
      """WITH b AS (SELECT greatest(0, least(floor(o_totalprice * 100 + 0.5)::BIGINT // 65536, 1023))
                      AS bin FROM orders),
         hist AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
         cum AS (SELECT bin, sum(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                   AS cum FROM hist),
         tot AS (SELECT sum(c)::BIGINT AS n FROM hist),
         ex AS (SELECT quantile_cont(floor(o_totalprice * 100 + 0.5)::BIGINT,
                  [0.5, 0.9, 0.99]) AS exs FROM orders),
         ranks AS (SELECT v.i AS qi, v.q AS q, ceil(v.q * n)::BIGINT AS rank
                   FROM tot CROSS JOIN (VALUES (1, 0.5), (2, 0.9), (3, 0.99)) AS v(i, q))
         SELECT q, rank, ((min(bin) + 1) * 65536)::DOUBLE / 100 AS est_upper,
           floor(exs[qi] / 100 * 10000 + 0.5) / 10000 AS exact
         FROM cum JOIN ranks ON cum >= rank CROSS JOIN ex
         GROUP BY qi, q, rank, exs""",

    // Replays the CMS bit-exactly: FNV token hash reduced into [0,p),
    // the engine's SplitMix64 permutation constants inlined per row,
    // counter sums, min-over-rows estimate
    "freq_sketch" -> {
      val (cas, cbs) = graft.functions.MinHashSig.coeffs(4)
      val cp = graft.functions.MinHashSig.P
      val rows = (0 until 4).map(i => s"($i, ${cas(i)}, ${cbs(i)})").mkString(", ")
      s"""WITH t AS (SELECT unnest(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS tok FROM documents),
         c AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
         h AS (SELECT tok, n,
                 ((((CASE WHEN hu >= '9223372036854775808'::HUGEINT
                      THEN hu - '18446744073709551616'::HUGEINT ELSE hu END)
                    % $cp) + $cp) % $cp)::BIGINT AS hh
               FROM (SELECT tok, n, ${duckFnv("tok")} AS hu FROM c)),
         sg AS (SELECT tok, n, p.i AS i, ((p.a * hh + p.b) % $cp) % 1024 AS slot
                FROM h CROSS JOIN (VALUES $rows) AS p(i, a, b)),
         cms AS (SELECT i, slot, sum(n)::BIGINT AS c FROM sg GROUP BY 1, 2),
         topk AS (SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 20)
         SELECT topk.tok, topk.n::BIGINT AS n_exact, min(cms.c) AS n_est
         FROM topk JOIN sg USING (tok) JOIN cms USING (i, slot)
         GROUP BY 1, 2"""
    },

    // Replays the sketch bit-exactly: FNV-1a per distinct token (the
    // vocabulary-once-then-join trick below), low-bits slot, linear-
    // counting MLE under the half-up floor protocol
    "cardinality_sketch" ->
      s"""WITH t AS (SELECT source AS g, unnest(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS tok FROM documents),
         vocab AS (SELECT DISTINCT tok FROM t),
         hashed AS (SELECT tok, (${duckFnv("tok")} % 4096)::BIGINT AS slot FROM vocab),
         sl AS (SELECT g, count(DISTINCT slot) AS v_filled
                FROM (SELECT DISTINCT g, tok FROM t) d JOIN hashed USING (tok)
                GROUP BY g),
         ex AS (SELECT g, count(DISTINCT tok) AS n_exact FROM t GROUP BY g)
         SELECT ex.g AS source, n_exact, v_filled,
           CASE WHEN v_filled < 4096
             THEN floor(-4096 * ln(1 - v_filled::DOUBLE / 4096) + 0.5)::BIGINT
             ELSE NULL END AS n_est
         FROM ex JOIN sl USING (g)""",

    // Replays the native SimHash64: FNV-1a per DISTINCT token (hash
    // values are a pure function of the token bytes, so hashing the
    // vocabulary once and joining is exactly the per-occurrence vote),
    // ±1 votes summed per (doc, bit), sign vector banded 4×16 bits,
    // pigeonhole band join, exact per-bit Hamming verify.
    "dedup_simhash" ->
      s"""WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                          x -> x <> '')) AS tok FROM documents),
         vocab AS (SELECT DISTINCT tok FROM toks),
         hashed AS (SELECT tok, ${duckFnv("tok")} AS h FROM vocab),
         pw(bit, p) AS (VALUES $duckBitPowers),
         bits AS (SELECT tok, bit, ((h // p) % 2)::BIGINT AS b FROM hashed, pw),
         perdoc AS (SELECT t.doc_id, b.bit, sum(CASE WHEN b.b = 1 THEN 1 ELSE -1 END) AS cnt
                    FROM toks t JOIN bits b USING (tok) GROUP BY 1, 2),
         fp AS (SELECT doc_id, bit, CASE WHEN cnt > 0 THEN 1 ELSE 0 END AS fb FROM perdoc),
         bands AS (SELECT doc_id, bit // 16 AS band, sum(fb * (1 << (bit % 16)))::BIGINT AS band_val
                   FROM fp GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                    AND a.doc_id < b.doc_id),
         ham AS (SELECT c.id_a, c.id_b,
                   sum(CASE WHEN fa.fb <> fb2.fb THEN 1 ELSE 0 END)::BIGINT AS hamming
                 FROM cand c JOIN fp fa ON fa.doc_id = c.id_a
                   JOIN fp fb2 ON fb2.doc_id = c.id_b AND fb2.bit = fa.bit
                 GROUP BY 1, 2)
         SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3""",

    "ann_ivf" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, e AS ce FROM v WHERE vec_id >= 10),
         ct AS (SELECT neighbor_id AS cell_id, ce AS cte FROM c ORDER BY neighbor_id LIMIT 16),
         asg AS (SELECT neighbor_id, ce, cell_id FROM (
                   SELECT c.neighbor_id, c.ce, ct.cell_id,
                     row_number() OVER (PARTITION BY c.neighbor_id
                       ORDER BY ${duckCos("c.ce", "ct.cte")} DESC, ct.cell_id) AS rn
                   FROM c, ct) WHERE rn = 1),
         pr AS (SELECT query_id, qe, cell_id FROM (
                  SELECT q.query_id, q.qe, ct.cell_id,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY ${duckCos("q.qe", "ct.cte")} DESC, ct.cell_id) AS rn
                  FROM q, ct) WHERE rn <= 4),
         cand AS (SELECT pr.query_id, asg.neighbor_id, ${duckCos("pr.qe", "asg.ce")} AS cosine
                  FROM asg JOIN pr USING (cell_id)),
         r AS (SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank FROM cand)
         SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM r
         WHERE rank <= 5""",

    // IVF assignment/probes replayed as in ann_ivf; PQ codes as in
    // embed_pq_encode (argmin per corpus sub-vector); coarse score =
    // integer sum of floor(d2·1e9+0.5) table entries; exact rerank.
    "ann_ivf_pq" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, e AS ce FROM v WHERE vec_id >= 10),
         ct AS (SELECT neighbor_id AS cell_id, ce AS cte FROM c ORDER BY neighbor_id LIMIT 16),
         asg AS (SELECT neighbor_id, cell_id FROM (
                   SELECT c.neighbor_id, ct.cell_id,
                     row_number() OVER (PARTITION BY c.neighbor_id
                       ORDER BY ${duckCos("c.ce", "ct.cte")} DESC, ct.cell_id) AS rn
                   FROM c, ct) WHERE rn = 1),
         pr AS (SELECT query_id, cell_id FROM (
                  SELECT q.query_id, ct.cell_id,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY ${duckCos("q.qe", "ct.cte")} DESC, ct.cell_id) AS rn
                  FROM q, ct) WHERE rn <= 4),
         sp AS (SELECT s FROM generate_series(0, 7) t(s)),
         cbs AS (SELECT cb0.code, sp.s AS subspace, cb0.ce[sp.s*8+1 : sp.s*8+8] AS cv
                 FROM (SELECT neighbor_id AS code, ce FROM c
                       ORDER BY neighbor_id LIMIT 16) cb0, sp),
         csub AS (SELECT neighbor_id, s AS subspace, ce[s*8+1 : s*8+8] AS sv FROM c, sp),
         codes AS (SELECT neighbor_id, subspace, code FROM (
                     SELECT csub.neighbor_id, csub.subspace, cbs.code,
                       row_number() OVER (PARTITION BY csub.neighbor_id, csub.subspace
                         ORDER BY list_reduce(list_prepend(0.0, list_transform(generate_series(1, 8),
                           i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))), (acc, x) -> acc + x),
                         cbs.code) AS rn
                     FROM csub JOIN cbs USING (subspace)) WHERE rn = 1),
         dt AS (SELECT query_id, subspace, code,
                  CAST(floor(list_reduce(list_prepend(0.0, list_transform(generate_series(1, 8),
                    i -> (qsv[i] - cv[i]) * (qsv[i] - cv[i]))), (acc, x) -> acc + x)
                    * 1000000000 + 0.5) AS BIGINT) AS d2_e9
                FROM (SELECT query_id, s AS subspace, qe[s*8+1 : s*8+8] AS qsv FROM q, sp)
                JOIN cbs USING (subspace)),
         cand AS (SELECT pr.query_id, asg.neighbor_id FROM asg JOIN pr USING (cell_id)),
         ad AS (SELECT query_id, neighbor_id, CAST(sum(d2_e9) AS BIGINT) AS adist
                FROM cand JOIN codes USING (neighbor_id)
                JOIN dt USING (query_id, subspace, code)
                GROUP BY query_id, neighbor_id),
         sl AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY adist, neighbor_id) AS srn FROM ad) WHERE srn <= 20),
         rr AS (SELECT sl.query_id, sl.neighbor_id, ${duckCos("q.qe", "c.ce")} AS cosine
                FROM sl JOIN q USING (query_id) JOIN c USING (neighbor_id))
         SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM (
           SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS rank FROM rr)
         WHERE rank <= 5""",

    // trained-IVF recall: the 3 Lloyd iterations unroll as CTE blocks
    // (assign = argmax cosine over the previous centroids; update =
    // integer-frozen per-dim means, the same 2⁻²⁰-unit sums / single
    // division the Spark side computes), then the deployed IVF top-5
    // and the brute-force top-5 intersect as exact integer counts
    "ann_recall_eval" -> {
      val iters = 3
      def step(i: Int) =
        s"""asg$i AS (SELECT neighbor_id, ce, cell_id FROM (
               SELECT c.neighbor_id, c.ce, p.cell_id,
                 row_number() OVER (PARTITION BY c.neighbor_id
                   ORDER BY ${duckCos("c.ce", "p.cte")} DESC, p.cell_id) AS rn
               FROM c, ct${i - 1} p) WHERE rn = 1),
           cm$i AS (SELECT cell_id, d,
                 CAST(sum(CAST(floor(ce[d] * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / CAST(count(*) * 1048576 AS DOUBLE) AS m
               FROM asg$i, generate_series(1, 64) t(d) GROUP BY cell_id, d),
           ct$i AS (SELECT cell_id, list(m ORDER BY d) AS cte FROM cm$i GROUP BY cell_id)"""
      val loops = (1 to iters).map(step).mkString(",\n")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, e AS ce FROM v WHERE vec_id >= 10),
         ct0 AS (SELECT row_number() OVER (ORDER BY neighbor_id) AS cell_id, ce AS cte
                 FROM (SELECT neighbor_id, ce FROM c ORDER BY neighbor_id LIMIT 16)),
         $loops,
         fasg AS (SELECT neighbor_id, ce, cell_id FROM (
               SELECT c.neighbor_id, c.ce, p.cell_id,
                 row_number() OVER (PARTITION BY c.neighbor_id
                   ORDER BY ${duckCos("c.ce", "p.cte")} DESC, p.cell_id) AS rn
               FROM c, ct$iters p) WHERE rn = 1),
         pr AS (SELECT query_id, qe, cell_id FROM (
               SELECT q.query_id, q.qe, p.cell_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${duckCos("q.qe", "p.cte")} DESC, p.cell_id) AS rn
               FROM q, ct$iters p) WHERE rn <= 4),
         cand AS (SELECT pr.query_id, fasg.neighbor_id,
                 ${duckCos("pr.qe", "fasg.ce")} AS cosine
               FROM fasg JOIN pr USING (cell_id)),
         ivf AS (SELECT query_id, neighbor_id FROM (
               SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank FROM cand)
             WHERE rank <= 5),
         tr AS (SELECT query_id, neighbor_id FROM (
               SELECT q.query_id, c.neighbor_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${duckCos("q.qe", "c.ce")} DESC, c.neighbor_id) AS rank
               FROM q, c) WHERE rank <= 5),
         nh AS (SELECT tr.query_id, count(*) AS n_hit
               FROM tr JOIN ivf USING (query_id, neighbor_id) GROUP BY 1),
         nt AS (SELECT query_id, count(*) AS n_truth FROM tr GROUP BY 1)
         SELECT nt.query_id, n_truth::BIGINT AS n_truth,
           coalesce(n_hit, 0)::BIGINT AS n_hit,
           floor(coalesce(n_hit, 0)::DOUBLE / n_truth::DOUBLE * 10000 + 0.5) / 10000
             AS recall
         FROM nt LEFT JOIN nh USING (query_id)"""
    },

    "semdedup_prune" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         pm AS (SELECT nid, ce, cell_id,
                  CAST(floor(cent_cos * 1000000 + 0.5) AS BIGINT) AS p
                FROM fasg)
         SELECT a.nid AS vec_id, a.cell_id, a.p AS cent_cos_micro,
           NOT EXISTS (SELECT 1 FROM pm b WHERE b.cell_id = a.cell_id
             AND (b.p < a.p OR (b.p = a.p AND b.nid < a.nid))
             AND ${duckCos("a.ce", "b.ce")} >= 0.4) AS kept
         FROM pm a""",

    "semdedup_rate_curve" -> {
      val epss = Seq(0.2, 0.3, 0.4, 0.5, 0.6)
      val rows = epss.map { e =>
        s"""SELECT $e AS eps, tot.n_total,
             (SELECT count(*) FROM mbc WHERE max_better_cos >= $e)::BIGINT
               AS n_pruned,
             floor((SELECT count(*) FROM mbc WHERE max_better_cos >= $e)::DOUBLE
               / tot.n_total::DOUBLE * 10000 + 0.5) / 10000 AS prune_rate
           FROM tot"""
      }.mkString("\nUNION ALL\n")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         pm AS MATERIALIZED (SELECT nid, ce, cell_id,
                  CAST(floor(cent_cos * 1000000 + 0.5) AS BIGINT) AS p
                FROM fasg),
         mbc AS MATERIALIZED (SELECT a.nid, max(${duckCos("a.ce", "b.ce")})
               AS max_better_cos
             FROM pm a JOIN pm b ON a.cell_id = b.cell_id
               AND (b.p < a.p OR (b.p = a.p AND b.nid < a.nid))
             GROUP BY a.nid),
         tot AS (SELECT count(*)::BIGINT AS n_total FROM pm)
         $rows"""
    },

    // greedy fold note: the reduce lambda ALWAYS returns
    // list_concat(gacc, ...) — returning gacc unchanged from a CASE
    // branch corrupts the accumulator in DuckDB 1.0.0 (verified:
    // [[1],[2],[3],[4]] with a "prune consecutive" rule yields [3]
    // instead of [1,3] when the prune branch returns gacc directly);
    // the kept set accumulates POSITIONS (plain BIGINT[]) for the
    // same reason — struct-typed accumulators corrupt too
    "semdedup_fidelity_eval" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         pm AS (SELECT nid, ce, cell_id,
                  CAST(floor(cent_cos * 1000000 + 0.5) AS BIGINT) AS p
                FROM fasg),
         dom AS (SELECT a.nid, a.cell_id,
             NOT EXISTS (SELECT 1 FROM pm b WHERE b.cell_id = a.cell_id
               AND (b.p < a.p OR (b.p = a.p AND b.nid < a.nid))
               AND ${duckCos("a.ce", "b.ce")} >= 0.4) AS kept_dom
           FROM pm a),
         cells AS (SELECT cell_id,
             list(struct_pack(p := p, vid := nid, cv := ce) ORDER BY p, nid)
               AS items
           FROM pm GROUP BY cell_id),
         gk AS (SELECT cell_id, list_transform(
             list_reduce(
               list_prepend([]::BIGINT[],
                 list_transform(generate_series(1, len(items)), j -> [j])),
               (gacc, gx) -> list_concat(gacc,
                 CASE WHEN len(list_filter(gacc, kk ->
                     ${duckCos("items[kk].cv", "items[gx[1]].cv")} >= 0.4)) > 0
                 THEN []::BIGINT[] ELSE gx END)),
             kp -> items[kp].vid) AS kept_ids
           FROM cells),
         greedy AS (SELECT cell_id, unnest(kept_ids) AS nid FROM gk)
         SELECT dom.cell_id, count(*)::BIGINT AS n_items,
           sum(CASE WHEN kept_dom THEN 1 ELSE 0 END)::BIGINT AS n_kept_dom,
           sum(CASE WHEN g.nid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_kept_greedy,
           sum(CASE WHEN kept_dom AND g.nid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_kept_both
         FROM dom LEFT JOIN greedy g
           ON dom.cell_id = g.cell_id AND dom.nid = g.nid
         GROUP BY dom.cell_id""",

    "knn_join_ivf" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v WHERE vec_id % 2 = 1),
         q AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 2 = 0),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         ${duckBeam(iters = 1, maxDepth = 10, nProbe = 2)},
         cand AS (SELECT pr.query_id, fasg.nid AS neighbor_id,
                 ${duckCos("pr.qe", "fasg.ce")} AS cosine
               FROM fasg JOIN pr USING (cell_id)),
         r AS (SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank FROM cand)
         SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
         FROM r WHERE rank <= 3""",

    "knn_recall_eval" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v WHERE vec_id % 2 = 1),
         qall AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 2 = 0),
         -- max(registered sampleMod, ceil(nQ/256)) — the FULL engine
         -- sampling contract (knnJoinRecallEval), not just the ceiling,
         -- so a future registration with sampleMod > 1 grades the same
         -- query set (registered sampleMod = 1 today)
         qpar AS (SELECT greatest(1, (count(*) + 255) // 256) AS md FROM qall),
         q AS MATERIALIZED (SELECT query_id, qe FROM qall
               WHERE query_id % (SELECT md FROM qpar) = 0),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         ${duckBeam(iters = 1, maxDepth = 10, nProbe = 2)},
         cand AS (SELECT pr.query_id, fasg.nid AS neighbor_id,
                 ${duckCos("pr.qe", "fasg.ce")} AS cosine
               FROM fasg JOIN pr USING (cell_id)),
         ivf AS (SELECT query_id, neighbor_id FROM (
               SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank FROM cand)
             WHERE rank <= 3),
         tr AS (SELECT query_id, neighbor_id FROM (
               SELECT q.query_id, c.nid AS neighbor_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${duckCos("q.qe", "c.ce")} DESC, c.nid) AS rank
               FROM q, c) WHERE rank <= 3),
         nh AS (SELECT tr.query_id, count(*) AS n_hit
               FROM tr JOIN ivf USING (query_id, neighbor_id) GROUP BY 1),
         nt AS (SELECT query_id, count(*) AS n_truth FROM tr GROUP BY 1)
         SELECT nt.query_id, n_truth::BIGINT AS n_truth,
           coalesce(n_hit, 0)::BIGINT AS n_hit,
           floor(coalesce(n_hit, 0)::DOUBLE / n_truth::DOUBLE * 10000 + 0.5) / 10000
             AS recall
         FROM nt LEFT JOIN nh USING (query_id)""",

    "knn_recall_curve" -> {
      // fused-mask replay of Similarity.knnJoinRecallCurve: one beam
      // descent carries the SET of probe widths each row survives at
      // as a bitmask (the width values are the bits, ladder mask 30);
      // per level one window counts, per width p, the strictly-better
      // rows whose mask has p — exact per-width beam rank without
      // materializing per-width beams. The candidate stage reuses the
      // trick on cosine rank for each width's top-3.
      val probePoints = Seq(2, 4, 8, 16)
      val maskAll = probePoints.sum
      def cnts(flagCol: String, ord: String) = probePoints.map(p =>
        s"""sum(CASE WHEN ($flagCol & $p) != 0 THEN 1 ELSE 0 END)
             OVER (PARTITION BY query_id ORDER BY $ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c$p""")
        .mkString(",\n")
      def pmExpr = probePoints.map(p =>
        s"(CASE WHEN (pm & $p) != 0 AND coalesce(c$p, 0) < $p THEN $p ELSE 0 END)")
        .mkString(" + ")
      def level(l: Int): String =
        s"""mc$l AS MATERIALIZED (
             SELECT b.query_id, b.qe, b.pm,
               b.node * 2 + k.child AS cnode, ${duckCos("b.qe", "k.ctv")} AS sc
             FROM mq$l b JOIN bkx$l k USING (node)
             UNION ALL
             SELECT b.query_id, b.qe, b.pm, b.node AS cnode, b.sc
             FROM mq$l b WHERE NOT EXISTS (
               SELECT 1 FROM bkx$l k WHERE k.node = b.node)),
           mr$l AS MATERIALIZED (SELECT *, ${cnts("pm", "sc DESC, cnode")}
             FROM mc$l),
           mq${l + 1} AS MATERIALIZED (
             SELECT query_id, qe, cnode AS node, sc, ($pmExpr) AS pm
             FROM mr$l WHERE ($pmExpr) != 0)"""
      val levels = (0 until 10).map(level).mkString(",\n")
      val hitSums = probePoints.map(p =>
        s"""sum(CASE WHEN (pm & $p) != 0 AND coalesce(c$p, 0) < 3
                 AND is_t THEN 1 ELSE 0 END) AS h$p""").mkString(",\n")
      val rows = probePoints.map { p =>
        s"""SELECT $p AS n_probe, tc.n_queries, tc.n_truth,
             hs.h$p::BIGINT AS n_hit,
             floor(hs.h$p::DOUBLE / tc.n_truth::DOUBLE * 10000 + 0.5) / 10000
               AS recall
           FROM tc, hs"""
      }.mkString("\nUNION ALL\n")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v WHERE vec_id % 2 = 1),
         qall AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 2 = 0),
         qpar AS (SELECT greatest(1, (count(*) + 255) // 256) AS md FROM qall),
         q AS MATERIALIZED (SELECT query_id, qe FROM qall
               WHERE query_id % (SELECT md FROM qpar) = 0),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         mq0 AS MATERIALIZED (SELECT query_id, qe, 1::BIGINT AS node,
               1.0::DOUBLE AS sc, $maskAll AS pm FROM q),
         $levels,
         mcand AS MATERIALIZED (SELECT b.query_id, fasg.nid AS neighbor_id,
               ${duckCos("b.qe", "fasg.ce")} AS cosine, b.pm
             FROM fasg JOIN mq10 b ON fasg.cell_id = b.node),
         mrank AS MATERIALIZED (SELECT query_id, neighbor_id, pm,
               ${cnts("pm", "cosine DESC, neighbor_id")}
             FROM mcand),
         tr AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
               SELECT q.query_id, c.nid AS neighbor_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${duckCos("q.qe", "c.ce")} DESC, c.nid) AS rank
               FROM q, c) WHERE rank <= 3),
         tc AS (SELECT count(*)::BIGINT AS n_truth,
               count(DISTINCT query_id)::BIGINT AS n_queries FROM tr),
         hs AS (SELECT $hitSums
             FROM mrank LEFT JOIN (SELECT query_id, neighbor_id, TRUE AS is_t
               FROM tr) t USING (query_id, neighbor_id))
         $rows"""
    },

    "ann_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT * FROM v WHERE vec_id < 10),
         c AS (SELECT * FROM v WHERE vec_id >= 10),
         s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(q.e)),
                   i -> q.e[i] * c.e[i])), (acc, x) -> acc + x) /
                 sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(q.e)),
                   i -> q.e[i] * q.e[i])), (acc, x) -> acc + x) *
                 list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(c.e)),
                   i -> c.e[i] * c.e[i])), (acc, x) -> acc + x)) AS cosine
               FROM q, c),
         r AS (SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
         SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM r
         WHERE rank <= 5""",

    "embed_pq_encode" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         cb AS (SELECT vec_id AS code, e AS ce FROM v ORDER BY vec_id LIMIT 16),
         sp AS (SELECT s FROM generate_series(0, 7) t(s)),
         sub AS (SELECT vec_id, s AS subspace, e[s*8+1 : s*8+8] AS sv FROM v, sp),
         cbs AS (SELECT code, s AS subspace, ce[s*8+1 : s*8+8] AS cv FROM cb, sp),
         d AS (SELECT vec_id, subspace, code,
                 list_reduce(list_prepend(0.0, list_transform(generate_series(1, 8),
                   i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))), (acc, x) -> acc + x) AS d2
               FROM sub JOIN cbs USING (subspace)),
         r AS (SELECT vec_id, subspace, code, d2,
                 row_number() OVER (PARTITION BY vec_id, subspace
                                    ORDER BY d2, code) AS rn FROM d)
         SELECT vec_id, subspace::BIGINT AS subspace, code, round(d2, 6) AS dist2
         FROM r WHERE rn = 1""",

    "embed_normalize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(e)),
                   i -> e[i] * e[i])), (acc, x) -> acc + x)) AS norm
               FROM v),
         x AS (SELECT vec_id, norm, e, unnest(generate_series(1, len(e))) AS i FROM n)
         SELECT vec_id, norm, i - 1 AS dim,
           CASE WHEN norm = 0 THEN 0.0 ELSE e[i] / norm END AS unit_val
         FROM x""",

    "embed_quantize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         m AS (SELECT vec_id, e,
                 coalesce(list_max(list_transform(e, x -> abs(x))), 0.0) AS maxabs FROM v),
         s AS (SELECT vec_id, e,
                 CASE WHEN maxabs = 0 THEN 0.0 ELSE 127.0 / maxabs END AS scale FROM m),
         x AS (SELECT vec_id, scale, e, unnest(generate_series(1, len(e))) AS i FROM s)
         SELECT vec_id, scale, i - 1 AS dim,
           CAST(floor(e[i] * scale + 0.5) AS INTEGER) AS q
         FROM x""",

    "embed_norm_stats" ->
      """WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
         n AS (SELECT label,
                 CAST(floor(sqrt(list_reduce(list_prepend(0.0,
                   list_transform(generate_series(1, len(e)), i -> e[i] * e[i])),
                   (acc, x) -> acc + x)) * 10000 + 0.5) AS BIGINT) AS norm_e4
               FROM v)
         SELECT label, count(*) AS n_vectors, min(norm_e4) AS min_norm_e4,
           max(norm_e4) AS max_norm_e4, CAST(sum(norm_e4) AS BIGINT) AS sum_norm_e4
         FROM n GROUP BY label""",

    "embed_centroids" ->
      """WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
         x AS (SELECT label, e, unnest(generate_series(1, len(e))) AS i FROM v),
         c AS (SELECT label, i - 1 AS dim,
                 CAST(floor(e[i] * 1000000 + 0.5) AS BIGINT) AS c_e6 FROM x)
         SELECT label, dim, count(*) AS n, CAST(sum(c_e6) AS BIGINT) AS sum_e6
         FROM c GROUP BY label, dim""",

    "embed_drift" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
         x AS (SELECT label, vec_id % 2 AS snap, e, unnest(generate_series(1, len(e))) AS i
               FROM v),
         c AS (SELECT label, snap, i - 1 AS dim,
                 CAST(floor(e[i] * 1000000 + 0.5) AS BIGINT) AS c_e6 FROM x),
         g AS (SELECT label, snap, dim, count(*) AS n, sum(c_e6)::BIGINT AS s
               FROM c GROUP BY 1, 2, 3),
         j AS (SELECT a.label, a.dim, a.n AS n_a, b.n AS n_b,
                 a.s::DOUBLE / a.n / 1000000 AS m_a, b.s::DOUBLE / b.n / 1000000 AS m_b
               FROM g a JOIN g b ON a.label = b.label AND a.dim = b.dim
                 AND a.snap = 0 AND b.snap = 1),
         l AS (SELECT label, max(n_a) AS n_a, max(n_b) AS n_b,
                 list_sort(list(struct_pack(dim := dim, m_a := m_a, m_b := m_b))) AS ds
               FROM j GROUP BY label),
         f AS (SELECT label, n_a, n_b,
                 list_reduce(list_prepend(0.0, list_transform(ds, x -> x.m_a * x.m_b)),
                   (a, b) -> a + b) AS dot,
                 list_reduce(list_prepend(0.0, list_transform(ds, x -> x.m_a * x.m_a)),
                   (a, b) -> a + b) AS na2,
                 list_reduce(list_prepend(0.0, list_transform(ds, x -> x.m_b * x.m_b)),
                   (a, b) -> a + b) AS nb2,
                 list_reduce(list_prepend(0.0,
                     list_transform(ds, x -> (x.m_a - x.m_b) * (x.m_a - x.m_b))),
                   (a, b) -> a + b) AS l2
               FROM l)
         SELECT label, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           floor(dot / sqrt(na2) / sqrt(nb2) * 1000000 + 0.5) / 1000000 AS cosine,
           floor(sqrt(l2) * 1000000 + 0.5) / 1000000 AS l2_shift
         FROM f""",

    "neardup_rate_by_source" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
               FROM s a JOIN s b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
         m AS (SELECT DISTINCT doc_id FROM
                 (SELECT id_a AS doc_id FROM p UNION ALL SELECT id_b FROM p))
         SELECT d.source, count(*) AS n_docs,
           count(m.doc_id) AS n_near_dup,
           floor(count(m.doc_id)::DOUBLE / count(*) * 10000 + 0.5) / 10000 AS dup_rate
         FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
         GROUP BY d.source""",

    "text_langid" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         sc AS (SELECT doc_id,
           len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS s_en,
           len(list_filter(toks, t -> t IN ('el','la','de','que','y'))) AS s_es,
           len(list_filter(toks, t -> t IN ('der','die','und','das','ist'))) AS s_de,
           len(list_filter(toks, t -> t IN ('le','les','et','est','une'))) AS s_fr
           FROM t)
         SELECT doc_id, CASE
           WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
           WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
           WHEN s_de >= s_fr THEN 'de'
           ELSE 'fr' END AS lang_pred FROM sc""",

    "langid_confusion" ->
      """WITH t AS (SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         sc AS (SELECT doc_id, lang,
           len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS s_en,
           len(list_filter(toks, t -> t IN ('el','la','de','que','y'))) AS s_es,
           len(list_filter(toks, t -> t IN ('der','die','und','das','ist'))) AS s_de,
           len(list_filter(toks, t -> t IN ('le','les','et','est','une'))) AS s_fr
           FROM t),
         p AS (SELECT lang, CASE
           WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
           WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
           WHEN s_de >= s_fr THEN 'de'
           ELSE 'fr' END AS lang_pred FROM sc)
         SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY 1, 2""",

    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
                      list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents),
         m AS (SELECT doc_id, text, len(toks) AS n,
           list_sum(list_transform(toks, x -> length(x))) AS char_sum,
           len(list_filter(toks,
             x -> x IN ('the','a','of','and','is','to','in','it','that','for'))) AS stops,
           length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
             greatest(length(text), 1) AS digit_ratio
           FROM t)
         SELECT doc_id, n::BIGINT AS n_tokens,
           round(char_sum::DOUBLE / greatest(n, 1), 4) AS avg_token_len,
           round(stops::DOUBLE / greatest(n, 1), 4) AS stop_ratio,
           round(least(1.0, greatest(0.0,
             0.2 + 0.01 * n + stops::DOUBLE / greatest(n, 1) - 5.0 * digit_ratio)), 4) AS quality
         FROM m""",

    "text_tokens" ->
      """SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_ws_tokens,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_bpe_tokens
         FROM documents""",

    "text_fingerprint" ->
      """SELECT doc_id,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
             t -> (length(t) * 256 + ascii(t))::BIGINT)),
           (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
         FROM documents""",

    // expected fields recomputed from the SOURCE columns — the Spark
    // side must construct the headers and parse them back to match
    "multimodal_meta" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS kind,
         (16 + doc_id % 1904)::BIGINT AS width,
         (16 + n_chars % 1064)::BIGINT AS height,
         (CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 51 END)::BIGINT AS n_bytes
         FROM documents""",

    // closed-form replay of the construct→decode round trip: dims from
    // the id, channel c's sums over logical pixel order p = 0..n_pix-1
    // of (doc_id + 3p + c) mod 256, plain and (p+1)-weighted
    "multimodal_decode" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS kind,
         (2 + doc_id % 7)::BIGINT AS width,
         (2 + doc_id % 5)::BIGINT AS height,
         ((2 + doc_id % 7) * (2 + doc_id % 5))::BIGINT AS n_pix,
         list_sum(list_transform(px, p -> (doc_id + 3*p + 0) % 256))::BIGINT AS r_sum,
         list_sum(list_transform(px, p -> (doc_id + 3*p + 1) % 256))::BIGINT AS g_sum,
         list_sum(list_transform(px, p -> (doc_id + 3*p + 2) % 256))::BIGINT AS b_sum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*p + 0) % 256)))::BIGINT AS r_wsum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*p + 1) % 256)))::BIGINT AS g_wsum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*p + 2) % 256)))::BIGINT AS b_wsum
         FROM (SELECT doc_id,
                 generate_series(0, (2 + doc_id % 7) * (2 + doc_id % 5) - 1) AS px
               FROM documents)""",

    "multimodal_png_decode" ->
      """SELECT doc_id,
         'png' AS kind,
         (2 + doc_id % 6)::BIGINT AS width,
         (2 + doc_id % 5)::BIGINT AS height,
         ((2 + doc_id % 6) * (2 + doc_id % 5))::BIGINT AS n_pix,
         list_sum(list_transform(px, p -> (doc_id + 3*p + 0) % 256))::BIGINT AS r_sum,
         list_sum(list_transform(px, p -> (doc_id + 3*p + 1) % 256))::BIGINT AS g_sum,
         list_sum(list_transform(px, p -> (doc_id + 3*p + 2) % 256))::BIGINT AS b_sum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*p + 0) % 256)))::BIGINT AS r_wsum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*p + 1) % 256)))::BIGINT AS g_wsum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*p + 2) % 256)))::BIGINT AS b_wsum
         FROM (SELECT doc_id,
                 generate_series(0, (2 + doc_id % 6) * (2 + doc_id % 5) - 1) AS px
               FROM documents)""",

    // closed-form replay of the GIF decode: pixel p of image doc_id is
    // palette entry (doc_id + p) mod 256, whose channel c value is
    // (doc_id + 3k + c) mod 256 — LZW and the interlace permutation
    // cancel in the round trip, so the oracle needs neither
    "multimodal_gif_decode" ->
      """SELECT doc_id,
         'gif' AS kind,
         (2 + doc_id % 6)::BIGINT AS width,
         (5 + doc_id % 5)::BIGINT AS height,
         ((2 + doc_id % 6) * (5 + doc_id % 5))::BIGINT AS n_pix,
         list_sum(list_transform(px, p -> (doc_id + 3*((doc_id + p) % 256) + 0) % 256))::BIGINT AS r_sum,
         list_sum(list_transform(px, p -> (doc_id + 3*((doc_id + p) % 256) + 1) % 256))::BIGINT AS g_sum,
         list_sum(list_transform(px, p -> (doc_id + 3*((doc_id + p) % 256) + 2) % 256))::BIGINT AS b_sum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*((doc_id + p) % 256) + 0) % 256)))::BIGINT AS r_wsum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*((doc_id + p) % 256) + 1) % 256)))::BIGINT AS g_wsum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*((doc_id + p) % 256) + 2) % 256)))::BIGINT AS b_wsum
         FROM (SELECT doc_id,
                 generate_series(0, (2 + doc_id % 6) * (5 + doc_id % 5) - 1) AS px
               FROM documents)""",

    // closed-form replay of the JPEG decode: block b of image doc_id
    // carries constant YCbCr (7id+16b, 11id+32b, 13id+8b) mod 256;
    // per-pixel RGB is the decoder's fixed-point BT.601 transform
    // (floor((x + 32768)/65536) == the JVM's arithmetic >> 16)
    "multimodal_jpeg_decode" ->
      """WITH px AS (SELECT doc_id,
                unnest(generate_series(0,
                  (8*(1 + doc_id % 4)) * (8*(1 + doc_id % 3)) - 1)) AS p
              FROM documents),
         v AS (SELECT doc_id, p,
                 ((p // (8*(1 + doc_id % 4))) // 8) * (1 + doc_id % 4)
                   + ((p % (8*(1 + doc_id % 4))) // 8) AS b
               FROM px),
         c AS (SELECT doc_id, p,
                 (doc_id*7 + 16*b) % 256 AS yv,
                 (doc_id*11 + 32*b) % 256 - 128 AS cb_,
                 (doc_id*13 + 8*b) % 256 - 128 AS cr_
               FROM v),
         rgb AS (SELECT doc_id, p,
                 LEAST(255, GREATEST(0, CAST(floor((yv*65536 + 91881*cr_ + 32768)/65536.0) AS BIGINT))) AS r,
                 LEAST(255, GREATEST(0, CAST(floor((yv*65536 - 22554*cb_ - 46802*cr_ + 32768)/65536.0) AS BIGINT))) AS g,
                 LEAST(255, GREATEST(0, CAST(floor((yv*65536 + 116130*cb_ + 32768)/65536.0) AS BIGINT))) AS bb
               FROM c)
         SELECT doc_id, 'jpeg' AS kind,
           (8*(1 + doc_id % 4))::BIGINT AS width,
           (8*(1 + doc_id % 3))::BIGINT AS height,
           ((8*(1 + doc_id % 4)) * (8*(1 + doc_id % 3)))::BIGINT AS n_pix,
           sum(r)::BIGINT AS r_sum, sum(g)::BIGINT AS g_sum,
           sum(bb)::BIGINT AS b_sum,
           sum((p + 1) * r)::BIGINT AS r_wsum,
           sum((p + 1) * g)::BIGINT AS g_wsum,
           sum((p + 1) * bb)::BIGINT AS b_wsum
         FROM rgb GROUP BY ALL""",

    // the progressive twin: same closed forms, dims swapped
    // (w = 8*(1 + id%3), h = 8*(1 + id%4)) — the decoder runs the full
    // ten-scan SOF2 pipeline yet lands on the same block-constant RGB
    "multimodal_jpeg_progressive" ->
      """WITH px AS (SELECT doc_id,
                unnest(generate_series(0,
                  (8*(1 + doc_id % 3)) * (8*(1 + doc_id % 4)) - 1)) AS p
              FROM documents),
         v AS (SELECT doc_id, p,
                 ((p // (8*(1 + doc_id % 3))) // 8) * (1 + doc_id % 3)
                   + ((p % (8*(1 + doc_id % 3))) // 8) AS b
               FROM px),
         c AS (SELECT doc_id, p,
                 (doc_id*7 + 16*b) % 256 AS yv,
                 (doc_id*11 + 32*b) % 256 - 128 AS cb_,
                 (doc_id*13 + 8*b) % 256 - 128 AS cr_
               FROM v),
         rgb AS (SELECT doc_id, p,
                 LEAST(255, GREATEST(0, CAST(floor((yv*65536 + 91881*cr_ + 32768)/65536.0) AS BIGINT))) AS r,
                 LEAST(255, GREATEST(0, CAST(floor((yv*65536 - 22554*cb_ - 46802*cr_ + 32768)/65536.0) AS BIGINT))) AS g,
                 LEAST(255, GREATEST(0, CAST(floor((yv*65536 + 116130*cb_ + 32768)/65536.0) AS BIGINT))) AS bb
               FROM c)
         SELECT doc_id, 'jpeg' AS kind,
           (8*(1 + doc_id % 3))::BIGINT AS width,
           (8*(1 + doc_id % 4))::BIGINT AS height,
           ((8*(1 + doc_id % 3)) * (8*(1 + doc_id % 4)))::BIGINT AS n_pix,
           sum(r)::BIGINT AS r_sum, sum(g)::BIGINT AS g_sum,
           sum(bb)::BIGINT AS b_sum,
           sum((p + 1) * r)::BIGINT AS r_wsum,
           sum((p + 1) * g)::BIGINT AS g_wsum,
           sum((p + 1) * bb)::BIGINT AS b_wsum
         FROM rgb GROUP BY ALL""",

    // channel c of pixel p in frame f is (doc_id + 5f + 3p + c) mod 256
    "multimodal_avi_frames" ->
      """WITH fr AS (SELECT doc_id,
                unnest(generate_series(0, (2 + doc_id % 4) - 1)) AS f
              FROM documents),
         px AS (SELECT doc_id, f,
                  generate_series(0, (2 + doc_id % 5) * (2 + doc_id % 3) - 1) AS ps
                FROM fr)
         SELECT doc_id, f AS frame_idx,
           (2 + doc_id % 5)::BIGINT AS width,
           (2 + doc_id % 3)::BIGINT AS height,
           list_sum(list_transform(ps, p -> (doc_id + 5*f + 3*p + 0) % 256))::BIGINT AS r_sum,
           list_sum(list_transform(ps, p -> (doc_id + 5*f + 3*p + 1) % 256))::BIGINT AS g_sum,
           list_sum(list_transform(ps, p -> (doc_id + 5*f + 3*p + 2) % 256))::BIGINT AS b_sum,
           list_sum(list_transform(ps, p -> (p + 1) * ((doc_id + 5*f + 3*p + 0) % 256)))::BIGINT AS r_wsum,
           list_sum(list_transform(ps, p -> (p + 1) * ((doc_id + 5*f + 3*p + 1) % 256)))::BIGINT AS g_wsum,
           list_sum(list_transform(ps, p -> (p + 1) * ((doc_id + 5*f + 3*p + 2) % 256)))::BIGINT AS b_wsum
         FROM px""",

    // channel c of frame s is ((doc_id + 7s + 3c) mod 65536) - 32768;
    // mono clips (even ids) report zeros for channel 1
    // law decode tables inlined from the Scala single source of truth;
    // law = id bit 1 (matches syntheticCompandedAudio), channels = bit 0
    "multimodal_companded_decode" -> {
      val alawL = graft.operators.Multimodal.alawDecodeTable.mkString("[", ",", "]")
      val mulawL = graft.operators.Multimodal.mulawDecodeTable.mkString("[", ",", "]")
      s"""SELECT doc_id,
         (1 + doc_id % 2)::BIGINT AS channels,
         8000::BIGINT AS sample_rate,
         (30 + doc_id % 40)::BIGINT AS n_frames,
         list_sum(list_transform(fr, s -> tbl[((doc_id + 7*s) % 256) + 1]))::BIGINT AS c0_sum,
         (CASE WHEN doc_id % 2 = 1
            THEN list_sum(list_transform(fr, s -> tbl[((doc_id + 7*s + 3) % 256) + 1]))
            ELSE 0 END)::BIGINT AS c1_sum,
         list_sum(list_transform(fr, s -> (s + 1) * tbl[((doc_id + 7*s) % 256) + 1]))::BIGINT AS c0_wsum,
         (CASE WHEN doc_id % 2 = 1
            THEN list_sum(list_transform(fr, s -> (s + 1) * tbl[((doc_id + 7*s + 3) % 256) + 1]))
            ELSE 0 END)::BIGINT AS c1_wsum
         FROM (SELECT doc_id,
                 CASE WHEN (doc_id // 2) % 2 = 0 THEN $alawL ELSE $mulawL END AS tbl,
                 generate_series(0, 30 + doc_id % 40 - 1) AS fr
               FROM documents)"""
    },

    // per-block-constant closed form: block b contributes 9·v to the
    // plain sum and v·(81b + 45) to the position-weighted sum
    "multimodal_adpcm_decode" ->
      """WITH blk AS (SELECT doc_id, unnest(generate_series(0, 1 + doc_id % 3)) AS b
                      FROM documents),
         v AS (SELECT doc_id, b,
                 (doc_id * 31 + b * 17) % 65536 - 32768 AS v0,
                 (doc_id * 31 + b * 17 + 7) % 65536 - 32768 AS v1
               FROM blk)
         SELECT doc_id,
           (1 + doc_id % 2)::BIGINT AS channels,
           8000::BIGINT AS sample_rate,
           (9 * (2 + doc_id % 3))::BIGINT AS n_frames,
           sum(9 * v0)::BIGINT AS c0_sum,
           (CASE WHEN doc_id % 2 = 1 THEN sum(9 * v1) ELSE 0 END)::BIGINT AS c1_sum,
           sum(v0 * (81 * b + 45))::BIGINT AS c0_wsum,
           (CASE WHEN doc_id % 2 = 1 THEN sum(v1 * (81 * b + 45)) ELSE 0 END)::BIGINT AS c1_wsum
         FROM v GROUP BY doc_id""",

    // lossless claim: the FLAC oracle IS the WAV oracle (same closed-
    // form samples, same frames/channels formulas) — the decode must
    // recover the identical integers through the entropy coding
    "multimodal_flac_decode" ->
      """SELECT doc_id,
         (1 + doc_id % 2)::BIGINT AS channels,
         8000::BIGINT AS sample_rate,
         (40 + doc_id % 60)::BIGINT AS n_frames,
         list_sum(list_transform(fr, s -> (doc_id + 7*s) % 65536 - 32768))::BIGINT AS c0_sum,
         (CASE WHEN doc_id % 2 = 1
            THEN list_sum(list_transform(fr, s -> (doc_id + 7*s + 3) % 65536 - 32768))
            ELSE 0 END)::BIGINT AS c1_sum,
         list_sum(list_transform(fr, s -> (s + 1) * ((doc_id + 7*s) % 65536 - 32768)))::BIGINT AS c0_wsum,
         (CASE WHEN doc_id % 2 = 1
            THEN list_sum(list_transform(fr, s -> (s + 1) * ((doc_id + 7*s + 3) % 65536 - 32768)))
            ELSE 0 END)::BIGINT AS c1_wsum
         FROM (SELECT doc_id, generate_series(0, 40 + doc_id % 60 - 1) AS fr
               FROM documents)""",

    "multimodal_wav_decode" ->
      """SELECT doc_id,
         (1 + doc_id % 2)::BIGINT AS channels,
         8000::BIGINT AS sample_rate,
         (40 + doc_id % 60)::BIGINT AS n_frames,
         list_sum(list_transform(fr, s -> (doc_id + 7*s) % 65536 - 32768))::BIGINT AS c0_sum,
         (CASE WHEN doc_id % 2 = 1
            THEN list_sum(list_transform(fr, s -> (doc_id + 7*s + 3) % 65536 - 32768))
            ELSE 0 END)::BIGINT AS c1_sum,
         list_sum(list_transform(fr, s -> (s + 1) * ((doc_id + 7*s) % 65536 - 32768)))::BIGINT AS c0_wsum,
         (CASE WHEN doc_id % 2 = 1
            THEN list_sum(list_transform(fr, s -> (s + 1) * ((doc_id + 7*s + 3) % 65536 - 32768)))
            ELSE 0 END)::BIGINT AS c1_wsum
         FROM (SELECT doc_id, generate_series(0, 40 + doc_id % 60 - 1) AS fr
               FROM documents)""",

    "multimodal_frames" ->
      """SELECT doc_id, unnest(generate_series(0, 3)) AS frame_idx,
         floor(unnest(generate_series(0, 3)) * octet_length(encode(text)) / 4)::BIGINT AS frame_pos
         FROM documents""",

    "text_pii" ->
      """SELECT doc_id,
         len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))::BIGINT AS n_email,
         len(regexp_extract_all(text, '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b'))::BIGINT AS n_phone,
         len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ipv4,
         len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))::BIGINT AS n_ssn,
         (regexp_matches(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')
          OR regexp_matches(text, '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b')
          OR regexp_matches(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')
          OR regexp_matches(text, '\b\d{3}-\d{2}-\d{4}\b')) AS has_pii
         FROM documents""",

    // replacement nesting mirrors the Spark fold order (email, phone,
    // ipv4, ssn); 'g' flag = replace-all, matching Spark regexp_replace
    "pii_redact" ->
      """SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
           '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b', '<PHONE>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'),
           '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS redacted
         FROM documents
         WHERE regexp_matches(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')
            OR regexp_matches(text, '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b')
            OR regexp_matches(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')
            OR regexp_matches(text, '\b\d{3}-\d{2}-\d{4}\b')""",

    "events_json" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k
         FROM events GROUP BY event_type""",

    "orders_by_month" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
         round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY 1""",

    "token_cooccurrence" ->
      """WITH dt AS (SELECT doc_id AS doc,
             unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS tok
           FROM documents),
         tf AS (SELECT tok, count(*) AS df_tok FROM dt GROUP BY tok),
         n AS (SELECT count(*) AS n_docs FROM documents),
         pc AS (SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_pair
                FROM dt a JOIN dt b ON a.doc = b.doc AND a.tok < b.tok
                GROUP BY 1, 2 HAVING count(*) >= 50)
         SELECT pc.tok_a, pc.tok_b, pc.n_pair,
           round(pc.n_pair::DOUBLE * (SELECT n_docs FROM n) /
             (fa.df_tok::DOUBLE * fb.df_tok::DOUBLE), 6) AS lift
         FROM pc JOIN tf fa ON pc.tok_a = fa.tok JOIN tf fb ON pc.tok_b = fb.tok""",

    "sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE ((doc_id * 48271 + 11) % 2147483647) % 1000 <
           CASE lang WHEN 'en' THEN 800 WHEN 'es' THEN 500 WHEN 'de' THEN 500
                     WHEN 'fr' THEN 300 WHEN 'zh' THEN 100 ELSE 1000 END""",

    "weighted_sample" ->
      """WITH s AS (SELECT sum(n_chars)::BIGINT AS sum_w FROM documents),
         p AS (SELECT lang,
                 least(1000000, (n_chars::BIGINT * 2000 * 1000000) // sum_w)::BIGINT
                   AS p_micro,
                 ((doc_id * 48271 + 11) % 2147483647) % 1000000 AS u_micro
               FROM documents, s)
         SELECT lang, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN u_micro < p_micro THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(p_micro)::BIGINT AS expected_micro,
           (sum(CASE WHEN u_micro < p_micro THEN 1 ELSE 0 END) * 1000000
             - sum(p_micro))::BIGINT AS gap_micro
         FROM p GROUP BY 1""",

    // pack CTE re-aggregated: (shard, pack) totals -> clamped fill
    // decile histogram, all exact integers
    "pack_fill_report" ->
      """WITH t AS (SELECT doc_id, doc_id % 4 AS shard,
             len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
           FROM documents),
         c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t),
         pk AS (SELECT shard, (cum - n_tokens) // 512 AS pack_id,
                  sum(n_tokens) AS pack_tokens, count(*) AS n_docs
                FROM c GROUP BY 1, 2)
         SELECT least(pack_tokens * 10 // 512, 10)::BIGINT AS fill_decile,
           count(*) AS n_packs, sum(n_docs)::BIGINT AS n_docs,
           sum(pack_tokens)::BIGINT AS total_tokens
         FROM pk GROUP BY 1""",

    "pack_sequences" ->
      """WITH t AS (SELECT doc_id, doc_id % 4 AS shard,
             len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
           FROM documents),
         c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
         SELECT doc_id, shard, n_tokens, ((cum - n_tokens) // 512)::BIGINT AS pack_id
         FROM c""",

    "dedup_survivors" ->
      """WITH w AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
         SELECT d.doc_id, d.lang, d.source, d.n_chars
         FROM documents d JOIN w USING (doc_id)""",

    "decontaminate" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         bench AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 10 = 0),
         corp AS (SELECT doc_id, sh FROM s WHERE doc_id % 10 <> 0),
         hits AS (SELECT c.doc_id, count(*) AS n_shared
                  FROM (SELECT doc_id, unnest(sh) AS g FROM corp) c
                  JOIN bench USING (g) GROUP BY c.doc_id)
         SELECT c.doc_id, CAST(len(c.sh) AS BIGINT) AS n_shingles,
           coalesce(h.n_shared, 0) AS n_shared,
           coalesce(h.n_shared, 0) > 0 AS contaminated
         FROM corp c LEFT JOIN hits h USING (doc_id)""",

    "repetition_stats" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, CASE WHEN len(toks) >= 2
                 THEN list_transform(generate_series(1, len(toks) - 1),
                        i -> array_to_string(toks[i:i+1], ' '))
                 ELSE [array_to_string(toks, ' ')] END sh FROM t),
         c AS (SELECT doc_id, gm, count(*) AS c
               FROM (SELECT doc_id, unnest(sh) AS gm FROM s) GROUP BY doc_id, gm)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_shingles,
           count(*) AS n_distinct, max(c) AS max_repeat
         FROM c GROUP BY doc_id""",

    "token_diversity" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         c AS (SELECT doc_id, tok, count(*) AS c
               FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY doc_id, tok),
         a AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*) AS n_distinct,
                 sum(c * c)::BIGINT AS sum_sq
               FROM c GROUP BY doc_id)
         SELECT doc_id, n_tokens, n_distinct, sum_sq,
           floor((1 - sum_sq::DOUBLE / (n_tokens * n_tokens)) * 1000000 + 0.5) / 1000000
             AS simpson,
           floor((n_tokens * n_tokens)::DOUBLE / sum_sq * 10000 + 0.5) / 10000
             AS effective_vocab
         FROM a""",

    // interpolated-quantile threshold: quantile_cont matches Spark's
    // percentile() definition (index p·(n−1), linear interpolation)
    "quantile_gate" ->
      """WITH s AS (SELECT doc_id,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT
               AS n_bpe_tokens
           FROM documents)
         SELECT doc_id, n_bpe_tokens FROM s
         WHERE n_bpe_tokens >= (SELECT quantile_cont(n_bpe_tokens, 0.75) FROM s)""",

    // histogram threshold replay: same clamped integer bins, cumulative
    // walk to rank = ceil(q*n), est threshold = upper bin edge; exact
    // quantile_cont rides along for the measured error columns
    "quantile_gate_sketch" ->
      """WITH s AS (SELECT doc_id,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT
               AS n_bpe_tokens
           FROM documents),
         b AS (SELECT greatest(0, least(floor(n_bpe_tokens * 100 + 0.5)::BIGINT // 100, 1023))
                 AS bin FROM s),
         hist AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
         cum AS (SELECT bin, sum(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
                 FROM hist),
         tot AS (SELECT sum(c)::BIGINT AS n FROM hist),
         est AS (SELECT ((min(bin) + 1) * 100)::DOUBLE / 100 AS thr_est
                 FROM cum, tot WHERE cum >= ceil(0.75 * n)),
         ex AS (SELECT floor(quantile_cont(floor(n_bpe_tokens * 100 + 0.5)::BIGINT, 0.75)
                  / 100 * 10000 + 0.5) / 10000 AS thr_exact FROM s)
         SELECT doc_id, n_bpe_tokens, thr_est, thr_exact,
           floor((thr_est - thr_exact) * 10000 + 0.5) / 10000 AS thr_err
         FROM s, est, ex WHERE n_bpe_tokens >= thr_est""",

    "chunk_sliding" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
           FROM documents),
         z AS (SELECT doc_id, tk,
             greatest(1, CAST(ceil((len(tk) - 64) / 48.0) AS BIGINT) + 1) AS nc
           FROM t),
         i AS (SELECT doc_id, tk, unnest(range(0, nc)) AS chunk_id FROM z)
         SELECT doc_id, chunk_id,
           len(tk[chunk_id*48+1 : chunk_id*48+64])::BIGINT AS n_tokens,
           array_to_string(tk[chunk_id*48+1 : chunk_id*48+64], ' ') AS chunk_text
         FROM i""",

    // cut points are cumulative permille: train [0,900) val [900,950)
    // test [950,1000) over the same Lehmer bucket
    "split_assign" ->
      """SELECT CASE WHEN b < 900 THEN 'train'
                     WHEN b < 950 THEN 'val'
                     ELSE 'test' END AS split,
           count(*) AS n, min(doc_id) AS min_id
         FROM (SELECT doc_id,
                 ((doc_id * 48271 + 11) % 2147483647) % 1000 AS b
               FROM documents)
         GROUP BY 1""",

    "source_mixture_weights" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
         t AS (SELECT list_reduce(list_prepend(0.0,
                 list(sqrt(n_docs::DOUBLE) ORDER BY source)),
                 (acc, x) -> acc + x) AS tot FROM c)
         SELECT c.source, c.n_docs,
           floor(sqrt(c.n_docs::DOUBLE) / t.tot * 1000000 + 0.5) / 1000000 AS weight
         FROM c, t""",

    "events_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id,
             epoch_us(ts::TIMESTAMP) // 86400000000 AS day FROM events),
         f AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id),
         j AS (SELECT DISTINCT ud.user_id, f.cohort_day // 7 AS cohort_week,
                 (ud.day - f.cohort_day) // 7 AS week_offset
               FROM ud JOIN f USING (user_id))
         SELECT cohort_week, week_offset, count(*) AS n_users
         FROM j GROUP BY 1, 2""",

    "window_cume" ->
      """SELECT event_id, user_id,
           percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id) AS pr,
           cume_dist() OVER (PARTITION BY user_id ORDER BY value, event_id) AS cd
         FROM events""",

    "boilerplate_score" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 2
                 THEN list_transform(generate_series(1, len(toks) - 1),
                        i -> array_to_string(toks[i:i+1], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
         df AS (SELECT g, count(*) AS d FROM ex GROUP BY g),
         freq AS (SELECT g FROM df WHERE d >= 30),
         hits AS (SELECT ex.doc_id, count(*) AS n_boiler
                  FROM ex JOIN freq USING (g) GROUP BY ex.doc_id)
         SELECT s.doc_id, len(s.sh)::BIGINT AS n_shingles,
           coalesce(h.n_boiler, 0)::BIGINT AS n_boiler,
           floor((CASE WHEN len(s.sh) > 0
                       THEN coalesce(h.n_boiler, 0)::DOUBLE / len(s.sh)
                       ELSE 0.0 END) * 10000 + 0.5) / 10000 AS boiler_ratio
         FROM s LEFT JOIN hits h USING (doc_id)""",

    "split_cluster_safe" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM s a JOIN s b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6),
         e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
         lab AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
                 FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id)
         SELECT doc_id, cluster,
           CASE WHEN b < 900 THEN 'train'
                WHEN b < 950 THEN 'val'
                ELSE 'test' END AS split
         FROM (SELECT doc_id, cluster,
                 ((cluster * 48271 + 11) % 2147483647) % 1000 AS b FROM lab)""",

    "sql_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           AND l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
         GROUP BY 1, 2, 3""",

    "sql_tpch_q10" ->
      """SELECT c_custkey, c_name,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
             / 100.0 AS revenue,
           c_acctbal
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
           AND l_returnflag = 'R'
         GROUP BY c_custkey, c_name, c_acctbal
         ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "sql_tpch_q14" ->
      """WITH l AS (SELECT
             CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents,
             p_type
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01')
         SELECT
           CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           floor(1000000.0 * sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
                 / sum(cents) + 0.5) / 10000 AS promo_pct
         FROM l""",

    "sql_tpch_q8" ->
      """WITH v AS (SELECT
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents,
             n2.n_name AS supp_nation
           FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region ON n1.n_regionkey = r_regionkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
           WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
             AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01')
         SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           floor(1000000.0 * sum(CASE WHEN supp_nation = 'NATION_1' THEN cents ELSE 0 END)
                 / sum(cents) + 0.5) / 10000 AS mkt_share_pct
         FROM v GROUP BY o_year""",

    "sql_tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
             / 100.0 AS profit
         FROM lineitem JOIN part ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%red%'
         GROUP BY n_name, year(o_orderdate)""",

    "sql_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c_custkey, count(o_orderkey) AS c_count
               FROM customer LEFT JOIN orders
                 ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
               GROUP BY c_custkey) AS c_orders
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",

    "sql_tpch_q17" ->
      """SELECT
           CAST(sum(cents) AS BIGINT) AS total_cents,
           floor(sum(cents) / 7.0 + 0.5) / 100.0 AS avg_yearly
         FROM (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
               FROM lineitem JOIN part ON p_partkey = l_partkey
               WHERE p_brand = 'Brand#1' AND p_type = 'SMALL'
                 AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                                   FROM lineitem l2
                                   WHERE l2.l_partkey = p_partkey)) AS small_qty""",

    "sql_tpch_q22" ->
      """WITH avg_bal AS (
           SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) * 1.0 / count(*) AS avg_cents
           FROM customer WHERE c_acctbal > 0.0)
         SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
           count(*) AS numcust,
           CAST(sum(cents) AS BIGINT) AS totacctbal_cents
         FROM (SELECT c_custkey, c_nationkey,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
               FROM customer CROSS JOIN avg_bal
               WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) > avg_cents
                 AND NOT EXISTS (SELECT 1 FROM orders
                                 WHERE o_custkey = c_custkey
                                   AND o_orderdate >= '2000-01-01')) AS rich_idle
         GROUP BY c_nationkey % 5 ORDER BY cntrycode""",

    "tfidf_top_terms" ->
      """WITH toks AS (SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
         docfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (SELECT t.doc_id, t.term, t.tf,
             t.tf * ((n.n_docs * 1000) // d.df) AS score
           FROM tf t JOIN docfreq d USING (term) CROSS JOIN n)
         SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
           CAST(score AS BIGINT) AS score, CAST(rank AS BIGINT) AS rank
         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term) AS rank FROM scored) AS ranked
         WHERE rank <= 3""",

    "shuffle_shards" ->
      """WITH s AS (SELECT doc_id,
             (((doc_id * 48271 + 11) % 2147483647) * 48271) % 2147483647 AS scramble
           FROM documents)
         SELECT doc_id, scramble % 8 AS shard,
           row_number() OVER (PARTITION BY scramble % 8
                              ORDER BY scramble, doc_id) AS pos
         FROM s""",

    // identical IEEE op order as capSources: floor(min(1, f·tot/cnt)·1000)
    "source_cap" ->
      """WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
         g AS (SELECT count(*) AS tot FROM documents),
         r AS (SELECT source, floor(least(1.0, 0.3 * tot / cnt) * 1000) AS permille
               FROM c, g)
         SELECT d.source, count(*) AS n_kept
         FROM documents d JOIN r USING (source)
         WHERE ((d.doc_id * 48271 + 11) % 2147483647) % 1000 < permille
         GROUP BY d.source""",

    "crossmodal_join" ->
      """WITH t AS (SELECT doc_id, text,
                      list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents),
         q AS (SELECT doc_id,
           least(1.0, greatest(0.0,
             0.2 + 0.01 * len(toks) +
             len(list_filter(toks,
               x -> x IN ('the','a','of','and','is','to','in','it','that','for')))::DOUBLE /
               greatest(len(toks), 1) -
             5.0 * length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
               greatest(length(text), 1))) AS quality
           FROM t)
         SELECT label, count(*) AS n, round(avg(quality), 4) AS avg_quality
         FROM embeddings JOIN q ON vec_id = doc_id
         WHERE quality > 0.5 GROUP BY label""",

    "throughput_rangescan" ->
      """SELECT count(*) AS n, CAST(sum(x * 2) AS BIGINT) AS total
         FROM range(100000000) t(x) WHERE x % 3 = 0""",

    "distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",

    "filtered_agg" ->
      """SELECT o_orderstatus,
         count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
         round(sum(o_totalprice) FILTER (WHERE o_totalprice > 200000), 2) AS big_total,
         count(*) AS n
         FROM orders GROUP BY o_orderstatus""",

    "string_shape" ->
      """SELECT c_custkey, upper(substr(c_name, 1, 8)) AS prefix,
         length(c_name)::BIGINT AS name_len,
         lpad(c_custkey::VARCHAR, 8, '0') AS padded
         FROM customer""",

    "window_lag" ->
      """SELECT event_id, user_id,
         round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
         FROM events""",

    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus,
         GROUPING(l_returnflag, l_linestatus)::BIGINT AS g,
         count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority,
         GROUPING(o_orderstatus, o_orderpriority)::BIGINT AS g,
         count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",

    "percentile_agg" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
         round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
         FROM lineitem GROUP BY l_returnflag""",

    "sql_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "sql_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 2) AS avg_disc,
           count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",

    "corpus_top_terms" ->
      """WITH toks AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
                       FROM documents)
         SELECT term, count(*) AS n FROM toks GROUP BY term
         ORDER BY n DESC, term LIMIT 20""",

    "sql_tpch_q18" ->
      """SELECT o_orderkey, o_orderdate::VARCHAR AS orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
         GROUP BY o_orderkey, o_orderdate, o_totalprice""",

    "scalar_subquery" ->
      """SELECT o_orderstatus, count(*) AS n_above,
           round(sum(o_totalprice), 2) AS total_above
         FROM orders
         WHERE o_totalprice >
           (SELECT floor(avg(o_totalprice) * 100 + 0.5) / 100 FROM orders)
         GROUP BY o_orderstatus""",

    "sql_tpch_q3" ->
      """SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate::VARCHAR AS orderdate,
           o_orderpriority AS priority
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < '1995-03-15' AND l_shipdate > '1995-03-15'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, orderdate, l_orderkey LIMIT 10""",

    "sql_tpch_q5" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
         GROUP BY n_name""",

    "skew_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",

    "skew_two_phase" ->
      """SELECT l_partkey AS k, round(sum(l_quantity), 2) AS total
         FROM lineitem GROUP BY l_partkey""",

    "hot_key_report" ->
      """WITH c AS (SELECT user_id AS k, count(*)::BIGINT AS n
                    FROM events GROUP BY 1),
         t AS (SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS n_keys FROM c)
         SELECT k, n, ((n * 1000) // total)::BIGINT AS share_permille,
           ((n * n_keys * 1000000) // total)::BIGINT AS skew_ratio_micro
         FROM c, t ORDER BY n DESC, k ASC LIMIT 20""",

    "join_skew_hub" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem JOIN orders
           ON (CASE WHEN l_orderkey % 5 = 0 THEN 1 ELSE l_orderkey END) = o_orderkey
         GROUP BY o_orderstatus""",

    "group_boxplot" ->
      """WITH li AS (SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
           FROM lineitem),
         g AS (SELECT l_returnflag, count(*) AS n,
                 quantile_cont(cents, [0.25, 0.5, 0.75]) AS qs
               FROM li GROUP BY l_returnflag)
         SELECT l_returnflag, n, u.i - 1 AS q_idx, qs[u.i] AS q_value
         FROM g, (SELECT unnest(generate_series(1, 3)) AS i) u""",

    "orders_rfm" ->
      """WITH base AS (SELECT o_custkey AS c_custkey,
             max(epoch_us(o_orderdate) // 86400000000) AS recency_day,
             count(*) AS frequency,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS monetary_cents
           FROM orders GROUP BY 1),
         thr AS (SELECT
             quantile_cont(recency_day, 0.25) AS r1, quantile_cont(recency_day, 0.5) AS r2,
             quantile_cont(recency_day, 0.75) AS r3,
             quantile_cont(frequency, 0.25) AS f1, quantile_cont(frequency, 0.5) AS f2,
             quantile_cont(frequency, 0.75) AS f3,
             quantile_cont(monetary_cents, 0.25) AS m1, quantile_cont(monetary_cents, 0.5) AS m2,
             quantile_cont(monetary_cents, 0.75) AS m3
           FROM base)
         SELECT c_custkey, recency_day, frequency, monetary_cents,
           (1 + (recency_day >= r1)::INT + (recency_day >= r2)::INT
              + (recency_day >= r3)::INT)::BIGINT AS r_q,
           (1 + (frequency >= f1)::INT + (frequency >= f2)::INT
              + (frequency >= f3)::INT)::BIGINT AS f_q,
           (1 + (monetary_cents >= m1)::INT + (monetary_cents >= m2)::INT
              + (monetary_cents >= m3)::INT)::BIGINT AS m_q
         FROM base, thr""",

    "basket_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
         SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
         FROM li a JOIN li b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2 HAVING count(*) >= 3""",

    "source_overlap" ->
      """WITH t AS (SELECT source, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT source, CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END sh FROM t),
         e AS (SELECT DISTINCT source, sh
               FROM (SELECT source, unnest(sh) AS sh FROM s)),
         sz AS (SELECT source, count(*) AS n FROM e GROUP BY 1),
         i AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_inter
               FROM e a JOIN e b ON a.sh = b.sh AND a.source < b.source GROUP BY 1, 2)
         SELECT source_a, source_b, za.n AS n_a, zb.n AS n_b, n_inter,
           floor(n_inter::DOUBLE / (za.n + zb.n - n_inter) * 1000000 + 0.5) / 1000000
             AS jaccard
         FROM i JOIN sz za ON source_a = za.source JOIN sz zb ON source_b = zb.source""",

    "bigram_condprob" ->
      """WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         b AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
               FROM t WHERE len(toks) >= 2),
         c AS (SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS n_bigram FROM b GROUP BY 1, 2),
         p AS (SELECT w1, sum(n_bigram)::BIGINT AS n_prefix FROM c GROUP BY 1)
         SELECT c.w1, c.w2, n_bigram, n_prefix,
           floor(n_bigram::DOUBLE / n_prefix * 1000000 + 0.5) / 1000000 AS condprob
         FROM c JOIN p USING (w1) WHERE n_bigram >= 5
         ORDER BY n_bigram DESC, w1, w2 LIMIT 50""",

    "corpus_gate" ->
      """WITH t AS (SELECT doc_id, lang, text,
                      list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         m AS (SELECT doc_id, lang, len(toks) AS n,
             len(list_filter(toks,
               x -> x IN ('the','a','of','and','is','to','in','it','that','for'))) AS stops,
             length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
               greatest(length(text), 1) AS digit_ratio,
             len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS s_en,
             len(list_filter(toks, t -> t IN ('el','la','de','que','y'))) AS s_es,
             len(list_filter(toks, t -> t IN ('der','die','und','das','ist'))) AS s_de,
             len(list_filter(toks, t -> t IN ('le','les','et','est','une'))) AS s_fr
           FROM t),
         r AS (SELECT doc_id, max(c) AS mr FROM (
                 SELECT doc_id, gm, count(*) AS c FROM (
                   SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
                     THEN list_transform(generate_series(1, len(toks) - 1),
                            i -> array_to_string(toks[i:i+1], ' '))
                     ELSE [array_to_string(toks, ' ')] END) AS gm FROM t)
                 GROUP BY doc_id, gm)
               GROUP BY doc_id),
         f AS (SELECT m.doc_id,
             n < 30 AS f_short,
             least(1.0, greatest(0.0, 0.2 + 0.01 * n
               + stops::DOUBLE / greatest(n, 1) - 5.0 * digit_ratio)) < 0.6 AS f_quality,
             mr > 2 AS f_repeat,
             (CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                   WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                   WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END) <> lang AS f_lang
           FROM m JOIN r ON m.doc_id = r.doc_id)
         SELECT 'too_short' AS rule, count(*) FILTER (f_short)::BIGINT AS n_docs FROM f
         UNION ALL SELECT 'low_quality', count(*) FILTER (f_quality)::BIGINT FROM f
         UNION ALL SELECT 'repetitive', count(*) FILTER (f_repeat)::BIGINT FROM f
         UNION ALL SELECT 'off_language', count(*) FILTER (f_lang)::BIGINT FROM f
         UNION ALL SELECT 'pass', count(*) FILTER (NOT f_short AND NOT f_quality
           AND NOT f_repeat AND NOT f_lang)::BIGINT FROM f""",

    "embed_covariance" ->
      """WITH v AS (SELECT embedding AS e FROM embeddings),
         pr AS (SELECT unnest(flatten(list_transform(generate_series(1, 16), i ->
                  list_transform(generate_series(i, 16), j ->
                    struct_pack(i := i - 1, j := j - 1,
                      p := floor(e[i]::DOUBLE * e[j]::DOUBLE * 100000000 + 0.5)::BIGINT)))))
                  AS s
                FROM v),
         m AS (SELECT s.i AS i, s.j AS j, count(*) AS n, sum(s.p)::BIGINT AS sp
               FROM pr GROUP BY 1, 2),
         d AS (SELECT s.i AS i, sum(s.x)::BIGINT AS sx FROM (
                 SELECT unnest(list_transform(generate_series(1, 16), k ->
                   struct_pack(i := k - 1,
                     x := floor(e[k]::DOUBLE * 10000 + 0.5)::BIGINT))) AS s
                 FROM v) GROUP BY 1)
         SELECT m.i::BIGINT AS i, m.j::BIGINT AS j, n,
           floor((sp::DOUBLE / 100000000 / n
             - (di.sx::DOUBLE / 10000 / n) * (dj.sx::DOUBLE / 10000 / n)) * 1000000
             + 0.5) / 1000000 AS cov
         FROM m JOIN d di ON m.i = di.i JOIN d dj ON m.j = dj.i""",

    "doc_perplexity" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
               FROM t WHERE len(toks) >= 2),
         bb AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM b),
         c AS (SELECT w1, w2, count(*) AS n_bigram FROM bb GROUP BY 1, 2),
         p AS (SELECT w1, sum(n_bigram)::BIGINT AS n_prefix FROM c GROUP BY 1),
         lm AS (SELECT c.w1, c.w2,
                  floor(-log2(n_bigram::DOUBLE / n_prefix) * 1000000 + 0.5)::BIGINT
                    AS ubits
                FROM c JOIN p USING (w1))
         SELECT doc_id, count(*) AS n_bigrams,
           floor(sum(ubits)::DOUBLE / count(*) + 0.5) / 1000000 AS avg_bits
         FROM bb JOIN lm USING (w1, w2) GROUP BY doc_id""",

    // add-one-smoothed target/corpus LM log-ratio, frozen per bigram
    // as micro-bits (same libm-double protocol as doc_perplexity),
    // doc weight = integer sum
    "dsir_weights" ->
      """WITH t AS (SELECT doc_id, lang = 'en' AS is_t,
                      list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         b AS (SELECT doc_id, is_t, unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
               FROM t WHERE len(toks) >= 2),
         bb AS (SELECT doc_id, is_t, bg.w1 AS w1, bg.w2 AS w2 FROM b),
         c AS (SELECT w1, w2, count(*) AS n_all,
                 coalesce(sum(CASE WHEN is_t THEN 1 ELSE 0 END), 0) AS n_t
               FROM bb GROUP BY 1, 2),
         tot AS (SELECT sum(n_all)::BIGINT AS nn_all, sum(n_t)::BIGINT AS nn_t,
                   count(*)::BIGINT AS vocab FROM c),
         lm AS (SELECT w1, w2,
                  floor((log2((n_t + 1)::DOUBLE / (nn_t + vocab))
                       - log2((n_all + 1)::DOUBLE / (nn_all + vocab)))
                    * 1000000 + 0.5)::BIGINT AS rbits
                FROM c, tot)
         SELECT doc_id, count(*) AS n_bigrams, sum(rbits)::BIGINT AS dsir_mbits,
           sum(rbits) > 0 AS target_like
         FROM bb JOIN lm USING (w1, w2) GROUP BY doc_id""",

    "quality_buckets" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
               FROM t WHERE len(toks) >= 2),
         bb AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM b),
         c AS (SELECT w1, w2, count(*) AS n_bigram FROM bb GROUP BY 1, 2),
         p AS (SELECT w1, sum(n_bigram)::BIGINT AS n_prefix FROM c GROUP BY 1),
         lm AS (SELECT c.w1, c.w2,
                  floor(-log2(n_bigram::DOUBLE / n_prefix) * 1000000 + 0.5)::BIGINT
                    AS ubits
                FROM c JOIN p USING (w1)),
         ppl AS (SELECT doc_id, floor(sum(ubits)::DOUBLE / count(*) + 0.5) / 1000000
                   AS avg_bits
                 FROM bb JOIN lm USING (w1, w2) GROUP BY doc_id),
         s AS (SELECT d.doc_id, d.lang, avg_bits
               FROM documents d JOIN ppl ON d.doc_id = ppl.doc_id),
         thr AS (SELECT lang, quantile_cont(avg_bits, 1.0 / 3) AS t1,
                   quantile_cont(avg_bits, 2.0 / 3) AS t2
                 FROM s GROUP BY lang)
         SELECT s.doc_id, s.lang, avg_bits,
           CASE WHEN avg_bits <= t1 THEN 'head'
                WHEN avg_bits <= t2 THEN 'middle'
                ELSE 'tail' END AS bucket
         FROM s JOIN thr USING (lang)""",

    "event_daily_anomaly" ->
      """WITH d AS (SELECT event_type, epoch_us(ts::TIMESTAMP) // 86400000000 AS day,
                      count(*) AS n_events
                    FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, count(*) AS n_days, sum(n_events)::BIGINT AS s1,
                  sum(n_events * n_events)::BIGINT AS s2 FROM d GROUP BY 1),
         j AS (SELECT d.event_type, day, n_events,
                 s1::DOUBLE / n_days AS mean,
                 (s2::DOUBLE - s1::DOUBLE * s1 / n_days) / n_days AS variance
               FROM d JOIN st USING (event_type))
         SELECT event_type, day, n_events,
           floor((n_events::DOUBLE - mean) / sqrt(variance) * 10000 + 0.5) / 10000 AS z
         FROM j WHERE variance > 0
           AND abs((n_events::DOUBLE - mean) / sqrt(variance)) >= 2.0""",

    "graph_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS (SELECT a.l_partkey AS u, b.l_partkey AS v
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 2),
         d AS (SELECT node, count(*) AS deg
               FROM (SELECT u AS node FROM p UNION ALL SELECT v FROM p) GROUP BY 1),
         o AS (SELECT CASE WHEN (da.deg, p.u) < (db.deg, p.v) THEN p.u ELSE p.v END AS s,
                 CASE WHEN (da.deg, p.u) < (db.deg, p.v) THEN p.v ELSE p.u END AS t
               FROM p JOIN d da ON da.node = p.u JOIN d db ON db.node = p.v),
         w AS (SELECT o1.t AS x, o2.t AS y
               FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t)
         SELECT count(*)::BIGINT AS n_triangles FROM w
         WHERE EXISTS (SELECT 1 FROM p WHERE p.u = w.x AND p.v = w.y)""",

    "graph_pagerank" -> {
      def it(prev: String, cur: String) =
        s"""$cur AS (SELECT e.dst AS node,
              CAST(150000 + (85 * sum(r.r // deg.d)) // 100 AS BIGINT) AS r
            FROM e JOIN deg ON deg.src = e.src JOIN $prev r ON r.node = e.src
            GROUP BY e.dst)"""
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 3),
         e AS (SELECT pa AS src, pb AS dst FROM p UNION ALL SELECT pb, pa FROM p),
         deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
         r0 AS (SELECT DISTINCT src AS node, 1000000::BIGINT AS r FROM e),
         ${it("r0", "r1")}, ${it("r1", "r2")}, ${it("r2", "r3")},
         ${it("r3", "r4")}, ${it("r4", "r5")}
         SELECT node AS part, r AS rank_e6 FROM r5"""
    },

    "dq_audit" ->
      """SELECT 'lineitem_null_orderkey' AS rule,
           count(*) FILTER (l_orderkey IS NULL)::BIGINT AS n_bad FROM lineitem
         UNION ALL SELECT 'lineitem_nonpositive_price',
           count(*) FILTER (l_extendedprice <= 0)::BIGINT FROM lineitem
         UNION ALL SELECT 'lineitem_discount_range',
           count(*) FILTER (l_discount < 0 OR l_discount > 0.5)::BIGINT FROM lineitem
         UNION ALL SELECT 'orders_orphan_customer', count(*)::BIGINT FROM orders
           WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
         UNION ALL SELECT 'lineitem_dup_pk', coalesce(sum(c), 0)::BIGINT
           FROM (SELECT count(*) AS c FROM lineitem
                 GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)""",

    "budget_select" ->
      """WITH t AS (SELECT doc_id, source,
             len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source
                                     ORDER BY n_tokens DESC, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_tokens FROM t)
         SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         FROM c WHERE cum_tokens <= 800""",

    "mixture_epochs" ->
      """WITH reps AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         nm AS (SELECT max(n) AS n_max FROM reps),
         f AS (SELECT lang,
                 CAST(ceil(sqrt(n_max::DOUBLE / n)) AS BIGINT) AS repeats
               FROM reps, nm)
         SELECT d.doc_id, d.lang, f.repeats,
           unnest(generate_series(1, f.repeats)) AS epoch
         FROM documents d JOIN f USING (lang)""",

    "snapshot_diff" ->
      """WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
         n AS (SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0 THEN text || ' rev' ELSE text END AS text
               FROM documents WHERE doc_id % 5 <> 0)
         SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.text = n.text THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""",

    "shingle_novelty" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
         f AS (SELECT g, min(doc_id) AS first_doc FROM ex GROUP BY g),
         nov AS (SELECT first_doc AS doc_id, count(*) AS n_novel FROM f GROUP BY first_doc)
         SELECT s.doc_id, len(s.sh)::BIGINT AS n_shingles,
           coalesce(nov.n_novel, 0)::BIGINT AS n_novel,
           floor(coalesce(nov.n_novel, 0)::DOUBLE / len(s.sh) * 10000 + 0.5) / 10000 AS novelty
         FROM s LEFT JOIN nov ON s.doc_id = nov.doc_id""",

    "gopher_rules" ->
      """WITH t AS (SELECT doc_id, text,
                      list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents),
         m AS (SELECT doc_id, len(toks) AS n,
           list_sum(list_transform(toks, x -> length(x))) AS char_sum,
           len(list_filter(toks,
             x -> x IN ('the','a','of','and','is','to','in','it','that','for'))) AS stops,
           length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
             greatest(length(text), 1) AS digit_ratio,
           len(list_distinct(toks)) AS n_dist
           FROM t)
         SELECT doc_id, n::BIGINT AS n_tokens,
           (n BETWEEN 5 AND 1000) AS r_word_count,
           (char_sum::DOUBLE / greatest(n, 1) BETWEEN 2.0 AND 10.0) AS r_avg_len,
           (stops >= 2) AS r_stop,
           (digit_ratio < 0.1) AS r_digit,
           (n_dist::DOUBLE / greatest(n, 1) >= 0.3) AS r_dup,
           ((n BETWEEN 5 AND 1000) AND (char_sum::DOUBLE / greatest(n, 1) BETWEEN 2.0 AND 10.0)
             AND (stops >= 2) AND (digit_ratio < 0.1)
             AND (n_dist::DOUBLE / greatest(n, 1) >= 0.3)) AS keep
         FROM m""",

    "bloom_semi_join" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n, sum(l_quantity) AS sum_qty
         FROM lineitem
         WHERE l_orderkey IN
           (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
         GROUP BY 1""",

    "bm25_topk" ->
      """WITH t AS (SELECT doc_id,
                      list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents),
         d AS (SELECT doc_id, toks, len(toks)::BIGINT AS dl FROM t),
         s AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl,
           sum(CASE WHEN list_contains(toks, 'spark')  THEN 1 ELSE 0 END)::BIGINT AS df_0,
           sum(CASE WHEN list_contains(toks, 'hash')   THEN 1 ELSE 0 END)::BIGINT AS df_1,
           sum(CASE WHEN list_contains(toks, 'merge')  THEN 1 ELSE 0 END)::BIGINT AS df_2,
           sum(CASE WHEN list_contains(toks, 'window') THEN 1 ELSE 0 END)::BIGINT AS df_3
           FROM d),
         i AS (SELECT *,
           floor(ln((n_docs::DOUBLE - df_0::DOUBLE + 0.5) / (df_0::DOUBLE + 0.5) + 1.0) * 1000000 + 0.5) / 1000000 AS idf_0,
           floor(ln((n_docs::DOUBLE - df_1::DOUBLE + 0.5) / (df_1::DOUBLE + 0.5) + 1.0) * 1000000 + 0.5) / 1000000 AS idf_1,
           floor(ln((n_docs::DOUBLE - df_2::DOUBLE + 0.5) / (df_2::DOUBLE + 0.5) + 1.0) * 1000000 + 0.5) / 1000000 AS idf_2,
           floor(ln((n_docs::DOUBLE - df_3::DOUBLE + 0.5) / (df_3::DOUBLE + 0.5) + 1.0) * 1000000 + 0.5) / 1000000 AS idf_3
           FROM s),
         c AS (SELECT doc_id,
           len(list_filter(toks, x -> x = 'spark'))::DOUBLE  AS tf0,
           len(list_filter(toks, x -> x = 'hash'))::DOUBLE   AS tf1,
           len(list_filter(toks, x -> x = 'merge'))::DOUBLE  AS tf2,
           len(list_filter(toks, x -> x = 'window'))::DOUBLE AS tf3,
           0.25 + 0.75 * (dl::DOUBLE * (SELECT n_docs FROM i)::DOUBLE / (SELECT sum_dl FROM i)::DOUBLE) AS dn
           FROM d),
         sc AS (SELECT doc_id, floor((
             (SELECT idf_0 FROM i) * tf0 * 2.2 / (tf0 + 1.2 * dn)
           + (SELECT idf_1 FROM i) * tf1 * 2.2 / (tf1 + 1.2 * dn)
           + (SELECT idf_2 FROM i) * tf2 * 2.2 / (tf2 + 1.2 * dn)
           + (SELECT idf_3 FROM i) * tf3 * 2.2 / (tf3 + 1.2 * dn)
           ) * 1000000 + 0.5)::BIGINT AS score_u FROM c)
         SELECT doc_id, score_u FROM sc WHERE score_u > 0
         ORDER BY score_u DESC, doc_id LIMIT 50""",

    "er_blocked_pairs" ->
      """WITH p AS (SELECT doc_id, lang, source, substr(text, 1, 32) AS pref FROM documents),
         r AS (SELECT *, row_number() OVER (PARTITION BY lang, source
                 ORDER BY pref, doc_id) AS rn FROM p),
         a AS (SELECT r.*, floor((rn - 1) / 8)::BIGINT + x.o AS buck
               FROM r, (VALUES (0), (1)) x(o)),
         b AS (SELECT r.*, floor((rn - 1) / 8)::BIGINT AS buck FROM r),
         j AS (SELECT least(a.doc_id, b.doc_id) AS id_a,
                 greatest(a.doc_id, b.doc_id) AS id_b,
                 levenshtein(a.pref, b.pref) AS dist
               FROM a JOIN b ON a.lang = b.lang AND a.source = b.source
                 AND a.buck = b.buck AND b.rn > a.rn AND b.rn - a.rn <= 8)
         SELECT id_a, id_b, dist::BIGINT AS dist FROM j WHERE dist <= 18""",

    "cardinality_hll" -> {
      val m = 256
      val rhoCase = (1 to 32).map(r => s"WHEN w >= ${1L << (32 - r)} THEN $r")
        .mkString("CASE ", " ", " ELSE 33 END")
      s"""WITH t AS (SELECT source AS g, unnest(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS tok FROM documents),
         vocab AS (SELECT DISTINCT tok FROM t),
         hh AS (SELECT tok, ${duckFnv("tok")} AS h0 FROM vocab),
         ${duckFmixCtes()},
         hw AS (SELECT tok, (h // ${1L << 56})::BIGINT AS j,
                  ((h // ${1L << 24}) % ${1L << 32})::BIGINT AS w FROM f5),
         rr AS (SELECT tok, j, $rhoCase AS r FROM hw),
         dt AS (SELECT DISTINCT g, tok FROM t),
         regs AS (SELECT g, j, max(r) AS mreg FROM dt JOIN rr USING (tok) GROUP BY 1, 2),
         gs AS (SELECT DISTINCT g FROM t),
         fl AS (SELECT gs.g, s.j, coalesce(regs.mreg, 0) AS mreg
                FROM gs CROSS JOIN generate_series(0, ${m - 1}) s(j)
                LEFT JOIN regs ON regs.g = gs.g AND regs.j = s.j),
         z AS (SELECT g, sum(1::BIGINT << (33 - mreg))::BIGINT AS z_scaled,
                 sum(CASE WHEN mreg = 0 THEN 1 ELSE 0 END)::BIGINT AS v_zero
               FROM fl GROUP BY 1),
         ex AS (SELECT g, count(DISTINCT tok) AS n_exact FROM t GROUP BY 1),
         e AS (SELECT g, z_scaled, v_zero,
                 0.7213 / (1.0 + (1.079 / ${m.toDouble})) * ${(m * m).toDouble}
                   * 8589934592.0 / z_scaled::DOUBLE AS eraw FROM z)
         SELECT ex.g AS source, n_exact::BIGINT AS n_exact,
           CASE WHEN eraw <= ${2.5 * m} AND v_zero > 0
             THEN floor(${m.toDouble} * ln(${m.toDouble} / v_zero::DOUBLE) + 0.5)
             ELSE floor(eraw + 0.5) END::BIGINT AS n_est_hll
         FROM ex JOIN e USING (g)"""
    },

    "column_stats" -> {
      val m = 256
      val rhoCase = (1 to 32).map(r => s"WHEN w >= ${1L << (32 - r)} THEN $r")
        .mkString("CASE ", " ", " ELSE 33 END")
      s"""WITH pairs AS (
           SELECT 'lang' AS g, lang::VARCHAR AS v FROM documents
           UNION ALL SELECT 'source', source::VARCHAR FROM documents
           UNION ALL SELECT 'doc_id', doc_id::VARCHAR FROM documents
           UNION ALL SELECT 'n_chars', n_chars::VARCHAR FROM documents),
         basic AS (SELECT g, count(*)::BIGINT AS n_rows,
             sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
             min(v) AS min_str, max(v) AS max_str,
             sum(CASE WHEN v IS NULL THEN 0 ELSE length(v) END)::BIGINT AS sum_len
           FROM pairs GROUP BY 1),
         vocab AS (SELECT DISTINCT v AS tok FROM pairs WHERE v IS NOT NULL),
         hh AS (SELECT tok, ${duckFnv("tok")} AS h0 FROM vocab),
         ${duckFmixCtes()},
         hw AS (SELECT tok, (h // ${1L << 56})::BIGINT AS j,
                  ((h // ${1L << 24}) % ${1L << 32})::BIGINT AS w FROM f5),
         rr AS (SELECT tok, j, $rhoCase AS r FROM hw),
         dt AS (SELECT DISTINCT g, v AS tok FROM pairs WHERE v IS NOT NULL),
         regs AS (SELECT g, j, max(r) AS mreg FROM dt JOIN rr USING (tok) GROUP BY 1, 2),
         zs AS (SELECT g,
             (sum(1::BIGINT << (33 - mreg)) + ($m - count(*)) * (1::BIGINT << 33))::BIGINT
               AS z_scaled,
             ($m - count(*))::BIGINT AS v_zero FROM regs GROUP BY 1),
         es AS (SELECT g, v_zero,
             0.7213 / (1.0 + (1.079 / ${m.toDouble})) * ${(m * m).toDouble}
               * 8589934592.0 / z_scaled::DOUBLE AS eraw FROM zs),
         sing AS (SELECT g,
             CASE WHEN eraw <= ${2.5 * m} AND v_zero > 0
               THEN floor(${m.toDouble} * ln(${m.toDouble} / v_zero::DOUBLE) + 0.5)
               ELSE floor(eraw + 0.5) END::BIGINT AS ndv_est_hll FROM es),
         ex AS (SELECT g, count(DISTINCT v)::BIGINT AS ndv_exact
                FROM pairs WHERE v IS NOT NULL GROUP BY 1)
         SELECT b.g AS col_name, n_rows, n_nulls,
           coalesce(ex.ndv_exact, 0)::BIGINT AS ndv_exact,
           coalesce(sing.ndv_est_hll, 0)::BIGINT AS ndv_est_hll,
           min_str, max_str,
           ((sum_len * 1000000) // greatest(n_rows, 1))::BIGINT AS avg_len_micro
         FROM basic b LEFT JOIN ex USING (g) LEFT JOIN sing USING (g)"""
    },

    "source_overlap_hll" -> {
      val m = 256
      val rhoCase = (1 to 32).map(r => s"WHEN w >= ${1L << (32 - r)} THEN $r")
        .mkString("CASE ", " ", " ELSE 33 END")
      // sparse z: absent registers contribute 2^33 to the sum and 1 to
      // v_zero — identical integers to the dense 0-filled form
      def zAgg(keys: String) =
        s"""SELECT $keys,
            (sum(1::BIGINT << (33 - mreg)) + ($m - count(*)) * (1::BIGINT << 33))::BIGINT
              AS z_scaled,
            ($m - count(*))::BIGINT AS v_zero"""
      val eraw = s"0.7213 / (1.0 + (1.079 / ${m.toDouble})) * ${(m * m).toDouble}" +
        s" * 8589934592.0 / z_scaled::DOUBLE"
      val estCase = s"""CASE WHEN eraw <= ${2.5 * m} AND v_zero > 0
             THEN floor(${m.toDouble} * ln(${m.toDouble} / v_zero::DOUBLE) + 0.5)
             ELSE floor(eraw + 0.5) END::BIGINT"""
      s"""WITH t AS (SELECT source AS g, unnest(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS tok FROM documents),
         vocab AS (SELECT DISTINCT tok FROM t),
         hh AS (SELECT tok, ${duckFnv("tok")} AS h0 FROM vocab),
         ${duckFmixCtes()},
         hw AS (SELECT tok, (h // ${1L << 56})::BIGINT AS j,
                  ((h // ${1L << 24}) % ${1L << 32})::BIGINT AS w FROM f5),
         rr AS (SELECT tok, j, $rhoCase AS r FROM hw),
         dt AS (SELECT DISTINCT g, tok FROM t),
         regs AS (SELECT g, j, max(r) AS mreg FROM dt JOIN rr USING (tok) GROUP BY 1, 2),
         zs AS (${zAgg("g")} FROM regs GROUP BY 1),
         es AS (SELECT g, v_zero, $eraw AS eraw FROM zs),
         sing AS (SELECT g, $estCase AS est FROM es),
         gs AS (SELECT DISTINCT g FROM regs),
         pairs AS (SELECT a.g AS source_a, b.g AS source_b
                   FROM gs a JOIN gs b ON a.g < b.g),
         uregs AS (SELECT p.source_a, p.source_b, r.j, max(r.mreg) AS mreg
                   FROM pairs p JOIN regs r ON r.g = p.source_a OR r.g = p.source_b
                   GROUP BY 1, 2, 3),
         zu AS (${zAgg("source_a, source_b")} FROM uregs GROUP BY 1, 2),
         eu AS (SELECT source_a, source_b, v_zero, $eraw AS eraw FROM zu),
         un AS (SELECT source_a, source_b, $estCase AS est_union FROM eu),
         dh AS (SELECT DISTINCT t.g, f5.h FROM t JOIN f5 USING (tok)),
         inter AS (SELECT a.g AS source_a, b.g AS source_b,
                     count(*)::BIGINT AS n_inter_exact
                   FROM dh a JOIN dh b ON a.h = b.h AND a.g < b.g GROUP BY 1, 2)
         SELECT p.source_a, p.source_b,
           coalesce(i.n_inter_exact, 0)::BIGINT AS n_inter_exact,
           sa.est AS est_a, sb.est AS est_b, u.est_union,
           greatest(sa.est + sb.est - u.est_union, 0)::BIGINT AS n_inter_est,
           CASE WHEN coalesce(i.n_inter_exact, 0) = 0 THEN NULL
             ELSE floor((greatest(sa.est + sb.est - u.est_union, 0)
                 - i.n_inter_exact)::DOUBLE / i.n_inter_exact * 1000000 + 0.5)
               / 1000000 END AS inter_err
         FROM pairs p
         JOIN sing sa ON sa.g = p.source_a
         JOIN sing sb ON sb.g = p.source_b
         JOIN un u ON u.source_a = p.source_a AND u.source_b = p.source_b
         LEFT JOIN inter i ON i.source_a = p.source_a AND i.source_b = p.source_b"""
    },

    "join_size_estimate" -> {
      val (cas, cbs) = graft.functions.MinHashSig.coeffs(4)
      val cp = graft.functions.MinHashSig.P
      val rows = (0 until 4).map(i => s"($i, ${cas(i)}, ${cbs(i)})").mkString(", ")
      def side(table: String, key: String, where: String, n: String, out: String) =
        s"""${out}0 AS (SELECT CAST($key AS VARCHAR) AS k, count(*) AS $n
               FROM $table $where GROUP BY 1),
           ${out}h AS (SELECT k, $n,
                 ((((CASE WHEN hu >= '9223372036854775808'::HUGEINT
                      THEN hu - '18446744073709551616'::HUGEINT ELSE hu END)
                    % $cp) + $cp) % $cp)::BIGINT AS hh
               FROM (SELECT k, $n, ${duckFnv("k")} AS hu FROM ${out}0)),
           s$out AS (SELECT p.i AS i, ((p.a * hh + p.b) % $cp) % 1024 AS slot,
                 sum($n)::BIGINT AS c$out
               FROM ${out}h CROSS JOIN (VALUES $rows) AS p(i, a, b) GROUP BY 1, 2)"""
      s"""WITH ${side("lineitem", "l_orderkey", "", "na", "a")},
         ${side("orders", "o_orderkey", "WHERE o_orderpriority = '1-URGENT'", "nb", "b")},
         ex AS (SELECT coalesce(sum(a0.na * b0.nb), 0)::BIGINT AS n_exact
                FROM a0 JOIN b0 USING (k)),
         e AS (SELECT i, sum(ca * cb)::BIGINT AS est_i
               FROM sa JOIN sb USING (i, slot) GROUP BY 1),
         m AS (SELECT CASE WHEN count(*) < 4 THEN 0
                 ELSE min(est_i) END::BIGINT AS n_est FROM e)
         SELECT n_exact, n_est,
           CASE WHEN n_exact = 0 THEN NULL
             ELSE floor((n_est - n_exact)::DOUBLE / n_exact * 1000000 + 0.5) / 1000000
           END AS err
         FROM ex, m"""
    },

    "events_dedup_window" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
                      epoch_us(ts::TIMESTAMP) AS tus FROM events),
         m AS (SELECT *, (lag(tus) OVER (PARTITION BY user_id, event_type
                 ORDER BY tus, event_id) IS NULL
               OR tus - lag(tus) OVER (PARTITION BY user_id, event_type
                 ORDER BY tus, event_id) > 60000000) AS keep FROM e)
         SELECT event_type, count(*)::BIGINT AS n_total,
           sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_dropped
         FROM m GROUP BY 1""",

    "events_gap_stats" ->
      """WITH e AS (SELECT user_id, event_id,
                      epoch_us(ts::TIMESTAMP) AS tus FROM events),
         m AS (SELECT user_id,
                 tus - lag(tus) OVER (PARTITION BY user_id
                   ORDER BY tus, event_id) AS gap FROM e)
         SELECT user_id, count(*)::BIGINT AS n_events,
           count(gap)::BIGINT AS n_gaps,
           min(gap) AS min_gap_us, max(gap) AS max_gap_us,
           floor(sum(gap) / greatest(count(gap), 1))::BIGINT AS avg_gap_us
         FROM m GROUP BY 1""",

    "zorder_layout" -> s"""
         WITH m AS (SELECT l_partkey % 65536 AS zx, l_suppkey % 65536 AS zy FROM lineitem),
         z AS (SELECT zx, zy, ${(0 until 16).map(i =>
           s"(((zx >> $i) & 1) << ${2 * i}) + (((zy >> $i) & 1) << ${2 * i + 1})")
           .mkString(" + ")} AS zval FROM m)
         SELECT (zval >> 26)::INTEGER AS file_id, count(*)::BIGINT AS n_rows,
           min(zx) AS x_min, max(zx) AS x_max, min(zy) AS y_min, max(zy) AS y_max
         FROM z GROUP BY 1"""
  ) ++ portableTpch.map { case (name, (_, sql)) => name -> sql }
}
