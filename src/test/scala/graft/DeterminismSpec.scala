package graft

/** Rerun-determinism pins: the queries whose plans involve iteration,
  * sampling, hashing, windows over exploded rows, or integer folds
  * must produce IDENTICAL rows on every execution — at any
  * parallelism. This is the within-engine half of the reproducibility
  * contract (the DuckDB oracle is the cross-engine half): a retry, a
  * speculative re-execution, or a different cluster size must never
  * change a training corpus.
  */
class DeterminismSpec extends SparkSpec {

  private val queries = Seq(
    "dedup_minhash",        // banded LSH + verify
    "dedup_clusters",       // iterative label propagation
    "graph_pagerank",       // 5 integer iterations
    "budget_select",        // histogram offsets + windows
    "shuffle_shards",       // Lehmer scramble + windows
    "contrastive_triplets", // Lehmer negatives + top-1 positives
    "ann_ivf_pq",           // prune + integer coarse score + rerank
    "mixture_epochs",       // broadcast factors + sequence explode
    "orders_rfm",           // percentile thresholds + labels
    "doc_perplexity",       // log2 frozen to integer micro-bits
    "quality_buckets",      // per-lang percentile cutoffs + buckets
    "corpus_gate",          // sum-of-CASEs over row-local kernels
    "embed_covariance")     // scaled-integer moment sums

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.mkString("|")).sorted.toSeq

  test("iterative/sampled/hashed queries are rerun-deterministic") {
    val failures = queries.flatMap { q =>
      val a = rows(q)
      val b = rows(q)
      if (a != b) Some(q) else None
    }
    assert(failures.isEmpty, s"nondeterministic queries: $failures")
  }
}
