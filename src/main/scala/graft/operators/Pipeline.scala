package graft.operators

import graft.{Num, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond per-pair dedup: near-dup
  * CLUSTERING (connected components), deterministic SAMPLING, a
  * BPE-style regex tokenizer, and PII scrubbing — the stages that sit
  * between raw crawl and training shards at 100 TB.
  *
  * Scale notes, per operator:
  *  - connected components: iterative hash-to-min label propagation —
  *    each round is one shuffle-join; rounds are bounded by component
  *    diameter (near-dup clusters are clique-ish, so 2-3 rounds). This
  *    is the standard way to cluster dedup pairs on a cluster; no
  *    driver-side graph ever materializes.
  *  - hash sampling: a pure filter on a content hash — no shuffle, no
  *    state, embarrassingly parallel, deterministic across engines and
  *    run-to-run (unlike rand()-based sampling, which is neither).
  *  - stratified sampling: exact per-stratum rate via one window sort
  *    per stratum; at skewed-stratum scale the same shape runs as
  *    repartition-by-stratum + sortWithinPartitions.
  *  - tokenizer / scrub: per-row regex expression pipelines, scan-bound.
  *
  * Sampling hashes are md5-based (the hash both engines share) so every
  * query here is hash-exact against its DuckDB oracle.
  */
object Pipeline extends QueryModule {
  import Tables._
  import Num._

  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  private val cardPat = "[0-9]{12,19}"
  // Spark SQL string literals process escapes, so \s needs doubling
  // inside expr() text (the DuckDB oracle keeps the single form).
  private val bpePat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]"

  /** Connected components by hash-to-min: every node repeatedly takes
    * the min label among itself and its neighbors until fixpoint. Each
    * iteration is ONE shuffle-join plus ONE aggregate, and the
    * convergence test rides the same aggregate (self rows carry the
    * old label), so a round costs exactly two shuffles and one tiny
    * scan of materialized output — no extra convergence job.
    *
    * Both the edge set and each round's labels are eagerly
    * localCheckpoint'ed: the upstream candidate-pair pipeline runs
    * exactly once, and the per-round plan stays flat instead of
    * re-analyzing an N-round lineage (which made driver-side plan
    * analysis, not cluster work, the dominant cost). On a real
    * cluster the same shape uses reliable checkpointing to HDFS/S3;
    * rounds are bounded by component diameter (near-dup clusters are
    * clique-ish, so 2-3 rounds).
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("a_id").cast("long").as("src"),
      col("b_id").cast("long").as("dst"))
    // (Round 14 re-examined: hash-partitioning + cache()ing sym to
    // kill the per-round join exchange measured NO job/time win — AQE
    // already broadcasts the tiny label side, so sym streams without
    // an exchange anyway; the repartition only added a shuffle.
    // Kept the proven checkpoint.)
    val sym = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    // Round 1 is fused into the loop (round 14): with identity labels
    // the neighbor-label join IS the edge list itself (label = dst),
    // and the self rows are (src, src, src) — duplicates are harmless
    // under min/max, so the initial distinct-nodes pass AND its
    // checkpoint AND the first join all collapse away (two fewer
    // actions and one less shuffle join per clustering; the label
    // stream per round is otherwise identical, so every round's output
    // — and the fixpoint — is bit-for-bit unchanged).
    var labels: DataFrame = null
    var changed = true
    var rounds = 0
    while (changed && rounds < 50) {
      // Neighbor label stream + tagged self rows in one union: the min
      // aggregate yields the new label, the max of `old` (null on
      // neighbor rows) recovers the previous one for the convergence
      // test — one groupBy serves both.
      val (nbrRows, selfRows) =
        if (labels == null) (
          sym.select(col("src").as("node"), col("dst").as("label"),
            lit(null).cast("long").as("old")),
          sym.select(col("src").as("node"), col("src").as("label"),
            col("src").as("old")))
        else (
          sym.join(labels, sym("dst") === labels("node"))
            .select(sym("src").as("node"), col("label"),
              lit(null).cast("long").as("old")),
          labels.select(col("node"), col("label"),
            col("label").as("old")))
      val next = nbrRows.union(selfRows)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
        .localCheckpoint() // eager: one pass computes labels + delta
      changed = next.filter(col("label") < col("old")).limit(1).count() > 0
      labels = next.select(col("node"), col("label"))
      rounds += 1
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Near-dup cluster map for a corpus dir, computed once per session.
    *
    * Unlike the single-DataFrame operators (which share work through
    * Spark's plan cache automatically), the CC loop materializes per
    * round, so two consumers (`dedup_cluster`, `dedup_survivors`)
    * would each re-run the whole iteration. A real pipeline computes
    * the clustering once and every downstream stage reads it; this
    * memo (keyed by session + immutable input dir) is that shape.
    */
  private val ccMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()
  /** Drop every memoized clustering (benchmarks/probes call this when
    * they need a cold re-computation, e.g. after a warmup pass or when
    * a probe rewrites an input dir in place — the memo assumes input
    * dirs are immutable within a session). */
  def resetMemo(): Unit = {
    // unpersist before dropping the handle: clearing alone would leave
    // the cached clustering pinned in the session CacheManager with no
    // reference left to free it
    ccMemo.values.forEach(df =>
      try df.unpersist() catch { case _: Throwable => () })
    ccMemo.clear()
  }
  private def clusters(s: SparkSession, d: String): DataFrame = {
    // evict entries whose session is gone so long-lived JVMs that cycle
    // SparkSessions don't pin dead cached plans
    ccMemo.keySet.removeIf(k => k._1.sparkContext.isStopped)
    ccMemo.computeIfAbsent((s, d), { _ =>
      connectedComponents(
        Dedup.minhashPairs(documents(s, d))
          .select(col("a_id"), col("b_id")))
        .cache()
    })
  }

  /** Int8 symmetric per-vector quantization audit over (vec_id,
    * embedding): scale = max|v|/127, q_i = round(v_i/scale); emits the
    * exact integer code checksum plus max/mean-square reconstruction
    * error. All-zero vectors quantize to all-zero codes (scale 0 branch)
    * rather than dividing by zero. Every arithmetic step is a single
    * IEEE double op or an integer, so a DuckDB oracle reproduces it
    * bit-for-bit; pure per-row map, no shuffle. */
  def quantizeInt8(vecs: DataFrame): DataFrame =
    vecs
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("scale", expr(
        "array_max(transform(v, x -> abs(x))) / 127.0D"))
      .withColumn("q", expr(
        "CASE WHEN scale = 0.0D THEN transform(v, x -> 0L)" +
          " ELSE transform(v, x -> cast(round(x / scale) as bigint)) END"))
      .withColumn("err", expr(
        "CASE WHEN scale = 0.0D THEN transform(v, x -> 0.0D)" +
          " ELSE zip_with(v, q, (x, c) -> abs(x - c * scale)) END"))
      .select(col("vec_id"), col("scale"),
        expr("aggregate(q, 0L, (acc, c) -> acc + c)").as("q_checksum"),
        expr("array_max(err)").as("max_err"),
        expr("aggregate(err, 0.0D, (acc, e) -> acc + e * e)" +
          " / size(err)").as("mse"))

  /** Sequence packing: greedy fixed-token-budget packing per shard in
    * doc_id order — the final assembly step before training
    * (contiguous documents concatenate into fixed-length sequences; a
    * doc over budget takes a pack alone, truncation is the tokenizer's
    * concern downstream). Greedy-with-reset is inherently sequential
    * PER SHARD, so the shard is the parallel unit — exactly how
    * packing runs at 100 TB: thousands of shards (`nShards` is the
    * knob) packed concurrently, one linear scan each, no cross-shard
    * coordination. Output is the pack PLAN (doc -> pack id + running
    * token count), the thing a writer partitions on.
    *
    * The per-shard ordering belongs to the engine, not task memory:
    * `repartition(shard)` co-locates each shard, `sortWithinPartitions
    * (shard, doc_id)` makes shards contiguous and ordered (Spark's
    * external sort spills — no whole-shard array in the task), and the
    * scan is a streaming `mapPartitions` that resets its accumulator
    * at shard boundaries. A partition may hold several shards (hash
    * co-location), never a split shard. */
  def packSequences(docs: DataFrame, nShards: Int = 8,
      budget: Long = 512L): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"),
      expr("cast(conv(substring(md5(concat('sh', cast(doc_id as string)))," +
        s" 1, 8), 16, 10) as bigint) % $nShards").as("shard"),
      expr("size(filter(split(text, '\\\\s+'), t -> t != ''))")
        .cast("long").as("tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var started = false
        var pack = 0L
        var acc = 0L
        it.map { case (docId, shard, tk) =>
          if (!started || shard != curShard) {
            started = true; curShard = shard; pack = 0L; acc = tk
          } else if (acc > 0 && acc + tk > budget) { pack += 1; acc = tk }
          else acc += tk
          (shard, docId, tk, pack)
        }
      }
      .toDF("shard", "doc_id", "tokens", "pack_id")
      .orderBy(col("shard"), col("doc_id"))
  }

  /** Deterministic PII-bearing corpus: the synthetic documents carry no
    * emails or card numbers, so the scrub operator plants them —
    * deterministically from doc_id, identically in the oracle. */
  /** Content-hash train/val/test assignment shared by corpus_split,
    * its stratification report, and the leakage audit: bucket =
    * first-8-hex of md5(text) mod 100, 90/5/5. */
  /** The curation pipeline's stages, shared by corpus_curate (shard
    * rollup), corpus_funnel (per-stage counts) and corpus_release (the
    * composed release card): input (docs >= 20, the rest are the
    * benchmark set), quality (>= 20 tokens), exact (md5 first-doc
    * dedup), surv (near-dup cluster representatives only), clean
    * (decontaminated at >= 80 shared 8-gram shingles vs the
    * benchmark). Each frame carries (doc_id, text, n_toks). */
  /** The curation pipeline's SETS, defined once: input rows (with
    * n_toks), the first-doc-per-content-hash ids, the dropped near-dup
    * cluster members, and the decontaminated ids (>= 80 shared 8-gram
    * shingles vs the benchmark). Both faces below join the same sets,
    * so the stage semantics cannot drift between the consumers. */
  private def curationSets(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val docs = documents(s, d).withColumn("n_toks",
      expr("size(filter(split(text, '\\\\s+'), t -> t != ''))")
        .cast("long"))
    val input = docs.filter(col("doc_id") >= 20)
    val firsts = input.filter(col("n_toks") >= 20)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val dropped = clusters(s, d)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    val sets = Dedup.shingleSets(documents(s, d))
    def shingles(df: DataFrame) =
      df.select(col("doc_id"), explode(col("set")).as("h"))
    val bench = shingles(sets.filter(col("doc_id") < 20))
      .withColumnRenamed("doc_id", "bench_id")
    // DROP threshold 80, not the >= 8 the pair-REPORT uses: the
    // report optimizes recall (flag anything worth a look); a drop
    // rule optimizes precision (see corpus_curate's Scaladoc)
    val contam = shingles(sets.filter(col("doc_id") >= 20))
      .join(broadcast(bench), Seq("h"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 80)
      .select(col("doc_id")).distinct()
    (input, firsts, dropped, contam)
  }

  /** Anti-join face (corpus_curate / corpus_release): the nested stage
    * frames, each a semi/anti join against the shared sets — the
    * original shape, which measured FASTER than a left-join+flag
    * formulation for single-stage consumers (anti joins shrink rows at
    * each step instead of carrying null-extended flags through). */
  private def curationStages(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (input, firsts, dropped, contam) = curationSets(s, d)
    val quality = input.filter(col("n_toks") >= 20)
    val exact = quality.join(firsts, Seq("doc_id"))
    val surv = exact.join(dropped, Seq("doc_id"), "left_anti")
    val clean = surv.join(contam, Seq("doc_id"), "left_anti")
    (input, quality, exact, surv, clean)
  }

  /** Flag face (corpus_funnel, round 13): ONE frame with per-stage
    * boolean flags via left joins + null tests against the SAME sets —
    * identical row logic (the sets are doc_id-unique, so a left join
    * cannot duplicate), but all five funnel counts come from one
    * conditional aggregate over one pass instead of five nested count
    * chains (guide §2.3). */
  private def curationFlags(s: SparkSession, d: String): DataFrame = {
    val (input, firsts, dropped, contam) = curationSets(s, d)
    input
      .join(firsts.withColumn("_first", lit(true)), Seq("doc_id"), "left")
      .join(dropped.withColumn("_dropped", lit(true)), Seq("doc_id"), "left")
      .join(contam.withColumn("_contam", lit(true)), Seq("doc_id"), "left")
      .withColumn("st_quality", col("n_toks") >= 20)
      .withColumn("st_exact",
        col("st_quality") && col("_first").isNotNull)
      .withColumn("st_surv", col("st_exact") && col("_dropped").isNull)
      .withColumn("st_clean", col("st_surv") && col("_contam").isNull)
      .drop("_first", "_dropped", "_contam")
  }

  private def splitAssign(docs: DataFrame): DataFrame =
    docs
      .withColumn("bucket", expr(
        "cast(conv(substring(md5(text), 1, 8), 16, 10) as bigint) % 100"))
      .withColumn("split", expr("CASE WHEN bucket < 90 THEN 'train'" +
        " WHEN bucket < 95 THEN 'val' ELSE 'test' END"))

  private def piiCorpus(s: SparkSession, d: String): DataFrame =
    documents(s, d).withColumn("aug", concat(col("text"),
      when(col("doc_id") % 4 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com")))
        .when(col("doc_id") % 4 === 1, lit(" card 4111111111111111"))
        .otherwise(lit(""))))

  /** Per-vector exact squared distance to the vector's own label
    * centroid, in integer micro-units: (vec_id, label, d2). Quantize
    * once (round(1e6·v)), centroid = floor-div mean per (label, dim),
    * d2 = Σ(q−cq)² — every step exact integers, so partial-agg order
    * cannot perturb a bit and the DuckDB oracles reproduce the same
    * values. Shared by emb_class_reps (nearest) and emb_label_outliers
    * (farthest vs median). */
  private def labelCentroidDist(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("dim"),
        expr("cast(round(1000000 * cast(v as double)) as bigint)").as("q"))
    val cent = e.groupBy(col("label"), col("dim"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("cnt"))
      .select(col("label"), col("dim"),
        expr("(sq + 1000000000L * cnt) div cnt - 1000000000L").as("cq"))
    e.join(cent, Seq("label", "dim"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("d2"))
  }

  override def queries: Map[String, Q] = Map(
    // Near-dup clustering: exact near-dup pairs (MinHash-LSH verified)
    // → connected components → (doc, cluster) with cluster = min doc
    // id in the component. The dedup decision a pipeline actually
    // ships: keep one survivor per cluster, not per pair.
    "dedup_cluster" -> ((s, d) =>
      clusters(s, d).orderBy(col("doc_id"))),

    // Deterministic Bernoulli sampling by content hash: keep ~5% of
    // docs where md5("b"+doc_id) % 20 == 0. No shuffle — the filter
    // pushes to the scan and the sample is reproducible anywhere.
    "sample_hash" -> ((s, d) => {
      documents(s, d)
        .filter(expr(
          "cast(conv(substring(md5(concat('b', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 20 = 0"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic train/val/test split assignment, the leakage-safe
    // form: the bucket hashes the CONTENT, not the id or position, so
    // byte-identical duplicates can never straddle splits (the classic
    // eval-contamination bug when splitting by row order), a document
    // re-ingested under a new id lands in its original split, and the
    // assignment reproduces anywhere with zero state. 90/5/5 over a
    // 0-99 content-hash bucket; one shuffle-free scan pass (the
    // trailing orderBy is the oracle-compare convention).
    "corpus_split" -> ((s, d) => {
      splitAssign(documents(s, d))
        .select(col("doc_id"), col("source"), col("bucket"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // Split DISTRIBUTION-PARITY audit — the release check after
    // corpus_split_report (composition) and corpus_split_leakage
    // (contamination): val/test must look like train on the quality
    // axes, or held-out loss measures the skew, not the model. Per
    // split: docs, Gopher pass rate (ppm), total/mean token mass, and
    // mean doc length in chars — all integer-exact, all from ONE join
    // of the split assignment with the per-doc rule battery. A pass
    // rate or length mean that diverges across splits says the hash
    // is fine but the corpus is stratified in a way 90/5/5 sampling
    // exposes. Scale: two per-doc scans joined on doc_id, a 3-row
    // rollup.
    "corpus_split_balance" -> ((s, d) => {
      val split = splitAssign(documents(s, d))
        .select(col("doc_id"), col("split"))
      val flags = graft.operators.TextAnalysis
        .queries("text_gopher_rules")(s, d)
        .select(col("doc_id"), col("n_tokens"), col("pass"))
      val chars = documents(s, d)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
      split.join(flags, Seq("doc_id")).join(chars, Seq("doc_id"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("pass")).as("n_pass"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"))
        .withColumn("pass_ppm", expr("n_pass * 1000000L div n_docs"))
        .withColumn("mean_tokens_milli",
          expr("total_tokens * 1000L div n_docs"))
        .withColumn("mean_chars_milli",
          expr("total_chars * 1000L div n_docs"))
        .orderBy(col("split"))
    }),

    // Cross-split leakage audit: near-dup pairs whose members landed
    // in DIFFERENT splits. A content-hash split keeps byte-identical
    // duplicates together by construction, but a NEAR-dup at J>=0.8
    // hashes differently and can straddle train/test — the silent
    // eval-inflation the published decontamination pipelines all
    // screen for, here applied to the corpus's own split. Composes two
    // verified kernels: sub-quadratic LSH pair generation with exact
    // verify (Dedup.minhashPairs) and the split assignment; the pair
    // set is tiny, so it broadcasts through both label joins and the
    // corpus-size split side never shuffles.
    "corpus_split_leakage" -> ((s, d) => {
      val split = splitAssign(documents(s, d))
        .select(col("doc_id"), col("split"))
      broadcast(Dedup.minhashPairs(documents(s, d)))
        .join(split.select(col("doc_id").as("a_id"),
          col("split").as("a_split")), Seq("a_id"))
        .join(split.select(col("doc_id").as("b_id"),
          col("split").as("b_split")), Seq("b_id"))
        .filter(col("a_split") =!= col("b_split"))
        .select(col("a_id"), col("b_id"), col("a_split"), col("b_split"),
          col("inter"), col("union_n"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // The FIX for what the leakage audit finds: cluster-aware split
    // assignment. Every document inherits the content-hash bucket of
    // its near-dup cluster REPRESENTATIVE (the component's min doc_id;
    // singletons represent themselves), so an entire near-dup clique
    // lands in one split and cross-split leakage at the dedup
    // threshold is zero BY CONSTRUCTION (PipelineSpec asserts it) —
    // the split-by-cluster discipline published decontamination
    // pipelines converge on. Costs: the cluster map is output-sized
    // (clustered docs only, a small fraction of any sane corpus) so
    // both label joins broadcast; the corpus-size side never shuffles.
    "corpus_split_safe" -> ((s, d) => {
      val h = splitAssign(documents(s, d))
        .select(col("doc_id"), col("bucket").as("own_bucket"))
      val cl = clusters(s, d) // (doc_id, cluster_id), output-sized
      val repBucket = h
        .join(broadcast(cl.select(col("cluster_id")).distinct()),
          col("doc_id") === col("cluster_id"))
        .select(col("cluster_id").as("rep_cl"),
          col("own_bucket").as("rep_bucket"))
      h.join(broadcast(cl), Seq("doc_id"), "left")
        .join(broadcast(repBucket), col("cluster_id") === col("rep_cl"),
          "left")
        .withColumn("rep_id", coalesce(col("cluster_id"), col("doc_id")))
        .withColumn("bucket", coalesce(col("rep_bucket"), col("own_bucket")))
        .withColumn("split", expr("CASE WHEN bucket < 90 THEN 'train'" +
          " WHEN bucket < 95 THEN 'val' ELSE 'test' END"))
        .select(col("doc_id"), col("rep_id"), col("bucket"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // Stratification audit over the split: per-(source, split) doc
    // counts and integer ppm shares of each source — the pre-flight
    // report that catches a source whose val/test slice came out empty
    // or skewed BEFORE a training run bakes the split in. Map-side
    // combinable aggregate + one small window over (source, split)
    // rows.
    "corpus_split_report" -> ((s, d) => {
      splitAssign(documents(s, d))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("share_ppm", expr("n_docs * 1000000L div " +
          "sum(n_docs) OVER (PARTITION BY source)").cast("long"))
        .select(col("source"), col("split"), col("n_docs"),
          col("share_ppm"))
        .orderBy(col("source"), col("split"))
    }),

    // Exact stratified 10% sample per lang: rank docs within each
    // stratum by a deterministic hash order, keep rn*10 <= stratum
    // size (floor(n/10) rows per stratum, bias-free and reproducible).
    "sample_stratified" -> ((s, d) => {
      val byLang = Window.partitionBy(col("lang"))
      val w = byLang.orderBy(
        md5(concat(lit("s"), col("doc_id").cast("string"))), col("doc_id"))
      documents(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("c", count(lit(1)).over(byLang))
        .filter(col("rn") * 10 <= col("c"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // BPE-style regex tokenization (letters | digits | single
    // punctuation), corpus-wide top-20 vocabulary with deterministic
    // tie-breaks — the vocabulary-building scan of a tokenizer
    // training job.
    "text_bpe_tokens" -> ((s, d) => {
      documents(s, d)
        .select(explode(expr(
          s"regexp_extract_all(text, '$bpePat', 0)")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(20)
    }),

    // Tokenizer fertility audit per language — the number a
    // multilingual training run checks BEFORE committing to a
    // tokenizer: tokens-per-word (fertility) and chars-per-token by
    // language. A tokenizer with 2× fertility on one language halves
    // that language's effective context window and doubles its compute
    // per byte — the classic under-served-language failure mode.
    // Integer milli-units (both divisions over non-negative sums, so
    // cross-engine exact). One scan, per-row expressions, a
    // |langs|-row aggregate — scan-bound at any scale.
    "text_tokenizer_fertility" -> ((s, d) => {
      documents(s, d)
        .select(col("lang"),
          size(expr(s"regexp_extract_all(text, '$bpePat', 0)"))
            .cast("long").as("n_tok"),
          expr("size(filter(split(text, '\\\\s+'), t -> t != ''))")
            .cast("long").as("n_word"),
          length(col("text")).cast("long").as("n_char"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          sum(col("n_word")).as("n_words"), sum(col("n_char")).as("n_chars"))
        .withColumn("fertility_milli",
          expr("n_tokens * 1000L div n_words"))
        .withColumn("chars_per_tok_milli",
          expr("n_chars * 1000L div n_tokens"))
        .orderBy(col("lang"))
    }),

    // BPE merge learning (Sennrich et al. 2016), the first merge
    // round: corpus-weighted adjacent-character pair frequencies over
    // the tokenizer vocabulary — the argmax pair IS the first merge a
    // BPE trainer would add. Two bounded aggregations: the vocab table
    // (distinct regex tokens × corpus count, the text_bpe_tokens scan)
    // and a pair rollup over per-TYPE character bigrams weighted by
    // the type's count — pair counting runs over |vocab| rows, not
    // |corpus| tokens, which is the standard trainer trick and the
    // reason this survives 100 TB (vocab is sublinear in corpus). The
    // top-30 is a TakeOrderedAndProject, never a full sort.
    "text_bpe_learn" -> ((s, d) => {
      val vocab = documents(s, d)
        .select(explode(expr(
          s"regexp_extract_all(text, '$bpePat', 0)")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .filter(length(col("tok")) >= 2)
      vocab
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, length(tok) - 1)," +
            " i -> substring(tok, i, 2))")).as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_types"))
        .orderBy(col("n").desc, col("pair"))
        .limit(30)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("pair"))).cast("long"))
        .select(col("rank"), col("pair"), col("n"), col("n_types"))
        .orderBy(col("rank"))
    }),

    // PII scrub: count + redact emails and card-like digit runs.
    // Counting happens before scrubbing; the scrubbed length proves
    // the rewrite actually applied.
    "text_pii_scrub" -> ((s, d) => {
      piiCorpus(s, d)
        .withColumn("n_email",
          size(expr(s"regexp_extract_all(aug, '$emailPat', 0)")))
        .withColumn("n_card",
          size(expr(s"regexp_extract_all(aug, '$cardPat', 0)")))
        .withColumn("scrubbed",
          regexp_replace(regexp_replace(col("aug"), emailPat, "<EMAIL>"),
            cardPat, "<CARD>"))
        .select(col("doc_id"), col("n_email"), col("n_card"),
          length(col("scrubbed")).as("scrubbed_len"))
        .orderBy(col("doc_id"))
    }),

    // PII exposure report: the per-source rollup of the scrub pass —
    // what a privacy review actually reads (which slices leak, how
    // much, what fraction is clean), where text_pii_scrub is the
    // per-document action. Same single-scan regex counting, one
    // |sources|-row aggregate.
    "text_pii_report" -> ((s, d) => {
      piiCorpus(s, d)
        .withColumn("n_email",
          size(expr(s"regexp_extract_all(aug, '$emailPat', 0)")).cast("long"))
        .withColumn("n_card",
          size(expr(s"regexp_extract_all(aug, '$cardPat', 0)")).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("n_email") > 0).cast("long")).as("docs_with_email"),
          sum(col("n_email")).as("n_emails"),
          sum((col("n_card") > 0).cast("long")).as("docs_with_card"),
          sum(col("n_card")).as("n_cards"),
          sum((col("n_email") === 0 && col("n_card") === 0).cast("long"))
            .as("clean_docs"))
        .withColumn("clean_ppm",
          expr("clean_docs * 1000000L div n_docs"))
        .orderBy(col("source"))
    }),

    // Duplicate-clique size histogram: how big the near-dup clusters
    // actually are — the report that distinguishes "pairwise dups"
    // (size-2 cliques, cheap survivors) from "boilerplate galaxies"
    // (giant cliques that dominate removal and deserve a template
    // rule instead). Rides the memoized CC fixpoint; two
    // cluster-count-sized aggregates after it.
    "dedup_cluster_hist" -> ((s, d) => {
      clusters(s, d)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("cluster_size"))
    }),

    // Benchmark decontamination: corpus documents sharing >= 8 distinct
    // character 8-grams with any "benchmark" document (here: doc_id <
    // 20 stands in for the eval set). The benchmark side is tiny by
    // definition, so its exploded shingles broadcast and the corpus
    // side streams — one scan, no corpus shuffle: the shape that holds
    // when the corpus is 100 TB and the benchmark is a few MB.
    "text_decontaminate" -> ((s, d) => {
      val sets = Dedup.shingleSets(documents(s, d))
      def shingles(df: DataFrame) =
        df.select(col("doc_id"), explode(col("set")).as("h"))
      val bench = shingles(sets.filter(col("doc_id") < 20))
        .withColumnRenamed("doc_id", "bench_id")
      shingles(sets.filter(col("doc_id") >= 20))
        .join(broadcast(bench), Seq("h"))
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 8)
        .orderBy(col("doc_id"), col("bench_id"))
    }),

    // The same decontamination THROUGH a Bloom runtime filter: the
    // benchmark shingle set aggregates into one ~128 KB
    // self-describing bloom_agg binary, which rides along as a scalar
    // and kills non-benchmark shingles inside the corpus scan — before
    // the join the exact plan would pay for every shingle. A Bloom
    // probe has no false negatives, so prefilter + the SAME exact join
    // is bit-identical to text_decontaminate (shared oracle proves it);
    // false positives only cost a little extra join input. At 100 TB
    // corpus / few-MB benchmark this is THE semi-join shape: the filter
    // is orders of magnitude smaller than even the broadcast hash
    // relation, and the dropped rows never leave the scan stage.
    "text_bloom_decon" -> ((s, d) => {
      import graft.expressions.Bloom.{bloom_agg, bloom_might_contain}
      val sets = Dedup.shingleSets(documents(s, d))
      def shingles(df: DataFrame) =
        df.select(col("doc_id"), explode(col("set")).as("h"))
      val bench = shingles(sets.filter(col("doc_id") < 20))
        .withColumnRenamed("doc_id", "bench_id")
      // 2^20 bits / 7 probes: ~0.1% FP at ~100k distinct benchmark
      // shingles — sized for the benchmark side, independent of corpus.
      // LEFT SEMI with the probe as the join condition, NOT
      // crossJoin+filter: a semi join emits only stream-side columns,
      // so the ~128 KB filter binary is read inside the condition but
      // never copied into an output row. The crossJoin form joined the
      // binary onto every corpus shingle before a project dropped it —
      // measured 30 s of pure row-materialization memcpy at sf0.1
      // (~1.5M rows × 128 KB) against 0.7 s for this shape.
      val bloom = bench.agg(bloom_agg(col("h"), 1 << 20, 7).as("bf"))
      shingles(sets.filter(col("doc_id") >= 20))
        .join(broadcast(bloom),
          bloom_might_contain(col("bf"), col("h")), "leftsemi")
        .join(broadcast(bench), Seq("h"))
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 8)
        .orderBy(col("doc_id"), col("bench_id"))
    }),

    // PageRank over the near-dup similarity graph (5 iterations,
    // d=0.85): the second genuinely iterative distributed algorithm
    // here beyond connected components — each iteration is one
    // edge-join plus one aggregate, the textbook Pregel-on-DataFrames
    // shape that scales with edges per shuffle. ALL arithmetic runs in
    // integer micro-units (pr scaled by 1e8; contributions and the
    // damping mix use floor division), so partial-aggregation order
    // cannot perturb a single bit and the unrolled DuckDB oracle
    // reproduces the exact integers — the same determinism discipline
    // Num applies to float sums, extended to an iterative fixpoint.
    "graph_pagerank" -> ((s, d) => {
      val p = Dedup.minhashPairs(documents(s, d))
        .select(col("a_id"), col("b_id"))
      // Eager per-round checkpoints, like the CC loop: each iteration
      // references pr_{i-1} twice, so an unmaterialized lineage doubles
      // per round (the 5-round plan carried 32 copies of the whole LSH
      // pipeline — 10 MB task binaries before this). On a cluster the
      // same shape checkpoints to HDFS/S3. PlanAuditSpec exempts this
      // query from the zero-jobs-at-construction audit for exactly the
      // reason it exempts dedup_cluster.
      val edges = p.select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(p.select(col("b_id").as("src"), col("a_id").as("dst")))
        .localCheckpoint()
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      // node count as a driver-side long (a distributed count returning
      // 8 bytes — scale-safe), NOT a count over an empty global window,
      // which would funnel every node row through one partition to
      // stamp it; the loop is already eager, so the extra job is free
      val nNodes = deg.count()
      var pr = deg.select(col("src").as("node"), col("deg"))
        .withColumn("n", lit(nNodes))
        .withColumn("pr", expr("100000000L div n"))
        .localCheckpoint()
      for (_ <- 1 to 5) {
        val sums = pr.join(edges, pr("node") === edges("src"))
          .select(col("dst").as("node"),
            expr("pr div deg").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
        pr = pr.drop("pr").join(sums, Seq("node"))
          .withColumn("pr", expr(
            "((15L * 100000000L) div n) div 100L" +
              " + (85L * in_sum) div 100L"))
          .drop("in_sum")
          .localCheckpoint()
      }
      pr.select(col("node").as("doc_id"), col("pr"))
        .orderBy(col("doc_id"))
    }),

    // Containment-ratio decontamination: flag corpus documents covering
    // >= 25% of any benchmark document's distinct shingle set —
    // containment (|C∩B| / |B|) is the asymmetric metric eval
    // decontamination actually uses (a long corpus doc can fully
    // contain a short benchmark item while their symmetric Jaccard
    // stays tiny, which is exactly the case the shared-count variant
    // text_decontaminate under-weights). Same broadcast shape: the
    // benchmark side is tiny by definition, the corpus streams once.
    "text_containment" -> ((s, d) => {
      val sets = Dedup.shingleSets(documents(s, d))
      val bench = sets.filter(col("doc_id") < 20)
        .select(col("doc_id").as("bench_id"), col("set"),
          col("n").as("bench_n"))
      val bsh = bench.select(col("bench_id"), col("bench_n"),
        explode(col("set")).as("h"))
      sets.filter(col("doc_id") >= 20)
        .select(col("doc_id"), explode(col("set")).as("h"))
        .join(broadcast(bsh), Seq("h"))
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("inter"), first(col("bench_n")).as("bench_n"))
        .filter(col("inter") * 4 >= col("bench_n"))
        .select(col("doc_id"), col("bench_id"), col("inter"), col("bench_n"),
          (col("inter").cast("double") / col("bench_n")).as("containment"))
        .orderBy(col("doc_id"), col("bench_id"))
    }),

    // Deterministic shard planning: content-hash shard assignment plus
    // per-shard row/byte accounting — the "write training shards"
    // planning aggregate. Pure map + one aggregate over 32 shard keys;
    // the downstream writer is partitionBy(shard) with the same
    // expression, so assignment is reproducible across engines & runs.
    "shard_assign" -> ((s, d) => {
      documents(s, d)
        .withColumn("shard", expr(
          "cast(conv(substring(md5(concat('sh', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 32"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .orderBy(col("shard"))
    }),

    // Sequence packing (see packSequences). The declared query pins
    // nShards=8 / budget=512 — the oracle's recursive CTE walks the
    // same constants.
    "pack_sequences" -> ((s, d) => packSequences(documents(s, d))),

    // Packing-efficiency report over the same greedy pack: per shard,
    // bins used, token mass, utilization ppm against the 512 budget,
    // and the ceil(total/512) lower bound — the number a packing
    // change is judged against (bins close to lb_bins = little to
    // gain from a smarter packer; util far under 1e6 = fragmentation).
    // An oversized (> budget) doc sits alone in one overflowing bin,
    // so util_ppm CAN exceed 1e6 and n_bins can undercut lb_bins —
    // both readings flag sequences that need splitting before
    // packing, which is exactly what the report is for. One aggregate
    // over the pack assignment; sum_tokens·1e6 reaches ~1e19 per
    // shard at warehouse scale, so the ratio runs in decimal(38,0).
    "pack_efficiency" -> ((s, d) => {
      packSequences(documents(s, d))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          (max(col("pack_id")) + 1).as("n_bins"),
          sum(col("tokens")).as("sum_tokens"))
        .withColumn("util_ppm", expr(
          "cast(sum_tokens as decimal(38,0)) * 1000000 div (n_bins * 512)"))
        .withColumn("lb_bins", expr("(sum_tokens + 511L) div 512L"))
        .select(col("shard"), col("n_docs"), col("n_bins"),
          col("sum_tokens"), col("util_ppm"), col("lb_bins"))
        .orderBy(col("shard"))
    }),

    // Survivor selection: drop every near-dup cluster member except
    // the min-id representative — the decision a dedup pipeline
    // actually ships. Anti-join of the corpus against the non-survivor
    // set (tiny relative to the corpus), so the corpus streams.
    "dedup_survivors" -> ((s, d) => {
      documents(s, d)
        .join(clusters(s, d).filter(col("doc_id") =!= col("cluster_id")),
          Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Survivor selection by QUALITY, not id: per near-dup cluster,
    // keep the member with the most tokens (ties to the smaller id).
    // min-id survivorship (dedup_survivors) is reproducible but blind
    // — it can keep a truncated copy and drop the full one;
    // production pipelines pick by length/quality. The packed
    // (n_toks·2³² − doc_id) ordinal makes both engines maximize the
    // same scalar (neither defines max_by/arg_max tie order); one
    // map-side-combinable aggregate over the memoized cluster table.
    "dedup_survivors_quality" -> ((s, d) => {
      val nt = documents(s, d).withColumn("n_toks",
        expr("size(filter(split(text, '\\\\s+'), t -> t != ''))")
          .cast("long"))
      clusters(s, d).join(nt, Seq("doc_id"))
        .withColumn("pk",
          col("n_toks") * lit(4294967296L) - col("doc_id"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          expr("max_by(doc_id, pk)").as("survivor_id"),
          expr("max_by(n_toks, pk)").as("survivor_toks"))
        .filter(col("n_members") >= 2)
        .orderBy(col("cluster_id"))
    }),

    // THE end-to-end curation pass as ONE declared query — what a user
    // actually runs nightly: eval-exclusion → quality gate (>= 20
    // tokens) → exact dedup (first doc per content hash) → near-dup
    // survivor selection (corpus-wide clusters, memoized) → benchmark
    // decontamination (>= 8 shared shingles) → per-shard accounting of
    // what ships to training. Every stage is the already-oracle-proven
    // operator, composed; the stages that matter at 100 TB keep their
    // individual shapes (content-hash dedup = one fixed-16-byte-key
    // shuffle; survivors/contamination arrive as anti-joins against
    // SMALL id sets — non-survivors and contaminated docs are tiny
    // relative to the corpus; shard rollup groups 32 keys).
    "corpus_curate" -> ((s, d) => {
      // stages shared with corpus_funnel / corpus_release
      // (curationStages); the drop-threshold rationale lives there
      val (_, _, _, _, clean) = curationStages(s, d)
      clean
        .withColumn("shard", expr(
          "cast(conv(substring(md5(concat('sh', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 32"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("total_tokens"))
        .orderBy(col("shard"))
    }),

    // The curation pass as a RETENTION FUNNEL: how many documents
    // survive each stage of corpus_curate — the observability report
    // a data team reads before any training run ships ("where did my
    // corpus go?"). Five one-row aggregates over the SAME stage
    // definitions (shingle sets cached, cluster fixpoint memoized —
    // the stages are not recomputed five times from scratch), unioned
    // into a 5-row funnel. If corpus_curate's stage semantics change,
    // change them here too.
    "corpus_funnel" -> ((s, d) => {
      // Round 13: one conditional aggregate over the shared flags
      // frame (curationFlags) instead of five unioned per-stage count
      // chains — the stage chains nested (clean ⊃ surv ⊃ exact ⊃
      // quality ⊃ input), so the old plan re-ran the join pipeline
      // once per stage. Counts are identical by construction: each
      // stage's row set IS its flag conjunction. Stage semantics live
      // in curationFlags, still shared with corpus_curate /
      // corpus_release.
      curationFlags(s, d).agg(
        count(lit(1)).as("c1"),
        count(when(col("st_quality"), lit(1))).as("c2"),
        count(when(col("st_exact"), lit(1))).as("c3"),
        count(when(col("st_surv"), lit(1))).as("c4"),
        count(when(col("st_clean"), lit(1))).as("c5"))
        .selectExpr("stack(5, '1_input', c1, '2_quality', c2, " +
          "'3_exact_dedup', c3, '4_neardup_survivors', c4, " +
          "'5_decontaminated', c5) as (stage, n_docs)")
        .orderBy(col("stage"))
    }),

    // The composed RELEASE gate — the one query a data team runs
    // before a corpus ships: curation (corpus_curate's clean set) →
    // cluster-safe split assignment (corpus_split_safe's rep-bucket
    // inheritance) → cross-split near-dup leakage over the RELEASED
    // docs → the per-split dataset card (docs, token mass, mean
    // length, source diversity, leak count, the release-ok bit).
    // With the safe assignment, leakage is zero BY CONSTRUCTION for
    // pairs whose members both survive curation — the card proves it
    // instead of assuming it (leak_pairs is computed, not hardcoded).
    // Scale: every stage is a composition of already-probed kernels
    // (curation stages, the output-sized cluster map, the banded pair
    // kernel); the card rollup is a 3-row aggregate.
    "corpus_release" -> ((s, d) => {
      val (_, _, _, _, clean) = curationStages(s, d)
      val safe = queries("corpus_split_safe")(s, d)
        .select(col("doc_id"), col("split"))
      // three consumers (two leak-label joins + the card rollup) —
      // materialize the narrow released table once (distributed
      // localCheckpoint, the text_winnow_pairs discipline) instead of
      // re-running the whole curation chain per consumer
      val rel = clean.select(col("doc_id"), col("n_toks"))
        .join(safe, Seq("doc_id"))
        .join(documents(s, d).select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .localCheckpoint()
      val leakPairs = broadcast(Dedup.minhashPairs(documents(s, d)))
        .join(rel.select(col("doc_id").as("a_id"),
          col("split").as("a_split")), Seq("a_id"))
        .join(rel.select(col("doc_id").as("b_id"),
          col("split").as("b_split")), Seq("b_id"))
        .filter(col("a_split") =!= col("b_split"))
      val leaks = leakPairs.select(col("a_split").as("split"))
        .unionByName(leakPairs.select(col("b_split").as("split")))
        .groupBy(col("split")).agg(count(lit(1)).as("leak_pairs"))
      rel.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("total_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .withColumn("mean_tokens_milli",
          expr("cast(total_tokens * 1000 div n_docs as bigint)"))
        .join(leaks, Seq("split"), "left")
        .select(col("split"), col("n_docs"),
          col("total_tokens").cast("long").as("total_tokens"),
          col("mean_tokens_milli"),
          col("n_sources").cast("long").as("n_sources"),
          coalesce(col("leak_pairs"), lit(0L)).as("leak_pairs"),
          (coalesce(col("leak_pairs"), lit(0L)) === 0).as("release_ok"))
        .orderBy(col("split"))
    }),

    // Corpus-mix accounting: per (source, lang) document/char counts
    // and corpus share — the data-mixture report every training run
    // starts from. One aggregate; the share divides by a windowed
    // grand total over the (tiny) aggregated rows, not the corpus.
    "corpus_mix" -> ((s, d) => {
      val agg = documents(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
      agg.withColumn("doc_share", col("n_docs").cast("double") /
          sum(col("n_docs")).over(Window.partitionBy()))
        .orderBy(col("source"), col("lang"))
    }),

    // Label-conditioned per-dimension embedding stats — the
    // class-separation health check for labeled vector data (same
    // shape as emb_dim_stats with the label key carried through).
    "emb_label_stats" -> ((s, d) => {
      embeddings(s, d)
        .select(col("label"), posexplode(col("embedding"))
          .as(Seq("pos", "val")))
        .select(col("label"), (col("pos") + 1).as("dim"),
          col("val").cast("double").as("v"))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"), davg(col("v")).as("mean"),
          min(col("v")).as("vmin"), max(col("v")).as("vmax"))
        .orderBy(col("label"), col("dim"))
    }),

    // Embedding-drift monitor: per label, the squared L2 distance
    // between the class centroid of the REFERENCE batch and the NEW
    // batch (halves by vec_id parity as the deterministic stand-in for
    // two ingest batches) — the alarm that fires when an upstream
    // encoder or data mix shifts. Same integer micro-unit discipline
    // as emb_class_reps (quantize once, floor-div centroid, exact
    // integer squared error), so partial-agg order cannot perturb a
    // bit. Shape at scale: one explode + a (label, half, dim)
    // aggregate — high cardinality, no skew; the centroid join is
    // |labels|·|dims| rows, broadcast-sized output regardless of
    // corpus size.
    "emb_centroid_drift" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("label"), (col("vec_id") % 2).as("half"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("label"), col("half"), (col("pos") + 1).as("dim"),
          expr("cast(round(1000000 * cast(v as double)) as bigint)")
            .as("q"))
      val cent = e.groupBy(col("label"), col("half"), col("dim"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("cnt"))
        .select(col("label"), col("half"), col("dim"),
          expr("(sq + 1000000000L * cnt) div cnt - 1000000000L").as("cq"))
      val drift = cent.filter(col("half") === 0)
        .select(col("label"), col("dim"), col("cq").as("cq_ref"))
        .join(cent.filter(col("half") === 1)
          .select(col("label"), col("dim"), col("cq").as("cq_new")),
          Seq("label", "dim"))
        .groupBy(col("label"))
        .agg(sum((col("cq_ref") - col("cq_new")) *
          (col("cq_ref") - col("cq_new"))).as("drift2"))
      val n = embeddings(s, d).groupBy(col("label"))
        .agg(sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L))
          .as("n_ref"),
          sum(when(col("vec_id") % 2 === 1, 1L).otherwise(0L))
            .as("n_new"))
      drift.join(n, Seq("label"))
        .select(col("label"), col("n_ref"), col("n_new"), col("drift2"))
        .orderBy(col("label"))
    }),

    // Per-class representative selection (herding-style coreset pick):
    // the 5 vectors nearest their label's centroid — the curation op
    // that picks canonical exemplars per class for few-shot prompts,
    // label auditing, or coreset seeds. All arithmetic in integer
    // micro-units (the emb_kmeans_step discipline): quantize once,
    // centroid = floor-div mean, distance = exact integer squared
    // error — so partial-agg order cannot perturb a bit and the oracle
    // reproduces the exact integers. Shape at scale: explode is linear,
    // both aggregates key on (label, dim) / (vec, label) — high
    // cardinality, no skew — and the final top-5 window runs per label
    // over |vectors| rows, the same rank-per-group shape as
    // sample_stratified.
    "emb_class_reps" -> ((s, d) =>
      labelCentroidDist(s, d)
        .withColumn("rk", row_number().over(Window.partitionBy(col("label"))
          .orderBy(col("d2"), col("vec_id"))).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("label"), col("rk"), col("vec_id"), col("d2"))
        .orderBy(col("label"), col("rk"))),

    // The inverse read of the same distances: label-outlier audit —
    // per label, the 5 vectors FARTHEST from their own centroid, with
    // their distance as a ratio to the label's median (the
    // confident-learning-style review queue for mislabel/contamination
    // suspects; rank-based rather than a fixed ratio cut so the queue
    // is never empty regardless of how concentrated the embedding
    // distribution is — a threshold audit is one extra filter on the
    // ratio column). The median is rank-selected (value at ceil(n/2)
    // under (d2, vec_id) order): an exact integer both engines agree
    // on, no float percentile interpolation. Same two aggregates as
    // emb_class_reps plus two per-label windows over |vectors| rows.
    "emb_label_outliers" -> ((s, d) => {
      val w = Window.partitionBy(col("label"))
      val ranked = labelCentroidDist(s, d)
        .withColumn("rn",
          row_number().over(w.orderBy(col("d2"), col("vec_id"))))
        .withColumn("cnt", count(lit(1)).over(w))
      val med = ranked
        .filter(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("label"), col("d2").as("med_d2"))
      ranked
        .withColumn("rk", row_number().over(
          w.orderBy(col("d2").desc, col("vec_id"))).cast("long"))
        .filter(col("rk") <= 5)
        .join(med, Seq("label"))
        .select(col("label"), col("rk"), col("vec_id"), col("d2"),
          col("med_d2"),
          (col("d2").cast("double") / col("med_d2")).as("ratio"))
        .orderBy(col("label"), col("rk"))
    }),

    // Int8 symmetric per-vector quantization audit — the storage/
    // serving transform for embeddings at scale (4x smaller than
    // float32, distance-preserving to ~scale/2 per dim). Pure per-row
    // map, no shuffle: scale = max|v|/127, q_i = round(v_i/scale); the
    // query reports the exact integer checksum of the codes (proves
    // the codes themselves match across engines, not just summaries),
    // the max reconstruction error, and a sequential-fold MSE — every
    // arithmetic step is a single IEEE double op or an integer, so the
    // DuckDB oracle reproduces it bit-for-bit.
    "emb_quantize" -> ((s, d) =>
      quantizeInt8(embeddings(s, d)).orderBy(col("vec_id"))),

    // Per-dimension embedding statistics: one narrow explode + one
    // aggregate, the standard health check before indexing/training.
    // Mean goes through the shared decimal quantization so partial
    // aggregation order can't change the answer.
    "emb_dim_stats" -> ((s, d) => {
      embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("pos", "val")))
        .select((col("pos") + 1).as("dim"), col("val").cast("double").as("v"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), davg(col("v")).as("mean"),
          min(col("v")).as("vmin"), max(col("v")).as("vmax"))
        .orderBy(col("dim"))
    }),

    // Per-source near-dup accounting: how much of each source the
    // near-dup dedup pass would drop — the report that decides which
    // acquisition pipelines are feeding the corpus duplicates. Joins
    // the (memoized) cluster assignment's non-survivor set against the
    // corpus; the dropped set is tiny relative to the corpus, the
    // rollup groups on a handful of source keys. dup_ppm is integer
    // floor-div, exactly portable.
    "dedup_source_stats" -> ((s, d) => {
      val dropped = clusters(s, d)
        .filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id"), lit(1L).as("is_dup"))
      documents(s, d).join(dropped, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dropped"))
        .withColumn("dup_ppm", expr("n_dropped * 1000000L div n_docs"))
        .orderBy(col("source"))
    }),

    // Per-dimension whitening (standardization) audit: mean/std per
    // dimension from ONE corpus aggregate (quantized sums — partial
    // aggregation order can't change them), then each vector's
    // whitened values summarized as a quantized checksum + max |z|.
    // The per-dim stats table (64 rows) broadcasts BY CONSTRUCTION;
    // the corpus streams through the normalize map — at 100 TB this is
    // two linear scans and no corpus shuffle. Population variance via
    // E[x^2] - mean^2 on quantized sums, std = sqrt (the one portable
    // power); z-values are exact IEEE ops on deterministic inputs.
    "emb_whiten" -> ((s, d) => {
      val stats = embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("pos", "val")))
        .select((col("pos") + 1).as("dim"), col("val").cast("double").as("v"))
        .groupBy(col("dim"))
        .agg(davg(col("v")).as("mean"), davg(col("v") * col("v")).as("ex2"))
        .withColumn("std", sqrt(col("ex2") - col("mean") * col("mean")))
        .select(col("dim"), col("mean"), col("std"))
      embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding"))
          .as(Seq("pos", "val")))
        .select(col("vec_id"), (col("pos") + 1).as("dim"),
          col("val").cast("double").as("v"))
        .join(broadcast(stats), Seq("dim"))
        // a constant dimension (std 0) whitens to 0, not NaN
        .withColumn("z", when(col("std") === 0.0, lit(0.0))
          .otherwise((col("v") - col("mean")) / col("std")))
        .groupBy(col("vec_id"))
        .agg(sum(expr("cast(round(z * 1e6) as bigint)")).as("z_checksum"),
          max(abs(col("z"))).as("max_absz"))
        .orderBy(col("vec_id"))
    }),

    // Top principal component by power iteration (3 rounds from the
    // all-ones vector) — PCA for whitening/compression without ever
    // forming the 64x64 covariance as driver state. Every reduction
    // (per-row dot, per-dim accumulation, the norm) goes through the
    // shared decimal quantization, so partial-aggregation order can't
    // change a bit and the DuckDB oracle replays the IDENTICAL
    // arithmetic (same discipline as PageRank's integer micro-units;
    // the quantization is part of the operator's definition, not an
    // approximation of it). Per iteration: one broadcast join against
    // the 64-row direction vector, one shuffle on vec_id, one on dim —
    // the corpus is scanned, never collected; at 100 TB you persist
    // the centered table once and the loop stays scan-bound.
    "emb_pca_power" -> ((s, d) => {
      import graft.Num.{davg, dsum}
      val e = embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding"))
          .as(Seq("pos", "val")))
        .select(col("vec_id"), (col("pos") + 1).as("dim"),
          col("val").cast("double").as("v"))
      val m = e.groupBy(col("dim")).agg(davg(col("v")).as("mean"))
      val c = e.join(broadcast(m), Seq("dim"))
        .select(col("vec_id"), col("dim"), (col("v") - col("mean")).as("c"))
      var vk = m.select(col("dim"), lit(1.0).as("vv"))
      var nk: DataFrame = null
      for (_ <- 1 to 3) {
        val dk = c.join(broadcast(vk), Seq("dim"))
          .groupBy(col("vec_id")).agg(dsum(col("c") * col("vv")).as("dot"))
        val wk = c.join(dk, Seq("vec_id"))
          .groupBy(col("dim")).agg(dsum(col("dot") * col("c")).as("w"))
        nk = wk.agg(sqrt(dsum(col("w") * col("w"))).as("nrm"))
        vk = wk.crossJoin(broadcast(nk))
          .select(col("dim"), (col("w") / col("nrm")).as("vv"))
      }
      vk.crossJoin(broadcast(nk))
        .select(col("dim"),
          expr("cast(round(vv * 1000000) as bigint)").as("loading_ppm"),
          col("nrm").as("eigenvalue"))
        .orderBy(col("dim"))
    }),

    // Second principal component via deflation: run the same
    // 3-iteration power loop, subtract the PC1 projection from every
    // centered value (c' = c − ⟨x,v1⟩·v1 — one multiply and one
    // subtract per cell, IEEE-exact in both engines), and power-
    // iterate again on the deflated matrix. Same scale shape as
    // emb_pca_power: everything is (vec,dim)-keyed aggregates with
    // the 64-row eigenvector broadcast back each iteration; the
    // corpus-sized table is touched a constant number of times.
    "emb_pca2" -> ((s, d) => {
      import graft.Num.{davg, dsum}
      val e = embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding"))
          .as(Seq("pos", "val")))
        .select(col("vec_id"), (col("pos") + 1).as("dim"),
          col("val").cast("double").as("v"))
      val m = e.groupBy(col("dim")).agg(davg(col("v")).as("mean"))
      // Checkpoint discipline (exempted in PlanAuditSpec's zero-jobs
      // audit, same reason as the CC/PageRank loops):
      //  - the centered matrix c (and its deflation c2) is materialized
      //    ONCE — every subsequent power-iteration job reads the cached
      //    partitions instead of re-running explode+center per job
      //    (MEMORY_AND_DISK, so a 100 TB corpus spills rather than
      //    OOMs; an engine that can't afford the cache re-derives c
      //    per pass at 2× scan cost, same answer);
      //  - each iteration's 64-row eigenvector vk is checkpointed:
      //    without that barrier vk's lineage re-embeds the prior
      //    iteration several times over and the deflated second chain
      //    SQUARES the tree — Catalyst analysis goes exponential in
      //    iterations (measured: minutes at sf0.01).
      //  - round 14: the matrix is hash-partitioned on vec_id BEFORE
      //    the barrier (cache() — a lazy barrier, cleared per bench
      //    attempt, same honesty contract as q_theil_sen's monthly
      //    cache). The win is PARTIAL-AGGREGATION locality (guide
      //    §2.3): with every vec's 64 rows in one partition, each
      //    iteration's dot aggregate collapses to ONE partial row per
      //    vector before its exchange, instead of up to one partial
      //    per (vector, partition); and the power loop's start vector
      //    no longer needs a corpus-wide distinct (see dims below).
      //    Measured at sf0.1: 5.18 → 4.03 s, 53 → 46 jobs, 5.9 →
      //    2.3 MB shuffled. (Tried and rejected on the way: the same
      //    repartition in front of the previous localCheckpoint
      //    barrier — a checkpoint's LogicalRDD loses the partitioning
      //    under AQE and every iteration re-shuffled anyway, measured
      //    WORSE at 54 jobs / 7.7 MB.)
      def center(mat: DataFrame): DataFrame = mat.cache()
      val c = center(e.join(broadcast(m), Seq("dim"))
        .select(col("vec_id"), col("dim"), (col("v") - col("mean")).as("c"))
        .repartition(col("vec_id")))
      // The norm rides the SAME plan as the eigenvector via a global
      // window over the 64-row wk table (a second dsum aggregate +
      // crossJoin would re-run the corpus-sized wk computation per
      // checkpoint — measured ~40% of the query). Window quantization
      // is identical to dsum, so the value matches the oracle's
      // scalar-subquery nrm bit-for-bit.
      // dims: the 64-row dimension table for the all-ones start vector.
      // Derived from the means table m instead of a corpus-wide
      // distinct over mat: joins on dim preserve the dim set, so
      // m's dims == mat's dims for both power() calls — same rows,
      // minus one full scan of the checkpointed matrix per call.
      val dims = m.select(col("dim"))
      def power(mat: DataFrame): (DataFrame, DataFrame) = {
        import graft.Num.dsumExpr
        var vk = dims.select(col("dim"), lit(1.0).as("vv"))
        var nk: DataFrame = null
        for (_ <- 1 to 3) {
          val dk = mat.join(broadcast(vk), Seq("dim"))
            .groupBy(col("vec_id")).agg(dsum(col("c") * col("vv")).as("dot"))
          val wk = mat.join(dk, Seq("vec_id"))
            .groupBy(col("dim")).agg(dsum(col("dot") * col("c")).as("w"))
          val withNrm = wk.withColumn("nrm", sqrt(
            sum(dsumExpr(col("w") * col("w")))
              .over(Window.partitionBy()).cast("double") / 1e8))
            .select(col("dim"), (col("w") / col("nrm")).as("vv"),
              col("nrm"))
            .localCheckpoint()
          vk = withNrm.select(col("dim"), col("vv"))
          nk = withNrm.agg(max(col("nrm")).as("nrm"))
        }
        (vk, nk)
      }
      val (v1, _) = power(c)
      val d1 = c.join(broadcast(v1), Seq("dim"))
        .groupBy(col("vec_id")).agg(dsum(col("c") * col("vv")).as("dot"))
      val c2 = center(c.join(d1, Seq("vec_id"))
        .join(broadcast(v1), Seq("dim"))
        .select(col("vec_id"), col("dim"),
          (col("c") - col("dot") * col("vv")).as("c")))
      val (v2, n2) = power(c2)
      v2.crossJoin(broadcast(n2))
        .select(col("dim"),
          expr("cast(round(vv * 1000000) as bigint)").as("loading_ppm"),
          col("nrm").as("eigenvalue"))
        .orderBy(col("dim"))
    }),

    // Quantization-quality gate: recall@10 of int8-reconstructed
    // cosine ranking vs full precision — the acceptance metric for
    // shipping a quantized index (emb_quantize reports per-vector
    // error; THIS reports what that error does to retrieval). Both
    // rankings run the same probe-broadcast scan; reconstruction is
    // q·scale per element, so the whole comparison is deterministic
    // double arithmetic on both engines.
    "emb_quantize_recall" -> ((s, d) => {
      val v = embeddings(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      val recon = v
        .withColumn("scale", expr(
          "array_max(transform(v, x -> abs(x))) / 127.0D"))
        .withColumn("r", expr(
          "CASE WHEN scale = 0.0D THEN transform(v, x -> 0.0D)" +
            " ELSE transform(v, x -> cast(round(x / scale) as bigint)" +
            " * scale) END"))
        .select(col("vec_id"), col("v"), col("r"))
      def dot(a: String, b: String) =
        expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y)," +
          " 0D, (acc, t) -> acc + t)")
      val base = recon
        .withColumn("vn", dot("v", "v")).withColumn("rn", dot("r", "r"))
      val probes = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("r").as("qr"), col("vn").as("qvn"), col("rn").as("qrn"))
      val scored = base.join(broadcast(probes),
          col("vec_id") =!= col("query_id"))
        .withColumn("cos_full",
          expr("aggregate(zip_with(qv, v, (x, y) -> x * y)," +
            " 0D, (acc, t) -> acc + t)") / sqrt(col("qvn") * col("vn")))
        .withColumn("cos_q",
          expr("aggregate(zip_with(qr, r, (x, y) -> x * y)," +
            " 0D, (acc, t) -> acc + t)") / sqrt(col("qrn") * col("rn")))
      def top(c: String) = scored
        .withColumn("rk", row_number().over(Window
          .partitionBy(col("query_id"))
          .orderBy(col(c).desc, col("vec_id"))))
        .filter(col("rk") <= 10)
        .select(col("query_id"), col("vec_id"))
      top("cos_full").join(top("cos_q"), Seq("query_id", "vec_id"),
          "left_semi")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits10"))
        .orderBy(col("query_id"))
    }),

    // Per-source contamination report: how much of each source's slice
    // overlaps the benchmark set — the release-gate summary on top of
    // text_decontaminate's per-pair detail (a corpus ships with this
    // number, not the pair list). Same broadcast-benchmark shingle
    // join; the flagged doc set then left-joins back onto the
    // per-source counts, so the report side is |sources| rows.
    "corpus_contamination_report" -> ((s, d) => {
      val sets = graft.operators.Dedup.shingleSets(documents(s, d))
      def shingles(df: DataFrame) =
        df.select(col("doc_id"), explode(col("set")).as("h"))
      val bench = shingles(sets.filter(col("doc_id") < 20))
        .withColumnRenamed("doc_id", "bench_id")
      val flagged = shingles(sets.filter(col("doc_id") >= 20))
        .join(broadcast(bench), Seq("h"))
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 8)
        .select(col("doc_id")).distinct()
        .withColumn("contaminated", lit(1L))
      documents(s, d).filter(col("doc_id") >= 20)
        .select(col("doc_id"), col("source"))
        .join(flagged, Seq("doc_id"), "left_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("contaminated"), lit(0L))).as("n_contaminated"))
        .withColumn("rate_ppm",
          expr("n_contaminated * 1000000L div n_docs"))
        .orderBy(col("source"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "dedup_cluster" ->
      """WITH RECURSIVE sh AS (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |np AS (
        |  SELECT a_id, b_id FROM pairs
        |  JOIN sz a ON a.doc_id = a_id JOIN sz b ON b.doc_id = b_id
        |  WHERE inter * 5 >= (a.n + b.n - inter) * 4),
        |edges(a, b) AS (
        |  SELECT a_id, b_id FROM np UNION SELECT b_id, a_id FROM np),
        |reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b)
        |SELECT node AS doc_id, MIN(r) AS cluster_id
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,

    "text_decontaminate" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |b AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id < 20),
        |c AS (SELECT doc_id, s FROM sh WHERE doc_id >= 20)
        |SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
        |FROM c JOIN b ON c.s = b.s
        |GROUP BY 1, 2 HAVING COUNT(*) >= 8
        |ORDER BY doc_id, bench_id""".stripMargin,

    // Bloom prefilter + exact verify ≡ the exact join (no false
    // negatives), so the oracle is text_decontaminate's, verbatim.
    "text_bloom_decon" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |b AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id < 20),
        |c AS (SELECT doc_id, s FROM sh WHERE doc_id >= 20)
        |SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
        |FROM c JOIN b ON c.s = b.s
        |GROUP BY 1, 2 HAVING COUNT(*) >= 8
        |ORDER BY doc_id, bench_id""".stripMargin,

    // The greedy reset is sequential per shard; the oracle walks it
    // with a recursive CTE joined on per-shard row number (iteration
    // depth = max docs per shard).
    "pack_sequences" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('sh' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 8 AS shard,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x != '')) AS BIGINT) AS tokens,
        |    ROW_NUMBER() OVER (PARTITION BY
        |      ('0x' || substr(md5('sh' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
        |      ORDER BY doc_id) AS rn
        |  FROM documents),
        |p AS (
        |  SELECT shard, rn, doc_id, tokens, tokens AS acc,
        |    CAST(0 AS BIGINT) AS pack_id
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.shard, t.rn, t.doc_id, t.tokens,
        |    CASE WHEN p.acc + t.tokens > 512 THEN t.tokens
        |      ELSE p.acc + t.tokens END,
        |    CASE WHEN p.acc + t.tokens > 512 THEN p.pack_id + 1
        |      ELSE p.pack_id END
        |  FROM t JOIN p ON t.shard = p.shard AND t.rn = p.rn + 1)
        |SELECT shard, doc_id, tokens, pack_id FROM p
        |ORDER BY shard, doc_id""".stripMargin,

    "pack_efficiency" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('sh' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 8 AS shard,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x != '')) AS BIGINT) AS tokens,
        |    ROW_NUMBER() OVER (PARTITION BY
        |      ('0x' || substr(md5('sh' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
        |      ORDER BY doc_id) AS rn
        |  FROM documents),
        |p AS (
        |  SELECT shard, rn, doc_id, tokens, tokens AS acc,
        |    CAST(0 AS BIGINT) AS pack_id
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.shard, t.rn, t.doc_id, t.tokens,
        |    CASE WHEN p.acc + t.tokens > 512 THEN t.tokens
        |      ELSE p.acc + t.tokens END,
        |    CASE WHEN p.acc + t.tokens > 512 THEN p.pack_id + 1
        |      ELSE p.pack_id END
        |  FROM t JOIN p ON t.shard = p.shard AND t.rn = p.rn + 1)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(MAX(pack_id) + 1 AS BIGINT) AS n_bins,
        |  CAST(SUM(tokens) AS BIGINT) AS sum_tokens,
        |  CAST(CAST(SUM(tokens) AS HUGEINT) * 1000000
        |    // ((MAX(pack_id) + 1) * 512) AS BIGINT) AS util_ppm,
        |  CAST((SUM(tokens) + 511) // 512 AS BIGINT) AS lb_bins
        |FROM p GROUP BY shard ORDER BY shard""".stripMargin,

    // Every CTE here is AS MATERIALIZED: each pr{i} references pr{i-1}
    // TWICE (rank row + in_sum subjoin), and DuckDB re-inlines plain
    // CTEs, so without materialization the quadratic `sh x JOIN sh y`
    // expands ~2^5-fold (~470 s measured at sf0.01 vs ~1 s materialized
    // — identical 47 rows). Spark-side the same doubling is cut with
    // localCheckpoint; this is the oracle-side equivalent.
    "graph_pagerank" -> {
      val base =
        """WITH sh AS MATERIALIZED (
          |  SELECT DISTINCT doc_id, u.s FROM documents,
          |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
          |    i -> substr(text, i, 8))) u(s)),
          |sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          |pairs AS MATERIALIZED (
          |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
          |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
          |  GROUP BY 1, 2),
          |np AS MATERIALIZED (
          |  SELECT a_id, b_id FROM pairs
          |  JOIN sz a ON a.doc_id = a_id JOIN sz b ON b.doc_id = b_id
          |  WHERE inter * 5 >= (a.n + b.n - inter) * 4),
          |edges AS MATERIALIZED (
          |  SELECT a_id AS s, b_id AS t FROM np
          |  UNION ALL SELECT b_id, a_id FROM np),
          |deg AS MATERIALIZED (SELECT s AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
          |pr0 AS MATERIALIZED (
          |  SELECT node, deg, (SELECT COUNT(*) FROM deg) AS n,
          |    CAST(100000000 AS BIGINT) // (SELECT COUNT(*) FROM deg) AS pr
          |  FROM deg)""".stripMargin
      val iters = (1 to 5).map { i =>
        s"""pr$i AS MATERIALIZED (
           |  SELECT p.node, p.deg, p.n,
           |    ((CAST(15 AS BIGINT) * 100000000) // p.n) // 100
           |      + (CAST(85 AS BIGINT) * s.in_sum) // 100 AS pr
           |  FROM pr${i - 1} p JOIN (
           |    SELECT e.t AS node, CAST(SUM(q.pr // q.deg) AS BIGINT) AS in_sum
           |    FROM pr${i - 1} q JOIN edges e ON q.node = e.s
           |    GROUP BY e.t) s
           |  ON p.node = s.node)""".stripMargin
      }.mkString(",\n")
      base + ",\n" + iters +
        "\nSELECT node AS doc_id, CAST(pr AS BIGINT) AS pr FROM pr5 ORDER BY doc_id"
    },

    "text_containment" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |b AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id < 20),
        |bn AS (SELECT bench_id, COUNT(*) AS bench_n FROM b GROUP BY 1),
        |c AS (SELECT doc_id, s FROM sh WHERE doc_id >= 20),
        |inter AS (
        |  SELECT c.doc_id, b.bench_id, COUNT(*) AS inter
        |  FROM c JOIN b ON c.s = b.s GROUP BY 1, 2)
        |SELECT doc_id, bench_id, inter, bench_n,
        |  CAST(inter AS DOUBLE) / bench_n AS containment
        |FROM inter JOIN bn USING (bench_id)
        |WHERE inter * 4 >= bench_n
        |ORDER BY doc_id, bench_id""".stripMargin,

    "shard_assign" ->
      """SELECT ('0x' || substr(md5('sh' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 32 AS shard,
        |  COUNT(*) AS n_docs, CAST(SUM(len(text)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,

    "dedup_survivors_quality" ->
      """WITH RECURSIVE sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |np AS (
        |  SELECT a_id, b_id FROM pairs
        |  JOIN sz a ON a.doc_id = a_id JOIN sz b ON b.doc_id = b_id
        |  WHERE inter * 5 >= (a.n + b.n - inter) * 4),
        |edges(a, b) AS (
        |  SELECT a_id, b_id FROM np UNION SELECT b_id, a_id FROM np),
        |reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
        |clusters AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
        |tk AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x != '')) AS BIGINT) AS n_toks
        |  FROM documents),
        |m AS (
        |  SELECT c.cluster_id, c.node AS doc_id, tk.n_toks,
        |    tk.n_toks * 4294967296 - c.node AS pk
        |  FROM clusters c JOIN tk ON tk.doc_id = c.node)
        |SELECT cluster_id, COUNT(*) AS n_members,
        |  arg_max(doc_id, pk) AS survivor_id,
        |  arg_max(n_toks, pk) AS survivor_toks
        |FROM m GROUP BY cluster_id HAVING COUNT(*) >= 2
        |ORDER BY cluster_id""".stripMargin,

    "dedup_survivors" ->
      """WITH RECURSIVE sh AS (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |np AS (
        |  SELECT a_id, b_id FROM pairs
        |  JOIN sz a ON a.doc_id = a_id JOIN sz b ON b.doc_id = b_id
        |  WHERE inter * 5 >= (a.n + b.n - inter) * 4),
        |edges(a, b) AS (
        |  SELECT a_id, b_id FROM np UNION SELECT b_id, a_id FROM np),
        |reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
        |clusters AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node)
        |SELECT doc_id, lang FROM documents
        |WHERE doc_id NOT IN (SELECT node FROM clusters WHERE node <> cluster_id)
        |ORDER BY doc_id""".stripMargin,

    // The composed pipeline's oracle is the composition of the
    // already-proven stage oracles: same shingle/cluster prelude as
    // dedup_survivors, same containment test as text_decontaminate,
    // same shard expression as shard_assign.
    "corpus_funnel" ->
      """WITH RECURSIVE sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |np AS (
        |  SELECT a_id, b_id FROM pairs
        |  JOIN sz a ON a.doc_id = a_id JOIN sz b ON b.doc_id = b_id
        |  WHERE inter * 5 >= (a.n + b.n - inter) * 4),
        |edges(a, b) AS (
        |  SELECT a_id, b_id FROM np UNION SELECT b_id, a_id FROM np),
        |reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
        |clusters AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
        |tk AS (
        |  SELECT doc_id, text,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x != '')) AS BIGINT) AS n_toks
        |  FROM documents),
        |input AS (SELECT * FROM tk WHERE doc_id >= 20),
        |quality AS (SELECT * FROM input WHERE n_toks >= 20),
        |firsts AS (
        |  SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
        |exact AS (SELECT q.* FROM quality q JOIN firsts USING (doc_id)),
        |surv AS (
        |  SELECT * FROM exact WHERE doc_id NOT IN
        |    (SELECT node FROM clusters WHERE node <> cluster_id)),
        |contam AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT c.doc_id FROM sh c
        |    JOIN (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id < 20) b
        |      ON c.s = b.s
        |    WHERE c.doc_id >= 20
        |    GROUP BY c.doc_id, b.bench_id HAVING COUNT(*) >= 80)),
        |clean AS (
        |  SELECT * FROM surv
        |  WHERE doc_id NOT IN (SELECT doc_id FROM contam))
        |SELECT stage, n_docs FROM (
        |  SELECT '1_input' AS stage, COUNT(*) AS n_docs FROM input
        |  UNION ALL SELECT '2_quality', COUNT(*) FROM quality
        |  UNION ALL SELECT '3_exact_dedup', COUNT(*) FROM exact
        |  UNION ALL SELECT '4_neardup_survivors', COUNT(*) FROM surv
        |  UNION ALL SELECT '5_decontaminated', COUNT(*) FROM clean) t
        |ORDER BY stage""".stripMargin,

    "corpus_curate" ->
      """WITH RECURSIVE sh AS (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |np AS (
        |  SELECT a_id, b_id FROM pairs
        |  JOIN sz a ON a.doc_id = a_id JOIN sz b ON b.doc_id = b_id
        |  WHERE inter * 5 >= (a.n + b.n - inter) * 4),
        |edges(a, b) AS (
        |  SELECT a_id, b_id FROM np UNION SELECT b_id, a_id FROM np),
        |reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
        |clusters AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
        |tk AS (
        |  SELECT doc_id, text,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x != '')) AS BIGINT) AS n_toks
        |  FROM documents),
        |corpus AS (SELECT * FROM tk WHERE doc_id >= 20 AND n_toks >= 20),
        |firsts AS (
        |  SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
        |exact AS (SELECT c.* FROM corpus c JOIN firsts USING (doc_id)),
        |contam AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT c.doc_id FROM sh c
        |    JOIN (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id < 20) b
        |      ON c.s = b.s
        |    WHERE c.doc_id >= 20
        |    GROUP BY c.doc_id, b.bench_id HAVING COUNT(*) >= 80))
        |SELECT
        |  ('0x' || substr(md5('sh' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |    % 32 AS shard,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS total_tokens
        |FROM exact
        |WHERE doc_id NOT IN
        |    (SELECT node FROM clusters WHERE node <> cluster_id)
        |  AND doc_id NOT IN (SELECT doc_id FROM contam)
        |GROUP BY shard ORDER BY shard""".stripMargin,

    "corpus_release" ->
      """WITH RECURSIVE sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |np AS (
        |  SELECT a_id, b_id FROM pairs
        |  JOIN sz a ON a.doc_id = a_id JOIN sz b ON b.doc_id = b_id
        |  WHERE inter * 5 >= (a.n + b.n - inter) * 4),
        |edges(a, b) AS (
        |  SELECT a_id, b_id FROM np UNION SELECT b_id, a_id FROM np),
        |reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
        |cl AS (SELECT node AS doc_id, MIN(r) AS cluster_id
        |  FROM reach GROUP BY node),
        |tk AS (
        |  SELECT doc_id, text,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x != '')) AS BIGINT) AS n_toks
        |  FROM documents),
        |corpus AS (SELECT * FROM tk WHERE doc_id >= 20 AND n_toks >= 20),
        |firsts AS (
        |  SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
        |exact AS (SELECT c.* FROM corpus c JOIN firsts USING (doc_id)),
        |contam AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT c.doc_id FROM sh c
        |    JOIN (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id < 20) b
        |      ON c.s = b.s
        |    WHERE c.doc_id >= 20
        |    GROUP BY c.doc_id, b.bench_id HAVING COUNT(*) >= 80)),
        |clean AS (
        |  SELECT * FROM exact
        |  WHERE doc_id NOT IN
        |      (SELECT doc_id FROM cl WHERE doc_id <> cluster_id)
        |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
        |h AS (SELECT doc_id,
        |  ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS b0
        |  FROM documents),
        |j AS (SELECT h.doc_id, COALESCE(cl.cluster_id, h.doc_id) AS rep_id
        |  FROM h LEFT JOIN cl ON cl.doc_id = h.doc_id),
        |sp AS (
        |  SELECT j.doc_id, CASE WHEN rh.b0 < 90 THEN 'train'
        |    WHEN rh.b0 < 95 THEN 'val' ELSE 'test' END AS split
        |  FROM j JOIN h rh ON rh.doc_id = j.rep_id),
        |rel AS (
        |  SELECT c.doc_id, c.n_toks, d.source, sp.split
        |  FROM clean c JOIN sp ON sp.doc_id = c.doc_id
        |  JOIN documents d ON d.doc_id = c.doc_id),
        |lp AS (
        |  SELECT ra.split AS a_split, rb.split AS b_split
        |  FROM np JOIN rel ra ON ra.doc_id = np.a_id
        |  JOIN rel rb ON rb.doc_id = np.b_id
        |  WHERE ra.split != rb.split),
        |leaks AS (
        |  SELECT split, COUNT(*) AS leak_pairs FROM (
        |    SELECT a_split AS split FROM lp
        |    UNION ALL SELECT b_split FROM lp) t GROUP BY 1),
        |card AS (
        |  SELECT split, COUNT(*) AS n_docs,
        |    CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
        |    CAST(SUM(n_toks) * 1000 // COUNT(*) AS BIGINT)
        |      AS mean_tokens_milli,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        |  FROM rel GROUP BY 1)
        |SELECT card.split, n_docs, total_tokens, mean_tokens_milli,
        |  n_sources, CAST(COALESCE(leak_pairs, 0) AS BIGINT) AS leak_pairs,
        |  COALESCE(leak_pairs, 0) = 0 AS release_ok
        |FROM card LEFT JOIN leaks ON leaks.split = card.split
        |ORDER BY card.split""".stripMargin,

    "dedup_source_stats" ->
      """WITH RECURSIVE sh AS (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |np AS (
        |  SELECT a_id, b_id FROM pairs
        |  JOIN sz a ON a.doc_id = a_id JOIN sz b ON b.doc_id = b_id
        |  WHERE inter * 5 >= (a.n + b.n - inter) * 4),
        |edges(a, b) AS (
        |  SELECT a_id, b_id FROM np UNION SELECT b_id, a_id FROM np),
        |reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
        |clusters AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
        |dropped AS (SELECT node FROM clusters WHERE node <> cluster_id)
        |SELECT d.source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN dr.node IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped,
        |  CAST(SUM(CASE WHEN dr.node IS NOT NULL THEN 1 ELSE 0 END) * 1000000
        |    AS BIGINT) // COUNT(*) AS dup_ppm
        |FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.node
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "emb_whiten" -> {
      import graft.Num.sqlAvg
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, u.i AS dim, emb[u.i] AS v FROM (
         |    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |    FROM embeddings) t,
         |  UNNEST(generate_series(1, len(emb))) u(i)),
         |stats AS MATERIALIZED (
         |  SELECT dim, ${sqlAvg("v")} AS mean, ${sqlAvg("v * v")} AS ex2
         |  FROM e GROUP BY dim),
         |ws AS (
         |  SELECT dim, mean, sqrt(ex2 - mean * mean) AS std FROM stats)
         |SELECT vec_id,
         |  CAST(SUM(CAST(round(
         |    (CASE WHEN std = 0 THEN 0.0 ELSE (v - mean) / std END) * 1e6)
         |    AS HUGEINT)) AS BIGINT) AS z_checksum,
         |  MAX(abs(CASE WHEN std = 0 THEN 0.0 ELSE (v - mean) / std END))
         |    AS max_absz
         |FROM e JOIN ws USING (dim)
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin
    },

    // Same MATERIALIZED discipline as graph_pagerank: every iteration
    // CTE is referenced more than once downstream.
    "emb_pca_power" -> {
      import graft.Num.{sqlAvg, sqlSum}
      val base =
        s"""WITH e AS MATERIALIZED (
           |  SELECT vec_id, u.i AS dim, emb[u.i] AS v FROM (
           |    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           |    FROM embeddings) t,
           |  UNNEST(generate_series(1, len(emb))) u(i)),
           |m AS MATERIALIZED (
           |  SELECT dim, ${sqlAvg("v")} AS mean FROM e GROUP BY dim),
           |c AS MATERIALIZED (
           |  SELECT vec_id, e.dim, v - mean AS c FROM e JOIN m USING (dim)),
           |v0 AS MATERIALIZED (SELECT dim, 1.0 AS vv FROM m)""".stripMargin
      val iters = (1 to 3).map { k =>
        s"""d$k AS MATERIALIZED (
           |  SELECT vec_id, ${sqlSum("c.c * p.vv")} AS dot
           |  FROM c JOIN v${k - 1} p USING (dim) GROUP BY vec_id),
           |w$k AS MATERIALIZED (
           |  SELECT c.dim, ${sqlSum("dd.dot * c.c")} AS w
           |  FROM c JOIN d$k dd USING (vec_id) GROUP BY c.dim),
           |n$k AS MATERIALIZED (
           |  SELECT sqrt(${sqlSum("w * w")}) AS nrm FROM w$k),
           |v$k AS MATERIALIZED (
           |  SELECT dim, w / (SELECT nrm FROM n$k) AS vv FROM w$k)""".stripMargin
      }.mkString(",\n")
      base + ",\n" + iters +
        "\nSELECT dim, CAST(round(vv * 1000000) AS BIGINT) AS loading_ppm," +
        "\n  (SELECT nrm FROM n3) AS eigenvalue" +
        "\nFROM v3 ORDER BY dim"
    },

    "emb_pca2" -> {
      import graft.Num.{sqlAvg, sqlSum}
      val base =
        s"""WITH e AS MATERIALIZED (
           |  SELECT vec_id, u.i AS dim, emb[u.i] AS v FROM (
           |    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           |    FROM embeddings) t,
           |  UNNEST(generate_series(1, len(emb))) u(i)),
           |m AS MATERIALIZED (
           |  SELECT dim, ${sqlAvg("v")} AS mean FROM e GROUP BY dim),
           |c AS MATERIALIZED (
           |  SELECT vec_id, e.dim, v - mean AS c FROM e JOIN m USING (dim)),
           |v0 AS MATERIALIZED (SELECT dim, 1.0 AS vv FROM m)""".stripMargin
      def chain(mat: String, pfx: String, v0: String) = (1 to 3).map { k =>
        val prev = if (k == 1) v0 else s"$pfx-v${k - 1}"
        s""""$pfx-d$k" AS MATERIALIZED (
           |  SELECT vec_id, ${sqlSum(s"$mat.c * p.vv")} AS dot
           |  FROM $mat JOIN "$prev" p USING (dim) GROUP BY vec_id),
           |"$pfx-w$k" AS MATERIALIZED (
           |  SELECT $mat.dim, ${sqlSum("dd.dot * " + mat + ".c")} AS w
           |  FROM $mat JOIN "$pfx-d$k" dd USING (vec_id) GROUP BY $mat.dim),
           |"$pfx-n$k" AS MATERIALIZED (
           |  SELECT sqrt(${sqlSum("w * w")}) AS nrm FROM "$pfx-w$k"),
           |"$pfx-v$k" AS MATERIALIZED (
           |  SELECT dim, w / (SELECT nrm FROM "$pfx-n$k") AS vv
           |  FROM "$pfx-w$k")""".stripMargin
      }.mkString(",\n")
      val deflate =
        s"""dproj AS MATERIALIZED (
           |  SELECT vec_id, ${sqlSum("c.c * p.vv")} AS dot
           |  FROM c JOIN "p1-v3" p USING (dim) GROUP BY vec_id),
           |c2 AS MATERIALIZED (
           |  SELECT c.vec_id, c.dim, c.c - dproj.dot * p.vv AS c
           |  FROM c JOIN dproj USING (vec_id)
           |  JOIN "p1-v3" p USING (dim))""".stripMargin
      base + ",\n" + chain("c", "p1", "v0") + ",\n" + deflate + ",\n" +
        chain("c2", "p2", "v0") +
        "\nSELECT dim, CAST(round(vv * 1000000) AS BIGINT) AS loading_ppm," +
        "\n  (SELECT nrm FROM \"p2-n3\") AS eigenvalue" +
        "\nFROM \"p2-v3\" ORDER BY dim"
    },

    "emb_quantize_recall" ->
      """WITH v AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |recon AS MATERIALIZED (
        |  SELECT vec_id, v,
        |    CASE WHEN list_max(list_transform(v, x -> abs(x))) / 127.0 = 0.0
        |      THEN list_transform(v, x -> 0.0)
        |      ELSE list_transform(v, x ->
        |        round(x / (list_max(list_transform(v, y -> abs(y))) / 127.0))
        |        * (list_max(list_transform(v, y -> abs(y))) / 127.0)) END
        |      AS r
        |  FROM v),
        |base AS MATERIALIZED (
        |  SELECT vec_id, v, r, list_dot_product(v, v) AS vn,
        |    list_dot_product(r, r) AS rn
        |  FROM recon),
        |probes AS MATERIALIZED (
        |  SELECT vec_id AS query_id, v AS qv, r AS qr, vn AS qvn,
        |    rn AS qrn
        |  FROM base WHERE vec_id < 10),
        |scored AS MATERIALIZED (
        |  SELECT p.query_id, b.vec_id,
        |    list_dot_product(p.qv, b.v) / sqrt(p.qvn * b.vn) AS cos_full,
        |    list_dot_product(p.qr, b.r) / sqrt(p.qrn * b.rn) AS cos_q
        |  FROM base b JOIN probes p ON b.vec_id <> p.query_id),
        |top_full AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY cos_full DESC, vec_id) AS rk
        |    FROM scored) t WHERE rk <= 10),
        |top_q AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY cos_q DESC, vec_id) AS rk
        |    FROM scored) t WHERE rk <= 10)
        |SELECT f.query_id, COUNT(*) AS n_hits10
        |FROM top_full f
        |WHERE EXISTS (SELECT 1 FROM top_q q
        |  WHERE q.query_id = f.query_id AND q.vec_id = f.vec_id)
        |GROUP BY f.query_id ORDER BY f.query_id""".stripMargin,

    "corpus_contamination_report" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |b AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id < 20),
        |c AS (SELECT doc_id, s FROM sh WHERE doc_id >= 20),
        |flagged AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT c.doc_id, b.bench_id FROM c JOIN b ON c.s = b.s
        |    GROUP BY 1, 2 HAVING COUNT(*) >= 8))
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN flagged.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_contaminated,
        |  CAST(SUM(CASE WHEN flagged.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    * 1000000 // COUNT(*) AS BIGINT) AS rate_ppm
        |FROM documents LEFT JOIN flagged USING (doc_id)
        |WHERE documents.doc_id >= 20
        |GROUP BY source ORDER BY source""".stripMargin,

    "sample_hash" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5('b' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 20 = 0
        |ORDER BY doc_id""".stripMargin,

    "corpus_split" ->
      """SELECT doc_id, source, bucket,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, source,
        |  ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "corpus_split_balance" ->
      s"""WITH split AS (
         |  SELECT doc_id,
         |    CASE WHEN b < 90 THEN 'train'
         |         WHEN b < 95 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS b
         |    FROM documents)),
         |t AS (
         |  SELECT doc_id, text, len(text) AS n_chars,
         |    ${TextAnalysis.sqlToks} AS toks FROM documents),
         |m AS (
         |  SELECT doc_id, n_chars,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(list_sum(list_prepend(0,
         |      list_transform(toks, t -> len(t)))) AS BIGINT) AS tok_chars,
         |    CAST(len(list_filter(toks,
         |      t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
         |    CAST(len(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
         |      AS BIGINT) AS n_sym,
         |    CAST(len(list_filter(toks, t -> t IN
         |      (${TextAnalysis.stopwords.map("'" + _ + "'").mkString(",")})))
         |      AS BIGINT) AS n_stop
         |  FROM t),
         |r AS (
         |  SELECT doc_id, n_tokens, n_chars,
         |    CASE WHEN n_tokens >= 10 AND n_tokens <= 1000
         |          AND CAST(tok_chars AS DOUBLE) / n_tokens >= 2.0
         |          AND CAST(tok_chars AS DOUBLE) / n_tokens <= 8.0
         |          AND CAST(n_sym AS DOUBLE) / n_chars < 0.1
         |          AND CAST(n_alpha AS DOUBLE) / n_tokens > 0.8
         |          AND n_stop >= 2
         |      THEN 1 ELSE 0 END AS pass
         |  FROM m)
         |SELECT split, COUNT(*) AS n_docs,
         |  CAST(SUM(pass) AS BIGINT) AS n_pass,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |  CAST(SUM(pass) * 1000000 // COUNT(*) AS BIGINT) AS pass_ppm,
         |  CAST(SUM(n_tokens) * 1000 // COUNT(*) AS BIGINT)
         |    AS mean_tokens_milli,
         |  CAST(SUM(n_chars) * 1000 // COUNT(*) AS BIGINT)
         |    AS mean_chars_milli
         |FROM split JOIN r USING (doc_id)
         |GROUP BY split
         |ORDER BY split""".stripMargin,

    "corpus_split_leakage" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |verified AS (
        |  SELECT a_id, b_id, inter, a.n + b.n - inter AS union_n
        |  FROM pairs JOIN sz a ON a.doc_id = a_id
        |  JOIN sz b ON b.doc_id = b_id
        |  WHERE inter * 5 >= (a.n + b.n - inter) * 4),
        |sp AS (
        |  SELECT doc_id, CASE WHEN b < 90 THEN 'train'
        |    WHEN b < 95 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |    ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS b
        |    FROM documents))
        |SELECT a_id, b_id, sa.split AS a_split, sb.split AS b_split,
        |  inter, union_n
        |FROM verified JOIN sp sa ON sa.doc_id = a_id
        |JOIN sp sb ON sb.doc_id = b_id
        |WHERE sa.split != sb.split
        |ORDER BY a_id, b_id""".stripMargin,

    "corpus_split_safe" ->
      """WITH RECURSIVE sh AS (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |np AS (
        |  SELECT a_id, b_id FROM pairs
        |  JOIN sz a ON a.doc_id = a_id JOIN sz b ON b.doc_id = b_id
        |  WHERE inter * 5 >= (a.n + b.n - inter) * 4),
        |edges(a, b) AS (
        |  SELECT a_id, b_id FROM np UNION SELECT b_id, a_id FROM np),
        |reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
        |cl AS (SELECT node AS doc_id, MIN(r) AS cluster_id
        |  FROM reach GROUP BY node),
        |h AS (SELECT doc_id,
        |  ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS b0
        |  FROM documents),
        |j AS (SELECT h.doc_id, COALESCE(cl.cluster_id, h.doc_id) AS rep_id,
        |  h.b0 FROM h LEFT JOIN cl ON cl.doc_id = h.doc_id)
        |SELECT j.doc_id, j.rep_id, rh.b0 AS bucket,
        |  CASE WHEN rh.b0 < 90 THEN 'train'
        |       WHEN rh.b0 < 95 THEN 'val' ELSE 'test' END AS split
        |FROM j JOIN h rh ON rh.doc_id = j.rep_id
        |ORDER BY j.doc_id""".stripMargin,

    "corpus_split_report" ->
      """WITH a AS (
        |  SELECT source,
        |    CASE WHEN b < 90 THEN 'train'
        |         WHEN b < 95 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT source,
        |    ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS b
        |    FROM documents)),
        |c AS (SELECT source, split, COUNT(*) AS n_docs
        |  FROM a GROUP BY source, split)
        |SELECT source, split, n_docs,
        |  CAST(n_docs * 1000000 // SUM(n_docs) OVER (PARTITION BY source)
        |    AS BIGINT) AS share_ppm
        |FROM c ORDER BY source, split""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5('s' || CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS c
        |  FROM documents) t
        |WHERE rn * 10 <= c ORDER BY doc_id""".stripMargin,

    "text_bpe_tokens" ->
      """SELECT u.tok, COUNT(*) AS n FROM documents,
        |UNNEST(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) u(tok)
        |GROUP BY u.tok ORDER BY n DESC, tok LIMIT 20""".stripMargin,

    "text_tokenizer_fertility" ->
      """WITH per AS (
        |  SELECT lang,
        |    len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tok,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t != '')) AS n_word,
        |    len(text) AS n_char
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_word) AS BIGINT) AS n_words,
        |  CAST(SUM(n_char) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_tok) * 1000 // SUM(n_word) AS BIGINT)
        |    AS fertility_milli,
        |  CAST(SUM(n_char) * 1000 // SUM(n_tok) AS BIGINT)
        |    AS chars_per_tok_milli
        |FROM per GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "text_bpe_learn" ->
      """WITH vocab AS (
        |  SELECT u.tok, COUNT(*) AS cnt FROM documents,
        |    UNNEST(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) u(tok)
        |  GROUP BY u.tok HAVING length(u.tok) >= 2),
        |pairs AS (
        |  SELECT substr(tok, i, 2) AS pair, cnt FROM vocab,
        |    UNNEST(generate_series(1, length(tok)::BIGINT - 1)) t(i)),
        |agg AS (
        |  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n,
        |    COUNT(*) AS n_types
        |  FROM pairs GROUP BY pair
        |  ORDER BY n DESC, pair LIMIT 30)
        |SELECT ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rank,
        |  pair, n, n_types
        |FROM agg ORDER BY rank""".stripMargin,

    "text_pii_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0
        |           THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |         WHEN doc_id % 4 = 1 THEN ' card 4111111111111111'
        |         ELSE '' END AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS n_email,
        |  len(regexp_extract_all(aug, '[0-9]{12,19}')) AS n_card,
        |  len(regexp_replace(
        |    regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9]{12,19}', '<CARD>', 'g')) AS scrubbed_len
        |FROM aug ORDER BY doc_id""".stripMargin,

    "text_pii_report" ->
      """WITH aug AS (
        |  SELECT source, text ||
        |    CASE WHEN doc_id % 4 = 0
        |           THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |         WHEN doc_id % 4 = 1 THEN ' card 4111111111111111'
        |         ELSE '' END AS aug
        |  FROM documents),
        |counted AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_email,
        |    CAST(len(regexp_extract_all(aug, '[0-9]{12,19}')) AS BIGINT) AS n_card
        |  FROM aug)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS docs_with_email,
        |  CAST(SUM(n_email) AS BIGINT) AS n_emails,
        |  CAST(SUM(CASE WHEN n_card > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS docs_with_card,
        |  CAST(SUM(n_card) AS BIGINT) AS n_cards,
        |  CAST(SUM(CASE WHEN n_email = 0 AND n_card = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS clean_docs,
        |  CAST(SUM(CASE WHEN n_email = 0 AND n_card = 0 THEN 1 ELSE 0 END)
        |    * 1000000 // COUNT(*) AS BIGINT) AS clean_ppm
        |FROM counted GROUP BY source ORDER BY source""".stripMargin,

    "dedup_cluster_hist" ->
      """WITH RECURSIVE sh AS (
        |  SELECT DISTINCT doc_id, u.s FROM documents,
        |  UNNEST(list_transform(generate_series(1, greatest(1, len(text) - 7)),
        |    i -> substr(text, i, 8))) u(s)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |np AS (
        |  SELECT a_id, b_id FROM pairs
        |  JOIN sz a ON a.doc_id = a_id JOIN sz b ON b.doc_id = b_id
        |  WHERE inter * 5 >= (a.n + b.n - inter) * 4),
        |edges(a, b) AS (
        |  SELECT a_id, b_id FROM np UNION SELECT b_id, a_id FROM np),
        |reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
        |cc AS (
        |  SELECT node AS doc_id, MIN(r) AS cluster_id
        |  FROM reach GROUP BY node),
        |sizes AS (
        |  SELECT cluster_id, COUNT(*) AS cluster_size
        |  FROM cc GROUP BY cluster_id)
        |SELECT cluster_size, COUNT(*) AS n_clusters
        |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

    "corpus_mix" ->
      """SELECT source, lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS doc_share
        |FROM documents GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,

    "emb_quantize" ->
      """WITH t AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (
        |  SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |  FROM t),
        |q AS (
        |  SELECT vec_id, v, scale,
        |    CASE WHEN scale = 0.0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(v, x -> CAST(round(x / scale) AS BIGINT))
        |    END AS qc
        |  FROM s),
        |e AS (
        |  SELECT vec_id, scale, qc,
        |    CASE WHEN scale = 0.0 THEN list_transform(v, x -> 0.0)
        |      ELSE list_transform(generate_series(1, len(v)),
        |        i -> abs(v[i] - qc[i] * scale)) END AS err
        |  FROM q)
        |SELECT vec_id, scale,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), qc),
        |    (acc, c) -> acc + c) AS q_checksum,
        |  list_max(err) AS max_err,
        |  list_reduce(list_prepend(0.0, list_transform(err, x -> x * x)),
        |    (acc, e) -> acc + e) / len(err) AS mse
        |FROM e ORDER BY vec_id""".stripMargin,

    "emb_label_stats" -> {
      s"""SELECT label, i AS dim, COUNT(*) AS n,
         |  ${sqlAvg("CAST(embedding[i] AS DOUBLE)")} AS mean,
         |  MIN(CAST(embedding[i] AS DOUBLE)) AS vmin,
         |  MAX(CAST(embedding[i] AS DOUBLE)) AS vmax
         |FROM embeddings, UNNEST(generate_series(1, len(embedding))) t(i)
         |GROUP BY label, i ORDER BY label, dim""".stripMargin
    },

    "emb_centroid_drift" ->
      """WITH e AS MATERIALIZED (
        |  SELECT label, vec_id % 2 AS half, i AS dim,
        |    CAST(round(1000000 * CAST(embedding[i] AS DOUBLE)) AS BIGINT)
        |      AS q
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) t(i)),
        |c AS (
        |  SELECT label, half, dim,
        |    CAST((SUM(q) + 1000000000 * COUNT(*)) // COUNT(*)
        |      - 1000000000 AS BIGINT) AS cq
        |  FROM e GROUP BY 1, 2, 3),
        |d AS (
        |  SELECT a.label,
        |    CAST(SUM((a.cq - b.cq) * (a.cq - b.cq)) AS BIGINT) AS drift2
        |  FROM c a JOIN c b ON a.label = b.label AND a.dim = b.dim
        |    AND a.half = 0 AND b.half = 1
        |  GROUP BY 1),
        |n AS (
        |  SELECT label,
        |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_ref,
        |    CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_new
        |  FROM embeddings GROUP BY 1)
        |SELECT label, n_ref, n_new, drift2
        |FROM d JOIN n USING (label) ORDER BY label""".stripMargin,

    "emb_dim_stats" -> {
      s"""SELECT i AS dim, COUNT(*) AS n,
         |  ${sqlAvg("CAST(embedding[i] AS DOUBLE)")} AS mean,
         |  MIN(CAST(embedding[i] AS DOUBLE)) AS vmin,
         |  MAX(CAST(embedding[i] AS DOUBLE)) AS vmax
         |FROM embeddings, UNNEST(generate_series(1, len(embedding))) t(i)
         |GROUP BY i ORDER BY dim""".stripMargin
    },

    "emb_class_reps" ->
      """WITH e AS MATERIALIZED (
        |  SELECT vec_id, label, i AS dim,
        |    CAST(round(1000000 * CAST(embedding[i] AS DOUBLE)) AS BIGINT)
        |      AS q
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) t(i)),
        |c AS (
        |  SELECT label, dim,
        |    CAST((SUM(q) + 1000000000 * COUNT(*)) // COUNT(*)
        |      - 1000000000 AS BIGINT) AS cq
        |  FROM e GROUP BY label, dim),
        |d AS (
        |  SELECT e.vec_id, e.label,
        |    CAST(SUM((e.q - c.cq) * (e.q - c.cq)) AS BIGINT) AS d2
        |  FROM e JOIN c ON e.label = c.label AND e.dim = c.dim
        |  GROUP BY e.vec_id, e.label),
        |r AS (
        |  SELECT label, vec_id, d2,
        |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY d2, vec_id) AS rk
        |  FROM d)
        |SELECT label, rk, vec_id, d2 FROM r WHERE rk <= 5
        |ORDER BY label, rk""".stripMargin,

    "emb_label_outliers" ->
      """WITH e AS MATERIALIZED (
        |  SELECT vec_id, label, i AS dim,
        |    CAST(round(1000000 * CAST(embedding[i] AS DOUBLE)) AS BIGINT)
        |      AS q
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) t(i)),
        |c AS (
        |  SELECT label, dim,
        |    CAST((SUM(q) + 1000000000 * COUNT(*)) // COUNT(*)
        |      - 1000000000 AS BIGINT) AS cq
        |  FROM e GROUP BY label, dim),
        |d AS (
        |  SELECT e.vec_id, e.label,
        |    CAST(SUM((e.q - c.cq) * (e.q - c.cq)) AS BIGINT) AS d2
        |  FROM e JOIN c ON e.label = c.label AND e.dim = c.dim
        |  GROUP BY e.vec_id, e.label),
        |r AS (
        |  SELECT label, vec_id, d2,
        |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY d2, vec_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY label) AS cnt
        |  FROM d),
        |m AS (SELECT label, d2 AS med_d2 FROM r WHERE rn = (cnt + 1) // 2),
        |f AS (
        |  SELECT label, vec_id, d2,
        |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id)
        |      AS rk
        |  FROM r)
        |SELECT f.label, f.rk, f.vec_id, f.d2, m.med_d2,
        |  CAST(f.d2 AS DOUBLE) / m.med_d2 AS ratio
        |FROM f JOIN m USING (label)
        |WHERE f.rk <= 5
        |ORDER BY f.label, f.rk""".stripMargin
  )
}
