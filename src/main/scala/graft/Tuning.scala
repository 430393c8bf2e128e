package graft

/** Session-level optimizer tuning shared by every entry point
  * (Verify/Bench/RunOne/probes/tests; GraftJob callers pass a session
  * built with the same knobs).
  */
object Tuning {
  /** `InferFiltersFromGenerate` synthesizes a `size(arr) > 0`
    * predicate from every explode, and predicate pushdown then inlines
    * the array-building expression into that filter below each
    * projection. For this engine's nested-array pipelines the inlining
    * is quadratic: a lambda that indexes or slices ANOTHER computed
    * array column (winnowing's `slice(hs, j, 8)`, the n-gram builders'
    * `toks[i+k]`) re-evaluates the inner array expression once PER
    * ELEMENT when both live in one inlined predicate — the winnowing
    * index went from ~290 md5s per document to ~84k interpreted ones,
    * and the inferred filter was the only consumer stitched that way
    * (projections keep their barrier: CollapseProject declines to
    * duplicate non-cheap multi-referenced expressions; the filter
    * rules have no such cost guard).
    *
    * Generate already skips null/empty inputs by itself, so the
    * inferred filter is a row-skipping micro-optimization at best and
    * a quadratic re-evaluation at worst: excluded. The empirical
    * proof lives in TextAnalysisSpec/`text_winnow_pairs` history
    * (round-4 bench died inside the inferred predicate).
    */
  val excludedRules =
    sys.env.getOrElse("GRAFT_EXCLUDED_RULES",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
}
