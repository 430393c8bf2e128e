package graft

/** Physical-plan hygiene for EVERY declared query: catches silent
  * regressions into cartesian products and plans that fall out of
  * whole-stage codegen. Runs at sf0.001 — plan SHAPE is what is
  * asserted, and the shape is scale-independent modulo AQE join
  * strategy choices (which only ever replace a shuffle join with a
  * broadcast join here, never with a cartesian).
  */
class PlanAuditSpec extends SparkSpec {

  // Deliberate all-pairs / nested-loop shapes:
  //  - sim_topk_brute: query set × corpus IS the brute-force baseline
  //    (broadcast nested loop over 10 query vectors)
  //  - sim_ann_ivf: corpus × 32 broadcast centroids (coarse quantizer
  //    assignment — bounded small side by construction)
  private val nestedLoopOk = Set("sim_topk_brute", "sim_ann_ivf")

  /** The audited predicate, factored out so the mutation test below can
    * prove it actually fires (the previous disjunctive form was vacuous:
    * Spark prints `BroadcastNestedLoopJoin BuildLeft/BuildRight`, never
    * `BroadcastNestedLoopJoin Inner`, so it could not fail). */
  private def plansNestedLoop(plan: String): Boolean =
    plan.contains("CartesianProduct") ||
      plan.contains("BroadcastNestedLoopJoin")

  test("no declared query plans a cartesian product") {
    for ((name, fn) <- SparkEntry.queries) {
      val df = fn(spark, sf)
      df.collect() // finalize AQE so the audited plan is the executed one
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!nestedLoopOk(name))
        assert(!plansNestedLoop(plan),
          s"$name plans an unexpected nested-loop join:\n$plan")
    }
  }

  test("the nested-loop audit fires on a deliberate cartesian (mutation probe)") {
    val df = spark.range(8).toDF("x").crossJoin(spark.range(8).toDF("y"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plansNestedLoop(plan),
      s"audit predicate failed to flag a cross join:\n$plan")
  }

  test("every batch query keeps a whole-stage-codegen span") {
    // dedup_embedding_cosine is mapPartitions-kerneled by design (the
    // scoring loop is hand-fused Scala, not Catalyst expressions)
    val exempt = Set("dedup_embedding_cosine")
    for ((name, fn) <- SparkEntry.queries if !exempt(name)) {
      val df = fn(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // AQE-finalized plans print codegen stages as "*(n) Op" markers
      assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
        s"$name has no whole-stage-codegen span:\n$plan")
    }
  }
}
