package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only profiling harness (not part of the driver contract):
  * times declared queries with a stage/shuffle listener so structural
  * claims (exchange counts, shuffled bytes, job counts) are measured,
  * not inferred. Deleted before snapshot.
  * usage: runMain graft.Scratch <sfDir> q1,q2,...
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val qs = if (args.length > 1) args(1).split(",").map(_.trim).toSeq
             else Seq("emb_pca2")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.optimizer.excludedRules", Tuning.excludedRules)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val shufWrite = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.remoteBytesRead +
            m.shuffleReadMetrics.localBytesRead)
        }
      }
    })

    def reset(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      graft.operators.Pipeline.resetMemo()
      graft.functions.TimeSeries.resetMemo()
    }
    val warm = "/root/testdata/sf0.001"
    qs.foreach { q =>
      val fn = SparkEntry.queries(q)
      try { reset(); fn(spark, warm).count() } catch { case _: Throwable => () }
      (1 to 2).foreach { r =>
        reset()
        Thread.sleep(500) // let listener events drain before zeroing
        jobs.set(0); stages.set(0); shufWrite.set(0); shufRead.set(0)
        val t0 = System.nanoTime()
        fn(spark, d).count()
        val t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        println(f"$q%-24s r$r  $t%7.3f s  jobs=${jobs.get}%4d stages=${stages.get}%4d " +
          f"shufW=${shufWrite.get / 1024}%8d KiB shufR=${shufRead.get / 1024}%8d KiB")
      }
    }
    spark.stop()
  }
}

/** Supplementary plan evidence for emb_pca2 (round 14): the power
  * iteration's physical plan with the matrix behind (a) the old
  * localCheckpoint barrier and (b) the new repartition+cache barrier —
  * the final query plan cannot show this (iterations run as their own
  * checkpoint actions), so this dumps ONE iteration's dk/wk plan built
  * from the same operators. Deleted before snapshot; the dumped files
  * are committed under plans/r14/.
  */
object ScratchPca2Iter {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules", Tuning.excludedRules)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.Num.{davg, dsum, dsumExpr}
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"),
        col("val").cast("double").as("v"))
    val m = e.groupBy(col("dim")).agg(davg(col("v")).as("mean"))
    val centered = e.join(broadcast(m), Seq("dim"))
      .select(col("vec_id"), col("dim"), (col("v") - col("mean")).as("c"))
    def iterPlan(mat: org.apache.spark.sql.DataFrame): String = {
      val vk = m.select(col("dim"), lit(1.0).as("vv"))
      val dk = mat.join(broadcast(vk), Seq("dim"))
        .groupBy(col("vec_id")).agg(dsum(col("c") * col("vv")).as("dot"))
      val wk = mat.join(dk, Seq("vec_id"))
        .groupBy(col("dim")).agg(dsum(col("dot") * col("c")).as("w"))
      wk.withColumn("nrm", sqrt(
        sum(dsumExpr(col("w") * col("w")))
          .over(org.apache.spark.sql.expressions.Window.partitionBy())
          .cast("double") / 1e8))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
    }
    val before = iterPlan(centered.localCheckpoint())
    val after = iterPlan(centered.repartition(col("vec_id")).cache())
    java.nio.file.Files.write(java.nio.file.Paths.get(
      "plans/r14/emb_pca2_iteration_before.txt"), before.getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      "plans/r14/emb_pca2_iteration_after.txt"), after.getBytes("UTF-8"))
    println("before Exchanges: " + before.split("\n").count(_.contains("Exchange")))
    println("after  Exchanges: " + after.split("\n").count(_.contains("Exchange")))
    spark.stop()
  }
}

/** fuzzy_decon stage decomposition (round 14, dev-only). */
object ScratchFz {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules", Tuning.excludedRules)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    val pre = Tables.documents(spark, d)
      .select(col("doc_id"), substring(col("text"), 1, 30).as("pre"))
    def grams(df: DataFrame, idCol: String, preCol: String): DataFrame =
      df.select(col(idCol),
          explode(expr(s"sequence(1, length($preCol) - 2)")).as("pos"),
          col(preCol))
        .select(col(idCol), col("pos"),
          expr(s"substring($preCol, pos, 3)").as("gram"))
    val bench = pre
      .filter(expr("cast(conv(substring(md5(concat('fz', " +
        "cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 10 = 0"))
      .select(col("doc_id").as("bench_id"), col("pre").as("bpre"))
    val bg = grams(bench, "bench_id", "bpre")
      .withColumnsRenamed(Map("pos" -> "b_pos", "gram" -> "b_gram"))
    val cg = grams(pre, "doc_id", "pre")
    def joined = cg.join(broadcast(bg), col("gram") === col("b_gram") &&
      col("doc_id") =!= col("bench_id") &&
      abs(col("pos") - col("b_pos")) <= 8)
    def cand = joined
      .groupBy(col("bench_id"), col("doc_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 4)
    def full = cand
      .join(broadcast(bench), Seq("bench_id"))
      .join(pre, Seq("doc_id"))
      .withColumn("dist", levenshtein(col("bpre"), col("pre")))
      .filter(col("dist") <= 8)
      .select(col("bench_id"), col("doc_id"), col("dist"))
      .orderBy(col("bench_id"), col("doc_id"))
    def fullThresh = cand
      .join(broadcast(bench), Seq("bench_id"))
      .join(pre, Seq("doc_id"))
      .withColumn("dist", levenshtein(col("bpre"), col("pre"), 8))
      .filter(col("dist") >= 0)
      .select(col("bench_id"), col("doc_id"), col("dist"))
      .orderBy(col("bench_id"), col("doc_id"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-18s ${(System.nanoTime()-t0)/1e9}%7.3f s  (rows=$n)")
    }
    (1 to 3).foreach { r =>
      println(s"--- round $r ---")
      time("gram-join")(joined.write.format("noop").mode("overwrite").save().asInstanceOf[Any] match { case _ => 0L })
      time("candidates")(cand.count())
      time("full")(full.count())
      time("fullThresh")(fullThresh.count())
    }
    spark.stop()
  }
}
