package graft.catalog

import graft.core.PrimaryKeyMapItem
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Primary-key catalog (operator S2, reference slot.py:18-33, 79-94).
  *
  * The reference pushes a 3-way information_schema join down to
  * Postgres and materializes a dict keyed by "schema.table". Here the
  * same query rides `spark.read.jdbc` (predicate + join execute inside
  * Postgres, identical pushdown), and the result is a small DataFrame
  * that every parse stage broadcast-joins against — the Spark analog of
  * the reference's per-record dict lookup, and the right shape at any
  * scale since the catalog is O(#tables).
  */
object PkCatalog {

  /** The reference's catalog SQL (slot.py:18-33), usable unchanged as a
    * JDBC `query` option so Postgres executes the joins server-side. */
  val PkSql: String =
    """SELECT concat_ws('.', tc.table_schema, tc.table_name) AS table_name,
      |       kcu.column_name AS col_name,
      |       c.data_type     AS col_type,
      |       kcu.ordinal_position AS col_ord_pos
      |FROM information_schema.table_constraints tc
      |JOIN information_schema.key_column_usage kcu
      |  USING (constraint_schema, constraint_name, table_schema, table_name)
      |JOIN information_schema.columns c
      |  ON c.table_schema = tc.table_schema
      | AND c.table_name = tc.table_name
      | AND c.column_name = kcu.column_name
      |WHERE tc.constraint_type = 'PRIMARY KEY'""".stripMargin

  /** Live JDBC path: catalog snapshot at stream start. */
  def fromJdbc(spark: SparkSession, url: String,
      props: java.util.Properties): DataFrame =
    collapse(spark.read.jdbc(url, s"($PkSql) pk", props))

  /** Static path for tests / local replay. */
  def fromItems(spark: SparkSession,
      items: Seq[PrimaryKeyMapItem]): DataFrame = {
    import spark.implicits._
    collapse(items.toDF())
  }

  /** File path for the CLI's local-replay mode: a parquet or JSON-lines
    * dump of [[PrimaryKeyMapItem]] rows (table_name, col_name,
    * col_type, col_ord_pos) — the catalog snapshot exported once from a
    * live database, replayed without a connection. */
  def fromFile(spark: SparkSession, path: String): DataFrame = {
    val schema = org.apache.spark.sql.Encoders.product[PrimaryKeyMapItem]
      .schema
    val raw =
      if (path.endsWith(".json") || path.endsWith(".jsonl"))
        spark.read.schema(schema).json(path)
      else spark.read.schema(schema).parquet(path)
    collapse(raw)
  }

  /** Composite-PK collapse: the reference's dict build keeps only the
    * LAST PK column by ordinal position (slot.py:88-94 — ORDER BY
    * ordinal_position feeding dict insertion; SURVEY.md §3.3 quirk).
    * Reproduced here as a max-ordinal row_number per table.
    */
  private def collapse(raw: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("table_name"))
      .orderBy(col("col_ord_pos").desc)
    raw.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("table_name"), col("col_name").as("pk_name"),
        col("col_type").as("pk_type"))
  }

  /** TTL-refreshing catalog provider — the scheduled-refresh feature
    * the reference lists on its roadmap but never shipped
    * (README.rst:136-138: "Refresh primary key cache on a schedule"):
    * a long-running CDC stream that sees a mid-flight ADD TABLE /
    * PK-change otherwise keeps dead-lettering (lenient) or failing
    * (strict) forever on a catalog snapshot from stream start.
    *
    * Call the returned function once per micro-batch (foreachBatch or
    * the parse stage's builder): within `ttl` it returns the cached
    * snapshot; after that the next call re-reads — one O(#tables)
    * catalog query per TTL window, amortized to nothing next to the
    * batch itself. The clock and the reader are injected so specs
    * drive both; production passes `() => fromJdbc(...)`.
    * Thread-confined to the driver's micro-batch loop (Structured
    * Streaming runs foreachBatch serially per query), so a plain var
    * suffices — no lock on the hot path. */
  def refreshing(read: () => DataFrame, ttlMillis: Long,
      now: () => Long = () => System.currentTimeMillis()): () => DataFrame = {
    var cached: DataFrame = null
    var asOf = Long.MinValue
    () => {
      val t = now()
      if (cached == null || t - asOf >= ttlMillis) {
        cached = read()
        asOf = t
      }
      cached
    }
  }

  /** HUP-triggered catalog refresh — the OTHER half of the
    * reference's roadmap item (README.rst:136-138: "Refresh primary
    * key cache on HUP signal / on a schedule"; [[refreshing]] is the
    * schedule half). Returns (provider, trigger): the provider serves
    * the cached snapshot until `trigger()` marks it dirty, and the
    * NEXT provider call — i.e. the next micro-batch, never mid-batch
    * — re-reads. The trigger is an injected seam: production wires it
    * to SIGHUP via [[onSigHup]]; specs call it directly. The dirty
    * flag is atomic because the signal thread races the micro-batch
    * loop; the cache itself stays batch-loop-confined like
    * [[refreshing]]'s. */
  def hupRefreshing(read: () => DataFrame)
      : (() => DataFrame, () => Unit) = {
    val dirty = new java.util.concurrent.atomic.AtomicBoolean(true)
    var cached: DataFrame = null
    val provider = () => {
      if (dirty.getAndSet(false) || cached == null) cached = read()
      cached
    }
    (provider, () => dirty.set(true))
  }

  /** Wire a refresh trigger to SIGHUP where the JVM supports signal
    * handling (jdk.unsupported's sun.misc.Signal — present on the
    * JDKs Spark supports). Returns false when unavailable OR when HUP
    * can never be DELIVERED in this JVM; the trigger can still be
    * invoked programmatically. Reflection keeps the compile-time
    * surface free of the unsupported API.
    *
    * Registration succeeding is NOT deliverability: a JVM started
    * with SIGHUP=SIG_IGN (nohup, some supervisors) keeps the ignored
    * disposition — HotSpot never overrides SIG_IGN for HUP/INT/TERM
    * (CPython's `signal.signal`, which the reference would have used,
    * does override it) — so `Signal.handle` returns normally while
    * the handler can never fire. Returning true there is a lie the
    * operator acts on (believing the roadmap feature works). So after
    * registering, this self-tests end-to-end: raise HUP in-process
    * (through the OS, same path as an external `kill -HUP`) and wait
    * for the handler. Not fired ⇒ restore the previous handler, log
    * the fallback, return false. The self-test fires `trigger` once
    * at wiring time — both production triggers are idempotent
    * (mark-dirty; re-persist of a just-persisted, unmaterialized
    * cache), and the catalog was read fresh moments before anyway. */
  def onSigHup(trigger: () => Unit): Boolean =
    try {
      val sigCls = Class.forName("sun.misc.Signal")
      val handlerCls = Class.forName("sun.misc.SignalHandler")
      val fired = new java.util.concurrent.atomic.AtomicInteger(0)
      val handler = java.lang.reflect.Proxy.newProxyInstance(
        handlerCls.getClassLoader, Array(handlerCls),
        (_, method, _) => {
          if (method.getName == "handle") {
            // trigger BEFORE signaling: the self-test below returns as
            // soon as `fired` ticks, and the caller may immediately
            // act on the trigger's effect (e.g. materialize the
            // re-armed cache) — incrementing first would let wiring
            // return while the trigger is still mid-flight on this
            // handler thread
            trigger()
            fired.incrementAndGet()
          }
          null
        })
      val sig = sigCls.getConstructor(classOf[String])
        .newInstance("HUP").asInstanceOf[Object]
      val prev = sigCls.getMethod("handle", sigCls, handlerCls)
        .invoke(null, sig, handler)
      sigCls.getMethod("raise", sigCls).invoke(null, sig)
      val deadline = System.currentTimeMillis() + 3000
      while (fired.get() == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      if (fired.get() > 0) true
      else {
        // dead disposition: un-register (best effort) and say so
        try sigCls.getMethod("handle", sigCls, handlerCls)
          .invoke(null, sig, prev)
        catch { case _: Throwable => () }
        System.err.println("graft: SIGHUP ignored at JVM start (nohup?)" +
          " — HUP-triggered catalog refresh cannot fire; use TTL refresh")
        false
      }
    } catch { case _: Throwable => false }

  /** Production HUP wiring for a RUNNING streaming job. A streaming
    * plan bakes the catalog's logical subtree in at start — the
    * [[hupRefreshing]] provider (a per-call DataFrame swap) can never
    * be re-consulted by it. What IS re-consulted, every micro-batch,
    * is the cache: each batch builds a fresh QueryExecution over the
    * fixed plan and substitutes cached data for matching subtrees. So
    * the refresh that reaches a live job is: persist the catalog
    * (frozen snapshot served to every batch), and on HUP drop and
    * re-arm that cache — the NEXT batch's execution finds no valid
    * entry, re-runs the underlying read (the PK_SQL JDBC query /
    * catalog file), and re-caches. Mid-batch consistency is free:
    * unpersist never tears data out from under a running execution.
    *
    * Returns the trigger (also wired to SIGHUP via [[onSigHup]] when
    * the JVM supports it) so callers and specs can fire it directly.
    */
  def hupRefreshable(cat: DataFrame): () => Unit = {
    cat.persist()
    val trigger: () => Unit = () => {
      cat.unpersist(blocking = false)
      cat.persist()
      ()
    }
    onSigHup(trigger)
    trigger
  }
}
