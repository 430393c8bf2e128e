package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Composed streaming ingest-decision stage: the single pass a
  * training-data pipeline runs on every crawled document before it
  * touches the corpus store — benchmark-contamination gate (Bloom,
  * optional), quality gate, cross-batch exact-dup gate, and shard
  * assignment, emitting one verdict row per document:
  *
  *   raw doc → probe/tokenize → reject_contaminated (eval-suite overlap)
  *                            | reject_quality
  *                            | reject_duplicate (content seen before)
  *                            | accept(shard)
  *
  * One keyed stateful operator does all three: the stream shuffles once
  * on content md5 (the dedup key), quality is decided inside the group
  * function BEFORE any state is touched — a quality-rejected doc never
  * writes state, so the store holds one long per distinct ACCEPTED
  * content, not per distinct document ever seen (at crawl scale most
  * inputs are rejects; keeping them out of state is what bounds it),
  * and the shard is a pure hash of the doc id. The
  * verdict stream is exactly what a corpus writer partitions on
  * (`partitionBy(shard)`, reject rows to an audit sink), and the shard
  * expression matches the batch `shard_assign` operator, so streaming
  * ingest and batch re-sharding agree.
  *
  * At-least-once: state commits with the checkpoint; first-wins keyed on
  * the min doc id is idempotent under replay, so a replayed batch
  * re-emits identical verdicts.
  */
object IngestPipeline {
  case class RawDoc(doc_id: Long, text: String, source: String)
  case class Verdict(doc_id: Long, source: String, verdict: String,
      first_id: Long, n_tokens: Int, shard: Int)

  /** Benchmark-contamination gate state: a serialized [[graft.expressions.Bloom]]
    * filter over the eval suite's distinct shingle hashes plus the
    * rejection threshold (distinct shingle hits). Built once from the
    * benchmark corpus — a few MB by definition — and shipped to every
    * task inside the closure, the streaming face of
    * text_bloom_decon's broadcast scalar. The gate is deliberately
    * conservative (a Bloom hit is "may contain"): at the sizing the
    * builder uses, false-positive mass across >= `threshold` DISTINCT
    * shingles of one document is negligible, and flagged docs go to a
    * reject verdict a downstream exact job can re-examine — they are
    * never silently dropped from an audit trail. */
  final case class ContaminationGate(bloom: Array[Long], threshold: Int)

  object ContaminationGate {
    /** Build from the benchmark corpus' `text` column: distinct
      * 8-char-shingle XXH64 hashes → one 2^20-bit / 7-probe filter
      * (self-describing [m, k, words...] long array). One driver
      * action at pipeline CONSTRUCTION (setup, like loading a model)
      * — never per batch. */
    def fromBenchmark(bench: org.apache.spark.sql.DataFrame,
        threshold: Int): ContaminationGate = {
      import org.apache.spark.sql.functions.{col, explode}
      import graft.expressions.Bloom.bloom_agg
      import graft.expressions.ShingleHashes.shingle_hashes
      val words = bench
        .select(explode(shingle_hashes(col("text"), 8)).as("h"))
        .agg(bloom_agg(col("h"), 1 << 20, 7))
        .head().getSeq[Long](0).toArray
      ContaminationGate(words, threshold)
    }

    /** Distinct shingle hashes of `text` probing positive. */
    def hits(gate: ContaminationGate, text: String): Int = {
      val hs = graft.expressions.ShingleHashes
        .distinct(org.apache.spark.unsafe.types.UTF8String.fromString(text), 8)
        .toLongArray()
      var n = 0
      var i = 0
      while (i < hs.length) {
        if (graft.expressions.Bloom.mightContainWords(gate.bloom, hs(i)))
          n += 1
        i += 1
      }
      n
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Shard by content-independent doc-id hash — same expression family
    * as the batch `shard_assign` query (md5("sh" + id) prefix mod n). */
  def shardOf(docId: Long, nShards: Int): Int =
    (java.lang.Long.parseLong(md5Hex("sh" + docId).take(8), 16)
      % nShards).toInt

  case class SplitAssign(doc_id: Long, source: String, bucket: Long,
      split: String)

  /** Ingest-time train/val/test bucket: the SAME content hash as the
    * batch `corpus_split` release gate (first-8-hex of md5(text) mod
    * 100, 90/5/5), so a document gets its split the moment it enters
    * the corpus and the batch gate later agrees row for row
    * (StreamingSplitParity in IngestPipelineSpec pins it). Content
    * hashing means byte-identical duplicates can never straddle
    * splits, streaming or batch. */
  def splitOf(text: String): (Long, String) = {
    val b = java.lang.Long.parseLong(md5Hex(text).take(8), 16) % 100
    (b, if (b < 90) "train" else if (b < 95) "val" else "test")
  }

  /** Stateless split assignment over the raw-doc stream — a pure map,
    * no shuffle, no state: split is a function of content alone, so
    * at-least-once replay re-emits identical rows. */
  def assignSplits(docs: Dataset[RawDoc]): Dataset[SplitAssign] = {
    import docs.sparkSession.implicits._
    docs.map { d =>
      val (b, s) = splitOf(d.text)
      SplitAssign(d.doc_id, d.source, b, s)
    }
  }

  def decisions(docs: Dataset[RawDoc], minTokens: Int = 10,
      nShards: Int = 32,
      gate: Option[ContaminationGate] = None): Dataset[Verdict] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => md5Hex(d.text))
      .flatMapGroupsWithState[Long, Verdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_, it, state: GroupState[Long]) => {
          // Min doc id wins within a batch (arrival order inside one
          // micro-batch is not meaningful); across batches the STORED
          // first wins unconditionally — the accepted doc was already
          // written downstream, so a later batch delivering a lower
          // doc_id must be rejected as a duplicate, never re-accepted.
          val batch = it.toVector.sortBy(_.doc_id)
          val stored = state.getOption
          var first = stored.getOrElse(Long.MaxValue)
          val out = batch.map { d =>
            val toks = d.text.split("\\s+").count(_.nonEmpty)
            // contamination outranks quality: an eval-suite overlap is
            // the signal the audit trail must carry even for junk docs.
            // Rejects never touch state — like quality rejects, they
            // must not block a clean duplicate arriving later.
            if (gate.exists(g => ContaminationGate.hits(g, d.text)
                >= g.threshold))
              Verdict(d.doc_id, d.source, "reject_contaminated",
                -1L, toks, -1)
            else if (toks < minTokens)
              Verdict(d.doc_id, d.source, "reject_quality",
                -1L, toks, -1)
            else {
              if (first == Long.MaxValue) first = d.doc_id
              if (stored.isEmpty && d.doc_id == first)
                Verdict(d.doc_id, d.source, "accept", first, toks,
                  shardOf(d.doc_id, nShards))
              else
                Verdict(d.doc_id, d.source, "reject_duplicate", first,
                  toks, -1)
            }
          }
          if (first != Long.MaxValue) state.update(first)
          out.iterator
        })
  }
}
