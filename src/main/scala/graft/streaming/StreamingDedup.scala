package graft.streaming

import graft.expressions.{MinHashSig, ShingleHashes}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ingest-time deduplication with CROSS-BATCH state — the
  * gate a training-data pipeline puts in front of its corpus store so
  * a document crawled today is recognized against everything ingested
  * before it (a within-batch dedup, or `dropDuplicates` with a
  * watermark, forgets; this state deliberately does not).
  *
  * Two tiers, both keyed-state ops that scale horizontally with the
  * state key, not the corpus:
  *
  *  - [[exactGate]]: keyed by content md5. State per distinct content
  *    is ONE long (the first doc id) — the minimum possible for exact
  *    first-wins semantics. All duplicates of a content hash route to
  *    one task; distinct contents spread across the cluster.
  *  - [[nearDupCandidates]]: keyed by MinHash band bucket (the
  *    streaming face of the batch LSH in operators/Dedup — same
  *    ShingleHashes/MinHashSig expressions, same banding math). State
  *    per bucket is one long. Emits (doc_id, first_id) for every
  *    band collision with an EARLIER doc — a candidate stream for
  *    downstream exact verification, exactly like the batch pipeline's
  *    candidates; a pair may surface from several bands, so consumers
  *    dedup/verify (the batch verify kernel applies unchanged).
  *
  * At-least-once note: state updates commit with the checkpoint, so a
  * replayed batch re-emits the same decisions (first-wins is
  * idempotent — the min doc id is stable under replay).
  */
object StreamingDedup {
  case class Doc(doc_id: Long, text: String)
  case class GateResult(doc_id: Long, first_id: Long, is_first: Boolean)
  case class Candidate(doc_id: Long, first_id: Long)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Exact-content first-wins gate. Within a batch the min doc_id is
    * the first (arrival order inside one micro-batch is not
    * meaningful); across batches the stored first wins UNCONDITIONALLY
    * — a later batch delivering a lower doc_id is still a duplicate of
    * content already admitted (re-flagging it as first would admit the
    * same content twice downstream). */
  def exactGate(docs: Dataset[Doc]): Dataset[GateResult] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => md5Hex(d.text))
      .flatMapGroupsWithState[Long, GateResult](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_, it, state: GroupState[Long]) => {
          val batch = it.toVector.sortBy(_.doc_id)
          val stored = state.getOption
          var first = stored.getOrElse(Long.MaxValue)
          val out = batch.map { d =>
            if (first == Long.MaxValue) first = d.doc_id
            GateResult(d.doc_id, first, stored.isEmpty && d.doc_id == first)
          }
          state.update(first)
          out.iterator
        })
  }

  case class Pair(a_id: Long, b_id: Long)

  /** Shared banding front end: (doc_id, band, bandHash). The band
    * hashes come from the ONE shared Dedup.bandStructs definition the
    * batch LSH also uses, which is what makes stream/batch parity
    * provable rather than approximate — a banding change lands on both
    * faces or neither. */
  private def banded(docs: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame = {
    val numPerm = bands * rowsPerBand
    docs
      .select(col("doc_id"),
        MinHashSig.minhash_sig(
          ShingleHashes.shingle_hashes(col("text"), 8), numPerm).as("sig"))
      .select(col("doc_id"), explode(graft.operators.Dedup
        .bandStructs(col("sig"), bands, rowsPerBand)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))
  }

  /** MinHash band-bucket candidate stream (16×3 banding by default —
    * the same miss probability as the batch LSH: ~1e-5 per true pair
    * at j=0.8). */
  def nearDupCandidates(docs: DataFrame, bands: Int = 16,
      rowsPerBand: Int = 3): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    banded(docs, bands, rowsPerBand)
      .as[(Long, Int, Long)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[Long, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_, it, state: GroupState[Long]) => {
          // The bucket representative is the first-ever doc seen and is
          // never replaced: a later doc pairs with it REGARDLESS of id
          // order (the old `first < id` guard silently dropped the
          // candidate when a lower id arrived in a later batch).
          val batch = it.toVector.sortBy(_._1)
          var first = state.getOption.getOrElse(Long.MaxValue)
          val out = batch.flatMap { case (id, _, _) =>
            if (first == Long.MaxValue) { first = id; None }
            else if (id != first) Some(Candidate(id, first))
            else None
          }
          state.update(first)
          out.iterator
        })
  }

  /** ALL-pairs band-bucket candidate stream — the streaming face of
    * the batch LSH's candidate join, with cross-batch keyed state:
    * where [[nearDupCandidates]] pairs each arrival only with the
    * bucket's first-ever doc (O(1) state, the cheap ingest gate), this
    * keeps the bucket's full id roster so every co-bucketed pair
    * surfaces exactly like the batch self-join — feed the emitted
    * pairs through the IDENTICAL verify kernel
    * (operators/Dedup.verifyJaccard over the corpus-so-far shingle
    * sets, the stream-static join pattern) and the verified output
    * EQUALS batch dedup_minhash_lsh on the same corpus
    * (StreamingMinhashParitySpec pins this row-for-row).
    *
    * Scale contract: state per bucket is the bucket's id list and
    * emission is quadratic in bucket size — fine for genuine near-dup
    * buckets (small by nature), degenerate for flood buckets
    * (boilerplate shingles). `maxBucket` caps both: a bucket past the
    * cap stops pairing and freezes its roster (the batch side's
    * dedup_simhash_buckets is the pre-flight diagnostic for the same
    * pathology). Pairs are emitted (min, max)-normalized; one pair may
    * surface from several bands and batches, so consumers `distinct`
    * before verify, same as the batch candidate join. */
  def nearDupPairs(docs: DataFrame, bands: Int = 16,
      rowsPerBand: Int = 3, maxBucket: Int = 4096): Dataset[Pair] =
    rosterPairs(banded(docs, bands, rowsPerBand), maxBucket)

  /** [[nearDupPairs]] over the WORD-3-GRAM feature set instead of char
    * shingles — the streaming face of the batch `dedup_incremental`
    * ingest gate. The gram sets come from the ONE shared
    * `Dedup.wordGramSetsPlan` lineage and the minhash/banding from the
    * same `MinHashSig`/`bandStructs` the batch gate bands, so an
    * incoming doc lands in exactly the buckets the batch side would
    * probe — StreamingIncrementalParitySpec pins admit decisions
    * stream == batch. */
  def nearDupPairsWords(docs: DataFrame, bands: Int = 16,
      rowsPerBand: Int = 3, maxBucket: Int = 4096): Dataset[Pair] = {
    val numPerm = bands * rowsPerBand
    val sigs = graft.operators.Dedup.wordGramSetsPlan(docs)
      .select(col("doc_id"),
        MinHashSig.minhash_sig(col("set"), numPerm).as("sig"))
      .select(col("doc_id"), explode(graft.operators.Dedup
        .bandStructs(col("sig"), bands, rowsPerBand)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))
    rosterPairs(sigs, maxBucket)
  }

  private def rosterPairs(bandedDocs: DataFrame,
      maxBucket: Int): Dataset[Pair] = {
    import bandedDocs.sparkSession.implicits._
    bandedDocs
      .as[(Long, Int, Long)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[Array[Long], Pair](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_, it, state: GroupState[Array[Long]]) => {
          var roster = state.getOption.getOrElse(Array.empty[Long])
          val out = Vector.newBuilder[Pair]
          it.toVector.map(_._1).sorted.foreach { id =>
            if (!roster.contains(id) && roster.length < maxBucket) {
              roster.foreach(p =>
                out += Pair(math.min(id, p), math.max(id, p)))
              roster = roster :+ id
            }
          }
          state.update(roster)
          out.result().iterator
        })
  }

  case class SimPair(a_id: Long, b_id: Long, hamming: Long)

  /** Streaming SimHash near-dup — the ingest-time face of the batch
    * dedup_simhash, and the one near-dup tier whose VERIFY runs
    * entirely in state: a SimHash verify needs only the two 64-bit
    * fingerprints (bit_count of the xor), so the bucket roster stores
    * (doc_id, sig) pairs and emits exact verified pairs directly — no
    * downstream join against a corpus store, unlike the MinHash tier
    * where the multi-KB shingle sets stay external by design. Banding
    * is the shared Dedup.simhashBandStructs (4×15-bit chunks;
    * pigeonhole-exact for Hamming ≤ 3), fingerprints the same native
    * token_md5_60 → simhash64 expressions — stream output EQUALS batch
    * dedup_simhash on the same corpus (StreamingMinhashParitySpec).
    * A pair may surface from several chunks/batches: consumers
    * `distinct`, same as the batch join. State per bucket: 16 bytes
    * per resident doc, maxBucket-capped like nearDupPairs. */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 4096, wide: Boolean = false): Dataset[SimPair] = {
    import docs.sparkSession.implicits._
    import graft.expressions.SimHash64.simhash64
    import graft.expressions.TokenMd5.token_md5_60
    val sigCol = simhash64(token_md5_60(col("text"))).as("sig")
    // wide = the Manku 6x10/C(6,3) key layout (Dedup
    // .simhashBandStructsWide): 2^30 buckets, which is what keeps the
    // per-bucket roster — quadratic work, maxBucket-capped — near-dup-
    // sized past ~1e7 docs; identical verified output either way
    val bandExpr =
      if (wide) graft.operators.Dedup.simhashBandStructsWide(col("sig"))
      else graft.operators.Dedup.simhashBandStructs(col("sig"))
    docs
      .select(col("doc_id"), sigCol)
      .select(col("doc_id"), col("sig"), explode(bandExpr).as("e"))
      .select(col("doc_id"), col("sig"), col("e.band").as("band"),
        col("e.key").as("key"))
      .as[(Long, Long, Int, Long)]
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[Seq[(Long, Long)], SimPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_, it, state: GroupState[Seq[(Long, Long)]]) => {
          var roster = state.getOption.getOrElse(Seq.empty[(Long, Long)])
          val out = Vector.newBuilder[SimPair]
          it.toVector.sortBy(_._1).foreach { case (id, sig, _, _) =>
            if (!roster.exists(_._1 == id) && roster.size < maxBucket) {
              roster.foreach { case (pid, psig) =>
                val ham = java.lang.Long.bitCount(sig ^ psig)
                if (ham <= maxHamming)
                  out += SimPair(math.min(id, pid), math.max(id, pid),
                    ham.toLong)
              }
              roster = roster :+ ((id, sig))
            }
          }
          state.update(roster)
          out.result().iterator
        })
  }
}
