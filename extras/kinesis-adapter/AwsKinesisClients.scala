// Compiled by CI in the `adapters` subproject against compile-only
// shims of the AWS SDK v2 Kinesis surface (extras/shims/ — the real
// software.amazon.awssdk:kinesis is unresolvable in this offline
// build; at deploy time swap the shims for the real SDK jar, see
// README "Shipping to real Kinesis"). Everything it plugs into
// (KinesisLikeSink's ordered put + bounded backoff,
// StreamLifecycle.ensureActive's waiter schedule, the KPL wire format)
// is compiled and tested in the main build; this file is only the
// transport.
package graft.streaming

import software.amazon.awssdk.core.SdkBytes
import software.amazon.awssdk.services.kinesis.KinesisClient
import software.amazon.awssdk.services.kinesis.model.{
  CreateStreamRequest, DescribeStreamRequest, PutRecordRequest,
  ProvisionedThroughputExceededException, ResourceNotFoundException}

/** Production [[PutClient]] over the AWS SDK v2 synchronous Kinesis
  * client — the JVM analog of the reference's
  * `boto3.client('kinesis').put_record` path (stream.py:46-74).
  *
  * Ordering: the reference puts every aggregated record with
  * `SequenceNumberForOrdering` = the sequence number returned by the
  * previous put (stream.py:61-66), pinning total order on the single
  * shard. This client does the same: the first put omits the
  * parameter, every later put chains the prior response's sequence
  * number. KinesisLikeSink already guarantees the calls arrive in LSN
  * order from one task (coalesce(1) + sortWithinPartitions), so the
  * chain never forks.
  *
  * Throttling: ProvisionedThroughputExceededException maps to graft's
  * [[ThrottlingException]], which KinesisLikeSink retries with the
  * reference's bounded exponential backoff (0.05 s * 2^n, stream.py:
  * 46-74) INSIDE the task — Spark task retry would re-put the whole
  * batch.
  *
  * The SDK client is not serializable; it is built lazily per JVM from
  * the default credential/region chain, so the object shipped to the
  * task closure is just configuration.
  */
class AwsKinesisPutClient(streamName: String, partitionKey: String = "a",
    lanes: Int = 1)
    extends PutClient {

  @transient private lazy val client: KinesisClient = KinesisClient.create()

  /** Sequence number returned by the last successful put; chained into
    * the next put's SequenceNumberForOrdering (reference
    * stream.py:61-66). Task-local: one delivery lane per task — under
    * the multi-lane writer each lane task carries its own deserialized
    * client copy, so the chain never crosses lanes. */
  @transient private var lastSeq: String = _
  @transient private var delivered = 0L
  /** Lane this task's puts belong to (-1 = single-lane legacy). Set by
    * the multi-lane writer via beginBatch(batchId, lane). Each lane is
    * pinned to ITS OWN shard via ExplicitHashKey = the midpoint of the
    * lane's slice of the 2^128 hash space (a stream created with
    * `lanes` shards splits that space evenly, so lane i's midpoint
    * falls inside shard i) — per-key order preserved: a lane is a
    * deterministic hash(xid) group, and within the lane the
    * SequenceNumberForOrdering chain still pins total order. A
    * partition KEY alone would not do: Kinesis MD5-hashes it, and with
    * N keys over N shards collisions leave some shards idle while
    * writers contend on others (with the constant default key, ALL
    * lanes would fight over one shard — slower than lanes=1). */
  @transient private var lane: Int = -1

  override def beginBatch(batchId: Long, laneId: Int): Unit = {
    lane = laneId
    // a new lane sequence: do not chain ordering across epochs/lanes
    lastSeq = null
  }

  /** Midpoint of lane i's even 1/lanes slice of [0, 2^128). */
  private def laneHashKey(i: Int): String =
    java.math.BigInteger.ONE.shiftLeft(128)
      .multiply(java.math.BigInteger.valueOf(2L * i + 1))
      .divide(java.math.BigInteger.valueOf(2L * math.max(lanes, i + 1)))
      .toString

  override def put(seq: Long, data: Array[Byte]): Unit = {
    val base = PutRecordRequest.builder()
      .streamName(streamName)
      .partitionKey(if (lane >= 0) s"lane-$lane" else partitionKey)
      .data(SdkBytes.fromByteArray(data))
    val b = if (lane >= 0) base.explicitHashKey(laneHashKey(lane)) else base
    val req = (if (lastSeq != null) b.sequenceNumberForOrdering(lastSeq)
               else b).build()
    try {
      val resp = client.putRecord(req)
      lastSeq = resp.sequenceNumber()
      delivered += 1
    } catch {
      case e: ProvisionedThroughputExceededException =>
        throw new ThrottlingException(e.getMessage)
    }
  }

  override def deliveredCount(): Long = delivered
}

/** Production [[StreamLifecycle]] (operator S4): create-and-wait with
  * the reference's semantics — ShardCount=1 by default
  * (stream.py:14-15), tolerate already-exists (stream.py:21-25), then
  * StreamLifecycle.ensureActive replays the boto3 `stream_exists`
  * waiter schedule (10 s poll, 18 attempts) against [[streamStatus]].
  *
  * @param shardCount pass the sink's lane count when deploying with
  *                   --sink-lanes > 1: each lane's partition key needs
  *                   its own shard for the lanes to actually multiply
  *                   the 1 MB/s-per-shard wire ceiling */
class AwsStreamLifecycle(shardCount: Int = 1) extends StreamLifecycle {

  @transient private lazy val client: KinesisClient = KinesisClient.create()

  override def createStream(name: String): Unit =
    try client.createStream(CreateStreamRequest.builder()
      .streamName(name).shardCount(shardCount).build())
    catch {
      // re-throw as graft's exception so ensureActive's
      // tolerate-already-exists branch handles AWS and fakes alike
      case e: software.amazon.awssdk.services.kinesis.model.ResourceInUseException =>
        throw new ResourceInUseException(e.getMessage)
    }

  override def streamStatus(name: String): Option[String] =
    try Some(client.describeStream(DescribeStreamRequest.builder()
        .streamName(name).build())
      .streamDescription().streamStatusAsString())
    catch { case _: ResourceNotFoundException => None }
}
