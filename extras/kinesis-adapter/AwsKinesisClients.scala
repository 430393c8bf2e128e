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
class AwsKinesisPutClient(streamName: String, partitionKey: String = "a")
    extends PutClient {

  @transient private lazy val client: KinesisClient = KinesisClient.create()

  /** Sequence number returned by the last successful put; chained into
    * the next put's SequenceNumberForOrdering (reference
    * stream.py:61-66). Task-local: one delivery lane per sink. */
  @transient private var lastSeq: String = _
  @transient private var delivered = 0L

  override def put(seq: Long, data: Array[Byte]): Unit = {
    val b = PutRecordRequest.builder()
      .streamName(streamName)
      .partitionKey(partitionKey)
      .data(SdkBytes.fromByteArray(data))
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
  * the reference's semantics — ShardCount=1 (stream.py:14-15),
  * tolerate already-exists (stream.py:21-25), then
  * StreamLifecycle.ensureActive replays the boto3 `stream_exists`
  * waiter schedule (10 s poll, 18 attempts) against
  * [[streamStatus]]. */
class AwsStreamLifecycle extends StreamLifecycle {

  @transient private lazy val client: KinesisClient = KinesisClient.create()

  override def createStream(name: String): Unit =
    try client.createStream(CreateStreamRequest.builder()
      .streamName(name).shardCount(1).build())
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
