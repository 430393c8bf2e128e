// ==== COMPILE-ONLY SHIMS ==== (see AwsKinesisShims.scala)
package software.amazon.awssdk.services.kinesis.model

import software.amazon.awssdk.core.SdkBytes

class KinesisException(msg: String) extends RuntimeException(msg)

final class ProvisionedThroughputExceededException(msg: String)
    extends KinesisException(msg)
final class ResourceNotFoundException(msg: String)
    extends KinesisException(msg)
final class ResourceInUseException(msg: String) extends KinesisException(msg)

final class PutRecordRequest private[model] ()

object PutRecordRequest {
  final class Builder private[model] () {
    def streamName(v: String): Builder = this
    def partitionKey(v: String): Builder = this
    def explicitHashKey(v: String): Builder = this
    def data(v: SdkBytes): Builder = this
    def sequenceNumberForOrdering(v: String): Builder = this
    def build(): PutRecordRequest = new PutRecordRequest()
  }
  def builder(): Builder = new Builder()
}

trait PutRecordResponse {
  def sequenceNumber(): String
}

final class CreateStreamRequest private[model] ()

object CreateStreamRequest {
  final class Builder private[model] () {
    def streamName(v: String): Builder = this
    def shardCount(v: Int): Builder = this
    def build(): CreateStreamRequest = new CreateStreamRequest()
  }
  def builder(): Builder = new Builder()
}

trait CreateStreamResponse

final class DescribeStreamRequest private[model] ()

object DescribeStreamRequest {
  final class Builder private[model] () {
    def streamName(v: String): Builder = this
    def build(): DescribeStreamRequest = new DescribeStreamRequest()
  }
  def builder(): Builder = new Builder()
}

trait StreamDescription {
  def streamStatusAsString(): String
}

trait DescribeStreamResponse {
  def streamDescription(): StreamDescription
}
