// ==== COMPILE-ONLY SHIMS ==== (see AwsKinesisShims.scala)
package software.amazon.awssdk.services.kinesis

trait KinesisClient {
  def putRecord(req: model.PutRecordRequest): model.PutRecordResponse
  def createStream(req: model.CreateStreamRequest): model.CreateStreamResponse
  def describeStream(
      req: model.DescribeStreamRequest): model.DescribeStreamResponse
}

object KinesisClient {
  /** Default credential/region chain construction in the real SDK. */
  def create(): KinesisClient = throw new UnsupportedOperationException(
    "compile-only shim — run with the real software.amazon.awssdk:kinesis" +
      " jar on the classpath")
}
