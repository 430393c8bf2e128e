// ==== COMPILE-ONLY SHIMS ==== (see PgJdbcShims.scala for the why)
// Mirror of the slice of the AWS SDK v2 Kinesis client that
// extras/kinesis-adapter touches (software.amazon.awssdk:kinesis is
// unresolvable in this offline build). Builder methods are no-op
// `this`-returners — nothing can execute because KinesisClient.create()
// is the sole entry point and it throws.
package software.amazon.awssdk.core

final class SdkBytes private (b: Array[Byte]) {
  def asByteArray(): Array[Byte] = b.clone()
}

object SdkBytes {
  def fromByteArray(b: Array[Byte]): SdkBytes = new SdkBytes(b.clone())
}
