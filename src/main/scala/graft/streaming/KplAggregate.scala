package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** The KPL aggregated-record wire format (the same bytes the
  * reference's `aws_kinesis_agg.RecordAggregator` emits and the
  * Kinesis Client Library deaggregates — published at
  * github.com/awslabs/kinesis-aggregation):
  *
  *   magic 0xF3 0x89 0x9A 0xC2
  *   protobuf AggregatedRecord {
  *     repeated string partition_key_table = 1;
  *     repeated Record records = 3;        // Record:
  *   }                                     //  uint64 partition_key_index = 1
  *                                         //  bytes  data = 3
  *   md5(protobuf payload)                 // 16 trailing bytes
  *
  * Hand-encoded varint protobuf — no codec dependency exists in this
  * environment, and the format is three field shapes. `decode` is the
  * KCL-side deaggregation, used by specs to round-trip and by any
  * local consumer of the sink files.
  */
object KplAggregate {
  val Magic: Array[Byte] =
    Array(0xF3, 0x89, 0x9A, 0xC2).map(_.toByte)

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeLenDelim(out: ByteArrayOutputStream, tag: Int,
      bytes: Array[Byte]): Unit = {
    out.write(tag)
    writeVarint(out, bytes.length.toLong)
    out.write(bytes)
  }

  /** Encode (partitionKey, data) user records into one aggregated
    * record. Keys are deduplicated into the key table, exactly like
    * the KPL (repeated records in one transaction share their xid
    * key-table entry). */
  def encode(records: Seq[(String, Array[Byte])]): Array[Byte] = {
    val keys = records.map(_._1).distinct
    val keyIdx = keys.zipWithIndex.toMap
    val body = new ByteArrayOutputStream()
    keys.foreach { k =>
      writeLenDelim(body, 0x0A, k.getBytes(StandardCharsets.UTF_8))
    }
    records.foreach { case (k, data) =>
      val rec = new ByteArrayOutputStream()
      rec.write(0x08)
      writeVarint(rec, keyIdx(k).toLong)
      writeLenDelim(rec, 0x1A, data)
      writeLenDelim(body, 0x1A, rec.toByteArray)
    }
    val payload = body.toByteArray
    val out = new ByteArrayOutputStream(payload.length + 20)
    out.write(Magic)
    out.write(payload)
    out.write(MessageDigest.getInstance("MD5").digest(payload))
    out.toByteArray
  }

  /** Approximate encoded size of one more record — the bound check the
    * aggregator uses (protobuf overhead: tag+len bytes, key-table
    * amortized; a few bytes of slack on the safe side). */
  def recordOverhead(key: String, dataLen: Int): Int =
    dataLen + key.getBytes(StandardCharsets.UTF_8).length + 16

  private class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xFF
        pos += 1
        v |= (b & 0x7FL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def slice(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      a
    }
    def hasNext: Boolean = pos < end
  }

  /** KCL-side deaggregation: verify magic + md5, return the
    * (partitionKey, data) user records. Skips fields this encoder does
    * not emit (explicit-hash-key table, tags) for forward compat. */
  def decode(agg: Array[Byte]): Seq[(String, Array[Byte])] = {
    require(agg.length >= 20 && agg.take(4).sameElements(Magic),
      "not a KPL aggregated record (bad magic)")
    val payload = java.util.Arrays.copyOfRange(agg, 4, agg.length - 16)
    val digest = java.util.Arrays.copyOfRange(agg, agg.length - 16, agg.length)
    require(MessageDigest.getInstance("MD5").digest(payload)
      .sameElements(digest), "KPL aggregate md5 mismatch")
    val keys = scala.collection.mutable.ArrayBuffer.empty[String]
    val recs = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    val r = new Reader(payload, 0, payload.length)
    def skip(r: Reader, wireType: Int): Unit = wireType match {
      case 0 => r.varint()
      case 2 => r.slice(r.varint().toInt)
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
    while (r.hasNext) {
      val tag = r.varint()
      (tag >> 3, (tag & 7).toInt) match {
        case (1, 2) => keys += new String(r.slice(r.varint().toInt),
          StandardCharsets.UTF_8)
        case (3, 2) =>
          val end = r.varint().toInt + r.pos
          var idx = 0L
          var data = Array.emptyByteArray
          while (r.pos < end) {
            val t = r.varint()
            (t >> 3, (t & 7).toInt) match {
              case (1, 0) => idx = r.varint()
              case (3, 2) => data = r.slice(r.varint().toInt)
              case (_, w) => skip(r, w)
            }
          }
          recs += ((idx, data))
        case (_, w) => skip(r, w)
      }
    }
    recs.map { case (i, d) => (keys(i.toInt), d) }.toSeq
  }
}
