package graft

import graft.streaming.MaterializedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The CDC-maintained slowly-changing-dimension pattern, end to end:
  * one stream keeps a MaterializedTable current from a change feed,
  * a second stream enriches its events against the table's CURRENT
  * state per micro-batch — the composition the whole library exists
  * for (reference ships changes to Kinesis; the consumer side is
  * exactly this).
  */
class EnrichmentJoinSpec extends SparkSpec {
  import spark.implicits._

  test("event stream enriches against the dimension as-of each batch") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-enrich").toString
    val mt = new MaterializedTable(dir)

    // dimension feed: (pkey, operation, payload, lsn)
    val dim = MemoryStream[(String, String, String, Long)]
    val dimQ = dim.toDF().toDF("pkey", "operation", "payload", "lsn")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        mt.applyBatch(b, id); ()
      }
      .start()

    // event feed, enriched in its own foreachBatch against current()
    val events = MemoryStream[(String, String)]
    val out = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, String, Option[String])]()
    val evQ = events.toDF().toDF("event_id", "user")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        mt.enrich(b, "user").collect().foreach { r =>
          out.add((r.getString(r.fieldIndex("event_id")),
            r.getString(r.fieldIndex("user")),
            Option(r.getString(r.fieldIndex("payload")))))
        }
        ()
      }
      .start()

    // epoch 1: two users exist; events see their current tiers
    dim.addData(("u1", "insert", "gold", 1L), ("u2", "insert", "silver", 2L))
    dimQ.processAllAvailable()
    events.addData(("e1", "u1"), ("e2", "u2"))
    evQ.processAllAvailable()
    // epoch 2: u1 upgraded, u2 deleted; later events see the NEW state,
    // and the unmatched key surfaces as null (not a dropped row)
    dim.addData(("u1", "update", "platinum", 3L), ("u2", "delete", null, 4L))
    dimQ.processAllAvailable()
    events.addData(("e3", "u1"), ("e4", "u2"))
    evQ.processAllAvailable()
    dimQ.stop(); evQ.stop()

    val byEvent = out.toArray(Array.empty[(String, String, Option[String])])
      .map(t => t._1 -> t._3).toMap
    assert(byEvent == Map(
      "e1" -> Some("gold"), "e2" -> Some("silver"),
      "e3" -> Some("platinum"), "e4" -> None))
  }
}
