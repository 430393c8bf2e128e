package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Transport selection for the CDC pipeline's raw stream. Both
  * transports expose the identical schema (payload, lsn, data_size)
  * and offset/commit/backpressure contract (CdcSourceContractSpec), so
  * everything downstream is source-agnostic:
  *
  *  - `pg:<connection>` — the walsender-backed [[PgReplicationSource]]
  *    (`<connection>` names a registered [[ReplicationStream]] factory;
  *    the reference's `--pg-*` connection flags collapse into the
  *    factory's construction),
  *  - anything else — a path for the tailed-file source.
  */
object CdcSource {
  def rawStream(spark: SparkSession, sourcePath: String,
      maxRecordsPerTrigger: Long = Long.MaxValue): DataFrame =
    if (sourcePath.startsWith("pg:"))
      spark.readStream
        .format(classOf[PgReplicationSourceProvider].getName)
        .option("connection", sourcePath.stripPrefix("pg:"))
        .option("maxRecordsPerTrigger", maxRecordsPerTrigger.toString)
        .load()
    else
      spark.readStream
        .format(classOf[CdcFileSourceProvider].getName)
        .option("path", sourcePath)
        .option("maxRecordsPerTrigger", maxRecordsPerTrigger.toString)
        .load()
}
