package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skewed data. AQE's skew-join split handles most
  * runtime skew; explicit salting is the tool for the pathological
  * case it can't fix — a shuffled join where a handful of keys carry
  * most of the rows and even split partitions overwhelm single tasks.
  *
  * saltedJoin replicates the small side `salts` times and sprays the
  * big side's hot keys across salt buckets: the hot key's rows land on
  * `salts` different reducers instead of one. Result is row-identical
  * to the plain join (verified by oracle in q_salted_join).
  */
object Joins {

  /** Equi-join `big ⋈ small` on bigKey == smallKey, salted.
    *
    * @param salts number of buckets to spread each key across
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column, salts: Int): DataFrame = {
    // deterministic spread: hash the whole big-side row id space via
    // the key plus a per-row component would break equality — salt by
    // hash of monotonic id is unnecessary; spread on a cheap
    // per-row basis using the partition-local row position is opaque
    // to Catalyst. xxhash64 of the key's bytes alone would put every
    // duplicate key in ONE bucket (no spread), so mix in spark_partition_id
    // and a per-partition counter — here simply a random-free rotation:
    // pmod(xxhash64(key, monotonically_increasing_id()), salts).
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(bigKey, monotonically_increasing_id()), lit(salts))
        .cast("int"))
    val saltDim = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(saltDim,
      bigKey === smallKey && bigSalted("_salt") === saltDim("_salt"))
      .drop("_salt")
  }
}
