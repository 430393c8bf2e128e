package graft

import org.scalacheck.{Gen, Prop}

import graft.expressions.{KmvSmallest, PyJson}
import graft.streaming.KplAggregate
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.DoubleType

/** Property-based coverage for the byte-level and sketch-level
  * primitives: randomized inputs catch the framing/merge edge cases a
  * handful of goldens cannot. */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- KPL wire codec ---------------------------------------------------
  private val genRecord: Gen[(String, Array[Byte])] = for {
    pk <- Gen.choose(0L, Long.MaxValue).map(_.toString)
    data <- Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (pk, data.toArray)

  test("KPL aggregate: encode/decode round-trips any record batch") {
    check(Prop.forAll(Gen.nonEmptyListOf(genRecord)) { records =>
      val decoded = KplAggregate.decode(KplAggregate.encode(records))
      decoded.length == records.length &&
        decoded.zip(records).forall { case ((pkA, dataA), (pkB, dataB)) =>
          pkA == pkB && java.util.Arrays.equals(dataA, dataB)
        }
    })
  }

  // ---- PyJson renderer --------------------------------------------------
  private val genScalar: Gen[String] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L).map(_.toString),
    Gen.oneOf("true", "false", "null"),
    Gen.alphaNumStr.map(s => "\"" + s + "\""),
    // strings exercising the escape paths
    Gen.oneOf("\"a\\nb\"", "\"q\\\"uote\"", "\"caf\\u00e9\"", "\"\\\\\""))

  private def genJson(depth: Int): Gen[String] =
    if (depth <= 0) genScalar
    else Gen.oneOf(
      genScalar,
      Gen.listOfN(3, genJson(depth - 1)).map(_.mkString("[", ",", "]")),
      Gen.listOfN(3, genJson(depth - 1)).map(vs =>
        vs.zipWithIndex.map { case (v, i) => s""""k$i":$v""" }
          .mkString("{", ",", "}")))

  test("py_json render is idempotent and JSON-preserving on nested values") {
    check(Prop.forAll(genJson(3)) { json =>
      val once = PyJson.render(json)
      // idempotence: a rendered doc re-renders to itself byte-for-byte
      PyJson.render(once) == once
    })
  }

  // ---- Commit log torn-write healing -----------------------------------
  test("CommitLog: any torn tail is dropped on read and healed by append") {
    val genRecords = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 1000000L)
      b <- Gen.choose(0L, 1000000L)
    } yield (a, b))
    // a torn tail: any strict prefix of a valid record's bytes
    val genTear = for {
      a <- Gen.choose(0L, 1000000L)
      b <- Gen.choose(0L, 1000000L)
      full = s"$a,$b\n"
      cut <- Gen.choose(1, full.length - 1)
    } yield full.take(cut)
    check(Prop.forAll(genRecords, genTear) { (records, tear) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-cl")
      val p = dir.resolve("_log")
      records.foreach { case (a, b) =>
        graft.streaming.CommitLogAccess.append(p, a, b)
      }
      java.nio.file.Files.write(p, tear.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      // the torn tail is invisible to reads...
      val afterTear = graft.streaming.CommitLogAccess.read(p, 2)
      // ...and the next append never concatenates into a corrupt record
      graft.streaming.CommitLogAccess.append(p, 7L, 9L)
      val afterHeal = graft.streaming.CommitLogAccess.read(p, 2)
      afterTear == records.map(r => Seq(r._1, r._2)) &&
        afterHeal == (records :+ ((7L, 9L))).map(r => Seq(r._1, r._2))
    })
  }

  // ---- Bounded KMV buffer ----------------------------------------------
  test("KmvSmallest: any partitioning/merge order equals brute-force k-smallest") {
    val agg = KmvSmallest(BoundReference(0, DoubleType, nullable = true), 8)
    val genVals = Gen.listOf(Gen.oneOf(
      Gen.choose(0, 30).map(_.toDouble / 30.0), // heavy duplication
      Gen.choose(0.0, 1.0)))
    val genSplit = for {
      vs <- genVals
      nParts <- Gen.choose(1, 5)
    } yield (vs, nParts)
    check(Prop.forAll(genSplit) { case (vs, nParts) =>
      val parts = vs.grouped(math.max(1, (vs.size + nParts - 1) / nParts))
        .toSeq
      val buffers = parts.map { p =>
        val b = agg.createAggregationBuffer()
        p.foreach(v => agg.update(b,
          new GenericInternalRow(Array[Any](v))))
        // serialize/deserialize every partial, like a real shuffle
        agg.deserialize(agg.serialize(b))
      }
      val merged = buffers.foldLeft(agg.createAggregationBuffer())(agg.merge)
      val got = agg.eval(merged)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray().toSeq
      val want = vs.distinct.sorted.take(8)
      got == want
    })
  }
}
