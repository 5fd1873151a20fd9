package graft.sources.replay

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property evidence for the produce-side wire encoder: ANY record batch —
  * arbitrary binary keys/values (incl. null and empty), arbitrary
  * timestamps, any codec — must round-trip bit-identically through
  * [[KafkaWire.encodeRecordBatchV2]] → [[KafkaWire.decodeBatches]] (the
  * same decoder the consume path runs against real brokers), and the
  * CRC-32C must catch every single-byte corruption of the covered span —
  * an 8-bit burst, within CRC-32's guaranteed detection class, so the
  * property is exact, not probabilistic. (Plain ScalaCheck generators with
  * fixed seeds; the scalatest-scalacheck bridge isn't on the offline
  * classpath.) */
class ProducePropertySpec extends AnyFunSuite {
  import KafkaWire._

  private val params = Gen.Parameters.default

  private val genBlob: Gen[Array[Byte]] = Gen.frequency(
    (1, Gen.const(null: Array[Byte])),
    (1, Gen.const(Array.emptyByteArray)),
    (4, Gen.chooseNum(1, 200).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))))

  private val genRec: Gen[(Array[Byte], Array[Byte], Long)] = for {
    k <- genBlob; v <- genBlob
    ts <- Gen.chooseNum(0L, 4102444800000L) // epoch..2100, ms
  } yield (k, v, ts)

  private val genBatch: Gen[List[(Array[Byte], Array[Byte], Long)]] =
    Gen.chooseNum(1, 50).flatMap(n => Gen.listOfN(n, genRec))

  test("encode-decode round-trips any batch bit-identically under every codec") {
    (0 until 25).foreach { trial =>
      val recs = genBatch.pureApply(params, Seed(trial.toLong))
      val codec = trial % 5
      val rs = encodeRecordBatchV2(recs, codec)
      assert(crcValid(rs), s"trial $trial: fresh batch must carry a valid CRC")
      val got = decodeBatches(rs, 0L, needKey = true, needValue = true).toSeq
      assert(got.size === recs.size, s"trial $trial codec $codec")
      got.zip(recs).zipWithIndex.foreach {
        case (((off, k, v, ts), (ek, ev, ets)), i) =>
          assert(off === i.toLong, "offsets are dense deltas from the base")
          assert(java.util.Arrays.equals(k, ek), s"trial $trial key $i")
          assert(java.util.Arrays.equals(v, ev), s"trial $trial value $i")
          assert(ts === ets, s"trial $trial timestamp $i")
      }
    }
  }

  test("any single-byte corruption of the CRC-covered span is detected") {
    (0 until 40).foreach { trial =>
      val recs = genBatch.pureApply(params, Seed(trial + 1000L))
      val seed = Gen.chooseNum(0, Int.MaxValue)
        .pureApply(params, Seed(trial + 2000L))
      val rs = encodeRecordBatchV2(recs, 0)
      // covered span: attributes..end = [21, length); pick a byte in it
      val pos = 21 + seed % (rs.length - 21)
      val flip = ((seed % 255) + 1).toByte // never a zero-xor no-op
      val bad = rs.clone()
      bad(pos) = (bad(pos) ^ flip).toByte
      assert(!crcValid(bad),
        s"trial $trial: byte $pos xor $flip slipped past the CRC (len ${rs.length})")
    }
  }

  test("idempotence fields survive the encode (pid/epoch/sequence readback)") {
    (0 until 20).foreach { trial =>
      val recs = genBatch.pureApply(params, Seed(trial + 3000L))
      val pid = Gen.chooseNum(0L, Long.MaxValue / 2)
        .pureApply(params, Seed(trial + 4000L))
      val epoch = Gen.chooseNum(0, Short.MaxValue.toInt)
        .pureApply(params, Seed(trial + 5000L)).toShort
      val baseSeq = Gen.chooseNum(0, 1 << 20)
        .pureApply(params, Seed(trial + 6000L))
      val rs = encodeRecordBatchV2(recs, 0, pid, epoch, baseSeq)
      val (gotPid, gotEpoch, gotBase, gotLast) = batchProducerInfo(rs)
      assert(gotPid === pid)
      assert(gotEpoch === epoch)
      assert(gotBase === baseSeq)
      assert(gotLast === baseSeq + recs.size - 1,
        "lastSeq = baseSeq + lastOffsetDelta")
      assert(crcValid(rs))
    }
  }
}
