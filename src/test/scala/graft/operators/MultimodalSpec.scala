package graft.operators

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  test("media table carries real binary payloads with typed metadata") {
    val rows = Multimodal.mediaTable(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.payload.length > 0))
    assert(rows.map(_.media_type).toSet == Set("image", "audio", "video"))
  }

  test("decode stub is deterministic and consistent with the meta pass") {
    val a = Multimodal.mmDecodeFeatures(spark, sf0001).collect()
    val b = Multimodal.mmDecodeFeatures(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq)
    val meta = Multimodal.mmMeta(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    a.foreach(r => assert(r.getInt(2) == meta(r.getLong(0)),
      "byte_len from decode path != byte_len from metadata path"))
  }

  test("frame sampling emits every 5th frame with stable signatures") {
    val frames = Multimodal.mmFrameSample(spark, sf0001).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.getLong(0)).values.foreach { fs =>
      val idxs = fs.map(_.getLong(1)).sorted.toSeq
      assert(idxs == idxs.indices.map(_ * 5L))
    }
  }

  test("audio windows tile each payload exactly and energies match a re-derivation") {
    val byId = Multimodal.mediaTable(spark, sf0001)
      .filter(_.media_type == "audio").collect()
      .map(r => r.doc_id -> r.payload).toMap
    val rows = Multimodal.mmAudioEnergy(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (id, ws) =>
      val bytes = byId(id)
      val sorted = ws.sortBy(_.getLong(1))
      // windows tile the payload: indices 0..n-1, sample counts sum to len
      assert(sorted.map(_.getLong(1)).toSeq ==
        sorted.indices.map(_.toLong))
      assert(sorted.map(_.getInt(2)).sum == bytes.length)
      sorted.foreach { w =>
        val start = w.getLong(1).toInt * Multimodal.AudioWindowBytes
        val end = math.min(start + Multimodal.AudioWindowBytes, bytes.length)
        val want = (start until end).map { i =>
          val v = (bytes(i) & 0xFF).toLong - 128L; v * v
        }.sum
        assert(w.getLong(3) == want, s"doc $id win ${w.getLong(1)}")
      }
    }
  }
}
