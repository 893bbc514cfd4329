package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("binary meta: byte lengths and digests line up with the text") {
    val rows = Multimodal.mmBinaryMeta(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[String]("payload_md5").length == 32)
      assert(r.getAs[String]("head_hex").matches("[0-9A-F]{16}"))
    }
  }

  test("binaryFile-sourced payload lake yields row-identical mm output to the synthesized table") {
    // the honest 100 TB media shape: payloads as FILES on the lake,
    // read via Spark's binaryFile source behind the same
    // (doc_id, payload) interface as the synthesized table
    val dir = java.nio.file.Files.createTempDirectory("mm_lake")
    Multimodal.payloadTable(spark, sf0001).collect().foreach { r =>
      java.nio.file.Files.write(
        dir.resolve(s"${r.getLong(0)}.bin"), r.getAs[Array[Byte]](1))
    }
    val fromFiles = Multimodal.mmBinaryMetaOf(
      Multimodal.payloadsFromBinaryFiles(spark, dir.toString)).collect()
    val fromTable = Multimodal.mmBinaryMeta(spark, sf0001).collect()
    assert(fromFiles.length == 500)
    assert(fromFiles.map(_.toString).toSeq == fromTable.map(_.toString).toSeq,
      "the binaryFile seam must not change a single byte of any mm_* result")
  }

  test("decode stub is deterministic and distributed (no driver collect)") {
    val a = Multimodal.mmDecodeStub(spark, sf0001).collect()
    val b = Multimodal.mmDecodeStub(spark, sf0001).collect()
    assert(a.length == 500)
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    a.foreach { r =>
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 64 + 577)
      assert(r.getAs[Int]("n_frames") >= 1 && r.getAs[Int]("n_frames") <= 8)
      assert(Set("image", "audio").contains(r.getAs[String]("kind")))
    }
  }
}
