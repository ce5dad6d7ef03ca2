package graft

import graft.SparkSuite.Sf001
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload schema, deterministic stub
  * decode, feature/metadata consistency. */
class MultimodalSpec extends SparkSuite {

  test("media table: binary payload + typed metadata struct") {
    val m = Multimodal.mediaTable(spark, Sf001)
    val schema = m.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(m.count() == 500)
  }

  test("decode stub is deterministic and byte-length-consistent") {
    val f1 = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, Sf001))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val f2 = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, Sf001))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(f1 == f2)

    // byte_len equals n_chars (ascii corpus) — features tie back to meta
    val j = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, Sf001))
      .join(Tables.documents(spark, Sf001), Seq("doc_id"))
      .filter(col("byte_len") =!= col("n_chars"))
    assert(j.count() == 0)
  }

  test("decode runs partition-batched (plan has no per-row shuffles)") {
    val df = Multimodal.decodeFeatures(
      Multimodal.mediaTable(spark, Sf001).repartition(4))
    assert(df.rdd.getNumPartitions == 4)
  }

  test("resize stub bounds dimensions and keeps batch shape") {
    val r = Multimodal.resizeStub(
      Multimodal.mediaTable(spark, Sf001), maxW = 128, maxH = 128)
    val rows = r.collect()
    assert(rows.length == 500)
    rows.foreach { x =>
      assert(x.getInt(1) <= 128 && x.getInt(2) <= 128)
      assert(x.getInt(1) >= 1 && x.getInt(2) >= 1)
    }
  }

  test("frame-sample stub emits every-Nth deterministic frames") {
    val f1 = Multimodal.frameSampleStub(
      Multimodal.mediaTable(spark, Sf001), everyN = 3)
      .orderBy("doc_id", "frame_idx").collect()
    val f2 = Multimodal.frameSampleStub(
      Multimodal.mediaTable(spark, Sf001), everyN = 3)
      .orderBy("doc_id", "frame_idx").collect()
    assert(f1.nonEmpty)
    assert(f1.map(_.toSeq).toSeq == f2.map(_.toSeq).toSeq)
    assert(f1.forall(_.getInt(1) % 3 == 0))
  }
}
