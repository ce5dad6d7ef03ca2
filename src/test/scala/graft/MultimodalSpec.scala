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
}
