package graft

import graft.ext.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decode stub: histogram mass ~1, dimensions follow the formula") {
    val row = Multimodal.MediaRow(7L, "hello world".getBytes("UTF-8"), "src0")
    val f = Multimodal.decodeStub(row)
    assert(f.n_bytes == 11L)
    assert(f.width == 64 + 11 % 64 && f.height == 64)
    assert(math.abs(f.features.sum - 1.0) < 1e-9)
    assert(f.features.length == 16)
  }

  test("feature extraction runs distributed, one row per media item") {
    val n = Tables.documents(spark, sf0001).count()
    val feats = Multimodal.extractFeatures(spark, sf0001)
    assert(feats.count() == n)
    // payload bytes never collected to the driver: result schema is
    // features-only (no content column)
    assert(!feats.schema.fieldNames.contains("content"))
  }
}
