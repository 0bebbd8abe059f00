package graft

import graft.pipeline.Media

/** Multimodal batch-decode plumbing (SURVEY builder mandate): schema,
  * partition-batched mapPartitions shape, deterministic stubbed decode. */
class MediaSpec extends SparkSpec {

  test("extractFeatures: deterministic fake-decode over binary payloads") {
    val rows = Media.fromDocuments(spark, sf)
    val feats = Media.extractFeatures(rows, Media.FakeDecoder).collect()
    assert(feats.length == 500)
    val byId = feats.map(f => f.docId -> f).toMap
    // digest matches an independently computed md5 of the payload
    val sample = rows.filter(_.docId == 0L).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    val expectedDigest = md.digest(sample.payload).map("%02x".format(_)).mkString
    assert(byId(0L).digest == expectedDigest)
    assert(byId(0L).nBytes == sample.payload.length)
    // fake dims follow the documented stub formula
    assert(feats.forall(f => f.width == f.nBytes * 7 % 1024 &&
      f.height == f.nBytes * 13 % 768))
    // frame offsets are 100-byte strides capped at 5 samples
    assert(feats.forall(f => f.frameOffsets ==
      (0 to math.min(f.nBytes / 100, 4)).map(_ * 100)))
    // repartitioned run (different partition batching) is identical
    val feats2 = Media.extractFeatures(rows.repartition(7), Media.FakeDecoder)
      .collect().map(f => f.docId -> f.digest).toMap
    assert(feats.forall(f => feats2(f.docId) == f.digest))
  }

  test("resizeTo: partition-batched resize with target-dim-scaled payloads") {
    val rows = Media.fromDocuments(spark, sf)
    val resized = Media.resizeTo(rows, Media.FakeDecoder, 64, 64).collect()
    assert(resized.length == 500)
    // output size follows the stub formula: max(16, w*h/64)
    assert(resized.forall(r => r.width == 64 && r.height == 64 &&
      r.payload.length == 64 * 64 / 64))
    // deterministic across partition layouts
    val again = Media.resizeTo(rows.repartition(5), Media.FakeDecoder, 64, 64)
      .collect().map(r => r.docId -> r.payload.toSeq).toMap
    assert(resized.forall(r => again(r.docId) == r.payload.toSeq))
  }
}
