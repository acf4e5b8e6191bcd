package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spec for the stubbed-decode multimodal plumbing: the decode itself is
  * a deterministic fake (no codecs in the container), so the tests pin
  * its arithmetic and the schema/batch-shape invariants a real decoder
  * swap-in must preserve.
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._
  import multimodal.MultimodalQueries._

  test("audio fingerprints: identical PCM shares every landmark; " +
    "leading silence preserves them (translation robustness)") {
    import spark.implicits._
    // Deterministic pseudo-random 16-frame payload; doc 3 prepends one
    // SILENT frame (byte 128 ⇒ centered value 0 ⇒ energy 0, never a
    // top-5 peak), so its peaks shift +1 frame but every (Δframe, e1,
    // e2) landmark hash is unchanged — the property Shazam matching
    // rests on.
    val b = Array.tabulate(16 * 64)(i => ((i * 31 + 7) % 256).toByte)
    val silent = Array.fill(64)(128.toByte)
    val media = Seq(
      (1L, b, "fake/raw", 16, 64),
      (2L, b.clone(), "fake/raw", 16, 64),
      (3L, silent ++ b, "fake/raw", 16, 65)
    ).toDF("doc_id", "payload", "fmt", "width", "height")
    val fps = audioFingerprints(media, 64, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fps(1L).nonEmpty && fps(1L) == fps(2L),
      "identical payloads must fingerprint identically")
    assert(fps(1L) == fps(3L),
      s"leading silence changed the landmark set: ${fps(1L)} vs ${fps(3L)}")
  }

  test("decodeFeatures: histogram mass == payload bytes, mean in range") {
    val media = mediaTable(spark, sf)
    val feats = decodeFeatures(media)
    val bad = feats
      .join(media.select(col("doc_id"), length(col("payload")).as("n_bytes")), "doc_id")
      .filter(aggregate(col("histogram"), lit(0L), (a, v) => a + v) =!= col("n_bytes")
        || col("mean_byte") < 0 || col("mean_byte") > 255)
    assert(bad.isEmpty, "histogram mass must equal byte count")
  }

  test("decodeFeatures schema: typed metadata + fixed-width feature vector") {
    val feats = decodeFeatures(mediaTable(spark, sf))
    assert(feats.columns.toSeq ==
      Seq("doc_id", "width", "height", "mean_byte", "histogram"))
    assert(feats.filter(size(col("histogram")) =!= 16).isEmpty)
  }

  test("decodeFeatures arithmetic pinned on a known payload") {
    import spark.implicits._
    // "AAAA" = 4 bytes of 0x41: histogram bin 4 gets 4, mean 65.0.
    val media = Seq((1L, "AAAA".getBytes("UTF-8"), "fake/raw", 2, 2))
      .toDF("doc_id", "payload", "fmt", "width", "height")
    val f = decodeFeatures(media).collect()(0)
    assert(f.getAs[Double]("mean_byte") == 65.0)
    assert(f.getAs[Seq[Long]]("histogram")(4) == 4L)
  }

  test("sampleFrames: every k-th byte => ceil(len/k) frames") {
    val media = mediaTable(spark, sf)
    val frames = sampleFrames(media, 8)
    val bad = frames
      .join(media.select(col("doc_id"), length(col("payload")).as("n_bytes")), "doc_id")
      .filter(col("n_frames") =!= ceil(col("n_bytes") / 8.0).cast("int"))
    assert(bad.isEmpty)
  }

  test("blockSig: perceptual-hash invariances") {
    import multimodal.MultimodalQueries.{blockSig, perturb}
    val base = ("the quick brown fox jumps over the lazy dog " * 8).getBytes("UTF-8")
    // Global brightness shift preserves EVERY mean comparison — the
    // defining perceptual invariance (cross-multiplied means cancel).
    val brightened = base.map(b => (b + 5).toByte)
    assert(blockSig(base) == blockSig(brightened))
    // A localized perturbation flips only the bits at its region
    // boundaries — near, not equal, and far from the 63-bit diameter.
    val h = java.lang.Long.bitCount(blockSig(base) ^ blockSig(perturb(base)))
    assert(h >= 1 && h <= 8, s"localized edit moved $h/63 bits")
    // A length edit (content shift) is NOT a near-dup for a block
    // hash — that's the shingle family's territory.
    val shifted = ("xxxxx " + new String(base, "UTF-8")).getBytes("UTF-8")
    assert(java.lang.Long.bitCount(blockSig(base) ^ blockSig(shifted)) > 8)
  }
}
