package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Text analysis + multimodal plumbing (north-star). */
class TextMultimodalSpec extends SparkSpec {

  test("quality ratios are in [0,1] and score is bounded") {
    q("q_text_quality").collect().foreach { r =>
      assert(r.getAs[Double]("punct_ratio") >= 0.0 && r.getAs[Double]("punct_ratio") <= 1.0)
      assert(r.getAs[Double]("stop_ratio") >= 0.0 && r.getAs[Double]("stop_ratio") <= 1.0)
      assert(r.getAs[Double]("quality_score") >= 0.0 && r.getAs[Double]("quality_score") <= 1.0)
    }
  }

  test("bpe-ish token count >= whitespace token count on word text") {
    q("q_token_count").collect().foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_ws_tokens"))
    }
  }

  test("langid emits a prediction for every doc from the fixed label set") {
    val preds = q("q_text_langid").select("predicted").distinct()
      .collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "fr", "de", "es")))
    assert(q("q_text_langid").count() == Tables.documents(spark, sf).count())
  }

  test("fingerprint is stable under whitespace and case noise") {
    val fp1 = q("q_text_fingerprint").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // perturb: uppercase + extra spaces must hash identically
    val noisy = Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(regexp_replace(lower(trim(upper(regexp_replace(col("text"), " ", "  ")))),
          "\\s+", " ")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp1 == noisy)
  }

  test("multimodal decode: 4-wide features, deterministic, n_bytes matches blob") {
    val rows = q("q_multimodal_features").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val feats = r.getAs[scala.collection.Seq[Double]]("features")
      assert(feats.length == 4)
      assert(feats.head == r.getAs[Long]("n_bytes").toDouble)
    }
    val again = q("q_multimodal_features").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("stub decoder handles empty payloads") {
    assert(Multimodal.StubDecoder.decode(Array.empty).sameElements(Array(0.0, 0.0, 0.0, 0.0)))
  }
}
