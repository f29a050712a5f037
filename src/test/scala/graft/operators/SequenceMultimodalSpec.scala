package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SequenceMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val C = BehaviorWindows.Cols()
  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = (1 to 6).map(i =>
    (i.toLong, ts(f"2024-01-01 10:0$i:00"), 1L, i.toDouble)) ++ Seq(
    (7L, ts("2024-01-01 11:00:00"), 2L, 7.0)) // user 2: below minEvents
  private lazy val df = events.toDF("event_id", "ts", "user_id", "value")

  test("sliding sequences: full windows only, minEvents filter, last-row label") {
    val out = Sequences.sliding(df, C, Seq("value"), len = 3, minEvents = 5)
      .orderBy("event_id").collect()
    // user1 has 6 events -> windows end at events 3..6 (4 sequences); user2 skipped
    assert(out.length == 4)
    val first = out(0).getAs[collection.Seq[collection.Seq[Double]]]("seq")
    assert(first.map(_.toSeq).toSeq == Seq(Seq(1.0), Seq(2.0), Seq(3.0)))
    val last = out(3).getAs[collection.Seq[collection.Seq[Double]]]("seq")
    assert(last.map(_.toSeq).toSeq == Seq(Seq(4.0), Seq(5.0), Seq(6.0)))
  }

  test("sequence count per user = max(0, n-L+1) for n >= minEvents") {
    val n = Sequences.sliding(df, C, Seq("value"), len = 3, minEvents = 5).count()
    assert(n == 6 - 3 + 1)
  }

  test("sanitize maps nan/inf to sentinel +-999") {
    val d = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 1.5)
      .toDF("x")
    val out = d.select(Sequences.sanitize($"x")).collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(-999.0, 999.0, -999.0, 1.5))
  }

  test("padPre zero-pads short sequences to length, truncates long ones") {
    val d = Seq(Tuple1(Seq(Seq(1.0), Seq(2.0)))).toDF("seq")
    val padded = d.select(Sequences.padPre($"seq", 4, 1)).collect()(0)
      .getAs[collection.Seq[collection.Seq[Double]]](0)
    assert(padded.map(_.toSeq).toSeq == Seq(Seq(0.0), Seq(0.0), Seq(1.0), Seq(2.0)))
    val trunc = d.select(Sequences.padPre($"seq", 1, 1)).collect()(0)
      .getAs[collection.Seq[collection.Seq[Double]]](0)
    assert(trunc.map(_.toSeq).toSeq == Seq(Seq(2.0)))
  }

  test("M10 stand-in: MLP over flattened W14 tensors learns the fraud signal") {
    import graft.ml.FraudModel
    import graft.sources.SyntheticData
    val c = BehaviorWindows.Cols("card1", "ts", "transaction_amt", "transaction_id")
    val data = SyntheticData.transactions(spark, 4000L)
      .withColumn("ts", timestamp_seconds(col("transaction_dt")))
    val seqs = Sequences.sliding(data, c, Seq("transaction_amt"),
      len = 5, minEvents = 5, labelCol = Some("is_fraud"))
    val split = TimeSplit.assign(seqs, col("ts"), col("transaction_id"))
    val prepped = FraudModel.flattenSequences(split)
    val model = FraudModel.sequenceMlpPipeline(len = 5, dim = 1,
      hidden = Seq(8), labelCol = "label")
      .fit(prepped.filter(col("split") === "train"))
    val scored = FraudModel.withProbability(
      model.transform(prepped.filter(col("split") === "test")))
    val auc = graft.eval.Metrics.rocAuc(scored, col("label"), col("p_fraud"))
      .first().getDouble(0)
    info(f"sequence-MLP held-out AUC: $auc%.3f")
    assert(auc > 0.7) // fraud amounts are distribution-shifted -> learnable
  }

  test("multimodal: media table schema + batched stub extraction is deterministic") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "different"))
      .toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, $"doc_id", $"text", "text_blob")
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "blob", "n_bytes"))
    val feats = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getAs[collection.Seq[Float]]("features")).toMap
    assert(feats(1L).size == 8)
    assert(feats(1L).toSeq == feats(2L).toSeq) // same bytes -> same features
    assert(feats(1L).toSeq != feats(3L).toSeq)
    val again = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getAs[collection.Seq[Float]]("features")).toMap
    assert(again.view.mapValues(_.toSeq).toMap == feats.view.mapValues(_.toSeq).toMap) // run-to-run deterministic
    // leading features are real byte statistics (q80's oracle surface):
    // "hello world" = 11 bytes, sum 1116, min ' ' (32), max 'w' (119)
    val bytes = "hello world".getBytes("UTF-8").map(_ & 0xFF)
    assert(feats(1L).take(4).map(_.toLong).toSeq ==
      Seq(bytes.length.toLong, bytes.map(_.toLong).sum % 16777216L,
        bytes.min.toLong, bytes.max.toLong))
  }
}
