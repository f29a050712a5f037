package graft

import java.io.FileInputStream
import java.util.Properties

/** Key/value configuration (SURVEY.md §2.1 S4).
  *
  * The reference's YAML config (`config/config.yaml`) becomes a typed
  * case class with defaults; values load from java properties files
  * (k=v) so no external parser dependency is needed. Everything the
  * scoring/eval operators parameterize lives here.
  */
final case class GraftConfig(
    seqLength: Int = 10,
    minTransactions: Int = 5,
    lookbackDays: Seq[Int] = Seq(1, 7, 30),
    riskThresholds: Seq[Double] = Seq(0.2, 0.4, 0.6, 0.8),
    fraudThreshold: Double = 0.6,
    blendModelWeight: Double = 0.4,
    costFalseNegative: Double = 1000.0,
    costFalsePositive: Double = 10.0,
    trainFraction: Double = 0.70,
    valFraction: Double = 0.15,
    defaultEncodingRate: Double = 0.035)

object GraftConfig {
  def fromProperties(path: String): GraftConfig = {
    val p = new Properties()
    val in = new FileInputStream(path)
    try p.load(in) finally in.close()
    def d(k: String, dflt: Double) = Option(p.getProperty(k)).map(_.toDouble).getOrElse(dflt)
    def i(k: String, dflt: Int) = Option(p.getProperty(k)).map(_.toInt).getOrElse(dflt)
    def is(k: String, dflt: Seq[Int]) = Option(p.getProperty(k))
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(dflt)
    def ds(k: String, dflt: Seq[Double]) = Option(p.getProperty(k))
      .map(_.split(",").map(_.trim.toDouble).toSeq).getOrElse(dflt)
    GraftConfig(
      seqLength = i("seq.length", 10),
      minTransactions = i("seq.minTransactions", 5),
      lookbackDays = is("features.lookbackDays", Seq(1, 7, 30)),
      riskThresholds = ds("risk.thresholds", Seq(0.2, 0.4, 0.6, 0.8)),
      fraudThreshold = d("risk.fraudThreshold", 0.6),
      blendModelWeight = d("score.blendModelWeight", 0.4),
      costFalseNegative = d("cost.falseNegative", 1000.0),
      costFalsePositive = d("cost.falsePositive", 10.0),
      trainFraction = d("split.train", 0.70),
      valFraction = d("split.val", 0.15),
      defaultEncodingRate = d("encoding.defaultRate", 0.035))
  }
}
