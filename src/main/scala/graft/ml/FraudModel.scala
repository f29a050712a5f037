package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier, LogisticRegression}
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML operator surface (SURVEY.md §2.9 M1-M9) on Spark MLlib.
  *
  * Capability match for the reference's three GBDT engines + ensemble
  * (reference `src/models/` modules): calibrated probability scoring
  * of imbalanced binary labels with class weighting, thresholding,
  * feature importance, scaling fit on train only, and stacking — all as
  * Pipeline stages so train/apply keep the reference's leakage
  * discipline (fit on train, transform anywhere).
  */
object FraudModel {

  /** Class-weight column, one stats pass. Modes mirror the reference's
    * weighting surface:
    *  - "pos" (default): positives get (1−p)/p — LightGBM
    *    scale_pos_weight (`src/models/lightgbm_model.py:81-84`);
    *  - "balanced": per-class total/(n_classes·count) — sklearn-style
    *    (`src/utils/helpers.py:151-181` method='balanced');
    *  - "sqrt": per-class sqrt(total/count) — the dampened variant
    *    (`src/utils/helpers.py:173-177` method='sqrt'). */
  /** `statsOn`: optionally compute the weight STATISTICS on a different
    * frame than the one the column is applied to (fit-on-train,
    * apply-anywhere — e.g. stats from the train split while weighting a
    * train+val early-stopping frame, keeping scale_pos_weight a pure
    * function of train labels as in the reference). */
  def withClassWeight(df: DataFrame, label: Column,
                      weightCol: String = "class_weight",
                      mode: String = "pos",
                      statsOn: Option[DataFrame] = None): DataFrame = {
    val r = statsOn.getOrElse(df).agg(count(lit(1)).cast("double").as("n"),
      sum(label.cast("double")).as("npos")).first()
    val n = r.getDouble(0)
    val nPos = r.getDouble(1)
    val nNeg = n - nPos
    val (w1, w0) = mode match {
      case "pos" =>
        (if (nPos > 0 && nNeg > 0) nNeg / nPos else 1.0, 1.0)
      case "balanced" =>
        if (nPos > 0 && nNeg > 0) (n / (2.0 * nPos), n / (2.0 * nNeg)) else (1.0, 1.0)
      case "sqrt" =>
        if (nPos > 0 && nNeg > 0) (math.sqrt(n / nPos), math.sqrt(n / nNeg)) else (1.0, 1.0)
      case other => throw new IllegalArgumentException(
        s"unknown class-weight mode '$other' (expected pos | balanced | sqrt)")
    }
    df.withColumn(weightCol, when(label === 1, w1).otherwise(w0))
  }

  /** M1-M3: assembler → GBT with class weights. One model type — the
    * reference's 3 engines are hyperparameter variants of the same
    * capability.
    *
    * Early stopping (`config/config.yaml:43` early_stopping_rounds,
    * `src/models/lightgbm_model.py:96-110` valid_sets=[val]): pass
    * `validationIndicatorCol` naming a boolean column (true = validation
    * row inside the fit frame); boosting stops once the validation-error
    * improvement drops below `validationTol` — trees trained < maxIter. */
  def gbtPipeline(featureCols: Seq[String], labelCol: String,
                  maxIter: Int = 50, maxDepth: Int = 5,
                  weightCol: String = "class_weight",
                  validationIndicatorCol: Option[String] = None,
                  validationTol: Double = 0.01): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .setHandleInvalid("keep")
    val gbt = new GBTClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setWeightCol(weightCol)
      .setMaxIter(maxIter).setMaxDepth(maxDepth)
      .setStepSize(0.1).setSubsamplingRate(0.8)
      .setMinInstancesPerNode(10) // prune noise-driven leaves
      .setSeed(42L)
    validationIndicatorCol.foreach { c =>
      // validationTol has no public fluent setter on GBTClassifier
      gbt.setValidationIndicatorCol(c).set(gbt.validationTol, validationTol)
    }
    new Pipeline().setStages(Array(assembler, gbt))
  }

  /** M9: standard scaling fit on train only (leakage discipline). */
  def scalerPipeline(featureCols: Seq[String]): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("raw_features")
      .setHandleInvalid("keep")
    val scaler = new StandardScaler()
      .setInputCol("raw_features").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    new Pipeline().setStages(Array(assembler, scaler))
  }

  /** M4: P(fraud) from the probability vector. */
  def withProbability(scored: DataFrame, out: String = "p_fraud"): DataFrame =
    scored.withColumn(out, element_at(vector_to_array(col("probability")), 2))

  /** M5: thresholded 0/1 prediction. */
  def thresholded(p: Column, tau: Double): Column = (p >= tau).cast("int")

  /** Trees actually grown by the GBT stage (< maxIter when validation-
    * based early stopping fired — the deterministic count is pinned by
    * q70's oracle row). */
  def numTrees(model: PipelineModel): Int =
    model.stages.last.asInstanceOf[GBTClassificationModel].getNumTrees

  /** M6: feature importance table (top-n), from the trained GBT. */
  def featureImportance(model: PipelineModel, featureCols: Seq[String],
                        topN: Int = 20): Seq[(String, Double)] = {
    val gbt = model.stages.last.asInstanceOf[GBTClassificationModel]
    featureCols.zip(gbt.featureImportances.toArray)
      .sortBy(-_._2).take(topN)
  }

  /** M7: stacking — base-model prediction columns → logistic-regression
    * meta-model with class weights; returns (model, learned weights). */
  def stackingEnsemble(df0: DataFrame, predCols: Seq[String], labelCol: String,
                       weightCol: String = "class_weight"): (PipelineModel, Seq[(String, Double)]) = {
    // drop base-model output columns that would collide with the meta-model's
    val df = df0.drop("prediction", "rawPrediction", "probability", "features")
    val assembler = new VectorAssembler()
      .setInputCols(predCols.toArray).setOutputCol("meta_features")
    val lr = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("meta_features")
      .setWeightCol(weightCol).setMaxIter(100)
    val model = new Pipeline().setStages(Array(assembler, lr)).fit(df)
    val coefs = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
      .coefficients.toArray
    (model, predCols.zip(coefs))
  }

  /** M10 stand-in: sequence scoring WITHOUT a DL runtime. The W14
    * sliding tensors (`seq: array<array<double>>`, shape len×dim from
    * Sequences.sliding) flatten to a fixed len·dim vector feeding a
    * multilayer perceptron — same train/score surface, same tensors, so
    * a BiLSTM hook (the reference treats TF as optional,
    * `src/models/lstm_model.py:25-132`) can swap in without touching the
    * data path. */
  def flattenSequences(df: DataFrame, seqCol: String = "seq",
                       out: String = "features"): DataFrame =
    df.withColumn(out,
      org.apache.spark.ml.functions.array_to_vector(flatten(col(seqCol))))

  def sequenceMlpPipeline(len: Int, dim: Int, hidden: Seq[Int],
                          labelCol: String, maxIter: Int = 60): Pipeline = {
    val mlp = new org.apache.spark.ml.classification.MultilayerPerceptronClassifier()
      .setLayers((len * dim +: hidden :+ 2).toArray)
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setSeed(42L).setMaxIter(maxIter)
    new Pipeline().setStages(Array(mlp))
  }

  /** M8: weighted-average ensemble as a column expression. */
  def weightedEnsemble(preds: Seq[(Column, Double)]): Column = {
    val totalW = preds.map(_._2).sum
    preds.map { case (c, w) => c * w }.reduce(_ + _) / totalW
  }
}
