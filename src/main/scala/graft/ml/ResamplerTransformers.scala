package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.StructType

/** `ml.Transformer` faces of the resampling operators (SURVEY §7.4: the
  * reference's imblearn samplers are pipeline stages, so the engine exposes
  * them as pipeline-composable Transformers too — e.g.
  * `new Pipeline().setStages(Array(new SmoteTransformer, lr))`).
  *
  * Thin by design: all semantics (and all scale behavior — LSH kNN joins,
  * hash-sampled estimators, distributed top-n) live in [[Resamplers]];
  * these bind parameters and delegate. Resampling is a row-set operation,
  * not a fitted model, hence Transformer rather than Estimator — matching
  * imblearn's `fit_resample` statelessness (reference
  * Hap880_Final_Project.py:447,683-687,814-817).
  */
abstract class ResamplerTransformer(override val uid: String) extends Transformer {

  final val labelCol: Param[String] =
    new Param(this, "labelCol", "binary label column (0.0/1.0)")
  final val idCol: Param[String] =
    new Param(this, "idCol", "unique row id column (never key by vector equality)")
  final val featuresCol: Param[String] =
    new Param(this, "featuresCol", "assembled feature vector column")
  final val seed: Param[Long] =
    new Param(this, "seed", "determinism seed")

  setDefault(labelCol -> "label", idCol -> "id", featuresCol -> "features", seed -> 42L)

  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setIdCol(v: String): this.type = set(idCol, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setSeed(v: Long): this.type = set(seed, v)

  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): Transformer = defaultCopy(extra)
}

class RandomUndersampleTransformer(uid: String) extends ResamplerTransformer(uid) {
  def this() = this(Identifiable.randomUID("rus"))
  override def transform(ds: Dataset[_]): DataFrame =
    Resamplers.randomUndersample(ds.toDF(), $(labelCol), $(seed))
}

class RandomOversampleTransformer(uid: String) extends ResamplerTransformer(uid) {
  def this() = this(Identifiable.randomUID("ros"))
  override def transform(ds: Dataset[_]): DataFrame =
    Resamplers.randomOversample(ds.toDF(), $(labelCol), $(seed))
}

class SmoteTransformer(uid: String) extends ResamplerTransformer(uid) {
  def this() = this(Identifiable.randomUID("smote"))
  override def transform(ds: Dataset[_]): DataFrame =
    Resamplers.smote(ds.toDF(), $(idCol), $(labelCol), $(featuresCol), $(seed))
}

class NearMissTransformer(uid: String) extends ResamplerTransformer(uid) {
  def this() = this(Identifiable.randomUID("nearmiss"))
  override def transform(ds: Dataset[_]): DataFrame =
    Resamplers.nearMiss(ds.toDF(), $(idCol), $(labelCol), $(featuresCol), $(seed))
}
