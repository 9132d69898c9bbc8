package graft.ml

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Per-entity ("random effect") model training and scoring.
  *
  * The reference builds an elaborate manual pipeline for this
  * (RandomEffectDataset: custom bin-packing partitioner, groupByKey,
  * reservoir cap, active/passive split, per-partition solver maps —
  * photon-api/.../data/RandomEffectDataset.scala:54-63,437-527). The
  * Spark-first translation is one `groupByKey(reId).mapGroups` — a single
  * shuffle keyed by entity, per-entity solves running inside executors,
  * with AQE handling skew. Entity sample caps (the 2 GB/partition
  * constraint, RandomEffectDataset.scala:38-45) are applied upstream via
  * [[graft.operators.GroupedSampling.boundedSample]].
  */
object RandomEffect {

  case class ReSample(reId: String, label: Double, features: Vector,
                      offset: Double, weight: Double)
  case class ReModel(reId: String, coef: Array[Double], intercept: Double,
                     variances: Option[Array[Double]] = None)

  /** Train one GLM per entity. `priors` (reId → model) gives warm-start /
    * fall-through semantics: entities with a prior but no data keep the
    * prior (the reference's full-outer join, RandomEffectCoordinate.scala:
    * 248-271). `pearsonK` > 0 applies per-entity Pearson feature
    * selection (P5) before the local solve — the solution scatters back
    * to full dimension, so scoring is unchanged.
    *
    * `subspace` (P4/A8, reference LinearSubspaceProjector.scala:36-87 +
    * RandomEffectDataset.scala:390-426,538-550): each entity's solve runs
    * in the span of ITS OWN active feature indices — a per-group index
    * union (local, zero shuffle) plus forward/backward remap. Under pure
    * l2 the restriction is exact (inactive coefficients have zero data
    * gradient, so their optimum is 0, exactly what scatter writes back),
    * while the local solver touches dim = |active| instead of the global
    * featureDim — at a 10⁶-feature vocabulary with ~10²-feature entities
    * that is the difference between a dense million-slot solve per entity
    * and a hundred-slot one. Skipped when a prior regularizes toward
    * nonzero means on inactive dims (the restriction would drop them). */
  def train(data: Dataset[ReSample], featureDim: Int, cfg: GlmConfig,
            priors: Option[Dataset[ReModel]] = None,
            pearsonK: Int = 0, subspace: Boolean = true): Dataset[ReModel] = {
    implicit val enc = Encoders.product[ReModel]
    val grouped = data.groupByKey(_.reId)(Encoders.STRING)

    def solve(samples: Array[LabeledPoint],
              prior: Option[ReModel]): GlmModel =
      if (pearsonK > 0 && pearsonK < featureDim) {
        // selection changes the coefficient space per entity, so priors
        // (whose means live in full space) are not applied here
        val idx = FeatureSelection.topPearsonIndices(samples, featureDim,
          pearsonK)
        val projected = samples.map(p => p.copy(features =
          FeatureSelection.project(p.features, idx)))
        val m = Glm.trainLocal(projected, idx.length, cfg)
        m.copy(coef = FeatureSelection.scatter(m.coef, idx, featureDim))
      } else {
        val hasPriorReg = prior.exists(_.variances.isDefined)
        val sub =
          if (subspace && featureDim > 1 && !hasPriorReg)
            Some(FeatureSelection.activeIndices(samples, featureDim))
              .filter(_.length < featureDim)
          else None
        sub match {
          case Some(idx) =>
            val projected = samples.map(p => p.copy(features =
              FeatureSelection.project(p.features, idx)))
            val warm = prior.map(p =>
              FeatureSelection.gather(p.coef, idx) :+ p.intercept)
            val m = Glm.trainLocal(projected, idx.length, cfg, warm)
            val variances = m.variances.map { v =>
              // inactive dims saw only the regularizer: H_jj = l2
              val fill = if (cfg.l2 > 1e-12) 1.0 / cfg.l2 else 1e12
              val out = Array.fill(cfg.coefDim(featureDim))(fill)
              var i = 0
              while (i < idx.length) { out(idx(i)) = v(i); i += 1 }
              if (cfg.fitIntercept) out(featureDim) = v(idx.length)
              out
            }
            m.copy(coef = FeatureSelection.scatter(m.coef, idx, featureDim),
              variances = variances)
          case None =>
            val warm = prior.map(p => p.coef :+ p.intercept)
            // a prior WITH variances regularizes toward the previous
            // model (per-entity incremental training); without, it only
            // warm-starts
            val priorCfg = prior.flatMap(p => p.variances.map(v =>
              cfg.copy(prior = Some(GaussianPrior(
                if (cfg.fitIntercept) p.coef :+ p.intercept else p.coef,
                java.util.Arrays.copyOf(v, cfg.coefDim(featureDim)))))))
              .getOrElse(cfg)
            Glm.trainLocal(samples, featureDim, priorCfg, warm)
        }
      }

    priors match {
      case None =>
        grouped.mapGroups { (id, it) =>
          val samples = it.map(r =>
            LabeledPoint(r.label, r.features, r.offset, r.weight)).toArray
          val m = solve(samples, None)
          ReModel(id, m.coef, m.intercept, m.variances)
        }
      case Some(pm) =>
        val groupedPriors = pm.groupByKey(_.reId)(Encoders.STRING)
        grouped.cogroup(groupedPriors) { (id, dataIt, priorIt) =>
          val prior = priorIt.toSeq.headOption
          val samples = dataIt.map(r =>
            LabeledPoint(r.label, r.features, r.offset, r.weight)).toArray
          if (samples.isEmpty) prior.iterator
          else {
            val m = solve(samples, prior)
            Iterator(ReModel(id, m.coef, m.intercept, m.variances))
          }
        }
    }
  }

  /** Score data against per-entity models: an equi-join on reId (the
    * reference's hand-rolled replicated partitioned hash join,
    * RandomEffectModel.scala:259-298 — in Spark this is literally
    * `join(models, "reId")`, and Catalyst picks broadcast vs shuffled
    * hash vs sort-merge). Rows whose entity has no model score 0
    * (reference behavior: unseen entity → zero model). */
  def score(df: DataFrame, models: Dataset[ReModel], reIdCol: String,
            featuresCol: String, scoreCol: String = "score"): DataFrame = {
    val m = models.select(col("reId").as("__reId"), col("coef").as("__coef"),
      col("intercept").as("__intercept"))
    val marginUdf = udf { (v: Vector, coef: Seq[Double], b: Double) =>
      if (coef == null) 0.0 else GlmMath.dot(coef.toArray, v) + b
    }
    df.join(m, df(reIdCol) === m("__reId"), "left_outer")
      .withColumn(scoreCol,
        when(col("__coef").isNull, lit(0.0))
          .otherwise(marginUdf(col(featuresCol), col("__coef"),
            col("__intercept"))))
      .drop("__reId", "__coef", "__intercept")
  }
}
