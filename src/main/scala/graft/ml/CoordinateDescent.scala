package graft.ml

import graft.operators.ScoreAlgebra
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** GAME training: block coordinate descent over a fixed-effect coordinate
  * plus any number of per-entity random-effect coordinates
  * (photon-lib/.../algorithm/CoordinateDescent.scala:132-166,373-472).
  *
  * Dataflow per coordinate pass:
  *   residual_c = summedScores − score_c        (incremental, X15)
  *   retrain coordinate c on (label, features_c, offset + residual_c)
  *   rescore c; summedScores = residual_c + newScore_c
  * All score algebra is uid-keyed outer joins with missing→0
  * ([[graft.operators.ScoreAlgebra]]), each persisted and unpersisted per
  * round (X13) so the plan doesn't grow across iterations.
  */
object CoordinateDescent {

  /** One additive term of the GAME model. `featuresCol` must be VectorUDT;
    * random coordinates group by `reIdCol` (string). */
  sealed trait CoordinateSpec {
    def id: String
    def featuresCol: String
    def featureDim: Int
    def cfg: GlmConfig
  }
  /** Fixed-effect coordinate. `downSamplingRate` ∈ (0,1) down-samples
    * the training rows before the fit (L8, the reference's
    * DistributedOptimizationProblem.runWithSampling:152-167): binary
    * losses keep every positive and sample negatives at the rate with
    * 1/rate weight compensation; other losses sample uniformly with the
    * same compensation, so the sampled loss is unbiased in expectation.
    * Scoring always sees all rows. */
  case class FixedSpec(id: String, featuresCol: String, featureDim: Int,
                       cfg: GlmConfig, solver: String = "auto",
                       downSamplingRate: Double = 1.0)
    extends CoordinateSpec
  /** Random-effect coordinate. `activeCap` > 0 bounds each entity's
    * training sample count with the deterministic reservoir
    * ([[graft.operators.GroupedSampling.boundedSample]], the reference's
    * numActiveDataPointsUpperBound, RandomEffectDataSetConfiguration) —
    * survivors' weights are rescaled by n/cap so aggregates stay
    * unbiased. `activeLowerBound` > 1 drops entities with fewer samples
    * from training entirely (numActiveDataPointsLowerBound); their rows
    * still receive scores (0 or the prior model) — the reference's
    * active/passive split, where passive rows are scored but never
    * trained on (RandomEffectDataset.scala:35-53).
    *
    * The cap DEFAULTS on at 10⁶ (the reference defaults to unbounded,
    * but an unbounded `it.toArray` on one hot entity is the classic
    * skew OOM at 100 TB — a forgotten knob shouldn't be fatal). Set
    * activeCap = 0 to opt out explicitly. Groups under the cap are
    * untouched (weight_scale = 1), so results only change for entities
    * that would have been the problem. */
  case class RandomSpec(id: String, reIdCol: String, featuresCol: String,
                        featureDim: Int, cfg: GlmConfig,
                        activeCap: Int = 1000000, activeLowerBound: Int = 0,
                        pearsonK: Int = 0, subspace: Boolean = true)
    extends CoordinateSpec

  sealed trait TrainedCoordinate {
    def score(data: DataFrame): DataFrame // (uid, score)
  }
  case class TrainedFixed(spec: FixedSpec, model: GlmModel)
    extends TrainedCoordinate {
    def score(data: DataFrame): DataFrame =
      Glm.score(data, model, spec.featuresCol).select(col("uid"),
        col("score"))
  }
  case class TrainedRandom(spec: RandomSpec,
                           models: DataFrame /* reId, coef, intercept */)
    extends TrainedCoordinate {
    def score(data: DataFrame): DataFrame = {
      val spark = data.sparkSession
      import spark.implicits._
      val ds = models.as[RandomEffect.ReModel]
      RandomEffect.score(data, ds, spec.reIdCol, spec.featuresCol)
        .select(col("uid"), col("score"))
    }
  }

  case class GameModel(coordinates: Map[String, TrainedCoordinate]) {
    /** Total score = Σ coordinate scores (full-outer, missing=0). */
    def score(data: DataFrame): DataFrame =
      coordinates.values.map(_.score(data))
        .reduce(ScoreAlgebra.add(_, _, "uid"))
  }

  /** `data` columns: uid (long), label, weight, offset, one VectorUDT
    * column per feature shard, one string column per random-effect id.
    *
    * `initial` seeds the trained-coordinate map (incremental/partial
    * retraining, GameEstimator.scala:777-798): random-effect coordinates
    * warm-start per entity from the seeded models (entities absent from
    * the new data keep them), and fixed coordinates are re-trained from
    * the residual as usual. */
  def train(data: DataFrame, coords: Seq[CoordinateSpec],
            nIterations: Int = 2,
            initial: Option[GameModel] = None,
            lockedCoordinates: Set[String] = Set.empty): GameModel = {
    val spark = data.sparkSession
    import spark.implicits._
    require(lockedCoordinates.forall(id =>
      initial.exists(_.coordinates.contains(id))),
      "locked coordinates must exist in the initial model")
    val cached = data.persist(StorageLevel.MEMORY_AND_DISK)

    // Score frames are tracked as Option[DataFrame] with None = all-zero.
    // The first pass over each coordinate then skips the residual
    // subtract / offset-attach / score-add joins entirely (they would be
    // joins against a literal-zero column) — on a 2-coordinate GAME run
    // this removes three full-data shuffles from the first iteration.
    var scores: Map[String, Option[DataFrame]] =
      coords.map(c => c.id -> (None: Option[DataFrame])).toMap
    var summed: Option[DataFrame] = None
    var trained: Map[String, TrainedCoordinate] =
      initial.map(_.coordinates).getOrElse(Map.empty)

    def materialize(df: DataFrame): DataFrame = {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count() // checkpoint-by-materialize: plans must not grow per round
      p
    }
    def release(df: DataFrame, keep: DataFrame*): Unit =
      if (!keep.exists(_ eq df)) df.unpersist(false)

    // L16 partial retrain (reference CoordinateDescent.scala:280-300):
    // locked coordinates keep their initial model; their scores are fixed
    // residual contributions computed once, never re-trained.
    lockedCoordinates.foreach { id =>
      val lockedScore = trained(id).score(cached)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val newSummed = summed match {
        case None => materialize(lockedScore)
        case Some(s) =>
          val ns = materialize(ScoreAlgebra.add(s, lockedScore, "uid"))
          release(s, lockedScore); ns
      }
      summed = Some(newSummed)
      scores += id -> Some(lockedScore)
    }
    val retrained = coords.filterNot(c => lockedCoordinates.contains(c.id))

    for (iter <- 0 until nIterations; spec <- retrained) {
      // residual scores of all OTHER coordinates (X15: subtract own)
      val residual: Option[DataFrame] = (summed, scores(spec.id)) match {
        case (None, _) => None // nothing scored yet
        case (Some(s), None) => Some(s) // own score still zero
        case (Some(s), Some(own)) if s eq own =>
          None // single-coordinate case: summed IS the own score
        case (Some(s), Some(own)) =>
          Some(materialize(ScoreAlgebra.subtract(s, own, "uid")))
      }
      val withResidual = residual match {
        case None => cached
        case Some(r) => ScoreAlgebra.addToOffsets(cached, r, "uid")
      }

      val coordinate: TrainedCoordinate = spec match {
        case f: FixedSpec =>
          // L8 runWithSampling: down-sample the fit's rows only — the
          // rescore below still runs over the full `cached` data
          val trainRows =
            if (f.downSamplingRate > 0 && f.downSamplingRate < 1)
              f.cfg.loss match {
                case LogisticLoss | SmoothedHingeLoss =>
                  graft.operators.DownSampling.binaryClass(withResidual,
                    Seq("uid"), col("label") > 0.5, f.downSamplingRate)
                case _ =>
                  graft.operators.DownSampling.uniform(withResidual,
                    Seq("uid"), f.downSamplingRate)
                    .withColumn("weight",
                      col("weight") / f.downSamplingRate)
              }
            else withResidual
          val ds = trainRows.select(col("label"),
            col(f.featuresCol).as("features"), col("offset"),
            col("weight")).as[LabeledPoint]
          TrainedFixed(f, Glm.train(ds, f.featureDim, f.cfg, f.solver))
        case r: RandomSpec =>
          // active/passive split: cap per-entity training rows (weight-
          // rescaled reservoir) and drop under-populated entities. Rows
          // excluded here are "passive": they are still scored below —
          // coordinate.score runs over the full `cached` data.
          val capped =
            if (r.activeCap > 0)
              graft.operators.GroupedSampling
                .boundedSample(withResidual, Seq(r.reIdCol), Seq("uid"),
                  r.activeCap, warnOnTrim = true)
                .withColumn("weight", col("weight") * col("weight_scale"))
                .drop("weight_scale")
            else withResidual
          val active =
            if (r.activeLowerBound > 1)
              capped.join(
                withResidual.groupBy(col(r.reIdCol))
                  .agg(count(lit(1)).as("_gn"))
                  .filter(col("_gn") >= r.activeLowerBound)
                  .select(col(r.reIdCol)),
                Seq(r.reIdCol), "left_semi")
            else capped
          val ds = active.select(
            col(r.reIdCol).cast("string").as("reId"), col("label"),
            col(r.featuresCol).as("features"), col("offset"), col("weight"))
            .as[RandomEffect.ReSample]
          val priors = trained.get(r.id).map(_
            .asInstanceOf[TrainedRandom].models.as[RandomEffect.ReModel])
          TrainedRandom(r,
            RandomEffect.train(ds, r.featureDim, r.cfg, priors,
              r.pearsonK, r.subspace).toDF())
      }
      trained += spec.id -> coordinate

      val newScore = coordinate.score(cached)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val newSummed = residual match {
        case None => materialize(newScore)
        case Some(r) =>
          val ns = materialize(ScoreAlgebra.add(r, newScore, "uid"))
          release(r, newScore); ns
      }
      // release the previous round's frames (guarding shared references:
      // residual may BE the old summed, newSummed may BE newScore)
      summed.foreach(s => release(s, newSummed, newScore))
      scores(spec.id).foreach(o => release(o, newSummed, newScore))
      summed = Some(newSummed)
      scores += spec.id -> Some(newScore)
    }
    cached.unpersist(false)
    GameModel(trained)
  }
}
