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
  * ([[graft.operators.ScoreAlgebra]]), each eagerly checkpointed and
  * released per round (X13) so neither the cached data NOR the logical
  * plan grows across iterations.
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

    // Row-count-keyed execution profile for the descent loop
    // ([[graft.util.ExecProfile.withDerivedShuffle]]) — the same scale
    // adaptation DistributedGlmObjective applies to its iteration view
    // (≥25k rows per shuffle partition), lifted to the loop's score
    // algebra: every round materializes 2-4 uid-keyed join plans
    // (localCheckpoint), and at the session's full shuffle-partition
    // count each of those pays AQE stage-materialization jobs plus
    // near-empty task launches that dwarf the data work when the
    // training input is small relative to the configured parallelism.
    // The count() materializes the persist — a pass the first scoring
    // job would pay anyway. At production row counts (n ≥ 25k × the
    // session's shuffle partitions) the scope is a no-op: AQE stays
    // on, partitions stay the cluster's — this is input-size-derived
    // partitioning, not a local[32] tune. uid is unique per score row,
    // so the joins cannot skew; the per-entity solves stay
    // partition-count-independent (boundedSample keys its reservoir on
    // content hashes, closed-form/mapGroups solves are per-group
    // arithmetic). codegenOff: the loop materializes ~3 DISTINCT
    // one-shot join plans per coordinate pass — compiling each beats
    // interpreting the rows only above the same 25k-rows/partition
    // line, so the flag rides the scope (measured: 25 materializations
    // 9.3 s compiled vs 4.0 s interpreted at sf0.1; production inputs
    // never activate the scope and keep codegen). The scope mutates
    // session confs (restored on exit), so train() must not run
    // concurrently with other queries on the same session — see
    // ExecProfile's contract.
    val nRows = cached.count()
    graft.util.ExecProfile.withDerivedShuffle(spark, nRows, 25000L,
      codegenOff = true) {

    // Score frames are tracked as Option[DataFrame] with None = all-zero.
    // The first pass over each coordinate then skips the residual
    // subtract / offset-attach / score-add joins entirely (they would be
    // joins against a literal-zero column) — on a 2-coordinate GAME run
    // this removes three full-data shuffles from the first iteration.
    var scores: Map[String, Option[DataFrame]] =
      coords.map(c => c.id -> (None: Option[DataFrame])).toMap
    var summed: Option[DataFrame] = None
    // `summed` is kept LAZY when it is a fresh `residual + newScore`
    // add: its ONLY per-round consumer is the next pass's residual
    // subtract, which materializes anyway — materializing the add too
    // was one extra localCheckpoint (a distinct one-shot plan compile +
    // job) per coordinate pass that bought nothing. When summed is
    // lazy, these are the checkpointed frames its plan reads (released
    // checkpoints cannot recompute, so they stay live until the lazy
    // summed has been consumed); empty when summed is materialized or
    // an alias.
    var summedDeps: Seq[DataFrame] = Nil
    var trained: Map[String, TrainedCoordinate] =
      initial.map(_.coordinates).getOrElse(Map.empty)
    // frames owned by the CALLER (released data would be unrecoverable —
    // checkpointed frames cannot recompute): never freed here
    val callerFrames: Seq[DataFrame] = trained.values.toSeq.collect {
      case TrainedRandom(_, m) => m
    }

    // Eager localCheckpoint, not persist+count: persist caches DATA but
    // leaves the logical plan intact, so each round's plan nests every
    // prior round's (models read priors read models…) — the explain
    // string AQE renders per job grows exponentially with rounds and
    // eventually OOMs the driver, and the optimizer re-walks the whole
    // history each pass. Checkpointing cuts the lineage to a LogicalRDD:
    // plans stay round-sized no matter how many iterations run.
    def materialize(df: DataFrame): DataFrame = df.localCheckpoint(true)
    def release(df: DataFrame, keep: DataFrame*): Unit =
      if (!keep.exists(_ eq df)) df.queryExecution.logical match {
        // a checkpointed frame's blocks belong to its backing RDD, not
        // the cache manager — unpersist the RDD to free them eagerly
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(false)
        case _ => df.unpersist(false)
      }

    // L16 partial retrain (reference CoordinateDescent.scala:280-300):
    // locked coordinates keep their initial model; their scores are fixed
    // residual contributions computed once, never re-trained.
    lockedCoordinates.foreach { id =>
      val lockedScore = materialize(trained(id).score(cached))
      val newSummed = summed match {
        case None => lockedScore
        case Some(s) => materialize(ScoreAlgebra.add(s, lockedScore, "uid"))
      }
      val oldSummed = summed
      summed = Some(newSummed)
      scores += id -> Some(lockedScore)
      // a released checkpoint is gone for good — free only what no live
      // reference (current summed, any coordinate's score) still reads
      val live = summed.toSeq ++ scores.values.flatten ++ callerFrames
      oldSummed.foreach(s => release(s, live: _*))
    }
    val retrained = coords.filterNot(c => lockedCoordinates.contains(c.id))

    for (iter <- 0 until nIterations; spec <- retrained) {
      // residual scores of all OTHER coordinates (X15: subtract own)
      val residual: Option[DataFrame] = (summed, scores(spec.id)) match {
        case (None, _) => None // nothing scored yet
        case (Some(s), None) =>
          // own score still zero: the residual IS the summed frame —
          // but it feeds BOTH the training input and the next summed,
          // so a lazy add materializes here (one job, two joins)
          Some(if (summedDeps.isEmpty) s else materialize(s))
        case (Some(s), Some(own)) if s eq own =>
          None // single-coordinate case: summed IS the own score
        case (Some(s), Some(own)) =>
          // a lazy summed collapses into this subtract: one
          // materialization executes add + subtract together
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
                  r.activeCap, warnOnTrim = true,
                  keepGroupSize = r.activeLowerBound > 1)
                .withColumn("weight", col("weight") * col("weight_scale"))
                .drop("weight_scale")
            else withResidual
          val active =
            if (r.activeLowerBound > 1 && r.activeCap > 0)
              // boundedSample already carries the pre-cap group count —
              // no second aggregate + semi-join over the residual frame
              capped.filter(col("group_size") >= r.activeLowerBound)
                .drop("group_size")
            else if (r.activeLowerBound > 1)
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
          // checkpoint the per-entity models: they are read again as next
          // round's priors, by every score join, and by the caller after
          // training — without it each of those actions replays the
          // ENTIRE training lineage (residual joins included) from frames
          // this loop has already released, and the nested prior lineage
          // is exactly the per-round plan growth materialize() exists to
          // stop. Model-sized, stays live in the returned GameModel.
          TrainedRandom(r,
            materialize(RandomEffect.train(ds, r.featureDim, r.cfg, priors,
              r.pearsonK, r.subspace).toDF()))
      }
      val replaced = trained.get(spec.id)
      trained += spec.id -> coordinate

      val newScore = materialize(coordinate.score(cached))
      // newSummed stays LAZY over its two checkpointed inputs (see
      // summedDeps above) — the next pass's residual materializes it
      val newSummed = residual match {
        case None => newScore
        case Some(r) => ScoreAlgebra.add(r, newScore, "uid")
      }
      val oldSummed = summed
      val oldDeps = summedDeps
      val oldOwn = scores(spec.id)
      summed = Some(newSummed)
      summedDeps = residual match {
        case None => Nil // summed IS the materialized newScore
        case Some(r) => Seq(r, newScore)
      }
      scores += spec.id -> Some(newScore)
      // a released checkpoint is gone for good (no lineage to recompute
      // from), so free a frame only when nothing live still reads it —
      // aliases abound: the first round's summed IS that coordinate's
      // score, a fresh residual IS the old summed when the own score was
      // zero, the replaced models may belong to the caller's `initial`,
      // and the lazy summed's inputs live through summedDeps
      val live = summedDeps ++ scores.values.flatten ++ callerFrames ++
        trained.values.collect { case TrainedRandom(_, m) => m }
      residual.foreach(r => release(r, live: _*))
      oldSummed.foreach(s => release(s, live: _*))
      oldDeps.foreach(d => release(d, live: _*))
      oldOwn.foreach(o => release(o, live: _*))
      replaced.collect { case TrainedRandom(_, old) =>
        release(old, live: _*) }
    }
    cached.unpersist(false)
    // score frames are training intermediates — data-sized, so drop them
    // before returning (scoring a GameModel recomputes from the
    // model-sized coordinate frames, which stay live)
    val keep = callerFrames ++
      trained.values.collect { case TrainedRandom(_, m) => m }
    summed.foreach(s => release(s, keep: _*))
    summedDeps.foreach(d => release(d, keep: _*))
    scores.values.flatten.foreach(o => release(o, keep: _*))
    GameModel(trained)
    }
  }
}
