package graft.ml

import org.apache.spark.ml.linalg.{Vector, Vectors}

/** Per-entity feature selection by absolute Pearson correlation with the
  * label (reference LocalDataset.filterFeaturesByPearsonCorrelationScore,
  * photon-api/.../data/LocalDataset.scala:103-129): random-effect
  * problems with tiny sample counts keep only their k most label-
  * correlated features. Runs inside the per-entity executor closure —
  * the samples are already local, so this is plain array math.
  *
  * Selection is expressed as "coefficients of unselected features are
  * forced to zero": training happens in the projected k-dim space and
  * the solution scatters back to full dimension, which keeps scoring
  * oblivious to selection (the reference's projector achieves the same).
  */
object FeatureSelection {

  /** Indices of the k features with the largest |Pearson ρ(x_j, y)|;
    * constant features score 0 (guarded denominators), ties resolve to
    * the lower index (deterministic). k ≥ d → all indices. */
  def topPearsonIndices(samples: Array[LabeledPoint], featureDim: Int,
                        k: Int): Array[Int] = {
    if (k >= featureDim) return Array.range(0, featureDim)
    val n = samples.length.toDouble
    val sx = new Array[Double](featureDim)
    val sxx = new Array[Double](featureDim)
    val sxy = new Array[Double](featureDim)
    var sy = 0.0
    var syy = 0.0
    samples.foreach { p =>
      val y = p.label
      sy += y; syy += y * y
      p.features.foreachActive { (j, x) =>
        sx(j) += x; sxx(j) += x * x; sxy(j) += x * y
      }
    }
    val varY = syy / n - (sy / n) * (sy / n)
    val scores = Array.tabulate(featureDim) { j =>
      val varX = sxx(j) / n - (sx(j) / n) * (sx(j) / n)
      val cov = sxy(j) / n - (sx(j) / n) * (sy / n)
      if (varX <= 1e-12 || varY <= 1e-12) 0.0
      else math.abs(cov / math.sqrt(varX * varY))
    }
    scores.zipWithIndex.sortBy { case (s, j) => (-s, j) }
      .take(k).map(_._2).sorted
  }

  /** Sorted union of the group's active feature indices (A8/U5, the
    * reference's projector index-set union — RandomEffectDataset
    * .generateLinearSubspaceProjectors:423-426, computed there as a
    * foldByKey set union; here the group is already local so it is one
    * bitset pass). The subspace a per-entity solve actually lives in. */
  def activeIndices(samples: Array[LabeledPoint],
                    featureDim: Int): Array[Int] = {
    val seen = new java.util.BitSet(featureDim)
    samples.foreach(_.features.foreachActive { (j, x) =>
      if (x != 0.0) seen.set(j)
    })
    val out = new Array[Int](seen.cardinality())
    var j = seen.nextSetBit(0)
    var i = 0
    while (j >= 0) { out(i) = j; i += 1; j = seen.nextSetBit(j + 1) }
    out
  }

  /** Restrict a full-dimension coefficient array to the selected indices
    * (the forward map for warm starts entering a projected solve). */
  def gather(full: Array[Double], indices: Array[Int]): Array[Double] = {
    val out = new Array[Double](indices.length)
    var i = 0
    while (i < indices.length) { out(i) = full(indices(i)); i += 1 }
    out
  }

  /** Project a vector onto the selected indices (k-dim dense result). */
  def project(v: Vector, indices: Array[Int]): Vector = {
    val out = new Array[Double](indices.length)
    var i = 0
    while (i < indices.length) { out(i) = v(indices(i)); i += 1 }
    Vectors.dense(out)
  }

  /** Scatter a k-dim solution back to full dimension (zeros elsewhere). */
  def scatter(coef: Array[Double], indices: Array[Int],
              featureDim: Int): Array[Double] = {
    val out = new Array[Double](featureDim)
    var i = 0
    while (i < indices.length) { out(indices(i)) = coef(i); i += 1 }
    out
  }
}
