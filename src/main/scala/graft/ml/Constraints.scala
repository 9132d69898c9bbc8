package graft.ml

/** Box constraints on coefficients (the reference's legacy constrained
  * training path: GLMSuite.createConstraintFeatureMap:207-293 parses a
  * JSON list of {name, term, lowerBound, upperBound} with wildcard
  * support; LBFGSB.scala:39-92 enforces them).
  *
  * [[boundsFor]] renders the constraint list against a featureKey→index
  * map into dense (lower, upper) arrays; [[Glm.train]] routes to the
  * LBFGSB solver whenever bounds are present.
  */
object Constraints {

  val Wildcard = "*"

  case class Constraint(name: String, term: String,
                        lower: Double = Double.NegativeInfinity,
                        upper: Double = Double.PositiveInfinity) {
    require(lower < upper, s"lower $lower must be < upper $upper")
    require(!lower.isNegInfinity || !upper.isPosInfinity,
      s"constraint on $name/$term bounds nothing")
  }

  /** Parse the legacy JSON constraint string:
    * [{"name":"f","term":"t","lowerBound":0,"upperBound":1}, ...]. */
  def parse(json: String): Seq[Constraint] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    JsonMethods.parse(json) match {
      case JArray(entries) => entries.map { e =>
        Constraint(
          (e \ "name").extract[String],
          (e \ "term").extract[String],
          (e \ "lowerBound").extractOpt[Double]
            .getOrElse(Double.NegativeInfinity),
          (e \ "upperBound").extractOpt[Double]
            .getOrElse(Double.PositiveInfinity))
      }
      case other => throw new IllegalArgumentException(
        s"constraint string must be a JSON array, got $other")
    }
  }

  /** Dense (lower, upper) arrays of length coefDim. Wildcard name+term
    * applies to every feature; wildcard term to every term of a name;
    * conflicts (two constraints hitting one feature) are an error, as in
    * the reference. The intercept slot is always unconstrained. */
  def boundsFor(constraints: Seq[Constraint],
                keyToIndex: Map[String, Int], featureDim: Int,
                fitIntercept: Boolean,
                sep: String = graft.sources.FeatureVectorizer.Sep)
  : (Array[Double], Array[Double]) = {
    val dim = featureDim + (if (fitIntercept) 1 else 0)
    val lower = Array.fill(dim)(Double.NegativeInfinity)
    val upper = Array.fill(dim)(Double.PositiveInfinity)
    val seen = scala.collection.mutable.Set.empty[Int]
    def put(i: Int, c: Constraint): Unit = {
      require(seen.add(i), s"conflicting constraints for feature index $i")
      lower(i) = c.lower; upper(i) = c.upper
    }
    constraints.foreach { c =>
      (c.name, c.term) match {
        case (Wildcard, Wildcard) =>
          require(constraints.size == 1,
            "wildcard-all must be the only constraint")
          keyToIndex.values.foreach(i => put(i, c))
        case (Wildcard, _) => throw new IllegalArgumentException(
          "wildcard name with concrete term is unsupported")
        case (n, Wildcard) =>
          keyToIndex.filter(_._1.startsWith(n + sep))
            .values.foreach(i => put(i, c))
        case (n, t) =>
          keyToIndex.get(n + sep + t).foreach(i => put(i, c))
      }
    }
    (lower, upper)
  }
}
