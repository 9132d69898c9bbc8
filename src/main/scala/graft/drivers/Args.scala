package graft.drivers

/** Minimal `--key value` command-line parser for the driver entry points
  * (the reference uses scopt — photon-client/.../ScoptGameTrainingParametersParser;
  * a hand-rolled map keeps the dependency surface at zero). Flags without
  * a value are recorded as "true".
  */
final case class Args(values: Map[String, String]) {
  def opt(k: String): Option[String] = values.get(k)
  def str(k: String): String =
    values.getOrElse(k, throw new IllegalArgumentException(s"--$k required"))
  def str(k: String, default: String): String = values.getOrElse(k, default)
  def int(k: String, default: Int): Int = opt(k).map(_.toInt)
    .getOrElse(default)
  def dbl(k: String, default: Double): Double = opt(k).map(_.toDouble)
    .getOrElse(default)
  def bool(k: String): Boolean = opt(k).exists(_.toBoolean)
  def list(k: String): Seq[String] =
    opt(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
  def doubles(k: String): Seq[Double] = list(k).map(_.toDouble)
}

object Args {
  def parse(argv: Array[String]): Args = {
    val m = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < argv.length) {
      val a = argv(i)
      require(a.startsWith("--"), s"expected --key, got '$a'")
      val key = a.drop(2)
      if (i + 1 < argv.length && !argv(i + 1).startsWith("--")) {
        m(key) = argv(i + 1); i += 2
      } else { m(key) = "true"; i += 1 }
    }
    Args(m.toMap)
  }
}
