package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Exact

/** Experiment / A-B analysis over event streams: Welch's unequal-variance
  * t-test, the chi-square independence test, and a deterministic Poisson
  * bootstrap for confidence intervals.
  *
  * Scale shape: every statistic here reduces the data in ONE hash
  * aggregate to a handful of sufficient statistics per group (counts and
  * decimal-exact moment sums); the test arithmetic then runs over
  * group-sized rows. Nothing ever sorts or windows the raw data, and the
  * bootstrap's resample "draws" are a deterministic per-row hash weight —
  * no RNG state, no second pass, replicas move only (group, replicate)
  * partial sums through the shuffle.
  *
  * Determinism: moment sums go through [[Exact]] decimals so they are
  * order-independent and reproduce bit-for-bit on 1 or 1000 executors;
  * the final test statistics are fixed IEEE expressions over those exact
  * sums, so an external engine mirroring the same expression tree gets
  * the same doubles.
  */
object Experiments {

  /** Deterministic 50/50 variant assignment from a unit id — the md5
    * convention every sampler in the repo uses ([[DownSampling]]). */
  def variant(idCol: Column, salt: String = "exp"): Column =
    when(DownSampling.hashFraction(Seq(lit(salt), idCol)) < 0.5, "A")
      .otherwise("B")

  /** Welch's two-sample t-test per group: for each row of `groupCols`,
    * compare `valueCol` between variant "A" and "B" rows (any other
    * variant value is ignored). Emits counts, means, the t statistic and
    * the Welch–Satterthwaite degrees of freedom, all from one aggregate
    * over (count, Σy, Σy²) sufficient statistics. */
  def welchTTest(df: DataFrame, groupCols: Seq[String], variantCol: String,
                 valueCol: String, roundTo: Int = 6): DataFrame = {
    val y = Exact.dec(col(valueCol), 18, 6)
    def side(v: String, c: Column): Column = when(col(variantCol) === v, c)
    val g = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(side("A", lit(1))).as("n_a"),
        count(side("B", lit(1))).as("n_b"),
        sum(side("A", y)).as("_sa"),
        sum(side("B", y)).as("_sb"),
        sum(side("A", y * y)).as("_saa"),
        sum(side("B", y * y)).as("_sbb"))
    // all-double arithmetic over the exact sums, in a fixed operation
    // order the oracle mirrors textually
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val sa = col("_sa").cast("double")
    val sb = col("_sb").cast("double")
    val va = (col("_saa").cast("double") - sa * sa / na) / (na - lit(1.0))
    val vb = (col("_sbb").cast("double") - sb * sb / nb) / (nb - lit(1.0))
    val seA = va / na
    val seB = vb / nb
    val se2 = seA + seB
    val t = (sa / na - sb / nb) / sqrt(se2)
    val dfW = se2 * se2 /
      (seA * seA / (na - lit(1.0)) + seB * seB / (nb - lit(1.0)))
    def r(c: Column): Column = round(c + lit(1e-9), roundTo)
    g.select(groupCols.map(col) ++ Seq(
      col("n_a"), col("n_b"),
      r(sa / na).as("mean_a"), r(sb / nb).as("mean_b"),
      r(t).as("t_stat"), r(dfW).as("df_welch")): _*)
  }

  /** Chi-square test of independence between two categorical columns.
    * One hash aggregate collapses the data to contingency cells; margins
    * and the statistic are cell-sized arithmetic. Per-cell contributions
    * are rounded to 9 decimals and summed as decimals so the statistic is
    * independent of cell order. Returns one row:
    * (n_rows, n_cells, dof, chi2). */
  def chiSquare(df: DataFrame, factorCol: String, variantCol: String,
                roundTo: Int = 6): DataFrame = {
    // materialize the cell table once: margins, the grand total, and the
    // contribution join all read it, and without the persist each
    // consumer would re-run the DATA-sized aggregation (4 scans of the
    // input instead of 1)
    val cells = df
      .filter(col(factorCol).isNotNull && col(variantCol).isNotNull)
      .groupBy(factorCol, variantCol).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fm = cells.groupBy(factorCol).agg(sum(col("n")).as("nf"))
    val vm = cells.groupBy(variantCol).agg(sum(col("n")).as("nv"))
    val total = cells.agg(sum(col("n")).as("nn"))
    // margins and the grand total are cell-domain-sized — broadcast them
    // so the contribution pass never shuffles the cell table again
    val joined = cells.join(broadcast(fm), factorCol)
      .join(broadcast(vm), variantCol).crossJoin(broadcast(total))
    val e = col("nf").cast("double") * col("nv").cast("double") /
      col("nn").cast("double")
    val d = col("n").cast("double") - e
    // per-cell contributions rounded to 9 decimals, then a decimal-exact
    // sum: the statistic is independent of cell visit order
    joined
      .select(col("n"), col(factorCol), col(variantCol),
        round((d * d / e) + lit(1e-9), 9).cast("decimal(28,9)").as("_x"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_cells"),
        countDistinct(col(factorCol)).as("_kf"),
        countDistinct(col(variantCol)).as("_kv"),
        sum(col("_x")).as("_chi"))
      .select(col("n_rows"), col("n_cells"),
        ((col("_kf") - 1) * (col("_kv") - 1)).as("dof"),
        round(col("_chi").cast("double") + lit(1e-9), roundTo).as("chi2"))
  }

  /** CUPED variance reduction (Deng et al., WSDM'13): per-unit metric
    * means adjusted by the pre-period covariate, θ = cov(X,Y)/var(X)
    * estimated pooled. Units lacking either period are dropped (the
    * standard complete-case variant). One per-unit aggregate → one
    * moment aggregate (single row, broadcast back) → one per-variant
    * aggregate; nothing bigger than the unit domain ever shuffles.
    *
    * Determinism: per-unit means are rounded to 6 dp and re-cast to
    * decimals, so every cross-unit moment is an exact decimal sum; θ and
    * the adjusted means are fixed IEEE expressions over those moments. */
  def cuped(df: DataFrame, uidCol: String, variantCol: String,
            valueCol: String, isPre: Column, roundTo: Int = 6): DataFrame = {
    val y = Exact.dec(col(valueCol), 18, 6)
    val perUnit = df.filter(col(valueCol).isNotNull)
      .groupBy(uidCol)
      .agg(max(col(variantCol)).as("_v"),
        sum(when(isPre, y)).as("_sx"),
        count(when(isPre, lit(1))).as("_cx"),
        sum(when(!isPre, y)).as("_sy"),
        count(when(!isPre, lit(1))).as("_cy"))
      .filter(col("_cx") > 0 && col("_cy") > 0)
      .select(col("_v"),
        round(col("_sx").cast("double") / col("_cx").cast("double")
          + lit(1e-9), 6).cast("decimal(18,6)").as("_x"),
        round(col("_sy").cast("double") / col("_cy").cast("double")
          + lit(1e-9), 6).cast("decimal(18,6)").as("_y"))
      // both the pooled-moment pass and the per-variant pass read the
      // unit table; persist it so the data-sized aggregation runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mom = perUnit.agg(count(lit(1)).as("_n"),
      sum(col("_x")).as("_tx"), sum(col("_y")).as("_ty"),
      sum(col("_x") * col("_y")).as("_txy"),
      sum(col("_x") * col("_x")).as("_txx"))
    val nD = col("_n").cast("double")
    val tx = col("_tx").cast("double")
    val ty = col("_ty").cast("double")
    val theta = (nD * col("_txy").cast("double") - tx * ty) /
      (nD * col("_txx").cast("double") - tx * tx)
    val pooled = mom.select(theta.as("_theta"), (tx / nD).as("_mx"))
    def r(c: Column): Column = round(c + lit(1e-9), roundTo)
    perUnit.crossJoin(broadcast(pooled))
      .groupBy(col("_v").as("variant"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("_x")).as("_vx"), sum(col("_y")).as("_vy"),
        max(col("_theta")).as("_th"), max(col("_mx")).as("_m"))
      .select(col("variant"), col("n_units"),
        r(col("_vy").cast("double") / col("n_units").cast("double"))
          .as("mean_raw"),
        r(col("_vy").cast("double") / col("n_units").cast("double")
          - col("_th") * (col("_vx").cast("double")
            / col("n_units").cast("double") - col("_m"))).as("mean_adj"),
        r(col("_th")).as("theta"))
  }

  /** Delta-method standard error for a unit-clustered ratio metric
    * R = Σ numer / Σ denom (the correct SE when the randomization unit
    * is a user but the metric is a per-event ratio; a naive per-row SE
    * ignores within-user correlation). Var(R) ≈ (var_s − 2R·cov +
    * R²·var_n) / (m·mean_n²) from per-unit (s, n) moment sums, all
    * decimal-exact. `numer` must fit DECIMAL(18,6) per unit; `denom` is
    * an integer count expression. */
  def deltaRatio(df: DataFrame, uidCol: String, variantCol: String,
                 numer: Column, denom: Column,
                 roundTo: Int = 6): DataFrame = {
    val perUnit = df.groupBy(uidCol)
      .agg(max(col(variantCol)).as("_v"),
        coalesce(sum(numer), lit(0)).cast("decimal(18,6)").as("_s"),
        coalesce(sum(denom), lit(0L)).as("_c"))
    val cDec = col("_c").cast("decimal(12,0)")
    val g = perUnit.groupBy(col("_v").as("variant"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("_s")).as("_ts"), sum(col("_c")).as("_tc"),
        sum(col("_s") * col("_s")).as("_tss"),
        sum(col("_s") * cDec).as("_tsc"),
        sum(cDec * cDec).as("_tcc"))
    val m = col("n_units").cast("double")
    val ts = col("_ts").cast("double")
    val tc = col("_tc").cast("double")
    val ratio = ts / tc
    val varS = (col("_tss").cast("double") - ts * ts / m) / (m - lit(1.0))
    val covSC = (col("_tsc").cast("double") - ts * tc / m) / (m - lit(1.0))
    val varC = (col("_tcc").cast("double") - tc * tc / m) / (m - lit(1.0))
    val meanC = tc / m
    val varR = (varS - lit(2.0) * ratio * covSC + ratio * ratio * varC) /
      (m * meanC * meanC)
    def r(c: Column): Column = round(c + lit(1e-9), roundTo)
    g.select(col("variant"), col("n_units"),
      r(ratio).as("ratio"), r(sqrt(varR)).as("se"))
  }

  /** Poisson(1) draw count in {0..5} from a 32-bit md5 hash — the
    * deterministic bootstrap resample weight. Thresholds are the Poisson
    * CDF scaled by 2³², compared as INTEGERS so no float parsing is ever
    * involved. */
  private val poissonThresholds =
    Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L, 4279248373L)

  def poissonWeight(h: Column): Column =
    poissonThresholds.zipWithIndex.foldRight(lit(5): Column) {
      case ((t, k), other) => when(h < t, k).otherwise(other)
    }

  /** Percentile bootstrap CI for the per-group mean of `valueCol`, with
    * `replicates` deterministic Poisson resamples. Each row contributes
    * hash-weighted partial sums to every replicate; per-(group, replicate)
    * means are exact-decimal ratios, and the CI interpolates the order
    * statistics of the `replicates` means (fractions `loK`/`hiK` of the
    * way through, the p·(n−1) quantile convention).
    *
    * The replicate fan-out multiplies the shuffled ROWS by `replicates`,
    * but each shuffled row is only (group, r, w·y partial) after map-side
    * combine — group-domain-sized, not data-sized. */
  def bootstrapMeanCI(df: DataFrame, groupCols: Seq[String], uidCol: String,
                      valueCol: String, replicates: Int = 16,
                      roundTo: Int = 6): DataFrame = {
    require(replicates >= 4, "need at least 4 replicates")
    val y = Exact.dec(col(valueCol), 18, 6)
    val reps = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ col(uidCol).as("_uid") :+ y.as("_y"): _*)
      .withColumn("_r", explode(sequence(lit(0), lit(replicates - 1))))
    val h = conv(substring(md5(concat_ws("#", lit("boot"),
      col("_uid").cast("string"), col("_r").cast("string"))), 1, 8),
      16, 10).cast("long")
    val w = poissonWeight(h)
    val perRep = reps
      .select(groupCols.map(col) ++ Seq(col("_r"),
        w.cast("decimal(10,0)").as("_w"), col("_y")): _*)
      .groupBy(groupCols.map(col) :+ col("_r"): _*)
      .agg(sum(col("_w")).as("_sw"), sum(col("_w") * col("_y")).as("_swy"))
      .filter(col("_sw") > 0)
      .withColumn("_m", col("_swy").cast("double") / col("_sw").cast("double"))
    val rn = row_number().over(
      Window.partitionBy(groupCols.map(col): _*).orderBy(col("_m"), col("_r")))
    val loIdx = math.floor(0.025 * (replicates - 1)).toInt + 1
    val hiIdx = math.floor(0.975 * (replicates - 1)).toInt + 1
    val loFrac = 0.025 * (replicates - 1) - (loIdx - 1)
    val hiFrac = 0.975 * (replicates - 1) - (hiIdx - 1)
    def pick(i: Int): Column = max(when(col("_rn") === i, col("_m")))
    val ranked = perRep.withColumn("_rn", rn)
      .groupBy(groupCols.map(col): _*)
      .agg(pick(loIdx).as("_l1"), pick(loIdx + 1).as("_l2"),
        pick(hiIdx).as("_h1"), pick(hiIdx + 1).as("_h2"),
        count(lit(1)).as("n_replicates"))
    def r(c: Column): Column = round(c + lit(1e-9), roundTo)
    ranked.select(groupCols.map(col) ++ Seq(col("n_replicates"),
      r(col("_l1") + lit(loFrac) * (col("_l2") - col("_l1"))).as("ci_lo"),
      r(col("_h1") + lit(hiFrac) * (col("_h2") - col("_h1"))).as("ci_hi")): _*)
  }
}
