package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinPackingSpec extends SparkSpec {
  import spark.implicits._

  test("assign packs heaviest entities into least-loaded bins") {
    val counts = Seq("a" -> 100L, "b" -> 90L, "c" -> 80L, "d" -> 70L,
      "e" -> 10L, "f" -> 5L)
    val m = BinPacking.assign(counts, 4)
    // the four heavy entities take four distinct bins
    assert(Seq("a", "b", "c", "d").map(m).toSet.size == 4)
    // the small ones land on the lightest bins (d=70 then e→d's bin
    // would exceed c's... the invariant worth asserting is balance)
    val loads = counts.groupBy(p => m(p._1)).view
      .mapValues(_.map(_._2).sum).toMap
    assert(loads.values.max <= 100L, s"unbalanced: $loads")
    // deterministic
    assert(BinPacking.assign(counts, 4) == m)
  }

  test("packByEntity co-locates entities and balances hot keys") {
    // 4 hot entities (300 rows each) + a 200-entity tail; a plain hash
    // could collide two hot entities in one partition, the packer must
    // never
    val hot = (0 until 4).flatMap(h =>
      (0 until 300).map(i => (s"hot$h", h * 1000L + i)))
    val tail = (0 until 1000).map(i => (s"t${i % 200}", 10000L + i))
    val df = (hot ++ tail).toDF("entity", "v").repartition(8)
    val out = BinPacking.packByEntity(df, "entity", 4)
    assert(out.rdd.getNumPartitions == 4)
    // co-location: every entity's rows live in exactly one partition
    val spread = out.select(col("entity"))
      .withColumn("_pid", spark_partition_id())
      .groupBy("entity").agg(countDistinct(col("_pid")).as("np"))
      .filter(col("np") > 1).count()
    assert(spread == 0L)
    // hot entities occupy four distinct partitions
    val hotParts = out.filter(col("entity").startsWith("hot"))
      .select(col("entity"), spark_partition_id().as("p"))
      .distinct().collect().map(_.getInt(1)).toSet
    assert(hotParts.size == 4, s"hot entities collided: $hotParts")
    // rows survive the round trip intact
    assert(out.count() == df.count())
    assert(out.agg(sum(col("v"))).first().getLong(0) ==
      df.agg(sum(col("v"))).first().getLong(0))
  }
}
