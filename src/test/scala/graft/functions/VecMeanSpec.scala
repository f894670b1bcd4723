package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecMeanSpec extends SparkSpec {
  import spark.implicits._

  test("element-wise mean is exact and partitioning-independent") {
    // 300 vectors across 3 groups; values chosen binary-exact (i/4.0) so
    // the mean is order-independent and can be compared exactly
    val rows = (0 until 300).map { i =>
      (s"g${i % 3}", Seq((i % 8) / 4.0, (i % 16) / 4.0, 1.0))
    }
    val vm = udaf(VecMean(3))
    def run(parts: Int) = rows.toDF("g", "v").repartition(parts)
      .groupBy($"g").agg(vm($"v").as("m"))
      .as[(String, Seq[Double])].collect().toMap
    val expected = rows.groupBy(_._1).view.mapValues { vs =>
      val n = vs.size.toDouble
      Seq(0, 1, 2).map(j => vs.map(_._2(j)).sum / n)
    }.toMap
    val one = run(1)
    assert(one == expected)
    assert(run(13) == one, "partition layout must not change the mean")
  }

  test("map-side partial aggregation: the plan carries partial_vecmean") {
    val vm = udaf(VecMean(2))
    val plan = Seq(("a", Seq(1.0, 2.0))).toDF("g", "v")
      .groupBy($"g").agg(vm($"v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), s"expected partial aggregation:\n$plan")
  }

  test("dimension mismatch fails loudly") {
    val vm = udaf(VecMean(3))
    val e = intercept[Exception] {
      Seq(("a", Seq(1.0, 2.0))).toDF("g", "v")
        .groupBy($"g").agg(vm($"v")).collect()
    }
    assert(e.getMessage != null)
  }
}
