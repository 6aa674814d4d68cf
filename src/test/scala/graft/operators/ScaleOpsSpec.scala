package graft.operators

import graft.tables.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale techniques behave as claimed: salting preserves join results;
  * bucketing deletes the join exchange. */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.session

  val d = "/root/testdata/sf0.001"

  test("salted join ≡ plain join, with salts actually spreading") {
    val li = Tables.lineitem(spark, d)
    val sup = Tables.supplier(spark, d)
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy("s_suppkey").agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("s"))
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(
        li, sup.withColumnRenamed("s_suppkey", "l_suppkey"), "l_suppkey",
        saltSource = Seq("l_orderkey", "l_linenumber"), numSalts = 8)
      .withColumnRenamed("l_suppkey", "s_suppkey")
      .groupBy("s_suppkey").agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("s"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("keySkew surfaces the dominant keys") {
    val skew = SkewJoin.keySkew(Tables.lineitem(spark, d), "l_suppkey", topN = 3)
      .collect()
    assert(skew.length == 3)
    assert(skew.map(_.getAs[Double]("share")).sum > 0)
  }

  test("AQE OptimizeSkewedJoin actually splits a planted hot key") {
    // SCALE.md calls AQE "the runtime safety net" for skew; this pins
    // that claim to an executed plan. One key carries 50k of 60k left
    // rows; with fixture-scale thresholds lowered to match the data
    // volume (the 100 TB defaults are 256MB/64MB), the skewed partition
    // must split into multiple reducer tasks — visible as skew=true on
    // the join and a skewed AQEShuffleRead.
    //
    // Scope of the MANUAL salt (q36 / SkewJoin.saltedJoin) after this:
    // AQE splits a skewed SORT-MERGE join's partition only when the
    // other side's matching partition can be replicated — it does NOT
    // help a skewed aggregation, a broadcast-ineligible join where BOTH
    // sides skew on the same key, or a stateful streaming join. Those
    // are the cases the explicit salt still owns.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 60000).select(
        when(col("id") < 50000, lit(1L)).otherwise(col("id") - 49000).as("k"),
        col("id").as("payload"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        (col("id") * 2).as("rv"))
      val j = left.join(right, "k")
      // collect() (not count()) so THIS queryExecution finalizes its
      // adaptive plan — count() spawns a separate execution
      assert(j.collect().length == 50000 + 1000) // correctness first: 50k hot + 1k tail
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"OptimizeSkewedJoin must mark the join skewed:\n$p")
      assert(p.contains("AQEShuffleRead") && p.contains("skewed"),
        s"the hot partition must be read as split skewed slices:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE coalesces a small shuffle output below the configured partition count") {
    // the third AQE property SCALE.md leans on (skew-split and the
    // runtime bloom are pinned above): a shuffle sized for the cluster
    // (32 partitions here, thousands at 100 TB) whose OUTPUT is small
    // must coalesce to few reducer tasks at runtime, so |groups|-scale
    // aggregations never pay thousands of near-empty task launches.
    val confs = Seq(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64MB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val agg = Tables.lineitem(spark, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
      assert(agg.collect().length > 0) // finalize THIS adaptive plan
      val p = agg.queryExecution.executedPlan.toString
      assert(p.contains("AQEShuffleRead") && p.contains("coalesced"),
        s"the tiny aggregate shuffle must read coalesced:\n$p")
      // AQEShuffleRead nodes live INSIDE the adaptive plan's query
      // stages, which are TreeNode LEAVES — descend through both
      // AdaptiveSparkPlanExec.executedPlan and QueryStageExec.plan
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
      def reads(p: SparkPlan): Seq[Int] = p.collect {
        case r: AQEShuffleReadExec => Seq(r.partitionSpecs.length)
        case a: AdaptiveSparkPlanExec => reads(a.executedPlan)
        case q: QueryStageExec => reads(q.plan)
      }.flatten
      val parts = reads(agg.queryExecution.executedPlan)
      val configured = spark.conf.get("spark.sql.shuffle.partitions").toInt
      assert(parts.nonEmpty && parts.min < configured,
        s"expected < $configured post-shuffle partitions, got $parts")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("Spark's runtime bloom filter injects a might_contain probe on the fact scan side") {
    // t26 builds its decontamination bloom BY HAND (bloom_agg /
    // bloom_contains) because the filter must persist across queries;
    // for a single join Spark 4's InjectRuntimeFilter does the same
    // semi-join reduction automatically: a selective dim-side filter
    // grows a bloom that prunes the fact side BEFORE its shuffle. At
    // 100 TB defaults (creation side <10MB, application side >10GB)
    // this fires exactly on the dim⋈fact joins SCALE.md cares about;
    // here the size thresholds scale down to the fixture.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, d)
      val o = Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("s"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"InjectRuntimeFilter must add a bloom probe to the fact side:\n$p")
      assert(p.contains("bloom_filter_agg"),
        s"the dim side must grow the bloom in a scalar subquery:\n$p")
      // correctness: the probed plan returns exactly the unprobed result
      val rows = j.collect()
      assert(rows.length == 1 && rows.head.getLong(1) > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed join plans without a shuffle exchange") {
    // the production drop (catalog entry + warehouse location — stale
    // dirs from a previous JVM break saveAsTable otherwise)
    Seq("li_b", "o_b").foreach(Bucketing.dropWithLocation(spark, _))
    Bucketing.writeBucketed(
      Tables.lineitem(spark, d).select("l_orderkey", "l_quantity"),
      "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, d).select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_b", "l_orderkey", 8)
    // disable broadcast: at fixture scale the dim side broadcasts, which
    // bypasses (and disables) the bucketed layout we're demonstrating —
    // at 100 TB neither fact side is broadcastable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey")
      joined.count() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, d).count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
