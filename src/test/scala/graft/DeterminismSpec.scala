package graft

/** Mechanical check of the repo's core determinism discipline: EVERY
  * registered query must return identical rows (values AND order) when
  * the shuffle width — and with it partition count, partition order, and
  * AQE's coalescing decisions — changes. Order-dependent double folds,
  * partition-order-sensitive aggregates, or nondeterministic tie-breaks
  * show up here as value/order diffs long before they flip a DuckDB hash
  * at a bigger SF. (Individual specs spot-check this for a few queries;
  * this sweep closes the gap for the rest of the registry.)
  *
  * Memoized constructs (the pagerank/triangle graph checkpoint, LSH band
  * indexes, bloom masks, k-means centroids) are deliberately NOT evicted
  * between the two runs: the memo contract is that a cached working set
  * serves any downstream partitioning, which this sweep then exercises.
  */
class DeterminismSpec extends SparkSpec {

  test("every registered query is stable under a different shuffle width") {
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    val diffs = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val fn = SparkEntry.queries(name)
      conf.set("spark.sql.shuffle.partitions", orig)
      val wide = fn(spark, sfDir).collect().map(_.toSeq).toVector
      conf.set("spark.sql.shuffle.partitions", "7")
      try {
        val narrow = fn(spark, sfDir).collect().map(_.toSeq).toVector
        if (wide == narrow) None
        else {
          val i = wide.zip(narrow).indexWhere { case (a, b) => a != b }
          val where = if (i >= 0) s"first diff at row $i"
                      else "rows differ only past the shared prefix"
          Some(s"$name: ${wide.length} vs ${narrow.length} rows, $where")
        }
      } finally conf.set("spark.sql.shuffle.partitions", orig)
    }
    assert(diffs.isEmpty, diffs.mkString("; "))
  }

  test("no registered query plans a cartesian product") {
    // scale guard: every deliberate cross join in the repo broadcasts a
    // scalar/k-row aggregate (BroadcastNestedLoopJoin with a tiny build
    // side — fine at any corpus size). A CartesianProductExec means a
    // join lost its equi-keys or its broadcast hint and would explode at
    // 100 TB; catch that in the PLAN, years before a timeout would.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.sparkPlan.treeString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian product planned by: ${offenders.mkString(", ")}")
  }
}
