package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs the named queries (default all) against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Failures are REPORTED in
  * an "errors" object (and the query's wall time excluded from the
  * total) — a broken query must never masquerade as a fast one. Unknown
  * query names fail fast. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown query names: ${unknown.mkString(", ")} — known: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Stages whose generated method exceeds HotSpot's 8000-byte JIT
      // threshold would run as INTERPRETED bytecode (measured 4x slower
      // on the deep transformer projection chains); at this limit Spark
      // falls back to per-operator codegen, which JITs fine.
      .config("spark.sql.codegen.hugeMethodLimit", 8000)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    // Uncounted warmup: JVM/codegen/LAPACK/parquet-footer first-touch costs
    // are one-time process costs, not query costs — on a long-lived cluster
    // they amortize to zero. Run the flagship entry (scan+window+join) and
    // a tiny solver call (forces netlib/BLAS classloading, the single
    // largest first-touch: ~6s) so every timed query below is steady-state.
    try {
      import org.apache.spark.sql.functions._
      SparkEntry.entry(spark).count()
      // 40k rows: enough loop iterations that C2 compiles the solver's
      // collect/gaussianize/solve loops during warmup, not during the
      // first timed solver query
      val warm = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(40000)
        .select(monotonically_increasing_id().as("rid"),
          col("l_extendedprice"), col("l_quantity"), col("l_discount"),
          lit("w").as("era"))
      // two feature widths: the k=1 scalar path and the k>1 Gram path
      // compile different flatMapGroups closures
      graft.solvers.FeatureNeutralizer(Seq("l_extendedprice"),
        Seq("l_quantity"), Seq(0.5), "era", "rid").outputsOnly(warm).count()
      graft.solvers.FeatureNeutralizer(Seq("l_extendedprice"),
        Seq("l_quantity", "l_discount"), Seq(0.5), "era", "rid")
        .outputsOnly(warm).count()
      // documents path: explode/md5/window + aggregate codegen shapes
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("tok"))
        .select(col("doc_id"), md5(col("tok")).as("m"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .select(sum(col("n"))).collect()
      spark.read.parquet(s"$sfDir/events.parquet").limit(64)
        .select(sum(col("value"))).collect()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    var errors = Map.empty[String, String]
    // Full-materialization timing via the noop sink: a count() action
    // lets the optimizer PRUNE unused projection columns, so map-side
    // queries (scoring, gaussianize, per-doc stats) measured 2-5× faster
    // than they run — the noop write evaluates every output column
    // without sink overhead (the standard Spark benchmarking sink).
    //
    // Suite-position noise: a single sequential pass over ~70 queries
    // accumulates GC / codegen-cache pressure in the long-lived JVM, so
    // late queries measure up to 4-5× their isolated cost. Countermeasures:
    // (a) release leftover cached relations + solver caches and hint a GC
    // between queries (untimed), (b) run TWO passes in different seeded
    // shuffle orders and keep the per-query MINIMUM — position-dependent
    // inflation never survives both orders.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val names = selected.keys.toSeq.sorted
    val rnd = new scala.util.Random(20260812L)
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (pass <- 1 to passes; name <- rnd.shuffle(names)
         if !errors.contains(name)) {
      spark.catalog.clearCache()
      graft.operators.GraftTransformer.unpersistAll()
      if (pass > 1 || passes == 1) System.gc()
      val t0 = System.nanoTime()
      try {
        selected(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      } catch {
        case e: Throwable =>
          best -= name
          errors += name -> (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).replaceAll("[\"\\\\\\n\\r\\t]", " ")
              .take(200))
      }
    }
    val ok = names.filterNot(errors.contains).map(n => n -> best(n))
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
