package graft

import org.apache.spark.sql.SparkSession

/** One-call library entry point for users switching from the reference:
  * a session with every graft extension attached (native expressions,
  * the TopKPerKey planner strategy, the HOF→native-kernel optimizer
  * rule) and the scale-sensible defaults this engine is tuned with.
  *
  * {{{
  * val spark = Graft.session()                  // new tuned session
  * Graft.attach(existingSpark)                  // or join an existing one
  * SparkEntry.queries("q1_agg")(spark, dataDir) // any operator
  * }}}
  */
object Graft {

  /** Attach graft's extension surface to an already-built session:
    * native functions into the registry, the planner strategy into
    * experimental methods, the optimizer rule into extraOptimizations.
    * Idempotent — operators also self-register what they need. */
  def attach(spark: SparkSession): SparkSession = {
    functions.GraftFunctions.register(spark)
    plans.GraftStrategies.register(spark)
    val em = spark.sessionState.experimentalMethods
    if (!em.extraOptimizations.contains(plans.NativeKernelRule))
      em.extraOptimizations = em.extraOptimizations :+ plans.NativeKernelRule
    spark
  }

  /** Build a tuned session. `shufflePartitions` should track the
    * parallelism actually available — cores locally, 2-3× total
    * executor cores (with AQE coalescing down) on a cluster. */
  def session(master: String = "local[*]",
              shufflePartitions: Int =
                Runtime.getRuntime.availableProcessors): SparkSession =
    attach(SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate())
}
