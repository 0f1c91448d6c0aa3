package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * The reference (aws-samples/dbt-glue) owns no engine — it remotes every
  * statement to a Glue-managed Spark session (reference
  * dbt/adapters/glue/gluedbapi/connection.py:219-250). Here the "session
  * protocol" collapses to an in-process SparkSession; the confs below mirror
  * the ones the reference sets per session:
  *   - crossJoin enabled (connection.py:429)
  *   - dynamic partition overwrite (tests/functional/conftest.py:46,
  *     macros/materializations/incremental/strategies.sql:14-17)
  */
object Engine {
  def builder(master: String = "local[*]", appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.crossJoin.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")

  def session(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply the per-session confs the reference sets to an externally-created
    * session (Verify/Bench create their own). Idempotent and safe on a
    * running session — only runtime-mutable confs are touched.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark
  }

  /** X2: per-model isolated session — separate SQL conf / temp views /
    * registered functions over the shared SparkContext (the reference's
    * `enable_session_per_model`, connections.py:43-84).
    */
  def newSession(spark: SparkSession): SparkSession = spark.newSession()

  /** X2: session pool keyed like the reference's GLUE_CONNECTIONS_BY_KEY
    * (connections.py:43-84 — one connection per thread / model / session
    * group): same key reuses the isolated session, new key forks one off
    * the shared SparkContext.
    */
  object SessionPool {
    private val sessions =
      new java.util.concurrent.ConcurrentHashMap[String, SparkSession]()
    def forKey(base: SparkSession, key: String): SparkSession =
      sessions.computeIfAbsent(key, _ => base.newSession())
    def close(key: String): Unit = sessions.remove(key)
    def clear(): Unit = sessions.clear()
  }

  /** X5: statement cancel (reference connection.py:283-295) — run `f` under
    * a job group so [[cancel]] can abort all of its Spark jobs from another
    * thread.
    */
  def withJobGroup[T](spark: SparkSession, group: String, desc: String)(f: => T): T =
    try {
      spark.sparkContext.setJobGroup(group, desc, interruptOnCancel = true)
      f
    } finally spark.sparkContext.clearJobGroup()

  def cancel(spark: SparkSession, group: String): Unit =
    spark.sparkContext.cancelJobGroup(group)

  /** X8: per-model session config (the reference's per-model `meta` confs,
    * connections.py:54-68) — set runtime confs for the duration of `f`,
    * then restore the previous values (unsetting ones that were unset).
    */
  def withConf[T](spark: SparkSession, confs: Map[String, String])(f: => T): T = {
    val previous = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      f
    } finally previous.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
