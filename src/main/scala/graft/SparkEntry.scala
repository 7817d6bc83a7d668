package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator catalog in `graft.ops` contributes its QueryDefs here; the
  * driver discovers the engine's surface exclusively through `queries` /
  * `oracleSql`, so a QueryDef that is not in `all` does not exist as far as
  * scoring is concerned (the round-1 failure mode).
  */
object SparkEntry {

  /** The complete operator catalog (SURVEY.md §2). */
  private lazy val all: Seq[QueryDef] =
    ops.Relational.entries ++
    ops.Aggregates.entries ++
    ops.Scalars.entries ++
    ops.ML.entries ++
    ops.TextSim.entries ++
    ops.Streaming.entries ++
    ops.Extensions.entries ++
    ops.Pipeline.entries ++
    ops.Skew.entries ++
    ops.Dedup.entries ++
    ops.Sources.entries ++
    ops.Reshape.entries ++
    ops.Cluster.entries ++
    ops.Supervised.entries ++
    ops.Metrics.entries ++
    ops.Preprocess.entries ++
    ops.Forecast.entries ++
    ops.Boost.entries ++
    ops.Behavior.entries ++
    ops.Curation.entries ++
    ops.Diagnostics.entries

  /** Flagship query (TPC-H Q1 pricing summary, SURVEY.md §2.4) on
    * /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_hash_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
