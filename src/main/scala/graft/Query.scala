package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle that must produce the identical result
  * on the same parquet tables. `oracle = None` → the driver records a
  * weaker rows-only check (reserved for kernels like PCA/ComBat/BMIQ).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Scratch dir for queries that exercise file sinks/sources (kept inside
    * the repo's build dir; nothing outside /root/repo is touched).
    */
  val scratch = "/root/repo/target/qtmp"
}
