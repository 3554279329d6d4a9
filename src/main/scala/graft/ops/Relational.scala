package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational-tier operators (SURVEY.md §2.2, §2.3, §2.6, §2.8), each a
  * generic `DataFrame => DataFrame` transform parameterized by column names
  * so the same code serves the methylation model and the TPC-H-ish oracle
  * tables.
  *
  * Scale notes are inline per operator — every transform here is a single
  * declarative plan node sequence; Catalyst handles pushdown/pruning, and the
  * only shuffles are the ones the semantics require (join/groupBy keys).
  */
object Relational {

  /** J1/J2 — N-way full-outer merge on a key (reference
    * /root/reference/filter.py:45 reduce(pd.merge(..., how='outer'))).
    * Joins are left-deep; with AQE on, small sides broadcast automatically.
    * At 100 TB the preferred form is the long-model union (see queries), but
    * the wide merge is part of the reference surface.
    */
  def outerMergeByKey(key: String, dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce((a, b) => a.join(b, Seq(key), "full_outer"))

  /** J5 — broadcast lookup-rename (reference /root/reference/main.py:144-153
    * header-rename dict): rows joined against a small old→new mapping,
    * unmatched keys keep their original value.
    */
  def lookupRename(df: DataFrame, mapping: DataFrame,
                   keyCol: String, oldCol: String, newCol: String): DataFrame = {
    val m = broadcast(mapping.select(col(oldCol).as("__old"), col(newCol).as("__new")))
    df.join(m, df(keyCol) === m("__old"), "left")
      .withColumn(keyCol, coalesce(col("__new"), col(keyCol)))
      .drop("__old", "__new")
  }

  /** P16 — keep the first occurrence per key under an explicit deterministic
    * order (reference /root/reference/workflow.R:32 `!duplicated(...)`;
    * pandas keep='first'). Deterministic unlike dropDuplicates.
    */
  def dedupFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** R5 — melt wide → long (reference header-as-data normalization,
    * /root/reference/main.py:153-156): sample columns become rows.
    */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String, valName: String): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, varName, valName)

  /** P3 — complete-cases in the long model: keys having a (non-null) value
    * for every one of `expectedCount` columns/samples
    * (reference /root/reference/combat_norm.py:28-30 complete.cases).
    */
  def completeKeys(long: DataFrame, keyCol: String, valCol: String,
                   expectedCount: Long): DataFrame =
    long.groupBy(keyCol)
      .agg(count(col(valCol)).as("__n"))
      .filter(col("__n") === expectedCount)
      .select(keyCol)

  /** J7 — column-concat of aligned groups re-expressed long: union with a
    * group literal (reference /root/reference/volcano.R:77 cbind).
    */
  def unionWithTag(tagCol: String, tagged: Seq[(String, DataFrame)]): DataFrame =
    tagged.map { case (tag, df) => df.withColumn(tagCol, lit(tag)) }
      .reduce(_.unionByName(_))

  /** Skew-mitigated equi-join: the skewed (large) side's key is salted into
    * `salts` shards and the small-but-not-broadcastable side is replicated
    * across the shards, so one hot key spreads over `salts` tasks instead
    * of landing on one. Complements AQE's skew-join split for the case
    * where a single key exceeds what one task can hold.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
