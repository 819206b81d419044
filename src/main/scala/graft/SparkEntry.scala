package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in `graft.queries.*` packs (one per SURVEY §2 section);
  * this object is just the registry the driver iterates.
  */
object SparkEntry {

  /** Every implemented query pack, concatenated. Names are globally unique
    * (enforced by [[Registry.assertUnique]] at first access). */
  private lazy val packs: Seq[QueryPack] = Registry.packs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    Registry.assertUnique(packs)
    packs.flatMap(_.queries).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}

private[graft] object Registry {
  def packs: Seq[QueryPack] =
    Seq(QueriesA, QueriesA2, QueriesB, QueriesC, QueriesD, QueriesE, QueriesF, QueriesG, QueriesH,
      QueriesI, QueriesJ, QueriesK, QueriesL, QueriesM, QueriesN, QueriesO, QueriesP,
      QueriesQ, QueriesR, QueriesS, QueriesT, QueriesU, QueriesV, QueriesW, QueriesX,
      QueriesY, QueriesZ, QueriesAA, QueriesAB, QueriesAC, QueriesAD, QueriesAE,
      QueriesAF, QueriesAG, QueriesAH, QueriesAI, QueriesAJ, QueriesAK,
      QueriesAL, QueriesAM, QueriesAN, QueriesAO, QueriesAP, QueriesAQ, QueriesAR, QueriesAS, QueriesAT, QueriesAU,
      QueriesAV, QueriesAW, QueriesAX, QueriesAY, QueriesAZ, QueriesBA, QueriesBB,
      QueriesBC, QueriesBD, QueriesBE, QueriesBF, QueriesBG, QueriesBH, QueriesBI,
      QueriesBJ, QueriesBK, QueriesBL, QueriesBM, QueriesBN, QueriesBO, QueriesBP,
      QueriesBQ, QueriesBR, QueriesBS, QueriesBT, QueriesBU, QueriesBV, QueriesBW, QueriesBX,
      QueriesBY, QueriesBZ, QueriesCA, QueriesCB, QueriesCC, QueriesCD, QueriesCE, QueriesCF, QueriesCG, QueriesCH, QueriesCI, QueriesCJ, QueriesCK, QueriesCL, QueriesCM, QueriesCN, QueriesCO, QueriesCP, QueriesCQ, QueriesCR, QueriesCS, QueriesCT, QueriesCU, QueriesCV, QueriesCW, QueriesCX, QueriesCY, QueriesCZ, QueriesDA, QueriesDB, QueriesDC, QueriesDD, QueriesDE, QueriesDF, QueriesDG, QueriesDH, QueriesDI, QueriesDJ, QueriesDK, QueriesDL, QueriesDM, QueriesDN, QueriesDO, QueriesDP, QueriesDQ, QueriesDR, QueriesDS, QueriesDT, QueriesDU, QueriesDV, QueriesDW, QueriesDX, QueriesDY, QueriesDZ, QueriesEA, QueriesEB, QueriesEC, QueriesED, QueriesEE, QueriesEF, QueriesEG, QueriesEH, QueriesEI, QueriesEJ, QueriesEK, QueriesEL, QueriesEM, QueriesEN, QueriesEO, QueriesEP, QueriesEQ, QueriesER, QueriesES, QueriesET, QueriesEU, QueriesEV, QueriesEW, QueriesEX, QueriesEY, QueriesEZ, QueriesFA, QueriesFB, QueriesFC, QueriesFD, QueriesFE, QueriesFF)

  def assertUnique(packs: Seq[QueryPack]): Unit = {
    val names = packs.flatMap(_.defs.map(_.name))
    val dup = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names across packs: ${dup.mkString(",")}")
  }
}
