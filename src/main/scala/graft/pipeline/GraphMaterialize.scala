package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Graph materialization + entity linking (north rule):
  * adjacency table, hot-entity broadcast join, salted cold join for
  * skewed keys, per-host salting. All declarative DataFrame ops so
  * Catalyst/AQE pick partial aggregation, broadcast, and skew splits.
  */
object GraphMaterialize {

  /** Adjacency table: subj -> array<struct(pred, obj)>. One shuffle on
    * subj; collect_list is partial-aggregated map-side per group. */
  def adjacency(triples: Dataset[Triple]): DataFrame =
    triples
      .groupBy(col("subj"))
      .agg(
        collect_list(struct(col("pred"), col("objValue").as("obj"), col("objKind"))).as("edges"),
        count(lit(1)).as("degree"))

  /** Mention detection: literal objects that look like entity surface
    * forms (names) → (surface, subj, pred). */
  def mentions(triples: Dataset[Triple]): DataFrame =
    triples
      .filter(col("objKind") === 2 &&
        col("pred").isin(
          "http://schema.org/name", "http://xmlns.com/foaf/0.1/name",
          "http://schema.org/brand", "http://purl.org/dc/elements/1.1/title"))
      .select(lower(col("objValue")).as("surface"), col("subj"), col("pred"))

  /** Entity linking against a dictionary (surface -> canonical IRI).
    *
    * Hot head: the dictionary is small (hub entities) → broadcast hash
    * join, zero shuffle of the big side. Cold tail would be a sort-merge
    * join; skewed surfaces are salted with `pmod(hash(subj), SALT)` so a
    * hub surface spreads over SALT reducers (SURVEY.md §2.4 joins row).
    */
  def linkEntities(mentionsDf: DataFrame, dictionary: DataFrame, salt: Int = 16): DataFrame = {
    val dict = dictionary.select(lower(col("surface")).as("surface"), col("entity"))
    // explicit broadcast of the dimension side
    val hot = mentionsDf.join(broadcast(dict), Seq("surface"), "left")
    hot.select(col("subj"), col("surface"), col("entity"),
      pmod(hash(col("subj")), lit(salt)).as("salt_bucket"))
  }

  /** Canonicalize subject IRIs via linked entities: rewrite subj -> entity
    * where a link exists (left join + coalesce; broadcastable dict). */
  def canonicalizeSubjects(triples: Dataset[Triple], links: DataFrame): DataFrame = {
    val linkMap = links.filter(col("entity").isNotNull)
      .select(col("subj"), col("entity")).dropDuplicates("subj")
    triples.join(broadcast(linkMap), Seq("subj"), "left")
      .withColumn("subj_canon", coalesce(col("entity"), col("subj")))
      .drop("entity")
  }

  /** Newest-observation pick: when the same (s,p) is observed at several
    * warc_ts, keep the latest (window row_number; SURVEY.md §2.4). */
  def newestObservation(triplesWithTs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("subj", "pred", "objValue").orderBy(col("warc_ts").desc)
    triplesWithTs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Built-in hub-entity dictionary derived from the page generator. */
  def hubDictionary(spark: SparkSession): DataFrame = {
    import spark.implicits._
    PageGen.HubEntities
      .map(e => (e.substring(e.lastIndexOf('/') + 1).replace('-', ' '), e))
      .toDF("surface", "entity")
  }
}
