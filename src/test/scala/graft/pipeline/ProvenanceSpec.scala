package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The provenance emission is the SAME extraction as the triple
  * pipeline: its distinct triple projection must equal pipeline()'s
  * deduplicated output exactly, and its aggregation must count real
  * multi-source assertions. */
class ProvenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("provenance emission projects and dedups to the pipeline output") {
    val pages = PageGen.pages(spark, 300, seed = 42L, partitions = 4)
    val viaPipeline = TripleEmit.pipeline(pages).toDF()
      .select("subj", "pred", "objKind", "objValue", "objDatatype", "objLang", "graph")
      .collect().toSet
    val viaProv = TripleEmit.triplesWithSource(pages)
      .select("subj", "pred", "objKind", "objValue", "objDatatype", "objLang", "graph")
      .distinct()
      .collect().toSet
    assert(viaProv == viaPipeline)
    assert(viaPipeline.nonEmpty)
  }

  test("provenance aggregation: counts bounded and consistent") {
    val pages = PageGen.pages(spark, 300, seed = 42L, partitions = 4)
    val withSource = TripleEmit.triplesWithSource(pages).localCheckpoint(true)
    val prov = TripleEmit.provenance(withSource)
    val rows = prov.select(col("n_sources"), col("first_url")).collect()
    assert(rows.forall(_.getLong(0) >= 1L))
    assert(rows.forall(r => r.getString(1) != null && r.getString(1).nonEmpty))
    // one provenance row per distinct triple
    val distinctTriples = withSource
      .select("subj", "pred", "objKind", "objValue", "objDatatype", "objLang", "graph")
      .distinct().count()
    assert(prov.count() == distinctTriples)
    // the corpus genuinely has multi-source facts (else the operator is
    // untested on its interesting case)
    assert(prov.filter(col("n_sources") > 1).count() > 0)
  }
}
