package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized invariants for the blocking+scoring entity resolver, plus
  * the composition that motivates it: discovered equivalences feed
  * sameAsMerge and the duplicate nodes disappear. */
class EntityResolveSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val name = EntityResolve.NamePred

  /** Random corpus: entities share names (blocks) and attribute values
    * with controlled overlap; ~1/5 of name literals vary in case to
    * exercise the lower() normalization. */
  private def corpus(seed: Int, ents: Int): Seq[(String, String, Byte, String)] = {
    val r = new Random(seed)
    (0 until ents).flatMap { i =>
      val e = f"e$i%03d"
      val nm = s"Name${r.nextInt(ents / 4)}"
      val nameRow = (e, name,
        2.toByte, if (r.nextInt(5) == 0) nm.toUpperCase else nm)
      // ~1/4 of entities carry a SECOND name literal (multilingual
      // labels): pairs sharing both names meet in two blocks and must
      // still count each shared attribute once (review r5 — the
      // cross-block pair-duplication defect this corpus now exercises)
      val secondName = if (r.nextInt(4) == 0)
        Seq((e, name, 2.toByte, s"Alias${r.nextInt(ents / 8)}")) else Nil
      val attrs = (0 until r.nextInt(6)).map { _ =>
        (e, s"p${r.nextInt(4)}", 2.toByte, s"v${r.nextInt(8)}")
      }
      val noise = if (r.nextInt(3) == 0)
        Seq((e, "link", 0.toByte, f"e${r.nextInt(ents)}%03d")) else Nil
      (nameRow +: secondName) ++ attrs ++ noise
    }
  }

  test("discoverEquivalences == sequential reference on random corpora") {
    import spark.implicits._
    for (seed <- Seq(111, 112, 113)) {
      val rows = corpus(seed, ents = 60)
      val df = rows.toDF("subj", "pred", "objKind", "objValue")
      val maxBlock = 8
      val got = EntityResolve.discoverEquivalences(df, maxBlock = maxBlock)
        .as[(String, String, Long, Double)].collect()
        .map(x => (x._1, x._2, x._3)).toSet

      val nameMap = rows.collect {
        case (s, p, k, v) if p == name && k == 2 => (s, v.toLowerCase)
      }.distinct
      val blocks = nameMap.groupBy(_._2).filter { case (_, es) =>
        es.size > 1 && es.size <= maxBlock
      }
      val attrs = rows.collect {
        case (s, p, k, v) if k == 2 && p != name => (s, (p, v))
      }.distinct.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
      val expect = blocks.values.flatMap { es =>
        val ids = es.map(_._1).distinct.sorted
        for {
          i <- ids.indices; j <- (i + 1) until ids.size
          a = ids(i); b = ids(j)
          sa = attrs.getOrElse(a, Set.empty[(String, String)])
          sb = attrs.getOrElse(b, Set.empty[(String, String)])
          sh = (sa & sb).size.toLong
          uni = (sa | sb).size.toLong
          if uni > 0 && sh * 2 >= uni
        } yield (a, b, sh)
      }.toSet
      assert(got == expect, s"seed=$seed")
    }
  }

  test("discovered equivalences compose with sameAsMerge: clones vanish") {
    import spark.implicits._
    val rows = corpus(131, ents = 40)
    // plant exact-duplicate clones of ten entities that HAVE attribute
    // evidence (an attribute-less clone is undiscoverable by attribute
    // overlap — uni = 0 is filtered by design)
    val withEvidence = rows.collect {
      case (s, p, k, _) if k == 2 && p != name => s
    }.distinct.sorted
    val cloneSrc = withEvidence.take(10).toSet
    val planted = rows.filter(r => cloneSrc.contains(r._1))
      .map { case (s, p, k, v) => (s + "#dup", p, k, v) }
    val all = (rows ++ planted)
      .map { case (s, p, k, v) => (s, p, k, v, null: String, null: String, "@default") }
      .toDF("subj", "pred", "objKind", "objValue", "objDatatype", "objLang", "graph")

    val eq = EntityResolve.discoverEquivalences(all, maxBlock = 16)
    val eqTriples = eq.select(col("a").as("subj"),
        lit("http://schema.org/sameAs").as("pred"), lit(0.toByte).as("objKind"),
        col("b").as("objValue"), lit(null).cast("string").as("objDatatype"),
        lit(null).cast("string").as("objLang"), lit("@default").as("graph"))
    val merged = GraphMaterialize.sameAsMerge(all.unionByName(eqTriples))

    // every planted clone was discovered and merged back into its source
    val survivors = merged.select("subj").distinct()
      .as[String].collect().toSet
    val clonesFound = eq.as[(String, String, Long, Double)].collect()
      .filter { case (a, b, _, _) => b == a + "#dup" }.map(_._1).toSet
    assert(clonesFound == cloneSrc, s"missing: ${cloneSrc -- clonesFound}")
    clonesFound.foreach { s =>
      assert(!survivors.contains(s + "#dup"), s"$s#dup survived the merge")
    }
  }
}
