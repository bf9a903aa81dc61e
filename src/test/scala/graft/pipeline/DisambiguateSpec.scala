package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** Mention disambiguation: co-reference picks the right namesake (the
  * event-performer-bnode vs canonical-hub shape), direct links score
  * through the self-row, ties break on the entity IRI, the degree cap
  * silences mega-hub subjects. */
class DisambiguateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val Name = "http://schema.org/name"

  private def df(rows: Seq[(String, String, Byte, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (s, p, k, o) =>
      Triple(s, p, k, o,
        if (k == 2) "http://www.w3.org/2001/XMLSchema#string" else null,
        null, "@default")
    }.toDS().toDF()
  }

  private def run(rows: Seq[(String, String, Byte, String)], maxDegree: Int = 64):
      Map[(String, String), (String, Long, Long)] =
    GraphMaterialize.disambiguateMentions(df(rows), maxDegree)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("co-reference resolves a mention bnode to the hub its page also cites") {
    val rows = Seq(
      // page 1: event cites the mention bnode (performer) AND the hub
      ("ev1", "performer", 1: Byte, "_:b1"), ("ev1", "location", 0: Byte, "H"),
      ("_:b1", Name, 2: Byte, "Acme"), ("H", Name, 2: Byte, "acme"),
      // page 2: an unrelated namesake bnode on its own event
      ("ev2", "performer", 1: Byte, "_:b2"), ("_:b2", Name, 2: Byte, "ACME"),
      ("ev2", "location", 0: Byte, "elsewhere"))
    val got = run(rows)
    // b1 has candidates {H, _:b2}: ev1 co-references b1 and H -> score 1;
    // no subject references both b1 and b2 -> H wins despite '_' < 'h'
    assert(got(("_:b1", "acme")) == (("H", 1L, 2L)))
    // the disconnected namesake falls back to score 0, lexicographic min
    assert(got(("_:b2", "acme"))._2 == 0L)
    assert(got(("H", "acme")) == (("_:b1", 1L, 2L))) // symmetric signal
  }

  test("a direct mention->entity edge scores through the self-row") {
    val rows = Seq(
      ("x", Name, 2: Byte, "n"), ("x", "knows", 0: Byte, "e"),
      ("e", Name, 2: Byte, "N"), ("z", Name, 2: Byte, "n"))
    val got = run(rows)
    // x references {x(self), e}: subject x co-references x and e -> 1
    assert(got(("x", "n")) == (("e", 1L, 2L)))
    assert(got(("z", "n"))._2 == 0L)
  }

  test("all-zero scores fall back to the lexicographic minimum; n_cands counts all") {
    val rows = Seq(
      ("x", Name, 2: Byte, "n"), ("a", Name, 2: Byte, "n"),
      ("b", Name, 2: Byte, "n"), ("c", Name, 2: Byte, "n"))
    val got = run(rows)
    assert(got(("x", "n")) == (("a", 0L, 3L)))
    assert(got(("a", "n")) == (("b", 0L, 3L)))
  }

  test("a subject over the degree cap contributes no co-reference") {
    val fanout = (1 to 80).map(i => ("mega", "cites", 0: Byte, f"t$i%03d"))
    val rows = Seq(
      ("mega", "performer", 1: Byte, "_:b1"), ("mega", "location", 0: Byte, "H"),
      ("_:b1", Name, 2: Byte, "acme"), ("H", Name, 2: Byte, "Acme")) ++ fanout
    // under a small cap the mega subject is excluded: score 0 both ways
    val capped = run(rows, maxDegree = 8)
    assert(capped(("_:b1", "acme"))._2 == 0L)
    // with a generous cap the same data scores 1
    assert(run(rows, maxDegree = 128)(("_:b1", "acme")) == (("H", 1L, 1L)))
    // the cap counts REAL references only (82 here): the self-row does
    // not consume a slot, so the boundary subject is kept
    assert(run(rows, maxDegree = 82)(("_:b1", "acme")) == (("H", 1L, 1L)))
    assert(run(rows, maxDegree = 81)(("_:b1", "acme"))._2 == 0L)
  }
}
