package graft.jsonld

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Seeded property-style tests (SURVEY.md §5 test plan: round-trip laws).
  * Deterministic Random keeps failures reproducible. */
class PropertySpec extends AnyFunSuite {

  private def randomString(r: Random, n: Int, includeExotic: Boolean): String = {
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      r.nextInt(if (includeExotic) 6 else 4) match {
        case 0 => sb += ('a' + r.nextInt(26)).toChar
        case 1 => sb += ('0' + r.nextInt(10)).toChar
        case 2 => sb += Seq('"', '\\', '\n', '\r', '\t', '\b', '\f')(r.nextInt(7))
        case 3 => sb += (' ' + r.nextInt(15)).toChar
        case 4 => sb += (0x100 + r.nextInt(0x500)).toChar // beyond U+024F -> \\uXXXX path
        case _ => // surrogate pair (U+10000..U+10FFF) -> \\UXXXXXXXX path
          val cp = 0x10000 + r.nextInt(0x1000)
          sb.appendAll(Character.toChars(cp))
      }
    }
    sb.toString
  }

  test("N-Quads escape/unescape round-trips arbitrary strings (incl. astral)") {
    val r = new Random(42)
    (0 until 500).foreach { i =>
      val s = randomString(r, r.nextInt(40), includeExotic = true)
      val esc = NQuads.escape(s)
      assert(NQuads.unescape(esc) == s, s"case $i: '$s' -> '$esc'")
    }
  }

  test("N-Quads serialize∘parse is the identity on generated literal quads") {
    val r = new Random(7)
    (0 until 200).foreach { i =>
      val ds = new RdfDataset
      val value = randomString(r, r.nextInt(30), includeExotic = true)
      ds.addTriple("http://s.example/x", "http://p.example/p", value, null, null)
      val line = NQuads.toNQuads(ds)
      val re = NQuads.parseNQuads(line)
      val q = re.getQuads("@default").head
      assert(q.obj.value == value, s"case $i: '$value' via '$line'")
    }
  }

  test("Turtle serialize∘parse preserves triples (quote-free literals)") {
    val r = new Random(13)
    (0 until 100).foreach { i =>
      val ds = new RdfDataset
      val nSubj = 1 + r.nextInt(3)
      (0 until nSubj).foreach { s =>
        val nPred = 1 + r.nextInt(3)
        (0 until nPred).foreach { p =>
          if (r.nextBoolean())
            ds.addTriple(s"http://s.example/s$s", s"http://p.example/p$p",
              s"http://o.example/o${r.nextInt(5)}")
          else
            // the reference's Turtle writer emits literal values verbatim
            // between quotes (no escaping) — faithful port, so property
            // inputs stay quote/backslash/newline-free
            ds.addTriple(s"http://s.example/s$s", s"http://p.example/p$p",
              randomString(r, 1 + r.nextInt(15), includeExotic = false)
                .replaceAll("[\"\\\\\n\r\t\b\f]", "x"),
              null, null)
        }
      }
      val ttl = Turtle.toTurtle(ds)
      val re = Turtle.parse(ttl)
      def canon(d: RdfDataset) = d.getQuads("@default")
        .map(q => (q.subject.value, q.predicate.value, q.obj.value,
          if (q.obj.isLiteral) q.obj.datatype else "")).toSet
      assert(canon(re) == canon(ds), s"case $i:\n$ttl")
    }
  }

  test("minhash estimator tracks exact Jaccard within sampling error") {
    val r = new Random(99)
    (0 until 50).foreach { _ =>
      val base = Array.fill(300)(r.nextLong())
      val keep = r.nextDouble()
      val other = base.filter(_ => r.nextDouble() < keep) ++ Array.fill(60)(r.nextLong())
      val exact = graft.ops.TextHash.jaccard(base, other)
      val k = 256
      val sa = graft.ops.TextHash.minhash(base, k)
      val sb = graft.ops.TextHash.minhash(other, k)
      val est = sa.zip(sb).count { case (a, b) => a == b }.toDouble / k
      // binomial std-err at k=256 is ~0.031; allow 5 sigma
      assert(math.abs(est - exact) < 0.16, s"est=$est exact=$exact")
    }
  }

  test("simhash: hamming(identical)=0 and is permutation-invariant in vote order") {
    val r = new Random(5)
    (0 until 50).foreach { _ =>
      val toks = Array.fill(50 + r.nextInt(100))(r.nextLong())
      val h1 = graft.ops.TextHash.simhash64(toks)
      val shuffled = r.shuffle(toks.toVector).toArray
      val h2 = graft.ops.TextHash.simhash64(shuffled)
      assert(h1 == h2, "simhash must not depend on token order")
    }
  }
}
