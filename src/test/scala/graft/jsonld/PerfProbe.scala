package graft.jsonld

import graft.pipeline._

/** Driver-side microbenchmark of the per-document core (no Spark). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 3000
    val docs = (0 until n).flatMap { i =>
      val p = PageGen.pageAt(42L, i.toLong)
      val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
      Extract.scriptBlocks(html).zipWithIndex.map { case (pl, b) =>
        ExtractedDoc(p.url, b, pl, "jsonld")
      }
    }
    println(s"docs=${docs.size}")
    // warmup
    docs.take(500).foreach(d => TripleEmit.docToTriples(d, normalizeBNodes = false, null))

    def bench(label: String)(f: ExtractedDoc => Unit): Unit = {
      val t0 = System.nanoTime()
      docs.foreach(f)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: $sec%.3f s total, ${sec * 1e6 / docs.size}%.1f us/doc")
    }

    bench("parse only")(d => Json.parse(d.payload))
    bench("parse+expand") { d =>
      val opts = JsonLdOptions(base = d.url)
      JsonLdProcessor.expand(Json.parse(d.payload), opts)
    }
    bench("full docToTriples")(d => TripleEmit.docToTriples(d, normalizeBNodes = false, null))
    bench("full with normalize")(d => TripleEmit.docToTriples(d, normalizeBNodes = true, null))

    // extraction cost
    val t0 = System.nanoTime()
    (0 until n).foreach { i =>
      val p = PageGen.pageAt(42L, i.toLong)
      Extract.scriptBlocksTolerant(new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
    }
    println(f"gen+extract: ${(System.nanoTime() - t0) / 1e9}%.3f s for $n pages")
  }
}
