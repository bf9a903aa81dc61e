package graft.jsonld

import graft.pipeline._
import java.util.concurrent.atomic.AtomicLong

/** Pure-JVM thread-scaling probe of the per-document core (no Spark):
  * N threads each run gen+extract+docToTriples over disjoint page ranges. */
object ThreadScaleProbe {
  def main(args: Array[String]): Unit = {
    val pagesPerThread = if (args.nonEmpty) args(0).toInt else 20000
    Seq(1, 8, 32).foreach { nThreads =>
      val done = new AtomicLong(0)
      val t0 = System.nanoTime()
      val threads = (0 until nThreads).map { t =>
        new Thread(() => {
          var i = t.toLong * pagesPerThread
          val end = i + pagesPerThread
          var triples = 0L
          while (i < end) {
            val p = PageGen.pageAt(42L, i)
            val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
            Extract.scriptBlocksTolerant(html).zipWithIndex.foreach { case (pl, b) =>
              TripleEmit.docToTriples(ExtractedDoc(p.url, b, pl, "jsonld"), false, null) match {
                case Right(ts) => triples += ts.size
                case _         => ()
              }
            }
            i += 1
          }
          done.addAndGet(triples)
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val pages = nThreads.toLong * pagesPerThread
      println(f"threads=$nThreads pages=$pages triples=${done.get} sec=$sec%.2f pages_per_sec=${pages / sec}%.0f per_thread=${pages / sec / nThreads}%.0f")
    }
  }
}
