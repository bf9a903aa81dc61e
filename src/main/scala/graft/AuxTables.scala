package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import graft.ops.{DedupOps, MultimodalOps, VectorOps}
import graft.pipeline.{GraphMaterialize, PageGen, TripleEmit}

/** Deterministic auxiliary tables that make the non-SQL-producible
  * operators DuckDB-checkable (round-2 verdict #1: 7 of 26 driver queries
  * had no independent oracle).
  *
  * The JSON-LD expansion itself stays gated by the W3C suite — what these
  * tables unlock is an independent SQL oracle for every DISTRIBUTED
  * operator downstream of it: once the seeded pipeline's triples (and the
  * signature/sketch tables) are materialized as parquet, adjacency is a
  * GROUP BY, entity linking is a lower/join/count, corpus flatten is a
  * canonical string_agg, simhash banding is bit_count(xor(...)) over
  * all pairs, and the ANN probe path is an IN-list join — all of which
  * DuckDB can recompute from the same files without touching any engine
  * code.
  *
  * Build-once semantics: tables live under a version+sfDir-keyed temp dir
  * with a _READY marker; Verify/Bench/queries all converge on the same
  * materialization (at 100 TB this is exactly the "build the sketch once,
  * probe many times" shape the ANN path needs — the sketch table is a
  * first-class persisted artifact, not a per-query recompute).
  */
object AuxTables {

  /** Bump when any aux-producing logic changes — stale materializations
    * from an earlier code version must never satisfy the marker check. */
  private val Version = "r3c"

  /** Pages in the seeded KG corpus (matches the q_kg_* driver queries). */
  val KgPages = 500

  /** Planted near-duplicate clones for the cosine-neardup oracle. */
  val NearDupPlants = 25
  val NearDupIdOffset = 100000L

  def dir(sfDir: String): String = {
    val h = graft.ops.TextHash.mix64(
      graft.ops.TextHash.fnv1a64(sfDir, 0, sfDir.length))
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    s"$tmp/graft-aux-$Version-${java.lang.Long.toUnsignedString(h, 36)}"
  }

  /** Materialize (once) and return the aux dir for `sfDir`. Idempotent:
    * a _READY marker short-circuits; a half-built dir (no marker) is
    * rebuilt from scratch. */
  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val d = dir(sfDir)
    val ready = Paths.get(d, "_READY")
    if (Files.exists(ready)) return d
    val t0 = System.nanoTime()

    // 1. triples: the seeded KG corpus through the full pipeline
    val triples = TripleEmit.pipeline(PageGen.pages(spark, KgPages, seed = 42L, partitions = 8))
    triples.toDF().coalesce(1).write.mode("overwrite").parquet(s"$d/triples")

    // 2. hub dictionary (surface -> canonical entity IRI)
    GraphMaterialize.hubDictionary(spark)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/hub_dict")

    // 3. simhash signatures + minhash near-dup pairs of the sf documents
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    DedupOps.sketches(docs).select("doc_id", "simhash")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/simhash_sigs")
    DedupOps.minhashNearDups(docs, k = 64, bands = 16, threshold = 0.5)
      .select("a", "b")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/neardup_pairs")

    // 4. keys-only ANN sketch of the sf embeddings table (build once,
    //    probe many — VectorOps.Ann* constants pin the parameters)
    val vecs = VectorOps.asVectors(spark.read.parquet(s"$sfDir/embeddings.parquet"))
    VectorOps.sketchKeys(vecs, VectorOps.AnnPlanes, VectorOps.AnnBands, VectorOps.AnnSeed)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/ann_sketch")

    // 5. IVF index: per-vector cell assignment + the fixed ANN query's
    //    probed-cell list (both deterministic; at scale cells would be a
    //    partition column so a probe prunes to nprobe/k of the index)
    val cents = VectorOps.ivfCentroids(vecs)
    VectorOps.ivfAssign(vecs, cents)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/ivf_cells")
    locally {
      import spark.implicits._
      VectorOps.ivfProbeCells(SparkEntry.annQuery.map(_.toDouble), cents)
        .toDF("cell").coalesce(1).write.mode("overwrite").parquet(s"$d/ivf_probed")
    }

    // 6. synthetic media inputs (the multimodal query's raw bytes)
    MultimodalOps.syntheticMedia(spark, 200).toDF()
      .select("media_id", "kind", "bytes")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/media")

    Files.createDirectories(Paths.get(d))
    Files.write(ready, Array.emptyByteArray)
    System.err.println(f"[aux] materialized $d in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    d
  }
}
