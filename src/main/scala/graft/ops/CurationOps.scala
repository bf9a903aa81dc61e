package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators below document granularity: exact
  * line/paragraph-level deduplication (CCNet/RefinedWeb-style — the
  * boilerplate killer document-level dedup can't see) and eval-set
  * decontamination (n-gram-overlap flagging of training documents
  * against held-out evaluation sets).
  *
  * Scale shape shared by both: the global exchanges carry ONLY fixed-size
  * keys (16-byte double hashes + 8-byte ids/positions); document text is
  * never shuffled — reassembly re-reads it from the doc-keyed side, and
  * the eval n-gram set rides a broadcast.
  */
object CurationOps {

  /** Double 64-bit line key: two independent xxhash64 views (the string
    * and its reverse). Treating a line pair as identical requires BOTH
    * hashes to collide (~2^-128) — the keys-only exchange keeps exact
    * string semantics to within odds far below hardware error, without
    * ever shuffling the strings themselves (the q_ngram_topk tripwire
    * pattern, keyed instead of asserted, because here the hot path can't
    * afford a recovery rescan per line). */
  private def lineKey(line: Column): Seq[Column] =
    Seq(xxhash64(line).as("h1"), xxhash64(reverse(line)).as("h2"))

  /** Exact line-level dedup across the corpus: a line (newline-delimited;
    * trailing/leading whitespace significant — normalize upstream if not)
    * is RETAINED only at its globally first occurrence, ordered by
    * (doc_id, pos); every later occurrence — across documents or repeated
    * within one — is dropped, and each document's text is reassembled
    * from its retained lines in original order (empty string when
    * nothing survives).
    *
    * Plan at 100 TB:
    *   1. one narrow scan explodes (doc_id, pos, line) and immediately
    *      projects to (doc_id, pos, h1, h2) — text dropped before any
    *      exchange;
    *   2. global ownership = one hash-agg shuffle on the 16-byte line key
    *      with map-side partial min (boilerplate lines collapse to one
    *      row per map task before the exchange);
    *   3. the ownership verdict joins back to the keys-only frame (same
    *      key, co-partitioned by the previous shuffle under AQE), and the
    *      retained positions aggregate per doc_id — an 8-byte-pos list;
    *   4. reassembly re-reads text by joining the per-doc retained-pos
    *      list to the documents table on doc_id (bucketable/co-located at
    *      scale) and re-splits in place — the only pass that touches text
    *      again, and it is doc-local.
    */
  def lineDedup(documents: DataFrame): DataFrame = {
    val lines = documents.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val keyed = lines.select(Seq(col("doc_id"), col("pos")) ++ lineKey(col("line")): _*)
    val owners = keyed.groupBy(col("h1"), col("h2"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("owner"))
    val retained = keyed.join(owners, Seq("h1", "h2"))
      .filter(col("doc_id") === col("owner.doc_id") && col("pos") === col("owner.pos"))
      .select(col("doc_id"), col("pos"))
    val keep = retained.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("keep"))
    documents.join(keep, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(split(col("text"), "\n")).as("n_lines"),
        coalesce(size(col("keep")), lit(0)).as("n_kept"),
        when(col("keep").isNull, lit(""))
          .otherwise(array_join(
            transform(col("keep"), p => element_at(split(col("text"), "\n"), p + 1)),
            "\n")).as("text_dedup"))
  }

  /** Whitespace-token n-grams of a text column as an array of strings
    * (empty when the document has fewer than `n` tokens). */
  private[ops] def tokenNgrams(text: Column, n: Int): Column = {
    val w = filter(split(text, "\\s+"), t => t =!= "")
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => array_join(slice(w, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Eval-set decontamination: flag training documents sharing any
    * `n`-token n-gram with a held-out evaluation set (the standard
    * 13-gram-overlap rule next to dedup in an LLM curation pipeline).
    * Returns per-document distinct-n-gram counts, the number overlapping
    * the eval set, the overlap fraction, and the contaminated verdict.
    *
    * Plan at 100 TB: the eval set is tiny next to the corpus, so its
    * DISTINCT n-gram keys (16-byte double hashes, [[lineKey]] odds
    * argument — a false flag needs a double collision) are BROADCAST;
    * the corpus side is one narrow scan -> explode -> distinct-per-doc
    * partial agg -> broadcast-hash semi-probe, with zero all-to-all
    * exchange of either side's text. The only shuffle is the per-doc
    * count agg on doc_id. */
  def decontaminate(documents: DataFrame, evalDocs: DataFrame, n: Int = 13): DataFrame = {
    val evalKeys = evalDocs
      .select(explode(tokenNgrams(col("text"), n)).as("ngram"))
      .select(lineKey(col("ngram")): _*)
      .distinct()
    // per-doc distinct happens INSIDE the row (array_distinct before the
    // explode) — a doc's n-grams live in one array, so deduplicating them
    // needs no exchange at all, unlike a post-explode distinct()
    val docGrams = documents
      .select(col("doc_id"),
        explode(array_distinct(tokenNgrams(col("text"), n))).as("ngram"))
      .select(Seq(col("doc_id")) ++ lineKey(col("ngram")): _*)
    val flagged = docGrams
      .join(broadcast(evalKeys), Seq("h1", "h2"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    val totals = documents.select(col("doc_id"),
      size(array_distinct(tokenNgrams(col("text"), n))).as("n_ngrams"))
    totals.join(flagged, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_ngrams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)) /
          greatest(col("n_ngrams"), lit(1)).cast("double"), 4).as("overlap_frac"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }
}
