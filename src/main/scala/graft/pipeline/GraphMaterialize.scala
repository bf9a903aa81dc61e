package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Graph materialization + entity linking (north rule):
  * adjacency table, hot-entity broadcast join, salted cold join for
  * skewed keys, per-host salting. All declarative DataFrame ops so
  * Catalyst/AQE pick partial aggregation, broadcast, and skew splits.
  */
object GraphMaterialize {

  /** Adjacency table: subj -> array<struct(pred, obj)>, degree-capped and
    * skew-safe. An unbounded `groupBy(subj).agg(collect_list)` puts a hub
    * entity's entire edge list (10^9 edges at web scale) in one task
    * (VERDICT.md #7), so:
    *
    *  1. cheap degree count per subject (hash agg, bounded state);
    *  2. subjects over `maxDegree` (a tiny set — broadcastable) get their
    *     edges deterministically hash-sampled down to ~maxDegree BEFORE
    *     any list is collected;
    *  3. two-level aggregation: partial lists per (subj, salt) — each at
    *     most ~maxDegree/salt edges — then flatten + slice at the final
    *     level, so no task ever materializes more than maxDegree edges
    *     for one subject.
    *
    * `degree` is the TRUE degree; `truncated` marks capped subjects. */
  def adjacency(triples: Dataset[Triple], maxDegree: Int = 10000, salt: Int = 16): DataFrame = {
    val t = triples.toDF()
    val degrees = t.groupBy(col("subj")).agg(count(lit(1)).as("degree"))
    val hot = degrees.filter(col("degree") > maxDegree)
      .select(col("subj"), col("degree").as("hot_degree"))
    val sampled = t.join(broadcast(hot), Seq("subj"), "left")
      .filter(col("hot_degree").isNull ||
        pmod(xxhash64(col("subj"), col("pred"), col("objValue")), col("hot_degree")) < lit(maxDegree.toLong))
    val partial = sampled
      .withColumn("salt_b", pmod(xxhash64(col("pred"), col("objValue"), col("objKind")), lit(salt)))
      .groupBy(col("subj"), col("salt_b"))
      .agg(collect_list(struct(col("pred"), col("objValue").as("obj"), col("objKind"))).as("pe"),
        count(lit(1)).as("cnt"))
    partial.groupBy(col("subj"))
      .agg(slice(flatten(collect_list(col("pe"))), 1, maxDegree).as("edges"),
        sum(col("cnt")).as("kept"))
      .join(broadcast(hot), Seq("subj"), "left")
      .select(col("subj"), col("edges"),
        coalesce(col("hot_degree"), col("kept")).as("degree"),
        col("hot_degree").isNotNull.as("truncated"))
  }

  /** Mention detection: literal objects that look like entity surface
    * forms (names) → (surface, subj, pred). */
  /** Predicates whose literal objects are entity surface forms. */
  val MentionPreds: Seq[String] = Seq(
    "http://schema.org/name", "http://xmlns.com/foaf/0.1/name",
    "http://schema.org/brand", "http://purl.org/dc/elements/1.1/title")

  def mentions(triples: Dataset[Triple]): DataFrame =
    triples
      .filter(col("objKind") === 2 && col("pred").isin(MentionPreds: _*))
      .select(lower(col("objValue")).as("surface"), col("subj"), col("pred"))

  /** Entity linking against a BROADCASTABLE dictionary (surface ->
    * canonical IRI): one broadcast hash join, zero shuffle of the fact
    * side. Correct only while the dictionary fits in a broadcast — the
    * general path is [[linkEntitiesScalable]]. */
  def linkEntities(mentionsDf: DataFrame, dictionary: DataFrame): DataFrame = {
    val dict = dictionary.select(lower(col("surface")).as("surface"), col("entity"))
    mentionsDf.join(broadcast(dict), Seq("surface"), "left")
      .select(col("subj"), col("surface"), col("entity"))
  }

  /** Mention DISAMBIGUATION by co-reference scoring — the "entity-link
    * scoring" step the plain dictionary joins above cannot express: when
    * one surface form names SEVERAL nodes ("stark industries" → the
    * canonical hub IRI plus 23 doc-local bnode mentions in the synthetic
    * corpus), [[linkEntities]] would multiply the mention row per
    * candidate; this operator SCORES each candidate and keeps the best.
    *
    * Candidates for a mention are the OTHER nodes asserting the same
    * (lower-cased) name literal — the name-derived dictionary, ambiguous
    * by construction. The score of candidate `e` for mention node `x` is
    * the number of distinct subjects whose statements reference BOTH
    * (bnode references included — doc-local mention bnodes are reachable
    * ONLY through objKind=1 edges, which is why [[entityCoOccurrence]]'s
    * IRI-only pair table cannot serve here): a page's event node that
    * lists the mention bnode as `performer` and the canonical hub as
    * `location` is one co-referencing subject, and that coherence signal
    * is exactly what separates the right namesake from the other docs'
    * bnodes (zero shared subjects). Each node also counts as referencing
    * itself, so a DIRECT x→e edge scores through x. Winner per
    * (subj, surface): highest score, then smallest entity — a total
    * order the SQL oracle replays exactly. Emits
    * (subj, surface, entity, score, n_cands).
    *
    * Plan: deduped (subj, ent) reference rows are degree-capped FIRST
    * (the shared [[degreeCappedRefs]] rule, counted over REAL references
    * — the self-row is added after the cap so a subject with exactly
    * `maxDegree` references is kept, same boundary as
    * [[entityCoOccurrence]]), then one subj-keyed self-join builds
    * directed co-reference counts with map-side partial agg; the
    * candidate join is surface-keyed (ambiguity per surface is
    * human-name-scale), the score attachment is (node, node)-keyed, and
    * the argmax is a (subj, surface) window — every exchange carries
    * ids and one count. */
  def disambiguateMentions(triples: DataFrame, maxDegree: Int = 64): DataFrame = {
    require(maxDegree >= 1, s"maxDegree must be >= 1, got $maxDegree")
    import org.apache.spark.sql.expressions.Window
    val names = nameSurfaces(triples)
    val refs = triples
      .filter(col("objKind").isin(0, 1) && col("subj") =!= col("objValue"))
      .select(col("subj"), col("objValue").as("ent"))
      .distinct()
    val keptRefs = degreeCappedRefs(refs, maxDegree)
    // self-rows make a direct x→e edge count as co-reference through x
    val kept = keptRefs.unionByName(
      keptRefs.select(col("subj"), col("subj").as("ent")).distinct())
    val coref = kept.as("l").join(kept.as("r"),
        col("l.subj") === col("r.subj") && col("l.ent") =!= col("r.ent"))
      .groupBy(col("l.ent").as("subj"), col("r.ent").as("entity"))
      .agg(count(lit(1)).as("coref"))
    val cands = names.as("m")
      .join(names.as("c"), col("m.surface") === col("c.surface") &&
        col("m.subj") =!= col("c.subj"))
      .select(col("m.subj").as("subj"), col("m.surface").as("surface"),
        col("c.subj").as("entity"))
    cands
      .join(coref, Seq("subj", "entity"), "left")
      .withColumn("score", coalesce(col("coref"), lit(0L)))
      .withColumn("n_cands", count(lit(1)).over(
        Window.partitionBy(col("subj"), col("surface"))).cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("subj"), col("surface"))
          .orderBy(col("score").desc, col("entity"))))
      .filter(col("rn") === 1)
      .select(col("subj"), col("surface"), col("entity"), col("score"), col("n_cands"))
  }

  /** Entity linking that survives a NON-broadcastable dictionary — the
    * north rule's mention→entity join at 10⁷–10⁸ dictionary surfaces
    * (VERDICT r3 #1: the broadcast-only join was the last plan that dies
    * at 100×). The dictionary is split by MENTION frequency:
    *
    *  - hot head: surfaces with ≥ `hotMentionCount` mentions. There are at
    *    most total_mentions/hotMentionCount of them — broadcastable by
    *    construction when the threshold scales with the corpus — and they
    *    are exactly the skewed join keys, so they take the zero-shuffle
    *    broadcast hash join and never touch a shuffle reducer.
    *  - cold tail: everything else goes through a salted sort-merge join —
    *    the fact side salts with `pmod(hash(subj), salt)` so any residual
    *    heavy surface spreads over `salt` reducers, the dictionary side is
    *    exploded ×salt (ids+strings only, no payload), and the `merge`
    *    hint pins the SMJ the 100 TB plan needs (AQE skew-split still
    *    applies on top at runtime).
    *
    * Ahead of BOTH branches sits a Bloom runtime prefilter (round 5i):
    * the dictionary's surfaces fold to a 512 KiB bit array and every
    * mention is probed by the codegen'd in-scan expression — a mention
    * that FAILS the probe provably cannot match (Bloom has no false
    * negatives), so it bypasses the joins entirely as an unlinked row.
    * At web scale most of the mention stream is non-dictionary mass;
    * with the prefilter it dies inside the scan stage instead of being
    * salted, sorted, and merged against an exploded dictionary. False
    * positives (~0.5% at the default sizing) just take the join and
    * miss — semantics unchanged.
    *
    * Semantics are identical to a plain left join: bloom-fail mentions
    * match nothing, hot mentions can only match hot-head entries and
    * cold mentions only tail entries, so the union of the bypass and the
    * two joins is exactly the full join (PipelineSpec's "scalable entity
    * linking" test asserts equality against [[linkEntities]] row-for-row
    * and pins the SMJ-on-salted-key plan). */
  def linkEntitiesScalable(mentionsDf: DataFrame, dictionary: DataFrame,
                           hotMentionCount: Long = 1000L, salt: Int = 8,
                           bloomBits: Int = 1 << 22, bloomK: Int = 4): DataFrame = {
    val dict = dictionary.select(lower(col("surface")).as("surface"), col("entity"))
    val m0 = mentionsDf.select(col("surface"), col("subj"))
    val words = graft.ops.SketchOps.bloomBits(
      dict.select(col("surface")), "surface", bloomBits, bloomK)
    // null surfaces route to the bypass (a plain left join keeps them
    // unlinked too); coalesce keeps pass/bypass an exact partition
    val probe = coalesce(graft.functions.BloomExpression.bloomMightContain(
      col("surface"), words, bloomK), lit(false))
    val m = m0.filter(probe)
    val bypassed = m0.filter(!probe)
      .select(col("subj"), col("surface"), lit(null).cast("string").as("entity"))
    // hotSurfaces feeds FOUR plan branches (hot semi-join, dict head
    // semi-join, mention anti-join, dict tail anti-join) — without a
    // checkpoint each physical occurrence re-runs the full fact-side
    // mention scan+frequency agg, 4x per action (the repo's multi-branch
    // rule, cf. DedupOps.familyGuardedPairs; VERDICT r4 #1). The frame is
    // keys-only and tiny by construction (surfaces over the hot cutoff),
    // so one eager materialization is cheap at every scale. NOTE: this
    // makes the builder EAGER — constructing the plan launches the
    // occupancy job (same contract as the dedup entry points).
    val hotSurfaces = m.groupBy(col("surface")).agg(count(lit(1)).as("n_m"))
      .filter(col("n_m") >= hotMentionCount).select(col("surface"))
      .localCheckpoint(true)
    val hotLinked = m.join(broadcast(hotSurfaces), Seq("surface"), "left_semi")
      .join(broadcast(dict.join(broadcast(hotSurfaces), Seq("surface"), "left_semi")),
        Seq("surface"), "left")
    val saltedMentions = m.join(broadcast(hotSurfaces), Seq("surface"), "left_anti")
      .withColumn("salt_b", pmod(hash(col("subj")), lit(salt)))
    val saltedDict = dict.join(broadcast(hotSurfaces), Seq("surface"), "left_anti")
      .withColumn("salt_b", explode(array((0 until salt).map(lit): _*)))
      .hint("merge")
    val coldLinked = saltedMentions.join(saltedDict, Seq("surface", "salt_b"), "left")
      .drop("salt_b")
    hotLinked.unionByName(coldLinked).select(col("subj"), col("surface"), col("entity"))
      .unionByName(bypassed)
  }

  /** Canonicalize subject IRIs via linked entities: rewrite subj -> entity
    * where a link exists (left join + coalesce; broadcastable dict). A
    * subject with several linked surfaces resolves to min(entity) — a
    * DETERMINISTIC pick (dropDuplicates kept an arbitrary row, which
    * breaks re-run reproducibility and any SQL oracle). */
  def canonicalizeSubjects(triples: Dataset[Triple], links: DataFrame): DataFrame = {
    val linkMap = links.filter(col("entity").isNotNull)
      .groupBy(col("subj")).agg(min(col("entity")).as("entity"))
    triples.join(broadcast(linkMap), Seq("subj"), "left")
      .withColumn("subj_canon", coalesce(col("entity"), col("subj")))
      .drop("entity")
  }

  /** owl:sameAs-style entity merge: the classic KG-construction
    * resolution step downstream of entity linking. Triples asserting
    * `sameAsPred` between two IRIs are equivalence edges; each
    * equivalence class collapses to its minimum IRI (deterministic
    * canonical representative), every other triple is rewritten onto the
    * representatives, the consumed `sameAsPred` assertions are dropped,
    * and the merged graph is deduplicated (merging entities makes
    * previously-distinct triples collide — the final `distinct` is the
    * one wide stage and is inherent to the semantics).
    *
    * Scale shape:
    *  - equivalence classes via [[graft.ops.DedupOps.dedupComponents]]
    *    (iterative min-label propagation — per-round one equi-join + one
    *    hash agg over id pairs, no driver-side graph; sameAs chains in
    *    web data are short, so convergence is a few rounds);
    *  - the rewrite mapping holds only NON-trivial rows (id != comp),
    *    bounded by the sameAs assertion count — orders of magnitude
    *    smaller than the corpus. It is locally checkpointed once (read
    *    by two join branches; the repo's multi-branch rule) but NOT
    *    broadcast-hinted: at web scale a sameAs dictionary can be 10^8
    *    rows (cross-wiki links), so the build side is left to AQE, which
    *    broadcasts when it fits and shuffles when it doesn't;
    *  - equivalence edges are IRI↔IRI only: a bnode SUBJECT asserting
    *    sameAs (a microdata item without @id) is excluded, because a
    *    bnode can win the min-representative race ("_" sorts before
    *    every IRI scheme letter) and then IRI-kind rows would carry a
    *    blank-node label while objKind=1 references to the merged-away
    *    bnode dangle (review r5). The mapping therefore contains IRIs
    *    only, and the object rewrite applies only to IRI objects
    *    (objKind 0) — now genuinely safe, not just asserted.
    *
    * Eager by contract (components iterate), like [[hubScores]]. */
  def sameAsMerge(triples: DataFrame,
      sameAsPred: String = "http://schema.org/sameAs",
      maxIter: Int = 20): DataFrame = {
    val edges = triples
      .filter(col("pred") === sameAsPred && col("objKind") === 0 &&
        col("subj") =!= col("objValue") &&
        !col("subj").startsWith("_:"))
      .select(col("subj").as("a"), col("objValue").as("b"))
      .distinct()
    // dedupComponents already returns a frame whose blocks are
    // materialized (its convergence counts ran); the non-trivial-row
    // filter is a narrow scan of those blocks, so re-checkpointing the
    // mapping here copied already-cached data in a standalone job for
    // nothing — the two join branches below each re-run only the cheap
    // filter over the cached labels (optimization r6)
    val mapping = graft.ops.DedupOps.dedupComponents(edges, maxIter)
      .filter(col("id") =!= col("comp"))
    val subjMap = mapping.select(col("id").as("subj"), col("comp").as("subj_c"))
    val objMap = mapping.select(col("id").as("objValue"), col("comp").as("obj_c"))
    triples.filter(col("pred") =!= sameAsPred)
      .join(subjMap, Seq("subj"), "left")
      .join(objMap, Seq("objValue"), "left")
      .select(
        coalesce(col("subj_c"), col("subj")).as("subj"),
        col("pred"),
        col("objKind"),
        when(col("objKind") === 0, coalesce(col("obj_c"), col("objValue")))
          .otherwise(col("objValue")).as("objValue"),
        col("objDatatype"), col("objLang"), col("graph"))
      .distinct()
  }

  /** Characteristic sets (Neumann & Moerkotte, ICDE 2011): schema
    * induction over a schemaless triple corpus — group subjects by their
    * exact set of distinct predicates. The result is the backbone
    * statistic for RDF cardinality estimation and physical design
    * (tables-per-characteristic-set layouts), and at crawl scale it is
    * the cheapest "what shapes does this graph actually contain" census.
    *
    * Scale shape: one shuffle keyed by subj (collect_set state bounded
    * by the graph's live predicate vocabulary — dozens, not corpus-
    * sized; partial aggregation runs map-side), then a second tiny agg
    * keyed by the set fingerprint whose cardinality is the number of
    * distinct shapes (thousands at web scale). No row ever carries more
    * than one subject's predicate set. */
  /** subject → characteristic-set fingerprint ("|"-joined sorted distinct
    * predicates) plus the subject's triple count. The fingerprint format
    * is load-bearing for BOTH [[characteristicSets]] and [[schemaGraph]]
    * (and mirrored in their DuckDB oracles) — one definition, two
    * consumers. */
  private def csBySubject(triples: DataFrame): DataFrame =
    triples
      .groupBy(col("subj"))
      .agg(concat_ws("|", sort_array(collect_set(col("pred")))).as("cs"),
        count(lit(1)).as("nt"))

  def characteristicSets(triples: DataFrame): DataFrame =
    csBySubject(triples)
      .groupBy(col("cs"))
      .agg(count(lit(1)).as("n_subjects"), sum(col("nt")).as("n_triples"))

  /** Temporal validity intervals (SCD2 over crawl re-observations): the
    * generalization of [[newestObservation]] that keeps HISTORY instead
    * of only the latest value. Input: observations (subj, pred, objKind,
    * objValue, warc_ts). For each (subj, pred) the observation stream is
    * ordered by (warc_ts, objValue) — the objValue tiebreak makes
    * same-timestamp observations deterministic — consecutive
    * observations of the SAME value collapse into one run, and each run
    * becomes an interval [valid_from, valid_to) closed by the next run's
    * first timestamp (valid_to null = still current). This is the
    * standard temporal-table construction for a crawl corpus: "what did
    * the graph say about (s, p) at time t" becomes one range predicate.
    *
    * Semantics note: the model is single-valued-predicate history; a
    * multi-valued predicate (two member values observed forever) yields
    * alternation intervals — deterministic, but filter to functional
    * predicates upstream when the question is value history.
    *
    * Scale shape: ONE shuffle keyed by (subj, pred); the run-id window,
    * the per-run aggregation, and the closing lead() window all reuse
    * that partitioning (verified in the plan audit), so history
    * construction over a 10^12-observation corpus is a single exchange.
    * Per-key state is bounded by that key's observation count — no
    * corpus-wide sort, no driver state. */
  def temporalIntervals(obs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("subj", "pred")
      .orderBy(col("warc_ts"), col("objValue"), col("objKind"))
    // a run splits when (objKind, objValue) changes, so both are
    // CONSTANT within a run and every aggregate below is deterministic
    val runs = obs
      .withColumn("chg",
        when(lag(col("objValue"), 1).over(byKey).isNull ||
          lag(col("objValue"), 1).over(byKey) =!= col("objValue") ||
          lag(col("objKind"), 1).over(byKey) =!= col("objKind"), 1L).otherwise(0L))
      .withColumn("run", sum(col("chg")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("subj"), col("pred"), col("run"))
      .agg(min(col("objKind")).as("objKind"),
        min(col("objValue")).as("objValue"),
        min(col("warc_ts")).as("valid_from"))
    val byFrom = Window.partitionBy("subj", "pred").orderBy(col("valid_from"), col("run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .select(col("subj"), col("pred"), col("objKind"), col("objValue"),
        col("valid_from"), col("valid_to"))
  }

  /** Schema graph (SchemEX-style quotient summary): collapse every
    * subject to its characteristic set and count the IRI edges between
    * set-groups (node-to-node edges: IRI and bnode objects) — the
    * "what links to what, shape-wise" map of a crawl
    * graph, small enough to eyeball at any corpus size (output
    * cardinality is shapes² × predicates, not data-sized).
    *
    * Objects that never occur as subjects (leaf IRIs — they have no
    * characteristic set) group under `(leaf)`.
    *
    * Scale shape: the subject→set mapping reuses
    * [[characteristicSets]]'s first stage (one subj-keyed shuffle);
    * labeling the edge endpoints is two joins keyed by subj/objValue —
    * corpus-sized exchanges that AQE skew-splits, with the final count
    * agg partial map-side. Nothing collects; the only small frame is
    * the output itself. */
  def schemaGraph(triples: DataFrame): DataFrame = {
    val csMap = csBySubject(triples).select(col("subj"), col("cs"))
      // computed ONCE: the two endpoint joins push different filters
      // (inner adds isnotnull(subj), left outer doesn't) into otherwise-
      // identical agg subtrees, which defeats ReusedExchange — without
      // the checkpoint the corpus-sized census runs twice per action
      // (probe-verified). At production scale this map is the build-once
      // artifact you'd persist next to the sketch tables anyway. Eager
      // by contract, like the other checkpointed builders; blocks are
      // reclaimed by the ContextCleaner once the frame is unreferenced.
      .localCheckpoint(true)
    val edges = triples.filter(col("objKind").isin(0, 1)) // node-to-node (IRI + bnode)
      .select(col("subj"), col("pred"), col("objValue"))
    edges
      .join(csMap.select(col("subj"), col("cs").as("src_cs")), Seq("subj"))
      .join(csMap.select(col("subj").as("objValue"), col("cs").as("dst_cs")),
        Seq("objValue"), "left")
      .groupBy(col("src_cs"), col("pred"),
        coalesce(col("dst_cs"), lit("(leaf)")).as("dst_cs"))
      .agg(count(lit(1)).as("n_edges"))
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

  /** Corpus-level flatten (SURVEY.md §2.2 C13 corpus analogue: "corpus-
    * level flatten = groupByKey(id).mapGroups + orderBy(id)"): merge every
    * subject's triples across all documents into one flattened JSON-LD
    * node object, emitted as a canonical JSON string. Deterministic:
    * properties sorted, values sorted by (kind, value, datatype, lang),
    * duplicates suppressed — the distributed equivalent of the per-doc
    * node map's sorted-key merge (Core/JsonLdApi.cs:1058-1312).
    *
    * Scale shape (round-2 verdict #4): the graph filter is a Column
    * predicate BEFORE the typed boundary so it pushes into a parquet scan
    * of a materialized triples table, and hub subjects over
    * `maxValuesPerNode` get the same broadcast-hot-set + deterministic
    * hash-sample treatment as [[adjacency]] — no task ever buffers an
    * unbounded per-subject value set (a 10^6-edge hub subject previously
    * OOMed one task's TreeSet). Truncated nodes are a deliberate lossy
    * summary of pathological hubs, exactly like adjacency's `truncated`
    * rows. */
  def flattenNodes(triples: Dataset[Triple], maxValuesPerNode: Int = 100000): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val t = triples.toDF().filter(col("graph") === "@default")
    val hot = t.groupBy(col("subj")).agg(count(lit(1)).as("degree"))
      .filter(col("degree") > maxValuesPerNode)
      .select(col("subj"), col("degree").as("hot_degree"))
    val sampled = t.join(broadcast(hot), Seq("subj"), "left")
      .filter(col("hot_degree").isNull ||
        pmod(xxhash64(col("subj"), col("pred"), col("objValue")), col("hot_degree")) <
          lit(maxValuesPerNode.toLong))
      .drop("hot_degree")
    sampled.as[Triple]
      .groupByKey(_.subj)
      .mapGroups { (subj, ts) =>
        import graft.jsonld._
        val byPred = scala.collection.mutable.LinkedHashMap
          .empty[String, scala.collection.mutable.TreeSet[(Byte, String, String, String)]]
        ts.foreach { t =>
          byPred.getOrElseUpdate(t.pred, scala.collection.mutable.TreeSet.empty)
            .add((t.objKind, t.objValue,
              Option(t.objDatatype).getOrElse(""), Option(t.objLang).getOrElse("")))
        }
        val node = new JObj
        node.put("@id", JStr(subj))
        byPred.keys.toVector.sorted.foreach { pred =>
          val arr = new JArr
          byPred(pred).foreach { case (kind, value, dt, lang) =>
            val o = new JObj
            if (kind == 2) {
              o.put("@value", JStr(value))
              if (lang.nonEmpty) o.put("@language", JStr(lang))
              else if (dt.nonEmpty && dt != JsonLdConsts.XsdString) o.put("@type", JStr(dt))
            } else o.put("@id", JStr(value))
            arr.add(o)
          }
          node.put(pred, arr)
        }
        (subj, Json.write(node))
      }
      .toDF("subj", "node_json")
  }

  private val RdfType = Rdf.Type

  /** Corpus-level framing (SURVEY.md §2.2 C14 corpus analogue: "the frame
    * is a filter + join"): frame-match = subjects carrying rdf:type
    * `typeIri` (JsonLdApi.Frame's FilterNodes, Core/JsonLdApi.cs:1708-1777,
    * reduced to its relational core), embed = the matched subjects'
    * object neighborhoods via iterated subject-keyed self-joins, one hop
    * per level up to `depth` (EmbedValues' recursive embed,
    * Core/JsonLdApi.cs:1816-1876). Output rows are (root, depth, triple).
    *
    * Embed-once rule (the reference embeds a node at its FIRST encounter):
    * a per-root `visited` set — seeded with the root itself — left_antis
    * each new frontier, so a node reachable at several depths (or through
    * several predicates) embeds exactly once at its shallowest depth, and
    * reference cycles terminate. Each iteration is bounded, declarative
    * relational algebra: no driver traversal, no unbounded task state.
    *
    * Scale shape: the frontier/visited frames carry two string columns;
    * the per-hop embed is an equi-join on the subject key (broadcastable
    * when the frontier is selective, SMJ otherwise — Catalyst/AQE choose);
    * total work is O(sum of per-level true fan-out), exactly what any
    * engine must pay. `depth` is a query parameter, not a hard-coded hop
    * count (VERDICT r3 #3).
    *
    * `explicitProps`, when non-empty, is the frame-@explicit analogue
    * (Core/JsonLdApi.cs:1687-1698 drops properties absent from the
    * frame): only the listed predicates (plus rdf:type, which a frame
    * always matches on) are emitted or followed — a Column `isin`
    * predicate, so at a materialized-table scan it pushes down. */
  def frameByType(triples: Dataset[Triple], typeIri: String, depth: Int = 1,
                  explicitProps: Seq[String] = Nil): DataFrame = {
    require(depth >= 0, s"depth must be >= 0, got $depth")
    val t0f = triples.toDF().filter(col("graph") === "@default")
    val t =
      if (explicitProps.isEmpty) t0f
      else t0f.filter(col("pred").isin((RdfType +: explicitProps).distinct: _*))
    val roots = t.filter(col("pred") === RdfType && col("objKind") === 0 &&
        col("objValue") === typeIri)
      .select(col("subj")).distinct()
    def levelRows(frontier: DataFrame, d: Int): DataFrame =
      frontier.join(t, Seq("subj"))
        .select(col("root"), lit(d).as("depth"), col("subj"),
          col("pred"), col("objKind"), col("objValue"), col("objDatatype"), col("objLang"))
    var frontier = roots.select(col("subj").as("root"), col("subj"))
    var visited = frontier
    var acc = levelRows(frontier, 0)
    var d = 1
    while (d <= depth) {
      var next = frontier.join(t, Seq("subj"))
        .filter(col("objKind") =!= 2) // follow IRI and bnode refs, not literals
        .select(col("root"), col("objValue").as("subj"))
        .distinct()
        .join(visited, Seq("root", "subj"), "left_anti")
      // Lineage hygiene (VERDICT r4 #9): frontier_d's plan embeds
      // frontier_{d-1} AND visited_{d-1} (itself a union of every earlier
      // frontier), so un-truncated the optimizer's input grows
      // quadratically with depth — a depth-8 frame hands Catalyst dozens
      // of copies of the same join subtree. Every few levels, truncate
      // the two iteration-state frames (both are two-string-column,
      // keys-only) with a LAZY localCheckpoint: the logical plan becomes
      // a LogicalRDD at construction (plan growth reset to O(1) per
      // level), while the RDD itself only materializes — once, then
      // persisted — at the caller's first action, keeping this builder
      // lazy for plan-only consumers (ADVICE r4).
      if (d % 3 == 0 && d < depth) {
        next = next.localCheckpoint(false)
        visited = visited.localCheckpoint(false)
      }
      acc = acc.unionByName(levelRows(next, d))
      visited = visited.unionByName(next)
      frontier = next
      d += 1
    }
    acc.dropDuplicates()
  }

  /** Built-in hub-entity dictionary: canonical surface form -> IRI.
    * Surfaces are the names the corpus actually emits as `s:name`
    * literals (PageGen.HubSurfaces), so the broadcast link join resolves
    * real mentions — round 1 derived surfaces from IRI slugs that never
    * occurred in any document and linked nothing. */
  def hubDictionary(spark: SparkSession): DataFrame = {
    import spark.implicits._
    PageGen.HubSurfaces.zip(PageGen.HubEntities)
      .toDF("surface", "entity")
  }

  /** Fixed-point hub scoring over the entity graph (PageRank with damping
    * 0.85, a fixed iteration count, and INTEGER arithmetic): ranks the
    * entities whose surfaces belong in the hot-head broadcast dictionary
    * (`hubDictionary` is hand-seeded today; this is how a crawl-scale
    * pipeline would derive it from the graph itself).
    *
    * Why integer fixed-point (scores in units of 1e-9, seeded at 1.0 per
    * node): floating-point sums depend on combine order, so a distributed
    * PageRank can differ from a single-node re-derivation in the last
    * ulp — unacceptable for this repo's exact-hash oracle gate. Integer
    * sums commute EXACTLY, and truncating division (`div` here, `//` in
    * DuckDB — identical on non-negatives) makes every iteration a pure
    * function of the edge multiset, independent of partitioning. The
    * oracle unrolls the same iterations as chained CTEs.
    *
    * Semantics: score' = 0.15 + 0.85 * sum(in-contribs), contrib =
    * score div out_degree; dangling nodes (no out-edges) contribute
    * nothing (their mass decays — the standard non-normalized variant).
    * Unit bound: contributions sum below nodes×1e9, so 85×sum needs
    * nodes < ~1e8 to stay in a signed 64-bit long; at larger graphs
    * shrink the unit (e.g. 1e6) — the ranking is unit-invariant.
    *
    * Scale shape: edges+degrees are computed ONCE and localCheckpointed
    * LAZILY (each iteration references them; an un-truncated chain would
    * re-scan the triple table per iteration — the multi-branch rule; the
    * lazy form materializes the blocks inside the first consuming job and
    * ReuseExchange serves every later iteration, so no standalone
    * checkpoint job runs — optimization r6). Per iteration: one equi-join
    * on src + one hash agg on dst, 24-byte rows, map-side partial sums.
    * Score frames are checkpointed LAZILY per round: the logical plan
    * each round hands Catalyst stays O(1)-deep (an unrolled 6-iteration
    * plan was A/B-measured ~20% SLOWER than round 5 purely from
    * superlinear optimizer/AQE cost on the deep join tree), but no
    * per-round job runs — the caller's one action materializes the whole
    * cached-RDD chain. */
  def hubScores(triples: DataFrame, iterations: Int = 6): DataFrame = {
    val edges = triples
      .filter(col("objKind") === 0 && col("subj") =!= col("objValue"))
      .select(col("subj").as("src"), col("objValue").as("dst"))
      .distinct()
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // (src, dst, out_degree) — the loop-invariant frame, built once
    val withDeg = edges.join(outDeg, Seq("src")).localCheckpoint(false)
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)
    var scores = nodes.select(col("node"), lit(1000000000L).as("score"))
    for (_ <- 1 to iterations) {
      val inSums = withDeg
        .join(scores.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("score div d").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("insum"))
      scores = nodes.join(inSums, Seq("node"), "left")
        .select(col("node"),
          (lit(150000000L) + expr("(85 * coalesce(insum, 0L)) div 100")).as("score"))
        .localCheckpoint(false)
    }
    scores
  }

  /** Personalized PageRank (random walk with restart) over the directed
    * entity graph: [[hubScores]] with the teleport mass concentrated on a
    * SEED set instead of spread uniformly — scores rank entities by
    * closeness to the seeds' neighborhood (topic-conditional importance:
    * "which entities matter *around these*", where global PageRank
    * answers "which matter overall"). Same integer fixed-point rule as
    * [[hubScores]] (scores in 1e-9 units, per-edge contribution
    * `score div out_degree`, damping 85/100 via exact integer ops) so a
    * staged-CTE SQL oracle replays every iteration bit-for-bit; seeds
    * restart at 150000000 per iteration, non-seeds at 0, init 1e9 on
    * seeds only.
    *
    * Scale shape inherited from [[hubScores]]: the loop-invariant
    * (src, dst, out_degree) frame and the node set are lazily
    * checkpointed once (materialized inside the first consuming job,
    * ReuseExchange thereafter); each iteration is one key-partitioned
    * join + one map-side-combining sum agg; scores are 16-byte
    * (node, long) rows, lazily checkpointed per round (flat per-round
    * plans, zero per-round jobs — the hubScores r6 discipline). The
    * seed predicate is a broadcast-trivial `isin` literal (seed sets
    * are human-scale). */
  def personalizedPageRank(triples: DataFrame, seeds: Seq[String],
      iterations: Int = 6): DataFrame = {
    require(seeds.nonEmpty, "seed set must be non-empty")
    val edges = triples
      .filter(col("objKind") === 0 && col("subj") =!= col("objValue"))
      .select(col("subj").as("src"), col("objValue").as("dst"))
      .distinct()
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val withDeg = edges.join(outDeg, Seq("src")).localCheckpoint(false)
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)
    val isSeed = col("node").isin(seeds: _*)
    var scores = nodes.select(col("node"),
      when(isSeed, lit(1000000000L)).otherwise(lit(0L)).as("score"))
    for (_ <- 1 to iterations) {
      val inSums = withDeg
        .join(scores.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("score div d").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("insum"))
      scores = nodes.join(inSums, Seq("node"), "left")
        .select(col("node"),
          (when(isSeed, lit(150000000L)).otherwise(lit(0L)) +
            expr("(85 * coalesce(insum, 0L)) div 100")).as("score"))
        .localCheckpoint(false)
    }
    scores
  }

  /** HITS hubs/authorities over the directed entity graph (Kleinberg
    * 1999, public paper — PAPERS.md): the mutually-recursive twin of
    * [[hubScores]]' PageRank — auth(v) = Σ hub(u) over in-edges,
    * hub(u) = Σ auth(v) over out-edges. PageRank ranks by endorsement
    * mass; HITS separates DIRECTORY pages (hubs: link out to many good
    * authorities) from REFERENCE pages (authorities: linked from many
    * good hubs) — on a crawl graph those are different axes, and the
    * hot-head broadcast dictionary wants the authority axis while crawl
    * scheduling wants the hub axis.
    *
    * Integer fixed-point, same rule as [[hubScores]]: float power
    * iteration normalizes by an L2 norm whose distributed sum is
    * order-sensitive in the last ulp, so instead each half-step rescales
    * by the exact integer MAX — `x' = x * 1e6 div max(x)` — which is a
    * pure function of the score multiset (max is exact, sums are
    * integral, `div`/`//` truncate identically on non-negatives). The
    * oracle unrolls the same half-steps as chained CTEs with scalar
    * MAX subqueries. Overflow bound: raw ≤ max_degree·1e6 and the
    * rescale multiply caps at raw·1e6 ≤ 1e18 for max_degree < 1e6 —
    * comfortable in a signed long for any degree-capped crawl graph.
    *
    * Scale shape: edges/nodes built once and lazily localCheckpointed;
    * per half-step one equi-join + one hash agg over 16-byte rows with
    * map-side partial sums. The rescale max is a 1-ROW AGGREGATE FRAME
    * broadcast back into the plan (`crossJoin(broadcast(mx))`) instead
    * of a per-step driver collect (optimization r6): the whole
    * fixed-point is one lazy plan chain with NO driver round-trip per
    * half-step — the eager round-5 form ran three jobs per half-step
    * (raw checkpoint, scalar collect, rescale checkpoint; 18+ jobs at
    * iterations=3), this runs the caller's one action plus the bounded
    * broadcast sub-stages (A/B in HitsProbe: ~20-25% faster at sf0.1,
    * and at cluster scale each removed collect is a removed
    * full-pipeline barrier). `raw` is lazily checkpointed because both
    * the max aggregate and the rescale join consume it; plans stay
    * O(1)-deep per half-step exactly as before. */
  def hitsScores(triples: DataFrame, iterations: Int = 3): DataFrame = {
    val edges = triples
      .filter(col("objKind") === 0 && col("subj") =!= col("objValue"))
      .select(col("subj").as("src"), col("objValue").as("dst"))
      .distinct().localCheckpoint(false)
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)

    // one rescaled half-step: raw in-sums joined back onto all nodes
    // (score 0 where no edge contributes), scaled to max 1e6 —
    // greatest(max, 1) matches the empty-frame guard of the unrolled
    // oracle (GREATEST(..., 1))
    def halfStep(scores: DataFrame, scoreCol: String, joinSide: String,
        emitSide: String, outCol: String): DataFrame = {
      val raw = edges
        .join(scores.withColumnRenamed("node", joinSide), Seq(joinSide))
        .groupBy(col(emitSide).as("node"))
        .agg(sum(col(scoreCol)).as("raw"))
        .localCheckpoint(false)
      val mx = raw.agg(greatest(max(col("raw")), lit(1L)).as("mx"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(mx))
        .select(col("node"),
          expr("(coalesce(raw, 0L) * 1000000) div mx").as(outCol))
        .localCheckpoint(false)
    }

    var hub = nodes.select(col("node"), lit(1000000L).as("h"))
    var auth = nodes.select(col("node"), lit(0L).as("a"))
    for (_ <- 1 to iterations) {
      auth = halfStep(hub, "h", "src", "dst", "a")
      hub = halfStep(auth, "a", "dst", "src", "h")
    }
    nodes.join(auth, Seq("node")).join(hub, Seq("node"))
      .select(col("node"), col("a").as("auth"), col("h").as("hub"))
  }

  /** Entity co-occurrence edges: pairs of entity IRIs that appear as
    * objects of the SAME subject (the "mentioned together" graph used for
    * related-entity suggestion and embedding-training pair mining),
    * weighted by the number of distinct subjects sharing them.
    *
    * Scale shape: the quadratic step is the per-subject self-join, so
    * subjects are degree-capped FIRST — a keys-only count + filter drops
    * hub subjects (a directory page with 10^5 outlinks would otherwise
    * emit 10^10 pairs) before any pair is formed. Within the cap the
    * self-join is an equi-join on subj over deduped (subj, ent) rows —
    * co-partitioned under AQE with the groupBy that follows, map-side
    * partial counts. Capped subjects are EXCLUDED, not sampled: a
    * co-occurrence edge supported only by mega-hubs is noise for the
    * dictionary use case, and exclusion keeps the oracle re-derivable
    * by a plain SQL HAVING. */
  def entityCoOccurrence(triples: DataFrame, maxDegree: Int = 64,
      minSubjects: Long = 2L): DataFrame = {
    val po = triples
      .filter(col("objKind") === 0 && col("subj") =!= col("objValue"))
      .select(col("subj"), col("objValue").as("ent"))
      .distinct()
    val kept = degreeCappedRefs(po, maxDegree)
    kept.as("l").join(kept.as("r"),
        col("l.subj") === col("r.subj") && col("l.ent") < col("r.ent"))
      .select(col("l.ent").as("e1"), col("r.ent").as("e2"))
      .groupBy(col("e1"), col("e2")).agg(count(lit(1)).as("n_subjects"))
      .filter(col("n_subjects") >= minSubjects)
  }

  /** Drop every row of subjects holding more than `maxDegree` reference
    * rows — THE degree-cap rule shared by [[entityCoOccurrence]] and
    * [[disambiguateMentions]] (a mega-hub subject must never enter a
    * subject-keyed self-join). Keys-only count + semi-shaped join. */
  private def degreeCappedRefs(po: DataFrame, maxDegree: Int): DataFrame =
    po.join(
      po.groupBy(col("subj")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") <= maxDegree)
        .select(col("subj")),
      Seq("subj"))

  /** Distinct (surface, subj) pairs of the corpus's lower-cased
    * [[MentionPreds]] name literals — the name-derived dictionary shared
    * by [[disambiguateMentions]] and [[derivedHubDictionary]]. */
  private def nameSurfaces(triples: DataFrame): DataFrame =
    triples
      .filter(col("objKind") === 2 && col("pred").isin(MentionPreds: _*))
      .select(lower(col("objValue")).as("surface"), col("subj"))
      .distinct()

  /** Hub dictionary DERIVED from the graph itself: the top-N entities by
    * [[hubScores]], labeled with the surface forms the corpus actually
    * uses for them (their [[MentionPreds]] name literals) — the
    * production answer to `hubDictionary`'s hand-seeded list (the hot
    * head a crawl-scale pipeline broadcasts in [[linkEntitiesScalable]]
    * must come FROM the data, and this is where it comes from). When two
    * top entities share a lowercased surface, the higher-scored one owns
    * it (ties to the greater IRI — an order-independent max(struct),
    * never a window over an unordered tie).
    *
    * Scale shape: scores are the checkpointed fixed-point output; top-N
    * is a TakeOrdered (no global sort materialization); the name join
    * touches only name-literal triples filtered at the scan, against N
    * rows — broadcastable by construction. Eager (via hubScores). */
  def derivedHubDictionary(triples: DataFrame, topN: Int = 32,
      iterations: Int = 6): DataFrame = {
    val top = hubScores(triples, iterations)
      .orderBy(col("score").desc, col("node")).limit(topN)
    val names = nameSurfaces(triples).select(col("subj").as("node"), col("surface"))
    top.join(names, Seq("node"))
      .groupBy(col("surface"))
      .agg(max(struct(col("score").as("sc"), col("node").as("e"))).as("m"))
      .select(col("surface"), col("m.e").as("entity"), col("m.sc").as("score"))
  }

  /** Two-hop reachability counts: for each node, the number of DISTINCT
    * nodes reachable in one or two directed hops (self excluded) — the
    * neighborhood-size signal used for entity-importance ranking and
    * for sizing per-entity context windows.
    *
    * Scale shape: the quadratic step is the hop-composition join, which
    * explodes on high-fan-out INTERMEDIATE nodes (a hub with 10^5
    * out-edges multiplies every in-edge), so intermediates are
    * degree-capped first — a keys-only out-degree count; edges whose src
    * exceeds the cap simply don't extend paths (documented exclusion,
    * SQL-re-derivable — same rationale as [[entityCoOccurrence]]). The
    * edge frame feeds three branches (first hop, second hop, degree
    * count), so it is checkpointed once. All exchanges carry node-id
    * pairs; the final distinct+count is one hash agg. */
  def twoHopCounts(triples: DataFrame, maxDegree: Int = 64): DataFrame = {
    val edges = triples
      .filter(col("objKind") === 0 && col("subj") =!= col("objValue"))
      .select(col("subj").as("src"), col("objValue").as("dst"))
      .distinct().localCheckpoint(true)
    val okMid = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .filter(col("d") <= maxDegree).select(col("src"))
    val second = edges.join(okMid, Seq("src"))
    val twoHop = edges.as("a")
      .join(second.as("b"), col("a.dst") === col("b.src"))
      .select(col("a.src").as("src"), col("b.dst").as("nbr"))
    edges.select(col("src"), col("dst").as("nbr"))
      .unionByName(twoHop)
      .filter(col("src") =!= col("nbr"))
      .distinct()
      .groupBy(col("src")).agg(count(lit(1)).as("n_reach"))
  }

  /** Per-node triangle participation over the UNDIRECTED simple graph of
    * IRI-object edges (direction, predicate, duplicates, self-loops all
    * discarded): the local clustering signal used for community
    * detection, link-farm spotting, and entity-embedding features.
    * Output: (node, n_tri, degree) — integers only, so distributed and
    * single-node counts agree bit-for-bit; zero-triangle nodes are kept
    * (their clustering coefficient is an honest 0, not a missing row).
    *
    * Scale shape: triangle enumeration's blow-up is the wedge join — a
    * hub of degree D owns D²/2 wedges. The degree-orientation bound
    * (Schank–Wagner "compact forward"; the standard MapReduce triangle
    * trick) is applied: every undirected edge is oriented from its
    * lower-(degree, id) endpoint to the higher, which caps every node's
    * ORIENTED out-degree at O(sqrt(m)) on any graph, so wedge generation
    * is O(m^1.5) total work regardless of skew — the hub lands on the
    * receiving side of nearly all its edges and its wedges never
    * materialize. Orientation gives each triangle a unique apex (the
    * vertex with two out-edges), so one equi-join of the wedge frame back
    * to the undirected edge set counts every triangle exactly once; the
    * 3-corner explode that follows is a bounded ×3 expansion into one
    * hash agg. The undirected frame feeds degree + orientation + the
    * closing join and the oriented frame feeds both wedge sides, so each
    * is checkpointed once (the multi-branch rule); every exchange
    * carries node-id pairs only. */
  def triangleCounts(triples: DataFrame): DataFrame = {
    val und = undirectedEdges(triples)
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .localCheckpoint(true) // feeds orientation (twice) + the final assembly
    // orient a→b when (deg, id) of a precedes b; a < b by construction,
    // so ties on degree keep the id orientation
    val fwd = col("da") <= col("db")
    val oriented = und
      .join(deg.select(col("node").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("degree").as("db")), Seq("b"))
      .select(when(fwd, col("a")).otherwise(col("b")).as("src"),
        when(fwd, col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint(true) // both sides of the wedge join
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("apex"), col("e1.dst").as("u"), col("e2.dst").as("w"))
    val tris = wedges.join(
      und.select(col("a").as("u"), col("b").as("w")), Seq("u", "w"))
    val perNode = tris
      .select(explode(array(col("apex"), col("u"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        col("degree"))
  }

  /** Host IRI pattern shared verbatim by [[hostGraph]] and its SQL
    * oracle — one definition, two engines, identical parse. */
  val HostPattern = "^https?://([^/]+)/"

  /** Host-level webgraph: the (source-host, target-host) quotient of the
    * entity graph with edge mass and distinct supporting subjects — the
    * domain-graph aggregation crawl pipelines run for authority signals,
    * crawl budgeting, and spam-cluster detection. IRI-object edges only;
    * bnodes (no host) and same-host self-edges are excluded.
    *
    * Scale shape: one narrow regexp projection at the scan (codegen'd
    * `regexp_extract`, no UDF) into a two-level hash agg — pre-agg on
    * (host-pair, subj) gives the exact distinct-subject count inside the
    * same shuffle key space instead of a count_distinct expand, and the
    * pair-level re-agg is tiny (web host graphs are ~10^7-10^8 edges at
    * full crawl scale vs 10^12 triples). No skew handling needed: the
    * quotient agg is partial-agg friendly, so a hot host pair combines
    * map-side before the exchange. */
  def hostGraph(triples: DataFrame): DataFrame = {
    val h = triples.filter(col("objKind") === 0)
      .select(regexp_extract(col("subj"), HostPattern, 1).as("src_host"),
        regexp_extract(col("objValue"), HostPattern, 1).as("dst_host"),
        col("subj"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "" &&
        col("src_host") =!= col("dst_host"))
    h.groupBy(col("src_host"), col("dst_host"), col("subj"))
      .agg(count(lit(1)).as("m"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(sum(col("m")).as("n_edges"), count(lit(1)).as("n_subjects"))
  }

  /** The undirected simple graph of IRI-object edges — shared scan shape
    * of [[triangleCounts]], [[labelPropagation]] and [[kCore]]: direction,
    * predicate, duplicates, and self-loops all discarded, edges stored
    * once as (a < b). Checkpointed: every caller fans it into multiple
    * plan branches (the multi-branch rule). */
  private def undirectedEdges(triples: DataFrame): DataFrame =
    triples
      .filter(col("objKind") === 0 && col("subj") =!= col("objValue"))
      .select(least(col("subj"), col("objValue")).as("a"),
        greatest(col("subj"), col("objValue")).as("b"))
      .distinct().localCheckpoint(true)

  /** Synchronous label propagation over the undirected IRI graph — the
    * community signal used for host clustering, link-farm grouping, and
    * entity-neighborhood partitioning. Every node starts as its own
    * label; each round, every node adopts the most frequent label among
    * its NEIGHBORS, ties broken to the LEXICALLY SMALLEST label — a fully
    * deterministic update rule (classic async LPA is run-order dependent;
    * the synchronous + total-tie-break variant has one answer per round
    * count, which is what makes an exact cross-engine oracle possible).
    * Output after `rounds` rounds: (node, community).
    *
    * Scale shape: the symmetrized edge frame is built once and
    * checkpointed (it is re-joined every round). Per round: one equi-join
    * of labels onto edge targets + one hash agg on (node, label) with
    * map-side partial counts + one order-independent min(struct(-count,
    * label)) agg — never a window over an unordered tie; labels are
    * checkpointed per round so the plan stays O(1) deep (the hubScores
    * loop discipline). All exchanges carry (id, label) pairs. Eager by
    * contract. */
  def labelPropagation(triples: DataFrame, rounds: Int = 4): DataFrame = {
    require(rounds >= 1)
    val und = undirectedEdges(triples)
    // lazy checkpoint: sym is re-joined every round (multi-branch), but
    // materializing it needs no standalone job — the caller's one action
    // computes it once and ReuseExchange serves the later rounds. Label
    // frames are referenced exactly once each (by the next round), so the
    // unrolled plan is LINEAR in the fixed round count and needs no
    // per-round checkpoint at all (optimization r6 — the eager form ran
    // one job per round).
    val sym = und.select(col("a").as("x"), col("b").as("y"))
      .unionByName(und.select(col("b").as("x"), col("a").as("y")))
      .localCheckpoint(false)
    var labels = sym.select(col("x").as("node")).distinct()
      .select(col("node"), col("node").as("community"))
    for (r <- 1 to rounds) {
      labels = sym
        .join(labels.select(col("node").as("y"), col("community")), Seq("y"))
        .groupBy(col("x"), col("community")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("x"))
        .agg(min(struct((-col("cnt")).as("nc"), col("community").as("l"))).as("m"))
        .select(col("x").as("node"), col("m.l").as("community"))
      // depth bound for NON-default round counts: a lazy checkpoint every
      // 4th round caps the unrolled join tree at 4 rounds' depth (the
      // hubScores measurement: optimizer cost on deep unrolled trees is
      // superlinear), while the default rounds=4 keeps the fully-fused
      // zero-checkpoint plan that A/B-measured fastest
      if (r % 4 == 0 && r < rounds) labels = labels.localCheckpoint(false)
    }
    labels
  }

  /** k-core decomposition (membership at a fixed `k`): iteratively peel
    * nodes of degree < k from the undirected IRI graph until a fixpoint;
    * the survivors are the k-core — the standard "dense seed" extraction
    * for community mining and spam-cluster analysis. Output: (node,
    * core_deg) for every surviving node, core_deg = its degree WITHIN the
    * core (≥ k by definition).
    *
    * Scale shape: the edge frame is checkpointed once; each peel round is
    * two semi-joins (edges restricted to live endpoints) + one hash agg
    * on 8-byte-keyed rows + a filter, with the live set checkpointed per
    * round (O(1) plan depth). Convergence needs O(peel depth) rounds —
    * bounded by the degeneracy ordering length, in practice ≤ 5 on web
    * graphs for small k; the loop detects the fixpoint with a bounded
    * driver-side count per round and REFUSES (raise, not truncate) if
    * `maxRounds` passes without one, so a silently-unconverged core can
    * never masquerade as the answer. */
  def kCore(triples: DataFrame, k: Int = 2, maxRounds: Int = 20): DataFrame = {
    require(k >= 1 && maxRounds >= 1)
    // lazy checkpoints fused with the per-round convergence count: the
    // count() materializes every partition of the round's frame, so each
    // round costs exactly ONE job (the eager form ran checkpoint + count
    // = two; optimization r6). Plan depth unchanged — lineage truncates
    // at the same frames.
    val und = undirectedEdges(triples)
    var alive = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .distinct().localCheckpoint(false)
    var aliveCount = alive.count()
    var rounds = 0
    while (rounds < maxRounds) {
      rounds += 1
      val live = und
        .join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
      val deg = live.select(col("a").as("node"))
        .unionByName(live.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
      val next = deg.filter(col("core_deg") >= k).localCheckpoint(false)
      val nextCount = next.count()
      if (nextCount == aliveCount) return next
      alive = next.select(col("node"))
      aliveCount = nextCount
      if (aliveCount == 0L) return next.select(col("node"), col("core_deg"))
    }
    throw new IllegalStateException(
      s"kCore(k=$k) did not reach a fixpoint in $maxRounds rounds")
  }

  /** Anchor-text consensus per link target: for every href, the total
    * in-link count, the number of distinct anchor strings, and the
    * majority anchor text — the classic crawl-mined naming signal (what
    * the web CALLS a url is the strongest surface form for entity
    * naming and dictionary construction; hub entities accumulate their
    * canonical surface here by sheer link mass).
    *
    * Scale shape: two keyed hash aggs, both partial-agg friendly —
    * (href, anchor) counts combine map-side (boilerplate anchors like a
    * site-wide "home" collapse before the exchange), then the per-href
    * consensus folds count-sum, distinct-text count, and an
    * order-independent max(struct(count, anchor)) in ONE agg (never a
    * window over an unordered tie: ties break to the greater anchor
    * string, which the oracle reproduces with a deterministic ORDER BY).
    * Exchanges carry (href, anchor, count) — anchor strings are short;
    * at 10^12 pages the href key space is page-scale but the agg state
    * per key is O(1). */
  def anchorTextConsensus(links: DataFrame): DataFrame =
    links.groupBy(col("href"), col("anchor"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("href"))
      .agg(sum(col("cnt")).as("n_links"),
        count(lit(1)).as("n_texts"),
        max(struct(col("cnt").as("c"), col("anchor").as("a"))).as("m"))
      .select(col("href"), col("m.a").as("top_anchor"),
        col("n_links"), col("n_texts"))

  /** Crawl-snapshot delta: the triples ADDED and REMOVED between two
    * materializations of the graph (re-crawl maintenance — downstream
    * consumers refresh from the delta instead of re-reading the world).
    * Output: full triple rows plus `change` ∈ {added, removed}.
    *
    * Scale shape: two set differences over the full logical row —
    * `except`, not a hand-rolled anti-join, because objDatatype/objLang
    * are nullable and a plain join key drops every null-carrying row
    * (NULL never equals NULL in join conditions); `except` compares
    * null-safely and matches SQL EXCEPT's set semantics exactly. The
    * exchanged rows ARE the output rows (you cannot emit a row you did
    * not move), so there is nothing to slim below this; at production
    * scale both snapshots are bucketed by subj and the anti-join under
    * `except` co-locates without a shuffle. No key-hash shortcut: an
    * 8-byte-hash membership test would silently drop a genuinely-changed
    * row on collision — unacceptable for a correctness-bearing delta
    * (unlike candidate GENERATION, where a collision only adds a
    * candidate that exact verification removes). */
  def snapshotDelta(before: DataFrame, after: DataFrame): DataFrame = {
    val cols = Seq("subj", "pred", "objKind", "objValue",
      "objDatatype", "objLang", "graph").map(col)
    val a = after.select(cols: _*)
    val b = before.select(cols: _*)
    a.except(b).withColumn("change", lit("added"))
      .unionByName(b.except(a).withColumn("change", lit("removed")))
  }

  /** Apply a change set produced by [[snapshotDelta]] (or any upsert
    * feed with a `change` column of `added`/`removed` rows): the
    * maintenance half of incremental KG construction — a new crawl's
    * delta updates the materialized snapshot without rebuilding it.
    * Set semantics throughout (a graph is a set of triples): removals
    * are null-safe EXCEPTs, additions union in deduplicated. Inverse
    * identity (oracle-checked): applyDelta(a, snapshotDelta(a, b)) is
    * exactly `b` as a set.
    *
    * Scale shape: EXCEPT and the final distinct are aggregations keyed
    * by the full row — at production scale both sides are bucketed by
    * subj so the exchange co-locates; removals are delta-sized, not
    * corpus-sized. */
  def applyDelta(base: DataFrame, delta: DataFrame): DataFrame = {
    val cols = Seq("subj", "pred", "objKind", "objValue",
      "objDatatype", "objLang", "graph").map(col)
    val adds = delta.filter(col("change") === "added").select(cols: _*)
    val dels = delta.filter(col("change") === "removed").select(cols: _*)
    base.select(cols: _*).except(dels).unionByName(adds).distinct()
  }

  /** Deliberately LARGE dictionary for the cold-tail path: the hub head
    * plus `perKind`×5 generated tail entries whose surfaces align with the
    * corpus' actual name literals ("Product N", "Org N", "Person N",
    * "Child N", "Anon N" — PageGen.payload), so the salted sort-merge tail
    * provably links real mentions rather than passing vacuously on
    * all-null entities. Generated distributed (spark.range — no driver
    * data) and deterministic, so the DuckDB oracle can re-derive the links
    * from the persisted parquet copy (AuxTables `big_dict`). */
  def bigDictionary(spark: SparkSession, perKind: Int = 65536): DataFrame = {
    val kinds = Seq("Product" -> "product", "Org" -> "org", "Person" -> "person",
      "Child" -> "child", "Anon" -> "anon")
    val tail = spark.range(0, perKind.toLong).select(
      explode(array(kinds.map { case (pfx, slug) =>
        struct(concat(lit(pfx + " "), col("id")).as("surface"),
          concat(lit(s"https://dict.example/$slug/"), col("id")).as("entity"))
      }: _*)).as("e"))
      .select(col("e.surface").as("surface"), col("e.entity").as("entity"))
    hubDictionary(spark).unionByName(tail)
  }
}
