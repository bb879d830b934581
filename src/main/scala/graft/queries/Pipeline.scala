package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-preparation operators for a training pipeline: deterministic
  * splits, stratified sampling, TF-IDF term weighting, and the
  * point-in-interval range join ([[graft.operators.RangeJoin]]).
  *
  * Everything rides the cross-engine md5 recipe or exact integer
  * arithmetic (see `queries/package.scala`), so each query is hash-gated
  * against the DuckDB oracle despite involving "random" assignment —
  * hash-based splits are also the *right* tool at 100 TB: membership is a
  * pure projection of the row key (no global state, no RNG sequencing,
  * stable under re-partitioning and incremental ingest).
  */
object Pipeline {

  /** The shared dedup content-fingerprint oracle expression —
    * [[Dedup.fpExprSql]] (one definition for every oracle that keys on
    * the normalized-content identity). */
  private def fpExprSql = Dedup.fpExprSql

  /** Cross-engine 60-bit key hash (same recipe as the dedup family). */
  private def keyHash(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** HRW assignment behind `docs_shard_rendezvous`: (doc_id, shard) for
    * every non-null-id document, shard = argmax over 0..nShards−1 of the
    * shared 60-bit key hash of `doc_id:shard` (ties → smallest shard,
    * encoded as max over struct(wt, −shard); practically unreachable on a
    * 60-bit grid). The shard count is small and known at plan time, so
    * the argmax is a PURE PROJECTION — `array_max` over a literal
    * nShards-element array of (weight, −shard) structs, one row in / one
    * row out, no cross join, no window, no exchange. At 100 TB that means
    * shard placement costs exactly one codegen'd map pass; the earlier
    * row_number-over-Window form shuffled an 8×-expanded corpus to sort
    * it per doc. Factored so `RendezvousSpec` can pin the HRW stability
    * theorem across two shard counts and audit the exchange-free plan. */
  private[graft] def rendezvousAssign(
      docs: org.apache.spark.sql.DataFrame,
      nShards: Int): org.apache.spark.sql.DataFrame = {
    val entries = (0 until nShards).map { sh =>
      struct(
        keyHash(concat(col("doc_id").cast("string"), lit(s":$sh"))).as("wt"),
        lit(-sh.toLong).as("neg_shard"))
    }
    docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        (-array_max(array(entries: _*)).getField("neg_shard")).as("shard"))
  }

  /** Ingest-time measure scrub: non-finite doubles (NaN / ±Inf) and
    * magnitudes beyond `maxAbs` become NULL, handing them to the
    * engine-wide null-measure conventions (excluded from buckets, medians,
    * grids — SURVEY §5 item 6). The oracled queries assume FINITE,
    * grid-bounded measures: a NaN breaks ranking determinism (Spark
    * orders NaN greatest, DuckDB errors casting it), and a finite-but-
    * huge value overflows the exact decimal(38) cent grid — so telemetry
    * that can violate either runs through this scrub first. A pure
    * projection: no shuffle, whole-stage codegen'd. */
  def scrubNonFinite(df: org.apache.spark.sql.DataFrame, cols: Seq[String],
                     maxAbs: Double = 1e12): org.apache.spark.sql.DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(!isnan(col(c)) && abs(col(c)) <= lit(maxAbs), col(c)))
    }

  /** ID canonicalization (ingest hygiene): the engine's determinism
    * framework requires UNIQUE row ids — rank tie-breaks, min-id dedup
    * representatives, and as-of keys are all undefined when two rows
    * claim one id (a round-6 probe showed 14 queries diverge on
    * duplicate ids). Retried writes and id collisions violate that;
    * this keeps exactly ONE row per id — the first under `orderCol`
    * (pass a content-derived total order, e.g. the dedup fingerprint,
    * so the survivor is layout-independent) — one bounded-group window,
    * no self-join. */
  def canonicalizeIds(df: org.apache.spark.sql.DataFrame, idCol: String,
                      orderCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Embedding scrub: a vector with ANY non-finite element becomes a NULL
    * vector — excluded from every vector path by the round-6 null
    * conventions (cosine, k-means, LSH all skip null embeddings), so one
    * projection quarantines failed encodes without touching the
    * similarity operators. */
  def scrubEmbeddings(df: org.apache.spark.sql.DataFrame,
                      c: String = "embedding"): org.apache.spark.sql.DataFrame =
    df.withColumn(c,
      when(col(c).isNotNull && !exists(col(c),
        x => isnan(x.cast("double")) ||
          abs(x.cast("double")) === lit(Double.PositiveInfinity)), col(c)))

  /** Classify a JSON `props` payload against the ingest contract
    * "NULL, or a JSON object with UNIQUE keys whose values are integers":
    * `null` / `notobject` (malformed JSON, or a valid non-object —
    * scalar/array) / `dupkey` (an object repeating a key) / `untyped`
    * (an object with a non-integer value) / `ok`. The tests are chosen
    * for exact cross-engine agreement: `json_object_keys` is non-null iff
    * valid-JSON-object (DuckDB: `json_valid` + `json_type = 'OBJECT'`);
    * both engines' key-array functions REPORT duplicate keys as they
    * appear (probed), so `size(keys) != size(distinct keys)` is the same
    * dup test in both; and the strict `from_json map<string,bigint>`
    * nulls on any value Spark can't type as a long (DuckDB: per-key
    * `json_type` over `json_keys`). JSON `null` values pass the typed
    * test in both engines. Duplicate keys are non-ok BY CONTRACT because
    * extraction on them is engine-defined — Spark's `get_json_object`
    * takes the first occurrence while `from_json` keeps the last, so the
    * two engines (and even two Spark expressions) can legitimately
    * disagree on a dup-keyed object's value; classifying them out keeps
    * every downstream JSON query single-valued. The dup test runs before
    * the typed test so an object that is BOTH dup-keyed and untyped reads
    * `dupkey` — key hygiene precedes value hygiene. */
  def propsClass(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(p.isNull, "null")
      .when(json_object_keys(p).isNull, "notobject")
      .when(size(json_object_keys(p)) =!=
        size(array_distinct(json_object_keys(p))), "dupkey")
      .when(from_json(p, org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.LongType)).isNull, "untyped")
      .otherwise("ok")

  /** Props scrub (ingest hygiene): any payload not classifying `ok`
    * becomes NULL, so the JSON query family (`events_json`,
    * `events_props_map`) — which runs lean, contract-assuming
    * expressions — can never hit the engines' divergent failure modes
    * on hostile input: Spark's ANSI cast throws on a non-numeric `$.k`
    * where DuckDB's `json_extract` errors on malformed JSON. A pure
    * projection, same shape as [[scrubNonFinite]]. */
  def scrubProps(df: org.apache.spark.sql.DataFrame,
                 c: String = "props"): org.apache.spark.sql.DataFrame =
    df.withColumn(c, when(propsClass(col(c)) === "ok", col(c)))

  /** The four curation stages behind `docs_curation_pipeline` and
    * `docs_curation_disposition` — ONE definition of the corpus slice and
    * every stage's survivor set, so the attrition panel and the per-doc
    * audit cannot drift. Returns (docs, exact-dedup representatives,
    * quality keepers (with n_words), decontamination survivors, final
    * keep set). SQL twin: [[curationStageCtes]]. */
  private def curationStages(s: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val docs = graft.Caching.persistTracked(Tables.documents(s, d)
      .filter(col("doc_id") % 20 =!= 0 && col("source").isNotNull))
    // stage 1: exact-dedup representatives
    val reps = docs.select(col("doc_id"), Dedup.fingerprint.as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // stage 2: quality gate over the representatives
    val qk = graft.Caching.persistTracked(docs.join(reps, "doc_id")
      .withColumn("ws", TextOps.tokens(col("text")))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_stop", size(filter(col("ws"),
        w => w === "the" || w === "a" || w === "of")).cast("long"))
      .filter(col("n_words") >= 20 &&
        col("n_stop").cast("double") / col("n_words") < 0.4)
      .select(col("doc_id"), col("n_words")))
    // stage 3: decontamination vs the held-out benchmark slice
    val bench = Tables.documents(s, d).filter(col("doc_id") % 20 === 0)
      .select(explode(
        graft.functions.GraftFunctions.shingleHashes(col("text")))
        .as("h")).distinct()
    val contaminated = docs.join(qk.select(col("doc_id")), "doc_id")
      .select(col("doc_id"), explode(
        graft.functions.GraftFunctions.shingleHashes(col("text")))
        .as("h"))
      .join(broadcast(bench), Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 5).select(col("doc_id"))
    val surv3 = graft.Caching.persistTracked(
      qk.join(contaminated, Seq("doc_id"), "left_anti"))
    // stage 4: near-dup pruning among survivors (drop b of each pair)
    val dropB = Dedup
      .jaccardPairsUnsorted(docs.join(surv3.select(col("doc_id")),
        "doc_id"), 0.6)
      .select(col("doc_b").as("doc_id")).distinct()
    val finalKeep = surv3.join(dropB, Seq("doc_id"), "left_anti")
    (docs, reps, qk, surv3, finalKeep)
  }

  /** The hashed-feature linear scorer behind `docs_classifier_score` and
    * `docs_quality_sample` — (doc_id, n_tokens, raw) with raw = Σ cnt·w
    * an exact integer (plan rationale documented at the
    * `docs_classifier_score` entry; SQL twin: [[classifierRawCtes]]).
    * Factored so the sampler thins EXACTLY the gated scorer. */
  private def classifierRaw(s: org.apache.spark.sql.SparkSession,
                            d: String): org.apache.spark.sql.DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.termCounts(col("text"))))
      .toDF("doc_id", "term", "tf")
      .groupBy(col("doc_id"), (keyHash(col("term")) % 64).as("bucket"))
      .agg(sum(col("tf")).as("cnt"))
      .withColumn("w", expr("(bucket * 2654435761) % 2001 - 1000"))
      .groupBy(col("doc_id"))
      .agg(sum(expr("cnt * w")).as("raw"),
        sum(col("cnt")).as("n_tokens"))
  }

  /** The temperature-mixture allocation table behind
    * `docs_mixture_temperature`, over any frame with a `source` column —
    * per-source natural vs α=1/2-tempered share (ppm grid) and the
    * largest-remainder quota against `budget`. Weight = EXACT isqrt of
    * the source's doc count: floor(sqrt(double)) lands within ±1 of
    * truth (IEEE sqrt is correctly rounded in both engines) and the
    * integer compare-adjust pins it, so no float reaches any emitted
    * value. Null-source docs are unallocatable by contract (the
    * budget_sample rule). All windows run on the #sources dimension —
    * tiny at any corpus size. */
  private[graft] def temperatureAllocation(docs: org.apache.spark.sql
      .DataFrame, budget: Long): org.apache.spark.sql.DataFrame = {
    val all = Window.partitionBy(lit(1))
    docs.filter(col("source").isNotNull)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("r0",
        floor(sqrt(col("n_docs").cast("double"))).cast("long"))
      .withColumn("wt",
        when((col("r0") + 1) * (col("r0") + 1) <= col("n_docs"),
          col("r0") + 1)
        .when(col("r0") * col("r0") > col("n_docs"), col("r0") - 1)
        .otherwise(col("r0")))
      .withColumn("sn", sum(col("n_docs")).over(all))
      .withColumn("sw", sum(col("wt")).over(all))
      .withColumn("share_ppm", expr("(1000000 * n_docs) div sn"))
      .withColumn("temp_ppm", expr("(1000000 * wt) div sw"))
      .withColumn("base", expr(s"($budget * wt) div sw"))
      .withColumn("rem", expr(s"($budget * wt) % sw"))
      .withColumn("extra", lit(budget) - sum(col("base")).over(all))
      .withColumn("rrank", row_number().over(
        Window.partitionBy(lit(1))
          .orderBy(col("rem").desc, col("source"))).cast("long"))
      .withColumn("quota",
        col("base") + when(col("rrank") <= col("extra"), 1L).otherwise(0L))
      .select(col("source"), col("n_docs"), col("wt"), col("share_ppm"),
        col("temp_ppm"), col("quota"))
      .orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    // ---- rendezvous (highest-random-weight) shard assignment — the
    // CONSISTENT placement discipline for distributed writes and stateful
    // services (Thaler–Ravishankar HRW; the alternative to a hash ring):
    // shard(doc) = argmax over shards of hash(doc_id : shard). What mod-N
    // placement cannot give and HRW gives by construction: when a shard
    // is REMOVED, only ITS documents move (each survivor's argmax over
    // the remaining set is unchanged — pinned as the stability theorem
    // in `RendezvousSpec`), so a 100 TB reshard touches 1/N of the data
    // instead of (N−1)/N. The assignment is a pure projection (array_max
    // over 8 literal (weight, −shard) structs — no join, no window, no
    // exchange): the placement of any row is decidable anywhere with no
    // directory service, which is what makes it work under incremental
    // ingest. Gated output: the per-shard census (count + id range) under
    // the (weight DESC, shard ASC) total order on the shared 60-bit md5
    // key grid — the oracle replays the same argmax via row_number.
    "docs_shard_rendezvous" -> ((s, d) =>
      rendezvousAssign(Tables.documents(s, d), nShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("shard"))),

    // ---- deterministic train/val/test split: bucket = hash(doc_id) % 100
    // → 90/5/5. A pure projection — the split of any row is decidable
    // anywhere, which is what makes it work under incremental ingest.
    // ---- SEQUENCE PACKING (the pack-by-concatenation training layout:
    // every GPT-style pipeline concatenates the token stream and cuts it
    // at fixed L-token boundaries, letting documents straddle cuts with
    // attention masking): per shard, documents in doc_id order get an
    // exclusive running token offset; a document belongs to the pack
    // where its span STARTS (pack = start_tok div 512). Gated output is
    // the layout census — per (shard, pack): doc count, token mass, id
    // range — i.e. the manifest a packing job writes. Token counts ride
    // the text_tokens BPE-ish regex convention (Java \s == the oracle's
    // explicit [ \t\n\x0B\f\r] class). Scale shape: the only sequential
    // structure is the per-shard running sum — sharding IS the
    // parallelism knob (production sizes shards to ~10⁶ docs; the
    // fixture uses 8 via the cross-engine 60-bit hash), and packing is
    // embarrassingly parallel across shards because the layout is
    // defined PER SHARD, exactly like production packing jobs.
    "docs_pack_sequences" -> ((s, d) => {
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          coalesce(regexp_count(col("text"),
            lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")).cast("long"), lit(0L))
            .as("n_tok"),
          pmod(keyHash(col("doc_id")), lit(8)).as("shard"))
        .withColumn("start_tok", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("pack", expr("start_tok div 512"))
        .groupBy(col("shard"), col("pack"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("sum_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"), col("pack"))
    }),

    // ---- T5-style span corruption layout (Raffel et al. 2020 §3.1.4:
    // contiguous token spans replaced by sentinels — the pretraining
    // objective's data-prep step). Deterministic block variant so both
    // engines replay it exactly: tokens partition into 20-token blocks;
    // each block masks ONE md5-derived span (start = h[1..4] % 18, len
    // = 2 + h[5..4] % 3 → 2–4 tokens, mean 3 → ~15% corruption, the
    // paper's rate) — block-local derivation, so no sequential
    // span-walk dependency and the plan is one projection + one
    // aggregate at any corpus size. Gated output is the per-doc
    // corruption manifest (token count, span count, masked count, ppm
    // rate); token-less docs ride the left-join spine with a NULL rate
    // (nullif — the ANSI div-by-zero convention).
    "docs_span_corruption" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          posexplode(TextOps.tokens(col("text"))))
        .toDF("doc_id", "pos", "w")
        .withColumn("blk", expr("pos div 20"))
        .withColumn("h", md5(concat(col("doc_id").cast("string"),
          lit(":"), col("blk").cast("string"))))
        .withColumn("start",
          expr("CAST(conv(substring(h, 1, 4), 16, 10) AS BIGINT) % 18"))
        .withColumn("len",
          expr("2 + CAST(conv(substring(h, 5, 4), 16, 10) AS BIGINT) % 3"))
        .withColumn("masked",
          (col("pos") % 20 >= col("start") &&
            col("pos") % 20 < col("start") + col("len")).cast("long"))
      val agg = tok.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("masked")).cast("long").as("n_masked"),
          countDistinct(when(col("masked") === 1L, col("blk")))
            .as("n_spans"))
      Tables.documents(s, d).filter(col("doc_id").isNotNull)
        .select(col("doc_id")).join(agg, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("n_masked"), lit(0L)).as("n_masked"),
          expr("n_masked * 1000000 div nullif(n_tokens, 0)")
            .as("mask_ppm"))
        .orderBy(col("doc_id"))
    }),

    "docs_split_train_val" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), (keyHash(col("doc_id")) % 100).as("bucket"))
        .withColumn("split",
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "val")
            .otherwise("test"))
        .orderBy(col("doc_id"))
    }),

    // ---- leakage-safe grouped split: the eval-decontamination form of
    // docs_split_train_val. Hash-splitting per DOCUMENT lets the two
    // halves of a near-duplicate pair straddle train/val — the classic
    // eval-contamination bug. This splits at near-dup-CLUSTER
    // granularity instead: connected components over the Jaccard-0.6
    // pair graph ([[graft.queries.Dedup.components]] — the same
    // machinery dedup_components gates), then the bucket hash of the
    // COMPONENT label decides the split, so every member of a duplicate
    // cluster lands on the same side by construction (GroupedSplitSpec
    // pins that no threshold pair straddles). Scale shape: the pair
    // graph + label propagation are the proven dedup_components plan;
    // the split itself adds one projection — no new shuffle.
    "docs_split_grouped" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val pairs = graft.queries.Dedup
        .jaccardPairsUnsorted(Tables.documents(s, d), 0.6)
        .select(col("doc_a"), col("doc_b"))
      graft.queries.Dedup.components(docs, pairs)
        .select(col("doc_id"), col("component"),
          (keyHash(col("component")) % 100).as("bucket"))
        .withColumn("split",
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "val")
            .otherwise("test"))
        .orderBy(col("doc_id"))
    }),

    // ---- stratified sample: 50 docs per language, chosen by hash rank —
    // deterministic, uniform within stratum, one window per stratum
    // (bounded groups; the 100 TB shape is rank-within-partition, never a
    // global sort)
    "docs_stratified_sample" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), keyHash(col("doc_id")).as("h"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 50)
        .select(col("lang"), col("rn"), col("doc_id"))
        // null lang is a legitimate "unknown" stratum; its SORT position
        // is engine-specific (Spark: nulls first asc, DuckDB: nulls last)
        // so the output order pins it explicitly on both sides
        .orderBy(col("lang").asc_nulls_last, col("rn"))
    }),

    // ---- unique-id canonicalization (ingest hygiene): one survivor per
    // doc_id — the row with the smallest content fingerprint, so the
    // choice is deterministic and layout-independent — plus how many rows
    // claimed the id. The other 90 queries CONTRACT unique ids (their
    // tie-breaks are undefined otherwise); this is the sanctioned repair
    // step for corpora with retried writes or id collisions. On the
    // driver fixture ids are unique, so n_claims is 1 everywhere;
    // DupIdsSpec exercises real collisions.
    "docs_unique_ids" -> ((s, d) => {
      val w = Window.partitionBy(col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), graft.queries.Dedup.fingerprint.as("fp"))
        .withColumn("n_claims", count(lit(1)).over(w).cast("long"))
        .withColumn("rn", row_number().over(w.orderBy(col("fp"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("fp"), col("n_claims"))
        .orderBy(col("doc_id"))
    }),

    // ---- non-finite telemetry scrub (ingest hygiene): NaN/±Inf/overflow
    // measures → NULL via [[scrubNonFinite]], then per-type counts of raw
    // vs surviving values and the exact-grid sum of survivors. On the
    // driver fixture every value is finite, so the query pins the
    // operator's cross-engine plumbing; NonFiniteSpec feeds it the
    // adversarial inputs (NaN ranking and grid overflow are exactly what
    // the scrub exists to prevent — probed in round 6).
    "events_scrub_stats" -> ((s, d) => {
      val scrubbed = scrubNonFinite(Tables.events(s, d), Seq("value"))
      scrubbed.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("value")).as("n_finite"),
          sumMoney(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // ---- JSON props scrub (ingest hygiene): [[propsClass]] counts per
    // (event_type, class), plus the extracted-k sum over contract-`ok`
    // rows — the sanctioned gate in front of the JSON query family,
    // whose lean ANSI-cast/json_extract expressions hard-fail (in
    // DIFFERENT ways per engine) on hostile payloads. On the driver
    // fixture every props is ok-or-null, so the gate pins the
    // cross-engine classification plumbing; PropsScrubSpec (Spark) and
    // scripts/props_probe.py (DuckDB) pin the hostile classes against
    // one shared truth table.
    "events_scrub_props" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("props_class", propsClass(col("props")))
        .groupBy(col("event_type"), col("props_class"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("props_class") === "ok",
            get_json_object(col("props"), "$.k").cast("long"))).as("sum_k"))
        .orderBy(col("event_type"), col("props_class"))
    }),

    // ---- TF-IDF-weighted top terms per document, on an exact integer
    // grid: score = (tf * 1e6) div df — the idf log is monotone-decreasing
    // in df, so for ranking, tf/df ordering differences only reorder terms
    // the log would too; the integer div keeps it bit-stable cross-engine
    // (float log differs in final ulps between engines). Term counting is
    // per-document, so it runs as a projection (native `graft_term_counts`
    // kernel — no (doc, term) aggregation shuffle); only the corpus-level
    // df aggregate and the bounded per-doc window exchange data.
    "text_tfidf_top" -> ((s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val tf = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.functions.GraftFunctions.termCounts(col("text"))))
        .toDF("doc_id", "term", "tf")
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term").asc)
      tf.join(df, "term")
        .withColumn("score", expr("(tf * 1000000) div df"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("doc_id"), col("rn"), col("term"), col("tf"), col("df"),
          col("score"))
        .orderBy(col("doc_id"), col("rn"))
    }),

    // ---- context-length truncation: keep each document's first 128
    // whitespace tokens (single-space rejoined — both engines normalize
    // separators identically, so the strings are bit-equal). A pure
    // projection: the standard pre-tokenization length cap before
    // training batches are packed. Whitespace tokens are the cap's
    // proxy unit; `text_bpe_tokens` provides tokenizer-exact counts
    // when the cap must match the model's real context window.
    "docs_truncate_tokens" -> ((s, d) => {
      val ws = split(col("text"), "\\s+")
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_join(slice(ws, 1, 128), " ").as("text_trunc"),
          least(size(ws), lit(128)).cast("long").as("n_tokens_kept"),
          (size(ws) > 128).as("truncated"))
        .orderBy(col("doc_id"))
    }),

    // ---- overlapping context-window chunking: each document becomes
    // ceil-many 64-token windows at stride 48 (16-token overlap), the
    // standard long-document preparation for training and retrieval
    // indexing (overlap keeps boundary-spanning spans intact in at least
    // one chunk). chunk_id i covers tokens [i*48+1, i*48+64]; the count is
    // 1 + ceil((n-64)/48) so the final window is the only short one and
    // every token is covered. Tokenization is the docs_truncate_tokens
    // whitespace split (both engines normalize separators identically);
    // all arithmetic is integer, so chunk boundaries are bit-equal cross-
    // engine. A pure projection + generate — no shuffle at any corpus
    // size; chunks inherit the document's partition, which is exactly the
    // 100 TB shape (chunking never exchanges data). Null-text documents
    // chunk to nothing in both engines (NULL token array -> no rows).
    "docs_chunk_overlap" -> ((s, d) => {
      val W = 64L; val S = 48L
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), "\\s+").as("ws"))
        .withColumn("n", size(col("ws")).cast("long"))
        .withColumn("n_chunks", when(col("n") <= W, 1L)
          .otherwise(expr(s"((n - $W + ${S - 1}) div $S) + 1")))
        .select(col("doc_id"), col("ws"), col("n"),
          explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id"),
          least(col("n") - col("chunk_id") * S, lit(W)).as("n_tokens"),
          array_join(slice(col("ws"),
            (col("chunk_id") * S + 1).cast("int"), lit(W.toInt)), " ")
            .as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // ---- the cleaning pipeline MATERIALIZED: compose exact dedup
    // (keep the min doc per content fingerprint) with the quality gate
    // (>= 20 words, stopword ratio < 0.4) and emit the surviving corpus —
    // the query a training-data pipeline actually ships. One fingerprint
    // groupBy + one join + per-row quality projections; no operator here
    // is new, which is the point: the primitives compose.
    "docs_clean_corpus" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val keep = docs
        .select(col("doc_id"), Dedup.fingerprint.as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      docs.join(keep, "doc_id")
        .withColumn("ws", TextOps.tokens(col("text")))
        .withColumn("n_words", size(col("ws")).cast("long"))
        .withColumn("n_stop", size(filter(col("ws"),
          w => w === "the" || w === "a" || w === "of")).cast("long"))
        .filter(col("n_words") >= 20 &&
          col("n_stop").cast("double") / col("n_words") < 0.4)
        .select(col("doc_id"), col("lang"), col("n_words"))
        .orderBy(col("doc_id"))
    }),

    // ---- fuzzy entity matching by edit distance: nearest name within a
    // (brand, last-word) block at levenshtein <= 3 — the blocked fuzzy-dup
    // pattern (blocking bounds candidates; Σ block² stays linear-ish in
    // the corpus), with the per-entity argmin as a map-side-combinable
    // min(struct). Edit distance is integer and engine-identical.
    "part_fuzzy_match" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_name"),
        col("p_brand"),
        element_at(split(col("p_name"), " "), -1).as("noun"))
      val b = p.select(col("p_brand"), col("noun"),
        col("p_partkey").as("nn_partkey"), col("p_name").as("nn_name"))
      p.join(b, Seq("p_brand", "noun"))
        // edit distance is symmetric and the (brand, noun) block is the
        // same for both orientations, so run the DP once per unordered
        // pair and mirror the surviving (rare) edges with an explode —
        // one pass, no self-referencing DAG branch to re-execute. The
        // threshold form runs the banded DP (O(len·k) not O(len²)) and
        // returns -1 above the bound — same survivors as `dist <= 3`.
        .filter(col("p_partkey") < col("nn_partkey"))
        .withColumn("dist",
          levenshtein(col("p_name"), col("nn_name"), 3).cast("long"))
        .filter(col("dist").between(0, 3))
        .select(explode(array(
          struct(col("p_partkey").as("k"), col("nn_partkey").as("nn"),
            col("dist")),
          struct(col("nn_partkey").as("k"), col("p_partkey").as("nn"),
            col("dist")))).as("e"))
        // argmin as a PACKED single-long min — `dist·2⁴⁰ + nn` orders by
        // dist then nn exactly like min(struct(dist, nn)), but a struct
        // aggregation buffer forces SortAggregate (sorting every surviving
        // edge per partition); the packed long rides HashAggregate with
        // map-side partials and no sort. Room: dist ≤ 3, partkey < 2⁴⁰.
        .groupBy(col("e.k").as("p_partkey"))
        .agg(min(col("e.dist") * lit(1L << 40) + col("e.nn")).as("pk"))
        .select(col("p_partkey"),
          col("pk").bitwiseAND(lit((1L << 40) - 1)).as("nn_partkey"),
          shiftright(col("pk"), 40).as("dist"))
        .orderBy(col("p_partkey"))
    }),

    // ---- hashing-trick feature vectorizer: terms hashed into 64 buckets
    // (the classic fixed-width featurization that needs no vocabulary
    // pass — the property that matters at 100 TB: no global dictionary,
    // no second scan). Term counting is the native per-doc kernel
    // (projection); the only exchange is the doc-local (doc_id, bucket)
    // partial agg. Sparse output: (doc_id, bucket, weight), zero buckets
    // absent.
    "docs_feature_hash" -> ((s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.functions.GraftFunctions.termCounts(col("text"))))
        .toDF("doc_id", "term", "tf")
        .groupBy(col("doc_id"), (keyHash(col("term")) % 64).as("bucket"))
        .agg(sum(col("tf")).as("weight"))
        .orderBy(col("doc_id"), col("bucket"))
    }),

    // ---- model-based quality filtering (the fasttext/CCNet-style
    // classifier gate — the step after heuristic rules in every
    // production curation stack): apply a LINEAR classifier over hashed
    // bag-of-words features and keep documents scoring ≥ 0. The "model"
    // here is a deterministic 64-weight vector derived from the bucket
    // id by a multiplicative hash (centered on 0, range ±1000) so both
    // engines replay it bit-for-bit; in production it is a broadcast
    // weights table and NOTHING else changes — the plan is the point:
    // featurize (projection + doc-local partial agg, the
    // `docs_feature_hash` shape), weight-join-free scoring (weights are
    // a pure function of bucket here; a real model broadcasts), one
    // map-side-combinable per-doc sum. No vocabulary pass, no global
    // state, embarrassingly parallel — the classifier applies to 100 TB
    // exactly as to 100 MB. raw = Σ cnt·w is an exact integer; the
    // surfaced score is the correctly-rounded double raw/n_tokens; the
    // keep decision compares the INTEGER raw against 0, never a float.
    "docs_classifier_score" -> ((s, d) =>
      classifierRaw(s, d)
        .select(col("doc_id"), col("n_tokens"), col("raw"),
          (col("raw").cast("double") / col("n_tokens")).as("score"),
          when(col("raw") >= 0, lit(1L)).otherwise(lit(0L)).as("keep"))
        .orderBy(col("doc_id"))),

    // ---- quality-weighted sampling (the data-SELECTION step after the
    // classifier: instead of a hard keep/drop at raw ≥ 0, thin each
    // quality band at its own rate — high quality kept whole, mid at
    // 50%, low at 10% — the DSIR/DataComp-style soft selection that
    // preserves some low-band mass for diversity while spending the
    // token budget on quality). Scorer = the GATED `docs_classifier_score`
    // plan (shared [[classifierRaw]]); band boundaries compare INTEGER
    // raw against n_tokens-scaled thresholds (score ≥ -100 ⟺ raw ≥
    // -100·n_tokens — no float at any decision); the keep decision is
    // Bernoulli-by-hash (md5(doc_id) % 100 < rate), the only sampling
    // scheme that is reproducible, partition-independent, and
    // incremental-ingest-stable at 100 TB. Output is the per-band audit
    // (counts + the token mass the budget actually buys); the per-doc
    // decision is a pure projection any consumer replays from the same
    // hash.
    "docs_quality_sample" -> ((s, d) => {
      classifierRaw(s, d)
        .withColumn("band",
          when(col("raw") >= 0, "high")
            .when(col("raw") >= col("n_tokens") * lit(-100L), "mid")
            .otherwise("low"))
        .withColumn("rate_pct",
          when(col("band") === "high", 100L)
            .when(col("band") === "mid", 50L).otherwise(10L))
        .withColumn("hb", keyHash(col("doc_id")) % 100)
        .groupBy(col("band"), col("rate_pct"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("hb") < col("rate_pct"), 1L).otherwise(0L))
            .as("n_kept"),
          sum(col("n_tokens")).cast("long").as("tokens_total"),
          sum(when(col("hb") < col("rate_pct"), col("n_tokens"))
            .otherwise(0L)).cast("long").as("tokens_kept"))
        .orderBy(col("band"))
    }),

    // ---- benchmark decontamination: flag corpus documents sharing any
    // 3-word shingle with a held-out benchmark set (doc_id % 20 == 0 here;
    // in production, the eval suites). The scale shape is the point: the
    // benchmark's distinct shingle-hash set is tiny relative to a 100 TB
    // corpus, so it BROADCASTS and the corpus postings are never
    // shuffled — the semi-join is map-side; only the matched postings
    // (rare) reach the per-doc count.
    "docs_decontaminate" -> ((s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      def postings(pred: org.apache.spark.sql.Column) =
        Tables.documents(s, d).filter(pred)
          .select(col("doc_id"), explode(
            graft.functions.GraftFunctions.shingleHashes(col("text")))
            .as("h"))
      val bench = postings(col("doc_id") % 20 === 0)
        .select(col("h")).distinct()
      postings(col("doc_id") % 20 =!= 0)
        .join(broadcast(bench), Seq("h"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(col("doc_id"))
    }),

    // ---- bloom-prefiltered decontamination: same contract (and oracle)
    // as docs_decontaminate, the OTHER scale regime. The broadcast
    // semi-join holds while the benchmark shingle set fits an exact
    // per-executor hash set; past that (all eval suites — 1e8+ distinct
    // shingles, GBs exact) the exact semi-join must shuffle BOTH sides,
    // corpus included. The Bloom sketch stays broadcastable at any
    // benchmark size, prefilters the corpus postings map-side, and only
    // true matches + the fpp tail reach the shuffled exact-confirm join —
    // whose output is EXACTLY the exact semi-join, so the same DuckDB
    // oracle gates both plans. The sketch is sized from the persisted
    // bench set's own count (executable sizing, like recommendedK — the
    // count scans the already-materialized persist, not the corpus).
    "docs_decontam_bloom" -> ((s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      def postings(pred: org.apache.spark.sql.Column) =
        Tables.documents(s, d).filter(pred)
          .select(col("doc_id"), explode(
            graft.functions.GraftFunctions.shingleHashes(col("text")))
            .as("h"))
      val bench = graft.Caching.persistTracked(
        postings(col("doc_id") % 20 === 0).select(col("h")).distinct())
      val nBench = math.max(bench.count(), 1L)
      graft.operators.Bloom
        .bloomSemiJoin(postings(col("doc_id") % 20 =!= 0), bench, "h",
          expectedItems = nBench)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(col("doc_id"))
    }),

    // ---- data-mixing by source: each source gets a deterministic
    // sampling rate (a pure hash of the source name standing in for the
    // ---- vocabulary-coverage / OOV-rate check (run before committing a
    // tokenizer vocab: which documents a fixed top-K vocabulary fails to
    // cover). The vocab is the corpus' top-100 terms by total count
    // (term-asc tie-break — a total order, so the cut is deterministic),
    // selected by bounded heap and BROADCAST back onto the per-doc term
    // counts; the OOV rate rides the 10⁶ grid. One corpus tokenize pass
    // (persisted postings reused for vocab, totals, and coverage); at
    // real scale the vocab table is exactly what you'd pin alongside the
    // tokenizer artifact.
    "docs_vocab_oov" -> ((s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val tf = graft.Caching.persistTracked(Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.functions.GraftFunctions.termCounts(col("text"))))
        .toDF("doc_id", "term", "tf"))
      val vocab = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
        .orderBy(col("cnt").desc, col("term").asc).limit(100)
        .select(col("term"))
      val tot = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("n_tokens"))
      val inv = tf.join(broadcast(vocab), "term")
        .groupBy(col("doc_id")).agg(sum(col("tf")).as("n_inv"))
      tot.join(inv, Seq("doc_id"), "left_outer")
        .withColumn("n_oov", col("n_tokens") - coalesce(col("n_inv"), lit(0L)))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          expr("(n_oov * 1000000) div n_tokens").as("oov_grid"))
        .orderBy(col("doc_id"))
    }),

    // ---- power-of-two document-length histogram (corpus profiling —
    // the first chart anyone draws over a new crawl). The log2 bucket is
    // computed EXACTLY as the binary digit count: length(bin(n)) —
    // integer in both engines, no float log anywhere; bucket k covers
    // [2^(k-1), 2^k). Lengths come from the text itself (codepoint
    // count — both engines agree; a metadata length column could be
    // stale or absent). One map-side-combinable aggregation over a pure
    // projection; empty/null docs are off the histogram by contract.
    "docs_length_histogram" -> ((s, d) => {
      Tables.documents(s, d)
        .select(length(col("text")).cast("long").as("n"))
        .filter(col("n").isNotNull && col("n") > 0)
        .select(length(bin(col("n"))).cast("long").as("bucket"), col("n"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n")).as("sum_chars"),
          min(col("n")).as("min_chars"),
          max(col("n")).as("max_chars"))
        .orderBy(col("bucket"))
    }),

    // ---- the END-TO-END curation pipeline (the flagship composition —
    // what a training-data team actually ships): raw corpus → exact
    // dedup (keep min-id representative per content fingerprint) →
    // quality gate (≥20 words, stop ratio < 0.4) → benchmark
    // decontamination (drop docs sharing ≥ 5 shingle hashes with the
    // held-out benchmark slice) → near-dup pruning (Jaccard ≥ 0.6 pairs
    // among survivors, greedy drop-the-larger-id) → per-source attrition
    // panel with final token counts. Every stage is a gated operator in
    // its own right (dedup_exact / docs_clean_corpus /
    // docs_decontaminate / dedup_neardup_jaccard); this query gates
    // their COMPOSITION — set algebra between stages (semi/anti joins on
    // doc_id), stage-subset candidate generation (the near-dup df cap is
    // computed on the SURVIVOR subset, as it would be in production),
    // and the bookkeeping panel. Scale shape: each stage is one of the
    // already-audited shapes; stage membership flows as id sets
    // (anti/semi joins, hash-partitioned on doc_id); nothing rescans
    // text more than its own stage needs.
    // ---- per-document curation audit (the disposition table behind the
    // attrition panel): for EVERY document in the curated slice, which
    // stage dropped it — exact_dup / quality / decontaminated / near_dup
    // — or 'kept'. The lineage record a 100 TB curation rollout ships
    // for appeal/debugging ("why is my document gone?"); the panel says
    // how much each stage cost, this says WHOM it cost. Same factored
    // stage machinery as the panel (curationStages — one definition, two
    // readouts); four co-partitioned left joins on doc_id classify each
    // document by its first missing survivor set.
    "docs_curation_disposition" -> ((s, d) => {
      val (docs, reps, qk, surv3, finalKeep) = curationStages(s, d)
      docs.select(col("doc_id"))
        .join(reps.select(col("doc_id"), lit(1L).as("s1")),
          Seq("doc_id"), "left")
        .join(qk.select(col("doc_id"), lit(1L).as("s2")),
          Seq("doc_id"), "left")
        .join(surv3.select(col("doc_id"), lit(1L).as("s3")),
          Seq("doc_id"), "left")
        .join(finalKeep.select(col("doc_id"), lit(1L).as("s4")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("s1").isNull, "exact_dup")
            .when(col("s2").isNull, "quality")
            .when(col("s3").isNull, "decontaminated")
            .when(col("s4").isNull, "near_dup")
            .otherwise("kept").as("disposition"))
        .orderBy(col("doc_id"))
    }),

    "docs_curation_pipeline" -> ((s, d) => {
      val (docs, reps, qk, surv3, finalKeep) = curationStages(s, d)
      // attrition panel per source
      def bySource(ids: org.apache.spark.sql.DataFrame, n: String) =
        docs.join(ids, "doc_id").groupBy(col("source"))
          .agg(count(lit(1)).as(n))
      val fin = docs.join(finalKeep, "doc_id").groupBy(col("source"))
        .agg(count(lit(1)).as("n_final"),
          sum(col("n_words")).as("n_tokens_final"))
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_raw"))
        .join(bySource(reps, "n_exact"), Seq("source"), "left_outer")
        .join(bySource(qk.select(col("doc_id")), "n_quality"),
          Seq("source"), "left_outer")
        .join(bySource(surv3.select(col("doc_id")), "n_decontam"),
          Seq("source"), "left_outer")
        .join(fin, Seq("source"), "left_outer")
        .select(col("source"), col("n_raw"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"),
          coalesce(col("n_quality"), lit(0L)).as("n_quality"),
          coalesce(col("n_decontam"), lit(0L)).as("n_decontam"),
          coalesce(col("n_final"), lit(0L)).as("n_final"),
          coalesce(col("n_tokens_final"), lit(0L)).as("n_tokens_final"))
        .orderBy(col("source"))
    }),

    // ---- the CAPSTONE composition: the curated training set, packed.
    // [[curationStages]]' final keep set (raw → exact-dedup → quality →
    // decontamination → near-dup pruning) flows straight into the
    // [[docs_pack_sequences]] layout — the manifest an actual training
    // run consumes, produced by chaining five gated stages end to end
    // (each stage is ALSO individually gated, so a failure localizes).
    // Token budget = the curation stage's own n_words counter; same
    // 8-shard hash, same exclusive-offset packing arithmetic. The oracle
    // composes the SAME shared CTE texts (curationStageCtes + the
    // packing window), so no stage can drift from its standalone gate.
    "docs_training_manifest" -> ((s, d) => {
      val (_, _, _, _, finalKeep) = curationStages(s, d)
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      finalKeep
        .select(col("doc_id"), col("n_words"),
          pmod(keyHash(col("doc_id")), lit(8)).as("shard"))
        .withColumn("start_tok",
          coalesce(sum(col("n_words")).over(w), lit(0L)))
        .withColumn("pack", expr("start_tok div 512"))
        .groupBy(col("shard"), col("pack"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).cast("long").as("sum_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"), col("pack"))
    }),

    // ---- distribution-drift monitor: each source's language mix scored
    // against the corpus mix by TOTAL-VARIATION distance — the exact-
    // integer member of the drift-divergence family (KL/JS need logs and
    // can never hash cross-engine; TV = ½·Σ|p−q| is a sum of integer
    // absolute deviations over one common denominator):
    //   tvd_grid = (Σ_lang |n_sl·N − n_s·C_l| · 10⁶) div (2·n_s·N)
    // with n_sl the (source, lang) count, n_s/C_l the margins, N the
    // corpus total — carried in decimal(38)/HUGEINT so products are
    // exact at any corpus size. A missing (source, lang) cell still
    // contributes |0 − n_s·C_l| — the source×lang grid is the cross of
    // the two TINY margin tables (left-joined back onto the cells and
    // broadcast), never a second corpus pass. Null source/lang rows are
    // off the panel by contract (mirrored). The 100 TB shape: one
    // hash-partitioned cell aggregation, then dimension-only arithmetic.
    "docs_source_tvd" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val cnt = Tables.documents(s, d)
        .filter(col("source").isNotNull && col("lang").isNotNull)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_sl"))
      val ns = cnt.groupBy(col("source")).agg(sum(col("n_sl")).as("n_s"))
      val cl = cnt.groupBy(col("lang")).agg(sum(col("n_sl")).as("c_l"))
      val tot = cnt.agg(sum(col("n_sl")).as("n"))
      // cast BEFORE multiplying: the products and the 2·n_s·N divisor
      // reach N² — Long wraps past ~2e9 docs while the oracle's HUGEINT
      // stays exact (the "exact at any corpus size" claim lives here)
      ns.crossJoin(broadcast(cl))
        .join(cnt, Seq("source", "lang"), "left_outer")
        .na.fill(0L, Seq("n_sl"))
        .crossJoin(broadcast(tot))
        .select(col("source"), col("n_s"),
          col("n_s").cast(dec).as("n_sd"), col("n").cast(dec).as("nd"),
          col("c_l").cast(dec).as("c_ld"),
          col("n_sl").cast(dec).as("n_sld"))
        .withColumn("term",
          abs(col("n_sld") * col("nd") - col("n_sd") * col("c_ld")))
        .groupBy(col("source"), col("n_s"), col("n_sd"), col("nd"))
        .agg(sum(col("term")).as("sum_term"))
        .select(col("source"), col("n_s").as("n_docs"),
          expr("(sum_term * 1000000) div (2 * n_sd * nd)").as("tvd_grid"))
        .orderBy(col("source"))
    }),

    // mixture weights a data recipe assigns), and a document survives iff
    // hash(doc_id) % 100 < rate — Bernoulli-by-hash, the only sampling
    // scheme that is exactly reproducible, partition-independent, and
    // incremental-ingest-stable at 100 TB (no RNG state, no global pass).
    // Distinct from `docs_stratified_sample` (top-k rank per stratum):
    // this is rate-based thinning, one aggregate, no window.
    "docs_mixture_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"),
          (lit(25) + keyHash(col("source")) % 51).as("rate_pct"),
          (keyHash(col("doc_id")) % 100).as("hb"))
        .groupBy(col("source"), col("rate_pct"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("hb") < col("rate_pct"), 1L).otherwise(0L))
            .as("n_kept"))
        .orderBy(col("source"))
    }),

    // ---- exact-budget mixture allocation: distribute a fixed document
    // budget (100) across sources proportional to mixture weight using
    // LARGEST-REMAINDER rounding — quotas are integers, sum to exactly the
    // budget, and each is within 1 of the real-valued share, which is the
    // apportionment guarantee rate-thinning (docs_mixture_sample) cannot
    // give: Bernoulli rates only hit a budget in expectation, while a
    // training-data recipe ships an exact token/doc budget per source.
    // Weights reuse the hash-derived per-source weights of
    // docs_mixture_sample; within a source the quota is filled by hash
    // rank (same determinism as docs_stratified_sample). Scale shape: the
    // allocation runs on the SOURCE dimension — #sources rows, tiny at any
    // corpus size — so its unpartitioned windows are deliberate (documents
    // never enter them); the quota table broadcasts back onto the corpus
    // and the per-source rank is the bounded-group window. A source with
    // fewer docs than its quota keeps them all (budget underfills rather
    // than reallocating — deterministic and recipe-auditable). Null-source
    // docs are unallocatable by contract (allocation needs a named
    // source); the oracle mirrors the filter.
    // ---- temperature-scaled mixture allocation (the α-sampling recipe
    // of multilingual/multi-source pretraining — Raffel et al. T5 /
    // Xue et al. mT5: sampling share ∝ (natural share)^α with α = 1/2,
    // which upweights small sources and damps head domination): the
    // per-source allocation table a data-mixing run ships — natural vs
    // tempered share side by side plus the exact-budget quota (the
    // docs_budget_sample largest-remainder machinery with temperature
    // weights; the doc-level fill is that query's gated join). Weight =
    // isqrt(n_docs), EXACT integer sqrt: floor(sqrt(double)) is within
    // ±1 of truth (IEEE sqrt is correctly rounded in both engines), and
    // the integer compare-adjust pins it — no float survives into any
    // emitted value. Scale shape: one map-side-combinable count per
    // source, then every window runs on the #sources-row dimension
    // (tiny at any corpus size; the unpartitioned windows are
    // deliberate, the budget_sample discipline).
    "docs_mixture_temperature" -> ((s, d) =>
      temperatureAllocation(Tables.documents(s, d), budget = 200L)),

    "docs_budget_sample" -> ((s, d) => {
      val budget = 100L
      val docs = Tables.documents(s, d).filter(col("source").isNotNull)
      val all = Window.partitionBy(lit(1))
      val alloc = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .withColumn("wt", lit(25L) + keyHash(col("source")) % 51)
        .withColumn("sw", sum(col("wt")).over(all))
        .withColumn("base", expr(s"($budget * wt) div sw"))
        .withColumn("rem", expr(s"($budget * wt) % sw"))
        .withColumn("extra", lit(budget) - sum(col("base")).over(all))
        .withColumn("rrank", row_number().over(
          Window.partitionBy(lit(1)).orderBy(col("rem").desc, col("source")))
          .cast("long"))
        .withColumn("quota",
          col("base") + when(col("rrank") <= col("extra"), 1L).otherwise(0L))
        .select(col("source"), col("quota"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("h"), col("doc_id"))
      docs.select(col("source"), col("doc_id"), keyHash(col("doc_id")).as("h"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .join(broadcast(alloc), Seq("source"))
        .filter(col("rn") <= col("quota"))
        .select(col("source"), col("quota"), col("rn"), col("doc_id"))
        .orderBy(col("source"), col("rn"))
    }),

    // ---- point-in-interval range join: events against 100 synthetic
    // maintenance windows (3 h spacing, 1–5 h length — overlapping, so an
    // event can land in several), bucketed on the hour — see
    // [[graft.operators.RangeJoin]] for why this never plans a cartesian.
    "events_range_join" -> ((s, d) => {
      val baseUs = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
      val wins = s.range(100).select(col("id").as("w_id"),
          (lit(baseUs) + col("id") * lit(3L * 3600000000L)).as("start_us"))
        .withColumn("end_us",
          col("start_us") + (col("w_id") % 5 + 1) * lit(3600000000L))
      val pts = Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("pt_us"),
          col("value"))
      graft.operators.RangeJoin
        .pointInInterval(pts, "pt_us", wins, "start_us", "end_us",
          bucketMicros = 3600000000L)
        .groupBy(col("w_id"))
        .agg(count(lit(1)).as("n_events"),
          sumMoney(col("value")).as("sum_value"))
        .orderBy(col("w_id"))
    })
  )

  /** The classifier scorer as oracle CTEs (yields `sc(doc_id, raw,
    * n_tokens)`) — SQL twin of [[classifierRaw]], shared by the score and
    * quality-sample oracles. */
  private val classifierRawCtes: String = """tok AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'), w -> len(w) > 0)) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
             GROUP BY doc_id, term),
      feat AS (
        SELECT doc_id,
          CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) % 64 AS bucket,
          sum(tf) AS cnt
        FROM tf GROUP BY doc_id, bucket),
      sc AS (
        SELECT doc_id,
          CAST(sum(cnt * ((bucket * 2654435761) % 2001 - 1000)) AS BIGINT)
            AS raw,
          CAST(sum(cnt) AS BIGINT) AS n_tokens
        FROM feat GROUP BY doc_id)"""

  /** The four curation stages as oracle CTEs (raw slice through the
    * `final` survivor set) — SQL twin of [[curationStages]], shared by
    * the attrition-panel and disposition oracles. */
  private val curationStageCtes: String = s"""${Dedup.hashedShingleCtes},
      raw AS (SELECT doc_id, text, source FROM documents
              WHERE doc_id % 20 <> 0 AND source IS NOT NULL),
      keep AS (
        SELECT min(doc_id) AS doc_id FROM raw
        GROUP BY $fpExprSql),
      tokq AS (
        SELECT r.doc_id,
          len(list_filter(string_split_regex(translate(r.text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'),
                          x -> len(x) > 0)) AS n_words,
          len(list_filter(string_split_regex(translate(r.text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'),
                          x -> x = 'the' OR x = 'a' OR x = 'of')) AS n_stop
        FROM raw r JOIN keep k ON k.doc_id = r.doc_id),
      qual AS (
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words FROM tokq
        WHERE n_words >= 20 AND CAST(n_stop AS DOUBLE) / n_words < 0.4),
      bench AS (SELECT DISTINCT h FROM hinv WHERE doc_id % 20 = 0),
      contam AS (
        SELECT hinv.doc_id FROM hinv
        JOIN bench USING (h)
        JOIN qual ON qual.doc_id = hinv.doc_id
        GROUP BY hinv.doc_id HAVING count(*) >= 5),
      surv3 AS (
        SELECT q.doc_id, q.n_words FROM qual q
        LEFT JOIN contam c ON c.doc_id = q.doc_id
        WHERE c.doc_id IS NULL),
      hinv_s AS (SELECT hinv.doc_id, hinv.h FROM hinv
                 JOIN surv3 ON surv3.doc_id = hinv.doc_id),
      dfs AS (SELECT h, count(*) AS df FROM hinv_s GROUP BY h),
      invc AS (SELECT hinv_s.doc_id, hinv_s.h FROM hinv_s
               JOIN dfs ON dfs.h = hinv_s.h WHERE dfs.df <= 1000),
      common AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS common
                 FROM invc a JOIN invc b ON a.h = b.h
                  AND a.doc_id < b.doc_id
                 GROUP BY a.doc_id, b.doc_id),
      dropb AS (
        SELECT DISTINCT c.b AS doc_id FROM common c
        JOIN hsz sa ON sa.doc_id = c.a
        JOIN hsz sb ON sb.doc_id = c.b
        WHERE c.common * 1.0 / (sa.n + sb.n - c.common) >= 0.6),
      final AS (
        SELECT s.doc_id, s.n_words FROM surv3 s
        LEFT JOIN dropb dx ON dx.doc_id = s.doc_id
        WHERE dx.doc_id IS NULL)"""

  val oracles: Map[String, String] = Map(
    // HRW replayed: the same 60-bit md5 key over 'doc_id:shard', argmax
    // per document, per-shard census; null-id docs are unplaceable and
    // excluded in both engines
    "docs_shard_rendezvous" -> """
      WITH sh AS (SELECT unnest(range(0, 8)) AS shard),
      w AS (
        SELECT d.doc_id, sh.shard,
          CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
            || CAST(sh.shard AS VARCHAR)), 1, 15)) AS BIGINT) AS wt
        FROM documents d CROSS JOIN sh
        WHERE d.doc_id IS NOT NULL),
      a AS (SELECT doc_id, shard FROM (
              SELECT doc_id, shard, row_number() OVER (
                PARTITION BY doc_id ORDER BY wt DESC, shard ASC) AS rn
              FROM w) t WHERE rn = 1)
      SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
        min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM a
      GROUP BY shard
      ORDER BY shard""",

    // the running-offset layout replayed: same hash shard, same BPE-ish
    // token regex (whitespace class spelled out — RE2's \s excludes VT),
    // same exclusive window frame; // on non-negative offsets == div
    // block-local md5 span arithmetic replayed verbatim; positions via
    // generate_subscripts (1-based → −1), empty token lists fall out of
    // the unnest and ride the left-join spine
    "docs_span_corruption" -> s"""
      WITH base AS (
        SELECT doc_id, list_filter(
          string_split_regex($asciiLowerTextSql, '[^a-z]+'),
          w -> len(w) > 0) AS ws
        FROM documents WHERE doc_id IS NOT NULL),
      tok AS (
        SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos FROM base),
      mm AS (
        SELECT doc_id, pos, pos // 20 AS blk,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
            CAST(pos // 20 AS VARCHAR)), 1, 4)) AS BIGINT) % 18 AS st,
          2 + CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
            CAST(pos // 20 AS VARCHAR)), 5, 4)) AS BIGINT) % 3 AS ln
        FROM tok),
      mk AS (
        SELECT doc_id, blk,
          CASE WHEN pos % 20 >= st AND pos % 20 < st + ln
               THEN 1 ELSE 0 END AS masked
        FROM mm),
      agg AS (
        SELECT doc_id, count(*) AS n_tokens,
          CAST(sum(masked) AS BIGINT) AS n_masked,
          count(DISTINCT CASE WHEN masked = 1 THEN blk END) AS n_spans
        FROM mk GROUP BY doc_id)
      SELECT b.doc_id,
        coalesce(a.n_tokens, 0) AS n_tokens,
        coalesce(a.n_spans, 0) AS n_spans,
        coalesce(a.n_masked, 0) AS n_masked,
        a.n_masked * 1000000 // nullif(a.n_tokens, 0) AS mask_ppm
      FROM base b LEFT JOIN agg a USING (doc_id)
      ORDER BY b.doc_id""",

    "docs_pack_sequences" -> """
      WITH t AS (
        SELECT doc_id,
          coalesce(len(regexp_extract_all(text,
            '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\x0B\f\r]')), 0) AS n_tok,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) % 8 AS shard
        FROM documents WHERE doc_id IS NOT NULL),
      w AS (
        SELECT shard, doc_id, n_tok,
          coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS start_tok
        FROM t)
      SELECT shard, CAST(start_tok // 512 AS BIGINT) AS pack,
        count(*) AS n_docs,
        CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM w
      GROUP BY 1, 2
      ORDER BY shard, pack""",

    "docs_split_train_val" -> """
      SELECT doc_id,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % 100 AS bucket,
        CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 100 < 90 THEN 'train'
             WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 100 < 95 THEN 'val'
             ELSE 'test' END AS split
      FROM documents
      ORDER BY doc_id""",

    // the dedup_components reachability closure verbatim (one source
    // with the dedup oracles), then the split-train-val bucket CASE over
    // the component label instead of the doc id
    "docs_split_grouped" -> s"""
      WITH RECURSIVE ${graft.queries.Dedup.componentsCtes},
      comp AS (SELECT n AS doc_id, min(m) AS component
               FROM reach GROUP BY n),
      bk AS (SELECT doc_id, component,
               CAST(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 15))
                 AS BIGINT) % 100 AS bucket
             FROM comp)
      SELECT doc_id, component, bucket,
        CASE WHEN bucket < 90 THEN 'train'
             WHEN bucket < 95 THEN 'val'
             ELSE 'test' END AS split
      FROM bk
      ORDER BY doc_id""",

    "docs_unique_ids" -> s"""
      SELECT doc_id, fp, n_claims FROM (
        SELECT doc_id,
          $fpExprSql AS fp,
          count(*) OVER (PARTITION BY doc_id) AS n_claims,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY $fpExprSql) AS rn
        FROM documents) t
      WHERE rn = 1
      ORDER BY doc_id""",

    // the scrub predicate is replicated verbatim: finite and |v| <= 1e12
    // (the grid-capacity bound) survive; NaN/±Inf/huge and NULL do not
    "events_scrub_stats" -> """
      SELECT event_type, count(*) AS n_rows,
        count(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                    AND NOT isinf(value) AND abs(value) <= 1000000000000.0
              THEN 1 END) AS n_finite,
        CAST(sum(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                    AND NOT isinf(value) AND abs(value) <= 1000000000000.0
              THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END) AS DOUBLE)
          / 100.0 AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",

    // class tests stage through MATERIALIZED CTEs so the eager
    // vectorized json_keys/list_filter never touch a non-object row
    // (the list_* null-row crash documented in the verify recipe);
    // json_type inside CASE is lazy-safe (probed). TRY_CAST keeps the
    // k extraction total — on `ok` rows it equals Spark's ANSI cast.
    // A value is integer-typed iff BIGINT, or UBIGINT that fits int64
    // (DuckDB types every positive JSON int UBIGINT; above int64-max
    // Spark's strict long parse nulls the map → `untyped`, so the
    // TRY_CAST range check keeps the engines agreeing). A JSON null
    // value yields SQL-NULL json_type → lambda NULL → not flagged =
    // Spark's behavior. Replay limit: object KEYS containing '"' break
    // the quoted json path (the engine classifies them fine).
    "events_scrub_props" -> """
      WITH c AS MATERIALIZED (
        SELECT event_type, props,
          CASE WHEN props IS NULL THEN 'null'
               WHEN NOT json_valid(props) THEN 'notobject'
               WHEN json_type(props) <> 'OBJECT' THEN 'notobject'
               ELSE 'object' END AS c0
        FROM events),
      obj AS MATERIALIZED (
        SELECT event_type, props FROM c WHERE c0 = 'object'),
      objcls AS (
        SELECT event_type,
          CASE WHEN len(json_keys(props)) <>
                 len(list_distinct(json_keys(props))) THEN 'dupkey'
               WHEN len(list_filter(json_keys(props),
              k -> NOT (json_type(props, '$."' || k || '"') = 'BIGINT'
                OR (json_type(props, '$."' || k || '"') = 'UBIGINT'
                  AND TRY_CAST(json_extract_string(props, '$."' || k || '"')
                    AS BIGINT) IS NOT NULL)))) > 0 THEN 'untyped'
            ELSE 'ok' END AS props_class,
          TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
        FROM obj),
      allcls AS (
        SELECT event_type, c0 AS props_class, CAST(NULL AS BIGINT) AS kv
        FROM c WHERE c0 <> 'object'
        UNION ALL
        SELECT event_type, props_class, kv FROM objcls)
      SELECT event_type, props_class, count(*) AS n,
        CAST(sum(CASE WHEN props_class = 'ok' THEN kv END) AS BIGINT)
          AS sum_k
      FROM allcls
      GROUP BY event_type, props_class
      ORDER BY event_type, props_class""",

    "docs_stratified_sample" -> """
      SELECT lang, rn, doc_id FROM (
        SELECT lang, doc_id,
          CAST(row_number() OVER (
            PARTITION BY lang
            ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT), doc_id) AS BIGINT) AS rn
        FROM documents) t
      WHERE rn <= 50
      ORDER BY lang NULLS LAST, rn""",

    "text_tfidf_top" -> """
      WITH tok AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'), w -> len(w) > 0)) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
             GROUP BY doc_id, term),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
          (tf.tf * 1000000) // df.df AS score
        FROM tf JOIN df ON tf.term = df.term),
      ranked AS (
        SELECT doc_id, term, tf, df, score,
          CAST(row_number() OVER (
            PARTITION BY doc_id
            ORDER BY score DESC, term ASC) AS BIGINT) AS rn
        FROM scored)
      SELECT doc_id, rn, term, CAST(tf AS BIGINT) AS tf,
        CAST(df AS BIGINT) AS df, CAST(score AS BIGINT) AS score
      FROM ranked
      WHERE rn <= 5
      ORDER BY doc_id, rn""",

    "docs_truncate_tokens" -> """
      WITH t AS (SELECT doc_id, string_split_regex(text, '[ \t\n\x0B\f\r]+') AS ws
                 FROM documents)
      SELECT doc_id,
        array_to_string(ws[1:128], ' ') AS text_trunc,
        CAST(least(len(ws), 128) AS BIGINT) AS n_tokens_kept,
        len(ws) > 128 AS truncated
      FROM t
      ORDER BY doc_id""",

    // chunk arithmetic replicated on DuckDB's 1-based inclusive list
    // slices: ws[i*48+1 : i*48+64] == Spark slice(ws, i*48+1, 64); both
    // clamp at the array end. range(0, NULL) unnests to zero rows, which
    // is Spark's explode(NULL) — null-text docs vanish in both engines.
    "docs_chunk_overlap" -> """
      WITH t AS (
        SELECT doc_id, string_split_regex(text, '[ \t\n\x0B\f\r]+') AS ws
        FROM documents),
      m AS (
        SELECT doc_id, ws, len(ws) AS n,
          CASE WHEN len(ws) <= 64 THEN 1
               ELSE (len(ws) - 64 + 47) // 48 + 1 END AS n_chunks
        FROM t),
      c AS (
        SELECT doc_id, ws, n, unnest(range(0, n_chunks)) AS chunk_id
        FROM m)
      SELECT doc_id, chunk_id,
        CAST(least(n - chunk_id * 48, 64) AS BIGINT) AS n_tokens,
        array_to_string(ws[(chunk_id * 48 + 1):(chunk_id * 48 + 64)], ' ')
          AS chunk_text
      FROM c
      ORDER BY doc_id, chunk_id""",

    "docs_clean_corpus" -> s"""
      WITH keep AS (
        SELECT min(doc_id) AS doc_id
        FROM documents
        GROUP BY $fpExprSql),
      q AS (
        SELECT doc_id, lang,
          len(list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'),
                          w -> len(w) > 0)) AS n_words,
          len(list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'),
                          w -> w = 'the' OR w = 'a' OR w = 'of')) AS n_stop
        FROM documents)
      SELECT q.doc_id, q.lang, CAST(q.n_words AS BIGINT) AS n_words
      FROM q JOIN keep ON keep.doc_id = q.doc_id
      WHERE q.n_words >= 20 AND CAST(q.n_stop AS DOUBLE) / q.n_words < 0.4
      ORDER BY q.doc_id""",

    "part_fuzzy_match" -> """
      WITH p AS (
        SELECT p_partkey, p_name, p_brand,
          (string_split(p_name, ' '))[-1] AS noun
        FROM part),
      d AS (
        SELECT a.p_partkey, b.p_partkey AS nn_partkey,
          CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM p a
        JOIN p b ON a.p_brand = b.p_brand AND a.noun = b.noun
                AND a.p_partkey <> b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 3),
      r AS (
        SELECT p_partkey, nn_partkey, dist,
          row_number() OVER (PARTITION BY p_partkey
                             ORDER BY dist, nn_partkey) AS rn
        FROM d)
      SELECT p_partkey, nn_partkey, dist FROM r
      WHERE rn = 1
      ORDER BY p_partkey""",

    "docs_feature_hash" -> """
      WITH tok AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'), w -> len(w) > 0)) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
             GROUP BY doc_id, term)
      SELECT doc_id,
        CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) % 64 AS bucket,
        CAST(sum(tf) AS BIGINT) AS weight
      FROM tf
      GROUP BY doc_id, bucket
      ORDER BY doc_id, bucket""",

    // the hashed-feature linear scorer replayed on the shared md5 bucket
    // convention; weights are the same centered multiplicative hash, raw
    // stays integer, the keep gate compares raw to 0 (never the float);
    // the CTE chain is shared with the quality sampler's oracle
    "docs_classifier_score" -> s"""
      WITH $classifierRawCtes
      SELECT doc_id, n_tokens, raw,
        CAST(raw AS DOUBLE) / n_tokens AS score,
        CAST(CASE WHEN raw >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM sc
      ORDER BY doc_id""",

    // the same scorer thinned per band: integer band boundaries
    // (raw vs -100·n_tokens), Bernoulli-by-hash keep, HUGEINT token
    // sums cast at the edge
    "docs_quality_sample" -> s"""
      WITH $classifierRawCtes,
      banded AS (
        SELECT doc_id, n_tokens,
          CASE WHEN raw >= 0 THEN 'high'
               WHEN raw >= n_tokens * -100 THEN 'mid'
               ELSE 'low' END AS band,
          CASE WHEN raw >= 0 THEN 100
               WHEN raw >= n_tokens * -100 THEN 50
               ELSE 10 END AS rate_pct,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) % 100 AS hb
        FROM sc)
      SELECT band, CAST(rate_pct AS BIGINT) AS rate_pct,
        count(*) AS n_total,
        CAST(sum(CASE WHEN hb < rate_pct THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
        CAST(sum(CASE WHEN hb < rate_pct THEN n_tokens ELSE 0 END)
          AS BIGINT) AS tokens_kept
      FROM banded
      GROUP BY band, rate_pct
      ORDER BY band""",

    "docs_decontaminate" -> s"""
      WITH ${Dedup.hashedShingleCtes},
      bench AS (SELECT DISTINCT h FROM hinv WHERE doc_id % 20 = 0)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
      FROM hinv JOIN bench USING (h)
      WHERE doc_id % 20 <> 0
      GROUP BY doc_id
      ORDER BY doc_id""",

    // identical to docs_decontaminate's oracle: the bloom prefilter is
    // plan-level only — the exact-confirm join makes the result set equal
    "docs_decontam_bloom" -> s"""
      WITH ${Dedup.hashedShingleCtes},
      bench AS (SELECT DISTINCT h FROM hinv WHERE doc_id % 20 = 0)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
      FROM hinv JOIN bench USING (h)
      WHERE doc_id % 20 <> 0
      GROUP BY doc_id
      ORDER BY doc_id""",

    // vocab cut replayed with the identical (cnt desc, term asc) order
    "docs_vocab_oov" -> """
      WITH tok AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'), w -> len(w) > 0)) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
             GROUP BY doc_id, term),
      vocab AS (
        SELECT term FROM (
          SELECT term, sum(tf) AS cnt FROM tf GROUP BY term
          ORDER BY cnt DESC, term ASC LIMIT 100)),
      tot AS (SELECT doc_id, sum(tf) AS n_tokens FROM tf GROUP BY doc_id),
      inv AS (SELECT tf.doc_id, sum(tf.tf) AS n_inv FROM tf
              JOIN vocab USING (term) GROUP BY tf.doc_id)
      SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens,
        CAST(t.n_tokens - coalesce(i.n_inv, 0) AS BIGINT) AS n_oov,
        CAST(((t.n_tokens - coalesce(i.n_inv, 0)) * 1000000) // t.n_tokens
          AS BIGINT) AS oov_grid
      FROM tot t LEFT JOIN inv i ON i.doc_id = t.doc_id
      ORDER BY t.doc_id""",

    // bin() digit count is the same exact integer in DuckDB; length() is
    // codepoints in both engines
    "docs_length_histogram" -> """
      WITH t AS (SELECT CAST(length(text) AS BIGINT) AS n FROM documents)
      SELECT CAST(length(bin(n)) AS BIGINT) AS bucket,
        count(*) AS n_docs,
        CAST(sum(n) AS BIGINT) AS sum_chars,
        min(n) AS min_chars,
        max(n) AS max_chars
      FROM t
      WHERE n IS NOT NULL AND n > 0
      GROUP BY bucket
      ORDER BY bucket""",

    // the four stage oracles composed (fpExprSql is the shared
    // fingerprint expression — an interpolated twin of the plain-string
    // form in the dedup oracles): exact-dedup keep set → quality →
    // shingle decontamination (≥5 shared) → subset-df-capped Jaccard
    // prune → per-source attrition counts. hinv/hsz come from the shared
    // hashedShingleCtes (full corpus); every stage restriction happens by
    // id-set join, and the near-dup df cap is recomputed on the survivor
    // subset exactly as the engine does.
    // the shared stage CTEs classified per document by the first
    // missing survivor set
    "docs_curation_disposition" -> s"""
      WITH $curationStageCtes
      SELECT r.doc_id,
        CASE WHEN k.doc_id IS NULL THEN 'exact_dup'
             WHEN q.doc_id IS NULL THEN 'quality'
             WHEN s3.doc_id IS NULL THEN 'decontaminated'
             WHEN f.doc_id IS NULL THEN 'near_dup'
             ELSE 'kept' END AS disposition
      FROM raw r
      LEFT JOIN keep k ON k.doc_id = r.doc_id
      LEFT JOIN qual q ON q.doc_id = r.doc_id
      LEFT JOIN surv3 s3 ON s3.doc_id = r.doc_id
      LEFT JOIN final f ON f.doc_id = r.doc_id
      ORDER BY r.doc_id""",

    // the curation chain + packing window, both shared texts composed
    "docs_training_manifest" -> s"""
      WITH $curationStageCtes,
      pk_t AS (SELECT doc_id, n_words AS n_tok,
              CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) % 8 AS shard
            FROM final),
      pk_w AS (SELECT shard, doc_id, n_tok,
              coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS start_tok
            FROM pk_t)
      SELECT shard, CAST(start_tok // 512 AS BIGINT) AS pack,
        count(*) AS n_docs,
        CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM pk_w
      GROUP BY 1, 2
      ORDER BY shard, pack""",

    "docs_curation_pipeline" -> s"""
      WITH $curationStageCtes,
      p_raw AS (SELECT source, count(*) AS n_raw FROM raw GROUP BY source),
      p_exact AS (SELECT r.source, count(*) AS n FROM raw r
                  JOIN keep k ON k.doc_id = r.doc_id GROUP BY r.source),
      p_q AS (SELECT r.source, count(*) AS n FROM raw r
              JOIN qual q ON q.doc_id = r.doc_id GROUP BY r.source),
      p_d AS (SELECT r.source, count(*) AS n FROM raw r
              JOIN surv3 s3 ON s3.doc_id = r.doc_id GROUP BY r.source),
      p_f AS (SELECT r.source, count(*) AS n, sum(f.n_words) AS tok
              FROM raw r JOIN final f ON f.doc_id = r.doc_id
              GROUP BY r.source)
      SELECT p_raw.source, p_raw.n_raw,
        coalesce(p_exact.n, 0) AS n_exact,
        coalesce(p_q.n, 0) AS n_quality,
        coalesce(p_d.n, 0) AS n_decontam,
        coalesce(p_f.n, 0) AS n_final,
        CAST(coalesce(p_f.tok, 0) AS BIGINT) AS n_tokens_final
      FROM p_raw
      LEFT JOIN p_exact ON p_exact.source = p_raw.source
      LEFT JOIN p_q ON p_q.source = p_raw.source
      LEFT JOIN p_d ON p_d.source = p_raw.source
      LEFT JOIN p_f ON p_f.source = p_raw.source
      ORDER BY p_raw.source""",

    // same grid: HUGEINT products, abs-deviation sum, one integer div
    "docs_source_tvd" -> """
      WITH cnt AS (
        SELECT source, lang, count(*) AS n_sl FROM documents
        WHERE source IS NOT NULL AND lang IS NOT NULL
        GROUP BY source, lang),
      ns AS (SELECT source, sum(n_sl) AS n_s FROM cnt GROUP BY source),
      cl AS (SELECT lang, sum(n_sl) AS c_l FROM cnt GROUP BY lang),
      tot AS (SELECT sum(n_sl) AS n FROM cnt),
      g AS (
        SELECT ns.source, ns.n_s, cl.lang, cl.c_l,
          coalesce(cnt.n_sl, 0) AS n_sl
        FROM ns CROSS JOIN cl
        LEFT JOIN cnt ON cnt.source = ns.source AND cnt.lang = cl.lang)
      SELECT g.source, CAST(g.n_s AS BIGINT) AS n_docs,
        CAST((sum(abs(CAST(g.n_sl AS HUGEINT) * t.n - g.n_s * g.c_l))
            * 1000000) // (2 * g.n_s * t.n) AS BIGINT) AS tvd_grid
      FROM g CROSS JOIN tot t
      GROUP BY g.source, g.n_s, t.n
      ORDER BY g.source""",

    "docs_mixture_sample" -> """
      WITH t AS (
        SELECT source,
          25 + CAST(('0x' || substr(md5(source), 1, 15)) AS BIGINT) % 51
            AS rate_pct,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) % 100 AS hb
        FROM documents)
      SELECT source, rate_pct, count(*) AS n_total,
        CAST(sum(CASE WHEN hb < rate_pct THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept
      FROM t
      GROUP BY source, rate_pct
      ORDER BY source""",

    // isqrt replayed with the same floor(sqrt(double)) + integer
    // compare-adjust; the HUGEINT window sums are cast back at the edge
    "docs_mixture_temperature" -> """
      WITH src AS (
        SELECT source, count(*) AS n_docs
        FROM documents WHERE source IS NOT NULL
        GROUP BY source),
      w0 AS (SELECT source, n_docs,
          CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS r0
        FROM src),
      wts AS (SELECT source, n_docs,
          CASE WHEN (r0 + 1) * (r0 + 1) <= n_docs THEN r0 + 1
               WHEN r0 * r0 > n_docs THEN r0 - 1
               ELSE r0 END AS wt
        FROM w0),
      tot AS (SELECT source, n_docs, wt,
          sum(n_docs) OVER () AS sn, sum(wt) OVER () AS sw,
          (200 * wt) // sum(wt) OVER () AS base,
          (200 * wt) % sum(wt) OVER () AS rem
        FROM wts),
      q AS (SELECT source, n_docs, wt, sn, sw, base,
          row_number() OVER (ORDER BY rem DESC, source) AS rrank,
          200 - sum(base) OVER () AS extra
        FROM tot)
      SELECT source, n_docs, CAST(wt AS BIGINT) AS wt,
        CAST((1000000 * n_docs) // sn AS BIGINT) AS share_ppm,
        CAST((1000000 * wt) // sw AS BIGINT) AS temp_ppm,
        CAST(base + CASE WHEN rrank <= extra THEN 1 ELSE 0 END AS BIGINT)
          AS quota
      FROM q
      ORDER BY source""",

    // the DuckDB windows sum BIGINT into HUGEINT — every comparison and
    // the final quota stay integer-exact, matching Spark's long windows
    "docs_budget_sample" -> """
      WITH src AS (
        SELECT source,
          25 + CAST(('0x' || substr(md5(source), 1, 15)) AS BIGINT) % 51
            AS wt
        FROM documents WHERE source IS NOT NULL
        GROUP BY source),
      alloc AS (
        SELECT source, wt,
          (100 * wt) // sum(wt) OVER () AS base,
          (100 * wt) % sum(wt) OVER () AS rem
        FROM src),
      q AS (
        SELECT source, base, rem,
          row_number() OVER (ORDER BY rem DESC, source) AS rrank,
          100 - sum(base) OVER () AS extra
        FROM alloc),
      quota AS (
        SELECT source,
          CAST(base + CASE WHEN rrank <= extra THEN 1 ELSE 0 END AS BIGINT)
            AS quota
        FROM q),
      ranked AS (
        SELECT source, doc_id,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1,
              15)) AS BIGINT), doc_id) AS BIGINT) AS rn
        FROM documents WHERE source IS NOT NULL)
      SELECT r.source, q.quota, r.rn, r.doc_id
      FROM ranked r JOIN quota q USING (source)
      WHERE r.rn <= q.quota
      ORDER BY r.source, r.rn""",

    "events_range_join" -> """
      WITH win AS (
        SELECT r.range AS w_id,
          1704067200000000 + r.range * 10800000000 AS start_us,
          1704067200000000 + r.range * 10800000000
            + ((r.range % 5) + 1) * 3600000000 AS end_us
        FROM range(0, 100) r),
      e AS (SELECT event_id, epoch_us(ts) AS pt_us, value FROM events)
      SELECT w.w_id, count(*) AS n_events,
        CAST(sum(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
          / 100.0 AS sum_value
      FROM win w
      JOIN e ON e.pt_us >= w.start_us AND e.pt_us < w.end_us
      GROUP BY w.w_id
      ORDER BY w.w_id"""
  )
}
