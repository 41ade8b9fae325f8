package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

private[graft] trait LlmQueries extends RegistryBase {
  import Pipelines._
  import graft.rel.{Analytics, Relational, Sessionize, Sketches}
  import graft.export.Export

  /** Training-data pipeline operators (text analysis, dedup family,
    * similarity search, multimodal plumbing) — every one oracle-checked.
    */
  val llm: Seq[Q] = {
    import graft.text.TextOps
    import graft.dedup.Dedup
    import graft.sim.{Knn, PcaFixture, PqFixture, SemDedupFixture}
    import graft.multimodal.Multimodal
    def docs(s: SparkSession, dir: String) = TestdataAdapter.table(s, dir, "documents")
    def embs(s: SparkSession, dir: String) = TestdataAdapter.table(s, dir, "embeddings")
    Seq(
      Q("text_stats", (s, d) => TextOps.textStats(docs(s, d)), Some(TextOps.textStatsSql)),
      Q("token_counts", (s, d) => TextOps.tokenCounts(docs(s, d)), Some(TextOps.tokenCountsSql)),
      Q("lang_id", (s, d) => TextOps.languageId(docs(s, d)), Some(TextOps.languageIdSql)),
      Q("doc_fingerprint", (s, d) => TextOps.fingerprint(docs(s, d)), Some(TextOps.fingerprintSql)),
      Q("tfidf_top_terms", (s, d) => TextOps.tfidfTopTerms(docs(s, d)),
        Some(TextOps.tfidfTopTermsSql())),
      Q("bigram_topk", (s, d) => TextOps.bigramTopK(docs(s, d)),
        Some(TextOps.bigramTopKSql())),
      // BM25 retrieval: fixed query set scored against the corpus, top-k
      // docs per query — query-term pruning pushed below the tf shuffle
      Q("search_bm25", (s, d) => TextOps.searchBm25(docs(s, d)),
        Some(TextOps.searchBm25Sql())),
      // Hybrid retrieval: BM25 candidates ∪ dense-cosine candidates per
      // query, fused by Reciprocal Rank Fusion (1/(60+rank) per leg) —
      // the standard two-tower retrieval re-rank, both legs and the
      // fusion oracle-exact (integer-denominator double divisions summed
      // in fixed order)
      Q("hybrid_search_rrf",
        (s, d) => Knn.hybridSearchRrf(docs(s, d), embs(s, d)),
        Some(Knn.hybridSearchRrfSql())),
      // Zipf / vocab-coverage curve: top-k vocabulary + cumulative share
      // of all token occurrences (tokenizer-vocab sizing)
      Q("vocab_coverage", (s, d) => TextOps.vocabCoverage(docs(s, d)),
        Some(TextOps.vocabCoverageSql())),
      // BPE merge-pair counting: char-pair frequencies weighted by word
      // frequency — the argmax step of tokenizer training
      Q("bpe_merge_pairs", (s, d) => TextOps.bpeMergePairs(docs(s, d)),
        Some(TextOps.bpeMergePairsSql())),
      // full BPE trainer: one distributed word-count pass + driver-side
      // merge loop over the vocab-sized working set — ORACLE-EXACT
      // (promoted r12): the bounded loop unrolls into per-step DuckDB
      // CTEs (pair-count → tie-broken argmax → delimited-string merge
      // apply), replaying the trainer merge-for-merge. The driver
      // collect is bounded by minCount/maxVocab at scale (defaults off
      // here — sf corpora are small; the spec pins floor/cap effects).
      Q("bpe_train", (s, d) => TextOps.bpeTrain(docs(s, d)),
        Some(TextOps.bpeTrainSql())),
      // Unigram-LM (SentencePiece-style) trainer (r16, VERDICT item 4)
      // — the second published tokenizer family: substring seed vocab →
      // N hard-EM rounds (Viterbi segmentation of the distinct-word
      // table under scaled-BIGINT log-prob scores → usage counts →
      // prune to the cap + add-one re-estimate). The oracle replays the
      // WHOLE loop: the Viterbi DP unrolls per character position with
      // the trainer's exact (score DESC, backpointer ASC) tie-break,
      // and the ln() arithmetic sits on the proven round(·,9) seam
      // quantized to BIGINT before any comparison.
      Q("unigram_train",
        (s, d) => graft.text.Unigram.unigramTrain(docs(s, d)),
        Some(graft.text.Unigram.unigramTrainSql())),
      // ...and the served encoder: one more Viterbi pass under the
      // final vocab, per-word piece counts broadcast onto the exploded
      // corpus, per-document rollup (words past the trained length
      // bound excluded, both engines).
      Q("unigram_encode_stats",
        (s, d) => graft.text.Unigram.unigramEncodeStats(docs(s, d)),
        Some(graft.text.Unigram.unigramEncodeStatsSql())),
      // tokenizer APPLY, ORACLE-EXACT at the pinned merge table
      // (promoted r11): the merge table is the committed trained
      // artifact (BpeFixture — bpeTrain's sf0.01 output, provenance
      // spec-pinned; a tokenizer's merges are THE canonical frozen
      // model file), and the greedy apply is replayed merge-for-merge
      // by a DuckDB RECURSIVE CTE over symbol lists. The
      // in-query-trained apply stays spec-asserted (CorpusOpsSpec).
      Q("bpe_encode_stats",
        (s, d) => TextOps.bpeEncodeStatsPinned(docs(s, d),
          graft.text.BpeFixture.merges),
        Some(TextOps.bpeEncodeStatsPinnedSql(graft.text.BpeFixture.merges))),
      Q("repetition_stats", (s, d) => TextOps.repetitionStats(docs(s, d)),
        Some(TextOps.repetitionStatsSql)),
      // CCNet-style LM quality signal: per-doc cross-entropy under the
      // corpus-trained add-1 bigram model
      Q("bigram_lm_nll", (s, d) => TextOps.bigramLmScore(docs(s, d)),
        Some(TextOps.bigramLmScoreSql)),
      // CCNet head/middle/tail perplexity terciles per predicted lang,
      // tier cut by the distributed grouped NTILE (Scale.ntileExactBy)
      Q("ccnet_buckets", (s, d) => TextOps.ccnetBuckets(docs(s, d)),
        Some(TextOps.ccnetBucketsSql)),
      Q("domain_mixture", (s, d) => TextOps.domainMixture(docs(s, d)),
        Some(TextOps.domainMixtureSql)),

      Q("temperature_mixture", (s, d) => TextOps.temperatureMixture(docs(s, d)),
        Some(TextOps.temperatureMixtureSql())),
      // mixture diagnostics: per-source unigram KL vs the corpus mix +
      // per-source entropy (detSum-rounded log terms, decimal-summed)
      Q("source_kl_divergence", (s, d) => TextOps.sourceKlDivergence(docs(s, d)),
        Some(TextOps.sourceKlDivergenceSql)),
      // per-source distinct/total n-gram ratios for n=1..3 in one pass
      Q("ngram_diversity", (s, d) => TextOps.ngramDiversity(docs(s, d)),
        Some(TextOps.ngramDiversitySql)),
      Q("doc_chunks", (s, d) => TextOps.chunkDocuments(docs(s, d)),
        Some(TextOps.chunkDocumentsSql())),
      // concat-and-cut sequence packing: per-doc context-window placement
      // + fragmentation flags (distributed prefix sum, no global window)
      Q("packed_sequences", (s, d) => TextOps.packedSequences(docs(s, d)),
        Some(TextOps.packedSequencesSql())),
      // benchmark = doc_id % 100 = 7 stands in for a real eval-suite
      // table; the operator takes any two document frames
      Q("decontamination",
        (s, d) => Dedup.contaminationReport(
          docs(s, d).filter(col("doc_id") % 100 =!= 7),
          docs(s, d).filter(col("doc_id") % 100 === 7)),
        Some(Dedup.contaminationReportSql)),
      // the published 13-gram exact-collision standard (r10): the same
      // broadcast shape at the width the decontamination literature
      // actually uses — the 3-gram form is near-dup-grade sensitivity,
      // this one flags only long verbatim overlaps
      Q("decontamination_13gram",
        (s, d) => Dedup.contaminationReportNgram(
          docs(s, d).filter(col("doc_id") % 100 =!= 7),
          docs(s, d).filter(col("doc_id") % 100 === 7)),
        Some(Dedup.contaminationReportNgramSql())),
      // C4-style mechanical normalization (quotes/dashes/control/ws) —
      // identity on the already-clean synthetic corpus, behavior
      // spec-asserted on dirty strings
      Q("normalize_text", (s, d) => TextOps.normalizeText(docs(s, d)),
        Some(TextOps.normalizeTextSql)),
      // r14: HTML → text extraction (the web-corpus front door) — the
      // generator wraps each doc's text in a full entity-escaped page
      // (head/nav/script/style boilerplate, bold wraps, entity traps)
      // and the extractor must invert it exactly; the oracle computes
      // the expected round trip straight from the source text
      Q("html_extract",
        (s, d) => TextOps.extractHtmlText(TextOps.htmlCorpus(docs(s, d))),
        Some(TextOps.extractHtmlTextSql)),
      // r15 (VERDICT item 2): the STRUCTURE the text extractor discards —
      // title, canonical host, every anchor (href + text, document
      // order) — recovered by a columnar regexp chain over the same raw
      // markup; the oracle recomputes the expected structure straight
      // from the generator's link arithmetic
      Q("html_links",
        (s, d) => graft.text.WebGraph.htmlLinks(TextOps.htmlCorpus(docs(s, d))),
        Some(graft.text.WebGraph.htmlLinksSql)),
      // r15: URL canonicalization — the FIRST dedup of any crawl is at
      // the URL. The generator writes each link in one of four real-web
      // spellings (case + default port, dot segments + fragment,
      // unsorted + tracking query); the columnar normalizer must
      // collapse every spelling to the arithmetic-derived canonical
      // form, relative nav links passing through untouched
      Q("url_normalize",
        (s, d) => graft.text.WebGraph.urlNormalize(
          graft.text.WebGraph.htmlLinks(TextOps.htmlCorpus(docs(s, d)))),
        Some(graft.text.WebGraph.urlNormalizeSql)),
      // ...and the curation signal on top: host-level link graph →
      // fixed-iteration weighted PageRank in QUANTIZED BIGINT (rank
      // numerators at 10^12, floor-division contributions, ×85 div 100
      // damping — order-free, so 5 unrolled iterations hash-gate
      // bit-for-bit against the SQL twin)
      Q("link_authority",
        (s, d) => graft.text.WebGraph.linkAuthority(TextOps.htmlCorpus(docs(s, d))),
        Some(graft.text.WebGraph.linkAuthoritySql())),
      // ...composed into the signal the graph exists for: per-doc
      // quality weighted by host authority (authority up-weights
      // well-linked hosts; no-in-link spam farms sink). The hosts-sized
      // authority frame BROADCASTS onto the documents scan.
      Q("authority_weighted_quality",
        (s, d) => graft.text.WebGraph.authorityWeightedQuality(docs(s, d)),
        Some(graft.text.WebGraph.authorityWeightedQualitySql())),
      // ...and the graph family's MAINTENANCE loop (the %3 carve): a
      // crawl batch folds into the edge state and authority refreshes
      // by WARM-STARTING the power iteration from the prior ranks (2
      // steps) instead of recomputing; prior/warm/full ranks AND the
      // exact integer gaps |warm−full| vs |prior−full| sit inside one
      // hash — the convergence evidence is the query output
      Q("link_authority_incremental",
        (s, d) => graft.text.WebGraph.linkAuthorityIncremental(docs(s, d)),
        Some(graft.text.WebGraph.linkAuthorityIncrementalSql())),
      // ...and the family's full PRODUCTION loop as running disk state
      // (r16, VERDICT item 1): versioned edge-state + rank-state, per
      // batch an edge merge + warm-start refresh, a CONVERGENCE verdict
      // (one probe step — the drift-gate analogue), and a full
      // recompute GATED on the probe residual. This is the in-plan
      // BATCH twin; `streaming_link_authority` runs the identical
      // maintenanceStep fold over graftqueue micro-batches under the
      // SAME oracle, so stream ≡ batch is itself hash-checked. The
      // oracle encodes the gate structurally both ways: the ranks
      // serving batch 2 union warm-rows (gate closed) with
      // full-recompute rows (gate open), so a gate disagreement
      // corrupts report 2 and fails the hash loudly.
      Q("link_authority_maintenance",
        (s, d) => graft.text.WebGraphMaintenance.maintenanceBatch(s, d),
        Some(graft.text.WebGraphMaintenance.maintenanceCarveSql())),
      // the same fold on REAL transport: crawl-delta document batches
      // ride the queue as JSON envelopes and drain offset-ordered;
      // crash recovery proven by WebGraphMaintenanceSpec's
      // kill-between-verdict-and-state leg. Memoized state dir
      // amortizes the corpus seed across reps (the dedup-stream rule).
      Q("streaming_link_authority",
        (s, d) => graft.streaming.WebGraphStream.webGraphQueueStream(s, d,
          stateDir = Some(memo(dedupStreamStateDirs)(("wgq", d))(
            java.nio.file.Files.createTempDirectory("graft_wgq_state").toString))),
        Some(graft.text.WebGraphMaintenance.maintenanceCarveSql())),
      // ...and the retrain-FIRING leg: batch 1 is a spam-burst link
      // farm (a never-seen host absorbing a huge share of every host's
      // out-mass — the warm refresh cannot re-converge, the gate MUST
      // fire and the serving ranks recompute from init), batch 2 a
      // small organic delta against the retrained state (gate closed
      // again). Both gate directions sit inside one hash, plus the
      // new-host cold start.
      Q("link_authority_retrain",
        (s, _) => graft.text.WebGraphMaintenance.maintenanceRetrain(s),
        Some(graft.text.WebGraphMaintenance.maintenanceRetrainSql())),
      Q("props_redacted",
        (s, d) => TextOps.redactDigits(TestdataAdapter.table(s, d, "events"), "props"),
        Some(TextOps.redactDigitsSql("props"))),
      // PII scrub: planted emails/IPs/phones detected, counted, and
      // redacted; the whole scrubbed text is md5-compared cross-engine
      Q("pii_scrub", (s, d) => graft.text.Pii.piiScrub(docs(s, d)),
        Some(graft.text.Pii.piiScrubSql)),
      // Per-domain cap — "keep at most K best-quality docs per source",
      // the curation rule that stops one domain from dominating a
      // training mix — through the custom bounded-heap top-k operator
      // (O(n log k), no per-partition sort at corpus scale); the oracle
      // is the window+filter form it replaces
      Q("domain_cap",
        (s, d) => {
          graft.GraftExtensions.register(s)
          val scored = docs(s, d).select(
            col("doc_id"), col("source"), col("n_chars"),
            TextOps.qualityScore(col("text")).as("quality_score"))
          graft.plans.TopKPerGroup.topK(scored,
            groupCols = Seq("source"),
            orderCols = Seq("quality_score" -> true, "doc_id" -> false),
            k = 10)
            .orderBy(col("source"), col("quality_score").desc, col("doc_id"))
        },
        Some(
          s"""WITH s AS (
             |  SELECT doc_id, source, n_chars,
             |    ${TextOps.qualityScoreSqlExpr} AS quality_score
             |  FROM documents)
             |SELECT doc_id, source, n_chars, quality_score FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
             |    ORDER BY quality_score DESC, doc_id) AS rn
             |  FROM s) WHERE rn <= 10
             |ORDER BY source, quality_score DESC, doc_id""".stripMargin)),
      Q("doc_simhash", (s, d) => TextOps.simhash(docs(s, d)), Some(TextOps.simhashSql)),
      Q("dedup_exact", (s, d) => Dedup.exact(docs(s, d)), Some(Dedup.exactSql)),
      Q("dedup_keep", (s, d) => Dedup.dedupKeep(docs(s, d)), Some(Dedup.dedupKeepSql)),
      // end-to-end corpus filter: dedup representative → quality floor →
      // language allowlist, one shuffle total
      Q("corpus_filter", (s, d) => Dedup.corpusFilter(docs(s, d)),
        Some(Dedup.corpusFilterSql())),
      // one-row corpus accounting: doc/token mass, dedup savings,
      // quality+lang survival — the report a curation run prints
      Q("corpus_stats", (s, d) => Dedup.corpusStats(docs(s, d)),
        Some(Dedup.corpusStatsSql())),
      // the full curation pass fused into one plan: scrub → length floor
      // → exact dedup of cleaned text → quality + language filters.
      // minQuality=0.05: the synthetic corpus' tiny vocabulary makes the
      // scrub strip ~92% of tokens, so the floor is set relative to the
      // post-scrub token mass (quality ≈ n_tokens/100 here)
      Q("corpus_curate", (s, d) => Dedup.curateCorpus(docs(s, d), minQuality = 0.05),
        Some(Dedup.curateCorpusSql(minQuality = 0.05))),
      // Gopher/C4 rule-by-rule curation flags (minWords=30 so the
      // 10-99-word synthetic docs exercise both outcomes) + the
      // per-source failure report
      Q("quality_rule_flags", (s, d) => TextOps.qualityRuleFlags(docs(s, d)),
        Some(TextOps.qualityRuleFlagsSql())),
      Q("quality_rule_report", (s, d) => TextOps.qualityRuleReport(docs(s, d)),
        Some(TextOps.qualityRuleReportSql())),
      Q("minhash_signatures", (s, d) => Dedup.minhashSignatures(docs(s, d)),
        Some(Dedup.minhashSignaturesSql)),
      Q("dedup_minhash_pairs", (s, d) => Dedup.minhashPairs(docs(s, d)),
        Some(Dedup.minhashPairsSql)),
      // r14: LSH banding calibration — actual + S-curve-expected capture
      // per (bands × rows) factorization of the same 8-hash signatures,
      // over the shipping banding's pair frame (never all-pairs); the
      // expected side crosses engines as exact BIGINT numerators /8^8
      Q("lsh_band_calibration", (s, d) => Dedup.lshBandCalibration(docs(s, d)),
        Some(Dedup.lshBandCalibrationSql)),
      Q("dedup_ngram_jaccard", (s, d) => Dedup.ngramJaccard(docs(s, d)),
        Some(Dedup.ngramJaccardSql)),

      Q("split_leakage", (s, d) => Dedup.splitLeakage(docs(s, d)),
        Some(Dedup.splitLeakageSql())),
      // overlap-coefficient leg over the same LSH candidates: the
      // quote/excerpt (asymmetric containment) catches Jaccard misses
      Q("dedup_containment", (s, d) => Dedup.containmentPairs(docs(s, d)),
        Some(Dedup.containmentPairsSql())),
      Q("dedup_clusters", (s, d) => Dedup.dedupClusters(docs(s, d)),
        Some(Dedup.dedupClustersSql)),
      // one representative per near-dup cluster — the keep list the
      // approximate-dedup pipeline actually ships
      // rides the amortized label state (r11): the keep list's point is
      // the representative rule, not the clustering — `dedup_clusters`
      // still times the CC pipeline honestly
      Q("near_dedup_keep", (s, d) => Dedup.nearDedupKeepFrom(fullClusterLabels(s, d)),
        Some(Dedup.nearDedupKeepSql)),
      // leakage-free split (r10): split key = near-dup cluster rep, so
      // every transitive near-dup lands in ONE split — cross-split
      // contamination is structurally zero (spec-asserted), not merely
      // audited-small. Both r10 cluster queries read the full-corpus
      // labels persisted once per scale dir (the clusterStateDirs
      // pattern): three queries re-running the same CC pipeline bought
      // nothing, and a deployment reads maintained labels anyway.
      Q("cluster_split_assign",
        (s, d) => Dedup.clusterSplitAssignFrom(fullClusterLabels(s, d)),
        Some(Dedup.clusterSplitAssignSql)),
      // quality-max cluster representative (r10): the near-dup keep list
      // a TRAINING pipeline wants — per cluster, survive the best-quality
      // member, not the lowest id
      Q("cluster_best_keep",
        (s, d) => Dedup.clusterBestKeepFrom(fullClusterLabels(s, d), docs(s, d)),
        Some(Dedup.clusterBestKeepSql)),
      // which sources copy from each other: near-dup pairs per unordered
      // source pair (cluster-local self-join, |sources|²-sized output)
      // rides the amortized label state (r11, same contract): the point
      // is the count combinatorics over per-(cluster,source) aggregates
      Q("source_overlap", (s, d) => Dedup.sourceOverlapFrom(fullClusterLabels(s, d), docs(s, d)),
        Some(Dedup.sourceOverlapSql)),
      // per-source governance dashboard (r10): doc counts, exact- and
      // near-dup exposure (near side reads the maintained label state),
      // language spread, rounded-mean quality, token volume — one row
      // per source, oracle-exact
      Q("corpus_source_report",
        (s, d) => Dedup.sourceGovernanceReport(docs(s, d), fullClusterLabels(s, d)),
        Some(Dedup.sourceGovernanceReportSql)),
      // the ENFORCEMENT half of the governance report (r11): global token
      // budget → per-source quotas proportional to clean (best-keeper)
      // token volume → within-source quality-ordered cap, one plan,
      // integer-exact quota arithmetic; consumes the same amortized
      // label state as the report
      Q("corpus_governed_cap",
        (s, d) => Dedup.governedCap(docs(s, d), fullClusterLabels(s, d)),
        Some(Dedup.governedCapSql())),
      // boilerplate hotspots: 3-grams shared across the most documents
      Q("duplicate_shingles", (s, d) => Dedup.duplicateShingles(docs(s, d)),
        Some(Dedup.duplicateShinglesSql())),
      // span-level boilerplate REMOVAL: rewrite docs with tokens covered
      // by any cross-document duplicated 3-gram stripped (ExactSubstr at
      // shingle granularity)
      Q("boilerplate_scrub", (s, d) => Dedup.boilerplateScrub(docs(s, d)),
        Some(Dedup.boilerplateScrubSql())),
      // substring-level exact dedup with KEEP-FIRST semantics (the
      // published span-dedup pass): every duplicated 8-token span keeps
      // exactly its corpus-first occurrence; later occurrences are
      // scrubbed. One copy of each passage always survives — unlike
      // boilerplate_scrub, which drops template shingles everywhere.
      Q("dup_span_scrub", (s, d) => Dedup.dupSpanScrub(docs(s, d)),
        Some(Dedup.dupSpanScrubSql())),
      // the audit view: maximal merged duplicated spans per document
      Q("dup_span_report", (s, d) => Dedup.dupSpanReport(docs(s, d)),
        Some(Dedup.dupSpanReportSql())),
      // r15 (VERDICT item 5): the PUBLISHED ExactSubstr operating point —
      // duplicated grams merge into MAXIMAL spans first and only spans
      // ≥ 50 tokens scrub (keep-first); shorter incidental repeats
      // survive. The sf0.01 corpus carries spans on BOTH sides of the
      // threshold (93-token verbatim dups down to 31-token repeats), so
      // the gate exercises keep and scrub together; the 49-vs-50
      // boundary itself is pinned in DedupTextSpec.
      Q("dup_span_scrub_l50",
        (s, d) => Dedup.dupSpanScrubMinLen(docs(s, d)),
        Some(Dedup.dupSpanScrubMinLenSql())),
      // incremental batch-vs-corpus dedup: Bloom pre-filter + exact
      // residual join on the bloom-positive slice — the sketch's
      // no-false-negative guarantee makes the composite verdict exact,
      // so it hash-matches a DuckDB anti-join twin; the bloom column
      // itself (engine-specific bits) is dropped here and spec-asserted
      // (corpus = doc_id%3≠0, batch = doc_id%3=0)
      Q("bloom_new_docs",
        (s, d) => Dedup.bloomNewDocs(
          docs(s, d).filter(col("doc_id") % 3 =!= 0),
          docs(s, d).filter(col("doc_id") % 3 === 0)).drop("is_new_bloom"),
        Some(Dedup.bloomNewDocsSql("doc_id % 3 <> 0", "doc_id % 3 = 0"))),
      // The MAINTAINED-index form across two batches (VERDICT r8 item 7):
      // the corpus is scanned once into a DedupIndex whose hash table
      // round-trips through parquet (the persisted-state seam); batch 1
      // is classified against it, folded in via mergeDedupIndex, and
      // batch 2 classified against the UPDATED state — its plan reads
      // only the state parquet, never documents (spec-asserted). Oracle:
      // batch 1 vs corpus, batch 2 vs corpus ∪ batch 1.
      Q("bloom_incremental_newdocs",
        (s, d) => {
          val all = docs(s, d)
          val corpus = all.filter(col("doc_id") % 3 =!= 0)
          val b1 = all.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
          val b2 = all.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)
          val state = java.nio.file.Files.createTempDirectory("graft_dedup_idx").toString
          def persist(idx: Dedup.DedupIndex, v: Int): Dedup.DedupIndex = {
            idx.hashes.write.mode("overwrite").parquet(s"$state/v$v")
            Dedup.DedupIndex(idx.bloomBits, s.read.parquet(s"$state/v$v"))
          }
          val idx0 = persist(Dedup.buildDedupIndex(corpus), 0)
          val v1 = Dedup.bloomNewDocsIncremental(idx0, b1)
          val idx1 = persist(Dedup.mergeDedupIndex(idx0, b1), 1)
          val v2 = Dedup.bloomNewDocsIncremental(idx1, b2)
          v1.withColumn("batch_seq", lit(1))
            .unionByName(v2.withColumn("batch_seq", lit(2)))
            .drop("is_new_bloom")
            .orderBy("doc_id")
        },
        Some(BLOOM_INCR_SQL)),
      // the same maintained index driven by a REAL micro-batch stream
      // under the PRODUCTION ordering contract (r10): foreachBatch
      // classifies each arriving batch against the persisted bloom+hash
      // state, then folds it in — continuous-ingest dedup, verified
      // against the identical two-batch oracle. The batches ride a
      // graftqueue topic as JSON envelopes and drain as offset-ordered
      // micro-batches via the source's Kafka-style admission control
      // (maxRecordsPerTrigger admits whole committed segments) — batch
      // order is the broker's commit order. This is the ONE registered
      // dedup-index stream (r12): the earlier file-source twin pinned
      // mtimes to fake that ordering — its own comment called it a
      // test-harness device — so it now lives only in specs
      // (DedupStreamParitySpec parity, CrashRecoverySpec recovery,
      // ScaleSoakSpec growth), not in the benched registry.
      // The streaming forms get a per-(scale dir, query) cached state
      // dir: the corpus v0 bootstrap (the one expensive part, seeded only
      // if absent) is amortized so repeated runs time the per-batch
      // classify/merge steady state — a deployment maintains the index,
      // it doesn't rebuild it. Separate dirs per query: Verify runs
      // queries concurrently and v1+ overwrites must not race.
      Q("streaming_dedup_index_queue",
        (s, d) => graft.streaming.Streams.dedupIndexQueueStream(s, d,
          stateDir = Some(memo(dedupStreamStateDirs)(("queue", d))(
            java.nio.file.Files.createTempDirectory("graft_dsq_state").toString))),
        Some(BLOOM_INCR_SQL)),
      // the NEAR-dup index under the same continuous-ingest machinery
      // (r11): LSH signature state maintained as base + per-batch
      // disjoint deltas over offset-ordered graftqueue micro-batches;
      // verdicts ≡ the two-batch in-plan lsh_incremental_newdocs, whose
      // DuckDB oracle is reused verbatim; crash recovery proven by
      // CrashRecoverySpec's LSH leg
      Q("streaming_lsh_index",
        (s, d) => graft.streaming.Streams.lshIndexQueueStream(s, d,
          stateDir = Some(memo(dedupStreamStateDirs)(("lshq", d))(
            java.nio.file.Files.createTempDirectory("graft_lshq_state").toString))),
        Some(Dedup.lshIncrementalSql(
          "doc_id % 3 <> 0",
          "doc_id % 3 = 0 AND doc_id % 2 = 0",
          "doc_id % 3 = 0 AND doc_id % 2 <> 0"))),
      // the ANN index under the same continuous-ingest machinery (r15):
      // embedding batches ride the queue as JSON envelopes (float
      // round-trip spec-pinned), each micro-batch runs the SAME
      // maintenanceStep fold as ivf_maintenance_batch — attach to
      // persisted centroid state, drift verdict, delta, gated retrain —
      // under the SAME oracle, so stream ≡ batch is hash-checked; crash
      // recovery proven by IvfMaintenanceSpec's kill-between-verdict-
      // and-delta leg. Memoized state dir amortizes the corpus seed
      // across reps (the dedup-stream rule above).
      Q("streaming_ivf_maintenance",
        (s, d) => graft.streaming.IvfStream.ivfIndexQueueStream(s, d,
          stateDir = Some(memo(dedupStreamStateDirs)(("ivfq", d))(
            java.nio.file.Files.createTempDirectory("graft_ivfq_state").toString))),
        Some(graft.sim.IvfMaintenance.maintenanceCarveSql())),
      // Frozen-model STREAMING INFERENCE: the committed quality model
      // scored over graftqueue micro-batches (3 offset-ordered
      // segments); scoring is stateless per-doc, so the drained union
      // hash-equals the batch scorer — same oracle as
      // quality_score_pinned, proving batch ≡ streaming serving
      Q("streaming_quality_scores",
        (s, d) => graft.streaming.Streams.qualityScoreQueueStream(s, d),
        Some(graft.ml.QualityClassifier.scorePinnedSql(
          graft.ml.QualityFixture.labelThreshold,
          graft.ml.QualityFixture.interceptE9,
          graft.ml.QualityFixture.weightsE9))),
      // Incremental TRANSITIVE clusters: the persisted label table +
      // signature index absorb a new batch exactly — cross edges
      // contract matched corpus docs to their cluster representative,
      // connected components runs on the batch-bounded contracted
      // subgraph only, and corpus labels remap by an id join (existing
      // clusters merge when a batch doc bridges them). Oracle: the SAME
      // full-recompute recursive-CTE closure dedup_clusters verifies
      // against — incremental ≡ from-scratch, bit-for-bit.
      Q("cluster_attach_incremental",
        (s, d) => {
          val all = docs(s, d)
          val corpus = all.filter(col("doc_id") % 3 =!= 0)
          val batch = all.filter(col("doc_id") % 3 === 0)
          // the corpus-side state (labels + signature index) is exactly
          // what a deployment amortizes across batches — build it once
          // per scale dir so repeated runs time the ATTACH, not the
          // state bootstrap
          val state = memo(clusterStateDirs)(d)({
            val p = java.nio.file.Files.createTempDirectory("graft_cc_idx").toString
            Dedup.dedupClusters(corpus).select("doc_id", "cluster_id")
              .write.mode("overwrite").parquet(s"$p/labels")
            Dedup.lshIndex(corpus).write.mode("overwrite").parquet(s"$p/sigs")
            p
          })
          Dedup.attachToClustersWithSizes(
            s.read.parquet(s"$state/labels"),
            s.read.parquet(s"$state/sigs"), batch)
        },
        Some(Dedup.dedupClustersSql)),

      // The NEAR-dup sibling of the maintained exact index: the LSH
      // signature table (8 min-hashes + 4 band keys per doc — bounded
      // state) persisted through parquet; batch 1 classifies against
      // the corpus index via band joins + signature-agreement Jaccard
      // estimate, merges in (plain union), batch 2 classifies against
      // the updated state — no corpus text touched after the one index
      // build. Oracle recomputes both classifications in DuckDB.
      Q("lsh_incremental_newdocs",
        (s, d) => {
          val all = docs(s, d)
          val corpus = all.filter(col("doc_id") % 3 =!= 0)
          val b1 = all.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
          val b2 = all.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)
          val state = java.nio.file.Files.createTempDirectory("graft_lsh_idx").toString
          // DELTA-persisted signature state (r10, same argument as the
          // exact-dedup stream): each increment writes ONLY the batch's
          // signatures; the running index is base ∪ deltas. The earlier
          // form re-persisted base ∪ batch as v1 — an O(corpus) state
          // rewrite per batch. mergeLshIndex is a plain union, so the
          // union-of-dirs read IS the merged index, bit-for-bit.
          def persist(ix: org.apache.spark.sql.DataFrame, name: String) = {
            ix.write.mode("overwrite").parquet(s"$state/$name")
            s.read.parquet(s"$state/$name")
          }
          val idx0 = persist(Dedup.lshIndex(corpus), "base")
          val v1 = Dedup.classifyNearDupIncremental(idx0, b1)
          val idx1 = idx0.unionByName(persist(Dedup.lshIndex(b1), "delta_b1"))
          val v2 = Dedup.classifyNearDupIncremental(idx1, b2)
          v1.withColumn("batch_seq", lit(1))
            .unionByName(v2.withColumn("batch_seq", lit(2)))
            .orderBy("doc_id")
        },
        Some(Dedup.lshIncrementalSql(
          "doc_id % 3 <> 0",
          "doc_id % 3 = 0 AND doc_id % 2 = 0",
          "doc_id % 3 = 0 AND doc_id % 2 <> 0"))),
      // The learned quality model's in-query TRAINING leg
      // (`QualityClassifier.trainEval`, hashed BoW → logistic regression)
      // is SPEC coverage (retired r13): an iterative fitter's weights are
      // engine-specific. AUC band + determinism are asserted in
      // CurationOpsSpec; FixtureSpec pins retrain == committed fixture;
      // the pinned serving twin below stays oracle-exact.
      // per-doc scores under the COMMITTED quality model (md5-BoW LR,
      // 1e9-quantized weights, frozen weak-label threshold) — the
      // serving artifact, ORACLE-EXACT: integer dot product + one
      // round-pinned sigmoid, mirrored verbatim in DuckDB. The
      // in-query-trained form stays rows-only (`quality_classifier`);
      // FixtureSpec pins retrain == fixture.
      Q("quality_score_pinned",
        (s, d) => graft.ml.QualityClassifier.scorePinned(docs(s, d),
          graft.ml.QualityFixture.labelThreshold,
          graft.ml.QualityFixture.interceptE9,
          graft.ml.QualityFixture.weightsE9),
        Some(graft.ml.QualityClassifier.scorePinnedSql(
          graft.ml.QualityFixture.labelThreshold,
          graft.ml.QualityFixture.interceptE9,
          graft.ml.QualityFixture.weightsE9))),
      // operating-point sweep for the learned filter — PROMOTED r11 to
      // oracle-exact at the pinned model (the sweep a pipeline runs for
      // the FROZEN artifact it actually ships; trained-sweep identities
      // stay spec-asserted in QualitySpec)
      Q("quality_threshold_sweep",
        (s, d) => graft.ml.QualityClassifier.thresholdSweepPinned(docs(s, d),
          graft.ml.QualityFixture.labelThreshold,
          graft.ml.QualityFixture.interceptE9,
          graft.ml.QualityFixture.weightsE9),
        Some(graft.ml.QualityClassifier.thresholdSweepPinnedSql(
          graft.ml.QualityFixture.labelThreshold,
          graft.ml.QualityFixture.interceptE9,
          graft.ml.QualityFixture.weightsE9))),
      Q("dedup_simhash_pairs", (s, d) => Dedup.simhashPairs(docs(s, d)),
        Some(Dedup.simhashPairsSql())),
      Q("knn_bruteforce", (s, d) => Knn.bruteForceTopK(embs(s, d)),
        Some(Knn.bruteForceTopKSql())),
      Q("hard_negatives", (s, d) => Knn.hardNegatives(embs(s, d)),
        Some(Knn.hardNegativesSql())),
      Q("knn_bucketed", (s, d) => Knn.bucketedTopK(embs(s, d)),
        Some(Knn.bucketedTopKSql())),
      // IVF with trained centroids, run at nprobe = numCells: probing
      // every cell makes IVF ≡ brute force BY CONSTRUCTION, so the whole
      // trained pipeline (k-means‖ fit, cell assignment, probe ranking,
      // per-cell candidate join, ADC-free exact scoring) is hash-checked
      // against the brute-force oracle — the quantizer provably loses
      // nothing. The sub-linear operating point (nprobe < numCells) stays
      // spec-asserted in KnnSpec (exact agreement on separated clusters +
      // recall band on the testdata), where approximation is the point.
      Q("knn_ivf",
        (s, d) => Knn.ivfTopK(embs(s, d), nprobe = 16).drop("cell"),
        Some(Knn.bruteForceTopKSql(nQueries = 50, k = 3))),
      // SemDeDup-style cluster-then-prune semantic dedup, ORACLE-EXACT at
      // the pinned-centroid serving point (promoted r11): centroids are a
      // committed trained-model artifact (SemDedupFixture — MLlib k-means
      // output, provenance spec-pinned), the argmin assignment and the
      // within-cell prune are plain arithmetic mirrored in DuckDB. The
      // in-query-trained k-means path stays in the gate via
      // `kmeans_clusters` and KnnSpec. tau=0.3 matches
      // embedding_near_dup's threshold — the synthetic embeddings'
      // planted near-dups live at cosine ~0.3-0.4
      Q("semdedup_keep",
        (s, d) => Knn.semDedupKeepPinned(embs(s, d),
          SemDedupFixture.centroids, tau = 0.3),
        Some(Knn.semDedupKeepPinnedSql(SemDedupFixture.centroids, tau = 0.3))),
      // r14: cluster labeling — top-5 distinctive terms per pinned
      // embedding cell by cluster-level TF-IDF (cluster-as-document),
      // text joined 1:1 on vec_id = doc_id
      Q("cluster_keywords",
        (s, d) => Knn.clusterKeywords(embs(s, d), docs(s, d),
          SemDedupFixture.centroids),
        Some(Knn.clusterKeywordsSql(SemDedupFixture.centroids))),
      // Product quantization ADC top-k, ORACLE-EXACT at the pinned
      // codebook (promoted r11, the knn_ivf pattern): codebooks are the
      // committed trained artifact (PqFixture — the deterministic
      // sample+Lloyd output, provenance spec-pinned; training offline
      // and serving frozen IS how production PQ deploys), so the whole
      // encode + ADC scan pipeline is mirrored in DuckDB. The
      // in-query-trained form stays spec-asserted in KnnSpec.
      Q("pq_topk",
        (s, d) => Knn.pqTopK(embs(s, d), pinned = Some(PqFixture.codebooks)),
        Some(Knn.pqTopKSql(PqFixture.codebooks))),
      // IVF-PQ: the production composition (r13) — the in-engine Lloyd
      // trainer's cells prune candidates (nprobe=2 of 8), the pinned PQ
      // codebooks score them in the compressed domain (8 LUT reads per
      // pair instead of 64 float mults; 16× less memory traffic on top
      // of the pruning). Both halves were already oracle-exact; the
      // composition replays training, pruning, encoding and ADC ranking
      // under one hash.
      Q("ivfpq_topk",
        (s, d) => Knn.ivfPqTopK(embs(s, d), PqFixture.codebooks),
        Some(Knn.ivfPqTopKSql(PqFixture.codebooks))),
      // Incremental IVF index maintenance (r13) — the ANN half of the
      // maintained-index family (exact/LSH dedup indexes are the text
      // half): the trained cell-keyed corpus is RUNNING STATE; a new
      // batch attaches to its nearest existing cell (O(batch) delta, no
      // retrain) and searches the state-before-batch in nprobe cells.
      // Same corpus/batch carve as lsh_incremental_newdocs.
      Q("ivf_attach_incremental",
        (s, d) => Knn.ivfAttachIncremental(embs(s, d)),
        Some(Knn.ivfAttachIncrementalSql())),
      // Residual IVF-PQ with BOTH trained artifacts in the hash gate
      // (r14, VERDICT item 1 — the true FAISS IndexIVFPQ): the coarse
      // quantizer is the in-engine Lloyd trainer AND the PQ codebooks
      // are per-subspace Lloyd fits over the integer residual domain
      // (x − home-cell centroid), replayed iteration for iteration in
      // SQL — no pinned model artifact anywhere. Search is ADC with
      // per-probe residual LUTs. All BIGINT: hash-exact end to end.
      Q("ivfpq_residual_topk",
        (s, d) => Knn.ivfPqResidualTopK(embs(s, d)),
        Some(Knn.ivfPqResidualTopKSql())),
      // ...and its production serving tail (r14): IndexIVFPQ + refine —
      // the compressed ADC ranking retrieves a WIDE candidate set
      // (R=50), and only those rows are re-scored at full quantized
      // precision. Compressed retrieval is allowed to be approximate
      // (recall@R ≈ 1 where recall@k reads 0.5 on the clustered table);
      // the exact stage touches nQueries·R rows, never the corpus.
      Q("ivfpq_rescore_topk",
        (s, d) => Knn.ivfPqResidualRescoreTopK(embs(s, d)),
        Some(Knn.ivfPqResidualRescoreTopKSql())),
      // The IVF maintenance DECISION (r14, VERDICT item 2): per trained
      // cell, training-time vs attached-batch stats under the same
      // centroids (sizes, integer inertia/radius, shares) and the
      // retrain trigger — drift_ratio (batch mean centroid distance /
      // training mean) and share imbalance, flags NULLIF-guarded. Same
      // %3 carve as ivf_attach_incremental, so this report governs
      // exactly the state that query maintains. IvfDriftSpec proves an
      // engineered drifted batch trips retrain_due and a stationary
      // fresh draw does not.
      Q("ivf_drift_report",
        (s, d) => Knn.ivfDriftReportCarve(embs(s, d)),
        Some(Knn.ivfDriftReportCarveSql())),
      // The full ANN maintenance LOOP as running disk state (r15,
      // VERDICT item 1): versioned centroid + train-stats state, per
      // batch an O(batch) attach, the drift verdict, a delta append,
      // and a retrain GATED on retrain_due. This is the in-plan BATCH
      // twin; `streaming_ivf_maintenance` runs the identical
      // maintenanceStep fold over graftqueue micro-batches under the
      // SAME oracle, so stream ≡ batch is itself hash-checked. The
      // oracle encodes the gate structurally: the state serving batch 2
      // is v0 filtered by NOT any(retrain_due of batch 1) — a gate
      // disagreement empties report 2 and fails the hash loudly.
      Q("ivf_maintenance_batch",
        (s, d) => graft.sim.IvfMaintenance.maintenanceBatch(s, d),
        Some(graft.sim.IvfMaintenance.maintenanceCarveSql())),
      // ...and the retrain-FIRING leg over the generated drifted
      // mixture (corpus at +8, both batches at −8): batch 1 trips the
      // gate, the retrain absorbs corpus ∪ batch 1, and batch 2 — more
      // of the same drifted stream — reports ≈1 drift against the
      // retrained state. The oracle replays the SECOND Lloyd chain
      // (prefix `r`) structurally gated OPEN on batch 1's verdict:
      // both directions of the decision sit inside one hash.
      Q("ivf_maintenance_retrain",
        (s, _) => graft.sim.IvfMaintenance.maintenanceRetrain(s),
        Some(graft.sim.IvfMaintenance.maintenanceRetrainSql())),
      // Graph-based ANN (r16, VERDICT item 2) — the index family the
      // engine lacked beside IVF/PQ/SQ8: a deterministic NSW-style
      // proximity graph, built ROUND-BATCHED (each round's insertions
      // beam-search the graph FROZEN at the previous round, then the
      // degree bound re-prunes set-wise) so build AND search replay in
      // the oracle like the Lloyd loop: BIGINT quantized distances,
      // (d, id) tie-breaks, fixed rounds via vec_id mod R — one oracle
      // string at every scale factor.
      Q("knn_graph_topk",
        (s, d) => graft.sim.KnnGraph.graphTopK(embs(s, d)),
        Some(graft.sim.KnnGraph.graphTopKSql())),
      // ...and its operating-point experiment on the clustered fixture:
      // graph vs IVF recall with the HONEST per-query candidate budget
      // (distinct vectors actually scored) inside the hash — the
      // "graph ≥ IVF at a matched budget" claim is query output, not a
      // doc sentence. KnnGraphSpec asserts the inequality.
      Q("knn_graph_recall_clustered",
        (s, _) => graft.sim.KnnGraph.graphRecall(Knn.clusteredEmbeddings(s)),
        Some(graft.sim.KnnGraph.graphRecallSql(
          prelude = Knn.clusteredEmbeddingsCte()))),
      // PCA reduced-space ANN recall vs full-space brute force,
      // ORACLE-EXACT at the pinned basis (promoted r11, same pattern as
      // pq_topk/semdedup_keep): the loading matrix is the committed
      // trained artifact (PcaFixture, provenance spec-pinned), so the
      // whole shortlist → rerank → recall experiment is mirrored in
      // DuckDB. The in-query-trained fit stays spec-asserted in KnnSpec.
      Q("pca_recall",
        (s, d) => Knn.pcaRecallPinned(embs(s, d),
          PcaFixture.basis, PcaFixture.explainedVariance),
        Some(Knn.pcaRecallPinnedSql(
          PcaFixture.basis, PcaFixture.explainedVariance))),
      // embedding-space benchmark leakage: cross-side SRP-band candidates
      // against the carved benchmark slice, exact-cosine verified
      Q("semantic_decontamination",
        (s, d) => Knn.semanticDecontamination(embs(s, d)),
        Some(Knn.semanticDecontaminationSql())),
      Q("embedding_near_dup", (s, d) => Knn.nearDupPairs(embs(s, d)),
        Some(Knn.nearDupPairsSql())),
      // per-group total variance about the centroid + mean pairwise
      // squared distance from TWO aggregates (variance decomposition) —
      // the diversity signal curation acts on, with no pair enumeration
      Q("embedding_diversity", (s, d) => Knn.embeddingDiversity(embs(s, d)),
        Some(Knn.embeddingDiversitySql)),
      Q("semantic_split_leakage", (s, d) => Knn.semanticSplitLeakage(embs(s, d)),
        Some(Knn.semanticSplitLeakageSql())),
      Q("embedding_label_stats", (s, d) => Knn.labelStats(embs(s, d)),
        Some(Knn.labelStatsSql)),
      // Deterministic hash split / stratified sample — narrow, rerun- and
      // append-stable, reproducible cross-engine (see ml.HashSplit).
      Q("hash_split_assign", (s, d) => graft.ml.HashSplit.splitAssign(docs(s, d)),
        Some(graft.ml.HashSplit.splitAssignSql)),
      // seeded hash-order shuffle + distributed dense numbering
      Q("corpus_shuffle", (s, d) => graft.ml.HashSplit.corpusShuffle(docs(s, d)),
        Some(graft.ml.HashSplit.corpusShuffleSql())),
      // curriculum training order: exact quality tiers (distributed
      // NTILE), best tier first, seeded md5 permutation within a tier,
      // dense 0-based position via the range-repartition global index
      Q("curriculum_order",
        (s, d) => graft.ml.HashSplit.curriculumOrder(docs(s, d)),
        Some(graft.ml.HashSplit.curriculumOrderSql(
          scoreExpr = TextOps.qualityScoreSqlExpr))),
      // deterministic weighted sampling without replacement (A-ES
      // ln(u)/w keys over hash uniforms, bounded TakeOrdered)
      Q("weighted_sample", (s, d) => graft.ml.HashSplit.weightedSample(docs(s, d)),
        Some(graft.ml.HashSplit.weightedSampleSql())),
      Q("stratified_sample", (s, d) => graft.ml.HashSplit.stratifiedSample(docs(s, d)),
        Some(graft.ml.HashSplit.stratifiedSampleSql())),
      Q("mixture_resample", (s, d) => graft.ml.HashSplit.mixtureResample(docs(s, d)),
        Some(graft.ml.HashSplit.mixtureResampleSql)),
      // Token-budget sharding: global prefix sum in doc order via the
      // two-pass distributed form (no single-partition window), then a
      // shard cut every 2000 tokens
      Q("token_shards",
        (s, d) => {
          val toks = docs(s, d).select(
            col("doc_id"), size(TextOps.toks(col("text"))).cast("long").as("n_toks"))
          graft.rel.Scale.prefixSumShards(toks, "doc_id", "n_toks", budget = 2000L)
            .select(col("doc_id"), col("n_toks"), col("cum_tokens"),
              col("shard_id").cast("int").as("shard_id"))
            .orderBy("doc_id")
        },
        Some(
          raw"""WITH t AS (SELECT doc_id,
             |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_toks
             |  FROM documents),
             |c AS (SELECT doc_id, n_toks,
             |  CAST(SUM(n_toks) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens FROM t)
             |SELECT doc_id, n_toks, cum_tokens,
             |  CAST((cum_tokens - n_toks) // 2000 AS INTEGER) AS shard_id
             |FROM c ORDER BY doc_id""".stripMargin)),
      // Quality-tier bucketing: exact NTILE(10) by quality score with no
      // single-partition window (distributed numbering + positional rule)
      Q("quality_tiers",
        (s, d) => {
          val scored = docs(s, d).select(
            col("doc_id"), TextOps.qualityScore(col("text")).as("quality_score"))
          graft.rel.Scale.ntileExact(scored, 10, Seq("quality_score", "doc_id"))
            .select(col("doc_id"), col("quality_score"),
              col("tier").cast("int").as("tier"))
            .orderBy("doc_id")
        },
        Some(
          s"""WITH s AS (SELECT doc_id, ${TextOps.qualityScoreSqlExpr} AS quality_score FROM documents)
             |SELECT doc_id, quality_score,
             |  CAST(NTILE(10) OVER (ORDER BY quality_score, doc_id) AS INTEGER) AS tier
             |FROM s ORDER BY doc_id""".stripMargin)),
      Q("multimodal_features", (s, d) => Multimodal.extractFeatures(docs(s, d)),
        Some(Multimodal.extractFeaturesSql)),
      // frame sampling: binary payload → exploded frames table (stub
      // slicer; real generator/partitioning/metadata plumbing)
      Q("multimodal_frames", (s, d) => Multimodal.sampleFrames(docs(s, d)),
        Some(Multimodal.sampleFramesSql())),
      // REAL image decode: deterministic solid-color PNGs (dims/fill pure
      // functions of doc_id) rendered per-partition, decoded back with
      // the JRE's javax.imageio, pixel averages computed over the raster
      // — oracle-exact because the synthesis formulas are known
      Q("multimodal_image_decode",
        (s, d) => Multimodal.imageFeatures(Multimodal.imageCorpus(docs(s, d))),
        Some(Multimodal.imageFeaturesSql)),
      // REAL pixel resize: decode → Graphics2D half-scale → re-encode →
      // re-decode; solid fills survive interpolation exactly
      Q("multimodal_image_resize",
        (s, d) => Multimodal.resizeImages(Multimodal.imageCorpus(docs(s, d))),
        Some(Multimodal.resizeImagesSql)),
      // The codec TEMPLATE itself (mapPartitions, one decoder instance
      // per partition) on its positive path: real ImageIO decode of the
      // deterministic PNG corpus — dims are doc_id formulas, so the
      // oracle pins the template's plumbing (per-partition batching,
      // row shape, ok-flag) end-to-end; payload-digest columns are
      // dropped (PNG bytes are engine-side)
      Q("multimodal_codec_template",
        (s, d) => Multimodal.extractFeaturesWithCodec(
          Multimodal.imageCorpus(docs(s, d)).toDF(),
          payloadCol = "payload", mediaType = "image/png")(Multimodal.imageDims)
          .select("doc_id", "media_type", "decoded_ok", "width", "height"),
        Some(
          """SELECT doc_id, 'image/png' AS media_type, TRUE AS decoded_ok,
            |  CAST(doc_id % 37 + 1 AS INTEGER) AS width,
            |  CAST(doc_id % 23 + 1 AS INTEGER) AS height
            |FROM documents WHERE doc_id IS NOT NULL
            |ORDER BY doc_id""".stripMargin)),
      // REAL audio decode (r10, the PNG leg's sibling): deterministic
      // RIFF/WAVE PCM-int16 files built per-partition (pure ByteBuffer,
      // no codec lib needed for the WAV container), parsed back by a
      // proper chunk walk + one pass of PCM peak/sum stats; corrupt
      // (truncated) payloads every 97th doc surface as decoded_ok=false
      // rows, never task failures. Oracle recomputes every field incl.
      // the per-sample stats from doc_id arithmetic.
      Q("multimodal_wav_decode",
        (s, d) => Multimodal.audioFeatures(Multimodal.audioCorpus(docs(s, d))),
        Some(Multimodal.audioFeaturesSql)),
      // Mixed-container corpus (PNG even ids / BMP odd ids) + magic-byte
      // format sniffing BEFORE the decoder — the dispatch step a real
      // crawl needs (extensions/content types are untrustworthy at
      // 100 TB). The sniffed container column is oracle-recomputed from
      // the parity that chose the encoder; the pixel stats round-trip
      // the synthesis formulas through BOTH JRE codecs.
      Q("multimodal_mixed_codecs",
        (s, d) => Multimodal.mixedCodecFeatures(
          Multimodal.imageCorpusMixed(docs(s, d))),
        Some(Multimodal.mixedCodecFeaturesSql)),
      // The full codec zoo (r14, VERDICT item 4): all four containers
      // sniffFormat classifies — PNG/BMP/JPEG/GIF, every decoder the JRE
      // ships — plus the two quarantine shapes (truncated JPEG: valid
      // magic, failed decode; non-image bytes: sniffs unknown). EXACT
      // columns only here (container, decode outcome, dims — exact even
      // for lossy JPEG); JPEG pixel stats are banded in MultimodalSpec,
      // lossless containers stay pixel-exact there.
      Q("multimodal_codec_zoo",
        (s, d) => Multimodal.codecZooFeatures(
          Multimodal.imageCorpusZoo(docs(s, d))),
        Some(Multimodal.codecZooFeaturesSql)),

      // REAL video codec (r14): RIFF/AVI demux (uncompressed DIB '00db'
      // frames) + every-Nth-frame sampling — the former stub slicer's
      // contract over an actual container. Doc-level summary incl.
      // truncated-AVI quarantine rows…
      Q("multimodal_avi_decode",
        (s, d) => Multimodal.videoSummary(Multimodal.videoCorpus(docs(s, d))),
        Some(Multimodal.videoSummarySql)),
      // …and the per-sampled-frame table a vision pipeline feeds
      // downstream (ysum is the bottom-up-row-mapping witness).
      Q("multimodal_avi_frames",
        (s, d) => Multimodal.videoFrames(Multimodal.videoCorpus(docs(s, d))),
        Some(Multimodal.videoFramesSql)),
      // r15 (VERDICT item 3): COMPRESSED video — MJPEG '00dc' chunks,
      // one whole JPEG per frame through the JRE codec, same RIFF walk.
      // Lossy stream ⇒ oracle pins the exact columns (decode success,
      // dims, frame count, incl. the truncated-final-frame quarantine);
      // pixel sums banded in MultimodalSpec, the codec-zoo rule.
      Q("multimodal_mjpeg_decode",
        (s, d) => Multimodal.mjpegDecode(Multimodal.mjpegCorpus(docs(s, d))),
        Some(Multimodal.mjpegDecodeSql)),
      // Video NEAR-DUP (r16, VERDICT item 5) — the two mature families
      // composed: the real AVI demuxer's per-frame channel signatures
      // feed the dedup machinery's df-bounded posting-list containment
      // join. The planted fixture replays clips exactly (id%11=4) and
      // TRIMMED (id%7=3, frame 0 dropped — different bytes, contained
      // frame set: the case frame-level dedup exists for); the oracle
      // regenerates the expected frame table from the source-mapped
      // pixel arithmetic and replays the same fingerprint/containment
      // algebra — trims read containment 1.0 / same_sequence false,
      // exact replays 1.0 / true, all inside one hash.
      Q("video_near_dup",
        (s, d) => graft.multimodal.VideoDedup.videoNearDup(
          graft.multimodal.VideoDedup.nearDupCorpus(docs(s, d))),
        Some(graft.multimodal.VideoDedup.videoNearDupSql())),
    )
  }

}
