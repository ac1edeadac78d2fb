package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Assembly, BpeTrainer, Classifier, Dedup, DupClusters, IndexOps, LmScore, Multimodal, Relational, Retrieval, Similarity, TextAnalysis, TextRelational, Versioning}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB-equivalent in `oracleSql` (same
  * column names, same deterministic ORDER BY) unless the operator is not
  * SQL-expressible. All float outputs are either exact (decimal-derived)
  * doubles or rounded after exact-order computation, so the driver's
  * hash compare is stable across engines.
  */
object SparkEntry {

  /** Flagship: top-k BM25 through the REAL engine (tokenize → salted
    * compressed index build → block-max WAND) on sf=0.001. */
  def entry(spark: SparkSession): DataFrame =
    IndexOps.bm25TopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational coverage (hash agg / broadcast join / top-k / window)
    "q01_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q02_revenue_filter" -> ((s, d) => Relational.revenueFilter(s, d)),
    "q03_top_revenue" -> ((s, d) => Relational.topRevenue(s, d)),
    "q04_supplier_top_parts" -> ((s, d) => Relational.supplierTopParts(s, d)),
    "q22_event_sessions" -> ((s, d) => Relational.eventSessions(s, d)),
    // Fulltext pipeline, SQL-checkable profile (SURVEY §2.2-§2.5)
    "q05_term_tf" -> ((s, d) => TextRelational.termTf(s, d)),
    "q06_term_stats" -> ((s, d) => TextRelational.termStats(s, d)),
    "q07_doc_stats" -> ((s, d) => TextRelational.docStats(s, d)),
    "q08_bm25_topk" -> ((s, d) => TextRelational.bm25TopK(s, d)),
    // The REAL index engine (codec + salted shuffle + block-max WAND)
    // against the same independent BM25 oracle
    "q09_index_bm25" -> ((s, d) => IndexOps.bm25TopK(s, d)),
    // Dedup family (training-data pipeline)
    "q10_dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "q11_dedup_ngram" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q12_dedup_minhash" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "q13_dedup_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "q14_dedup_embedding" -> ((s, d) => Dedup.embeddingCosine(s, d)),
    // Similarity search
    "q15_ann_brute" -> ((s, d) => Similarity.annBruteForce(s, d)),
    "q16_ann_lsh" -> ((s, d) => Similarity.annLsh(s, d)),
    "q23_label_centroids" -> ((s, d) => Similarity.labelCentroids(s, d)),
    "q24_ann_ivf" -> ((s, d) => Similarity.annIvf(s, d)),
    // Text analysis
    "q17_lang_id" -> ((s, d) => TextAnalysis.langId(s, d)),
    "q18_quality" -> ((s, d) => TextAnalysis.quality(s, d)),
    "q19_token_counts" -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "q20_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "q28_dist_bm25" -> ((s, d) => IndexOps.distBm25(s, d)),
    "q25_pii_redact" -> ((s, d) => TextAnalysis.piiRedact(s, d)),
    "q26_repetition" -> ((s, d) => TextAnalysis.repetition(s, d)),
    "q27_decontam" -> ((s, d) => Dedup.decontam(s, d)),
    "q29_clean_corpus" -> ((s, d) => TextAnalysis.cleanCorpus(s, d)),
    // Multimodal plumbing (decode stubbed — no codecs in sandbox)
    "q21_multimodal" -> ((s, d) => Multimodal.features(s, d)),
    // Corpus assembly (post-clean mixing + packing)
    "q30_stratified_sample" -> ((s, d) => Assembly.stratifiedSample(s, d)),
    "q31_pack_sequences" -> ((s, d) => Assembly.packSequences(s, d)),
    // Duplicate clustering: connected components over near-dup pairs
    "q32_dup_clusters" -> ((s, d) => DupClusters.clusters(s, d)),
    // Reference-model (CCNet-style) novelty/familiarity scoring
    "q33_trigram_novelty" -> ((s, d) => LmScore.trigramNovelty(s, d)),
    // IVF-PQ: compressed-code ANN serving (no oracle — approximate)
    "q34_ann_ivfpq" -> ((s, d) => Similarity.annIvfPq(s, d)),
    // Exact-substring duplicated-span coverage (Lee et al. 2022 shape)
    "q35_dup_spans" -> ((s, d) => Dedup.dupSpans(s, d)),
    // Nearest-centroid assignment (bulk labeling / IVF coarse step)
    "q36_centroid_assign" -> ((s, d) => Similarity.centroidAssign(s, d)),
    // CCNet head/middle/tail tercile selection over the q33 scores
    "q37_ccnet_select" -> ((s, d) => LmScore.noveltySelect(s, d)),
    // Token-budget selection: hash-ordered prefix-sum cut
    "q38_token_budget" -> ((s, d) => Assembly.tokenBudget(s, d)),
    // Temperature-scaled source mixing (integer-exact thresholds)
    "q39_temp_mix" -> ((s, d) => Assembly.temperatureMix(s, d)),
    // Leakage-safe split: train/val/test constant per dup cluster
    "q40_leak_split" -> ((s, d) => DupClusters.leakSafeSplit(s, d)),
    // Paragraph-level dedup: first occurrence wins, docs reassembled
    "q41_para_dedup" -> ((s, d) => Dedup.paraDedup(s, d)),
    // Canonical selection by quality: keep the best doc per dup cluster
    "q42_canonical_quality" -> ((s, d) => DupClusters.canonicalByQuality(s, d)),
    // Exact kNN self-join: top-k cosine neighbors for every vector
    "q43_knn_join" -> ((s, d) => Similarity.knnJoin(s, d)),
    // Incremental Bloom dedup: feed vs already-ingested corpus
    "q44_bloom_dedup" -> ((s, d) => Dedup.bloomDedup(s, d)),
    // Group-level curation: drop bottom-quartile sources by mean quality
    "q45_source_filter" -> ((s, d) => Assembly.sourceQualityFilter(s, d)),
    // Semantic dedup: drop near-duplicate embeddings within clusters
    "q46_semdedup" -> ((s, d) => Similarity.semDeDup(s, d)),
    // Semantic decontamination: max cosine vs a fixed eval bench set
    "q47_sem_decontam" -> ((s, d) => Similarity.semDecontam(s, d)),
    // kNN label propagation: majority vote over q43's neighbor graph
    "q48_knn_classify" -> ((s, d) => Similarity.knnClassify(s, d)),
    // Snapshot diff: added/removed/changed/same between corpus versions
    "q49_snapshot_diff" -> ((s, d) => Versioning.snapshotDiff(s, d)),
    // Overlapping fixed-window chunking (RAG / embedding prep)
    "q50_chunk_overlap" -> ((s, d) => Assembly.chunkOverlap(s, d)),
    // TF-IDF keyword extraction: top terms per document
    "q51_tfidf_keywords" -> ((s, d) => TextRelational.tfidfKeywords(s, d)),
    // DSIR-style importance selection via hashed-bigram buckets
    "q52_dsir_select" -> ((s, d) => LmScore.dsirSelect(s, d)),
    // Hybrid retrieval: reciprocal-rank fusion of BM25 + cosine lists
    "q53_hybrid_rrf" -> ((s, d) => Retrieval.hybridRrf(s, d)),
    // Boolean-AND retrieval through the engine's postings intersection
    "q54_boolean_and" -> ((s, d) => IndexOps.booleanAnd(s, d)),
    // Hard-negative mining for retrieval training (engine BM25 bands)
    "q55_hard_negatives" -> ((s, d) => IndexOps.hardNegatives(s, d)),
    // Contrastive positive pairs from near-duplicate clusters
    "q56_contrastive_pairs" -> ((s, d) => DupClusters.contrastivePairs(s, d)),
    // Positional phrase match over the token stream
    "q57_phrase_match" -> ((s, d) => TextRelational.phraseMatch(s, d)),
    // Trained quality classifier (hashed logistic regression; full-batch
    // GD with a partition-indexed gradient fold — bit-reproducible where
    // treeAggregate is not; holdout accuracy rides the rows — no SQL
    // oracle for an iterative fixpoint)
    "q58_quality_clf" -> ((s, d) => Classifier.qualityClassifier(s, d)),
    // Collocation mining: top word pairs by PMI
    "q59_pmi_colloc" -> ((s, d) => TextRelational.pmiCollocations(s, d)),
    // Phrase search through the REAL positional index (PosStore sidecar)
    "q60_phrase_index" -> ((s, d) => IndexOps.phraseIndex(s, d)),
    // Distributed BPE tokenizer training (vocab induction; iterative
    // fixpoint like q58 — no SQL oracle, all-integer output, BpeSpec
    // pins the table against a from-first-principles replay)
    "q61_bpe_merges" -> ((s, d) => BpeTrainer.bpeMerges(s, d)),
  )

  /** DuckDB equivalents, same column names + total ORDER BY. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.pricingSummarySql,
    "q02_revenue_filter" -> Relational.revenueFilterSql,
    "q03_top_revenue" -> Relational.topRevenueSql,
    "q04_supplier_top_parts" -> Relational.supplierTopPartsSql,
    "q22_event_sessions" -> Relational.eventSessionsSql,
    "q05_term_tf" -> TextRelational.termTfSql,
    "q06_term_stats" -> TextRelational.termStatsSql,
    "q07_doc_stats" -> TextRelational.docStatsSql,
    "q08_bm25_topk" -> TextRelational.bm25TopKSql(),
    "q09_index_bm25" -> IndexOps.bm25TopKSql,
    "q10_dedup_exact" -> Dedup.exactSql,
    "q11_dedup_ngram" -> Dedup.ngramJaccardSql,
    // q12/q13/q16/q21: not SQL-expressible (custom hashes / LSH /
    // binary decode) → rows-only check; semantics pinned in ScalaTest
    "q14_dedup_embedding" -> Dedup.embeddingCosineSql,
    "q15_ann_brute" -> Similarity.annBruteForceSql,
    "q23_label_centroids" -> Similarity.labelCentroidsSql,
    "q17_lang_id" -> TextAnalysis.langIdSql,
    "q18_quality" -> TextAnalysis.qualitySql,
    "q19_token_counts" -> TextAnalysis.tokenCountsSql,
    "q20_fingerprint" -> TextAnalysis.fingerprintSql,
    "q28_dist_bm25" -> IndexOps.distBm25Sql,
    "q25_pii_redact" -> TextAnalysis.piiRedactSql,
    "q26_repetition" -> TextAnalysis.repetitionSql,
    "q27_decontam" -> Dedup.decontamSql,
    "q29_clean_corpus" -> TextAnalysis.cleanCorpusSql,
    "q30_stratified_sample" -> Assembly.stratifiedSampleSql,
    "q31_pack_sequences" -> Assembly.packSequencesSql,
    "q32_dup_clusters" -> DupClusters.clustersSql,
    "q33_trigram_novelty" -> LmScore.trigramNoveltySql,
    "q35_dup_spans" -> Dedup.dupSpansSql,
    "q36_centroid_assign" -> Similarity.centroidAssignSql,
    "q37_ccnet_select" -> LmScore.noveltySelectSql,
    "q38_token_budget" -> Assembly.tokenBudgetSql,
    "q39_temp_mix" -> Assembly.temperatureMixSql,
    "q40_leak_split" -> DupClusters.leakSafeSplitSql,
    "q41_para_dedup" -> Dedup.paraDedupSql,
    "q42_canonical_quality" -> DupClusters.canonicalByQualitySql,
    "q43_knn_join" -> Similarity.knnJoinSql,
    "q44_bloom_dedup" -> Dedup.bloomDedupSql,
    "q45_source_filter" -> Assembly.sourceQualityFilterSql,
    "q46_semdedup" -> Similarity.semDeDupSql,
    "q47_sem_decontam" -> Similarity.semDecontamSql,
    "q48_knn_classify" -> Similarity.knnClassifySql,
    "q49_snapshot_diff" -> Versioning.snapshotDiffSql,
    "q50_chunk_overlap" -> Assembly.chunkOverlapSql,
    "q51_tfidf_keywords" -> TextRelational.tfidfKeywordsSql,
    "q52_dsir_select" -> LmScore.dsirSelectSql,
    "q53_hybrid_rrf" -> Retrieval.hybridRrfSql,
    "q54_boolean_and" -> IndexOps.booleanAndSql,
    "q55_hard_negatives" -> IndexOps.hardNegativesSql,
    "q56_contrastive_pairs" -> DupClusters.contrastivePairsSql,
    "q57_phrase_match" -> TextRelational.phraseMatchSql,
    "q59_pmi_colloc" -> TextRelational.pmiCollocationsSql,
    "q60_phrase_index" -> IndexOps.phraseIndexSql,
  )
}
