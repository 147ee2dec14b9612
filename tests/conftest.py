import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from wren_engine_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s


# ---------------------------------------------------------------------------
# Test tiers (round-11 verdict item 1).
#
# The full suite runs ~53-56 min serial (1030 tests), which overran the
# external driver's pytest budget in round 10 (VERIFY_r10 tests_ok:false —
# truncated at ~60% with zero failures). The slowest property/replay/soak
# tests are marked "soak" and DESELECTED BY DEFAULT so the driver's plain
# `pytest tests/ -x -q` completes well inside budget (~19 min on this box);
# every operator family keeps fast-tier coverage (the property files ARE the
# soak tier by design; their operators are covered by the functional files).
#
# Run everything:    SPARK_GRAFT_FULL_TESTS=1 pytest tests/
# Run only soak:     pytest tests/ -m soak
# Any explicit -m expression disables the default deselection.
#
# The set below is data-driven: every test whose call time exceeded 8 s in
# the full-suite durations run on this round's tree (/tmp junitxml receipt,
# 1027 passed), MINUS tests that directly pin code changed this round
# (x73 ingest_decisions, jaccard_pairs rewrite, connected-components
# equivalence, BM25 one-pass sidecar lifecycle, PRF literal/lazy identity),
# which stay in the fast tier regardless of cost.
_SOAK_NODEIDS = {
    "test_scale.py::TestRegisteredEntrySoak::test_registered_x70_on_10x_corpus_no_index_shuffle",
    "test_property_dedup.py::test_edit_distance_pairs_equals_brute_force",
    "test_queries_smoke.py::test_query_runs[x118_ivfpq_index_retrain]",
    "test_ivfpq.py::TestIvfPqEpochAppend::test_stream_ingest_equals_batch_append",
    "test_property_llmops12.py::TestBm25IndexProperties::test_any_delete_set_equals_filtered_rebuild",
    "test_property_llmops12.py::TestBm25IndexProperties::test_any_append_split_equals_direct_ranking",
    "test_property_llmops9.py::test_pq_append_encode_matches_python",
    "test_ivfpq.py::TestIvfPqRetrain::test_retrain_defaults_to_recorded_iteration_counts",
    "test_ivfpq.py::TestIvfPqRetrain::test_recall_recovers_after_drift_retrain",
    "test_llmops11.py::TestTombstoneDelete::test_tombstone_shadows_later_append_until_compact",
    "test_scale.py::TestRegisteredEntrySoak::test_registered_x3_on_skewed_bench_corpus",
    "test_llmops11.py::TestNprobeTuner::test_tuner_matches_per_nprobe_probes",
    "test_property_llmops9.py::test_bloom_screen_matches_python_and_never_misses",
    "test_operators.py::TestEditDistancePairs::test_matches_brute_force_including_short_and_hot",
    "test_llmops6.py::TestT13StreamingProbe::test_multi_microbatch_incremental_arrival",
    "test_queries_smoke.py::test_query_runs[x110_ivfpq_index_append]",
    "test_property_llmops11.py::test_rrf_matches_python_replay",
    "test_llmops11.py::TestTombstoneDelete::test_compact_folds_tombstones",
    "test_operators.py::TestEditDistancePairs::test_k1_tighter_threshold",
    "test_property_dedup.py::test_edit_distance_null_keys_follow_sql_semantics",
    "test_ivfpq.py::TestIvfPqPersistedIndex::test_persisted_probe_bit_identical_to_inline",
    "test_property_dedup.py::test_portable_simhash_equals_python_reference",
    "test_property_dedup.py::test_edit_distance_short_bucket_within_budget_still_exact",
    "test_ivfpq.py::TestIvfPqRetrain::test_retrain_folds_tombstones_and_clears_state",
    "test_llmops11.py::TestTombstoneDelete::test_ivfpq_probe_respects_tombstones",
    "test_ivfpq.py::TestIvfPqPersistedIndex::test_probe_meta_read_is_memoized",
    "test_streaming.py::TestMidStreamDeleteVisibility::test_delete_between_microbatches_honored_by_next_batch",
    "test_queries_smoke.py::test_query_runs[t17_stream_ivfpq_ingest]",
    "test_ivfpq.py::TestIvfPqPersistedIndex::test_append_equals_rebuild_encoding",
    "test_ivfpq.py::TestIvfPqRetrain::test_crash_between_renames_recovers",
    "test_property_llmops11.py::test_bucketed_delete_equals_filtered_rerank",
    "test_ivfpq.py::TestIvfPqEpochAppend::test_epoch_replay_is_idempotent",
    "test_ivfpq.py::TestIvfPqEpochAppend::test_compaction_preserves_ivfpq_codes",
    "test_index_meta.py::TestMetaMemoization::test_pq_sidecar_cached_and_rebuild_invalidates",
    "test_ivfpq.py::TestIvfPqRefinedProbe::test_refine_honors_tombstones",
    "test_llmops11.py::TestTombstoneDelete::test_delete_equals_filtered_rerank",
    "test_operators.py::TestLshRecallBudget::test_x4_misses_within_budget_across_seeds",
    "test_llmops11.py::TestNprobeTuner::test_tuner_honors_tombstones",
    "test_llmops11.py::TestTombstoneDelete::test_rebuild_clears_tombstones",
    "test_index_meta.py::TestMetaMemoization::test_simhash_meta_cached_and_append_not_stale",
    "test_ivfpq.py::TestIvfPqPersistedIndex::test_append_wrong_dim_fails_loudly",
    "test_queries_smoke.py::test_query_runs[x109_ivfpq_index_probe]",
    "test_ivfpq.py::TestIvfPqRefinedProbe::test_refine_recall_at_least_adc_and_exact_order",
    "test_property_dedup.py::test_jaccard_pairs_equals_brute_force[0.5]",
    "test_llmops9.py::TestPQIndexAppend::test_rebuild_clears_epoch_markers",
    "test_scale.py::TestDocFrequencySkew::test_x3_both_modes_identical_on_skewed_corpus",
    "test_ivfpq.py::TestIvfPqLoudValidation::test_probe_wrong_query_dim_fails_loudly",
    "test_ivfpq.py::TestIvfPqLoudValidation::test_null_query_vector_fails_loudly",
    "test_operators.py::TestLshRecallBudget::test_x32_banding_matches_exact_clusters_across_seeds",
    "test_ivfpq.py::TestIvfPqRefinedProbe::test_refine_stage2_broadcasts_shortlist_no_corpus_shuffle",
    "test_fingerprints.py::TestSymbolGranularity::test_unparsable_module_falls_back_to_whole_module",
    "test_llmops9.py::TestPQIndexCompact::test_compact_shrinks_files_preserves_probe",
    "test_property_llmops11.py::test_pq_delete_equals_filtered_rerank",
    "test_llmops9.py::TestPQIndexAppend::test_epoch_append_is_idempotent",
    "test_ivfpq.py::TestIvfPqPersistedIndex::test_probe_plan_codes_only_no_embedding",
    "test_llmops9.py::TestIndexAppendFamilies::test_simhash_append_equals_rebuild",
    "test_ivfpq.py::TestIvfPqRecallGate::test_unpruned_probe_is_full_adc_scan",
    "test_queries_smoke.py::test_query_runs[x112_pq_index_delete]",
    "test_index_meta.py::TestMetaMemoization::test_probe_after_rebuild_uses_new_planes",
    "test_index_meta.py::TestAppendLifecycleEntries::test_x106_equals_full_rebuild_probe",
    "test_llmops9.py::TestPQIndexAppend::test_x100_idempotent_within_session",
    "test_property_llmops8.py::test_robust_stats_equals_rank_pair_reference",
    "test_scale.py::TestPassageSkew::test_x44_end_to_end_with_hot_passage",
    "test_ivfpq.py::TestIvfPqPlan::test_registered_entries_agree_and_share_training",
    "test_llmops8.py::TestPersistedPqIndex::test_probe_bit_identical_to_inline_pq_and_scans_codes_only",
    "test_llmops9.py::TestPQIndexAppend::test_append_dim_mismatch_fails_loudly",
    "test_llmops11.py::TestTombstoneDelete::test_no_tombstone_plan_unchanged_and_no_extra_shuffle",
    "test_llmops9.py::TestBloomDecontaminationScreen::test_no_false_negatives_vs_exact",
    "test_llmops8.py::TestX94PqRecall::test_matches_python_intersection",
    "test_property_dedup.py::test_containment_pairs_equals_brute_force",
    "test_llmops9.py::TestPQIndexCompact::test_compact_is_idempotent",
    "test_index_meta.py::TestJoinFreeEncode::test_append_codes_match_km_assign_chain",
}


def _tier_key(nodeid: str) -> str:
    # Normalize "tests/test_x.py::..." / "test_x.py::..." to the basename
    # form so the tier survives being invoked from any working directory.
    path, sep, rest = nodeid.partition("::")
    return path.rsplit("/", 1)[-1] + sep + rest


def pytest_collection_modifyitems(config, items):
    for item in items:
        if _tier_key(item.nodeid) in _SOAK_NODEIDS:
            item.add_marker(pytest.mark.soak)
    if os.environ.get("SPARK_GRAFT_FULL_TESTS", "") not in ("", "0"):
        return
    if config.option.markexpr:
        # an explicit -m expression takes full control of selection
        return
    keep = [i for i in items if "soak" not in i.keywords]
    drop = [i for i in items if "soak" in i.keywords]
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep
