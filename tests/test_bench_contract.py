"""Bench harness contract (round-8 verdict #6/#7).

The bench's regression signal (`vs_prev`) only covers queries that
stay in HEADLINE — so a heavy query silently dropped from the list
would vanish from the round-over-round comparison exactly when it
matters. These tests pin the selection rule to the committed record.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402

from msk_flink_streaming_cdk_spark.registry import QUERIES  # noqa: E402


def _last_full_record():
    with open(os.path.join(HERE, "BENCH_FULL.json")) as f:
        return json.load(f)


def test_headline_names_are_registered():
    unknown = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not unknown, f"HEADLINE entries not in registry: {unknown}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicates"


def test_heavy_queries_stay_in_headline():
    # Selection rule: any query measured >= 1s in the last committed
    # full-suite record stays benched, so a future regression in a
    # heavy query is caught by vs_prev, not lost to list churn.
    rec = _last_full_record()
    heavy = {
        n
        for n, sec in rec.get("queries", {}).items()
        if isinstance(sec, (int, float)) and sec >= 1.0 and n in QUERIES
    }
    dropped = sorted(heavy - set(bench.HEADLINE))
    assert not dropped, (
        "queries >=1s in BENCH_FULL.json dropped from HEADLINE "
        f"(re-add or justify): {dropped}"
    )


def test_streaming_floor_encoded(monkeypatch):
    # The warm-throughput floor must stay a real DEFAULT in the bench
    # source (not only an env override), with headroom below the last
    # committed warm median so host noise alone can't trip it.
    # Asserted on the PARSED value with the env var absent (round-9
    # ADVICE: the old literal-substring check broke on reformatting
    # and passed even if the default was used elsewhere).
    monkeypatch.delenv("SPARK_GRAFT_STREAM_FLOOR_EPS", raising=False)
    floor = float(os.environ.get("SPARK_GRAFT_STREAM_FLOOR_EPS", "75000"))
    # mirror bench.main()'s exact parse expression on the live source
    src = open(os.path.join(HERE, "bench.py")).read()
    assert 'SPARK_GRAFT_STREAM_FLOOR_EPS' in src
    import re

    m = re.search(
        r'SPARK_GRAFT_STREAM_FLOOR_EPS",\s*"([0-9._]+)"', src
    )
    assert m, "bench.py lost the inline floor default"
    assert float(m.group(1)) == floor == 75000.0
    rec = _last_full_record()
    streaming = rec.get("streaming", {})
    if "rate_eps" in streaming:
        assert streaming["rate_eps"] >= floor * 0.9, (
            "committed warm median is within 10% of the floor — "
            "either throughput regressed or the floor needs lowering"
        )


def test_every_registered_query_is_benched():
    # VERDICT r10 #2: a regression on a query is invisible until it
    # has a first timing row — every registered key must be in the
    # bench set from the round it lands. BENCH_EXCLUDED exists for a
    # documented opt-out; it must stay empty unless a key genuinely
    # cannot run under the bench harness.
    unbenched = sorted(
        set(QUERIES) - set(bench.HEADLINE) - set(bench.BENCH_EXCLUDED)
    )
    assert not unbenched, (
        f"registered queries missing from the bench set: {unbenched}"
    )
    assert not bench.BENCH_EXCLUDED, (
        "BENCH_EXCLUDED must carry a documented justification per key"
    )


def test_full_record_selection_is_auditable():
    # VERDICT r10 #4: the committed record must expose the
    # quietest-of-N selection — the runs_considered field lists every
    # same-round full attempt that was NOT committed.
    rec = _last_full_record()
    assert "runs_considered" in rec, (
        "BENCH_FULL.json lacks runs_considered — regenerate with the "
        "current bench.py"
    )
    assert isinstance(rec["runs_considered"], list)


def test_full_record_declares_provenance():
    # VERDICT r11 #5: the committed record says WHO ran it ("builder"
    # when the builder session exports SPARK_GRAFT_BENCH_PROVENANCE,
    # "external" otherwise — e.g. the driver's own post-commit pass),
    # so a driver overwrite of the committed builder record is
    # self-describing rather than inferred from timestamps.
    rec = _last_full_record()
    assert rec.get("provenance") in ("builder", "external"), (
        "BENCH_FULL.json lacks provenance — regenerate with the "
        "current bench.py"
    )


def test_headline_names_in_committed_record():
    # Round-9 ADVICE: a HEADLINE addition without a regenerated
    # committed BENCH_FULL.json leaves the new query with no vs_prev
    # baseline. Every HEADLINE name must appear in the committed
    # full-suite record (regenerate BENCH_FULL.json when HEADLINE
    # changes, and commit them together).
    rec = _last_full_record()
    queries = rec.get("queries", {})
    missing = sorted(set(bench.HEADLINE) - set(queries))
    assert not missing, (
        "HEADLINE queries absent from committed BENCH_FULL.json "
        f"(regenerate + commit the record): {missing}"
    )


def test_same_round_rerun_inherits_full_prev_baseline(tmp_path, monkeypatch):
    # Round-11 find: a same-round rerun overwrites BENCH_FULL.json, and
    # without the prev_queries carry the rerun's vs_prev falls back to
    # the driver record's compact tail (~45 queries) — total_common
    # collapsed 106.6s -> 51.8s. Pin the inheritance branch.
    import importlib
    import json as _json

    import bench as bench_mod

    d = tmp_path
    # a prior-round driver record with only a COMPACT queries dict
    (d / "BENCH_r10.json").write_text(_json.dumps(
        {"parsed": {"queries": {"q_compact": 1.0}}}
    ))
    # a same-round full record carrying the full prev mapping
    (d / "BENCH_FULL.json").write_text(_json.dumps(
        {
            "round_guess": 11,
            "queries": {"q_a": 1.0},
            "prev_round": 10,
            "prev_queries": {"q_a": 0.9, "q_b": 2.0, "q_compact": 1.1},
        }
    ))
    monkeypatch.setattr(
        bench_mod.os.path, "abspath", lambda p: str(d / "bench.py")
    )
    try:
        n, prev = bench_mod._prev_round_queries()
    finally:
        importlib.reload(bench_mod)
    assert n == 10
    assert prev == {"q_a": 0.9, "q_b": 2.0, "q_compact": 1.1}


def test_burst_retries_recorded_in_committed_record():
    # The one-sided retry rule must be auditable: whenever the
    # committed record used burst retries, the field names the rescued
    # queries (absent field == no retries happened).
    rec = _last_full_record()
    br = rec.get("burst_retries")
    if br is not None:
        assert isinstance(br, dict) and br
        assert all(
            isinstance(v, int) and 1 <= v <= 2 for v in br.values()
        )
        assert set(br) <= set(rec["queries"])


def test_committed_record_is_quiet():
    # VERDICT r15 #1: the r15 snapshot committed a CONTENDED record
    # (warm spread 5.36, streaming 48.4k eps under the 75k floor) in
    # violation of the quietest-of-N protocol, making the tree red.
    # Guard the protocol in the suite itself: the COMMITTED record
    # must be a quiet run — floor not violated and warm streaming
    # spread within the band every historical quiet run satisfied
    # (r14: 1.589, r15 quiet: 1.312; contended runs measured 2.87 and
    # 5.36). A record that trips this belongs in runs_considered, not
    # in BENCH_FULL.json.
    rec = _last_full_record()
    streaming = rec.get("streaming", {})
    assert not streaming.get("floor_violated", False), (
        "committed record has streaming_floor_violated — commit the "
        "round's quietest run instead"
    )
    spread = streaming.get("warm_spread")
    if spread is not None:
        assert spread <= 2.5, (
            f"committed record's warm streaming spread {spread} says "
            "the run was contended — commit the round's quietest run "
            "instead"
        )


def test_bench_warm_perimeter_frozen():
    # VERDICT r15 #7: bench_warm moves maintained-table builds OUT of
    # the timed region for its consumer sets. That perimeter is part
    # of the bench contract — any future expansion silently shrinks
    # what the bench measures and must be argued as a harness change,
    # not slipped in. Pin the LITERAL membership (sets unchanged since
    # round 12).
    from msk_flink_streaming_cdk_spark.registry.llm_q import (
        KNN_GRAPH_CONSUMERS,
        PAIR_GRAPH_CONSUMERS,
        UNIT_EMB_CONSUMERS,
    )

    assert PAIR_GRAPH_CONSUMERS == frozenset({
        "dedup_ngram_jaccard_pairs",
        "dedup_connected_components",
        "dedup_connected_components_star",
        "pipeline_near_dedup_corpus",
        "pipeline_near_dedup_keep_central",
        "pipeline_admission_decisions",
        "pipeline_forget_expand",
        "dedup_incremental_components",
        "dq_split_leakage",
        "dedup_cluster_stats",
        "dedup_minhash_recall",
        "dedup_minhash_estimate_audit",
        "dedup_simhash_recall",
        "dedup_graph_triangle_count",
        "dedup_graph_pagerank",
        "graph_label_propagation",
        "graph_kcore_mirror_clusters",
    })
    assert UNIT_EMB_CONSUMERS == frozenset({
        "similarity_nnd_recall",
        "similarity_graph_search_topk",
        "similarity_graph_search_recall",
        "similarity_incremental_knn_merge",
        "dedup_embedding_cosine_pairs",
        "dedup_embedding_recall",
        "dedup_semantic_prune",
    })
    assert KNN_GRAPH_CONSUMERS == frozenset({
        "similarity_graph_search_topk",
        "similarity_graph_search_recall",
    })
    # The two single-key warms (corpus labels, BPE merge table) are
    # likewise pinned: bench_warm must mention exactly these names.
    import inspect

    from msk_flink_streaming_cdk_spark.registry.llm_q import bench_warm

    src = inspect.getsource(bench_warm)
    assert 'name == "dedup_incremental_components"' in src
    assert 'name == "text_bpe_encode_tokens"' in src
    # and no other equality-gated warms exist
    import re as _re

    gated = _re.findall(r'name == "([a-z0-9_]+)"', src)
    assert sorted(gated) == [
        "dedup_incremental_components", "text_bpe_encode_tokens",
    ]
