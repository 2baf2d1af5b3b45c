#!/usr/bin/env python3
"""Synthetic tests for the per-table drift adjudication (VERDICT r17
item 2 'done' criterion: prove a shifted-table flag and an
unshifted-table flag normalize DIFFERENTLY, plus the ADVICE r17 probe
corroboration clamp). Pure-python, no Spark: exercises the routing /
multiplier / banding functions post_adjudicate exposes.

Run: python3 tools/test_post_adjudicate.py  (exit 0 = all pass)
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import post_adjudicate as pa  # noqa: E402


def test_per_table_normalization_differs():
    # sentinel detail: orders/lineitem shifted 2x by testdata
    # regeneration, events steady at 1.0x
    detail = {
        "q1_pricing_summary": {"ratio": 2.0},
        "q_top_orders": {"ratio": 1.9},
        "q_pivot_status": {"ratio": 2.1},
        "q_events_funnel": {"ratio": 1.0},
        "q_json_events": {"ratio": 1.02},
        "q_events_rolling": {"ratio": 0.98},
    }
    groups = {
        "orders_lineitem": ["q1_pricing_summary", "q_top_orders",
                            "q_pivot_status"],
        "events": ["q_events_funnel", "q_json_events", "q_events_rolling"],
    }
    per, glob, dropped = pa.group_multipliers(detail, groups)
    assert not dropped, dropped
    assert abs(per["orders_lineitem"] - 2.0) < 1e-9, per
    assert abs(per["events"] - 1.0) < 1e-9, per

    # a 1.5x-elevated reading on an ORDERS gate (whose table shifted
    # 2x) normalizes to 0.75x -> noise; the SAME reading on an EVENTS
    # gate (unshifted table) stays 1.5x -> real. Under the old global
    # scalar both would have banded identically.
    base = 1.0
    reading = 1.5
    m_orders = pa.mult_for("q_priority_by_status", per, glob)
    m_events = pa.mult_for("q_events_hourly", per, glob)
    assert m_orders != m_events, (m_orders, m_events)
    v_orders = pa.band_verdict(reading / m_orders, base, "slower")
    v_events = pa.band_verdict(reading / m_events, base, "slower")
    assert v_orders == "noise", v_orders
    assert v_events == "real", v_events


def test_group_fallback_to_global():
    # a group with <2 usable sentinels falls back to the global median
    detail = {
        "q1_pricing_summary": {"ratio": 1.4},
        "q_top_orders": {"ratio": 1.4},
        "ta_lang_id": {"ratio": 1.0},
    }
    groups = {
        "orders_lineitem": ["q1_pricing_summary", "q_top_orders"],
        "documents": ["ta_lang_id", "ta_fingerprint"],  # only 1 usable
    }
    per, glob, dropped = pa.group_multipliers(detail, groups)
    assert per["documents"] is None
    assert pa.mult_for("dd_exact", per, glob) == glob


def test_probe_clamp_refuses_uncorroborated_multiplier():
    # sentinel multiplier 3.0x but the CPU probe reads 1.0x — an
    # engine-wide regression scenario: the multiplier must clamp to
    # 1.5x instead of laundering the slowdown
    m, clamped = pa.clamp_mult(3.0, 1.0)
    assert clamped and m == 1.5, (m, clamped)
    # corroborated: the box genuinely is 3x slower (probe agrees)
    m, clamped = pa.clamp_mult(3.0, 2.5)
    assert not clamped and m == 3.0, (m, clamped)
    # small multipliers never need corroboration
    m, clamped = pa.clamp_mult(1.3, None)
    assert not clamped and m == 1.3, (m, clamped)


def test_poisoned_sentinel_discarded():
    # VERDICT r18 item 1 'done' criterion: a mis-frozen baseline (the
    # r18 ta_lang_id scenario — frozen ~2x its reproducible reading,
    # so its RATIO reads ~0.5x while its group-mates read ~1.0x) must
    # be discarded, not averaged into the group multiplier.
    detail = {
        "ta_lang_id": {"ratio": 0.51},      # poisoned (stale baseline)
        "ta_fingerprint": {"ratio": 0.98},
        "ta_quality": {"ratio": 1.03},
        "q1_pricing_summary": {"ratio": 1.0},
        "q_top_orders": {"ratio": 1.01},
        "q_pivot_status": {"ratio": 0.99},
    }
    groups = {
        "documents": ["ta_lang_id", "ta_fingerprint", "ta_quality"],
        "orders_lineitem": ["q1_pricing_summary", "q_top_orders",
                            "q_pivot_status"],
    }
    per, glob, dropped = pa.group_multipliers(detail, groups)
    assert dropped.get("documents") == ["ta_lang_id"], dropped
    # the surviving pair agrees -> their median serves, ~1.0x, so a
    # documents-family gate is no longer inflated by /0.72
    assert abs(per["documents"] - 1.005) < 1e-9, per
    # the poisoned ratio is also excluded from the global median
    assert 0.98 <= glob <= 1.01, glob


def test_two_sentinel_disagreement_falls_back_to_global():
    # with only 2 sentinels the outlier is unidentifiable: the group
    # must fall back to the global median rather than trust either
    detail = {
        "ta_lang_id": {"ratio": 0.5},
        "ta_fingerprint": {"ratio": 1.0},
        "q1_pricing_summary": {"ratio": 1.0},
        "q_top_orders": {"ratio": 1.02},
        "q_pivot_status": {"ratio": 0.98},
    }
    groups = {
        "documents": ["ta_lang_id", "ta_fingerprint"],
        "orders_lineitem": ["q1_pricing_summary", "q_top_orders",
                            "q_pivot_status"],
    }
    per, glob, dropped = pa.group_multipliers(detail, groups)
    assert per["documents"] is None, per
    assert set(dropped.get("documents", [])) == {"ta_lang_id",
                                                 "ta_fingerprint"}
    assert pa.mult_for("dd_exact", per, glob) == glob


def test_testdata_regen_exempts_probe_clamp():
    # ADVICE r18: a 2.5x data-driven multiplier (testdata regenerated,
    # probe blind at 1.0x) must be APPLIED, not clamped to 1.5x
    m, clamped = pa.clamp_mult(2.5, 1.0, testdata_regenerated=True)
    assert not clamped and m == 2.5, (m, clamped)
    # without the regen evidence the old clamp still bites
    m, clamped = pa.clamp_mult(2.5, 1.0, testdata_regenerated=False)
    assert clamped and m == 1.5, (m, clamped)


def test_over_budget_isolated():
    live = {"ft_qa_train": 12.39, "ft_translate_train": 15.28,
            "ds_curation_full": 7.8, "slowpoke": 13.0, "nojson": 12.5}
    iso = {"ft_qa_train": 7.99, "ft_translate_train": 9.09,
           "slowpoke": 12.7}
    over = pa.over_budget_isolated(live, iso, budget=12.0)
    # live-over gates exonerated by isolated medians drop out;
    # a gate isolated-over stays; an UNMEASURED live-over gate must
    # never pass silently
    assert over == ["nojson", "slowpoke"], over
    # a gate whose isolated reading is over budget is flagged even if
    # its live reading somehow was not (defensive)
    over2 = pa.over_budget_isolated({}, {"x": 12.4}, budget=12.0)
    assert over2 == ["x"], over2


def test_gate_routing():
    assert pa.group_of("q_events_hourly") == "events"
    assert pa.group_of("q_sessionize") == "events"
    assert pa.group_of("q3_segment_revenue") == "orders_lineitem"
    assert pa.group_of("ml_metrics_reg") == "orders_lineitem"
    assert pa.group_of("dd_minhash_lsh") == "documents"
    assert pa.group_of("dd_semantic_dedup") == "embeddings"  # explicit
    assert pa.group_of("sim_ann_pq") == "embeddings"
    assert pa.group_of("ft_conversation_ann") == "embeddings"  # explicit
    assert pa.group_of("ta_bpe_train3") == "documents"


def test_freeze_immutable_to_session_writes():
    # VERDICT r19 item 2 'done' criterion: a full adjudication session's
    # write phase (persist_outputs is EVERY file write a session does)
    # must leave bench_isolated_baseline.json byte-identical, and the
    # merged readings must land in bench_isolated_latest.json instead.
    import json
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        old = (pa.REG, pa.BASE, pa.LATEST, pa.INTENTIONAL,
               pa.DRIFT_ARTIFACT)
        try:
            pa.REG = os.path.join(td, "bench_regressions.json")
            pa.BASE = os.path.join(td, "bench_isolated_baseline.json")
            pa.LATEST = os.path.join(td, "bench_isolated_latest.json")
            pa.INTENTIONAL = os.path.join(td, "intentional.json")
            pa.DRIFT_ARTIFACT = os.path.join(td, "drift.json")
            frozen = '{"dd_bloom_membership":1.376679381,"q_top_orders":0.41}\n'
            with open(pa.BASE, "w") as f:
                f.write(frozen)
            # a session that measured dd_bloom_membership at 1.21 —
            # the exact r19 rewrite scenario
            reg = {"dd_bloom_membership": {"verdict": "noise",
                                           "isolated": 1.21}}
            pa.persist_outputs(reg, {"dd_bloom_membership": 1.209598},
                               None, {"band": pa.BAND})
            with open(pa.BASE) as f:
                assert f.read() == frozen, "freeze file was rewritten!"
            with open(pa.LATEST) as f:
                assert json.load(f) == {"dd_bloom_membership": 1.209598}
            with open(pa.REG) as f:
                assert json.load(f) == reg
        finally:
            (pa.REG, pa.BASE, pa.LATEST, pa.INTENTIONAL,
             pa.DRIFT_ARTIFACT) = old


def test_banding_anchor_is_freeze_committed_not_working_tree():
    # The anchor must come from git (the last commit touching the
    # baseline), so an on-disk rewrite — committed by NOBODY — cannot
    # move it. Build a real throwaway git repo to prove it.
    import json
    import os
    import subprocess
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        env = {**os.environ, "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL":
               "t@t", "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL":
               "t@t", "HOME": td}
        def git(*a):
            subprocess.run(["git"] + list(a), cwd=td, env=env,
                           check=True, capture_output=True)
        git("init", "-q")
        base = os.path.join(td, "bench_isolated_baseline.json")
        with open(base, "w") as f:
            f.write('{"g": 1.377}\n')
        git("add", "bench_isolated_baseline.json")
        git("commit", "-q", "-m", "freeze")
        with open(base, "w") as f:  # uncommitted poison
            f.write('{"g": 0.9}\n')
        old_repo, old_base = pa.REPO, pa.BASE
        try:
            pa.REPO, pa.BASE = td, base
            vals, commit = pa.freeze_committed_baseline()
            assert vals == {"g": 1.377}, vals
            assert commit is not None
        finally:
            pa.REPO, pa.BASE = old_repo, old_base
        # and the poisoned on-disk value is still there (the reader
        # never "fixes" the file; it just refuses to anchor on it)
        with open(base) as f:
            assert json.load(f) == {"g": 0.9}


def test_regen_detection_keys_on_content_not_mtime():
    # ADVICE r19: touching/copying parquet (mtime change, same bytes)
    # must NOT open the probe-clamp waiver; changed bytes MUST.
    import json
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        sf = os.path.join(td, "sf0.1")
        os.makedirs(sf)
        with open(os.path.join(sf, "documents.parquet"), "wb") as f:
            f.write(b"PAR1-original-bytes")
        fp = pa.testdata_fingerprint(sf)
        meta = {"commit": "deadbeef", "frozen_at_epoch": 0,
                "testdata_fingerprint": {"sf0.1": fp}}
        old_meta = pa.BASE_META
        try:
            pa.BASE_META = os.path.join(td, "baseline_meta.json")
            with open(pa.BASE_META, "w") as f:
                json.dump(meta, f)
            # mtime bumped far past the freeze, bytes unchanged
            os.utime(os.path.join(sf, "documents.parquet"),
                     (2000000000, 2000000000))
            assert pa.testdata_regenerated_since_freeze(sf) is False
            # bytes changed -> regenerated
            with open(os.path.join(sf, "documents.parquet"), "wb") as f:
                f.write(b"PAR1-regenerated-bytes")
            assert pa.testdata_regenerated_since_freeze(sf) is True
        finally:
            pa.BASE_META = old_meta


if __name__ == "__main__":
    for name, fn in sorted(globals().items()):
        if name.startswith("test_"):
            fn()
            print(f"PASS {name}")
    print("all post_adjudicate synthetic tests pass")
