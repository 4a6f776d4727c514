"""Bench-artifact ownership (VERDICT r8 #1).

Three rounds running, a later full bench run — the round driver's
finalize, or a second builder session — silently clobbered the
committed min-of-N fold in BENCH_local_r{N}.json, needing a manual git
restore each round. Pins the structural fix: bench.py writes session
drafts and never overwrites an existing canonical; tools/fold_bench.py
owns the canonical, folding drafts elementwise-min and regenerating
the mover ledger.
"""

from __future__ import annotations

import importlib.util
import json
import os

import bench


def _load_fold_bench():
    spec = importlib.util.spec_from_file_location(
        "fold_bench",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "fold_bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _result(value, queries, steady=None, stalls=None):
    return {
        "metric": "total_query_seconds", "value": value, "unit": "sec",
        "sf": "0.1", "reps": 3, "prev_queries_recovered": len(queries),
        "stalls": stalls or {"reps_over_5x_steady": 0, "retries": {}},
        "spread": {k: 0.1 for k in queries},
        "movers": {},
        "compile": {k: v * 3 for k, v in queries.items()},
        "steady": steady or dict(queries),
        "queries": dict(queries),
    }


def test_bench_never_overwrites_existing_canonical(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    # driver artifact for round 8 -> this_round = 9
    (tmp_path / "BENCH_r08.json").write_text("{}")
    canonical = tmp_path / "BENCH_local_r09.json"
    committed = json.dumps(_result(153.94, {"a": 0.5}))
    canonical.write_text(committed)

    full = _result(170.16, {"a": 0.9})
    draft = bench._persist_full_result(full, {}, {}, 0)

    # the committed fold is byte-identical — no manual git restore needed
    assert canonical.read_text() == committed
    # the run landed in a session draft instead
    assert os.path.basename(draft) == "BENCH_session_r09_s1.json"
    assert json.loads((tmp_path / "BENCH_session_r09_s1.json").read_text()) == full
    # no ledger written by a non-canonical run
    assert not (tmp_path / "docs" / "PERF_NOTES_r9_movers.md").exists()


def test_bench_bootstraps_canonical_when_absent(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    (tmp_path / "BENCH_r08.json").write_text("{}")
    full = _result(100.0, {"a": 0.5})
    bench._persist_full_result(full, {}, {}, 0)
    assert json.loads((tmp_path / "BENCH_local_r09.json").read_text()) == full
    # bootstrap owner also writes the ledger
    assert (tmp_path / "docs" / "PERF_NOTES_r9_movers.md").exists()


def test_bench_session_drafts_sequence(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    (tmp_path / "BENCH_r08.json").write_text("{}")
    p1 = bench._persist_full_result(_result(1.0, {"a": 1.0}), {}, {}, 0)
    p2 = bench._persist_full_result(_result(2.0, {"a": 2.0}), {}, {}, 0)
    assert os.path.basename(p1) == "BENCH_session_r09_s1.json"
    assert os.path.basename(p2) == "BENCH_session_r09_s2.json"


def test_torn_canonical_write_leaves_nothing_behind(tmp_path, monkeypatch):
    """ADVICE r9: a json.dump that dies partway (ENOSPC) after winning
    the exclusive create used to persist a TRUNCATED canonical that
    every later session refused to replace — the round's fold then
    silently never bootstrapped. The tmp+hardlink write is
    all-or-nothing: on failure no canonical (and no draft) exists, and
    the next healthy run bootstraps normally."""
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    (tmp_path / "BENCH_r08.json").write_text("{}")

    real_dump = json.dump
    calls = {"n": 0}

    def failing_dump(obj, fh, **kw):
        calls["n"] += 1
        fh.write('{"metric": "total_query_se')  # partial bytes, then die
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(bench.json, "dump", failing_dump)
    bench._persist_full_result(_result(1.0, {"a": 1.0}), {}, {}, 0)
    assert calls["n"] >= 1
    # neither a truncated canonical nor a truncated draft survives
    assert not (tmp_path / "BENCH_local_r09.json").exists()
    assert not (tmp_path / "BENCH_session_r09_s1.json").exists()
    assert not list(tmp_path.glob("*.tmp.*"))

    # a later healthy run bootstraps the canonical as usual
    monkeypatch.setattr(bench.json, "dump", real_dump)
    full = _result(1.0, {"a": 1.0})
    draft = bench._persist_full_result(full, {}, {}, 0)
    assert os.path.basename(draft) == "BENCH_session_r09_s1.json"
    assert json.loads((tmp_path / "BENCH_local_r09.json").read_text()) == full


def test_fold_elementwise_min_and_stall_sum():
    fb = _load_fold_bench()
    d1 = _result(
        3.0, {"a": 1.0, "b": 2.0}, steady={"a": 0.9, "b": 1.8},
        stalls={"reps_over_5x_steady": 1, "retries": {"a": 1}},
    )
    d2 = _result(
        2.5, {"a": 1.5, "b": 1.0}, steady={"a": 1.4, "b": 0.9},
        stalls={"reps_over_5x_steady": 2, "retries": {"a": 1, "b": 2}},
    )
    out = fb.fold([d1, d2])
    assert out["queries"] == {"a": 1.0, "b": 1.0}
    assert out["steady"] == {"a": 0.9, "b": 0.9}
    assert out["value"] == 2.0
    assert out["stalls"]["reps_over_5x_steady"] == 3
    assert out["stalls"]["retries"] == {"a": 2, "b": 2}
    # spread folds as MAX so the worst observed noise stays visible
    assert out["spread"] == {"a": 0.1, "b": 0.1}


def test_fold_excludes_stale_plan_minima():
    """VERDICT r9 #1: a query whose plan changed mid-round must not
    fold minima measured on the OLD plan. The newest session's
    fingerprint is the reference; mismatching entries are excluded,
    unverifiable (no-plans) entries are excluded once a reference
    exists, and queries without a reference fold unguarded."""
    fb = _load_fold_bench()
    # s1 measured `a` on the old plan (fp OLD) — faster, but dead
    d1 = _result(2.4, {"a": 0.4, "b": 2.0}, steady={"a": 0.38, "b": 1.9})
    d1["plans"] = {"a": "OLD", "b": "BBB"}
    # s2 measured the shipped plan
    d2 = _result(2.65, {"a": 0.55, "b": 2.1}, steady={"a": 0.53, "b": 2.0})
    d2["plans"] = {"a": "NEW", "b": "BBB"}
    out = fb.fold([d1, d2], ref_plans=d2["plans"])
    # `a`: the 0.4 stale minimum is excluded; only the current plan counts
    assert out["queries"]["a"] == 0.55
    assert out["steady"]["a"] == 0.53
    assert out["compile"]["a"] == d2["compile"]["a"]
    # `b` (unchanged fingerprint) still folds the cross-session min
    assert out["queries"]["b"] == 2.0
    assert out["steady"]["b"] == 1.9
    assert out["stale_dropped"] == {"a": 1}

    # a pre-guard draft with NO plans map is unverifiable once a
    # reference exists — excluded for every referenced query
    d0 = _result(2.2, {"a": 0.3, "b": 1.8})
    out = fb.fold([d0, d1, d2], ref_plans=d2["plans"])
    assert out["queries"] == {"a": 0.55, "b": 2.0}

    # no reference at all (legacy round): everything folds as before
    out = fb.fold([d0, d1, d2])
    assert out["queries"] == {"a": 0.3, "b": 1.8}


def test_fold_bench_main_drops_stale_canonical_minima(tmp_path, monkeypatch):
    """End-to-end: a stale bootstrap canonical (old-plan minima) plus a
    post-change session — the refolded canonical keeps only times the
    shipped plan can reproduce, records the exclusion in the note, and
    stores the reference fingerprints for future refolds."""
    fb = _load_fold_bench()
    monkeypatch.setattr(fb, "_HERE", str(tmp_path))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"sf": "0.1", "parsed": None})
    )
    s1 = _result(2.4, {"a": 0.4, "b": 2.0})
    s1["plans"] = {"a": "OLD", "b": "BBB"}
    s2 = _result(2.65, {"a": 0.55, "b": 2.1})
    s2["plans"] = {"a": "NEW", "b": "BBB"}
    (tmp_path / "BENCH_session_r09_s1.json").write_text(json.dumps(s1))
    (tmp_path / "BENCH_session_r09_s2.json").write_text(json.dumps(s2))
    # bootstrap canonical = s1 (the old plan's numbers)
    (tmp_path / "BENCH_local_r09.json").write_text(json.dumps(s1))
    monkeypatch.setattr("sys.argv", ["fold_bench.py", "--round", "9"])
    fb.main()
    out = json.loads((tmp_path / "BENCH_local_r09.json").read_text())
    assert out["queries"] == {"a": 0.55, "b": 2.0}
    assert out["plans"] == {"a": "NEW", "b": "BBB"}
    assert "stale-plan minima excluded" in out["note"]
    assert "a" in out["note"]


def test_fold_bench_main_owns_canonical_and_ledger(tmp_path, monkeypatch):
    fb = _load_fold_bench()
    monkeypatch.setattr(fb, "_HERE", str(tmp_path))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    # previous round's committed fold (movers baseline)
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"sf": "0.1", "parsed": None})
    )
    (tmp_path / "BENCH_local_r08.json").write_text(
        json.dumps(_result(2.0, {"a": 1.0, "b": 1.0}))
    )
    # two round-9 session drafts; `b` genuinely doubled in both
    (tmp_path / "BENCH_session_r09_s1.json").write_text(
        json.dumps(_result(3.1, {"a": 1.1, "b": 2.0}))
    )
    (tmp_path / "BENCH_session_r09_s2.json").write_text(
        json.dumps(_result(3.0, {"a": 0.95, "b": 2.05}))
    )
    # a stale bootstrap canonical holding an older (better) minimum for a
    monkeypatch.setattr(
        "sys.argv", ["fold_bench.py", "--round", "9", "--note", "unit test"]
    )
    (tmp_path / "BENCH_local_r09.json").write_text(
        json.dumps(_result(2.9, {"a": 0.9, "b": 2.0}))
    )
    fb.main()
    out = json.loads((tmp_path / "BENCH_local_r09.json").read_text())
    assert out["sessions"] == 2
    # min across drafts AND the prior canonical (hand-merged minima kept)
    assert out["queries"] == {"a": 0.9, "b": 2.0}
    assert out["value"] == 2.9
    assert "unit test" in out["note"]
    # movers recomputed from folded steady vs r8 committed fold
    assert "b" in out["movers"] and out["movers"]["b"]["ratio"] == 2.0
    ledger = (tmp_path / "docs" / "PERF_NOTES_r9_movers.md").read_text()
    assert "| b | 1.0 | 2.0 | 2.0 | 0 |" in ledger


def test_fold_ref_comes_only_from_newest_draft(tmp_path, monkeypatch, capsys):
    """r10 review: if the NEWEST session draft carries no fingerprints
    (fingerprinting can legitimately fail — _plan_fingerprint swallows
    py4j surface moves), an older draft's fingerprints must NOT become
    the reference: after a plan change that would certify the OLD
    minima and exclude the current ones — the guard inverted. The fold
    downgrades to unguarded instead, with a stderr warning."""
    fb = _load_fold_bench()
    monkeypatch.setattr(fb, "_HERE", str(tmp_path))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"sf": "0.1", "parsed": None})
    )
    s1 = _result(2.4, {"a": 0.4})
    s1["plans"] = {"a": "OLD"}
    s2 = _result(2.65, {"a": 0.55})
    s2["plans"] = {}  # fingerprinting failed in the newest session
    (tmp_path / "BENCH_session_r09_s1.json").write_text(json.dumps(s1))
    (tmp_path / "BENCH_session_r09_s2.json").write_text(json.dumps(s2))
    monkeypatch.setattr("sys.argv", ["fold_bench.py", "--round", "9"])
    fb.main()
    out = json.loads((tmp_path / "BENCH_local_r09.json").read_text())
    # unguarded fold: both drafts contribute (NOT s1-certified-only)
    assert out["queries"] == {"a": 0.4}
    assert "plans" not in out
    assert "folding UNGUARDED" in capsys.readouterr().err


def test_exclusive_write_falls_back_when_hardlinks_unsupported(
    tmp_path, monkeypatch
):
    """r10 review: on a filesystem without hard links (exFAT, some
    overlay mounts) the atomic link must fall back to the plain
    exclusive create rather than silently dropping the whole session's
    minima."""
    real_link = os.link

    def no_link(src, dst):
        raise OSError(1, "Operation not permitted")

    monkeypatch.setattr(bench.os, "link", no_link)
    p = tmp_path / "BENCH_local_r99.json"
    assert bench._exclusive_write_json(str(p), {"x": 1}) == "created"
    assert json.loads(p.read_text()) == {"x": 1}
    # second write: exclusive semantics still hold on the fallback path
    assert bench._exclusive_write_json(str(p), {"x": 2}) == "exists"
    assert json.loads(p.read_text()) == {"x": 1}
    assert not list(tmp_path.glob("*.tmp.*"))
    monkeypatch.setattr(bench.os, "link", real_link)


def test_fallback_torn_write_leaves_nothing_behind(tmp_path, monkeypatch):
    """ADVICE r10: on the no-hardlink fallback path, a write that dies
    partway (ENOSPC after the exclusive create succeeded) must not
    persist a TRUNCATED artifact — later sessions would get 'exists'
    and refuse to replace it, and fold_bench crashes loading a torn
    draft. The fallback unlinks its own torn write before reporting
    the error."""
    import builtins

    def no_link(src, dst):
        raise OSError(1, "Operation not permitted")

    monkeypatch.setattr(bench.os, "link", no_link)

    real_open = builtins.open
    p = tmp_path / "BENCH_session_r99_s1.json"

    class Torn:
        def __init__(self, fh):
            self._fh = fh

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            self._fh.close()
            return False

        def write(self, s):
            self._fh.write(s[:12])  # partial bytes, then die
            self._fh.flush()
            raise OSError(28, "No space left on device")

    def torn_open(file, mode="r", *a, **kw):
        fh = real_open(file, mode, *a, **kw)
        if mode == "x" and str(file) == str(p):
            return Torn(fh)
        return fh

    monkeypatch.setattr(builtins, "open", torn_open)
    assert bench._exclusive_write_json(str(p), {"x": 1}) == "error"
    monkeypatch.setattr(builtins, "open", real_open)
    # the torn artifact is gone: a later healthy write succeeds
    assert not p.exists()
    assert not list(tmp_path.glob("*.tmp.*"))
    monkeypatch.setattr(bench.os, "link", no_link)
    assert bench._exclusive_write_json(str(p), {"x": 2}) == "created"
    assert json.loads(p.read_text()) == {"x": 2}


def test_plan_normalization_preserves_identifier_text():
    """ADVICE r10: the volatile-token strip must not delete whole
    word_<digits> identifiers — 'Project [p_50#12, top_10#13]' used to
    normalize to 'Project [, ]', so a source change that only renamed
    such a column kept an identical fingerprint (staleness guard
    silently passed stale minima) and distinct plans could collide."""
    n = bench._normalize_plan_text
    # identifier TEXT survives; only the digits (and expr ids) go
    assert n("Project [p_50#12, top_10#13]") == "Project [p_, top_]"
    # distinct plans no longer collide
    assert n("Project [p_50#12]") != n("Project [top_10#13]")
    # lambda counters still fold away: x_7 and x_9 normalize equal
    assert n("lambdafunction(x_7, x_7)") == n("lambdafunction(x_9, x_9)")
    # the fixpoint still removes exposed grouping-id literals
    assert n("gid#123 = 2") == n("gid#456 = 4")


def _attested(value, queries, calib_start, calib_end=None):
    d = _result(value, queries)
    d["attest"] = {
        "start": {"loadavg_1m": 4.0, "java_procs": 1,
                  "calib_s": calib_start},
        "end": {"loadavg_1m": 4.0, "java_procs": 1,
                "calib_s": calib_end if calib_end is not None
                else calib_start},
    }
    return d


def test_fold_tags_loaded_sessions(tmp_path, monkeypatch):
    """VERDICT r10 #1: a session whose fixed calibration probe runs
    >1.3x the round median is TAGGED in the fold (load_tags + note)
    but its minima still fold — loaded-box minima are valid
    lower-bound evidence when they win."""
    fb = _load_fold_bench()
    monkeypatch.setattr(fb, "_HERE", str(tmp_path))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"sf": "0.1", "parsed": None})
    )
    s1 = _attested(2.0, {"a": 1.0, "b": 1.0}, 0.10)
    s2 = _attested(2.1, {"a": 1.1, "b": 1.0}, 0.11)
    # s3 ran on a loaded box (calibration x2.2 the median) but still
    # holds the best `b`
    s3 = _attested(2.3, {"a": 1.4, "b": 0.9}, 0.22)
    for i, s in enumerate((s1, s2, s3), start=1):
        (tmp_path / f"BENCH_session_r09_s{i}.json").write_text(
            json.dumps(s)
        )
    monkeypatch.setattr("sys.argv", ["fold_bench.py", "--round", "9"])
    fb.main()
    out = json.loads((tmp_path / "BENCH_local_r09.json").read_text())
    assert list(out["load_tags"]) == ["BENCH_session_r09_s3.json"]
    # leave-one-out, fastest-other dropped (ADVICE r11 + r12 review):
    # 0.22 / median([0.11]) after dropping the fastest other (0.10)
    assert out["load_tags"]["BENCH_session_r09_s3.json"] == 2.0
    assert "load-tagged session(s)" in out["note"]
    assert "BENCH_session_r09_s3.json" in out["note"]
    # tagged, NOT excluded: s3's winning minimum folds
    assert out["queries"]["b"] == 0.9


def test_fold_no_tags_when_calibrations_agree(tmp_path, monkeypatch):
    fb = _load_fold_bench()
    monkeypatch.setattr(fb, "_HERE", str(tmp_path))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"sf": "0.1", "parsed": None})
    )
    s1 = _attested(2.0, {"a": 1.0}, 0.10)
    s2 = _attested(2.1, {"a": 1.1}, 0.12)
    for i, s in enumerate((s1, s2), start=1):
        (tmp_path / f"BENCH_session_r09_s{i}.json").write_text(
            json.dumps(s)
        )
    monkeypatch.setattr("sys.argv", ["fold_bench.py", "--round", "9"])
    fb.main()
    out = json.loads((tmp_path / "BENCH_local_r09.json").read_text())
    assert "load_tags" not in out
    assert "load-tagged" not in out["note"]


def test_load_tags_compare_per_column():
    """r11 review: start and end probes live on different baselines
    (start ~2.3x end on an idle box — executor JIT maturation, not
    load), so tagging compares start-vs-start-median and
    end-vs-end-median. A session whose END probe merely FAILED must
    not be tagged by its JIT-cold start value against everyone else's
    warm end values."""
    fb = _load_fold_bench()
    # attest absent (pre-r11 draft): no probes, never crashes
    assert fb._session_probes(_result(1.0, {"a": 1.0})) == {}
    assert fb.load_tags({}) == {}

    # three healthy sessions + one whose end probe failed (None):
    # its start (0.12) is NORMAL for the start column — no tag
    def probes(start, end):
        return ({"start": start, "end": end} if end is not None
                else {"start": start})

    healthy = {
        "s1": probes(0.12, 0.050),
        "s2": probes(0.118, 0.044),
        "s3": probes(0.124, 0.053),
        "s4": probes(0.12, None),  # end probe failed
    }
    assert fb.load_tags(healthy) == {}

    # loaded only at the END: caught by the end column
    loaded_end = dict(healthy)
    loaded_end["s4"] = probes(0.12, 0.09)
    tags = fb.load_tags(loaded_end)
    assert list(tags) == ["s4"] and tags["s4"] > 1.3

    # loaded only at the START (the r11 s1 case): caught by the start
    # column even though its end probe recovered
    loaded_start = dict(healthy)
    loaded_start["s4"] = probes(0.25, 0.050)
    tags = fb.load_tags(loaded_start)
    assert list(tags) == ["s4"] and tags["s4"] > 1.3


def test_load_tags_leave_one_out_small_rounds():
    """ADVICE r11: with only two attested sessions, an all-in median
    sits at the midpoint and a moderately loaded session (x1.5 its
    peer) escapes the 1.3x line entirely (1.5/1.25 = 1.2). The
    leave-one-out baseline compares each session against the OTHERS'
    median, so the loaded one tags at its true x1.5 — and the idle
    peer (ratio 1/1.5) never does."""
    fb = _load_fold_bench()
    two = {
        "s1": {"start": 0.12, "end": 0.050},
        "s2": {"start": 0.12, "end": 0.075},  # x1.5 its peer's end
    }
    tags = fb.load_tags(two)
    assert list(tags) == ["s2"] and tags["s2"] == 1.5

    # a single session has no baseline: nothing to tag against
    assert fb.load_tags({"s1": {"start": 0.12, "end": 0.05}}) == {}

    # agreeing pair: no tags in either direction
    assert fb.load_tags({
        "s1": {"start": 0.12, "end": 0.050},
        "s2": {"start": 0.125, "end": 0.052},
    }) == {}

    # r12 review: one anomalously FAST session in a 3-session round
    # must not drag the leave-one-out baseline down and tag the
    # normal majority (plain leave-one-out tagged s1 AND s2 here at
    # x1.33 each — the fastest other is dropped from the baseline)
    assert fb.load_tags({
        "s1": {"start": 0.12, "end": 0.10},
        "s2": {"start": 0.12, "end": 0.10},
        "s3": {"start": 0.12, "end": 0.05},
    }) == {}

    # and a genuinely loaded session in a 3-session round still tags
    tags = fb.load_tags({
        "s1": {"start": 0.12, "end": 0.10},
        "s2": {"start": 0.12, "end": 0.10},
        "s3": {"start": 0.12, "end": 0.22},
    })
    assert list(tags) == ["s3"] and tags["s3"] == 2.2


def test_fold_warns_on_partial_fingerprint_reference(
    tmp_path, monkeypatch, capsys
):
    """ADVICE r10: when the newest draft's plans map is non-empty but
    MISSING some queries that older drafts fingerprinted, those
    queries fold unguarded — the downgrade must be loud and name the
    queries, not silent (the old warning only fired when the newest
    map was entirely empty)."""
    fb = _load_fold_bench()
    monkeypatch.setattr(fb, "_HERE", str(tmp_path))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"sf": "0.1", "parsed": None})
    )
    s1 = _result(2.4, {"a": 0.4, "b": 2.0})
    s1["plans"] = {"a": "OLD", "b": "BBB"}
    s2 = _result(2.65, {"a": 0.55, "b": 2.1})
    s2["plans"] = {"b": "BBB"}  # fingerprinting `a` failed in s2
    (tmp_path / "BENCH_session_r09_s1.json").write_text(json.dumps(s1))
    (tmp_path / "BENCH_session_r09_s2.json").write_text(json.dumps(s2))
    monkeypatch.setattr("sys.argv", ["fold_bench.py", "--round", "9"])
    fb.main()
    err = capsys.readouterr().err
    assert "folding those UNGUARDED" in err
    assert "a" in err.split("UNGUARDED", 1)[1]
    out = json.loads((tmp_path / "BENCH_local_r09.json").read_text())
    # `a` folded unguarded (both drafts contribute); `b` stays guarded
    assert out["queries"]["a"] == 0.4
    assert out["queries"]["b"] == 2.0


def test_fold_stores_round_calibration_baseline(tmp_path, monkeypatch):
    """The canonical carries the round's calibration median + the
    per-session values, so the NEXT round can compare medians — a
    uniform box-speed shift (all sessions slower, none tagged
    within-round) becomes mechanically visible round-over-round."""
    fb = _load_fold_bench()
    monkeypatch.setattr(fb, "_HERE", str(tmp_path))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"sf": "0.1", "parsed": None})
    )
    s1 = _attested(2.0, {"a": 1.0}, 0.10)
    s2 = _attested(2.1, {"a": 1.1}, 0.12)
    for i, s in enumerate((s1, s2), start=1):
        (tmp_path / f"BENCH_session_r09_s{i}.json").write_text(
            json.dumps(s)
        )
    monkeypatch.setattr("sys.argv", ["fold_bench.py", "--round", "9"])
    fb.main()
    out = json.loads((tmp_path / "BENCH_local_r09.json").read_text())
    # the stored baseline is the END-probe median (the JIT-warm,
    # cross-round-comparable column)
    assert out["attest"]["calib_median_s"] == 0.11
    assert out["attest"]["session_calibs"] == {
        "BENCH_session_r09_s1.json": {"start": 0.10, "end": 0.10},
        "BENCH_session_r09_s2.json": {"start": 0.12, "end": 0.12},
    }
    # legacy drafts (no attest anywhere): no attest block, no crash
    for i in (1, 2):
        (tmp_path / f"BENCH_session_r09_s{i}.json").write_text(
            json.dumps(_result(2.0, {"a": 1.0}))
        )
    (tmp_path / "BENCH_local_r09.json").unlink()
    fb.main()
    out = json.loads((tmp_path / "BENCH_local_r09.json").read_text())
    assert "attest" not in out


def test_fold_cross_round_box_speed_and_fp_gated_movers(
    tmp_path, monkeypatch
):
    """VERDICT r11 next-round #3 + #4: with a prior canonical carrying
    attest.calib_median_s and reference fingerprints, the fold (a)
    stores the box-speed ratio (this round's end-probe median over the
    prior round's) and names it in the note, (b) marks each mover
    plan-identical vs plan-changed from fingerprint equality, and (c)
    attributes each mover to the BOX when its calibration-adjusted
    ratio falls back inside the non-mover band, else to CODE — so a
    uniform environment shift can never read as a code regression."""
    fb = _load_fold_bench()
    monkeypatch.setattr(fb, "_HERE", str(tmp_path))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    prev = _result(3.0, {"a": 1.0, "b": 1.0, "c": 1.0})
    prev["attest"] = {"calib_median_s": 0.04}
    prev["plans"] = {"a": "AAA", "b": "BBB", "c": "OLD"}
    (tmp_path / "BENCH_local_r08.json").write_text(json.dumps(prev))
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"sf": "0.1", "parsed": None})
    )
    # this round's box runs the probe at 2x the prior round's median:
    # a & b moved WITH the box (x2.0); c moved x4.0 on a changed plan
    s1 = _attested(8.0, {"a": 2.0, "b": 2.0, "c": 4.0}, 0.08)
    s1["plans"] = {"a": "AAA", "b": "BBB", "c": "NEW"}
    (tmp_path / "BENCH_session_r09_s1.json").write_text(json.dumps(s1))
    monkeypatch.setattr("sys.argv", ["fold_bench.py", "--round", "9"])
    fb.main()
    out = json.loads((tmp_path / "BENCH_local_r09.json").read_text())
    assert out["attest"]["prev_calib_median_s"] == 0.04
    assert out["attest"]["box_speed_ratio"] == 2.0
    assert "box-speed vs r8: x2.0" in out["note"]
    movers = out["movers"]
    assert movers["a"]["plan"] == "identical"
    assert movers["c"]["plan"] == "changed"
    assert movers["a"]["calib_adjusted"] == 1.0
    assert movers["a"]["attribution"] == "box"
    assert movers["c"]["calib_adjusted"] == 2.0
    assert movers["c"]["attribution"] == "code"
    # ledger renders the new columns for annotated movers
    ledger = (tmp_path / "docs" / "PERF_NOTES_r9_movers.md").read_text()
    assert "plan | box-adjusted" in ledger
    assert "identical" in ledger and "x2.0 (code)" in ledger


def test_fold_no_prior_canonical_keeps_movers_unannotated(
    tmp_path, monkeypatch
):
    """First round / missing prior canonical: no box ratio, movers
    marked plan-unknown, note and ledger unchanged in shape."""
    fb = _load_fold_bench()
    monkeypatch.setattr(fb, "_HERE", str(tmp_path))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    (tmp_path / "BENCH_r08.json").write_text(json.dumps({
        "sf": "0.1",
        "parsed": {"queries": {"a": 1.0}},
    }))
    s1 = _attested(2.0, {"a": 2.0}, 0.08)
    s1["plans"] = {"a": "AAA"}
    (tmp_path / "BENCH_session_r09_s1.json").write_text(json.dumps(s1))
    monkeypatch.setattr("sys.argv", ["fold_bench.py", "--round", "9"])
    fb.main()
    out = json.loads((tmp_path / "BENCH_local_r09.json").read_text())
    assert "box_speed_ratio" not in out.get("attest", {})
    assert "box-speed" not in out["note"]
    assert out["movers"]["a"]["plan"] == "unknown"
    assert "attribution" not in out["movers"]["a"]
