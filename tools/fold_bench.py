"""Fold bench session drafts into the canonical BENCH_local_r{N}.json.

Owns the canonical artifact (VERDICT r8 #1): `bench.py` writes one
BENCH_session_r{N}_s{K}.json per full run and never overwrites an
existing canonical; this tool folds all session drafts for the round
(plus, with --include-canonical, the current canonical so earlier
minima are never lost) elementwise:

  - queries / steady / compile: per-query MIN across sessions
  - spread: per-query MAX (worst observed noise stays visible)
  - stalls: retries summed per query, reps_over_5x_steady summed
  - movers: recomputed from the FOLDED steady vs the previous round's
    committed artifact (same rule as bench.py: ratio outside [1/1.3, 1.3])
  - value: sum of folded per-query queries minima
  - note: generated fold provenance (session count + raw totals);
    pass --note to append hand context

Staleness guard (VERDICT r9 #1): every session draft carries per-query
ANALYZED-plan fingerprints (bench._plan_fingerprint — analyzed, not
optimized, for cross-session stability; see its docstring). The NEWEST
session's fingerprint per query is the reference; a draft (or prior
canonical) entry whose fingerprint differs — or is absent while a
reference exists — is EXCLUDED from that query's fold, so a query
whose plan changed mid-round can only contribute minima measured on
the CURRENT plan (r9's crawl-cap minima were folded from
pre-_fan_out-removal drafts no shipped plan could reproduce). The
folded canonical stores the reference fingerprints, so refolds keep
validating its minima too. Only the newest draft may define the
reference — an older draft's fingerprints would invert the guard
after a plan change — so a fingerprint-less newest draft downgrades
the fold to UNGUARDED with a stderr warning (and legacy rounds with
no fingerprints anywhere fold unguarded silently).

Load attestation (VERDICT r10 #1): every session draft carries start/
end load snapshots (loadavg, concurrent-JVM count, a fixed ~100 ms
calibration probe — bench._load_attestation). Sessions whose
calibration deviates >1.3x from the round median are TAGGED in the
fold (``load_tags`` + note) but never excluded: minima from a loaded
box are still valid lower-bound evidence when they win; the tag makes
"that run was inflated by box load" provable from the artifacts alone
(the r10 driver finalize came in x1.47 uniformly inflated and only
per-query ratio statistics could adjudicate it).

Also regenerates docs/PERF_NOTES_r{N}_movers.md (the >=1.5x ledger),
preserving hand adjudications below the marker.

Usage:
    python tools/fold_bench.py              # fold newest round's sessions
    python tools/fold_bench.py --round 9
    python tools/fold_bench.py --note "session C ran on a degraded box"
    python tools/fold_bench.py --no-include-canonical   # sessions only
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import bench  # noqa: E402  (reuse mover/ledger logic — one rule, one place)


def _session_paths(rnd: int) -> list[str]:
    return sorted(
        glob.glob(os.path.join(_HERE, f"BENCH_session_r{rnd:02d}_s*.json")),
        key=lambda p: int(re.search(r"_s(\d+)\.json$", p).group(1)),
    )


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _session_probes(doc: dict) -> dict[str, float]:
    """A session's calibration probes by column: {'start': s, 'end': e}
    with missing/invalid probes omitted."""
    at = doc.get("attest") or {}
    out = {}
    for k in ("start", "end"):
        v = (at.get(k) or {}).get("calib_s")
        if isinstance(v, (int, float)) and v > 0:
            out[k] = float(v)
    return out


def load_tags(probes: dict[str, dict[str, float]]) -> dict[str, float]:
    """Sessions whose calibration probe deviates >1.3x from the round
    median of the OTHER sessions (leave-one-out, ADVICE r11): name ->
    worst ratio-to-median. Tagged,
    never excluded — minima from a loaded box are still valid
    lower-bound evidence when they win; the tag makes 'that session
    ran on a loaded box' provable from the artifacts alone instead of
    argued from per-query ratio statistics.

    Comparison is PER COLUMN — each session's start probe against the
    round's start median, end against end median — because the two
    columns live on different baselines (session-start probes run
    ~2.3x session-end on an idle box: executor JIT maturation, not
    load; PERF_NOTES_r11). Min-of-both against a mixed median would
    falsely tag a session whose end probe merely failed (its JIT-cold
    start value vs everyone else's warm end values — round-scope
    review r11), and a session loaded only at one end is still caught
    by that end's own column."""
    import statistics

    tags: dict[str, float] = {}
    for col in ("start", "end"):
        vals = {n: p[col] for n, p in probes.items() if col in p}
        for name, c in vals.items():
            # leave-one-out median (ADVICE r11): with few sessions a
            # loaded one raises the all-in median enough to escape its
            # own tag line (2 sessions: a x1.5 probe vs its peer lands
            # at the midpoint, ratio 1.22 — never tagged). Comparing
            # against the OTHER sessions' median keeps a loaded
            # candidate out of its own baseline; additionally dropping
            # the FASTEST other (when two or more remain) keeps one
            # anomalously fast session from dragging the baseline down
            # and false-tagging the normal majority (round-scope
            # review r12: at n=3, others = {normal, fast} has its
            # median at the midpoint, and {0.10, 0.10, 0.05} tagged
            # BOTH normal sessions). The bias is conservative: a tag
            # now requires exceeding 1.3x a non-fastest peer.
            others = sorted(
                v for n, v in vals.items() if n != name
            )
            if len(others) >= 2:
                others = others[1:]
            if not others:
                continue
            med = statistics.median(others)
            if med <= 0:
                continue
            if c > 1.3 * med:
                tags[name] = max(tags.get(name, 0.0), round(c / med, 2))
    return tags


def fold(docs: list[dict], ref_plans: dict[str, str] | None = None) -> dict:
    """Elementwise fold of bench result documents (see module doc).

    ``ref_plans`` (query -> plan fingerprint, normally the newest
    session draft's ``plans`` map) gates the fold per query: a doc's
    timing entries for a query fold only when the doc's fingerprint
    for it MATCHES the reference — a mismatching or missing
    fingerprint means the timing was measured on a plan that no longer
    exists (or can't be verified) and is excluded. Queries absent from
    ``ref_plans`` fold unguarded (legacy drafts)."""
    ref_plans = ref_plans or {}
    stale: dict[str, int] = {}

    def fresh(d: dict, name: str) -> bool:
        ref = ref_plans.get(name)
        return ref is None or ((d.get("plans") or {}).get(name)) == ref

    queries: dict[str, float] = {}
    steady: dict[str, float] = {}
    compile_cost: dict[str, float] = {}
    spread: dict[str, float] = {}
    retries: dict[str, int] = {}
    stall_reps = 0
    for d in docs:
        for name, t in (d.get("queries") or {}).items():
            if not fresh(d, name):
                stale[name] = stale.get(name, 0) + 1
                continue
            queries[name] = min(queries.get(name, t), t)
        for name, t in (d.get("steady") or d.get("queries") or {}).items():
            if fresh(d, name):
                steady[name] = min(steady.get(name, t), t)
        for name, t in (d.get("compile") or {}).items():
            if fresh(d, name):
                compile_cost[name] = min(compile_cost.get(name, t), t)
        for name, s in (d.get("spread") or {}).items():
            if fresh(d, name):
                spread[name] = max(spread.get(name, s), s)
        st = d.get("stalls") or {}
        stall_reps += int(st.get("reps_over_5x_steady", 0) or 0)
        for name, k in (st.get("retries") or {}).items():
            retries[name] = retries.get(name, 0) + int(k)
    base = docs[0]
    return {
        "metric": base.get("metric", "total_query_seconds"),
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "sf": base.get("sf"),
        "reps": base.get("reps"),
        "prev_queries_recovered": max(
            int(d.get("prev_queries_recovered", 0) or 0) for d in docs
        ),
        "sessions": len(docs),
        "stalls": {
            "reps_over_5x_steady": stall_reps,
            "retries": retries,
            "healed_by_fold": True,
        },
        # stale-plan exclusions: query -> number of doc entries dropped
        # because their fingerprint didn't match the reference plan
        "stale_dropped": stale,
        "spread": spread,
        "compile": compile_cost,
        "steady": steady,
        "queries": queries,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--round", type=int, default=None,
                    help="round number (default: newest with sessions)")
    ap.add_argument("--note", default="",
                    help="hand context appended to the generated note")
    ap.add_argument("--no-include-canonical", action="store_true",
                    help="fold session drafts only, ignore existing canonical")
    args = ap.parse_args()

    rnd = args.round
    if rnd is None:
        rounds = sorted(
            {
                int(re.search(r"_r(\d+)_s\d+\.json$", p).group(1))
                for p in glob.glob(
                    os.path.join(_HERE, "BENCH_session_r*_s*.json")
                )
            }
        )
        if not rounds:
            sys.exit("fold_bench: no BENCH_session_r*_s*.json drafts found")
        rnd = rounds[-1]

    paths = _session_paths(rnd)
    if not paths:
        sys.exit(f"fold_bench: no session drafts for round {rnd}")
    docs = [_load(p) for p in paths]
    # cross-core-count separation (r14): the r13 driver's 8-cpu scaling
    # run landed as a round-14 session draft. A different core count is
    # a different measurement, not box load — drafts whose recorded
    # `cpus` differs from the NEWEST draft's are excluded from the fold
    # (legacy drafts without the field fold as before; their slower
    # minima cannot win an elementwise-min anyway).
    ref_cpus = str(docs[-1].get("cpus") or "")
    if ref_cpus:
        kept, dropped = [], []
        for p, d in zip(paths, docs):
            c = str(d.get("cpus") or "")
            if c and c != ref_cpus:
                dropped.append(os.path.basename(p))
            else:
                kept.append((p, d))
        if dropped:
            print(
                f"fold_bench: excluding {len(dropped)} draft(s) with a "
                f"different core count than the newest ({ref_cpus} cpus): "
                + ", ".join(dropped),
                file=sys.stderr,
            )
            paths = [p for p, _ in kept]
            docs = [d for _, d in kept]
    raw_totals = [d.get("value") for d in docs]
    canonical = os.path.join(_HERE, f"BENCH_local_r{rnd:02d}.json")
    folded_prior = False
    if not args.no_include_canonical and os.path.exists(canonical):
        try:
            docs.append(_load(canonical))
            folded_prior = True
        except (OSError, json.JSONDecodeError):
            pass

    # reference plan fingerprints: the NEWEST session draft — and ONLY
    # it — defines what "the current plan" is per query, so a fold
    # requires >=1 post-change full session before a changed query's
    # older minima could matter, and those older minima are excluded
    # (the VERDICT r9 #1 gate; the finalize protocol runs a full bench
    # session immediately before folding, so the newest draft reflects
    # HEAD). Falling back to an OLDER draft's fingerprints when the
    # newest carries none would INVERT the guard after a plan change
    # (old minima certified, current ones excluded — r10 review), so a
    # fingerprint-less newest draft downgrades the whole fold to
    # unguarded, loudly.
    newest = docs[len(paths) - 1]
    ref_plans: dict[str, str] = (
        dict(newest["plans"])
        if isinstance(newest.get("plans"), dict) and newest["plans"]
        else {}
    )
    if not ref_plans and any(
        isinstance(d.get("plans"), dict) and d["plans"]
        for d in docs[: len(paths)]
    ):
        print(
            "fold_bench: WARNING — newest session draft carries no plan "
            "fingerprints; folding UNGUARDED (older drafts' fingerprints "
            "are not a safe reference after a plan change)",
            file=sys.stderr,
        )
    elif ref_plans:
        # partial fingerprint failure in the reference session is NOT
        # silent (ADVICE r10): a query fingerprinted in older drafts
        # but absent from the newest's map folds unguarded — warn with
        # the names so the downgrade is visible per query, not only
        # when the newest draft's plans map is entirely empty
        others = docs[: len(paths) - 1] + docs[len(paths):]
        unguarded = sorted({
            name
            for d in others
            for name in (d.get("plans") or {})
            if name not in ref_plans
        })
        if unguarded:
            print(
                "fold_bench: WARNING — newest session draft carries no "
                f"fingerprint for {len(unguarded)} query(ies) that older "
                "drafts fingerprinted; folding those UNGUARDED: "
                + ", ".join(unguarded[:12])
                + ("..." if len(unguarded) > 12 else ""),
                file=sys.stderr,
            )

    out = fold(docs, ref_plans=ref_plans)
    # load attestation fold (VERDICT r10 #1): tag — never exclude —
    # sessions whose fixed calibration probe deviates >1.3x from the
    # round median, so an inflated session is identifiable from the
    # committed artifact alone
    probes = {
        os.path.basename(p): pr
        for p, d in zip(paths, docs[: len(paths)])
        if (pr := _session_probes(d))
    }
    tags = load_tags(probes)
    if tags:
        out["load_tags"] = tags
    end_vals = [p["end"] for p in probes.values() if "end" in p]
    if probes:
        # per-session calibrations + the round's END-probe median,
        # stored in the canonical: the NEXT round's folds can compare
        # medians, so a uniform box-speed shift (all sessions slower,
        # none tagged within-round) is mechanically visible
        # round-over-round too (PERF_NOTES_r11 adjudicated r11's
        # uniform x1.12 shift from raw-total statistics; from here on
        # the artifact itself carries the baseline). END probes are
        # the JIT-warm, cross-round-comparable column.
        import statistics

        out["attest"] = {
            **(
                {"calib_median_s": round(statistics.median(end_vals), 4)}
                if end_vals else {}
            ),
            "session_calibs": probes,
        }
    # cross-round box-speed calibration (VERDICT r11 next-round #3):
    # the prior canonical stores its round's END-probe median; the
    # ratio of medians is the box-speed shift between the two rounds'
    # bench environments, measured by the same fixed ~100 ms probe —
    # so a uniform timing shift can be attributed to the BOX
    # mechanically instead of argued from raw-total statistics
    # (PERF_NOTES_r11 adjudicated r11's uniform x1.12 by hand).
    prev_doc: dict = {}
    prev_path = os.path.join(_HERE, f"BENCH_local_r{rnd - 1:02d}.json")
    if os.path.exists(prev_path):
        try:
            prev_doc = _load(prev_path)
        except (OSError, json.JSONDecodeError):
            prev_doc = {}
    box_ratio = None
    prev_calib = (prev_doc.get("attest") or {}).get("calib_median_s")
    cur_calib = (out.get("attest") or {}).get("calib_median_s")
    if (
        isinstance(prev_calib, (int, float)) and prev_calib > 0
        and isinstance(cur_calib, (int, float)) and cur_calib > 0
    ):
        box_ratio = round(cur_calib / prev_calib, 3)
        out["attest"]["prev_calib_median_s"] = prev_calib
        out["attest"]["box_speed_ratio"] = box_ratio
    # session drafts persist on disk, so every refold sees all of them:
    # the draft count IS the session count, and stalls are re-summed from
    # drafts alone (the prior canonical already holds summed stalls — the
    # canonical is folded only so hand-merged minima are never lost)
    out["sessions"] = len(paths)
    out["stalls"] = fold(docs[: len(paths)], ref_plans=ref_plans)["stalls"]
    if ref_plans:
        # stored so refolds can validate THIS canonical's minima too
        out["plans"] = ref_plans
    stale = out.pop("stale_dropped", {})
    note = (
        f"elementwise min over {len(paths)} session draft(s) "
        f"(raw totals {'/'.join(str(t) for t in raw_totals)} s)"
        + (", folded into the prior canonical" if folded_prior else "")
        + "; movers recomputed from folded steady vs previous round"
    )
    if stale:
        note += (
            f"; stale-plan minima excluded for {len(stale)} query(ies): "
            + ", ".join(sorted(stale)[:8])
            + ("..." if len(stale) > 8 else "")
        )
    if tags:
        note += (
            "; load-tagged session(s) (calibration >1.3x round median; "
            "minima kept): "
            + ", ".join(f"{n} (x{r})" for n, r in sorted(tags.items()))
        )
    if box_ratio is not None:
        note += (
            f"; box-speed vs r{rnd - 1}: x{box_ratio} "
            f"(end-probe medians {cur_calib}/{prev_calib})"
        )
    if args.note:
        note += "; " + args.note
    out["note"] = note

    sf = str(out.get("sf")) if out.get("sf") is not None else None
    # baseline pinned to the folded round minus one: inferring it from
    # the newest driver artifact self-compares on any refold after this
    # round's own BENCH_r{N}.json lands (r9 s5 review)
    prev = bench._previous_round_timings(sf, baseline_round=rnd - 1)
    out["movers"] = bench._compute_movers(out["steady"], prev)
    # fingerprint-gated movers (VERDICT r11 next-round #4): the prior
    # canonical stores its reference fingerprints, so each cross-round
    # mover is marked plan-identical (same analyzed plan measured both
    # rounds — a genuine runtime shift) vs plan-changed (the source
    # changed; the timing delta is expected) vs unknown (either side
    # unfingerprinted). With a box-speed ratio, each mover also gets
    # its calibration-adjusted ratio and a box-vs-code attribution:
    # a mover whose adjusted ratio falls back inside the non-mover
    # band moved with the box, not the code.
    prev_plans = prev_doc.get("plans") or {}
    for name, m in out["movers"].items():
        pfp = prev_plans.get(name)
        cfp = (ref_plans or {}).get(name)
        m["plan"] = (
            "identical" if pfp and cfp and pfp == cfp
            else "changed" if pfp and cfp
            else "unknown"
        )
        if box_ratio:
            adj = round(m["ratio"] / box_ratio, 3)
            m["calib_adjusted"] = adj
            m["attribution"] = (
                "box" if 1 / 1.3 <= adj <= 1.3 else "code"
            )
    # place big dicts after scalars/note so a truncated view stays readable
    ordered = {
        k: out[k]
        for k in (
            "metric", "value", "unit", "sf", "reps",
            "prev_queries_recovered", "sessions", "note", "stalls",
            "attest", "load_tags", "movers", "spread", "plans",
            "compile", "steady", "queries",
        )
        if k in out
    }
    # temp + atomic rename: a torn write (ENOSPC mid-dump) must never
    # leave a truncated canonical on disk (ADVICE r9)
    tmp = f"{canonical}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(ordered, f)
        f.write("\n")
    os.replace(tmp, canonical)
    bench._write_mover_ledger(
        rnd,
        out["movers"],
        out["stalls"]["retries"],
        out["stalls"]["reps_over_5x_steady"],
    )
    big = {n: m for n, m in out["movers"].items()
           if m["ratio"] >= 1.5 or m["ratio"] <= 1 / 1.5}
    print(
        f"fold_bench: wrote {os.path.basename(canonical)} — "
        f"{out['value']} s over {len(out['queries'])} queries, "
        f"{len(paths)} session(s), {len(big)} >=1.5x mover(s); "
        f"ledger docs/PERF_NOTES_r{rnd}_movers.md regenerated"
    )


if __name__ == "__main__":
    main()
