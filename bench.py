#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints the compact headline JSON as its own FINAL line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "n_queries": N, "sf": "...", "queries": {"qNN": s.ss, ...}}
(fixed scalar keys ≤200 bytes + a SIZE-BOUNDED compact per-query map,
the whole line ≤ FINAL_LINE_BUDGET) and EVERYTHING bulky — the
full-name full-precision timing map, per-query loadavg, errors — on
the SEPARATE preceding detail line and in bench_partial.json / --out.
Rounds 5 AND 6 both came back `parsed: null` because the final line
carried an UNBOUNDED map and the driver's 2000-char tail-capture
truncated it mid-object; rounds 7-13 dropped the map entirely, which
left the driver's per_query/scaling comparison empty (round-13 VERDICT
task 2). The rule now enforced by final_line() +
tests/test_bench_output.py: the final line's per-query map is compact
(unique qNN keys, 0.01-rounded seconds, cost-descending) and HARD
size-capped — overflow drops the cheapest entries into a "q_omitted"
count, never the line.

Flags:
  --full        time EVERY registered query (the whole registry), not
                just the HEADLINE subset — regressions in non-headline
                families become visible per-round.
  --only LIST   comma-separated query names: restrict the sweep to this
                subset (iteration / targeted re-measurement).
  --out PATH    also write the full payload to PATH (append-only
                bench records: pass a fresh name per run, e.g.
                bench_clean_r06_1.json — never overwrite a claimed
                number's file).
  --loadavg-gate [T]
                self-qualifying records (round-8 VERDICT task 8): any
                query whose pre-run 1-min loadavg exceeds T (default
                8.0 — above what this bench generates alone on this
                box) is listed in the payload's "load_flagged";
                --composite then prefers unflagged records per query,
                so one polluted record can't poison a committed min.
  --canary-gate [T]
                canary-drift qualification (round-10 VERDICT task 2):
                host loadavg has a proven blind spot — the r10 76.5s
                record showed uniform +60-90% inflation on untouched
                queries at loadavg <3 ("invisible co-tenancy", likely
                cgroup-capped neighbors that never show in the host
                metric). Instead of a host metric, run a fixed CANARY
                query (q01_pricing_summary) immediately before each
                measured query and compare canary samples against the
                record's own canary median: a query whose preceding
                canary reads > T× the median (default 1.2) rode a
                burst → listed in "canary_flagged" (composite prefers
                clean samples, same as load_flagged). The record also
                carries its canary median; --composite skips ENTIRE
                records whose canary median is > T× the best record's
                (uniform inflation — every sample poisoned), exactly
                like hand-flagged records. The min-median record is
                never skipped, so a composite always survives.
  --ab-ref REF qA[,qB...][,reps]
                one-command A/B against another git rev (the PERF.md
                by-hand worktree recipe, promoted to a flag per round-8
                VERDICT task 8): checks REF out into a temp worktree
                and alternates `bench.py --only` SUBPROCESS runs
                between the two trees, rep by rep, so a co-tenant
                burst hits both arms; prints per-arm per-query minima.
  --funnel-shared
                after the main sweep, re-time the collapse-funnel
                family (q56/q125/q144/q149/q150) with the shared
                exact_collapsed_components stage cached ONCE across
                them (dedup.FUNNEL_SHARED). The standalone numbers in
                the main sweep are untouched (each registered query
                must stand alone for the oracle); the shared-once
                timings ride the detail line under "funnel_shared" —
                per-query regression signal without 5× redundant
                funnel wall. See PERF.md.

Each query is materialized through the ``noop`` datasource sink — every
column is computed (no count()-style projection pruning) and nothing is
collected to the driver, so timings measure engine work, not transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Canary-drift qualification (round-10 VERDICT task 2): the fixed
#: probe query re-timed before every measured query under
#: --canary-gate, and the flag's default drift threshold. q01 is the
#: canary because it is the cheapest stable full-scan aggregate in the
#: registry (~0.3s at sf0.1): pure lineitem scan + hash agg, no joins,
#: no Python workers — its wall clock moves with machine conditions
#: and nothing else.
CANARY_QUERY = "q01_pricing_summary"
CANARY_GATE_DEFAULT = 1.2


def canary_flags(
    samples: dict[str, float], med: float | None, gate: float
) -> list[str]:
    """Queries whose preceding canary sample reads > gate× the record's
    own canary median — they rode a co-tenant burst.

    The canary query itself is EXEMPT from its own flagging (round-11
    ADVICE): its preceding canary is the record's first in-sweep sample
    and reads high in EVERY record (residual first-sample warmth the
    discard run does not fully absorb — all four clean r11 records),
    so flagging it is structural, not burst detection, and it left the
    canary query with zero clean composite samples all round. A real
    burst on its measurement is still shed by min-across-records."""
    return sorted(
        q
        for q, t in samples.items()
        if q != CANARY_QUERY and med and t > gate * med
    )

#: Representative slice of the registered corpus: scan-agg, fact join,
#: dim-hop join, window, distinct agg, text explode, ngram shuffle, LSH
#: dedup, vector top-k, event windows, sessionization.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_nation_revenue",
    "q07_customer_running_spend",
    "q12_supplier_part_breadth",
    "q30_doc_word_stats",
    "q31_word_freq_topk",
    "q36_rolling_fingerprints",
    "q37_fingerprint_containment",
    "q41_char_ngram_repetition",
    "q45_lid_heuristic",
    "q47_multi_n_repetition",
    "q52_minhash_lsh_pairs",
    "q57_simhash_neardup_pairs",
    "q55_embedding_neardup",
    "q59_dedup_removed_docs",
    "q60_cosine_topk",
    "q63_ann_ivf_topk",
    "q64_decontamination",
    "q89_bloom_decontamination",
    "q39_tfidf_top_terms",
    "q29_token_budget_sample",
    "q83_curation_pipeline",
    "q88_unigram_logprob",
    "q93_cross_corpus_neardup",
    "q66_flashtext_keyword_dist",
    "q97_pii_redaction",
    "q98_hash_split",
    "q99_gopher_quality_rules",
    "q70_hourly_event_stats",
    "q71_user_sessions",
    "q75_user_totals",
    "q80_clean_pipeline",
    "q108_editdist_verify",
    "q109_quality_percentile_gate",
    "q115_quality_sketch_gate",
    "q110_source_mixture_weights",
    "q111_shared_span_removal",
    "q112_temperature_mixture",
    "q113_length_histogram",
    "q114_bigram_logprob",
    # sketch family (round 5): quantile summary + heavy hitters
    "q84_approx_quantiles",
    "q121_heavy_hitters",
    # semantic tier of the dedup funnel (round 5)
    "q123_semantic_dedup",
    # round-5 session 2: DSIR weights, dedup audit, margin mining
    "q124_dsir_importance",
    "q125_dedup_impact_audit",
    "q126_margin_pair_mining",
    # round-5 session 3: classifier filter, KL mixture diagnostic,
    # sequence chunking
    "q127_classifier_quality_filter",
    "q128_source_kl_divergence",
    "q129_sequence_chunking",
    "q130_bpe_merge_candidates",
    "q131_ann_recall_audit",
    "q132_vocab_coverage",
    "q133_lsh_precision_audit",
    "q134_trailing_range_revenue",
    "q135_unpivot_doc_metrics",
    "q136_order_distribution_stats",
    "q137_props_schema_parse",
    # round 6: ANN-bounded margin mining (the q126 scale fix), its
    # recall audit, and the iterative BPE loop
    "q138_margin_pair_mining_ann",
    "q139_bpe_merge_iterations",
    "q140_margin_ann_recall_audit",
    "q141_bpe_compression_curve",
    "q142_embedding_quant_audit",
    "q143_ivf_cell_balance",
    # round 6 session 2: leak-free split, signal correlation, n-gram
    # novelty, rule-ablation matrix
    "q144_leak_free_split",
    "q145_quality_signal_correlation",
    "q146_ngram_novelty",
    "q147_quality_rule_ablation",
    "q148_winnowed_novelty",
    "q149_component_source_purity",
    "q150_quality_survivor_delta",
    # round 8: joint text↔embedding dedup agreement, ANN ingest gate
    "q151_joint_dedup_agreement",
    "q152_ann_admission",
]


def detail_line(payload: dict) -> dict:
    """Everything bulky rides this SECOND-TO-LAST line: the FULL-NAME
    full-precision per-query timing map, loadavg detail, and errors.
    BENCH_r05 and BENCH_r06 both came back ``parsed: null`` because the
    final line carried this unbounded form and the driver's tail-capture
    truncated it mid-object.  Nothing unbounded may ride the final line
    — its per-query map is the compact size-capped encoding
    (:func:`final_line`)."""
    detail = {
        "queries": payload["queries"],
        "loadavg_detail": payload.get("loadavg", {}),
    }
    if payload.get("funnel_shared"):
        detail["funnel_shared"] = payload["funnel_shared"]
    if payload.get("extra_samples"):
        detail["extra_samples"] = payload["extra_samples"]
    if payload.get("load_flagged"):
        detail["load_flagged"] = payload["load_flagged"]
    if payload.get("canary"):
        detail["canary"] = payload["canary"]
    if payload.get("canary_flagged"):
        detail["canary_flagged"] = payload["canary_flagged"]
    for k in ("canary_pre", "canary_post"):
        if payload.get(k) is not None:
            detail[k] = payload[k]
    if payload.get("sources"):
        detail["sources"] = payload["sources"]
    if payload.get("machine_era"):
        detail["machine_era"] = payload["machine_era"]
    if payload.get("era_ref"):
        detail["era_ref"] = payload["era_ref"]
    if payload.get("errors"):
        detail["errors"] = payload["errors"]
    return detail


#: Hard serialized-byte budget for the FINAL line. Every committed
#: BENCH_r01..r13 artifact shows the driver's tail capture is EXACTLY
#: 2000 chars; the final line is the last stdout the sweep prints, so
#: line + its newline must fit the window (≤1999) — 1950 leaves margin
#: for stray buffering. A full 149-query sweep at typical values
#: (~1.8 KB) fits whole; heavily inflated sweeps shed their cheapest
#: entries into "q_omitted" instead of outgrowing the window.
FINAL_LINE_BUDGET = 1950


def final_line(payload: dict) -> dict:
    """The compact FINAL line: fixed scalar keys (≤200 bytes, asserted)
    PLUS a size-bounded per-query map (round-13 VERDICT task 2: the
    driver parses ONLY this line, so without the map PERF_r*.json's
    per_query/scaling comparison has been empty since round 5).

    The map uses the COMPACT ENCODING the driver window forces: keys
    are the unique ``qNN`` prefix of each registered name (full name
    kept only if a prefix ever collided), values are seconds rounded
    to 0.01, entries ordered by descending cost. 149 entries ≈ 1.8 KB;
    if a pathological registry still overflows
    :data:`FINAL_LINE_BUDGET`, the cheapest entries are dropped and
    counted in ``q_omitted`` — the expensive tail the regression
    comparison cares about always survives. Full names + full precision
    ride the detail line and ``--out`` records, unchanged.
    """
    # `sf` is an env-controlled path of unbounded length; only its basename
    # (e.g. "sf0.1") rides the final line, clamped so a pathological name
    # can never push the line past the driver's tail-capture window. The
    # size guard is a hard invariant over the FIXED keys, so it cannot be
    # tripped by user input — never by the sf path.
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "n_queries": len(payload["queries"]),
        "sf": os.path.basename(str(payload["sf"]).rstrip("/"))[:32],
    }
    # ambient-load context (round-9 VERDICT task 7): the driver's
    # BENCH_r{N}.json keeps only this line, and cross-round wall-clock
    # deltas are dominated by co-tenant load on this box — two bounded
    # scalars make every driver artifact self-documenting. Clamped so a
    # pathological loadavg can never outgrow the tail-capture window.
    la = payload.get("loadavg")
    if la and "start" in la and "end" in la:
        compact["load"] = f"{la['start']:.1f}/{la['end']:.1f}"[:16]
    # era self-normalization (round-10 VERDICT task 3): cross-round
    # BENCH_rN diffs are dominated by machine era on this co-tenant box
    # (r10 79.95s vs r8 73.58s read as a regression that the interleaved
    # A/B disproved, code_ratio 0.997). The committed composite's era
    # block already computes machine_era_ratio (prior-round HEAD
    # re-benched today vs its committed composite, >1 = today's box
    # slower); surfacing it on the driver-visible line makes the
    # artifact self-normalizing: divide cross-round deltas by it.
    # main() attaches "era_ref" from the newest committed composite.
    era = payload.get("machine_era") or payload.get("era_ref") or {}
    ratio = era.get("machine_era_ratio")
    if isinstance(ratio, (int, float)):
        compact["era"] = round(float(ratio), 3)
    # bench self-qualification (round-11 VERDICT task 2): the PLAIN
    # driver sweep is neither canary-gated nor min-composited, so its
    # headline is load-of-the-day with nothing in the artifact to
    # qualify it by. One canary timing immediately before and one
    # immediately after the sweep ride the final line as a bounded
    # "pre/post" string: an outside reader of BENCH_rN alone can now
    # reject a co-tenant-polluted record at ~2s cost instead of the
    # full per-query gate. Read the probes POSITIONALLY against other
    # records' probes, not against each other: the canary query keeps
    # warming with repetition across a sweep (measured r12: pre ≈1.65,
    # in-sweep median ≈1.07, post ≈0.9 on two consecutive clean
    # records), so pre is structurally the higher reading — a clean
    # box gives consistent pre-vs-pre and post-vs-post across records,
    # and a co-tenant burst shows as a multiple of either.
    pre, post = payload.get("canary_pre"), payload.get("canary_post")
    if isinstance(pre, (int, float)) and isinstance(post, (int, float)):
        # bound each probe individually — truncating the JOINED string
        # garbled large values into a misleading prefix ("99999.12/99"
        # reads as post=99; round-12 ADVICE). 9999s ≈ 2.8h per probe is
        # far past anything a canary query can honestly read.
        compact["canary"] = "/".join(
            f"{min(float(v), 9999.0):.2f}" for v in (pre, post)
        )
    # the size guard over the FIXED keys is unchanged — the bounded
    # per-query map below is additive and carries its own budget; all
    # size math uses the compact separators the line is printed with
    assert len(dump_line(compact)) <= 200, "final bench line must stay tiny"
    from collections import Counter

    numeric = {
        n: v
        for n, v in (payload.get("queries") or {}).items()
        if isinstance(v, (int, float))
    }
    if numeric:
        pref = Counter(n.split("_", 1)[0] for n in numeric)
        qmap = {
            (
                n.split("_", 1)[0]
                if pref[n.split("_", 1)[0]] == 1
                else n
            ): round(float(v), 2)
            for n, v in sorted(numeric.items(), key=lambda kv: -kv[1])
        }
        compact["queries"] = qmap
        while qmap and len(dump_line(compact)) > FINAL_LINE_BUDGET:
            cheapest = min(qmap, key=lambda k: (qmap[k], k))
            del qmap[cheapest]
            compact["q_omitted"] = len(numeric) - len(qmap)
    assert len(dump_line(compact)) <= FINAL_LINE_BUDGET, (
        "final bench line outgrew the driver tail-capture window"
    )
    return compact


def dump_line(obj: dict) -> str:
    """Serialize a stdout line with COMPACT separators — the final
    line's per-query map wins ~2 bytes per entry over json.dumps
    defaults, which is the difference between the whole 149-query map
    fitting the driver's 2000-char tail window and shedding entries."""
    return json.dumps(obj, separators=(",", ":"))


def machine_era(ab_path: str, baseline_path: str) -> dict:
    """Fold a cross-tree ``--ab-ref`` record + the PRIOR round's committed
    composite into the era-normalization block the round-9 VERDICT asked
    for (task 2): cross-round wall-clock drifts on this co-tenant box are
    dominated by machine era, not code, and the committed composite alone
    misleads naive cross-round diffs (64.28s r8 → 70.54s r9 on identical
    code paths).  Two ratios make the artifact self-normalizing:

      machine_era_ratio   — prior-round HEAD re-benched TODAY (the ab-ref
                            arm) vs the SAME queries in the prior round's
                            committed composite.  >1 = today's box is
                            slower than the era the old number was
                            recorded in; divide cross-round deltas by it.
      code_ratio_vs_ref   — this tree vs prior HEAD, interleaved on the
                            same box (like-for-like code delta; <1 =
                            current code faster).
    """
    with open(ab_path) as fh:
        ab = json.load(fh)
    with open(baseline_path) as fh:
        base = json.load(fh)
    ref = ab["ab_ref"]
    runs = ab["ab_runs"]
    ref_arm = runs[ref]
    head_arm = runs["head"]
    common = [
        q for q in ref_arm
        if ref_arm[q] and head_arm.get(q) and q in base["queries"]
    ]
    if not common:
        sys.exit(
            f"--era-ab: no query appears in both {ab_path} arms and "
            f"{baseline_path} queries"
        )
    ref_today = sum(min(ref_arm[q]) for q in common)
    head_today = sum(min(head_arm[q]) for q in common)
    base_then = sum(base["queries"][q] for q in common)
    return {
        "ref": ref,
        "queries": sorted(common),
        "ref_total_today": round(ref_today, 3),
        "head_total_today": round(head_today, 3),
        "baseline_total": round(base_then, 3),
        "baseline_source": os.path.basename(baseline_path),
        "machine_era_ratio": round(ref_today / base_then, 3),
        "code_ratio_vs_ref": round(head_today / ref_today, 3),
    }


def latest_committed_era(repo: str) -> dict | None:
    """Era block from the NEWEST committed ``bench_composite_r*.json``
    that carries one — the source of the final line's "era" key on
    plain sweeps (round-10 VERDICT task 3).  The driver's BENCH_rN.json
    keeps only the final line, so without this a naive BENCH_r10-vs-r08
    diff reads machine era as a code regression.

    Searched in ``bench_records/`` (where round records live since
    round 12 — the repo root is the driver-facing surface) and the repo
    root itself (in-progress records of the current round). A same-round
    composite present in BOTH places ties on round number; the tie
    breaks to ``bench_records/`` — the committed history — so an
    in-progress root record never shadows the committed one
    (round-12 ADVICE)."""
    import glob
    import re

    def _key(p: str) -> tuple[int, int]:
        m = re.search(r"_r(\d+)", os.path.basename(p))
        rnd = int(m.group(1)) if m else -1
        committed = 1 if os.path.basename(os.path.dirname(p)) == (
            "bench_records"
        ) else 0
        return (rnd, committed)

    for p in sorted(
        glob.glob(os.path.join(repo, "bench_composite_r*.json"))
        + glob.glob(
            os.path.join(repo, "bench_records", "bench_composite_r*.json")
        ),
        key=_key,
        reverse=True,
    ):
        try:
            with open(p) as fh:
                era = json.load(fh).get("machine_era")
        except (OSError, ValueError):
            continue
        if isinstance(era, dict) and isinstance(
            era.get("machine_era_ratio"), (int, float)
        ):
            return {
                "machine_era_ratio": era["machine_era_ratio"],
                "source": os.path.basename(p),
            }
    return None


def composite(record_paths: list[str]) -> dict:
    """Merge per-query MINS across a round's clean bench records into
    one payload with the same keys as a clean record — the number every
    round-end analysis recomputed by hand (round-7 VERDICT task 7): the
    per-query min across spaced runs is the engine's actual cost on a
    co-tenant box, burst-free by construction. Only queries present in
    EVERY record ride the composite (a query added mid-round has no
    cross-record min)."""
    records = []
    kept_paths = []
    skipped = []  # (path, reason) — full paths, not basenames: two
    # different directories can share a basename, and a clean record
    # must never be dropped because a FLAGGED record elsewhere happens
    # to be named the same (round-10 ADVICE)
    loaded: list[tuple[str, dict]] = []
    for p in record_paths:
        with open(p) as fh:
            loaded.append((p, json.load(fh)))
    # canary-drift record qualification (round-10 VERDICT task 2): a
    # record whose canary median reads > gate× the BEST record's canary
    # median was taken under uniform co-tenant inflation — every sample
    # in it is poisoned, so it is skipped whole, like a hand-flagged
    # record. The best record is never skipped (ratio 1.0), so at least
    # one record always survives qualification.
    canary_meds = {
        p: rec["canary"]["median"]
        for p, rec in loaded
        if isinstance(rec.get("canary"), dict)
        and isinstance(rec["canary"].get("median"), (int, float))
        and not rec.get("flagged")
    }
    best_canary = min(canary_meds.values()) if canary_meds else None
    # mixing canary-gated and ungated records bypasses whole-record
    # qualification (round-11 ADVICE): an ungated record taken under
    # uniform inflation carries no canary median to skip it by, yet its
    # per-query samples still compete for every min — warn loudly so a
    # committed composite is never silently built on such a mix
    if best_canary is not None:
        ungated = [
            p for p, rec in loaded
            if not rec.get("flagged") and p not in canary_meds
        ]
        if ungated:
            print(
                "composite: WARNING mixing canary-gated and UNGATED "
                f"records — {ungated} carry no canary median, so "
                "whole-record inflation qualification cannot reach "
                "them and their samples still ride per-query mins; "
                "re-record them under --canary-gate",
                file=sys.stderr,
            )
    for p, rec in loaded:
        # a record hand-marked "flagged": true (e.g. uniform co-tenant
        # inflation that stayed under the loadavg gate) never rides a
        # composite, even if passed on the command line
        if rec.get("flagged"):
            skipped.append((p, "hand-flagged"))
            continue
        if best_canary and p in canary_meds:
            gate = rec["canary"].get("gate", CANARY_GATE_DEFAULT)
            if canary_meds[p] > gate * best_canary:
                skipped.append((
                    p,
                    f"canary median {canary_meds[p]} > {gate}x best "
                    f"{best_canary}",
                ))
                continue
        records.append(rec)
        kept_paths.append(p)
    if not records:
        sys.exit("--composite: every given record is flagged; nothing to merge")
    for p, reason in skipped:
        print(f"composite: skipped record {p} ({reason})", file=sys.stderr)
    common = set(records[0]["queries"])
    for r in records[1:]:
        common &= set(r["queries"])
    # self-qualifying records (--loadavg-gate / --canary-gate): a record
    # that flagged a query as load- or canary-polluted is excluded from
    # that query's min when at least one clean sample exists — one
    # co-tenant burst can no longer poison a committed composite entry
    # "stale_queries": queries whose CODE changed after the record was
    # taken (hand-annotated mid-round) — their samples measure a tree
    # that no longer exists and must not ride the min when any
    # fresh-tree record has the query
    def _samples(name: str) -> list[float]:
        clean = [
            r["queries"][name]
            for r in records
            if name not in set(r.get("load_flagged", []))
            and name not in set(r.get("stale_queries", []))
            and name not in set(r.get("canary_flagged", []))
        ]
        if not clean:
            # the min MUST NOT silently ride flagged/stale samples
            # without visibility (round-10 ADVICE): every sample for
            # this query was disqualified, so the fallback min below
            # measures a polluted or stale tree — say so.
            print(
                f"composite: WARNING every sample for {name} is "
                "flagged or stale; its min rides polluted/stale data",
                file=sys.stderr,
            )
        return clean or [r["queries"][name] for r in records]

    queries = {
        name: round(min(_samples(name)), 3) for name in sorted(common)
    }
    return {
        "metric": records[0]["metric"].replace("_wall", "_min_composite"),
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": records[0]["sf"],
        "sources": [os.path.basename(p) for p in kept_paths],
    }


def main() -> None:
    full = "--full" in sys.argv
    # these flags are parsed only inside the --composite branch; given
    # without it they would be silently ignored and the operator would
    # commit a record believing its audit/era block ran (review find)
    for flag in ("--audit-against", "--era-ab", "--era-baseline"):
        if flag in sys.argv and "--composite" not in sys.argv:
            sys.exit(f"{flag} requires --composite")
    out_path = None
    if "--out" in sys.argv:
        idx = sys.argv.index("--out")
        if idx + 1 >= len(sys.argv) or sys.argv[idx + 1].startswith("--"):
            sys.exit("usage: bench.py [--full] [--out PATH]")
        out_path = sys.argv[idx + 1]
    if "--composite" in sys.argv:
        # pure file merge — no Spark session
        idx = sys.argv.index("--composite")
        paths = []
        for a in sys.argv[idx + 1 :]:
            if a.startswith("--"):  # next flag (e.g. --out) ends the list
                break
            paths.append(a)
        if not paths:
            sys.exit("usage: bench.py --composite rec1.json rec2.json ...")
        payload = composite(paths)
        # --era-ab AB.json --era-baseline PRIOR_COMPOSITE.json: attach the
        # machine-era normalization block (round-9 VERDICT task 2); both
        # flags or neither — a ratio without its baseline is meaningless
        has_ab = "--era-ab" in sys.argv
        has_base = "--era-baseline" in sys.argv
        if has_ab != has_base:
            sys.exit(
                "--era-ab and --era-baseline must be given together"
            )
        if has_ab:
            ai = sys.argv.index("--era-ab")
            bi = sys.argv.index("--era-baseline")
            if ai + 1 >= len(sys.argv) or bi + 1 >= len(sys.argv):
                sys.exit(
                    "usage: bench.py --composite recs... --era-ab AB.json "
                    "--era-baseline PRIOR.json"
                )
            payload["machine_era"] = machine_era(
                sys.argv[ai + 1], sys.argv[bi + 1]
            )
        # --audit-against PRIOR.json [T]: the per-query regression audit
        # every round recomputed by hand (round-12 VERDICT task 2) —
        # compare this composite's per-query values against a prior
        # round's committed composite and EMBED the result in the
        # payload, so the committed artifact carries its own audit
        # instead of a PERF.md claim.
        if "--audit-against" in sys.argv:
            ai = sys.argv.index("--audit-against")
            if ai + 1 >= len(sys.argv) or sys.argv[ai + 1].startswith("--"):
                sys.exit(
                    "usage: bench.py --composite recs... "
                    "--audit-against PRIOR.json [T]"
                )
            prior_path = sys.argv[ai + 1]
            thr = 1.2
            if ai + 2 < len(sys.argv) and not sys.argv[ai + 2].startswith(
                "--"
            ):
                # after PRIOR.json the only legal positional is the
                # threshold — an unparsable one must fail LOUDLY, not
                # silently audit at the 1.2 default (the --loadavg-gate
                # rule: an operator who typed a gate believes it's on)
                try:
                    thr = float(sys.argv[ai + 2])
                except ValueError:
                    sys.exit(
                        f"--audit-against: bad threshold "
                        f"{sys.argv[ai + 2]!r} (expected a float)"
                    )
            with open(prior_path) as fh:
                prior_q = json.load(fh)["queries"]
            shared = sorted(set(payload["queries"]) & set(prior_q))
            regressed = {
                q: {
                    "prior": prior_q[q],
                    "now": payload["queries"][q],
                    "ratio": round(payload["queries"][q] / prior_q[q], 3),
                }
                for q in shared
                if prior_q[q] > 0
                and payload["queries"][q] / prior_q[q] > thr
            }
            payload["regression_audit"] = {
                "against": os.path.basename(prior_path),
                "threshold": thr,
                "n_shared": len(shared),
                "n_only_now": len(set(payload["queries"]) - set(prior_q)),
                "n_only_prior": len(set(prior_q) - set(payload["queries"])),
                "regressed": regressed,
            }
            for q, row in sorted(regressed.items()):
                print(
                    f"audit: {q} {row['prior']}s -> {row['now']}s "
                    f"({row['ratio']}x)",
                    file=sys.stderr,
                )
            print(
                f"audit: {len(regressed)}/{len(shared)} shared queries "
                f"> {thr}x vs {os.path.basename(prior_path)}",
                file=sys.stderr,
            )
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(payload, fh, indent=1)
        print(json.dumps(detail_line(payload)))
        print(dump_line(final_line(payload)))
        return
    ab_names = None
    if "--ab" in sys.argv:
        idx = sys.argv.index("--ab")
        if idx + 1 >= len(sys.argv):
            sys.exit("usage: bench.py --ab qA,qB[,reps]")
        parts = sys.argv[idx + 1].split(",")
        if len(parts) < 2:
            sys.exit("usage: bench.py --ab qA,qB[,reps]")
        ab_names = (parts[0], parts[1], int(parts[2]) if len(parts) > 2 else 3)
    only_names = None
    if "--only" in sys.argv:
        idx = sys.argv.index("--only")
        if idx + 1 >= len(sys.argv):
            sys.exit("usage: bench.py --only q1,q2,...")
        only_names = [
            p.strip() for p in sys.argv[idx + 1].split(",") if p.strip()
        ]
    canary_gate = None
    if "--canary-gate" in sys.argv:
        idx = sys.argv.index("--canary-gate")
        canary_gate = CANARY_GATE_DEFAULT
        if idx + 1 < len(sys.argv) and not sys.argv[idx + 1].startswith(
            "--"
        ):
            try:
                canary_gate = float(sys.argv[idx + 1])
            except ValueError:
                sys.exit(
                    f"--canary-gate: unparsable threshold "
                    f"{sys.argv[idx + 1]!r} (expected a float, e.g. 1.2)"
                )
        if canary_gate <= 1.0:
            sys.exit("--canary-gate: threshold must be > 1.0")
    loadavg_gate = None
    if "--loadavg-gate" in sys.argv:
        idx = sys.argv.index("--loadavg-gate")
        loadavg_gate = 8.0
        if idx + 1 < len(sys.argv) and not sys.argv[idx + 1].startswith(
            "--"
        ):
            # a malformed threshold must not silently fall back to the
            # default — the operator would believe a custom gate is active
            try:
                loadavg_gate = float(sys.argv[idx + 1])
            except ValueError:
                sys.exit(
                    f"--loadavg-gate: unparsable threshold "
                    f"{sys.argv[idx + 1]!r} (expected a float, e.g. 8.0)"
                )
    if "--ab-ref" in sys.argv:
        # A/B a query set against another git rev — two temp-worktree
        # SUBPROCESS arms, interleaved rep by rep. No Spark session in
        # this process; each arm pays its own session spin-up but the
        # measured number is the arm's own min-of-2 within-process.
        import subprocess
        import tempfile

        idx = sys.argv.index("--ab-ref")
        if idx + 2 >= len(sys.argv):
            sys.exit("usage: bench.py --ab-ref REF qA[,qB...][,reps]")
        ref = sys.argv[idx + 1]
        if ref.lower() == "head":
            # the local tree's arm key is literally 'head'; a ref named
            # HEAD would collide in the arms dict and silently drop one arm
            sys.exit(
                "--ab-ref: REF must not be 'head' (that IS the local arm); "
                "pass a commit SHA, branch, or tag"
            )
        parts = sys.argv[idx + 2].split(",")
        reps = 3
        if parts and parts[-1].isdigit():
            reps = int(parts[-1])
            parts = parts[:-1]
        if not parts:
            sys.exit("usage: bench.py --ab-ref REF qA[,qB...][,reps]")
        repo = os.path.dirname(os.path.abspath(__file__))
        # key the worktree path by the RESOLVED commit SHA, not the ref
        # name: a branch that moved since the worktree was created, or two
        # refs that sanitize identically (feat/x vs feat_x), would silently
        # A/B the wrong tree under a name-keyed path
        sha = subprocess.run(
            ["git", "-C", repo, "rev-parse", "--verify", ref + "^{commit}"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        wt = os.path.join(tempfile.gettempdir(), "setu_ab_" + sha[:16])
        if os.path.isdir(wt):
            wt_head = subprocess.run(
                ["git", "-C", wt, "rev-parse", "HEAD"],
                capture_output=True, text=True,
            ).stdout.strip()
            if wt_head != sha:
                subprocess.run(
                    ["git", "-C", wt, "checkout", "--detach", sha],
                    check=True,
                )
        else:
            subprocess.run(
                ["git", "-C", repo, "worktree", "add", "--detach", wt, sha],
                check=True,
            )
        # an arm whose bench.py predates --only would IGNORE the flag
        # and sweep its whole headline set — refuse loudly instead
        with open(os.path.join(wt, "bench.py")) as fh:
            if "--only" not in fh.read():
                sys.exit(
                    f"--ab-ref: {ref}'s bench.py has no --only support; "
                    "pick a ref at or after round 9"
                )
        arms = {"head": repo, ref: wt}
        runs_ref: dict[str, dict[str, list[float]]] = {
            a: {q: [] for q in parts} for a in arms
        }
        # alternate arm order per rep: a fixed head-first order hands the
        # second arm every warm-cache/load-ramp advantage (the round-9
        # phantom-regression lesson, measured again as a ~5% drift on
        # untouched queries in ab_r13opt_final.json)
        arm_order = list(arms.items())
        for rep in range(reps):
            for arm, path in (
                arm_order if rep % 2 == 0 else arm_order[::-1]
            ):
                with tempfile.NamedTemporaryFile(
                    suffix=".json", delete=False
                ) as tf:
                    tmp = tf.name
                cmd = [
                    sys.executable,
                    os.path.join(path, "bench.py"),
                    "--only",
                    ",".join(parts),
                    "--out",
                    tmp,
                ]
                subprocess.run(
                    cmd, cwd=path, check=True,
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                )
                with open(tmp) as fh:
                    rec = json.load(fh)
                os.unlink(tmp)
                for q in parts:
                    if q in rec["queries"]:
                        runs_ref[arm][q].append(rec["queries"][q])
                print(
                    f"[bench] ab-ref rep {rep + 1}/{reps} arm {arm}: "
                    + ", ".join(
                        f"{q}={rec['queries'].get(q)}" for q in parts
                    ),
                    file=sys.stderr,
                )
        payload = {
            "metric": "ab_ref_min",
            "value": 0.0,
            "unit": "sec",
            "queries": {
                f"{a}:{q}": round(min(r), 3) if r else None
                for a, qs in runs_ref.items()
                for q, r in qs.items()
            },
            "sf": os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
            ),
            "ab_ref": ref,
            "ab_runs": runs_ref,
        }
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(payload, fh, indent=1)
        print(json.dumps({"ab_ref": ref, "ab_runs": runs_ref}))
        print(
            json.dumps(
                {
                    "metric": "ab_ref_min",
                    "arms": {
                        a: round(
                            sum(min(r) for r in qs.values() if r), 3
                        )
                        for a, qs in runs_ref.items()
                    },
                }
            )
        )
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from setu_spark.session import get_spark

    spark = get_spark("setu-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    queries = entry.queries()
    names = list(queries) if full else HEADLINE
    if only_names:
        unknown = [n for n in only_names if n not in queries]
        if unknown:
            sys.exit(f"--only: unknown queries {unknown}")
        names = only_names

    # Warm the JVM/codegen paths and the Python (Arrow UDF) workers once so
    # the first measured query doesn't pay session/worker spin-up.
    try:
        queries["q01_pricing_summary"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        spark.range(64).select(
            F.pandas_udf(lambda s: s, "long")(F.col("id"))
        ).write.format("noop").mode("overwrite").save()
    except Exception as exc:  # warm-up failure must not kill the run
        print(f"[bench] warm-up failed: {exc!r}", file=sys.stderr)
    if canary_gate is not None:
        # one DISCARD canary: the first in-sweep canary otherwise reads
        # ~1.5x the session median (paths the generic warm-up above
        # does not touch) and systematically flags the first measured
        # query in EVERY record — observed on all four clean round-11
        # records, which left q01 with no clean composite sample
        try:
            queries[CANARY_QUERY](spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as exc:
            print(f"[bench] canary warm-up failed: {exc!r}", file=sys.stderr)

    def _time_canary(tag: str) -> float | None:
        """One timed canary run — the pre/post sweep self-qualification
        probes (round-11 VERDICT task 2). Warm by construction: the
        generic warm-up above already ran the canary query once."""
        try:
            t0 = time.perf_counter()
            queries[CANARY_QUERY](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t = round(time.perf_counter() - t0, 3)
            print(f"[bench] canary_{tag}: {t}s", file=sys.stderr)
            return t
        except Exception as exc:  # probe failure ≠ sweep failure
            print(f"[bench] canary_{tag} failed: {exc!r}", file=sys.stderr)
            return None

    if ab_names:
        # Interleaved A/B (PERF.md methodology, promoted to a flag per
        # round-7 VERDICT task 7): alternate the two arms run-by-run so
        # a co-tenant burst hits BOTH, making the per-arm min/median a
        # trustworthy delta where sequential single artifacts are not.
        qa, qb, reps = ab_names
        runs_ab: dict[str, list[float]] = {qa: [], qb: []}
        for _ in range(reps):
            for name in (qa, qb):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs_ab[name].append(
                    round(time.perf_counter() - t0, 3)
                )
                spark.catalog.clearCache()
        payload = {
            "metric": "interleaved_ab_min",
            "value": round(
                min(runs_ab[qa]) + min(runs_ab[qb]), 3
            ),
            "unit": "sec",
            "queries": {n: min(r) for n, r in runs_ab.items()},
            "sf": sf_dir,
            "ab_runs": runs_ab,
        }
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(payload, fh, indent=1)
        print(json.dumps({"ab_runs": runs_ab}))
        print(dump_line(final_line(payload)))
        return

    # min of 2 runs per query: the machine hosting the bench also hosts
    # other work, and single-shot numbers swing ±40% with background load;
    # the min is the engine's actual cost. A co-tenant burst can span
    # BOTH runs (observed: a ~10s stall landing on a different <2s query
    # each full sweep), so when even the min looks stalled (> SLOW_FLOOR,
    # above every honest per-query cost at sf0.1) retry up to 2 more
    # times — a burst long enough to poison four spaced runs hasn't been
    # observed.
    SLOW_FLOOR = 5.0
    # Failure isolation: one throwing query must not abort the sweep (a
    # single bad query killed the entire round-3 bench before any JSON was
    # written). Each query runs under try/except; errors are recorded in a
    # parallel map and the partial result is checkpointed to
    # bench_partial.json after EVERY query so a hard crash mid-sweep still
    # leaves numbers on disk.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # queries where MORE than the baseline 2 samples ran (adaptive
    # third on >1.5× disagreement, or SLOW_FLOOR retries) — recorded so
    # cross-round deltas stay interpretable: min over more samples is
    # biased low, and PERF.md methodology references this key
    extra_samples: dict[str, int] = {}
    # Host load around each query (1-min loadavg): this machine is
    # co-tenant and single-shot numbers swing ±40% under bursts —
    # BENCH_r04 read 1.10x vs r01 while the same-day idle run read
    # 0.97x, and nothing in the JSON showed why. Recording load makes
    # noisy runs machine-distinguishable from regressions.
    loads: dict[str, float] = {}
    load_start = os.getloadavg()[0]
    # --loadavg-gate: per-query flag when the pre-run 1-min loadavg
    # exceeds the threshold — the record self-qualifies and
    # --composite prefers unflagged samples
    load_flagged: list[str] = []
    # --canary-gate: one canary run immediately before each measured
    # query; flags computed against the record's own canary median at
    # every checkpoint (host-metric-free burst detection)
    canary_samples: dict[str, float] = {}
    # pre/post sweep probes: ALWAYS taken (gated or plain) so every
    # record — most importantly the driver's plain BENCH_rN sweep — is
    # self-qualifying from its final line alone (round-11 VERDICT
    # task 2); ~2s total
    canary_probes: dict[str, float] = {}
    t_pre = _time_canary("pre")
    if t_pre is not None:
        canary_probes["canary_pre"] = t_pre

    def _canary_block() -> tuple[dict, list[str]]:
        vals = sorted(canary_samples.values())
        n = len(vals)
        med = (
            round((vals[n // 2] + vals[(n - 1) // 2]) / 2, 3) if n else None
        )
        flagged = canary_flags(canary_samples, med, canary_gate)
        block = {
            "name": CANARY_QUERY,
            "gate": canary_gate,
            "median": med,
            "samples": canary_samples,
        }
        return block, flagged

    def _checkpoint() -> None:
        payload = {
            "metric": (
                "full_registry_total_wall"
                if full
                else "headline_query_total_wall"
            ),
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "sf": sf_dir,
            "loadavg": {
                "start": round(load_start, 2),
                "end": round(os.getloadavg()[0], 2),
                "per_query": loads,
            },
        }
        if extra_samples:
            payload["extra_samples"] = extra_samples
        if loadavg_gate is not None:
            payload["loadavg_gate"] = loadavg_gate
            payload["load_flagged"] = load_flagged
        if canary_gate is not None:
            block, flagged = _canary_block()
            payload["canary"] = block
            payload["canary_flagged"] = flagged
        payload.update(canary_probes)
        if errors:
            payload["errors"] = errors
        try:
            with open("bench_partial.json", "w") as fh:
                json.dump(payload, fh)
        except OSError:
            pass
        return payload

    for name in names:
        if canary_gate is not None:
            try:
                t0 = time.perf_counter()
                queries[CANARY_QUERY](spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                canary_samples[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # canary failure ≠ sweep failure
                print(f"[bench] canary failed: {exc!r}", file=sys.stderr)
        loads[name] = round(os.getloadavg()[0], 2)
        if loadavg_gate is not None and loads[name] > loadavg_gate:
            load_flagged.append(name)
            print(
                f"[bench] {name}: loadavg {loads[name]} > gate "
                f"{loadavg_gate} — record flagged",
                file=sys.stderr,
            )
        try:
            runs: list[float] = []
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            # Adaptive third sample: two runs disagreeing by >1.5× means a
            # co-tenant burst hit one of them (a plan doesn't cost 1.5×
            # itself run-to-run); one more sample lets min() shed the
            # poisoned one. Bounded: at most +1 run, only on noisy queries.
            if max(runs) > 1.5 * min(runs):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            retries = 0
            while min(runs) > SLOW_FLOOR and retries < 2:
                retries += 1
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 3)
            if len(runs) > 2:
                extra_samples[name] = len(runs)
            print(f"[bench] {name}: {timings[name]}s", file=sys.stderr)
        except Exception as exc:
            errors[name] = repr(exc)[:500]
            print(f"[bench] {name}: ERROR {exc!r}", file=sys.stderr)
        finally:
            # queries that cache internal projections (q29/q37/q55/…) must
            # not leak blocks into later timings: measured +2-5s of GC/
            # eviction pressure on the tail queries once a few runs of
            # cached DataFrames accumulate in the block manager
            spark.catalog.clearCache()
            _checkpoint()

    t_post = _time_canary("post")
    if t_post is not None:
        canary_probes["canary_post"] = t_post
    payload = _checkpoint()
    era_ref = latest_committed_era(os.path.dirname(os.path.abspath(__file__)))
    if era_ref:
        payload["era_ref"] = era_ref
    if "--funnel-shared" in sys.argv:
        import setu_spark.operators.dedup as dedup

        FUNNEL_FAMILY = [
            "q56_dedup_components",
            "q125_dedup_impact_audit",
            "q144_leak_free_split",
            "q149_component_source_purity",
            "q150_quality_survivor_delta",
        ]
        shared: dict[str, float] = {}
        dedup.FUNNEL_SHARED = True
        try:
            t_all = time.perf_counter()
            for name in FUNNEL_FAMILY:
                # no clearCache between family members — sharing the
                # cached funnel is the point of this pass. Same failure
                # isolation as the main sweep: one throwing family member
                # must not lose the whole run's --out dump and final line.
                t0 = time.perf_counter()
                try:
                    queries[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    shared[name] = round(time.perf_counter() - t0, 3)
                except Exception as exc:
                    errors[f"funnel_shared:{name}"] = repr(exc)[:500]
                    print(
                        f"[bench] funnel-shared {name}: ERROR {exc!r}",
                        file=sys.stderr,
                    )
            shared["_family_total"] = round(
                time.perf_counter() - t_all, 3
            )
        finally:
            dedup.FUNNEL_SHARED = False
            dedup.clear_funnel_memo()
            spark.catalog.clearCache()
        payload["funnel_shared"] = shared
        if errors:  # funnel errors land after the final checkpoint
            payload["errors"] = errors
        print(f"[bench] funnel-shared: {shared}", file=sys.stderr)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1)
    # Detail (loadavg, errors) on its OWN line; the compact headline
    # summary is the FINAL line so a tail-capture of any size parses.
    print(json.dumps(detail_line(payload)))
    print(dump_line(final_line(payload)))


if __name__ == "__main__":
    main()
