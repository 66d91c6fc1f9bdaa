#!/usr/bin/env python3
"""Dev tooling: render SCALING.md from three Bench JSON lines.

Usage: python3 scripts/scaling_report.py sf001.json sf01.json sf1.json

The three files are `graft.Bench` outputs at sf0.01, sf0.1 and the
10x ScaleUp replica of sf0.1 ("sf1"). The report tabulates per-query
seconds and the x10/x100 wall-clock ratios, flagging queries whose
time grows faster than rows. Pair-emitting sketch queries are expected
super-linear on the replica because exact replication multiplies the
true near-dup pair mass ~N^2 (see ScaleUp.scala's scaladoc).
"""
import json
import sys

# queries whose OUTPUT is super-linear under exact replication: every
# doc/vector gains 9 identical twins, so pair mass scales ~copies^2
PAIR_FAMILIES = {
    "d2_dedup_minhash", "d2_precision", "d3_dedup_simhash", "d3_precision",
    "d4_dedup_ngram_jaccard", "d5_dedup_embedding_cos", "d6_dedup_components",
    "e2_corpus_neardup_clean", "x3_sim_lsh_pairs", "x3_precision",
    "d8_components_star", "d9_dedup_embedding_ivf",
    "d11_dedup_minhash_incremental", "d11_precision",
    # the stored-index probe emits d11's pair list (and the
    # consistency twins run BOTH chains), so the same twin-inflated
    # candidate mass drives their time under exact replication; the
    # versioned and post-compact variants serve the identical pair
    # list from the same assets
    "d15_dedup_index_probe", "d15_index_consistency",
    "d15v_index_probe_versioned", "d15v_consistency",
    "d15c_compact_probe", "d16_dedup_retract",
    "d17_dedup_lifecycle",
    # d22 runs d17's probe chain (plus the direct gate re-derivation)
    # over the staged-rebuilt index — same twin-inflated candidate mass
    "d22_staged_rebuild",
    # d18 probes the merged index with the same full-batch chain as
    # d15 (and re-runs the direct gate for the consistency diff), so
    # the identical twin-inflated candidate mass drives its time
    "d18_index_merge",
    # d19 runs the same d15-class probe chain over the absorbed index
    "d19_index_absorb",
    "st5_stream_interval_join",
    # every replica doc's 9 identical twins share whole-document spans,
    # so the span pair list itself scales ~copies^2
    "d12_duplicate_spans",
    # d23 runs d12's pair/diagonal chain internally before the
    # corpus-sized rewrite, so the same twin-inflated span mass
    # drives its time (and the interval lists it merges)
    "d23_scrub_spans",
    # components over the embedding pair list — the pair mass itself
    # is ~copies^2 under exact vector replication
    "d13_semantic_groups",
    # every replica name has 9 identical twins at distance 0, so the
    # fuzzy-match pair list itself scales ~copies^2
    "d14_fuzzy_match",
    # recall rows: 1-row OUTPUT but the measured chain mines the same
    # twin-inflated near-dup pair mass as d9 (both the approx side's
    # bucket pairs and the sampled-exact side's matches), so their
    # TIME is ~copies^2 under exact replication by construction
    "d9_recall", "d9_recall_mp",
}


def load(path):
    with open(path) as f:
        return json.load(f)


def main(p001, p01, p1):
    b001, b01, b1 = load(p001), load(p01), load(p1)
    q001, q01, q1 = b001["queries"], b01["queries"], b1["queries"]
    names = sorted(q01)

    print("| query | sf0.01 s | sf0.1 s | sf1synth s | x10 ratio | x100 ratio | note |")
    print("|---|---|---|---|---|---|---|")
    flagged = []
    for n in names:
        t001, t01, t1 = q001.get(n), q01.get(n), q1.get(n)
        r10 = t01 / t001 if t01 is not None and t001 else None
        r100 = t1 / t001 if t1 is not None and t001 else None
        note = ""
        if n in PAIR_FAMILIES:
            note = "pair family: output ~N^2 under replication"
        elif t1 is not None and t01 and t1 / t01 > 20:
            note = "SUPER-LINEAR — investigate"
            flagged.append(n)
        def fmt(t, spec=".2f"):
            return format(t, spec) if t is not None else "—"
        print(f"| {n} | {fmt(t001)} | {fmt(t01)} | {fmt(t1)} "
              f"| {fmt(r10, '.1f')} | {fmt(r100, '.1f')} | {note} |")
    print()
    print(f"Totals: sf0.01 {b001['value']:.1f} s, sf0.1 {b01['value']:.1f} s, "
          f"sf1synth {b1['value']:.1f} s.")
    if flagged:
        print(f"FLAGGED super-linear: {', '.join(flagged)}")
    # ERRORS is ALWAYS printed and derived ONLY from the three inputs
    # being rendered — round 4 shipped a SCALING.md whose table came
    # from the fixed sweep but whose ERRORS line was spliced in from a
    # pre-fix leg, i.e. the file contradicted itself. An uncondition-
    # ally printed line cannot be silently inherited from an older
    # splice. The -1.0 timing sentinel (Bench's failed-query marker)
    # counts as an error even if the errors map was lost.
    errs = {k: v for b in (b001, b01, b1) for k, v in b.get("errors", {}).items()}
    for tag, b in (("sf0.01", b001), ("sf0.1", b01), ("sf1synth", b1)):
        for n, t in b["queries"].items():
            if t is not None and t < 0 and n not in errs:
                errs[n] = f"timing sentinel -1 at {tag} (failed, no message)"
    print(f"ERRORS: {errs}")
    # round-close gate: a sweep with ANY failed query must not render
    # a shippable report — exit nonzero so the close script stops
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
