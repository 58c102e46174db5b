#!/usr/bin/env python3
"""Re-record BASELINE.md's measured table under the CURRENT bench harness.

The baseline and per-round BENCH_r{N} runs must share one methodology or the
2x gate manufactures phantoms (round 4: q6 read 2.28x with zero code change
because the baseline predated the interleaved-reps estimator). This script is
the recording procedure:

  1. run graft.Bench at the driver's config (sf0.1, local[32], 32 shuffle
     partitions, interleaved SPARK_GRAFT_REPS=3, recursive page-cache
     prewarm, fixed heap);
  2. enforce PLAUSIBILITY ASSERTS before accepting the numbers — a query
     that executes a strict superset of another query's work cannot be
     cheaper than it at steady state:
       d6_simhash_pairs >= d3_simhash      (d6 runs D3SimHash.run as stage 1)
       d4_ngram_jaccard >= d2_minhash_lsh  (d4 = d2's candidate gen + verify)
       d7_dup_clusters  >= d4_ngram_jaccard (d7 materializes d4 + propagates)
       d10_semantic_clusters >= d5_embed_dup (d10 materializes d5 + propagates)
       p4_training_corpus >= p1_clean_corpus (p4 runs p1's chain as stage 1)
     A violation means a contention burst or cold-path landed on the
     subset-query's reps: the run is REJECTED (exit 2) — re-record, never
     hand-edit;
  3. splice the per-query table + total into BASELINE.md's
     "### Recorded" section;
  4. append one compact JSON line per query to BASELINE_HISTORY.jsonl so
     round-over-round per-query comparison never needs git archaeology of
     BASELINE.md (BENCH_r*.json tails truncate).

SHARED-STAGE MODE (round 11+): Bench runs with graft.Materialize enabled by
default — expensive upstream chains (p1 dispositions, d16 verified pairs,
d9 verdicts, the p9/p10 kept-corpus strip) build once per run as parquet
stage outputs and every consumer reads them. Per-query numbers therefore
measure CONSUMER cost given materialized stages; the one-time builds appear
in bench.json's "shared" block and are folded into the headline total. The
plausibility rules below remain valid under sharing because every
superset/subset pair shares the same upstream reads (p4 = p1's read + mix +
pack, so p4 >= p1 still; no rule compares a consumer against a stage it no
longer re-runs).

Usage:
  tools/record_baseline.py            # run bench, check, rewrite BASELINE.md
  tools/record_baseline.py --from-json PATH   # splice an existing bench.json
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "BASELINE.md")
MARKER = "### Recorded"

# (superset, subset): superset's steady-state time must be >= subset's.
# SHARED-MODE REDERIVATION: when bench.json's "shared" block is enabled, a
# rule only remains valid if the superset still does strictly more work ON
# TOP OF the same shared reads. Two round-10 rules fail that test once
# their frames are stage outputs: d4 >= d2 (d4 becomes a pure stage read
# while d2 still runs its LSH chain) and d7 >= d4 (both become pure stage
# reads of comparable size — the comparison is noise, not structure).
# They are checked only in unshared runs; d13 >= d7 is valid ONLY under
# sharing (unshared, d13 re-runs d7's chain + an aggregate — also a strict
# superset, so it is safe to check in both modes and lives in the main
# list). Every other rule's superset reads the same shared stage as its
# subset plus does more, so the rule survives both modes.
PLAUSIBILITY_UNSHARED_ONLY = [
    ("d4_ngram_jaccard", "d2_minhash_lsh"),
    ("d7_dup_clusters", "d4_ngram_jaccard"),
    # d20's pair list is ITSELF a stage (d20_pairs, shared with d21): under
    # sharing d20 is a pure stage read while t29 still aggregates the full
    # minima stage — the d4 >= d2 situation exactly. Unshared, d20 rebuilds
    # the minima chain + the self-join and the rule is structural.
    ("d20_winnow_dup", "t29_winnowing"),
]
PLAUSIBILITY = [
    ("d6_simhash_pairs", "d3_simhash"),
    ("s14_ann_hamming", "d3_simhash"),  # s14 reads d3's signature stage + bands/joins/ranks
    ("d21_winnow_clusters", "d20_winnow_dup"),  # d21 = d20's pair stage + component propagation (shared: stage read + loop vs pure stage read; unshared: rebuilds d20's chain + loop)
    ("d13_cluster_sizes", "d7_dup_clusters"),
    ("d10_semantic_clusters", "d5_embed_dup"),
    ("g1_pagerank", "d5_embed_dup"),  # g1 runs D5EmbedDedup.run as stage 1
    ("p4_training_corpus", "p1_clean_corpus"),  # p4 runs p1's chain as stage 1
    ("p5_decontaminated", "p1_clean_corpus"),  # p5 = p1 dispositions + d9 gate
    ("d15_quality_survivor", "d7_dup_clusters"),  # d15 joins d7's components
    ("g2_triangles", "d5_embed_dup"),  # g2 runs D5EmbedDedup.run as stage 1
    ("v2c_knn_label_ivf", "s6_ann_ivf_trained"),  # v2c runs s6's training loop as stage 1
    ("s11_ann_ivf_pq", "s6_ann_ivf_trained"),  # s11 routes through s6's trained lists
    ("s11_ann_ivf_pq", "s7_ann_pq"),  # s11 scores candidates over s7's encode
    ("k5_classifier_eval", "k4_quality_classifier"),  # k5 recounts k4's own run
    ("p9_release_manifest", "p1_clean_corpus"),  # p9 runs p1's chain as stage 1
    ("p10_release_pii", "p1_clean_corpus"),  # p10 runs p1's chain as stage 1
    ("p10_release_pii", "p9_release_manifest"),  # p10 = p9's chain + injection + redact counts
    ("p12_attrition_funnel", "p5_decontaminated"),  # p12 runs p1+d9 (= p5's chain) then strips and mixes
    ("k6_calibration", "k4_quality_classifier"),  # k6 bins k4's own scored run
    ("s12_propensity_sample", "k4_quality_classifier"),  # s12 ranks k4's own scored run
    ("k7_uncertainty_sample", "k4_quality_classifier"),  # k7 queues k4's own scored run
    ("p16_epoch_shuffle", "p14_bpe_pack"),  # p16 invokes p14's run for the chunk universe
    ("s13_ann_recall_curve", "s8_ann_ivf_search"),  # s13 = s8's search shape x 5 curve points + the exact pass, same trained index
    ("t26_filter_agreement", "k4_quality_classifier"),  # t26 joins k4's own scored run (t19 side has its own stage)
    ("v5_cluster_purity", "d16_semantic_lsh"),  # v5 runs d16's full cluster chain + the purity join
    ("k9_classifier_auc", "k4_quality_classifier"),  # k9 regroups k4's own scored run
]

REPS = "3"
CPUS = "32"
SF_DIR = "/root/testdata/sf0.1"


def run_bench():
    out = tempfile.mkdtemp(prefix="baseline_rec_")
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=SF_DIR,
               SPARK_GRAFT_REPS=REPS,
               SPARK_GRAFT_CPUS=CPUS,
               SPARK_GRAFT_OUT=out)
    print(f"[record] running bench (sf={SF_DIR}, reps={REPS}, cpus={CPUS}) ...",
          flush=True)
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=REPO, env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    sys.stdout.buffer.write(r.stdout[-2000:])
    if r.returncode != 0:
        sys.exit(f"[record] bench failed with rc={r.returncode}")
    return os.path.join(out, "bench.json")


# A superset query may measure under its prefix when the extra work is tiny
# (d4's verify stage processes ~30 candidate pairs) and the prefix suffers a
# deterministic SLOT effect (d2 runs right after allocation-heavy d1 in every
# interleaved pass and reads ~0.97s in the full suite vs 0.77s in a dedup-only
# subset of the same build — same-JVM GC/slot luck, not data cost; min-of-N
# across passes cannot dodge an effect pinned to the suite order). The gate
# exists to catch IMPOSSIBLE readings — the round-4 cache-leak row sat at
# 0.41x of its prefix — so the band is set between "slot noise" (~0.8x worst
# observed) and "structurally impossible" (~0.4x).
NOISE = 0.75
NOTE = None


def check(data):
    if data.get("failed"):
        sys.exit(f"[record] REJECT: failed queries {data['failed']}")
    q = data["queries"]
    shared = bool((data.get("shared") or {}).get("enabled"))
    rules = PLAUSIBILITY + ([] if shared else PLAUSIBILITY_UNSHARED_ONLY)
    bad = []
    for sup, sub in rules:
        if q[sup] < NOISE * q[sub]:
            bad.append(f"{sup}={q[sup]:.2f}s < {NOISE} * {sub}={q[sub]:.2f}s")
    if bad:
        print("[record] REJECT — superset measured cheaper than its prefix "
              "(contention/cold-path artifact); re-record:")
        for b in bad:
            print(f"  {b}")
        sys.exit(2)
    print(f"[record] plausibility asserts passed (shared={shared}: "
          f"{', '.join(f'{a}>={b}' for a, b in rules)})")


def splice(data):
    q = data["queries"]
    shared = data.get("shared") or {}
    builds = shared.get("builds") or {}
    build_total = shared.get("build_total", 0.0)
    total = sum(q.values()) + build_total
    with open(BASELINE) as f:
        head = f.read().split(MARKER)[0].rstrip() + "\n"
    rows = "\n".join(f"| {name} | {q[name]:.2f} |" for name in sorted(q))
    if builds:
        rows += "\n" + "\n".join(
            f"| (shared build) {name} | {sec:.2f} |"
            for name, sec in sorted(builds.items()))
    note = NOTE or "see the recording commit's message for this recording's rationale"
    section = f"""
{MARKER} numbers (sf0.1, local[{CPUS}], -Xmx8g=-Xms, {CPUS} shuffle partitions, interleaved reps={REPS})

Recorded by `tools/record_baseline.py` — the same Bench harness the driver
runs (codegen warm pass at sf0.001, recursive page-cache prewarm, per-query
minimum over {REPS} INTERLEAVED passes with per-pass permuted suite order,
fixed heap, UNTIMED cache sweep between queries; see Bench.scala's scaladoc
for why each knob exists — the cache-leak fix, the untimed sweep, and the
permuted interleaving were each adopted after a measured artifact). This
section is REGENERATED by the script on every recording — prose that must
survive a re-record belongs above the marker or in the --note argument.

Why re-recorded: {note}

Acceptance gate applied at recording time (violation = the run is rejected
and repeated, never hand-edited): a query executing a strict superset of
another's work must not measure cheaper — the rule list lives in
record_baseline.py, with two rules (d4 >= d2, d7 >= d4) checked only in
UNSHARED runs because under shared-stage materialization their supersets
become pure stage reads — with a 0.75 noise band separating per-slot
scheduling luck (~0.8x worst observed under fixed-order passes) from
impossible readings (the round-4 cache-leak row sat at 0.41x).

Total wall-clock for the {len(q)}-query timed pass (sum of per-query
minima{' + one-time shared-stage builds' if builds else ''}): {total:.1f} s.
Per query (seconds; "(shared build)" rows are the one-time stage
materializations every consumer then reads):

| query | sec |
|---|---|
{rows}
"""
    with open(BASELINE, "w") as f:
        f.write(head + section)
    print(f"[record] BASELINE.md rewritten: {len(q)} queries, total {total:.1f}s")


HISTORY = os.path.join(REPO, "BASELINE_HISTORY.jsonl")


def append_history(data, note):
    """One compact JSON line per recording: round-over-round per-query
    comparison without git archaeology (BENCH_r*.json tails truncate)."""
    import time
    q = data["queries"]
    shared = data.get("shared") or {}
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "note": note,
        "total": round(sum(q.values()) + shared.get("build_total", 0.0), 2),
        "shared": shared,
        "queries": {k: round(v, 3) for k, v in sorted(q.items())},
    }
    with open(HISTORY, "a") as f:
        f.write(json.dumps(rec, separators=(",", ":")) + "\n")
    print(f"[record] appended recording to {os.path.basename(HISTORY)}")


def main():
    global NOTE
    args = sys.argv[1:]
    if "--note" in args:
        i = args.index("--note")
        NOTE = args[i + 1]
        del args[i:i + 2]
    if len(args) == 2 and args[0] == "--from-json":
        path = args[1]
    else:
        path = run_bench()
    with open(path) as f:
        data = json.load(f)
    check(data)
    splice(data)
    append_history(data, NOTE or "")


if __name__ == "__main__":
    main()
