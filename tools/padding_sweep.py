#!/usr/bin/env python3
"""Padding sweep (VERDICT r17 §next-8): detect catalog entries whose
OUTPUTS are identical — the `text_js_matrix` class of accidental
duplicate, where two differently-named entries compute the same frame.

Entries that SHARE an oracle SQL string are intentional siblings (two
plans proving the same contract — clusters driver ∨ distributed,
radius brute ∨ pruned ∨ adaptive) and are grouped but not flagged.
Any identical-output group whose members carry DIFFERENT oracle texts
is a suspected padding duplicate and fails the sweep — unless the
group is a PINNED_DIVERGENCE sibling set: operators that genuinely
differ but coincide on the sf-fixture because the fixture never
reaches their divergence edge (exact vs anchored decontamination with
no multi-hop chain crossing eval; as-of tolerance with no stale match
at this SF; a hot-bucket cap no sf0.01 bucket exceeds). Each such
group names the ScalaTest spec that proves the divergence on a
constructed fixture, so the claim stays checkable.

Usage: python3 tools/padding_sweep.py [verifyOutDir]
Run after graft.Verify; exits nonzero on suspected duplicates.
"""
import glob
import hashlib
import json
import os
import sys

import pandas as pd


def content_hash(entry_dir: str) -> str:
    files = sorted(glob.glob(f"{entry_dir}/*.parquet"))
    if not files:
        return "<empty>"
    df = pd.concat([pd.read_parquet(f) for f in files])
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    body = df.to_csv(index=False).encode()
    return hashlib.sha256(body).hexdigest()


# Sibling groups with spec-pinned divergence on constructed fixtures
# (frozenset of names -> the spec test that separates them).
PINNED_DIVERGENCE = {
    frozenset(["curation_pipeline_v5", "curation_pipeline_v5_anchored"]):
        "Round18OpsSpec: anchored flags a SUBSET (multi-hop chain fixture)",
    frozenset(["join_asof_forward", "join_asof_forward_tolerance",
               "join_asof_tolerance"]):
        "AsOfJoinSpec: tolerance nulls stale matches on a staleness fixture",
    frozenset(["multimodal_phash_dedup", "multimodal_phash_dedup_tight"]):
        "Round19MultimodalSpec: tight cap star-expands a hot-bucket fixture",
    frozenset(["dedup_cross_corpus", "dedup_cross_corpus_capped"]):
        "Round19PackSpec: cap truncates a 25-copy hot bucket (25 vs 20 pairs)",
    frozenset(["dedup_incremental_assign", "dedup_incremental_assign_capped"]):
        "Round19PackSpec: truncated copies flip to is_new under the cap",
    frozenset(["text_contamination_report", "text_contamination_report_sampled"]):
        "Round19PackSpec: the fixed-size eval anchor drops rows past doc_id 5000",
}


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    groups = {}
    for name in sorted(oracles):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        h = content_hash(d)
        groups.setdefault(h, []).append(name)
    suspects = []
    for h, names in sorted(groups.items()):
        if len(names) < 2 or h == "<empty>":
            continue
        texts = {oracles.get(n) for n in names}
        if len(texts) == 1:
            print(f"OK   intentional siblings (shared oracle): {names}")
        elif frozenset(names) in PINNED_DIVERGENCE:
            print(f"OK   pinned-divergence siblings "
                  f"({PINNED_DIVERGENCE[frozenset(names)]}): {names}")
        else:
            print(f"FLAG identical outputs, different oracles: {names}")
            suspects.append(names)
    print(f"\n{len(suspects)} suspected padding duplicate group(s)")
    sys.exit(1 if suspects else 0)


if __name__ == "__main__":
    main()
