#!/usr/bin/env python3
"""Build BENCH_HISTORY.json — the machine-readable per-round bench ledger
(round-13 verdict item 7): one row per driver artifact BENCH_r{N}.json
with the canary posture, headline total, and the key lanes, so
canary-scaled cross-round comparisons are COMPUTED from the record
instead of hand-quoted out of PLANS.md prose.

The driver artifacts only keep the TAIL of the bench stdout, which often
truncates the front of the JSON line — the scraper therefore recovers
whatever "key":value pairs survive in the fragment (the canary stats and
most x_* lanes sit late in the JSON and usually survive; the headline
value sits first and is lost on truncated rounds). Rows are stamped
partial=true when the full JSON could not be parsed.

Usage: python3 tools/bench_history.py [repo_root]  (writes
<repo_root>/BENCH_HISTORY.json)
"""
import json
import glob
import os
import re
import sys

KEY_LANES = [
    "x10_exact_mrows_per_sec", "x_canary_median_mrows",
    "x_canary_worst_mrows", "x_canary_best_mrows", "x_canary_flagged",
    "x_redeemed_probes", "x_redemption_rejected_probes", "x_dirty_probes",
    "x_unijoin60_exact_sec", "x_unijoin60_sampled_sec",
    "x_unijoin60_speedup", "x_priority60_topk_sec", "x_priority_topk_sec",
    "x_skew_plain_sec", "x_skew_salted_sec", "x_argmax_join_sec",
    "x_q35_10x_sec", "x_q20_60m_sec", "x_dedup10x_neardup_sec",
    "x_dedup10x_pairs_sec", "x_grouped_ladder_1m_groups_sec",
    "x_layout_clustered_sec", "x_layout_speedup", "x_pipeline_sec",
    "x_state_compaction_speedup", "x_reliable_ckpt_overhead",
    "x_ann_ivf_recall", "x_ann_lsh_recall", "x_ann_ivf_int8_recall",
    "x_ann_index_bytes_shrink", "x_loadavg_start", "x_unstable_reruns",
]


def scrape(tail):
    """Recover key:number pairs from a (possibly truncated) JSON tail."""
    out = {}
    for k, v in re.findall(r'"([A-Za-z0-9_]+)":(-?\d+(?:\.\d+)?)', tail):
        out[k] = float(v)
    lists = {}
    for k in ("unstable", "canary_flagged", "redeemed"):
        m = re.search(r'"%s":\[([^\]]*)\]' % k, tail)
        if m:
            lists[k] = [s.strip('"') for s in m.group(1).split(",") if s.strip()]
    return out, lists


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    hist = []
    files = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")),
                   key=lambda x: int(re.search(r"\d+", os.path.basename(x)).group()))
    for f in files:
        d = json.load(open(f))
        obj = d.get("parsed")
        tail = d.get("tail", "") or ""
        if obj is None:
            m = re.search(r'\{"metric":"headline_total".*\}', tail)
            if m:
                try:
                    obj = json.loads(m.group())
                except json.JSONDecodeError:
                    obj = None
        row = {"round": d.get("n"), "source": os.path.basename(f),
               "sf": d.get("sf")}
        if obj is not None:
            row["partial"] = False
            row["headline_total_sec"] = obj.get("value")
            row["polluted"] = obj.get("polluted")
            for k in ("unstable", "canary_flagged", "redeemed"):
                if obj.get(k) is not None:
                    row[k] = obj[k]
            q = obj.get("queries", {})
            for k in KEY_LANES:
                if k in q:
                    row[k] = q[k]
        else:
            row["partial"] = True
            vals, lists = scrape(tail)
            row.update(lists)
            for k in KEY_LANES:
                if k in vals:
                    row[k] = vals[k]
        hist.append(row)
    out = os.path.join(root, "BENCH_HISTORY.json")
    with open(out, "w") as fh:
        json.dump({"comment": "per-round driver bench ledger; see "
                              "tools/bench_history.py (partial=true rows "
                              "were scraped from truncated stdout tails)",
                   "rounds": hist}, fh, indent=1)
        fh.write("\n")
    print("wrote %s (%d rounds, %d partial)" %
          (out, len(hist), sum(1 for r in hist if r.get("partial"))))


if __name__ == "__main__":
    main()
