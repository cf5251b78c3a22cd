#!/usr/bin/env python3
"""Assemble BENCH_sf1.json — the sf0.1 → sf1 (10x) scale-up evidence
artifact — from four (optionally six) runs:
  Bench      (gate-parameter queries)      at sf0.1 and sf1
  BenchScale (scale-parameter operators)   at sf0.1 and sf1
  Bench subset w*/a*/j* (events family)    at sf0.1 and sf1   [optional]
Usage: python3 tools/mk_bench_sf1.py <bench01> <bench1> <scale01> <scale1>
                                     [<events01> <events1>]
"""
import json
import sys


def ratios(q0, q1):
    out = {}
    for k in q1:
        if k in q0 and q0[k] > 0:
            out[k] = {
                "sf0.1_sec": round(q0[k], 3),
                "sf1_sec": round(q1[k], 3),
                "ratio_at_10x_data": round(q1[k] / q0[k], 2),
            }
    return out


def main():
    # full-suite mode (the standing per-round discipline): rebuild the
    # full_suite_sf1 section from a whole-surface sf0.1 run + sf1 run,
    # DIFFING each query's sf1 seconds against the PREVIOUS round's
    # full_suite_sf1 — a new w23-class superlinearity then surfaces as a
    # flagged `vs_prev` delta needing one line of adjudication, instead
    # of a fresh hand-pass over the same long tail every round.
    #   python3 tools/mk_bench_sf1.py --full-suite <what> <sf01json> <sf1json>
    if sys.argv[1] == "--full-suite":
        what, p01, p1 = sys.argv[2:5]
        artifact = json.load(open("BENCH_sf1.json"))
        prev = artifact.get("full_suite_sf1", {}).get("queries", {})
        b01, b1 = json.load(open(p01)), json.load(open(p1))
        qs = ratios(b01["queries"], b1["queries"])
        flagged, new_queries = [], []
        for k, row in qs.items():
            if k in prev and prev[k].get("sf1_sec", 0) > 0:
                vs = row["sf1_sec"] / prev[k]["sf1_sec"]
                row["vs_prev_sf1"] = round(vs, 2)
                # flag only rows that are BOTH slower than 2x the previous
                # run AND non-trivial in absolute terms (sub-second noise
                # doubles freely under host jitter)
                if vs > 2.0 and row["sf1_sec"] > 1.0:
                    flagged.append(k)
            else:
                new_queries.append(k)
        errs1 = b1.get("errors", {})
        artifact["full_suite_sf1"] = {
            "what": what,
            "sf1_total_sec": round(sum(b1["queries"].values()), 1),
            "n_queries": len(b1["queries"]),
            "errors": errs1,
            "median_ratio_at_10x": round(sorted(
                r["ratio_at_10x_data"] for r in qs.values())[len(qs) // 2], 2),
            "flagged_vs_prev_gt2x": sorted(flagged),
            "new_queries_no_prev_band": sorted(new_queries),
            "queries": qs,
        }
        with open("BENCH_sf1.json", "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"full_suite_sf1 rebuilt: {len(qs)} queries, "
              f"{len(flagged)} flagged >2x vs prev run "
              f"({sorted(flagged)}), {len(new_queries)} new "
              f"({sorted(new_queries)}), errors={errs1}")
        return

    # append mode: add one named family's ratios to the existing artifact
    # without re-running the other four/six benches
    #   python3 tools/mk_bench_sf1.py --append <family_key> <sf01json> <sf1json>
    if sys.argv[1] == "--append":
        key, p01, p1 = sys.argv[2:5]
        artifact = json.load(open("BENCH_sf1.json"))
        b01, b1 = json.load(open(p01)), json.load(open(p1))
        artifact[key] = ratios(b01["queries"], b1["queries"])
        with open("BENCH_sf1.json", "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"appended {key} ({len(artifact[key])} queries) to BENCH_sf1.json")
        return

    b01, b1, s01, s1 = (json.load(open(p)) for p in sys.argv[1:5])

    artifact = {
        "what": "sf0.1 -> sf1 (10x rows: 50k documents, 20k embeddings, "
                "1M events/15k users) scale-up evidence; sf1 corpus is "
                "distribution-matched synthetic (tools/gen_sf1.py), other "
                "tables symlinked from sf0.1",
        "gate_parameter_queries": ratios(b01["queries"], b1["queries"]),
        "scale_parameter_operators": ratios(s01["queries"], s1["queries"]),
        "cells": {"sf0.1": s01["n_cells"], "sf1": s1["n_cells"],
                  "rule": "max(8, n_vectors/256) — bounded cell size"},
        "findings": [
            "documents family (d7/d17/d36/d37/d40/w7): all <= ~6x at 10x "
            "data — no superlinearity; d36 is SUBlinear because the "
            "hot-shingle df cap excludes more of the head at sf1 "
            "(observed, not silent).",
            "e10/e17 with the GATE's pinned 8 centroids go quadratic "
            "(23-26x at 10x): fixed cell count -> cell population grows "
            "linearly -> within-cell pairs grow quadratically. This is "
            "the pinned oracle parameter, not the operator: with the "
            "scale rule (cells = n/256, bounded cell size) the same "
            "operators run 4.4x / 2.8x at 10x data — sublinear. A 100 TB "
            "deployment must scale nCells with the corpus (SemDeDup / "
            "FAISS IVF guidance); the operator API takes centroids as an "
            "input precisely so callers own that choice.",
        ],
    }
    if len(sys.argv) > 6:
        e01, e1 = (json.load(open(p)) for p in sys.argv[5:7])
        artifact["events_family_10x"] = ratios(e01["queries"], e1["queries"])
    with open("BENCH_sf1.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote BENCH_sf1.json")


if __name__ == "__main__":
    main()
