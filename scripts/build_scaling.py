"""Build SCALING_r19.json (VERDICT r18 item 7): per-key 8-vs-32-core
bench table from two bench_full.json-shaped files captured back-to-back
in the same session window.

Usage: python scripts/build_scaling.py <c32.json> <c8.json> [out.json]

ratio = t8 / t32 — >1 means the key got slower with fewer cores
(parallel work), ~1 means core-count-insensitive (fixed cost), <1 means
the key is actively HURT by more cores (scheduler/round-trip bound).
Cross-run phase drift applies uniformly; the RANKING of ratios is the
signal, per-key absolute ratios carry the usual ±35% caveat.
"""

import json
import sys


def main() -> None:
    c32 = json.load(open(sys.argv[1]))
    c8 = json.load(open(sys.argv[2]))
    out_path = sys.argv[3] if len(sys.argv) > 3 else "SCALING_r19.json"
    q32, q8 = c32["queries"], c8["queries"]
    per_key = {
        k: {
            "c32_s": q32[k],
            "c8_s": q8[k],
            "ratio_8_over_32": round(q8[k] / q32[k], 3) if q32[k] > 0 else None,
        }
        for k in sorted(set(q32) & set(q8))
        if q32[k] >= 0 and q8[k] >= 0
    }
    ranked = sorted(
        (k for k in per_key if per_key[k]["ratio_8_over_32"] is not None),
        key=lambda k: per_key[k]["ratio_8_over_32"],
    )
    payload = {
        "cpus_main": 32,
        "cpus_low": 8,
        "total_c32_s": c32["value"],
        "total_c8_s": c8["value"],
        "n_keys": len(per_key),
        "worst_scaling_low_ratio": {
            k: per_key[k] for k in ranked[:10]
        },
        "best_scaling_high_ratio": {
            k: per_key[k] for k in ranked[-10:]
        },
        "per_key": per_key,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=False)
    print(f"wrote {out_path}: {len(per_key)} keys, "
          f"c32 {c32['value']}s vs c8 {c8['value']}s")
    for k in ranked[:10]:
        d = per_key[k]
        print(f"  low-ratio {d['ratio_8_over_32']:6.3f}  "
              f"{d['c32_s']:7.2f}s@32 {d['c8_s']:7.2f}s@8  {k}")


if __name__ == "__main__":
    main()
