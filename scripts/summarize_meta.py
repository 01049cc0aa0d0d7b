"""Summarize the DR4SR+ meta-hyperparameter sweep (results_meta_sweep.json):
one row per override set, sorted by val_best, with the plain-regen SASRec band
for reference (VERDICT r1 #2: MetaModel(SASRec) must beat plain regen).

  python scripts/summarize_meta.py [results_meta_sweep.json]
"""

import json
import re
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "results_meta_sweep.json"
    with open(path) as f:
        res = json.load(f)

    rows = []
    for key, rec in res.items():
        ov = (re.search(r"\[(.*)\]$", key) or [None, ""])[1]
        ov = ",".join(o for o in ov.split(",") if not o.startswith("model.sub_model"))
        if "metrics" not in rec:
            rows.append((None, None, ov or "(defaults)", rec.get("error", "?")))
            continue
        m = rec["metrics"]
        rows.append((m.get("val_best"), m.get("ndcg@20"), ov or "(defaults)", None))
    rows.sort(key=lambda r: (r[0] is None, -(r[0] or 0)))

    print("# DR4SR+ (MetaModel/SASRec, toys regen) meta-hyperparameter sweep\n")
    print("| overrides | val best | test NDCG@20 |")
    print("|---|---|---|")
    for val, test, ov, err in rows:
        if val is None:
            print(f"| `{ov}` | ERROR | {err} |")
        else:
            print(f"| `{ov}` | {val:.4f} | {test:.4f} |")
    print("\nPlain-regen SASRec comparison band: see the toys rows of the")
    print("round-2 confirmation suite (RESULTS_R2_CONFIRM.md) under the same")
    print("protocol; round-1 band was 0.0444±0.0006 (4 seeds, old protocol).")


if __name__ == "__main__":
    main()
