"""Summarize regen-sweep result JSONs: table sorted by val_best."""
import json
import sys

for path in sys.argv[1:]:
    with open(path) as f:
        res = json.load(f)
    rows = []
    for name, rec in res.items():
        if "metrics" not in rec:
            rows.append((name, None, rec.get("error", "?")))
            continue
        m = rec["metrics"]
        rows.append((name, m.get("val_best"), m.get("ndcg@20"),
                     m.get("recall@20"), rec.get("wall_s")))
    rows.sort(key=lambda r: (r[1] is None, -(r[1] or 0)))
    print(f"\n== {path}")
    for r in rows:
        if r[1] is None:
            print(f"  {r[0]:45s} ERROR {r[2]}")
        else:
            print(f"  {r[0]:45s} val {r[1]:.4f}  test-n20 {r[2]:.4f}  "
                  f"r20 {r[3]:.4f}  {r[4]:.0f}s")
