#!/usr/bin/env python3
"""Overlay fresh round-N sf10 sweep verdicts onto the previous
round's SF10_ORACLE file (the carry-forward convention: a key whose
engine plan AND oracle are unchanged keeps its prior verdict; every
changed/added key carries a fresh `swept:rN` verdict).

Usage: python3 tools/merge_sf10_oracle.py \
         --base=SF10_ORACLE_r09.json \
         --full=full.out --sampled=sampled.out \
         --tag=r10 --out=SF10_ORACLE_r10.json --note="..."
Where full.out / sampled.out are compare.py stdouts at the full-sf10
and sampled-twin tiers (only the freshly swept keys are read).
"""
import json
import re
import sys


def parse(path):
    out = {}
    pat = re.compile(r"^\[(PASS|FAIL|rows)\] (\S+): (.*)$")
    if not path:
        return out
    for line in open(path, encoding="utf-8"):
        m = pat.match(line.rstrip())
        if not m:
            continue
        mark, key, detail = m.groups()
        if detail.startswith("NO_SPARK_OUTPUT"):
            continue
        out[key] = (mark, detail[:300])
    return out


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    base = json.load(open(args["--base"], encoding="utf-8"))
    per_key = dict(base["per_key"])
    tag = args.get("--tag", "rN")
    for path, tier in ((args.get("--full"), "full_sf10"),
                       (args.get("--sampled"), "sampled_sf10s")):
        for key, (mark, detail) in parse(path).items():
            # full-tier verdict wins over sampled for the same key —
            # regardless of mark: a fresh full_sf10 FAIL must NOT be
            # overwritten by a later-parsed sampled-tier PASS.
            if (tier == "sampled_sf10s" and key in per_key
                    and per_key[key].get("detail", "").endswith(
                        f"swept:{tag}")
                    and per_key[key]["tier"] == "full_sf10"):
                continue
            per_key[key] = {"tier": tier, "verdict": mark,
                            "detail": f"{detail} swept:{tag}"}
    n_pass = sum(1 for v in per_key.values() if v["verdict"] == "PASS")
    doc = {
        "n_keys": len(per_key),
        "n_pass": n_pass,
        "n_full_sf10_pass": sum(1 for v in per_key.values()
                                if v["verdict"] == "PASS"
                                and v["tier"] == "full_sf10"),
        "n_sampled_pass": sum(1 for v in per_key.values()
                              if v["verdict"] == "PASS"
                              and v["tier"] == "sampled_sf10s"),
        "note": args.get("--note", ""),
        "per_key": per_key,
    }
    out = args.get("--out", "/root/repo/SF10_ORACLE.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=1)
    print(f"{n_pass}/{len(per_key)} pass -> {out}")


if __name__ == "__main__":
    main()
