"""Print the driver-certification state of every queries() key.

The round driver only evaluates the FIRST 50 `_QUERIES` entries per
round (see SURVEY §7 front-window notes), so each session should move
never-certified keys to the front. This tool unions the green rows of
every CORRECTNESS_r*.json and reports which keys still need a row.

Usage: python tools/certified.py [--uncertified-only]
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E


def green(v: dict) -> bool:
    # rows-only (no-oracle) keys record rows/schema/hash as None with
    # err == 'no_oracle' and a spark_rows count — that IS their green row
    if v.get("err") == "no_oracle":
        return v.get("spark_rows") is not None
    return bool(
        v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
    )


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    certified: set[str] = set()
    for path in sorted(glob.glob(f"{root}/CORRECTNESS_r*.json")):
        with open(path) as f:
            data = json.load(f)
        if isinstance(data, dict):
            certified |= {k for k, v in data.items() if isinstance(v, dict) and green(v)}
    keys = list(E.queries())
    uncert = [k for k in keys if k not in certified]
    only = "--uncertified-only" in sys.argv
    if not only:
        print(f"total keys: {len(keys)}  certified: {len(certified & set(keys))}  "
              f"uncertified: {len(uncert)}")
        print(f"front window (first 50) uncertified: "
              f"{sum(1 for k in keys[:50] if k not in certified)}/50")
    for k in uncert:
        print(k)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
