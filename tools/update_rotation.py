#!/usr/bin/env python
"""Per-round rotation bookkeeping (see queries/rotation.py).

Usage: python tools/update_rotation.py CORRECTNESS_r03.json 3

Prints the ``CHECKED_BY_ROUND[N]`` frozenset literal for the GREEN rows
of a driver correctness file (hash_match true, or rows-only-by-design:
spark_rows present with err == 'no_oracle'). RED rows are excluded so
they re-front next round — paste the output into queries/rotation.py and
clear any CHANGED_SINCE_CHECK entries that went green.
"""

from __future__ import annotations

import json
import sys
import textwrap


def green_names(correctness: dict) -> list[str]:
    out = []
    for name, row in correctness.items():
        if row.get("hash_match") is True:
            out.append(name)
        elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
            out.append(name)  # rows-only by design
    return sorted(out)


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    path, round_no = sys.argv[1], int(sys.argv[2])
    with open(path) as f:
        data = json.load(f)
    names = green_names(data)
    red = sorted(set(data) - set(names))
    body = ", ".join(f'"{n}"' for n in names)
    print(f"# Keys of {path} whose row was GREEN ({len(names)}/{len(data)})")
    if red:
        print(f"# excluded (red/failed, will re-front): {', '.join(red)}")
    print(f"_ROUND_{round_no} = frozenset({{")
    print(textwrap.fill(body, width=74, initial_indent="    ", subsequent_indent="    "))
    print("})")
    print(f"# then: CHECKED_BY_ROUND[{round_no}] = _ROUND_{round_no}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
