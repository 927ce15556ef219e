#!/usr/bin/env python3
"""Generate mapreduce_spark/functions/_scx_ranges.py — the Unicode
Script_Extensions (scx) property ranges for the same 28 major scripts
as the Script table (_script_ranges.py).

Source: the ``regex`` package's bundled Unicode Character Database
tables (public UCD data; the package ships full property tables
including Script_Extensions, which neither the JDK's
``Character.UnicodeScript`` nor Python's ``unicodedata`` expose).
The generator scans every code point once per script with a compiled
``\\p{scx=…}`` pattern over the full code-point string — C-speed
finditer, a few seconds total — and merges hits into inclusive
ranges.

Version note: the Script table is generated from JDK 17 (Unicode
13.0) while the ``regex`` package tracks a newer UCD; the few
boundary code points that moved between versions differ accordingly.
scx ⊇ sc holds per UCD semantics within one version; across the two
tables a handful of newly-assigned code points appear in scx only —
harmless for the matching use case (both are faithful UCD snapshots).

Rerun:  python tools/gen_scx_ranges.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import regex

    from mapreduce_spark.functions import _script_ranges as S

    # one string holding every code point; index == code point
    all_cps = "".join(map(chr, range(0x110000)))
    out: dict[str, list[tuple[int, int]]] = {}
    # note: COMMON/INHERITED are generated like any script —
    # \p{scx=Common} is valid JS and resolves to the chars whose scx
    # set is exactly {Zyyy}/{Zinh} (strictly smaller than sc=Common:
    # a char with real extensions leaves the set), which is what the
    # regex package computes too
    for name in sorted(S.RANGES):
        pat = regex.compile(rf"\p{{scx={name}}}")
        ranges: list[tuple[int, int]] = []
        for m in pat.finditer(all_cps):
            lo, hi = m.start(), m.end() - 1
            if ranges and ranges[-1][1] + 1 == lo:
                ranges[-1] = (ranges[-1][0], hi)
            else:
                ranges.append((lo, hi))
        out[name] = ranges

    dest = (Path(__file__).resolve().parent.parent
            / "mapreduce_spark" / "functions" / "_scx_ranges.py")
    with open(dest, "w") as f:
        f.write('"""Unicode Script_Extensions ranges — GENERATED, '
                "do not edit.\n\n"
                "Source: the ``regex`` package's bundled UCD tables, "
                "dumped by\ntools/gen_scx_ranges.py.  Same key scheme "
                "as _script_ranges.py\n(UPPERCASE long script names; "
                "ALIASES shared from that module).\n"
                '"""\n\n')
        f.write("SCX_RANGES = {\n")
        for name, ranges in out.items():
            f.write(f"    {name!r}: (\n")
            line = "        "
            for lo, hi in ranges:
                piece = f"({lo:#x}, {hi:#x}), "
                if len(line) + len(piece) > 76:
                    f.write(line.rstrip() + "\n")
                    line = "        "
                line += piece
            if line.strip():
                f.write(line.rstrip() + "\n")
            f.write("    ),\n")
        f.write("}\n")
    n = sum(len(v) for v in out.values())
    print(f"wrote {dest} ({len(out)} scripts, {n} ranges)")


if __name__ == "__main__":
    main()
