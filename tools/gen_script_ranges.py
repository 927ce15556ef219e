#!/usr/bin/env python3
"""Generate mapreduce_spark/functions/_script_ranges.py from the
JDK's ``java.lang.Character.UnicodeScript`` table (public Unicode
Character Database data as shipped in the Java standard library —
JDK 17 carries Unicode 13.0).

Why generated-and-committed rather than derived at import time: the
interpreter tier runs on executors as pure Python (no JVM handle),
and Python's stdlib ``unicodedata`` does not expose the Script
property.  A compact committed table keeps \\p{Script=…} available
everywhere without a UCD download or a new dependency.

Rerun (requires a JDK on PATH):

    python tools/gen_script_ranges.py

Scripts included: the majors a text-processing ddoc actually matches
on (CJK, the Indic family, Middle-Eastern, European) plus Common /
Inherited, which JS exposes and which differential tests need.  The
rest of the ~160 UCD scripts stay loud in jsregex (outside-the-subset
error), never approximated.
"""

import subprocess
import sys
import tempfile
from pathlib import Path

# long UCD name -> tuple of accepted aliases (ISO 15924 code first);
# JS accepts both in \p{Script=…} / \p{sc=…}
SCRIPTS = {
    "LATIN": ("Latn",),
    "GREEK": ("Grek",),
    "CYRILLIC": ("Cyrl",),
    "ARABIC": ("Arab",),
    "HEBREW": ("Hebr",),
    "HAN": ("Hani",),
    "HIRAGANA": ("Hira",),
    "KATAKANA": ("Kana",),
    "HANGUL": ("Hang",),
    "THAI": ("Thai",),
    "DEVANAGARI": ("Deva",),
    "BENGALI": ("Beng",),
    "TAMIL": ("Taml",),
    "TELUGU": ("Telu",),
    "KANNADA": ("Knda",),
    "MALAYALAM": ("Mlym",),
    "GUJARATI": ("Gujr",),
    "GURMUKHI": ("Guru",),
    "ORIYA": ("Orya",),
    "SINHALA": ("Sinh",),
    "MYANMAR": ("Mymr",),
    "KHMER": ("Khmr",),
    "LAO": ("Laoo",),
    "GEORGIAN": ("Geor",),
    "ARMENIAN": ("Armn",),
    "ETHIOPIC": ("Ethi",),
    "COMMON": ("Zyyy",),
    "INHERITED": ("Zinh", "Qaai"),
}

JAVA_SRC = """
public class DumpScripts {
    public static void main(String[] args) {
        String prev = null;
        int start = 0;
        for (int cp = 0; cp <= 0x10FFFF; cp++) {
            String s;
            try {
                s = Character.UnicodeScript.of(cp).name();
            } catch (IllegalArgumentException e) {
                s = "UNKNOWN";
            }
            if (!s.equals(prev)) {
                if (prev != null)
                    System.out.println(prev + " " + start + " " + (cp - 1));
                prev = s;
                start = cp;
            }
        }
        System.out.println(prev + " " + start + " " + 0x10FFFF);
    }
}
"""


def main() -> None:
    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "DumpScripts.java"
        src.write_text(JAVA_SRC)
        subprocess.run(["javac", str(src)], check=True, cwd=td)
        out = subprocess.run(
            ["java", "DumpScripts"], check=True, cwd=td,
            capture_output=True, text=True,
        ).stdout
    ranges: dict = {name: [] for name in SCRIPTS}
    for line in out.splitlines():
        name, a, b = line.split()
        if name in ranges:
            ranges[name].append((int(a), int(b)))
    unicode_ver = subprocess.run(
        ["java", "-XshowSettings:properties", "-version"],
        capture_output=True, text=True,
    )
    dest = (Path(__file__).resolve().parent.parent
            / "mapreduce_spark" / "functions" / "_script_ranges.py")
    with dest.open("w") as fh:
        fh.write('"""Unicode Script property ranges — GENERATED, do '
                 "not edit.\n\nSource: java.lang.Character.UnicodeScript"
                 " (JDK 17 == Unicode 13.0),\ndumped by tools/"
                 "gen_script_ranges.py.  Keys are UPPERCASE long\n"
                 "UCD script names; values are inclusive code-point "
                 'ranges.\n"""\n\n')
        fh.write("ALIASES = {\n")
        for name, aliases in sorted(SCRIPTS.items()):
            for al in aliases:
                fh.write(f"    {al.upper()!r}: {name!r},\n")
        fh.write("}\n\nRANGES = {\n")
        for name in sorted(SCRIPTS):
            rs = ranges[name]
            fh.write(f"    {name!r}: (\n")
            for i in range(0, len(rs), 4):
                row = ", ".join(f"({a}, {b})" for a, b in rs[i:i + 4])
                fh.write(f"        {row},\n")
            fh.write("    ),\n")
        fh.write("}\n")
    n = sum(len(v) for v in ranges.values())
    print(f"wrote {dest} ({len(SCRIPTS)} scripts, {n} ranges)")


if __name__ == "__main__":
    main()
