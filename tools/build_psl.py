"""Regenerate tspider_spark/functions/psl_rules.txt from a Mozilla
public_suffix_list.dat (https://publicsuffix.org/list/ — public data,
MPL-2.0; the reference bundles the same list at
core/utils/public_suffix_list.dat and resolves registered domains with
it via the `publicsuffix` package, url.py:28,74-76).

The output is the semantic rule set only: comments and blank lines
stripped, rules sorted, one per line, in PSL syntax (`foo.bar`,
`*.foo`, `!foo.bar`). Both the ICANN and PRIVATE sections are kept —
that matches the `publicsuffix` package, which does not distinguish
sections.
"""

from __future__ import annotations

import sys
from pathlib import Path

DEFAULT_SRC = "/root/reference/core/utils/public_suffix_list.dat"
OUT = Path(__file__).resolve().parent.parent / "tspider_spark/functions/psl_rules.txt"


def main():
    src = Path(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC)
    rules = []
    for line in src.read_text(encoding="utf-8").splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        rules.append(line.lower())
    header = (
        "// Public Suffix List rules (https://publicsuffix.org/list/, MPL-2.0).\n"
        "// Comments stripped, rules sorted; regenerate: python tools/build_psl.py\n"
    )
    OUT.write_text(
        header + "\n".join(sorted(set(rules))) + "\n", encoding="utf-8"
    )
    print(f"{len(set(rules))} rules -> {OUT}")


if __name__ == "__main__":
    main()
