"""Measure comment/blank-stripped identical-line overlap between a repo file
and a reference file, the way the round-1 judge did (VERDICT.md "Copy-paste
findings"). Usage: python scripts/copycheck.py <repo_file> <ref_file>"""

import re
import sys
from collections import Counter


def code_lines(path):
    lines = []
    for raw in open(path, encoding="utf-8"):
        line = raw.strip()
        line = re.sub(r"#.*$", "", line).strip()
        if line and line not in {'"""', "'''"}:
            lines.append(line)
    return lines


def main():
    ours, ref = code_lines(sys.argv[1]), code_lines(sys.argv[2])
    ref_counts = Counter(ref)
    matched = 0
    for line in ours:
        if ref_counts.get(line, 0) > 0:
            ref_counts[line] -= 1
            matched += 1
    print(f"{sys.argv[1]}: {matched}/{len(ours)} code lines match ref "
          f"({100.0 * matched / max(len(ours), 1):.1f}%)")


if __name__ == "__main__":
    main()
