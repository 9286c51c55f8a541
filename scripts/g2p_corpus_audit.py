"""Corpus-level G2P divergence audit (round-2 VERDICT item 7).

Runs text/g2p_ko.py over the stratified sample in
tests/goldens/g2p_corpus_sample.tsv (hand-audited standard pronunciations,
'|'-separated admitted variants) and prints the per-rule-class divergence
rate plus every mismatch. The per-class numbers go into PARITY.md.

Reference counterpart: g2pk2 inside get_g2p()
(/root/reference/src/f5_tts/model/utils.py:160-166).
"""

import os
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from korean_f5_tts_tpu.text.g2p_ko import g2p  # noqa: E402

SAMPLE = os.path.join(ROOT, "tests", "goldens", "g2p_corpus_sample.tsv")


def main(show_all=False):
    per_class = defaultdict(lambda: [0, 0])  # class -> [n, mismatches]
    mismatches = []
    for line in open(SAMPLE, encoding="utf-8"):
        if not line.strip() or line.startswith("#"):
            continue
        cls, text, expected = line.rstrip("\n").split("\t")
        got = g2p(text)
        ok = got in expected.split("|")
        per_class[cls][0] += 1
        per_class[cls][1] += 0 if ok else 1
        if not ok:
            mismatches.append((cls, text, expected, got))

    total_n = sum(v[0] for v in per_class.values())
    total_m = sum(v[1] for v in per_class.values())
    print(f"{'class':<12} {'n':>4} {'diverge':>8} {'rate':>7}")
    for cls in sorted(per_class):
        n, m = per_class[cls]
        print(f"{cls:<12} {n:>4} {m:>8} {m / n:>6.1%}")
    print(f"{'TOTAL':<12} {total_n:>4} {total_m:>8} {total_m / total_n:>6.1%}")
    print()
    for cls, text, expected, got in mismatches:
        print(f"[{cls}] {text}\n   want: {expected}\n   got:  {got}")
    return total_m, total_n


if __name__ == "__main__":
    main()
