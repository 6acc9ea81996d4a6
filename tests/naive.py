"""Naive reference implementations used to cross-check the real ones.

Deliberately simple and slow; these encode the reference semantics directly
(distinct-sentinel multi-string suffix order, inclusive occ counts, brute-force
suffix-prefix overlaps) so the production implementations can be validated on
randomized small instances.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

RANK = {"$": 0, "A": 1, "C": 2, "G": 3, "T": 4}


def naive_suffix_array(seqs: Sequence[str]) -> Tuple[List[int], str]:
    """Suffix array of reads concatenated with per-read sentinels, where the
    t-th sentinel is a distinct symbol smaller than all bases, ordered by t.
    Returns (sa, text) with '$' for sentinels in text."""
    text = "".join(s + "$" for s in seqs)
    n = len(text)

    def key(i: int):
        # map each char to a sortable tuple; sentinel at position p -> (0, p)
        out = []
        for j in range(i, n):
            c = text[j]
            if c == "$":
                out.append((0, j))
                break  # distinct sentinel fully resolves the comparison
            out.append((RANK[c], -1))
        return out

    sa = sorted(range(n), key=key)
    return sa, text


def naive_bwt(seqs: Sequence[str]) -> str:
    sa, text = naive_suffix_array(seqs)
    out = []
    for i in sa:
        c = "$" if i == 0 else text[i - 1]
        out.append(c)
    return "".join(out)


def naive_occ(bwt: str, c: str, i: int) -> int:
    """Inclusive count of c in bwt[0..i]; occ(c, -1) == 0."""
    if i < 0:
        return 0
    return bwt[: i + 1].count(c)


def naive_occurrences(seqs: Sequence[str], w: str) -> int:
    """Number of occurrences of w as a substring across all reads."""
    total = 0
    for s in seqs:
        for i in range(len(s) - len(w) + 1):
            if s[i : i + len(w)] == w:
                total += 1
    return total


def revcomp(s: str) -> str:
    m = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(m[c] for c in reversed(s))


def expected_exhaustive_edges(named_reads, min_overlap, rc=True):
    """Brute-force the exhaustive-mode ED record strings.

    Per (query, target, orientation-class) only the longest overlap length
    survives (the submaximal filter keeps the longest per SA row); emission
    follows the converter's dedup rule: skip when id1 < id2 or (containment
    and query-reversed).  Assumes no read is a strict substring of another.
    """
    out = []
    items = list(named_reads.items())
    for qn, q in items:
        for tn, t in items:
            if tn == qn:
                continue
            lq, lt = len(q), len(t)
            # class -> (condition(o), qr)
            classes = [
                ("SP", lambda o: q[lq - o :] == t[:o], False),
                ("PS", lambda o: q[:o] == t[lt - o :], True),
            ]
            if rc:
                classes += [
                    ("PP", lambda o: revcomp(q[:o]) == t[:o], True),
                    ("SS", lambda o: revcomp(q[lq - o :]) == t[lt - o :], False),
                ]
            for cls, cond, qr in classes:
                omax = 0
                for o in range(min_overlap, min(lq - 1, lt) + 1):
                    if cond(o):
                        omax = o
                if not omax:
                    continue
                o = omax
                if cls == "SP":
                    c1 = (lq - o, lq - 1, lq)
                    c2 = (0, o - 1, lt)
                    is_rc = 0
                elif cls == "PP":
                    c1 = (0, o - 1, lq)
                    c2 = (0, o - 1, lt)
                    is_rc = 1
                elif cls == "PS":
                    c1 = (0, o - 1, lq)
                    c2 = (lt - o, lt - 1, lt)
                    is_rc = 0
                else:  # SS
                    c1 = (lq - o, lq - 1, lq)
                    c2 = (lt - o, lt - 1, lt)
                    is_rc = 1
                contained = (c1[0] == 0 and c1[1] + 1 == lq) or (
                    c2[0] == 0 and c2[1] + 1 == lt
                )
                if qn < tn or (contained and qr):
                    continue
                out.append(
                    f"{qn} {tn} {c1[0]} {c1[1]} {c1[2]} {c2[0]} {c2[1]} {c2[2]} {is_rc} 0"
                )
    return sorted(out)
