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


def expected_irreducible_edges(named_reads, min_overlap, rc=True):
    """Brute-force the DEFAULT (irreducible) mode ED record strings.

    Encodes the reference IrreducibleBlockListExtractor semantics
    (/root/reference/src/overlap_builder.cpp:706-836) directly on strings,
    independent of any FM-index machinery: per query A and direction, a
    candidate target B (overlap length o, extension string rest_B = what
    follows the overlap in B, written in A's rightward/leftward direction)
    is irreducible iff NO candidate C of the same direction with a longer
    overlap has rest_C a proper prefix of rest_B — such a C makes B
    reachable through C (the lockstep extension keeps B in C's group until
    C terminates, then drops the group).  Candidates of both strand classes
    of a direction share the group space, exactly like the joined
    suffixfwd+suffixrev / prefixfwd+prefixrev lists (overlap_builder.cpp:
    1165-1173).

    Assumes rmdup'd input: no read is a substring of another and no two
    reads are equal (the reference aborts such reads during extraction).
    """
    out = []
    items = list(named_reads.items())

    def emit(qn, q, tn, t, cls, o):
        lq, lt = len(q), len(t)
        if cls == "SP":
            c1 = (lq - o, lq - 1, lq)
            c2 = (0, o - 1, lt)
            is_rc, qr = 0, False
        elif cls == "PP":
            c1 = (0, o - 1, lq)
            c2 = (0, o - 1, lt)
            is_rc, qr = 1, True
        elif cls == "PS":
            c1 = (0, o - 1, lq)
            c2 = (lt - o, lt - 1, lt)
            is_rc, qr = 0, True
        else:  # SS
            c1 = (lq - o, lq - 1, lq)
            c2 = (lt - o, lt - 1, lt)
            is_rc, qr = 1, False
        contained = (c1[0] == 0 and c1[1] + 1 == lq) or (
            c2[0] == 0 and c2[1] + 1 == lt
        )
        if qn < tn or (contained and qr):
            return
        out.append(
            f"{qn} {tn} {c1[0]} {c1[1]} {c1[2]} {c2[0]} {c2[1]} {c2[2]} {is_rc} 0"
        )

    for qn, q in items:
        lq = len(q)
        # direction -> list of (overlap_len, rest, tn, cls)
        # rest is written in the query's extension direction: rightward for
        # the suffix direction, leftward (reversed) for the prefix direction
        for direction in ("suffix", "prefix"):
            cands = []
            for tn, t in items:
                if tn == qn:
                    continue
                lt = len(t)
                for o in range(min_overlap, min(lq - 1, lt) + 1):
                    if direction == "suffix":
                        # SP: suffix(A) = prefix(B), B extends right
                        if q[lq - o :] == t[:o]:
                            cands.append((o, t[o:], tn, "SP"))
                        # SS: suffix(A) = rc of suffix(B): B' = rc(B)
                        if rc and q[lq - o :] == revcomp(t[lt - o :]):
                            cands.append((o, revcomp(t[: lt - o]), tn, "SS"))
                    else:
                        # PS: prefix(A) = suffix(B), B extends left; rest
                        # reversed so prefix comparisons are left-extensions
                        if q[:o] == t[lt - o :]:
                            cands.append((o, t[: lt - o][::-1], tn, "PS"))
                        # PP: prefix(A) = rc of prefix(B)
                        if rc and q[:o] == revcomp(t[:o]):
                            cands.append((o, revcomp(t[o:])[::-1], tn, "PP"))
            # keep only the longest overlap per (target, class): the
            # submaximal filter resolves shorter same-pair overlaps
            best = {}
            for o, rest, tn, cls in cands:
                key = (tn, cls)
                if key not in best or best[key][0] < o:
                    best[key] = (o, rest, tn, cls)
            cands = sorted(best.values(), key=lambda x: -x[0])
            for o, rest, tn, cls in cands:
                covered = False
                for o2, rest2, tn2, cls2 in cands:
                    if o2 > o and len(rest2) < len(rest) and rest.startswith(rest2):
                        covered = True
                        break
                if not covered:
                    emit(qn, q, tn, dict(items)[tn], cls, o)
    return sorted(out)


def naive_contigs(named_reads, edge_lines):
    """Brute-force contig walker: unbranched-chain merging on an oracle edge
    set, independent of the production Bigraph machinery.

    Encodes the reference semantics of `Bigraph::simplify` + `FastaVisitor`
    (/root/reference/src/bigraph.cpp:341-414, src/assembler.cpp:95-241): a
    link between two read-ends is merged iff BOTH ends have degree exactly
    one; maximal chains of mergeable links become contigs, everything else
    is emitted unmerged.  Edges are the ED record strings produced by
    `expected_irreducible_edges`/`expected_exhaustive_edges`
    ("id1 id2 s1 e1 l1 s2 e2 l2 rc nd").  Containment records are rejected
    (rmdup'd input assumed).  Cyclic chains are not handled (use linear test
    genomes).

    Returns the contig strings canonicalized as min(c, revcomp(c)), sorted.
    """
    # per-(read, end) adjacency; end 'E' = suffix side, 'B' = prefix side
    adj = {}
    for name in named_reads:
        adj[(name, "B")] = []
        adj[(name, "E")] = []

    def end_of(s, e, length):
        assert not (s == 0 and e == length - 1), "containment edge in oracle set"
        return "E" if s > 0 else "B"

    for line in edge_lines:
        f = line.split()
        id1, id2 = f[0], f[1]
        s1, e1, l1, s2, e2, l2, rc = (int(x) for x in f[2:9])
        ov = e1 - s1 + 1
        end1, end2 = end_of(s1, e1, l1), end_of(s2, e2, l2)
        adj[(id1, end1)].append((id2, end2, ov, rc))
        adj[(id2, end2)].append((id1, end1, ov, rc))

    def usable(a_key, link):
        b_key = (link[0], link[1])
        return len(adj[a_key]) == 1 and len(adj[b_key]) == 1

    def oriented(name, reverse):
        s = named_reads[name]
        return revcomp(s) if reverse else s

    visited = set()
    contigs = []
    for start in named_reads:
        if start in visited:
            continue
        # find a terminus orientation: an end with no usable exit link
        exit_e = adj[(start, "E")]
        exit_b = adj[(start, "B")]
        e_usable = len(exit_e) == 1 and usable((start, "E"), exit_e[0])
        b_usable = len(exit_b) == 1 and usable((start, "B"), exit_b[0])
        if e_usable and b_usable:
            continue  # interior of a chain; reached from its terminus
        visited.add(start)
        # orient so the usable link (if any) is on the right
        if e_usable:
            cur, rev = start, False
        elif b_usable:
            cur, rev = start, True
        else:
            contigs.append(named_reads[start])
            continue
        contig = oriented(cur, rev)
        while True:
            right_end = "B" if rev else "E"
            links = adj[(cur, right_end)]
            if len(links) != 1 or not usable((cur, right_end), links[0]):
                break
            nxt, enter_end, ov, rc = links[0]
            assert nxt not in visited, "cyclic chain in oracle contig walker"
            visited.add(nxt)
            rev = enter_end == "E"
            contig += oriented(nxt, rev)[ov:]
            cur = nxt
        contigs.append(contig)
    # interior-only components are cycles (unsupported) or already covered
    assert visited == set(named_reads), "cyclic chain in oracle contig walker"
    return sorted(min(c, revcomp(c)) for c in contigs)
