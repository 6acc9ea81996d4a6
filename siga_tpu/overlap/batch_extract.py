"""Batched irreducible-block extraction: the lockstep wavefront.

Semantically identical to IrreducibleBlockListExtractor (overlap/builder.py,
reference src/overlap_builder.cpp:706-836) but processes MANY reads at once:
each round performs one batched occ lookup over every block of every alive
group (split by which index the block right-extends in), then replays the
reference's group walk per read using the cached counts.  updateR reuses the
same occ values (the reference recomputes them), so each block costs exactly
one occ pair per extension round.  Per-block arithmetic runs on plain Python
ints — the counts are 5-vectors, far below numpy's call overhead.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..index.fm import FMIndex
from .builder import (
    QUERYCOMP_BIT,
    TARGETREV_BIT,
    OverlapBlock,
    af_test,
)

_COMP = (0, 4, 3, 2, 1)


class _BlockState:
    """A block plus its cached occ counts (python lists) for the round."""

    __slots__ = ("block", "l_counts", "u_counts", "qc", "tr")

    def __init__(self, block: OverlapBlock):
        self.block = block
        self.l_counts: Optional[list] = None
        self.u_counts: Optional[list] = None
        self.qc = af_test(block.af, QUERYCOMP_BIT)
        self.tr = af_test(block.af, TARGETREV_BIT)

    def ext(self) -> tuple:
        l, u = self.l_counts, self.u_counts
        d0 = u[0] - l[0]
        d1 = u[1] - l[1]
        d2 = u[2] - l[2]
        d3 = u[3] - l[3]
        d4 = u[4] - l[4]
        if self.qc:
            return (d0, d4, d3, d2, d1)
        return (d0, d1, d2, d3, d4)

    def update_right(self, c_rank: int, pred) -> bool:
        """Apply capped.updateR(c) using cached counts; returns validity."""
        b = self.block
        cr = _COMP[c_rank] if self.qc else c_rank
        l, u = self.l_counts, self.u_counts
        below = 0
        for i in range(cr):
            below += u[i] - l[i]
        dc = u[cr] - l[cr]
        pb = pred[cr]
        c = b.capped
        nlo = c.lo + below
        nhi = nlo + dc - 1
        c.lo, c.hi = nlo, nhi
        c.rlo = pb + l[cr]
        c.rhi = pb + u[cr] - 1
        return nhi >= nlo and nhi >= 0 and c.rhi >= c.rlo and c.rhi >= 0

    def copy(self) -> "_BlockState":
        s = _BlockState(self.block.copy())
        s.l_counts = self.l_counts
        s.u_counts = self.u_counts
        return s


class _Task:
    __slots__ = ("key", "groups", "out", "failed")

    def __init__(self, key, inblocks: List[OverlapBlock]):
        self.key = key
        # stable sort by descending length, one initial group
        blocks = sorted(inblocks, key=lambda b: -b.length)
        self.groups: List[List[_BlockState]] = [[_BlockState(b) for b in blocks]]
        self.out: List[OverlapBlock] = []
        self.failed = False

    def done(self) -> bool:
        return self.failed or not self.groups


class BatchedExtractor:
    def __init__(self, fmi: FMIndex, rfmi: FMIndex):
        self.fmi = fmi
        self.rfmi = rfmi
        self.fmi_pred = fmi.pred.tolist()
        self.rfmi_pred = rfmi.pred.tolist()

    def run(self, tasks: Sequence[_Task]) -> None:
        alive = [t for t in tasks if not t.done()]
        while alive:
            self._fill_counts(alive)
            for task in alive:
                self._one_round(task)
            alive = [t for t in alive if not t.done()]

    def _fill_counts(self, tasks: Sequence[_Task]) -> None:
        """One batched occ pair for every block of every alive group."""
        fmi_states: List[_BlockState] = []
        rfmi_states: List[_BlockState] = []
        for task in tasks:
            for group in task.groups:
                for st in group:
                    if st.tr:
                        fmi_states.append(st)
                    else:
                        rfmi_states.append(st)
        for index, states in ((self.fmi, fmi_states), (self.rfmi, rfmi_states)):
            if not states:
                continue
            q = np.empty(2 * len(states), dtype=np.int64)
            for i, s in enumerate(states):
                q[2 * i] = s.block.capped.rlo - 1
                q[2 * i + 1] = s.block.capped.rhi
            counts = index.occ_all(q).tolist()
            for i, s in enumerate(states):
                s.l_counts = counts[2 * i]
                s.u_counts = counts[2 * i + 1]

    def _one_round(self, task: _Task) -> None:
        """One while-iteration of the reference group walk, including its
        erase-skip control flow (src/overlap_builder.cpp:728-806)."""
        incomings: List[List[_BlockState]] = []
        groups = task.groups
        gi = 0
        while gi < len(groups):
            blocklist = groups[gi]
            erase_group = True
            if blocklist:
                top_length = blocklist[0].block.length
                e0 = e1 = e2 = e3 = e4 = 0
                for st in blocklist:
                    if st.block.length != top_length:
                        break
                    x = st.ext()
                    e0 += x[0]
                    e1 += x[1]
                    e2 += x[2]
                    e3 += x[3]
                    e4 += x[4]
                if e0 > 0:
                    for st in blocklist:
                        if st.block.length != top_length:
                            break
                        if st.ext()[0] == 0:
                            task.failed = True
                            return
                        branched = st.copy()
                        branched.update_right(
                            0, self.fmi_pred if branched.tr else self.rfmi_pred
                        )
                        task.out.append(branched.block)
                else:
                    for st in blocklist:
                        if st.block.length < top_length:
                            x = st.ext()
                            e0 += x[0]
                            e1 += x[1]
                            e2 += x[2]
                            e3 += x[3]
                            e4 += x[4]
                    exts = (e0, e1, e2, e3, e4)
                    nonzero = [c for c in range(5) if exts[c] > 0]
                    if len(nonzero) == 1:
                        self._apply_update(nonzero[0], blocklist)
                        erase_group = False
                    else:
                        for c in nonzero:
                            branched = [st.copy() for st in blocklist]
                            self._apply_update(c, branched)
                            incomings.append(branched)
            if erase_group:
                del groups[gi]
                gi += 1
            else:
                gi += 2
        groups.extend(incomings)

    def _apply_update(self, c_rank: int, blocklist: List[_BlockState]) -> None:
        keep = []
        for st in blocklist:
            pred = self.fmi_pred if st.tr else self.rfmi_pred
            if st.update_right(c_rank, pred):
                keep.append(st)
        blocklist[:] = keep


def make_task(key, inblocks: List[OverlapBlock]) -> _Task:
    return _Task(key, inblocks)
