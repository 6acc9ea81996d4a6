"""SA-range-sharded FM-index: occ tables partitioned across the mesh.

The memory-scaling story for genomes whose occ structure exceeds one chip's
HBM (ARCHITECTURE.md "phase 2"): the packed BWT word/checkpoint planes are
split by block row across the `data` axis, so each device stores 1/D of the
index.  An occ query broadcasts to all shards; the owning shard answers (the
others contribute zeros) and a `psum` over the mesh combines.  Compared with
the reference — which has no index-sharding story at all (SURVEY.md §2.9) —
this trades one cheap collective per backward-search step for a D-fold larger
addressable index.  (The all-to-all-routed variant that also shards the
query-side compute is the planned optimization.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.fm import SAMPLE, FMIndex
from .fm_device import DeviceFM


class ShardedDeviceFM:
    def __init__(self, host: FMIndex, mesh: Mesh, axis: str = "data"):
        dfm = DeviceFM(host)
        self.length = host.length
        self.num_strings = host.num_strings
        self.mesh = mesh
        self.axis = axis
        ndev = mesh.shape[axis]
        nblocks = int(dfm.packed_words.shape[0])
        pad = (-nblocks) % ndev
        self.blocks_per_shard = (nblocks + pad) // ndev

        def shard(arr):
            a = np.asarray(arr)
            a = np.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            return jax.device_put(a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))))

        self.words = shard(dfm.packed_words)
        self.dollars = shard(dfm.dollar_words)
        self.checkpoints = shard(dfm.checkpoints)
        self.pred = jax.device_put(np.asarray(dfm.pred), NamedSharding(mesh, P()))

        bps = self.blocks_per_shard
        axis_name = axis

        @jax.jit
        def occ_all(i):
            from jax.experimental.shard_map import shard_map

            def local(words_l, dollars_l, ckpt_l, i_l):
                d = jax.lax.axis_index(axis_name)
                pos = i_l + 1
                block = pos // SAMPLE
                local_block = block - d * bps
                in_range = (local_block >= 0) & (local_block < bps)
                lb = jnp.clip(local_block, 0, bps - 1)

                popcount = jax.lax.population_count
                base = ckpt_l[lb]
                w = words_l[lb].astype(jnp.uint32)
                dd = dollars_l[lb].astype(jnp.uint32)
                tail_len = (pos - block * SAMPLE).astype(jnp.uint32)

                nw = w.shape[-1]
                widx = jnp.arange(nw, dtype=jnp.uint32) * 16
                valid = jnp.clip(
                    tail_len[..., None].astype(jnp.int32) - widx[None, :].astype(jnp.int32),
                    0,
                    16,
                ).astype(jnp.uint32)
                wmask = jnp.where(
                    valid == 16, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << (2 * valid)) - 1
                )
                nd = dd.shape[-1]
                didx = jnp.arange(nd, dtype=jnp.uint32) * 32
                dvalid = jnp.clip(
                    tail_len[..., None].astype(jnp.int32) - didx[None, :].astype(jnp.int32),
                    0,
                    32,
                ).astype(jnp.uint32)
                dmask = jnp.where(
                    dvalid == 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << dvalid) - 1
                )
                n_dollar = popcount(dd & dmask).sum(axis=-1).astype(jnp.int32)
                lo_bits = jnp.uint32(0x55555555)

                def count2(pattern):
                    x = w ^ pattern
                    matched = ~(x | (x >> 1)) & lo_bits
                    return popcount(matched & wmask).sum(axis=-1).astype(jnp.int32)

                c_a = count2(jnp.uint32(0)) - n_dollar
                c_c = count2(lo_bits)
                c_g = count2(jnp.uint32(0xAAAAAAAA))
                c_t = count2(jnp.uint32(0xFFFFFFFF))
                counts = base + jnp.stack([n_dollar, c_a, c_c, c_g, c_t], axis=-1)
                counts = jnp.where(in_range[..., None], counts, 0)
                return jax.lax.psum(counts, axis_name)

            return shard_map(
                local,
                mesh=self.mesh,
                in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name, None), P()),
                out_specs=P(),
            )(self.words, self.dollars, self.checkpoints, i)

        self._occ_all = occ_all

    def occ_all(self, i) -> np.ndarray:
        """Batched occ over the sharded index; i int32 array (clamped)."""
        i = np.clip(np.asarray(i, dtype=np.int32), -1, self.length - 1)
        return np.asarray(self._occ_all(jnp.asarray(i)))

    def count_kmers(self, kmers, k: int) -> np.ndarray:
        """Backward-search occurrence counts through the sharded index —
        the distributed analog of ops/kmer_count.py; each of the k steps is
        one sharded occ pair."""
        from ..core import dna

        packed = np.zeros((len(kmers), k), dtype=np.int32)
        for idx, w in enumerate(kmers):
            packed[idx] = dna.encode(w)
        pred = np.asarray(self.pred)
        lo = pred[packed[:, -1]].astype(np.int64)
        full = self.occ_all(np.full(len(kmers), self.length - 1))
        hi = lo + full[np.arange(len(kmers)), packed[:, -1]] - 1
        for j in range(k - 2, -1, -1):
            c = packed[:, j]
            both = self.occ_all(np.concatenate([lo - 1, hi]))
            l = both[: len(kmers)][np.arange(len(kmers)), c]
            u = both[len(kmers) :][np.arange(len(kmers)), c]
            nlo = pred[c] + l
            nhi = pred[c] + u - 1
            invalid = hi < lo
            lo = np.where(invalid, lo, nlo)
            hi = np.where(invalid, hi, nhi)
        return np.maximum(hi - lo + 1, 0)
