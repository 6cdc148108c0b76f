"""Negative sampling: in-graph JAX corruption + an OpenKE-parity host sampler.

The reference generates batches in C++ (``Base.cpp:sampling``): each positive
train triple gets ``neg_rate`` corrupted copies; head vs tail corruption is
chosen uniformly or Bernoulli-weighted (``bern``), and the corrupted entity is
drawn uniformly from entities that do NOT form a known train triple
("filtered", via sorted-range binary search in ``Corrupt.h``).

TPU-native design: :func:`sample_batch` runs **inside jit** — uniform triple
picks, Bernoulli head/tail choice, and filtered corruption by rejection
against the sorted encoded-key array (``KGData.train_keys``) resident in
device memory.  A fixed number of rejection rounds keeps shapes static; with
uniform proposals the chance a draw hits a known triple is ~``degree/E``
(<1% on FB15K237), so 4 rounds make a false negative vanishingly rare — and
the reference itself only guarantees filtering against train, so residual
collisions only add label noise the reference also has by design on other
splits.

:class:`NumpySampler` reproduces the C++ behavior on host (including exact
filtering) as the behavioral oracle and as a drop-in for CPU-only runs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from skghoi_tpu.kge.data import KGData

Array = jax.Array


class TripleBatch(NamedTuple):
    """Positive triples + per-positive negatives, all ``[B]`` / ``[B, K]``."""

    pos_h: Array
    pos_t: Array
    pos_r: Array
    neg_h: Array  # [B, K]
    neg_t: Array
    neg_r: Array


class CorruptBatch(NamedTuple):
    """One-side-corrupted batch: each row's K negatives replace the SAME
    entity slot (tail where ``corrupt_tail[b]``, else head), so models can
    score them against one folded per-row base vector
    (:meth:`~skghoi_tpu.kge.models.KGEModel.score_one_side`).

    This is the reference's adversarial-example batch structure — its
    ``sampling_mode="cross"`` alternates whole head-batch/tail-batch steps
    (``Base.cpp`` cross sampling; consumed by the models' head_batch/
    tail_batch ``_calc`` modes) — with the side drawn per ROW instead of per
    step, which has the same marginal statistics at finer grain.
    """

    pos_h: Array
    pos_t: Array
    pos_r: Array
    neg_ent: Array  # [B, K] replacement entity ids
    corrupt_tail: Array  # [B] bool — True: negatives are (h, r, neg_ent)


class DeviceKG(NamedTuple):
    """Device-resident triple store consumed by the in-graph sampler.

    Membership testing ("is this corrupted triple a known train triple?") uses
    a cuckoo :class:`TripleHashSet` — two gathers per query — which keeps
    filtered sampling gather-bound work negligible on TPU.
    """

    train_h: Array
    train_t: Array
    train_r: Array
    hashset: "TripleHashSet"
    bern_tail_prob: Array  # [R]
    ent_tot: int
    rel_tot: int

    @classmethod
    def from_kgdata(cls, data: KGData) -> "DeviceKG":
        h, t, r = data.train[:, 0], data.train[:, 1], data.train[:, 2]
        return cls(
            train_h=jnp.asarray(h, jnp.int32),
            train_t=jnp.asarray(t, jnp.int32),
            train_r=jnp.asarray(r, jnp.int32),
            hashset=TripleHashSet(h, r, t),
            bern_tail_prob=jnp.asarray(data.bern_tail_prob()),
            ent_tot=data.ent_tot,
            rel_tot=data.rel_tot,
        )


_M1 = np.uint32(2654435761)  # Knuth multiplicative
_M2 = np.uint32(2246822519)
_M3 = np.uint32(3266489917)
_M4 = np.uint32(668265263)


def _mix(h, r, t, xp):
    """32-bit triple mixer, identical under numpy and jnp uint32 wrap-around."""
    h = h.astype(xp.uint32)
    r = r.astype(xp.uint32)
    t = t.astype(xp.uint32)
    x = h * _M1 + r * _M2 + t * _M3
    x = (x ^ (x >> xp.uint32(15))) * _M4
    x = x ^ (x >> xp.uint32(13))
    return x


class TripleHashSet:
    """Static cuckoo hash set over (h, r, t) triples with O(1) device lookup.

    Built on host, queried in-graph with exactly **two gathers** — versus the
    ~60 gathers of a 3-column binary search — which makes filtered negative
    sampling essentially free on TPU (gathers are the bottleneck there, not
    FLOPs).  Lookup compares a 32-bit fingerprint at two hashed slots; false
    positives occur with probability ~2^-31 per query (a false "known" only
    causes one extra resample), false negatives never.

    The reference's C++ ``_find`` (``Corrupt.h:166-177``) is the exact-match
    analogue; :func:`lex3_contains` keeps that exact semantics for tests.
    """

    def __init__(self, h: np.ndarray, r: np.ndarray, t: np.ndarray, seed: int = 0):
        n = len(h)
        size = 1 << max(8, int(np.ceil(np.log2(max(n, 2)))) + 1)  # load <= 0.5 over 2 tables
        for attempt in range(16):
            tables = self._try_build(h, r, t, size, seed + attempt)
            if tables is not None:
                break
            if attempt % 2 == 1:
                size <<= 1
        else:  # pragma: no cover
            raise RuntimeError("cuckoo build failed")
        self.size = size
        self.salt = np.uint32(seed + attempt)
        self.table1 = jnp.asarray(tables[0])
        self.table2 = jnp.asarray(tables[1])

    @staticmethod
    def _hashes(h, r, t, size, salt, xp):
        base = _mix(h, r, t, xp)
        fp = _mix(h + xp.uint32(0x9E37), r, t ^ salt, xp)
        fp = xp.where(fp == 0, xp.uint32(1), fp)  # 0 is the empty sentinel
        s1 = (base ^ salt) % xp.uint32(size)
        s2 = (_mix(t, h, r ^ salt, xp)) % xp.uint32(size)
        return s1.astype(xp.int32), s2.astype(xp.int32), fp

    def _try_build(self, h, r, t, size, seed):
        salt = np.uint32(seed)
        s1, s2, fp = self._hashes(
            h.astype(np.uint32), r.astype(np.uint32), t.astype(np.uint32), size, salt, np
        )
        t1 = np.zeros(size, np.uint32)
        t2 = np.zeros(size, np.uint32)
        o1 = np.full(size, -1, np.int64)  # which item occupies each slot (host only)
        o2 = np.full(size, -1, np.int64)
        for i in range(len(h)):
            cur = i
            side = 1
            for _ in range(256):  # eviction chain bound
                if side == 1:
                    slot = s1[cur]
                    if t1[slot] == fp[cur] and (o1[slot] < 0 or fp[o1[slot]] == fp[cur]):
                        break  # duplicate fingerprint already present here
                    if o1[slot] < 0:
                        t1[slot], o1[slot] = fp[cur], cur
                        break
                    victim = o1[slot]
                    t1[slot], o1[slot] = fp[cur], cur
                    cur, side = victim, 2
                else:
                    slot = s2[cur]
                    if t2[slot] == fp[cur] and (o2[slot] < 0 or fp[o2[slot]] == fp[cur]):
                        break
                    if o2[slot] < 0:
                        t2[slot], o2[slot] = fp[cur], cur
                        break
                    victim = o2[slot]
                    t2[slot], o2[slot] = fp[cur], cur
                    cur, side = victim, 1
            else:
                return None  # eviction cycle: retry with a new salt / bigger table
        self._host_tables = (t1, t2)
        return t1, t2

    def contains(self, h: Array, r: Array, t: Array) -> Array:
        s1, s2, fp = self._hashes(h, r, t, self.size, jnp.uint32(self.salt), jnp)
        return (self.table1[s1] == fp) | (self.table2[s2] == fp)


def lex3_contains(
    sorted_a: Array, sorted_b: Array, sorted_c: Array, qa: Array, qb: Array, qc: Array
) -> Array:
    """Membership of (qa, qb, qc) tuples in three lexicographically sorted
    columns — a branch-free binary search unrolled to ceil(log2(n)) steps."""
    n = sorted_a.shape[0]
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    lo = jnp.zeros(qa.shape, jnp.int32)
    hi = jnp.full(qa.shape, n, jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) // 2
        midc = jnp.minimum(mid, n - 1)
        ka, kb, kc = sorted_a[midc], sorted_b[midc], sorted_c[midc]
        less = (ka < qa) | ((ka == qa) & ((kb < qb) | ((kb == qb) & (kc < qc))))
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    loc = jnp.minimum(lo, n - 1)
    return (sorted_a[loc] == qa) & (sorted_b[loc] == qb) & (sorted_c[loc] == qc)


def _is_known(kg: DeviceKG, h: Array, t: Array, r: Array) -> Array:
    return kg.hashset.contains(h, r, t)


def sample_batch(
    key: Array,
    kg: DeviceKG,
    batch_size: int,
    neg_rate: int = 1,
    bern: bool = False,
    filtered: bool = True,
    rejection_rounds: int = 4,
) -> TripleBatch:
    """Draw one training batch fully in-graph (jit/scan friendly)."""
    k_pick, k_side, k_ent = jax.random.split(key, 3)

    idx = jax.random.randint(k_pick, (batch_size,), 0, len(kg.train_h))
    h = kg.train_h[idx]
    t = kg.train_t[idx]
    r = kg.train_r[idx]

    # Choose, per negative, whether to corrupt the tail (True) or head.
    if bern:
        p_tail = kg.bern_tail_prob[r]  # [B]
        corrupt_tail = jax.random.uniform(k_side, (batch_size, neg_rate)) < p_tail[:, None]
    else:
        corrupt_tail = jax.random.uniform(k_side, (batch_size, neg_rate)) < 0.5

    def propose(k):
        cand = jax.random.randint(k, (batch_size, neg_rate), 0, kg.ent_tot)
        nh = jnp.where(corrupt_tail, h[:, None], cand)
        nt = jnp.where(corrupt_tail, cand, t[:, None])
        return nh, nt

    keys = jax.random.split(k_ent, rejection_rounds)
    nh, nt = propose(keys[0])
    if filtered:
        bad = _is_known(kg, nh, nt, jnp.broadcast_to(r[:, None], nh.shape))
        for i in range(1, rejection_rounds):
            nh2, nt2 = propose(keys[i])
            nh = jnp.where(bad, nh2, nh)
            nt = jnp.where(bad, nt2, nt)
            bad = bad & _is_known(kg, nh, nt, jnp.broadcast_to(r[:, None], nh.shape))

    neg_r = jnp.broadcast_to(r[:, None], (batch_size, neg_rate))
    return TripleBatch(pos_h=h, pos_t=t, pos_r=r, neg_h=nh, neg_t=nt, neg_r=neg_r)


def sample_batch_oneside(
    key: Array,
    kg: DeviceKG,
    batch_size: int,
    neg_rate: int = 1,
    bern: bool = False,
    filtered: bool = True,
    rejection_rounds: int = 4,
) -> CorruptBatch:
    """Like :func:`sample_batch` but with ONE corruption side per row, so the
    consumer can use the folded ``score_one_side`` fast path (≈3x less
    gather/scatter HBM traffic per training step)."""
    k_pick, k_side, k_ent = jax.random.split(key, 3)

    idx = jax.random.randint(k_pick, (batch_size,), 0, len(kg.train_h))
    h = kg.train_h[idx]
    t = kg.train_t[idx]
    r = kg.train_r[idx]

    p_tail = kg.bern_tail_prob[r] if bern else 0.5
    corrupt_tail = jax.random.uniform(k_side, (batch_size,)) < p_tail

    def known(cand):
        nh = jnp.where(corrupt_tail[:, None], h[:, None], cand)
        nt = jnp.where(corrupt_tail[:, None], cand, t[:, None])
        return _is_known(kg, nh, nt, jnp.broadcast_to(r[:, None], cand.shape))

    keys = jax.random.split(k_ent, rejection_rounds)
    cand = jax.random.randint(keys[0], (batch_size, neg_rate), 0, kg.ent_tot)
    if filtered:
        bad = known(cand)
        for i in range(1, rejection_rounds):
            cand2 = jax.random.randint(keys[i], (batch_size, neg_rate), 0, kg.ent_tot)
            cand = jnp.where(bad, cand2, cand)
            bad = bad & known(cand)

    return CorruptBatch(pos_h=h, pos_t=t, pos_r=r, neg_ent=cand, corrupt_tail=corrupt_tail)


class NumpySampler:
    """Host-side sampler with OpenKE-exact filtered corruption.

    Unlike the rejection sampler above, corrupted entities are drawn uniformly
    from the exact complement set (via the same "skip known tails" index
    arithmetic as ``Corrupt.h:corrupt_head/tail``, realized with searchsorted
    over per-(e, r) sorted neighbor lists).
    """

    def __init__(self, data: KGData, seed: int = 0):
        self.data = data
        self.rng = np.random.default_rng(seed)
        h, t, r = data.train[:, 0], data.train[:, 1], data.train[:, 2]
        # (h, r) -> sorted tails; (t, r) -> sorted heads.
        order_ht = np.lexsort((t, r, h))
        self._ht_keys = (h * data.rel_tot + r)[order_ht]
        self._ht_tails = t[order_ht]
        order_th = np.lexsort((h, r, t))
        self._th_keys = (t * data.rel_tot + r)[order_th]
        self._th_heads = h[order_th]
        self._bern_p = data.bern_tail_prob()

    def _corrupt(self, keys, values, query_key, count):
        """Uniform draw from [0, ent_tot) minus the sorted ``values`` of ``query_key``."""
        lo = np.searchsorted(keys, query_key, "left")
        hi = np.searchsorted(keys, query_key, "right")
        known = values[lo:hi]  # sorted entity ids to skip
        if len(known) >= self.data.ent_tot:  # degenerate: every entity known
            return self.rng.integers(0, self.data.ent_tot, size=count)
        draws = self.rng.integers(0, self.data.ent_tot - len(known), size=count)
        # Shift each draw past the known entities below it.
        return draws + np.searchsorted(known - np.arange(len(known)), draws, "right")

    def sample(self, batch_size: int, neg_rate: int = 1, bern: bool = False):
        data = self.data
        idx = self.rng.integers(0, data.train_total, size=batch_size)
        h, t, r = data.train[idx, 0], data.train[idx, 1], data.train[idx, 2]
        neg_h = np.repeat(h[:, None], neg_rate, 1).copy()
        neg_t = np.repeat(t[:, None], neg_rate, 1).copy()
        neg_r = np.repeat(r[:, None], neg_rate, 1)
        p_tail = self._bern_p[r] if bern else np.full(batch_size, 0.5, np.float32)
        for i in range(batch_size):
            tails = self.rng.random(neg_rate) < p_tail[i]
            n_tail = int(tails.sum())
            if n_tail:
                neg_t[i, tails] = self._corrupt(
                    self._ht_keys, self._ht_tails, h[i] * data.rel_tot + r[i], n_tail
                )
            if neg_rate - n_tail:
                neg_h[i, ~tails] = self._corrupt(
                    self._th_keys, self._th_heads, t[i] * data.rel_tot + r[i], neg_rate - n_tail
                )
        return TripleBatch(
            pos_h=h.astype(np.int32),
            pos_t=t.astype(np.int32),
            pos_r=r.astype(np.int32),
            neg_h=neg_h.astype(np.int32),
            neg_t=neg_t.astype(np.int32),
            neg_r=neg_r.astype(np.int32),
        )
