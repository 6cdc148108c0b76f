"""KGE model zoo with OpenKE scoring semantics, as flax modules.

Each model scores batches of (head, tail, relation) id triples.  Conventions
(matching the reference ``OpenKE/openke/module/model/*``):

- ``__call__(h, t, r)`` returns the *training* score used by the sampling
  strategies — distance-like (lower = more plausible) for the translational
  family, similarity-like (higher = better) for the bilinear family.  This is
  OpenKE's ``forward`` with ``mode='normal'``; the ``head_batch``/``tail_batch``
  reshape modes exist there only to reuse one flattened buffer and are
  unnecessary here — ids broadcast instead.
- ``rank_scores(h, t, r)`` returns scores where **lower is always better**,
  the convention the link-prediction ranker consumes (reference
  ``Test.h:testHead`` counts ``value < minimal``).  For the bilinear family it
  is the negated similarity, mirroring each OpenKE ``predict``.  Two upstream
  sign slips are fixed (and documented): OpenKE negates the already
  distance-like ``forward`` of RESCAL and Analogy in ``predict``, which would
  invert their rankings; we rank both by ``forward`` directly.
- ``regularization(h, t, r)`` mirrors each model's ``regularization(data)``.

All ids may have arbitrary leading shape; embeddings are gathered and the score
keeps the leading shape.  Initializers match torch defaults used upstream
(``nn.init.xavier_uniform_`` on the full embedding tables, or the
margin/epsilon uniform range).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def xavier_uniform_embedding(num: int, dim: int):
    """torch ``nn.init.xavier_uniform_`` on an ``[num, dim]`` table."""

    limit = math.sqrt(6.0 / (num + dim))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


def uniform_embedding(limit: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


def _l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch ``F.normalize(p=2)``: divide by max(norm, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def _p_norm(x: Array, p: int, axis: int = -1) -> Array:
    if p == 1:
        return jnp.sum(jnp.abs(x), axis=axis)
    if p == 2:
        return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-30)
    return jnp.sum(jnp.abs(x) ** p, axis=axis) ** (1.0 / p)



def _embed1(embed: nn.Embed, idx: Array) -> Array:
    """Scalar-index lookup that survives flax's ``num_embeddings == 1``
    broadcast special case (which rejects 0-d inputs)."""
    return embed(jnp.reshape(idx, (1,)))[0]


@jax.custom_vjp
def _segment_gather(table: Array, idx: Array) -> Array:
    """``table[idx]`` whose backward is a one-hot matmul instead of a
    scatter-add.

    XLA serializes scatter-adds with duplicate indices; a [B] gather from a
    few-hundred-row table (TransR's per-relation transfer matrices: B≈2700
    rows funnelling into 237 slots) pays ~60 ms/step in that serialization.
    The adjoint is exactly ``one_hot(idx)^T @ dOut`` — one [R, B] x [B, F]
    MXU matmul, sub-millisecond at the same shapes."""
    return jnp.take(table, idx, axis=0)


def _segment_gather_fwd(table, idx):
    return jnp.take(table, idx, axis=0), (idx, table.shape[0])


def _segment_gather_bwd(res, g):
    idx, num_rows = res
    onehot = jax.nn.one_hot(idx, num_rows, dtype=g.dtype)  # [B, R]
    flat = g.reshape(g.shape[0], -1)
    dtable = jnp.einsum("br,bf->rf", onehot, flat).reshape((num_rows,) + g.shape[1:])
    return dtable, None


_segment_gather.defvjp(_segment_gather_fwd, _segment_gather_bwd)

def _mean_sq(*tensors: Array) -> Array:
    return sum(jnp.mean(t**2) for t in tensors) / len(tensors)


class KGEModel(nn.Module):
    """Base: entity/relation totals plus the shared rank-score plumbing."""

    ent_tot: int
    rel_tot: int

    # -- overridden by subclasses ------------------------------------------
    def score(self, h: Array, t: Array, r: Array) -> Array:  # pragma: no cover
        raise NotImplementedError

    LOWER_IS_BETTER = True  # translational default; bilinear models override

    def __call__(self, h: Array, t: Array, r: Array) -> Array:
        return self.score(h, t, r)

    def rank_scores(self, h: Array, t: Array, r: Array) -> Array:
        s = self.score(h, t, r)
        return s if self.LOWER_IS_BETTER else -s

    def score_one_side(self, pos_h: Array, pos_t: Array, pos_r: Array,
                       neg_ent: Array, corrupt_tail: Array) -> Array:
        """Scores of ``[B, K]`` negatives that each replace ONE entity of the
        row's positive (tail where ``corrupt_tail[b]``, else head).

        Generic fallback reconstructs full (h, t, r) index grids; subclasses
        override with a folded form that gathers the positive's fixed parts
        once per row instead of once per negative — on TPU the sampled-loss
        step is gather/scatter-bound, so this cuts its HBM traffic ~3x (the
        same structure the reference exploits via its head_batch/tail_batch
        ``_calc`` modes, e.g. ``OpenKE/openke/module/model/DistMult.py:34-44``).
        """
        ct = corrupt_tail[:, None]
        nh = jnp.where(ct, pos_h[:, None], neg_ent)
        nt = jnp.where(ct, neg_ent, pos_t[:, None])
        nr = jnp.broadcast_to(pos_r[:, None], neg_ent.shape)
        return self.score(nh, nt, nr)

    def regularization(self, h: Array, t: Array, r: Array) -> Array:
        raise NotImplementedError


class TransE(KGEModel):
    """``||h + r - t||_p`` with optional L2 normalization (OpenKE TransE)."""

    dim: int = 100
    p_norm: int = 1
    norm_flag: bool = True
    margin: Optional[float] = None

    def setup(self):
        self.ent_embeddings = nn.Embed(
            self.ent_tot, self.dim, embedding_init=xavier_uniform_embedding(self.ent_tot, self.dim)
        )
        self.rel_embeddings = nn.Embed(
            self.rel_tot, self.dim, embedding_init=xavier_uniform_embedding(self.rel_tot, self.dim)
        )

    def score(self, h, t, r):
        he = self.ent_embeddings(h)
        te = self.ent_embeddings(t)
        re = self.rel_embeddings(r)
        if self.norm_flag:
            he, te, re = _l2_normalize(he), _l2_normalize(te), _l2_normalize(re)
        dist = _p_norm(he + re - te, self.p_norm)
        if self.margin is not None:
            return self.margin - dist
        return dist

    def rank_scores(self, h, t, r):
        s = self.score(h, t, r)
        return self.margin - s if self.margin is not None else s

    def score_one_side(self, pos_h, pos_t, pos_r, neg_ent, corrupt_tail):
        # ||h' + r - t|| = ||e' - (t - r)||; ||h + r - t'|| = ||e' - (h + r)||
        # (p-norms are symmetric under sign flip), so one [B, dim] base folds
        # the row's fixed entity + relation.
        he = self.ent_embeddings(pos_h)
        te = self.ent_embeddings(pos_t)
        re = self.rel_embeddings(pos_r)
        ne = self.ent_embeddings(neg_ent)
        if self.norm_flag:
            he, te, re, ne = (_l2_normalize(x) for x in (he, te, re, ne))
        base = jnp.where(corrupt_tail[:, None], he + re, te - re)
        dist = _p_norm(ne - base[:, None, :], self.p_norm)
        return self.margin - dist if self.margin is not None else dist

    def _rank_all(self, anchor: Array, r: Array, anchor_is_head: bool) -> Array:
        """Distances of one (anchor, r) query against every entity, computed
        against the whole table (one fused broadcast-reduce; no per-(query,
        entity) gathers).  Raw distance — lower is better — regardless of
        margin mode (the rank_scores contract)."""
        ents = self.ent_embeddings.embedding
        a = _embed1(self.ent_embeddings, anchor)
        re = _embed1(self.rel_embeddings, r)
        if self.norm_flag:
            ents, a, re = _l2_normalize(ents), _l2_normalize(a), _l2_normalize(re)
        base = a + re if anchor_is_head else a - re
        return _p_norm(ents - base[None, :], self.p_norm)

    def rank_all_tails(self, h: Array, r: Array) -> Array:
        return self._rank_all(h, r, anchor_is_head=True)

    def rank_all_heads(self, t: Array, r: Array) -> Array:
        return self._rank_all(t, r, anchor_is_head=False)

    def regularization(self, h, t, r):
        return _mean_sq(self.ent_embeddings(h), self.ent_embeddings(t), self.rel_embeddings(r))


class TransH(KGEModel):
    """TransE on a per-relation hyperplane: ``e - (e.w_r) w_r`` projection.

    Matches the reference's standalone head copy (``heads/TransH/TransH.py``)
    and OpenKE TransH: the hyperplane normal is L2-normalized, entities are
    projected *before* the optional score normalization.
    """

    dim: int = 100
    p_norm: int = 1
    norm_flag: bool = True
    margin: Optional[float] = None

    def setup(self):
        self.ent_embeddings = nn.Embed(
            self.ent_tot, self.dim, embedding_init=xavier_uniform_embedding(self.ent_tot, self.dim)
        )
        self.rel_embeddings = nn.Embed(
            self.rel_tot, self.dim, embedding_init=xavier_uniform_embedding(self.rel_tot, self.dim)
        )
        self.norm_vector = nn.Embed(
            self.rel_tot, self.dim, embedding_init=xavier_uniform_embedding(self.rel_tot, self.dim)
        )

    @staticmethod
    def _transfer(e: Array, w: Array) -> Array:
        w = _l2_normalize(w)
        return e - jnp.sum(e * w, axis=-1, keepdims=True) * w

    def score(self, h, t, r):
        he = self.ent_embeddings(h)
        te = self.ent_embeddings(t)
        re = self.rel_embeddings(r)
        w = self.norm_vector(r)
        hp = self._transfer(he, w)
        tp = self._transfer(te, w)
        if self.norm_flag:
            hp, tp, re = _l2_normalize(hp), _l2_normalize(tp), _l2_normalize(re)
        dist = _p_norm(hp + re - tp, self.p_norm)
        if self.margin is not None:
            return self.margin - dist
        return dist

    def rank_scores(self, h, t, r):
        s = self.score(h, t, r)
        return self.margin - s if self.margin is not None else s

    def score_one_side(self, pos_h, pos_t, pos_r, neg_ent, corrupt_tail):
        # Same fold as TransE after the shared per-relation hyperplane
        # projection (w is gathered once per row and broadcast over K).
        he = self.ent_embeddings(pos_h)
        te = self.ent_embeddings(pos_t)
        re = self.rel_embeddings(pos_r)
        w = self.norm_vector(pos_r)
        ne = self._transfer(self.ent_embeddings(neg_ent), w[:, None, :])
        hp = self._transfer(he, w)
        tp = self._transfer(te, w)
        if self.norm_flag:
            hp, tp, re, ne = (_l2_normalize(x) for x in (hp, tp, re, ne))
        base = jnp.where(corrupt_tail[:, None], hp + re, tp - re)
        dist = _p_norm(ne - base[:, None, :], self.p_norm)
        return self.margin - dist if self.margin is not None else dist

    def _rank_all(self, anchor: Array, r: Array, anchor_is_head: bool) -> Array:
        """All-entity distances for one query: the whole table is projected
        onto the relation hyperplane once (one [E, dim] op), then the TransE
        base fold applies.  Lower is better, margin-independent."""
        w = _embed1(self.norm_vector, r)
        ents = self._transfer(self.ent_embeddings.embedding, w[None, :])
        a = self._transfer(_embed1(self.ent_embeddings, anchor), w)
        re = _embed1(self.rel_embeddings, r)
        if self.norm_flag:
            ents, a, re = _l2_normalize(ents), _l2_normalize(a), _l2_normalize(re)
        base = a + re if anchor_is_head else a - re
        return _p_norm(ents - base[None, :], self.p_norm)

    def rank_all_tails(self, h: Array, r: Array) -> Array:
        return self._rank_all(h, r, anchor_is_head=True)

    def rank_all_heads(self, t: Array, r: Array) -> Array:
        return self._rank_all(t, r, anchor_is_head=False)

    def embeddings_and_score(self, h, t, r):
        """Raw (untransferred) embeddings + score, the tuple the reference's
        HOI TransH head returns (``heads/TransH/TransH.py:87-106``)."""
        he = self.ent_embeddings(h)
        te = self.ent_embeddings(t)
        re = self.rel_embeddings(r)
        w = self.norm_vector(r)
        return he, re, w, te, self.score(h, t, r)

    def regularization(self, h, t, r):
        return _mean_sq(
            self.ent_embeddings(h),
            self.ent_embeddings(t),
            self.rel_embeddings(r),
            self.norm_vector(r),
        )


def _transr_matrix_init(rel_tot: int, dim_e: int, dim_r: int, rand_init: bool):
    if rand_init:
        return xavier_uniform_embedding(rel_tot, dim_e * dim_r)

    def init(key, shape, dtype=jnp.float32):
        eye = jnp.zeros((dim_e, dim_r), dtype)
        eye = eye.at[jnp.arange(min(dim_e, dim_r)), jnp.arange(min(dim_e, dim_r))].set(1.0)
        return jnp.broadcast_to(eye.reshape(-1), (rel_tot, dim_e * dim_r)).astype(dtype)

    return init


class TransR(KGEModel):
    """Per-relation linear map into relation space, then TransE scoring."""

    dim_e: int = 100
    dim_r: int = 100
    p_norm: int = 1
    norm_flag: bool = True
    rand_init: bool = False
    margin: Optional[float] = None
    # Training-side memory bound: gathering one [dim_e, dim_r] matrix per
    # triple costs batch*dim_e*dim_r*4 bytes (10.9 GB for FB15K237's 68k-triple
    # batches at dim 200 — the round-1 OOM).  With ``score_chunk`` set, score()
    # lax.maps over fixed-size chunks under jax.checkpoint, so the peak is one
    # chunk's gather and the backward recomputes instead of storing.
    score_chunk: Optional[int] = None

    def setup(self):
        self.ent_embeddings = nn.Embed(
            self.ent_tot, self.dim_e, embedding_init=xavier_uniform_embedding(self.ent_tot, self.dim_e)
        )
        self.rel_embeddings = nn.Embed(
            self.rel_tot, self.dim_r, embedding_init=xavier_uniform_embedding(self.rel_tot, self.dim_r)
        )
        self.transfer_matrix = nn.Embed(
            self.rel_tot,
            self.dim_e * self.dim_r,
            embedding_init=_transr_matrix_init(self.rel_tot, self.dim_e, self.dim_r, self.rand_init),
        )

    def _score_direct(self, h, t, r):
        he = self.ent_embeddings(h)
        te = self.ent_embeddings(t)
        re = self.rel_embeddings(r)
        m = self.transfer_matrix(r).reshape(*r.shape, self.dim_e, self.dim_r)
        hp = jnp.einsum("...e,...er->...r", he, m)
        tp = jnp.einsum("...e,...er->...r", te, m)
        if self.norm_flag:
            hp, tp, re = _l2_normalize(hp), _l2_normalize(tp), _l2_normalize(re)
        dist = _p_norm(hp + re - tp, self.p_norm)
        if self.margin is not None:
            return self.margin - dist
        return dist

    def score(self, h, t, r):
        shape = jnp.broadcast_shapes(h.shape, t.shape, r.shape)
        n = int(math.prod(shape)) if shape else 1
        if self.score_chunk is None or n <= self.score_chunk:
            return self._score_direct(h, t, r)
        chunk = self.score_chunk
        flat = [jnp.broadcast_to(x, shape).reshape(-1) for x in (h, t, r)]
        pad = (-n) % chunk
        if pad:
            flat = [jnp.pad(x, (0, pad)) for x in flat]
        chunks = [x.reshape(-1, chunk) for x in flat]
        out = jax.lax.map(
            jax.checkpoint(lambda c: self._score_direct(*c)), tuple(chunks)
        )
        return out.reshape(-1)[:n].reshape(shape)

    def rank_scores(self, h, t, r):
        s = self.score(h, t, r)
        return self.margin - s if self.margin is not None else s

    def _rank_all(self, anchor: Array, r: Array, anchor_is_head: bool) -> Array:
        """Scores of one triple against every entity (one side).

        The generic all-entity broadcast would gather a ``dim_e x dim_r``
        transfer matrix per (triple, entity) — 11 GB per ranking query at
        dim 200.  Since the relation is fixed along the entity axis, project
        the whole entity table once with a single matmul instead.
        """
        m = self.transfer_matrix(r).reshape(self.dim_e, self.dim_r)
        ents_p = self.ent_embeddings.embedding @ m  # [E, dim_r]
        anchor_p = self.ent_embeddings(anchor) @ m  # [dim_r]
        re = self.rel_embeddings(r)
        if self.norm_flag:
            ents_p = _l2_normalize(ents_p)
            anchor_p = _l2_normalize(anchor_p)
            re = _l2_normalize(re)
        if anchor_is_head:
            diff = anchor_p[None, :] + re[None, :] - ents_p
        else:
            diff = ents_p + re[None, :] - anchor_p[None, :]
        # rank_scores() is lower-is-better (it undoes the margin shift), so the
        # fast path must return the raw distance regardless of margin mode.
        return _p_norm(diff, self.p_norm)

    def rank_all_tails(self, h: Array, r: Array) -> Array:
        return self._rank_all(h, r, anchor_is_head=True)

    def rank_all_heads(self, t: Array, r: Array) -> Array:
        return self._rank_all(t, r, anchor_is_head=False)

    def score_one_side(self, pos_h, pos_t, pos_r, neg_ent, corrupt_tail):
        # One [dim_e, dim_r] transfer matrix gather per ROW (not per
        # negative): the K negatives share the positive's relation, so the
        # projection is a batched einsum.  This is what makes dim-200 TransR
        # training fit without the chunked lax.map path (whose
        # checkpoint-in-scan nesting faults the TPU runtime).  The gather
        # goes through _segment_gather so its backward is a one-hot matmul
        # rather than a duplicate-index scatter (~60 ms/step serialized).
        b = pos_r.shape[0]
        m = _segment_gather(self.transfer_matrix.embedding, pos_r).reshape(
            b, self.dim_e, self.dim_r
        )
        hp = jnp.einsum("be,ber->br", self.ent_embeddings(pos_h), m)
        tp = jnp.einsum("be,ber->br", self.ent_embeddings(pos_t), m)
        ne = jnp.einsum("bke,ber->bkr", self.ent_embeddings(neg_ent), m)
        re = self.rel_embeddings(pos_r)
        if self.norm_flag:
            hp, tp, re, ne = (_l2_normalize(x) for x in (hp, tp, re, ne))
        base = jnp.where(corrupt_tail[:, None], hp + re, tp - re)
        dist = _p_norm(ne - base[:, None, :], self.p_norm)
        return self.margin - dist if self.margin is not None else dist

    def regularization(self, h, t, r):
        regul = _mean_sq(
            self.ent_embeddings(h),
            self.ent_embeddings(t),
            self.rel_embeddings(r),
            self.transfer_matrix(r),
        )
        # OpenKE TransR squares its regularizer (TransR.py:100) — kept for parity.
        return regul * regul


class TransD(KGEModel):
    """Dynamic projection ``normalize(resize(e) + (e . e_p) r_p)`` per triple."""

    dim_e: int = 100
    dim_r: int = 100
    p_norm: int = 1
    norm_flag: bool = True
    margin: Optional[float] = None

    def setup(self):
        self.ent_embeddings = nn.Embed(
            self.ent_tot, self.dim_e, embedding_init=xavier_uniform_embedding(self.ent_tot, self.dim_e)
        )
        self.rel_embeddings = nn.Embed(
            self.rel_tot, self.dim_r, embedding_init=xavier_uniform_embedding(self.rel_tot, self.dim_r)
        )
        self.ent_transfer = nn.Embed(
            self.ent_tot, self.dim_e, embedding_init=xavier_uniform_embedding(self.ent_tot, self.dim_e)
        )
        self.rel_transfer = nn.Embed(
            self.rel_tot, self.dim_r, embedding_init=xavier_uniform_embedding(self.rel_tot, self.dim_r)
        )

    def _resize(self, e: Array) -> Array:
        if self.dim_e == self.dim_r:
            return e
        if self.dim_e > self.dim_r:
            return e[..., : self.dim_r]
        pad = [(0, 0)] * (e.ndim - 1) + [(0, self.dim_r - self.dim_e)]
        return jnp.pad(e, pad)

    def _transfer(self, e: Array, e_t: Array, r_t: Array) -> Array:
        proj = self._resize(e) + jnp.sum(e * e_t, axis=-1, keepdims=True) * r_t
        return _l2_normalize(proj)

    def score(self, h, t, r):
        he = self.ent_embeddings(h)
        te = self.ent_embeddings(t)
        re = self.rel_embeddings(r)
        hp = self._transfer(he, self.ent_transfer(h), self.rel_transfer(r))
        tp = self._transfer(te, self.ent_transfer(t), self.rel_transfer(r))
        if self.norm_flag:
            hp, tp, re = _l2_normalize(hp), _l2_normalize(tp), _l2_normalize(re)
        dist = _p_norm(hp + re - tp, self.p_norm)
        if self.margin is not None:
            return self.margin - dist
        return dist

    def rank_scores(self, h, t, r):
        s = self.score(h, t, r)
        return self.margin - s if self.margin is not None else s

    def _rank_all(self, anchor: Array, r: Array, anchor_is_head: bool) -> Array:
        """All-entity distances for one query via whole-table dynamic
        projection (two [E, dim] tables read once; no [C, E, dim] gather —
        this is also what keeps dim-1024 eval inside HBM)."""
        rt = _embed1(self.rel_transfer, r)
        ents = self._transfer(self.ent_embeddings.embedding, self.ent_transfer.embedding, rt[None, :])
        a = self._transfer(_embed1(self.ent_embeddings, anchor), _embed1(self.ent_transfer, anchor), rt)
        re = _embed1(self.rel_embeddings, r)
        if self.norm_flag:
            ents, a, re = _l2_normalize(ents), _l2_normalize(a), _l2_normalize(re)
        base = a + re if anchor_is_head else a - re
        return _p_norm(ents - base[None, :], self.p_norm)

    def rank_all_tails(self, h: Array, r: Array) -> Array:
        return self._rank_all(h, r, anchor_is_head=True)

    def rank_all_heads(self, t: Array, r: Array) -> Array:
        return self._rank_all(t, r, anchor_is_head=False)

    def score_one_side(self, pos_h, pos_t, pos_r, neg_ent, corrupt_tail):
        # The negative side still needs its own ent_transfer gather, but the
        # positive pair + relation fold into one [B, dim_r] base.
        he = self.ent_embeddings(pos_h)
        te = self.ent_embeddings(pos_t)
        re = self.rel_embeddings(pos_r)
        rt = self.rel_transfer(pos_r)
        hp = self._transfer(he, self.ent_transfer(pos_h), rt)
        tp = self._transfer(te, self.ent_transfer(pos_t), rt)
        ne = self._transfer(
            self.ent_embeddings(neg_ent), self.ent_transfer(neg_ent), rt[:, None, :]
        )
        if self.norm_flag:
            hp, tp, re, ne = (_l2_normalize(x) for x in (hp, tp, re, ne))
        base = jnp.where(corrupt_tail[:, None], hp + re, tp - re)
        dist = _p_norm(ne - base[:, None, :], self.p_norm)
        return self.margin - dist if self.margin is not None else dist

    def regularization(self, h, t, r):
        return _mean_sq(
            self.ent_embeddings(h),
            self.ent_embeddings(t),
            self.rel_embeddings(r),
            self.ent_transfer(h),
            self.ent_transfer(t),
            self.rel_transfer(r),
        )


class DistMult(KGEModel):
    """``sum(h * r * t)`` similarity (higher = better).

    ``margin``/``epsilon``, when both given, switch initialization from
    Xavier to uniform in ``±(margin + epsilon) / dim`` — the RotatE-style
    range the reference's adversarial DistMult preset uses
    (``OpenKE/openke/module/model/DistMult.py:16-32``; the margin plays no
    role in scoring there, only in the init range).
    """

    dim: int = 100
    margin: Optional[float] = None
    epsilon: Optional[float] = None
    LOWER_IS_BETTER = False

    def setup(self):
        if self.margin is not None and self.epsilon is not None:
            rng = (self.margin + self.epsilon) / self.dim
            init = lambda n, d: uniform_embedding(rng)
        else:
            init = xavier_uniform_embedding
        self.ent_embeddings = nn.Embed(
            self.ent_tot, self.dim, embedding_init=init(self.ent_tot, self.dim)
        )
        self.rel_embeddings = nn.Embed(
            self.rel_tot, self.dim, embedding_init=init(self.rel_tot, self.dim)
        )

    def score(self, h, t, r):
        return jnp.sum(self.ent_embeddings(h) * self.rel_embeddings(r) * self.ent_embeddings(t), -1)

    def score_one_side(self, pos_h, pos_t, pos_r, neg_ent, corrupt_tail):
        # Bilinear: score is linear in whichever entity is replaced, so the
        # other two factors fold into one [B, dim] base vector.
        he = self.ent_embeddings(pos_h)
        te = self.ent_embeddings(pos_t)
        re = self.rel_embeddings(pos_r)
        base = jnp.where(corrupt_tail[:, None], he * re, re * te)
        return jnp.sum(self.ent_embeddings(neg_ent) * base[:, None, :], -1)

    def _rank_all(self, anchor: Array, r: Array) -> Array:
        # score(h, t, r) = <h*t, r> is symmetric in h/t, so both sides rank
        # with the same base: one [E, dim] x [dim] matvec per query (an MXU
        # matmul once the Tester vmaps the chunk).  Negated: lower-is-better.
        base = _embed1(self.ent_embeddings, anchor) * _embed1(self.rel_embeddings, r)
        return -(self.ent_embeddings.embedding @ base)

    def rank_all_tails(self, h: Array, r: Array) -> Array:
        return self._rank_all(h, r)

    def rank_all_heads(self, t: Array, r: Array) -> Array:
        return self._rank_all(t, r)

    def regularization(self, h, t, r):
        return _mean_sq(self.ent_embeddings(h), self.ent_embeddings(t), self.rel_embeddings(r))

    def l3_regularization(self):
        return jnp.sum(jnp.abs(self.ent_embeddings.embedding) ** 3) + jnp.sum(
            jnp.abs(self.rel_embeddings.embedding) ** 3
        )


class ComplEx(KGEModel):
    """Trouillon et al. complex bilinear score (higher = better)."""

    dim: int = 100
    LOWER_IS_BETTER = False

    def setup(self):
        mk = lambda n, d: nn.Embed(n, d, embedding_init=xavier_uniform_embedding(n, d))
        self.ent_re_embeddings = mk(self.ent_tot, self.dim)
        self.ent_im_embeddings = mk(self.ent_tot, self.dim)
        self.rel_re_embeddings = mk(self.rel_tot, self.dim)
        self.rel_im_embeddings = mk(self.rel_tot, self.dim)

    def score(self, h, t, r):
        h_re, h_im = self.ent_re_embeddings(h), self.ent_im_embeddings(h)
        t_re, t_im = self.ent_re_embeddings(t), self.ent_im_embeddings(t)
        r_re, r_im = self.rel_re_embeddings(r), self.rel_im_embeddings(r)
        return jnp.sum(
            h_re * t_re * r_re + h_im * t_im * r_re + h_re * t_im * r_im - h_im * t_re * r_im,
            -1,
        )

    def score_one_side(self, pos_h, pos_t, pos_r, neg_ent, corrupt_tail):
        # score = Re(<h, r, conj(t)>) is linear in h and in t separately:
        #   vs t': base = (h_re r_re - h_im r_im,  h_im r_re + h_re r_im)
        #   vs h': base = (t_re r_re + t_im r_im,  t_im r_re - t_re r_im)
        h_re, h_im = self.ent_re_embeddings(pos_h), self.ent_im_embeddings(pos_h)
        t_re, t_im = self.ent_re_embeddings(pos_t), self.ent_im_embeddings(pos_t)
        r_re, r_im = self.rel_re_embeddings(pos_r), self.rel_im_embeddings(pos_r)
        ct = corrupt_tail[:, None]
        base_re = jnp.where(ct, h_re * r_re - h_im * r_im, t_re * r_re + t_im * r_im)
        base_im = jnp.where(ct, h_im * r_re + h_re * r_im, t_im * r_re - t_re * r_im)
        n_re, n_im = self.ent_re_embeddings(neg_ent), self.ent_im_embeddings(neg_ent)
        return jnp.sum(n_re * base_re[:, None, :] + n_im * base_im[:, None, :], -1)

    def _rank_all(self, anchor: Array, r: Array, anchor_is_head: bool) -> Array:
        # Linear in the replaced side (see score_one_side): two matvecs
        # against the re/im tables per query, negated (lower-is-better).
        a_re, a_im = _embed1(self.ent_re_embeddings, anchor), _embed1(self.ent_im_embeddings, anchor)
        r_re, r_im = _embed1(self.rel_re_embeddings, r), _embed1(self.rel_im_embeddings, r)
        if anchor_is_head:  # ranking tails
            base_re = a_re * r_re - a_im * r_im
            base_im = a_im * r_re + a_re * r_im
        else:  # ranking heads
            base_re = a_re * r_re + a_im * r_im
            base_im = a_im * r_re - a_re * r_im
        return -(
            self.ent_re_embeddings.embedding @ base_re
            + self.ent_im_embeddings.embedding @ base_im
        )

    def rank_all_tails(self, h: Array, r: Array) -> Array:
        return self._rank_all(h, r, anchor_is_head=True)

    def rank_all_heads(self, t: Array, r: Array) -> Array:
        return self._rank_all(t, r, anchor_is_head=False)

    def regularization(self, h, t, r):
        return _mean_sq(
            self.ent_re_embeddings(h),
            self.ent_im_embeddings(h),
            self.ent_re_embeddings(t),
            self.ent_im_embeddings(t),
            self.rel_re_embeddings(r),
            self.rel_im_embeddings(r),
        )


class RESCAL(KGEModel):
    """Bilinear form with a full matrix per relation.

    OpenKE's forward returns ``-h^T W_r t`` (distance-like); its ``predict``
    negates it again, inverting the ranking — we rank by ``forward`` directly.
    """

    dim: int = 100
    LOWER_IS_BETTER = True

    def setup(self):
        self.ent_embeddings = nn.Embed(
            self.ent_tot, self.dim, embedding_init=xavier_uniform_embedding(self.ent_tot, self.dim)
        )
        self.rel_matrices = nn.Embed(
            self.rel_tot,
            self.dim * self.dim,
            embedding_init=xavier_uniform_embedding(self.rel_tot, self.dim * self.dim),
        )

    def score(self, h, t, r):
        he = self.ent_embeddings(h)
        te = self.ent_embeddings(t)
        m = self.rel_matrices(r).reshape(*r.shape, self.dim, self.dim)
        tr = jnp.einsum("...ij,...j->...i", m, te)
        return -jnp.sum(he * tr, -1)

    def regularization(self, h, t, r):
        return _mean_sq(self.ent_embeddings(h), self.ent_embeddings(t), self.rel_matrices(r))


class Analogy(KGEModel):
    """ComplEx part + DistMult part; OpenKE forward is the negated sum
    (distance-like), ranked directly (see RESCAL note)."""

    dim: int = 100
    LOWER_IS_BETTER = True

    def setup(self):
        mk = lambda n, d: nn.Embed(n, d, embedding_init=xavier_uniform_embedding(n, d))
        self.ent_re_embeddings = mk(self.ent_tot, self.dim)
        self.ent_im_embeddings = mk(self.ent_tot, self.dim)
        self.rel_re_embeddings = mk(self.rel_tot, self.dim)
        self.rel_im_embeddings = mk(self.rel_tot, self.dim)
        self.ent_embeddings = mk(self.ent_tot, self.dim * 2)
        self.rel_embeddings = mk(self.rel_tot, self.dim * 2)

    def score(self, h, t, r):
        h_re, h_im = self.ent_re_embeddings(h), self.ent_im_embeddings(h)
        t_re, t_im = self.ent_re_embeddings(t), self.ent_im_embeddings(t)
        r_re, r_im = self.rel_re_embeddings(r), self.rel_im_embeddings(r)
        comp = jnp.sum(
            r_re * h_re * t_re + r_re * h_im * t_im + r_im * h_re * t_im - r_im * h_im * t_re,
            -1,
        )
        dist = jnp.sum(self.ent_embeddings(h) * self.ent_embeddings(t) * self.rel_embeddings(r), -1)
        return -comp - dist

    def regularization(self, h, t, r):
        return _mean_sq(
            self.ent_re_embeddings(h),
            self.ent_im_embeddings(h),
            self.ent_embeddings(h),
            self.ent_re_embeddings(t),
            self.ent_im_embeddings(t),
            self.ent_embeddings(t),
            self.rel_re_embeddings(r),
            self.rel_im_embeddings(r),
            self.rel_embeddings(r),
        )


class SimplE(KGEModel):
    """OpenKE's simplified SimplE: ``(<h,r,t> + <h,r_inv,t>)/2`` (higher = better)."""

    dim: int = 100
    LOWER_IS_BETTER = False

    def setup(self):
        mk = lambda n, d: nn.Embed(n, d, embedding_init=xavier_uniform_embedding(n, d))
        self.ent_embeddings = mk(self.ent_tot, self.dim)
        self.rel_embeddings = mk(self.rel_tot, self.dim)
        self.rel_inv_embeddings = mk(self.rel_tot, self.dim)

    def score(self, h, t, r):
        he = self.ent_embeddings(h)
        te = self.ent_embeddings(t)
        return (
            jnp.sum(he * self.rel_embeddings(r) * te, -1)
            + jnp.sum(he * self.rel_inv_embeddings(r) * te, -1)
        ) / 2

    def regularization(self, h, t, r):
        return _mean_sq(
            self.ent_embeddings(h),
            self.ent_embeddings(t),
            self.rel_embeddings(r),
            self.rel_inv_embeddings(r),
        )


class RotatE(KGEModel):
    """Relation as rotation in the complex plane; forward = margin - distance."""

    dim: int = 100
    margin: float = 6.0
    epsilon: float = 2.0
    LOWER_IS_BETTER = False  # forward higher = better; rank = dist - margin

    def setup(self):
        dim_e = self.dim * 2
        ent_range = (self.margin + self.epsilon) / dim_e
        rel_range = (self.margin + self.epsilon) / self.dim
        self.ent_embeddings = nn.Embed(self.ent_tot, dim_e, embedding_init=uniform_embedding(ent_range))
        self.rel_embeddings = nn.Embed(self.rel_tot, self.dim, embedding_init=uniform_embedding(rel_range))
        self._rel_range = rel_range

    def distance(self, h, t, r):
        he = self.ent_embeddings(h)
        te = self.ent_embeddings(t)
        phase = self.rel_embeddings(r) / (self._rel_range / jnp.pi)
        re_r, im_r = jnp.cos(phase), jnp.sin(phase)
        re_h, im_h = jnp.split(he, 2, axis=-1)
        re_t, im_t = jnp.split(te, 2, axis=-1)
        re_s = re_h * re_r - im_h * im_r - re_t
        im_s = re_h * im_r + im_h * re_r - im_t
        return jnp.sum(jnp.sqrt(re_s**2 + im_s**2 + 1e-30), -1)

    def score(self, h, t, r):
        return self.margin - self.distance(h, t, r)

    def rank_scores(self, h, t, r):
        return self.distance(h, t, r) - self.margin

    def score_one_side(self, pos_h, pos_t, pos_r, neg_ent, corrupt_tail):
        # Each r_i is a unit rotation, so multiplying a difference pointwise
        # by conj(r) preserves each |.|:  ||h'∘r - t|| = ||h' - t∘conj(r)||.
        # Both corruption sides therefore reduce to ||e' - base|| with one
        # [B, 2*dim] base: h∘r (tail side) or t∘conj(r) (head side).
        he = self.ent_embeddings(pos_h)
        te = self.ent_embeddings(pos_t)
        phase = self.rel_embeddings(pos_r) / (self._rel_range / jnp.pi)
        re_r, im_r = jnp.cos(phase), jnp.sin(phase)
        re_h, im_h = jnp.split(he, 2, axis=-1)
        re_t, im_t = jnp.split(te, 2, axis=-1)
        ct = corrupt_tail[:, None]
        base_re = jnp.where(ct, re_h * re_r - im_h * im_r, re_t * re_r + im_t * im_r)
        base_im = jnp.where(ct, re_h * im_r + im_h * re_r, im_t * re_r - re_t * im_r)
        ne = self.ent_embeddings(neg_ent)
        re_n, im_n = jnp.split(ne, 2, axis=-1)
        d_re = re_n - base_re[:, None, :]
        d_im = im_n - base_im[:, None, :]
        dist = jnp.sum(jnp.sqrt(d_re**2 + d_im**2 + 1e-30), -1)
        return self.margin - dist

    def _rank_all(self, anchor: Array, r: Array, anchor_is_head: bool) -> Array:
        # Unit rotations preserve pointwise modulus (see score_one_side), so
        # every entity's distance is ||e - base|| against the whole table.
        # Returns raw distance (lower-is-better, the rank_scores contract).
        ae = _embed1(self.ent_embeddings, anchor)
        phase = _embed1(self.rel_embeddings, r) / (self._rel_range / jnp.pi)
        re_r, im_r = jnp.cos(phase), jnp.sin(phase)
        re_a, im_a = jnp.split(ae, 2, axis=-1)
        if anchor_is_head:  # ranking tails: base = h*r
            base_re = re_a * re_r - im_a * im_r
            base_im = re_a * im_r + im_a * re_r
        else:  # ranking heads: base = t*conj(r)
            base_re = re_a * re_r + im_a * im_r
            base_im = im_a * re_r - re_a * im_r
        re_e, im_e = jnp.split(self.ent_embeddings.embedding, 2, axis=-1)
        d_re = re_e - base_re[None, :]
        d_im = im_e - base_im[None, :]
        return jnp.sum(jnp.sqrt(d_re**2 + d_im**2 + 1e-30), -1)

    def rank_all_tails(self, h: Array, r: Array) -> Array:
        return self._rank_all(h, r, anchor_is_head=True)

    def rank_all_heads(self, t: Array, r: Array) -> Array:
        return self._rank_all(t, r, anchor_is_head=False)

    def regularization(self, h, t, r):
        return _mean_sq(self.ent_embeddings(h), self.ent_embeddings(t), self.rel_embeddings(r))


class HolE(KGEModel):
    """Holographic embeddings: circular correlation of h and t scored by r."""

    dim: int = 100
    LOWER_IS_BETTER = False

    def setup(self):
        mk = lambda n, d: nn.Embed(n, d, embedding_init=xavier_uniform_embedding(n, d))
        self.ent_embeddings = mk(self.ent_tot, self.dim)
        self.rel_embeddings = mk(self.rel_tot, self.dim)

    @staticmethod
    def _ccorr(a: Array, b: Array) -> Array:
        fa = jnp.fft.fft(a, axis=-1)
        fb = jnp.fft.fft(b, axis=-1)
        return jnp.real(jnp.fft.ifft(jnp.conj(fa) * fb, axis=-1))

    def score(self, h, t, r):
        corr = self._ccorr(self.ent_embeddings(h), self.ent_embeddings(t))
        return jnp.sum(corr * self.rel_embeddings(r), -1)

    def regularization(self, h, t, r):
        return _mean_sq(self.ent_embeddings(h), self.ent_embeddings(t), self.rel_embeddings(r))
