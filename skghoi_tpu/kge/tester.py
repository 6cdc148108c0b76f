"""Link-prediction and triple-classification evaluation, ranked on device.

Reference flow (``OpenKE/openke/config/Tester.py:70-91`` + ``Test.h``): for
each test triple, score **all entities** substituted as head and as tail, then
count entities scoring strictly better than the ground truth — raw, filtered
(excluding any known train/valid/test triple), and optionally type-constrained.
Rank semantics: lower ``rank_scores`` = better; ``rank = 1 + #{j != gt :
s_j < s_gt}``; hits@k = rank <= k; final metrics average the head and tail
sides over the test set (``Test.h:230-277``).

TPU design: test triples are processed in fixed-size chunks; each chunk scores
a ``[C, E]`` grid in one jitted call (embedding gathers broadcast over the
entity axis — a matmul for bilinear models), and the known-triple filter is the
same branch-free lexicographic binary search the sampler uses.  The C++
reference path streams one triple at a time through a pointer into Test.h; here
the whole rank computation lives on device and only per-chunk rank vectors
come back to host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from skghoi_tpu.kge.data import KGData
from skghoi_tpu.kge.sampling import NumpySampler, TripleHashSet

Array = jax.Array


@dataclass
class LinkPredictionResult:
    mrr: float
    mr: float
    hit10: float
    hit3: float
    hit1: float
    raw: Dict[str, float]

    def __iter__(self):  # keeps the reference's tuple-return usable
        return iter((self.mrr, self.mr, self.hit10, self.hit3, self.hit1))


class Tester:
    def __init__(self, model, params, data: KGData, chunk_size: int = 16):
        self.model = model
        self.params = params
        self.data = data
        self.chunk_size = chunk_size

        # Known-triple filter over train+valid+test: cuckoo hash, 2 gathers per
        # query (the [C, E] filter grids make gather count the dominant cost).
        allt = np.concatenate([data.train, data.valid, data.test], axis=0)
        self._known = TripleHashSet(allt[:, 0], allt[:, 2], allt[:, 1])

        ent_tot = data.ent_tot

        def chunk_ranks(params, h, t, r, valid_mask, type_mask):
            """h/t/r: [C]; returns raw/filtered/constrained ranks, both sides."""
            ents = jnp.arange(ent_tot, dtype=jnp.int32)[None, :]  # [1, E]
            hb = jnp.broadcast_to(h[:, None], (h.shape[0], ent_tot))
            tb = jnp.broadcast_to(t[:, None], (h.shape[0], ent_tot))
            rb = jnp.broadcast_to(r[:, None], (h.shape[0], ent_tot))
            eb = jnp.broadcast_to(ents, (h.shape[0], ent_tot))

            def side(sub_ent_scores, gt, known, cand_mask):
                gt_score = jnp.take_along_axis(sub_ent_scores, gt[:, None], axis=1)
                better = sub_ent_scores < gt_score  # strict, Test.h:86-92
                not_gt = eb != gt[:, None]
                raw = 1 + jnp.sum(better & not_gt, axis=1)
                filt = 1 + jnp.sum(better & not_gt & ~known, axis=1)
                cons = 1 + jnp.sum(better & not_gt & cand_mask, axis=1)
                cons_filt = 1 + jnp.sum(better & not_gt & cand_mask & ~known, axis=1)
                return raw, filt, cons, cons_filt

            # Models with per-relation projections (TransR) expose rank_all_*
            # fast paths: one matmul over the entity table per query instead
            # of gathering a transfer matrix per (triple, entity).
            if hasattr(type(model), "rank_all_tails"):
                head_scores = jax.vmap(
                    lambda tt, rr: model.apply(params, tt, rr, method="rank_all_heads")
                )(t, r)
                tail_scores = jax.vmap(
                    lambda hh, rr: model.apply(params, hh, rr, method="rank_all_tails")
                )(h, r)
            else:
                head_scores = model.apply(params, eb, tb, rb, method="rank_scores")
                tail_scores = model.apply(params, hb, eb, rb, method="rank_scores")

            known_h = self._known.contains(eb, rb, tb)
            head_ranks = side(head_scores, h, known_h, type_mask[0])

            known_t = self._known.contains(hb, rb, eb)
            tail_ranks = side(tail_scores, t, known_t, type_mask[1])

            return head_ranks, tail_ranks

        self._chunk_ranks = jax.jit(chunk_ranks)

    def _type_masks(self, r_chunk: np.ndarray) -> jnp.ndarray:
        """[2, C, E] admissible-head/tail masks for each triple's relation."""
        C, E = len(r_chunk), self.data.ent_tot
        masks = np.zeros((2, C, E), bool)
        if self.data.head_type is not None:
            for i, r in enumerate(r_chunk):
                masks[0, i, self.data.head_type.get(int(r), np.zeros(0, np.int64))] = True
                masks[1, i, self.data.tail_type.get(int(r), np.zeros(0, np.int64))] = True
        return jnp.asarray(masks)

    def run_link_prediction(
        self, type_constrain: bool = False, log_fn=print
    ) -> LinkPredictionResult:
        test = self.data.test
        n = len(test)
        assert n > 0, "No test triples loaded"
        C = self.chunk_size

        head_raw = []
        head_filt = []
        tail_raw = []
        tail_filt = []
        head_cons = []
        tail_cons = []

        for start in range(0, n, C):
            chunk = test[start : start + C]
            pad = C - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            h = jnp.asarray(chunk[:, 0], jnp.int32)
            t = jnp.asarray(chunk[:, 1], jnp.int32)
            r = jnp.asarray(chunk[:, 2], jnp.int32)
            tm = (
                self._type_masks(chunk[:, 2])
                if type_constrain
                else jnp.zeros((2, C, self.data.ent_tot), bool)
            )
            (hr, hf, hc, hcf), (tr, tf, tc, tcf) = self._chunk_ranks(
                self.params, h, t, r, None, tm
            )
            keep = slice(0, C - pad) if pad else slice(None)
            head_raw.append(np.asarray(hr)[keep])
            head_filt.append(np.asarray(hf)[keep])
            tail_raw.append(np.asarray(tr)[keep])
            tail_filt.append(np.asarray(tf)[keep])
            if type_constrain:
                head_cons.append(np.asarray(hcf)[keep])
                tail_cons.append(np.asarray(tcf)[keep])

        def agg(ranks):
            ranks = np.concatenate(ranks).astype(np.float64)
            return dict(
                mrr=float(np.mean(1.0 / ranks)),
                mr=float(np.mean(ranks)),
                hit10=float(np.mean(ranks <= 10)),
                hit3=float(np.mean(ranks <= 3)),
                hit1=float(np.mean(ranks <= 1)),
            )

        l_raw, r_raw = agg(head_raw), agg(tail_raw)
        l_f, r_f = agg(head_filt), agg(tail_filt)

        def avg(a, b):
            return {k: (a[k] + b[k]) / 2 for k in a}

        raw_avg, filt_avg = avg(l_raw, r_raw), avg(l_f, r_f)

        log_fn("no type constraint results:")
        log_fn("metric:\t\t\t MRR \t\t MR \t\t hit@10 \t hit@3  \t hit@1")
        for name, m in (("l(raw)", l_raw), ("r(raw)", r_raw), ("averaged(raw)", raw_avg)):
            log_fn(
                f"{name}:\t\t {m['mrr']:f} \t {m['mr']:f} \t {m['hit10']:f} \t {m['hit3']:f} \t {m['hit1']:f}"
            )
        for name, m in (("l(filter)", l_f), ("r(filter)", r_f), ("averaged(filter)", filt_avg)):
            log_fn(
                f"{name}:\t {m['mrr']:f} \t {m['mr']:f} \t {m['hit10']:f} \t {m['hit3']:f} \t {m['hit1']:f}"
            )
        if type_constrain:
            cons_avg = avg(agg(head_cons), agg(tail_cons))
            log_fn(
                f"type-constrained(filter): MRR {cons_avg['mrr']:f} MR {cons_avg['mr']:f} "
                f"hit@10 {cons_avg['hit10']:f} hit@3 {cons_avg['hit3']:f} hit@1 {cons_avg['hit1']:f}"
            )
            filt_avg = cons_avg

        return LinkPredictionResult(
            mrr=filt_avg["mrr"],
            mr=filt_avg["mr"],
            hit10=filt_avg["hit10"],
            hit3=filt_avg["hit3"],
            hit1=filt_avg["hit1"],
            raw=raw_avg,
        )

    # ------------------------------------------------------------------
    # Triple classification (Tester.py:93-151)
    # ------------------------------------------------------------------
    def _score_triples(self, triples: np.ndarray) -> np.ndarray:
        out = []
        C = max(self.chunk_size * 64, 256)
        for start in range(0, len(triples), C):
            chunk = triples[start : start + C]
            s = self.model.apply(
                self.params,
                jnp.asarray(chunk[:, 0], jnp.int32),
                jnp.asarray(chunk[:, 1], jnp.int32),
                jnp.asarray(chunk[:, 2], jnp.int32),
                method="rank_scores",
            )
            out.append(np.asarray(s))
        return np.concatenate(out)

    @staticmethod
    def _corrupt_for_classification(data: KGData, triples: np.ndarray, seed: int) -> np.ndarray:
        """One filtered corruption per triple (50/50 head/tail), as getNegTest."""
        sampler = NumpySampler(data, seed=seed)
        rng = np.random.default_rng(seed + 1)
        out = triples.copy()
        for i, (h, t, r) in enumerate(triples):
            if rng.random() < 0.5:
                out[i, 1] = sampler._corrupt(
                    sampler._ht_keys, sampler._ht_tails, h * data.rel_tot + r, 1
                )[0]
            else:
                out[i, 0] = sampler._corrupt(
                    sampler._th_keys, sampler._th_heads, t * data.rel_tot + r, 1
                )[0]
        return out

    @staticmethod
    def get_best_threshold(score: np.ndarray, ans: np.ndarray) -> Tuple[float, float]:
        """Accuracy-maximizing threshold sweep (Tester.py:93-113 semantics)."""
        order = np.argsort(score, kind="stable")
        s, a = score[order], ans[order]
        total = float(len(score))
        total_false = total - a.sum()
        tp = np.cumsum(a)  # positives with score <= s[i]
        acc = (2 * tp + total_false - np.arange(1, len(s) + 1)) / total
        best = int(np.argmax(acc))
        return float(s[best]), float(acc[best])

    def run_triple_classification(
        self, threshold: Optional[float] = None, seed: int = 0
    ) -> Tuple[float, float]:
        data = self.data
        neg_test = self._corrupt_for_classification(data, data.test, seed)
        pos_scores = self._score_triples(data.test)
        neg_scores = self._score_triples(neg_test)

        if threshold is None:
            if len(data.valid):
                neg_valid = self._corrupt_for_classification(data, data.valid, seed + 7)
                v_scores = np.concatenate(
                    [self._score_triples(data.valid), self._score_triples(neg_valid)]
                )
                v_ans = np.concatenate(
                    [np.ones(len(data.valid)), np.zeros(len(neg_valid))]
                )
            else:
                v_scores = np.concatenate([pos_scores, neg_scores])
                v_ans = np.concatenate([np.ones(len(pos_scores)), np.zeros(len(neg_scores))])
            threshold, _ = self.get_best_threshold(v_scores, v_ans)

        scores = np.concatenate([pos_scores, neg_scores])
        ans = np.concatenate([np.ones(len(pos_scores)), np.zeros(len(neg_scores))])
        pred = scores <= threshold  # lower rank-score = plausible
        acc = float(np.mean(pred == ans.astype(bool)))
        return acc, float(threshold)
