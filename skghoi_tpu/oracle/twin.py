"""The torch-CPU twin of the reference stage-2 model.

Module names/shapes follow the reference's ``model_state_dict`` key families
(``models/adamixer_transH_spatial_r50_models.py:27-200`` composition,
``heads/adamixer_transH_spatial_r50_head.py`` heads, mmdet ResNet/FPN naming
for the backbone/neck), so a real checkpoint loads via ``load_state_dict``.
The forward is the reference's ragged per-image math — Python loop over
images, meshgrid pair construction, MessageMBF without outer ReLU, adjacency
recomputed from loop-invariant node features, prior power 1.0/2.8 — in plain
torch (the few torchvision ops are reimplemented in
:mod:`skghoi_tpu.oracle.ops`).

Documented deviation: the reference instantiates a *fresh randomly-initialized*
TransH inside every forward (``heads/...head.py:574-578``), which makes its
outputs non-deterministic and untrainable.  The twin holds one persistent
``transh`` submodule (key family ``...box_pair_head.transh.*``) so weights are
shareable with the Flax model; everything downstream of the embedding lookup
is the reference math.  Set ``quirk_box_index_tails=True`` to reproduce the
reference's use of box *indices* as TransH tail entities (``:572``); the
default uses object classes, matching the Flax default.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import torch
import torch.nn.functional as F
from torch import Tensor, nn

from skghoi_tpu.oracle import ops as tops


# ---------------------------------------------------------------------------
# Backbone: ResNet-50 (frozen BN) + FPN, mmdet/torchvision state_dict naming.
# ---------------------------------------------------------------------------
class FrozenBatchNorm2d(nn.Module):
    def __init__(self, num_features: int, eps: float = 1e-5):
        super().__init__()
        self.eps = eps
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))
        self.weight = nn.Parameter(torch.ones(num_features))
        self.bias = nn.Parameter(torch.zeros(num_features))

    def forward(self, x: Tensor) -> Tensor:
        inv = (self.running_var + self.eps).rsqrt() * self.weight
        return x * inv[None, :, None, None] + (self.bias - self.running_mean * inv)[
            None, :, None, None
        ]


class Bottleneck(nn.Module):
    def __init__(self, in_ch: int, width: int, stride: int = 1):
        super().__init__()
        out_ch = width * 4
        self.conv1 = nn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = FrozenBatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = FrozenBatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, out_ch, 1, bias=False)
        self.bn3 = FrozenBatchNorm2d(out_ch)
        if in_ch != out_ch or stride != 1:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                FrozenBatchNorm2d(out_ch),
            )
        else:
            self.downsample = None

    def forward(self, x: Tensor) -> Tensor:
        identity = self.downsample(x) if self.downsample is not None else x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + identity)


class ResNet50Twin(nn.Module):
    """Emits C2..C5; state_dict keys match torchvision/mmdet resnet50."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = FrozenBatchNorm2d(64)
        widths = (64, 128, 256, 512)
        sizes = (3, 4, 6, 3)
        in_ch = 64
        for s, (blocks, width) in enumerate(zip(sizes, widths)):
            layer = []
            for b in range(blocks):
                stride = 2 if (b == 0 and s > 0) else 1
                layer.append(Bottleneck(in_ch, width, stride))
                in_ch = width * 4
            setattr(self, f"layer{s + 1}", nn.Sequential(*layer))

    def forward(self, x: Tensor) -> Tuple[Tensor, ...]:
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            outs.append(x)
        return tuple(outs)


class _ConvModule(nn.Module):
    """mmdet ConvModule shell (conv only, no norm/act in FPN)."""

    def __init__(self, in_ch, out_ch, k, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, padding=padding)

    def forward(self, x):
        return self.conv(x)


class FPNTwin(nn.Module):
    """mmdet FPN naming: lateral_convs.{i}.conv, fpn_convs.{i}.conv."""

    out_channels = 256

    def __init__(self, in_channels=(256, 512, 1024, 2048)):
        super().__init__()
        self.lateral_convs = nn.ModuleList(
            [_ConvModule(c, self.out_channels, 1) for c in in_channels]
        )
        self.fpn_convs = nn.ModuleList(
            [_ConvModule(self.out_channels, self.out_channels, 3, padding=1) for _ in in_channels]
        )

    def forward(self, feats: Tuple[Tensor, ...]) -> Tuple[Tensor, ...]:
        laterals = [conv(f) for conv, f in zip(self.lateral_convs, feats)]
        for i in range(len(laterals) - 2, -1, -1):
            laterals[i] = laterals[i] + F.interpolate(laterals[i + 1], scale_factor=2, mode="nearest")
        return tuple(conv(l) for conv, l in zip(self.fpn_convs, laterals))


# ---------------------------------------------------------------------------
# Heads (reference ``heads/adamixer_transH_spatial_r50_head.py``)
# ---------------------------------------------------------------------------
class MultiBranchFusionTwin(nn.Module):
    """Reference ``MultiBranchFusion`` (``:431-474``): outer ReLU applied."""

    def __init__(self, appearance_size, spatial_size, representation_size, cardinality):
        super().__init__()
        self.cardinality = cardinality
        sub = representation_size // cardinality
        assert sub * cardinality == representation_size
        self.fc_1 = nn.ModuleList([nn.Linear(appearance_size, sub) for _ in range(cardinality)])
        self.fc_2 = nn.ModuleList([nn.Linear(spatial_size, sub) for _ in range(cardinality)])
        self.fc_3 = nn.ModuleList([nn.Linear(sub, representation_size) for _ in range(cardinality)])

    def branch_sum(self, appearance: Tensor, spatial: Tensor) -> Tensor:
        return torch.stack(
            [
                fc_3(F.relu(fc_1(appearance) * fc_2(spatial)))
                for fc_1, fc_2, fc_3 in zip(self.fc_1, self.fc_2, self.fc_3)
            ]
        ).sum(dim=0)

    def forward(self, appearance: Tensor, spatial: Tensor) -> Tensor:
        return F.relu(self.branch_sum(appearance, spatial))


class MessageMBFTwin(MultiBranchFusionTwin):
    """Reference ``MessageMBF`` (``:476-530``): branch sum, NO outer ReLU.

    Broadcasting over the [n_h, n] pair grid replaces the reference's
    repeat/permute gymnastics; the math is identical.
    """

    def forward(self, appearance: Tensor, spatial: Tensor) -> Tensor:
        # appearance broadcasts against spatial's [n_h, n, d] grid.
        return self.branch_sum(appearance, spatial)


class TransHTwin(nn.Module):
    """Reference ``heads/TransH/TransH.py`` (xavier init, raw-entity returns)."""

    def __init__(self, ent_tot: int, rel_tot: int, dim: int = 50, p_norm: int = 2,
                 norm_flag: bool = True):
        super().__init__()
        self.dim = dim
        self.p_norm = p_norm
        self.norm_flag = norm_flag
        self.ent_embeddings = nn.Embedding(ent_tot, dim)
        self.rel_embeddings = nn.Embedding(rel_tot, dim)
        self.norm_vector = nn.Embedding(rel_tot, dim)
        nn.init.xavier_uniform_(self.ent_embeddings.weight.data)
        nn.init.xavier_uniform_(self.rel_embeddings.weight.data)
        nn.init.xavier_uniform_(self.norm_vector.weight.data)

    @staticmethod
    def _transfer(e: Tensor, norm: Tensor) -> Tensor:
        norm = F.normalize(norm, p=2, dim=-1)
        return e - torch.sum(e * norm, -1, True) * norm

    def forward(self, head: Tensor, relation: Tensor, tail: Tensor):
        h_ = self.ent_embeddings(head)
        t_ = self.ent_embeddings(tail)
        r = self.rel_embeddings(relation)
        r_norm = self.norm_vector(relation)
        h = self._transfer(h_, r_norm)
        t = self._transfer(t_, r_norm)
        if self.norm_flag:
            h = F.normalize(h, 2, -1)
            r_n = F.normalize(r, 2, -1)
            t = F.normalize(t, 2, -1)
        else:
            r_n = r
        score = torch.norm(h + r_n - t, self.p_norm, -1)
        return h_, r, r_norm, t_, score


class GraphHeadTwin(nn.Module):
    """Reference ``GraphHead`` (``:586-996``), per-image ragged forward."""

    def __init__(
        self,
        out_channels: int,
        roi_pool_size: int,
        node_encoding_size: int,
        representation_size: int,
        num_cls: int,
        human_idx: int,
        object_class_to_target_class: List[list],
        num_object: int = 80,
        fg_iou_thresh: float = 0.5,
        num_iter: int = 2,
        transh_dim: int = 50,
        quirk_box_index_tails: bool = False,
    ):
        super().__init__()
        self.out_channels = out_channels
        self.roi_pool_size = roi_pool_size
        self.node_encoding_size = node_encoding_size
        self.representation_size = representation_size
        self.num_cls = num_cls
        self.human_idx = human_idx
        self.object_class_to_target_class = object_class_to_target_class
        self.fg_iou_thresh = fg_iou_thresh
        self.num_iter = num_iter
        self.quirk_box_index_tails = quirk_box_index_tails

        self.box_head = nn.Sequential(
            nn.Flatten(start_dim=1),
            nn.Linear(out_channels * roi_pool_size**2, node_encoding_size),
            nn.ReLU(),
            nn.Linear(node_encoding_size, node_encoding_size),
            nn.ReLU(),
        )
        self.adjacency = nn.Linear(representation_size, 1)
        self.sub_to_obj = MessageMBFTwin(node_encoding_size, 1024, representation_size, 16)
        self.obj_to_sub = MessageMBFTwin(node_encoding_size, 1024, representation_size, 16)
        self.norm_h = nn.LayerNorm(node_encoding_size)
        self.norm_o = nn.LayerNorm(node_encoding_size)
        self.spatial_head = nn.Sequential(
            nn.Linear(46, 128), nn.ReLU(), nn.Linear(128, 256), nn.ReLU(),
            nn.Linear(256, 1024), nn.ReLU(),
        )
        self.attention_head = MultiBranchFusionTwin(
            node_encoding_size * 2, 1024, representation_size, 16
        )
        self.avg_pool = nn.AdaptiveAvgPool2d(output_size=1)
        self.attention_head_g = MultiBranchFusionTwin(256, 1024, representation_size, 16)
        self.transh = TransHTwin(num_object, num_cls, dim=transh_dim, p_norm=2, norm_flag=True)
        self.fc_head = nn.Sequential(nn.Linear(node_encoding_size + transh_dim, 1024), nn.ReLU())
        self.fc_tail = nn.Sequential(nn.Linear(node_encoding_size + transh_dim, 1024), nn.ReLU())

    def associate_with_ground_truth(self, boxes_h, boxes_o, targets) -> Tensor:
        n = boxes_h.shape[0]
        labels = torch.zeros(n, self.num_cls)
        x, y = torch.nonzero(
            torch.min(
                tops.box_iou(boxes_h, targets["boxes_h"]),
                tops.box_iou(boxes_o, targets["boxes_o"]),
            )
            >= self.fg_iou_thresh
        ).unbind(1)
        labels[x, targets["labels"][y]] = 1
        return labels

    def compute_prior_scores(self, x, y, scores, object_class) -> Tensor:
        prior_h = torch.zeros(len(x), self.num_cls)
        prior_o = torch.zeros_like(prior_h)
        p = 1.0 if self.training else 2.8
        s_h = scores[x].pow(p)
        s_o = scores[y].pow(p)
        target_cls_idx = [
            self.object_class_to_target_class[obj.item()] for obj in object_class[y]
        ]
        pair_idx = [i for i, tar in enumerate(target_cls_idx) for _ in tar]
        flat_target_idx = [t for tar in target_cls_idx for t in tar]
        prior_h[pair_idx, flat_target_idx] = s_h[pair_idx]
        prior_o[pair_idx, flat_target_idx] = s_o[pair_idx]
        return torch.stack([prior_h, prior_o])

    def forward(self, features, image_shapes, box_features, box_coords, box_labels,
                box_scores, targets=None):
        global_features = self.avg_pool(features[3]).flatten(start_dim=1)
        box_features = self.box_head(box_features)

        num_boxes = [len(b) for b in box_coords]
        counter = 0
        all_boxes_h, all_boxes_o, all_object_class = [], [], []
        all_labels, all_prior, all_pairs = [], [], []
        all_transh = []
        for b_idx, (coords, labels, scores) in enumerate(zip(box_coords, box_labels, box_scores)):
            n = num_boxes[b_idx]
            n_h = int(torch.sum(labels == self.human_idx).item())
            if n_h == 0 or n <= 1:
                all_pairs.append(torch.zeros(0, 2 * self.representation_size))
                all_boxes_h.append(torch.zeros(0, 4))
                all_boxes_o.append(torch.zeros(0, 4))
                all_object_class.append(torch.zeros(0, dtype=torch.int64))
                all_prior.append(torch.zeros(2, 0, self.num_cls))
                if targets is not None:
                    # mirror the normal path: labels exist only in training,
                    # else postprocess's labels/images zip desynchronizes
                    all_labels.append(torch.zeros(0, self.num_cls))
                counter += n
                continue
            if not torch.all(labels[:n_h] == self.human_idx):
                raise ValueError("Human detections are not permuted to the top")

            node_encodings = box_features[counter: counter + n]
            h_node_encodings = node_encodings[:n_h]
            x, y = torch.meshgrid(torch.arange(n_h), torch.arange(n), indexing="ij")
            x_keep, y_keep = torch.nonzero(x != y).unbind(1)
            x = x.flatten()
            y = y.flatten()

            box_pair_spatial = tops.compute_spatial_ratio_encodings(
                [coords[x]], [coords[y]], [image_shapes[b_idx]]
            )
            box_pair_spatial = torch.nan_to_num(box_pair_spatial)

            # TransH lookup (ref transh_head, ``:558-582``): head = human
            # class entity; relation enumerates all verbs; tail = box index
            # (quirk) or the box's object class.
            if self.quirk_box_index_tails:
                tail_ids = y.clone()
            else:
                tail_ids = labels[y].long()
            tail_ids = tail_ids.clamp(max=self.transh.ent_embeddings.num_embeddings - 1)
            relations = torch.arange(self.num_cls, dtype=torch.int64).repeat(len(x))
            heads = torch.full((len(x) * self.num_cls,), self.human_idx, dtype=torch.int64)
            tails = tail_ids.repeat_interleave(self.num_cls)
            th_h, th_r, th_rn, th_t, th_score = self.transh(heads, relations, tails)

            # One (head, tail) embedding per pair: the idx %% num_cls == 0 rows.
            head_stack = th_h[:: self.num_cls]
            tail_stack = th_t[:: self.num_cls]
            graph_human_node = self.fc_head(torch.cat((h_node_encodings[x], head_stack), 1))
            graph_object_node = self.fc_tail(torch.cat((node_encodings[y], tail_stack), 1))

            box_pair_spatial_mapped = self.spatial_head(box_pair_spatial)
            box_pair_spatial_reshaped = box_pair_spatial_mapped.reshape(n_h, n, -1)

            for _ in range(self.num_iter):
                app = torch.cat([graph_human_node, graph_object_node], 1)
                weights = self.attention_head(app, box_pair_spatial_mapped)
                adjacency_matrix = self.adjacency(weights).reshape(n_h, n)

                all_entity_encoding = graph_object_node[0:n]
                h_entity_encoding = graph_human_node[::n]
                o_t_s = self.obj_to_sub(
                    all_entity_encoding[None, :, :], box_pair_spatial_reshaped
                )
                messages_to_h = F.relu(
                    torch.sum(adjacency_matrix.softmax(dim=1)[..., None] * o_t_s, dim=1)
                )
                h_node_enc_new = self.norm_h(h_entity_encoding + messages_to_h)

                s_t_o = self.sub_to_obj(
                    h_entity_encoding[:, None, :], box_pair_spatial_reshaped
                )
                messages_to_o = F.relu(
                    torch.sum(
                        adjacency_matrix.t().softmax(dim=1).t()[..., None] * s_t_o, dim=0
                    )
                )
                node_enc_new = self.norm_o(all_entity_encoding + messages_to_o)
            h_node_encodings_mp = h_node_enc_new
            node_encodings_mp = node_enc_new

            th_score_grid = th_score.reshape(n_h, n, self.num_cls)

            if targets is not None:
                target_label = self.associate_with_ground_truth(
                    coords[x_keep], coords[y_keep], targets[b_idx]
                )
                all_labels.append(target_label)
                th_keep = th_score_grid[x_keep, y_keep]
                pos_x, pos_y = torch.nonzero(target_label).unbind(1)
                neg_xy = (target_label == 0).nonzero()
                rand_columns = torch.randperm(neg_xy.size()[0])[: len(pos_x)]
                neg_x, neg_y = neg_xy[rand_columns].unbind(1)
                all_transh.append((th_keep[pos_x, pos_y], th_keep[neg_x, neg_y]))

            n_h_e = h_node_encodings_mp[x_keep]
            n_e = node_encodings_mp[y_keep]
            b_p_s_r = box_pair_spatial_reshaped[x_keep, y_keep]
            attention1 = self.attention_head(torch.cat([n_h_e, n_e], 1), b_p_s_r)
            attention2 = self.attention_head_g(global_features[b_idx, None], b_p_s_r)
            all_pairs.append(torch.cat([attention1, attention2], dim=1))
            all_boxes_h.append(coords[x_keep])
            all_boxes_o.append(coords[y_keep])
            all_object_class.append(labels[y_keep])
            all_prior.append(self.compute_prior_scores(x_keep, y_keep, scores, labels))
            counter += n

        return (all_pairs, all_boxes_h, all_boxes_o, all_object_class, all_labels,
                all_prior, all_transh)


class InteractionHeadTwin(nn.Module):
    """Reference ``InteractionHead`` (``:29-429``)."""

    def __init__(
        self,
        box_pair_head: GraphHeadTwin,
        box_pair_suppressor: nn.Linear,
        box_pair_predictor: nn.Linear,
        human_idx: int,
        num_classes: int,
        box_nms_thresh: float = 0.5,
        box_score_thresh: float = 0.2,
        max_human: int = 15,
        max_object: int = 15,
    ):
        super().__init__()
        self.box_pair_head = box_pair_head
        self.box_pair_suppressor = box_pair_suppressor
        self.box_pair_predictor = box_pair_predictor
        self.num_classes = num_classes
        self.human_idx = human_idx
        self.box_nms_thresh = box_nms_thresh
        self.box_score_thresh = box_score_thresh
        self.max_human = max_human
        self.max_object = max_object

    def preprocess(self, detections, targets, append_gt=None):
        results = []
        for b_idx, detection in enumerate(detections):
            boxes = detection["boxes"]
            labels = detection["labels"]
            scores = detection["scores"]
            if append_gt is None:
                append_gt = self.training
            if append_gt:
                target = targets[b_idx]
                n = target["boxes_h"].shape[0]
                boxes = torch.cat([target["boxes_h"], target["boxes_o"], boxes])
                scores = torch.cat([torch.ones(2 * n), scores])
                labels = torch.cat(
                    [self.human_idx * torch.ones(n).long(), target["object"], labels]
                )
            active_idx = torch.nonzero(scores >= self.box_score_thresh).squeeze(1)
            keep_idx = tops.batched_nms(
                boxes[active_idx], scores[active_idx], labels[active_idx], self.box_nms_thresh
            )
            active_idx = active_idx[keep_idx]
            sorted_idx = torch.argsort(scores[active_idx], descending=True)
            active_idx = active_idx[sorted_idx]
            h_idx = torch.nonzero(labels[active_idx] == self.human_idx).squeeze(1)
            o_idx = torch.nonzero(labels[active_idx] != self.human_idx).squeeze(1)
            if len(h_idx) > self.max_human:
                h_idx = h_idx[: self.max_human]
            if len(o_idx) > self.max_object:
                o_idx = o_idx[: self.max_object]
            keep_idx = torch.cat([h_idx, o_idx])
            active_idx = active_idx[keep_idx]
            results.append(
                dict(
                    boxes=boxes[active_idx].view(-1, 4),
                    labels=labels[active_idx].view(-1),
                    scores=scores[active_idx].view(-1),
                )
            )
        return results

    def compute_interaction_classification_loss(self, results):
        scores = torch.cat([r["scores"] for r in results])
        labels = torch.cat([r["labels"] for r in results])
        n_p = len(torch.nonzero(labels))
        return tops.binary_focal_loss(scores, labels, reduction="sum", gamma=0.2) / n_p

    def compute_interactiveness_loss(self, results):
        weights = torch.cat([r["weights"] for r in results])
        labels = torch.cat([r["unary_labels"] for r in results])
        n_p = len(torch.nonzero(labels))
        return tops.binary_focal_loss(weights, labels, reduction="sum", gamma=2.0) / n_p

    def compute_transh_loss(self, transh_pairs, results, margin: float = 1.0):
        """Coherent semantics of ref ``:207-235`` (the committed call is a
        TypeError): margin ranking of positive vs sampled negative TransH
        distances, normalized by n_p."""
        labels = torch.cat([r["unary_labels"] for r in results])
        n_p = max(len(torch.nonzero(labels)), 1)
        losses = []
        for pos, neg in transh_pairs:
            if len(pos):
                losses.append(torch.clamp(pos - neg + margin, min=0).sum())
        if not losses:
            return torch.zeros(())
        return torch.stack(losses).sum() / n_p

    def postprocess(self, logits_p, logits_s, prior, boxes_h, boxes_o, object_class, labels):
        num_boxes = [len(b) for b in boxes_h]
        weights = torch.sigmoid(logits_s).squeeze(1)
        scores = torch.sigmoid(logits_p)
        weights = weights.split(num_boxes)
        scores = scores.split(num_boxes)
        if len(labels) == 0:
            labels = [None for _ in range(len(num_boxes))]
        results = []
        for w, s, p, b_h, b_o, o, l in zip(
            weights, scores, prior, boxes_h, boxes_o, object_class, labels
        ):
            x, y = torch.nonzero(p[0]).unbind(1)
            action_score = s[x, y] * p[:, x, y].prod(dim=0) * w[x].detach()
            result_dict = dict(
                boxes_h=b_h, boxes_o=b_o, index=x, prediction=y,
                scores=action_score, object=o, prior=p[:, x, y], weights=w,
            )
            if l is not None:
                result_dict["labels"] = l[x, y]
                result_dict["unary_labels"] = l.sum(dim=1).clamp(max=1)
            results.append(result_dict)
        return results

    def forward(self, features, detections, image_shapes, targets=None):
        if self.training:
            assert targets is not None
        detections = self.preprocess(detections, targets)
        box_coords = [d["boxes"] for d in detections]
        box_labels = [d["labels"] for d in detections]
        box_scores = [d["scores"] for d in detections]
        box_features = torch.cat(
            [
                tops.multiscale_roi_align([f[i] for f in features], coords)
                for i, coords in enumerate(box_coords)
            ]
        )
        (pair_feats, boxes_h, boxes_o, object_class, pair_labels, pair_prior,
         transh_pairs) = self.box_pair_head(
            features, image_shapes, box_features, box_coords, box_labels, box_scores, targets
        )
        pair_feats = torch.cat(pair_feats)
        logits_p = self.box_pair_predictor(pair_feats)
        logits_s = self.box_pair_suppressor(pair_feats)
        results = self.postprocess(
            logits_p, logits_s, pair_prior, boxes_h, boxes_o, object_class, pair_labels
        )
        if self.training:
            loss_dict = dict(
                hoi_loss=self.compute_interaction_classification_loss(results),
                interactiveness_loss=self.compute_interactiveness_loss(results),
                transh_loss=self.compute_transh_loss(transh_pairs, results),
            )
            results.append(loss_dict)
        return results


class HOITransformTwin(nn.Module):
    """Reference ``HOINetworkTransform`` (normalize -> F.interpolate resize ->
    pad).  ``fixed_canvas`` pads every image to one canvas (the Flax
    pipeline's two-canvas scheme) instead of torchvision's batch-max+32."""

    def __init__(self, min_size=800, max_size=1333,
                 image_mean=(0.485, 0.456, 0.406), image_std=(0.229, 0.224, 0.225),
                 fixed_canvas: Optional[Tuple[int, int]] = None):
        super().__init__()
        self.min_size = min_size
        self.max_size = max_size
        self.register_buffer("mean", torch.tensor(image_mean).view(3, 1, 1))
        self.register_buffer("std", torch.tensor(image_std).view(3, 1, 1))
        self.fixed_canvas = fixed_canvas

    def resize(self, image: Tensor) -> Tensor:
        h, w = image.shape[-2:]
        scale = min(self.min_size / min(h, w), self.max_size / max(h, w))
        return F.interpolate(
            image[None], scale_factor=scale, mode="bilinear",
            align_corners=False, recompute_scale_factor=True,
        )[0]

    def forward(self, images: List[Tensor]):
        out_sizes = []
        resized = []
        for img in images:
            img = (img - self.mean) / self.std
            img = self.resize(img)
            out_sizes.append(tuple(img.shape[-2:]))
            resized.append(img)
        if self.fixed_canvas is not None:
            ch, cw = self.fixed_canvas
        else:
            ch = int(math.ceil(max(i.shape[-2] for i in resized) / 32) * 32)
            cw = int(math.ceil(max(i.shape[-1] for i in resized) / 32) * 32)
        batch = resized[0].new_zeros(len(resized), 3, ch, cw)
        for i, img in enumerate(resized):
            batch[i, :, : img.shape[-2], : img.shape[-1]] = img
        return batch, out_sizes


class SpatiallyConditionedGraphTwin(nn.Module):
    """Full reference model composition (``models/...models.py:118-200``)."""

    def __init__(
        self,
        object_to_action: List[list],
        human_idx: int,
        num_classes: int = 117,
        num_object: int = 80,
        box_score_thresh: float = 0.2,
        box_nms_thresh: float = 0.5,
        max_human: int = 15,
        max_object: int = 15,
        num_iterations: int = 2,
        fg_iou_thresh: float = 0.5,
        transh_dim: int = 50,
        quirk_box_index_tails: bool = False,
        fixed_canvas: Optional[Tuple[int, int]] = None,
    ):
        super().__init__()
        self.detector_backbone = ResNet50Twin()
        self.detector_neck = FPNTwin()
        box_pair_head = GraphHeadTwin(
            out_channels=256,
            roi_pool_size=7,
            node_encoding_size=1024,
            representation_size=1024,
            num_cls=num_classes,
            human_idx=human_idx,
            object_class_to_target_class=object_to_action,
            num_object=num_object,
            fg_iou_thresh=fg_iou_thresh,
            num_iter=num_iterations,
            transh_dim=transh_dim,
            quirk_box_index_tails=quirk_box_index_tails,
        )
        self.interaction_head = InteractionHeadTwin(
            box_pair_head=box_pair_head,
            box_pair_suppressor=nn.Linear(2048, 1),
            box_pair_predictor=nn.Linear(2048, num_classes),
            human_idx=human_idx,
            num_classes=num_classes,
            box_nms_thresh=box_nms_thresh,
            box_score_thresh=box_score_thresh,
            max_human=max_human,
            max_object=max_object,
        )
        self.transform = HOITransformTwin(fixed_canvas=fixed_canvas)

    def forward(self, images: List[Tensor], detections: List[dict],
                targets: Optional[List[dict]] = None, postprocess_boxes: bool = False):
        original_sizes = [img.shape[-2:] for img in images]
        batch, image_sizes = self.transform(images)
        detections = [dict(d) for d in detections]
        for det, o_s, n_s in zip(detections, original_sizes, image_sizes):
            det["boxes"] = tops.resize_boxes(det["boxes"], o_s, n_s)
        if targets is not None:
            targets = [dict(t) for t in targets]
            for tgt, o_s, n_s in zip(targets, original_sizes, image_sizes):
                tgt["boxes_h"] = tops.resize_boxes(tgt["boxes_h"], o_s, n_s)
                tgt["boxes_o"] = tops.resize_boxes(tgt["boxes_o"], o_s, n_s)

        feats = self.detector_neck(self.detector_backbone(batch))
        results = self.interaction_head(feats, detections, image_sizes, targets)
        if postprocess_boxes and results is not None:
            body = results[:-1] if self.training else results
            for pred, im_s, o_im_s in zip(body, image_sizes, original_sizes):
                pred["boxes_h"] = tops.resize_boxes(pred["boxes_h"], im_s, o_im_s)
                pred["boxes_o"] = tops.resize_boxes(pred["boxes_o"], im_s, o_im_s)
        return results
