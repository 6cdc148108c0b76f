"""Host data pipeline: transforms, factory, padded loader."""

import numpy as np
import pytest

from skghoi_tpu.data.factory import DataFactory, HOILoader, collate
from skghoi_tpu.data.synthetic import make_synthetic_hicodet
from skghoi_tpu.data.transforms import resize_scale, resized_size, scale_boxes


@pytest.fixture(scope="module")
def factory(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipe"))
    make_synthetic_hicodet(root, "train2015", num_images=6)
    return DataFactory(
        "hicodet",
        "train2015",
        root,
        root + "/detections_train2015",
        min_size=64,
        max_size=107,
        canvas_landscape=(64, 96),
        canvas_portrait=(96, 64),
    )


def test_resize_rule_matches_torchvision_semantics():
    # min side -> 800 unless the max side would exceed 1333.
    assert resize_scale(480, 640) == 800 / 480
    assert resize_scale(400, 1000) == pytest.approx(1333 / 1000)
    h, w = resized_size(480, 640, resize_scale(480, 640))
    assert h == 800 and w <= 1333


def test_scale_boxes_roundtrip():
    boxes = np.asarray([[10.0, 20.0, 30.0, 40.0]])
    out = scale_boxes(boxes, (100, 200), (50, 100))
    np.testing.assert_allclose(out, [[5, 10, 15, 20]])
    back = scale_boxes(out, (50, 100), (100, 200))
    np.testing.assert_allclose(back, boxes)


def test_factory_sample_contract(factory):
    s = factory[0]
    assert s["image"].shape == (64, 96, 3) or s["image"].shape == (96, 64, 3)
    assert s["image"].dtype == np.float32
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0
    nh, nw = s["image_size"]
    assert nh <= s["image"].shape[0] and nw <= s["image"].shape[1]
    # boxes are in resized space -> inside the resized area (small slack)
    for key in ("det_boxes", "gt_boxes_h", "gt_boxes_o"):
        b = s[key]
        assert (b[:, 2] <= nw + 4).all() and (b[:, 3] <= nh + 4).all(), key
    # HICO pixel-index correction applied: x1 of GT shifted by 1 relative to raw
    raw = factory.dataset.raw_target(0)
    scale_x = nw / s["original_size"][1]
    np.testing.assert_allclose(
        s["gt_boxes_h"][0][0], (raw["boxes_h"][0][0] - 1) * scale_x, rtol=1e-5
    )


def test_collate_pads_and_masks(factory):
    samples = [factory[i] for i in range(2)]
    if samples[0]["canvas"] != samples[1]["canvas"]:
        samples[1] = samples[0]
    batch = collate(samples)
    assert batch.det_boxes.shape[1] == 128
    for i, s in enumerate(samples):
        m = len(s["det_boxes"])
        assert batch.det_valid[i, :m].all() and not batch.det_valid[i, m:].any()
        g = len(s["gt_boxes_h"])
        assert batch.targets.valid[i, :g].all() and not batch.targets.valid[i, g:].any()


def test_loader_shards_partition_everything(factory):
    all_seen = []
    for shard in range(2):
        loader = HOILoader(factory, 2, shuffle=False, num_shards=2, shard_index=shard)
        for _, idx in loader:
            all_seen.extend(idx)
    assert sorted(all_seen) == list(range(len(factory)))


def test_loader_batches_single_canvas(factory):
    loader = HOILoader(factory, 3, shuffle=True)
    for batch, idx in loader:
        assert len({batch.images.shape[1:3]}) == 1
        assert len(idx) <= 3


def test_flip_consistency(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("flip"))
    make_synthetic_hicodet(root, "train2015", num_images=4)
    f_plain = DataFactory("hicodet", "train2015", root, root + "/detections_train2015",
                          min_size=64, max_size=107, canvas_landscape=(64, 96),
                          canvas_portrait=(96, 64), flip=False)
    f_flip = DataFactory("hicodet", "train2015", root, root + "/detections_train2015",
                         min_size=64, max_size=107, canvas_landscape=(64, 96),
                         canvas_portrait=(96, 64), flip=True, seed=3)
    flipped_idx = [i for i in range(4) if f_flip._flip[i]]
    if not flipped_idx:
        pytest.skip("no flipped samples for this seed")
    i = flipped_idx[0]
    a, b = f_plain[i], f_flip[i]
    nh, nw = a["image_size"]
    # flipped image mirrors the resized region
    np.testing.assert_allclose(
        a["image"][: int(nh), : int(nw)][:, ::-1], b["image"][: int(nh), : int(nw)], atol=0.35
    )
    # x-coordinates mirror; y unchanged
    np.testing.assert_allclose(b["gt_boxes_h"][:, 1], a["gt_boxes_h"][:, 1], rtol=1e-5)
    w_orig = a["original_size"][1]
    scale = nw / w_orig
    np.testing.assert_allclose(
        b["gt_boxes_h"][:, 0], (w_orig - a["gt_boxes_h"][:, 2] / scale) * scale, rtol=1e-4
    )


def test_bilinear_resize_matches_torch_interpolate():
    """bilinear_resize must replicate the reference resize exactly:
    F.interpolate(..., mode='bilinear', align_corners=False,
    recompute_scale_factor=True) (ref transforms.py:40-46)."""
    import torch
    import torch.nn.functional as TF
    from skghoi_tpu.data.transforms import bilinear_resize, resize_scale, resized_size

    rng = np.random.default_rng(0)
    for (h, w) in [(480, 640), (333, 500), (1024, 683), (57, 1203)]:
        img = rng.random((h, w, 3)).astype(np.float32)
        scale = resize_scale(h, w)
        nh, nw = resized_size(h, w, scale)
        want = TF.interpolate(
            torch.from_numpy(img).permute(2, 0, 1)[None],
            scale_factor=scale, mode="bilinear", align_corners=False,
            recompute_scale_factor=True,
        )[0].permute(1, 2, 0).numpy()
        assert want.shape[:2] == (nh, nw), (want.shape, nh, nw)
        got = bilinear_resize(img, nh, nw)
        # torch's CPU kernel rounds interpolation weights to float32 in a
        # slightly different order; the residual (<=5e-5 on a [0,1] scale) is
        # ~80x below one uint8 quantization step.
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_canvas_pad_region_is_mean_pixel():
    from PIL import Image
    from skghoi_tpu import constants as C
    from skghoi_tpu.data.transforms import prepare_image

    img = Image.new("RGB", (640, 480), (200, 30, 90))
    out, (nh, nw), _ = prepare_image(img, C.CANVAS_LANDSCAPE)
    np.testing.assert_allclose(
        out[nh:, :], np.broadcast_to(np.asarray(C.IMAGE_MEAN, np.float32),
                                     out[nh:, :].shape), atol=1e-6)
    np.testing.assert_allclose(
        out[:, nw:], np.broadcast_to(np.asarray(C.IMAGE_MEAN, np.float32),
                                     out[:, nw:].shape), atol=1e-6)


def test_threaded_loader_matches_synchronous(factory):
    """num_workers > 0 must change only the schedule, not a single byte of
    the batches: same order, same collated contents as the sync loader."""
    import numpy as np

    from skghoi_tpu.data.factory import HOILoader

    f = factory
    sync = HOILoader(f, 2, shuffle=True, with_targets=True, seed=3)
    thr = HOILoader(f, 2, shuffle=True, with_targets=True, seed=3,
                    num_workers=3, prefetch=2)
    got_s = list(sync)
    got_t = list(thr)
    assert len(got_s) == len(got_t) > 0
    for (bs, idx_s), (bt, idx_t) in zip(got_s, got_t):
        assert idx_s == idx_t
        for a, b in zip(bs[:7], bt[:7]):  # all non-target fields
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
