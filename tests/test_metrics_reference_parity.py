"""Cross-validation of the J&F metric stack against the reference's
vendored davis2017 package.

The reference validates its metric code with golden values of published
methods over the real DAVIS dataset (evaluation/pytest/test_evaluation.py:
51-87) — data this image doesn't have. But the *code-vs-code* check needs no
data: the vendored package is pure numpy/cv2 (its only missing dependency,
``skimage.morphology.disk``, is shimmed with our own equivalent
``eval/metrics.py::disk``). Fuzzed random multi-object masks with void
pixels must score bit-for-bit identically through both stacks:

* ``jaccard``            vs davis2017/metrics.py::db_eval_iou (6-37)
* ``boundary_f_frames``  vs db_eval_boundary/f_measure (40-121)
* ``statistics``         vs davis2017/utils.py::db_statistics (136-162)
* ``evaluate_unsupervised`` vs evaluation.py::_evaluate_unsupervised (64-83)
* the full ``DavisEvaluation.evaluate`` loop vs DAVISEvaluation.evaluate
  (265-322) on a synthetic DAVIS tree (first/last exclusion, 255->void,
  per-object separation, reader zero-padding)

Documented deliberate fix: ``db_statistics`` casts its decay bin indices to
uint8 (utils.py:154), which overflows for series >= 256 frames (bins[3]
becomes an empty slice -> decay = nan); our ``statistics`` keeps int
indices (see test_statistics_long_series_int_index_fix).
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)

from swem_tpu.eval.benchmark import (  # noqa: E402
    DavisEvaluation,
    evaluate_unsupervised,
)
from swem_tpu.eval.metrics import (  # noqa: E402
    boundary_f_frames,
    disk,
    jaccard,
    statistics,
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference's vendored davis2017 package, shimming
    skimage.morphology.disk (absent in this image) with our equivalent."""
    if "skimage.morphology" not in sys.modules:
        sk = types.ModuleType("skimage")
        morph = types.ModuleType("skimage.morphology")
        morph.disk = disk
        sk.morphology = morph
        sys.modules["skimage"] = sk
        sys.modules["skimage.morphology"] = morph
    sys.path.insert(0, os.path.join(REFERENCE, "evaluation"))
    try:
        import davis2017.evaluation as reval
        import davis2017.metrics as rmetrics
        import davis2017.utils as rutils
    finally:
        sys.path.pop(0)
    return types.SimpleNamespace(
        metrics=rmetrics, utils=rutils, evaluation=reval)


def random_masks(rng, T, H, W, n_obj, void_frac=0.03):
    """Blobby multi-object label maps + blobby void pixels."""
    import cv2

    fields = rng.random((n_obj + 1, T, H, W)).astype(np.float32)
    for c in range(n_obj + 1):
        for t in range(T):
            fields[c, t] = cv2.blur(fields[c, t], (15, 15))
    labels = np.argmax(fields, axis=0).astype(np.uint8)  # (T,H,W) 0..n_obj
    vf = np.stack([cv2.blur(rng.random((H, W)).astype(np.float32), (9, 9))
                   for _ in range(T)])
    void = vf > np.quantile(vf, 1.0 - void_frac)
    return labels, void


class TestMetricFuzz:
    @pytest.mark.parametrize("trial", range(6))
    def test_jaccard_matches_reference(self, ref, rng, trial):
        T, H, W, n_obj = 4, 96, 128, 3
        gt_lab, void = random_masks(rng, T, H, W, n_obj)
        pred_lab, _ = random_masks(rng, T, H, W, n_obj)
        for n in range(1, n_obj + 1):
            gt, pred = gt_lab == n, pred_lab == n
            for v in (None, void):
                ours = jaccard(gt, pred, v)
                want = ref.metrics.db_eval_iou(gt, pred, v)
                np.testing.assert_array_equal(np.asarray(ours), want)
            # single-frame (2-D) path
            ours0 = jaccard(gt[0], pred[0], void[0])
            want0 = ref.metrics.db_eval_iou(gt[0], pred[0], void[0])
            assert float(ours0) == float(want0)

    @pytest.mark.parametrize("trial", range(4))
    def test_boundary_f_matches_reference(self, ref, rng, trial):
        T, H, W, n_obj = 3, 96, 128, 2
        gt_lab, void = random_masks(rng, T, H, W, n_obj)
        pred_lab, _ = random_masks(rng, T, H, W, n_obj)
        for n in range(1, n_obj + 1):
            gt, pred = gt_lab == n, pred_lab == n
            for v in (None, void):
                ours = boundary_f_frames(gt, pred, v)
                want = ref.metrics.db_eval_boundary(gt, pred, v)
                np.testing.assert_array_equal(np.asarray(ours), want)

    def test_boundary_f_empty_cases_match(self, ref):
        H, W = 64, 64
        empty = np.zeros((H, W), bool)
        square = np.zeros((H, W), bool)
        square[20:40, 20:40] = True
        for gt, pred in [(empty, empty), (empty, square), (square, empty)]:
            ours = float(boundary_f_frames(gt, pred))
            want = float(ref.metrics.db_eval_boundary(gt, pred))
            assert ours == want, (ours, want)

    @pytest.mark.parametrize("n", [1, 2, 5, 24, 60, 254, 255])
    def test_statistics_matches_reference(self, ref, rng, n):
        series = rng.random(n)
        series[rng.random(n) < 0.1] = np.nan  # missing-frame nans
        ours = statistics(series)
        want = ref.utils.db_statistics(series)
        for a, b in zip(ours, want):
            if np.isnan(b):
                assert np.isnan(a)
            else:
                assert float(a) == float(b), (ours, want)

    def test_statistics_long_series_int_index_fix(self, ref, rng):
        """>=256-frame series: the reference's uint8 decay-bin indices wrap
        (utils.py:154: ids.astype(np.uint8)), making bins[3] an empty slice
        and decay nan. Our int indices produce the intended value; mean and
        recall are unaffected either way."""
        series = rng.random(300)
        M, R, D = statistics(series)
        rM, rR, rD = ref.utils.db_statistics(series)
        assert float(M) == float(rM) and float(R) == float(rR)
        assert np.isnan(rD), "reference uint8 overflow behavior changed?"
        # the intended formula with correct (int) indices
        ids = (np.round(np.linspace(1, 300, 5) + 1e-10) - 1).astype(int)
        want_D = np.nanmean(series[ids[0]:ids[1] + 1]) - np.nanmean(
            series[ids[3]:ids[4] + 1])
        assert abs(D - want_D) < 1e-12

    @pytest.mark.parametrize("n_props", [2, 4])
    def test_unsupervised_hungarian_matches_reference(self, ref, rng, n_props):
        """Hungarian-matched multi-proposal eval == the reference's
        _evaluate_unsupervised on permuted + perturbed proposals."""
        T, H, W, n_gt = 3, 64, 96, 2
        gt_lab, void = random_masks(rng, T, H, W, n_gt)
        gt = np.stack([gt_lab == n for n in range(1, n_gt + 1)])
        # proposals: the gt objects under a permutation, plus noise blobs
        perm = rng.permutation(n_gt)
        props = [np.roll(gt[p], shift=3, axis=-1) for p in perm]
        while len(props) < n_props:
            noise_lab, _ = random_masks(rng, T, H, W, 1)
            props.append(noise_lab == 1)
        proposals = np.stack(props[:n_props])

        ours_j, ours_f = evaluate_unsupervised(gt, proposals, void)
        want_j, want_f = ref.evaluation.DAVISEvaluation._evaluate_unsupervised(
            gt, proposals, void, ("J", "F"))
        np.testing.assert_array_equal(ours_j, want_j)
        np.testing.assert_array_equal(ours_f, want_f)

    def test_unsupervised_fewer_proposals_than_gt(self, ref, rng):
        """Reader zero-pads when proposals < gt objects (evaluation.py:67-69)."""
        T, H, W = 2, 48, 64
        gt_lab, void = random_masks(rng, T, H, W, 3)
        gt = np.stack([gt_lab == n for n in range(1, 4)])
        proposals = gt[:1]
        ours_j, ours_f = evaluate_unsupervised(gt, proposals, void)
        want_j, want_f = ref.evaluation.DAVISEvaluation._evaluate_unsupervised(
            gt, proposals, void, ("J", "F"))
        np.testing.assert_array_equal(ours_j, want_j)
        np.testing.assert_array_equal(ours_f, want_f)


class TestFullEvaluateLoop:
    def test_semisupervised_evaluate_matches_reference(self, ref, rng,
                                                       tmp_path):
        """Our DavisEvaluation.evaluate == the reference DAVISEvaluation on
        a synthetic DAVIS-2017 tree with imperfect predictions: covers the
        GT reader (255->void strip, per-object separation), first/last
        frame exclusion, the Results reader (incl. predictions missing an
        object id -> zero-padded channel, evaluation.py:52-55), and the
        statistics reduction. (A missing frame PNG is NOT comparable: the
        reference sys.exit()s there, results.py:15-20, where we zero-pad.)
        """
        from swem_tpu.data.palette import davis_palette, save_seg_mask

        H, W, T = 96, 128, 6
        root = str(tmp_path / "davis")
        res = str(tmp_path / "results")
        os.makedirs(os.path.join(root, "ImageSets", "2017"))
        names = ["seq0", "seq1"]
        with open(os.path.join(root, "ImageSets", "2017", "val.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
        pal = davis_palette()
        from PIL import Image

        for i, name in enumerate(names):
            jdir = os.path.join(root, "JPEGImages", "480p", name)
            adir = os.path.join(root, "Annotations", "480p", name)
            os.makedirs(jdir)
            os.makedirs(adir)
            os.makedirs(os.path.join(res, name))
            gt_lab, void = random_masks(rng, T, H, W, 2 + i)
            gt_lab[void] = 255  # void pixels stored as 255 in the PNGs
            pred_lab, _ = random_masks(rng, T, H, W, 2 + i)
            if name == "seq1":
                # predictions never emit the last object id: both stacks
                # must zero-pad the missing channel
                pred_lab[pred_lab == 2 + i] = 0
            for t in range(T):
                img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(jdir, f"{t:05d}.jpg"))
                save_seg_mask(gt_lab[t], os.path.join(adir, f"{t:05d}.png"),
                              pal)
                save_seg_mask(pred_lab[t], os.path.join(res, name,
                                                        f"{t:05d}.png"), pal)

        ours = DavisEvaluation(root, year="2017", gt_set="val").evaluate(res)
        want = ref.evaluation.DAVISEvaluation(
            davis_root=root, year="2017", task="semi-supervised",
            gt_set="val").evaluate(res_path=res)

        for m in ("J", "F"):
            np.testing.assert_array_equal(
                np.asarray(ours[m]["M"]), np.asarray(want[m]["M"]))
            np.testing.assert_array_equal(
                np.asarray(ours[m]["R"]), np.asarray(want[m]["R"]))
            np.testing.assert_array_equal(
                np.asarray(ours[m]["D"]), np.asarray(want[m]["D"]))
            assert ours[m]["M_per_object"] == want[m]["M_per_object"]
            assert set(ours[m]["per_obj_frame"]) == set(
                want[m]["per_obj_frame"])
            for k in ours[m]["per_obj_frame"]:
                np.testing.assert_array_equal(
                    np.asarray(ours[m]["per_obj_frame"][k]),
                    np.asarray(want[m]["per_obj_frame"][k]))
