"""Unsupervised-task evaluation tests (the reference's property tests:
evaluation/pytest/test_evaluation.py:90-113 — permuted GT object ids must
score perfectly after Hungarian matching)."""

import numpy as np

from swem_tpu.eval.benchmark import evaluate_unsupervised
from swem_tpu.utils.visualization import calc_uncertainty


def make_gt(T=4, H=40, W=60, n=3):
    gt = np.zeros((n, T, H, W), bool)
    for i in range(n):
        gt[i, :, 5 + 10 * i : 12 + 10 * i, 5 + 15 * i : 15 + 15 * i] = True
    return gt


class TestUnsupervised:
    def test_permuted_proposals_score_one(self, rng):
        """GT channels in random order -> J = F = 1 via optimal assignment."""
        gt = make_gt()
        perm = rng.permutation(gt.shape[0])
        proposals = gt[perm]
        j, f = evaluate_unsupervised(gt, proposals)
        np.testing.assert_allclose(j, 1.0)
        np.testing.assert_allclose(f, 1.0)

    def test_extra_proposals_dont_hurt(self, rng):
        gt = make_gt(n=2)
        extra = np.zeros((1,) + gt.shape[1:], bool)
        extra[0, :, 30:38, 40:55] = True
        proposals = np.concatenate([gt[::-1], extra], axis=0)
        j, f = evaluate_unsupervised(gt, proposals)
        np.testing.assert_allclose(j, 1.0)

    def test_fewer_proposals_zero_padded(self):
        gt = make_gt(n=3)
        j, f = evaluate_unsupervised(gt, gt[:1])
        assert j.shape == (3, 4)
        # exactly one object matched perfectly; missing ones score 0
        means = sorted(j.mean(-1))
        assert means[-1] == 1.0 and means[0] == 0.0

    def test_too_many_proposals_rejected(self):
        gt = make_gt(n=1)
        try:
            evaluate_unsupervised(gt, np.zeros((25,) + gt.shape[1:], bool))
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


class TestUncertainty:
    def test_confident_pixels_low_uncertainty(self):
        score = np.zeros((1, 4, 4, 3), np.float32)
        score[..., 0] = 0.98
        score[..., 1] = 0.01
        score[..., 2] = 0.01
        u_conf = calc_uncertainty(score)
        score2 = np.full((1, 4, 4, 3), 1 / 3, np.float32)
        u_unc = calc_uncertainty(score2)
        assert u_conf.mean() < u_unc.mean()
        assert u_conf.shape == (1, 4, 4, 1)


class TestUnsupervisedEvaluation:
    def test_reads_unsupervised_annotations_folder(self, tmp_path, rng):
        """task='unsupervised' reads Annotations_unsupervised (davis.py:33)
        and scores Hungarian-matched proposals end to end."""
        import os

        from swem_tpu.data.palette import davis_palette, save_seg_mask
        from swem_tpu.eval.benchmark import DavisEvaluation

        root = str(tmp_path / "davis")
        os.makedirs(os.path.join(root, "ImageSets", "2019"))
        open(os.path.join(root, "ImageSets", "2019", "val.txt"), "w").write("seq0\n")
        pal = davis_palette()
        adir = os.path.join(root, "Annotations_unsupervised", "480p", "seq0")
        rdir = str(tmp_path / "res" / "seq0")
        os.makedirs(adir)
        os.makedirs(rdir)
        for t in range(4):
            lab = np.zeros((40, 60), np.uint8)
            lab[10:30, 10:30] = 1
            lab[10:30, 35:55] = 2
            save_seg_mask(lab, os.path.join(adir, f"{t:05d}.png"), pal)
            # proposals: same masks with permuted ids -> perfect after matching
            perm = np.zeros_like(lab)
            perm[lab == 1] = 2
            perm[lab == 2] = 1
            save_seg_mask(perm, os.path.join(rdir, f"{t:05d}.png"), pal)
        ev = DavisEvaluation(root, year="2019", gt_set="val", task="unsupervised")
        metrics = ev.evaluate(str(tmp_path / "res"))
        np.testing.assert_allclose(metrics["J"]["M"], 1.0)
        np.testing.assert_allclose(metrics["F"]["M"], 1.0)
