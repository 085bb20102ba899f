"""Loss tests against a torch oracle implementing the documented semantics
(per-batch-element valid-channel selection loops, SURVEY.md §2.4)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from swem_tpu.config import LossConfig
from swem_tpu.train.losses import (
    bootstrapped_ce,
    lovasz_softmax_loss,
    make_criterion,
    mask_iou_loss,
    plain_ce,
)


def make_batch(rng, B=2, T=2, H=8, W=8, C=3, invalid=True):
    logits = rng.standard_normal((B, T, H, W, C)).astype(np.float32)
    valid = np.ones((B, C), np.float32)
    n_valid = C
    if invalid:
        valid[0, -1] = 0.0  # batch elt 0 has one missing object
    # targets only index valid channels
    target = rng.integers(0, C, (B, T, H, W)).astype(np.int32)
    target[0] = np.minimum(target[0], C - 2)
    return logits, target, valid


def torch_ce_valid(logits, target, valid):
    """Oracle: per-b CE over the valid channel subset (bce_losses.py:24-31)."""
    B = logits.shape[0]
    total = 0.0
    for b in range(B):
        sel = valid[b] > 0.5
        scores = torch.from_numpy(logits[b][..., sel]).permute(3, 0, 1, 2).unsqueeze(0)
        # remap targets into the compacted channel space
        remap = np.cumsum(sel) - 1
        tgt = torch.from_numpy(remap[target[b]]).long().unsqueeze(0)
        total += F.cross_entropy(scores, tgt).item()
    return total / B


def torch_topk_ce(logits, target, valid, p):
    B, T, H, W, C = logits.shape
    rows = []
    for b in range(B):
        sel = valid[b] > 0.5
        scores = torch.from_numpy(logits[b][..., sel]).permute(3, 0, 1, 2).unsqueeze(0)
        remap = np.cumsum(sel) - 1
        tgt = torch.from_numpy(remap[target[b]]).long().unsqueeze(0)
        raw = F.cross_entropy(scores, tgt, reduction="none").view(1, T, -1)
        rows.append(raw)
    raw = torch.cat(rows, dim=0)
    k = int(H * W * p)
    loss, _ = torch.topk(raw, k=k, dim=-1, sorted=False)
    return loss.mean().item()


class TestBootstrappedCE:
    def test_warm_phase_plain_ce(self, rng):
        logits, target, valid = make_batch(rng)
        ref = torch_ce_valid(logits, target, valid)
        got, p = bootstrapped_ce(
            jnp.asarray(logits), jnp.asarray(target), jnp.asarray(0),
            jnp.asarray(valid), start_warm=10, end_warm=20, top_p=0.3,
        )
        assert float(p) == 1.0
        np.testing.assert_allclose(float(got), ref, rtol=1e-5)

    @pytest.mark.parametrize("it,expected_p", [(15, 0.65), (100, 0.3)])
    def test_topk_phase(self, rng, it, expected_p):
        logits, target, valid = make_batch(rng)
        got, p = bootstrapped_ce(
            jnp.asarray(logits), jnp.asarray(target), jnp.asarray(it),
            jnp.asarray(valid), start_warm=10, end_warm=20, top_p=0.3,
        )
        assert abs(float(p) - expected_p) < 1e-6
        ref = torch_topk_ce(logits, target, valid, float(p))
        np.testing.assert_allclose(float(got), ref, rtol=1e-5)

    def test_no_valid_obj(self, rng):
        logits, target, _ = make_batch(rng, invalid=False)
        got, _ = bootstrapped_ce(
            jnp.asarray(logits), jnp.asarray(target), jnp.asarray(0), None,
            start_warm=10, end_warm=20, top_p=0.3,
        )
        ref = F.cross_entropy(
            torch.from_numpy(logits).permute(0, 4, 1, 2, 3),
            torch.from_numpy(target).long(),
        ).item()
        np.testing.assert_allclose(float(got), ref, rtol=1e-5)


class TestMaskIoU:
    def test_matches_reference_semantics(self, rng):
        """Oracle: per-b mean soft IoU over valid channels (bce_losses.py:109-136)."""
        logits, target, valid = make_batch(rng)
        B, T, H, W, C = logits.shape
        aux = 0.0
        for b in range(B):
            sel = valid[b] > 0.5
            nv = int(sel.sum())
            scores = logits[b][..., sel]  # (T,H,W,nv)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            pred = e / e.sum(-1, keepdims=True)
            remap = np.cumsum(sel) - 1
            tgt_oh = np.eye(nv, dtype=np.float32)[remap[target[b]]]
            inter = np.minimum(pred, tgt_oh).sum((1, 2))
            union = np.maximum(pred, tgt_oh).sum((1, 2)) + 1e-6
            aux += 1.0 - (inter / union).sum() / (T * nv)
        ref = aux / B
        got = mask_iou_loss(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(valid))
        np.testing.assert_allclose(float(got), ref, rtol=1e-5)


class TestLovasz:
    def test_perfect_prediction_zero_loss(self, rng):
        target = rng.integers(0, 3, (1, 1, 8, 8)).astype(np.int32)
        logits = np.eye(3, dtype=np.float32)[target] * 100.0
        got = lovasz_softmax_loss(jnp.asarray(logits), jnp.asarray(target), None)
        assert float(got) < 1e-3

    def test_finite_and_positive(self, rng):
        logits, target, valid = make_batch(rng)
        got = lovasz_softmax_loss(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(valid))
        assert np.isfinite(float(got)) and float(got) > 0


class TestCriterion:
    def test_combined(self, rng):
        logits, target, valid = make_batch(rng)
        crit = make_criterion(LossConfig())
        out = crit(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(0), jnp.asarray(valid))
        total = float(out["main_loss"]) + 1.0 * float(out["aux_loss"])
        np.testing.assert_allclose(float(out["total_loss"]), total, rtol=1e-6)
