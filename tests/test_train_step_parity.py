"""Composed TRAIN-step parity oracle vs the PyTorch reference.

test_full_model_parity.py proves the *inference* composition; this file
proves the *training* composition: the reference trainer's one_step forward
(/root/reference/methods/SWEM/swem_trainer.py:59-95 — frame-0 init, T-1
supervised decode steps with memorize-from-prediction, stacked logits) plus
the full VOSLoss criterion (/root/reference/losses/__init__.py:15-63 with
BootstrappedCE + mask-IoU aux, bce_losses.py:7-136) is stitched from
torch-only reference parts and run in f64 against our production
``train.trainer._unrolled_forward`` + ``losses.make_criterion`` on converted
random weights and identical inputs — including a batch element with an
invalid object slot (valid_obj=[1,1,0]).

The gradient comparison is the strongest available check of the
stop-gradient placement (@torch.no_grad on swe/swm/sww, modules.py:93-127,
vs our stop_gradient around the EM loop) and of the differentiable paths
through matching/decode/aggregation: torch autograd grads of total_loss are
converted leaf-by-leaf through the production torch->flax converter and
compared to jax.grad of the identical loss.
"""

import os

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from swem_tpu.config import LossConfig  # noqa: E402
from swem_tpu.models.swem import SWEM  # noqa: E402
from swem_tpu.train.losses import make_criterion  # noqa: E402
from swem_tpu.train.trainer import _unrolled_forward  # noqa: E402

from test_full_model_parity import (  # noqa: E402
    IN_HW,
    _build_ref_full_swem,
    _fixed_kappa,
    _our_cfg,
    _patch_our_fresh_memory,
    _patch_ref_random_init,
    _ref_encode_key,
    _ref_encode_value,
    _ref_memorize,
)
from test_reference_parity import _convert_f64, _load_ref  # noqa: E402

# loss schedule scaled to test iterations (reference defaults 20k/70k/0.30,
# configs/config.py:79-83)
START_WARM, END_WARM, TOP_P, AUX_RATIO = 5, 9, 0.30, 1.0


# --------------------- reference one_step forward ------------------------ #
def _ref_decode_valid(model, n, context, s8, s4, valid_obj, out_size):
    """swem.py:92-108 with the train-time valid_obj masking."""
    s8e = s8.unsqueeze(1).expand(-1, n, -1, -1, -1).flatten(end_dim=1)
    s4e = s4.unsqueeze(1).expand(-1, n, -1, -1, -1).flatten(end_dim=1)
    logits = model.decoder(context, s8e, s4e, out_size)
    preds = torch.sigmoid(logits).view(-1, n, *out_size)
    preds = preds * valid_obj[:, 1:].unsqueeze(2).unsqueeze(2)
    new_prob = torch.cat(
        [torch.prod(1 - preds, dim=1, keepdim=True), preds], 1
    ).clamp(1e-7, 1 - 1e-7)
    logits = torch.log(new_prob / (1 - new_prob))
    return logits, F.softmax(logits, dim=1)


def _ref_one_step_forward(model, frames, init_mask, valid_obj):
    """swem_trainer.py:59-95 forward: returns stacked logits (B,N+1,T-1,H,W).

    frames (B,T,3,H,W); init_mask (B,N+1,H,W) at frame resolution (the crop
    res — the trainer never resizes masks, out_size == input size).
    """
    b, t = frames.shape[:2]
    out_size = init_mask.shape[-2:]
    qk16, _, s16, _, _ = _ref_encode_key(model, frames[:, 0])
    mv16 = _ref_encode_value(model, frames[:, 0], init_mask, s16)
    model.swem_core.empty()
    _ref_memorize(model, qk16, mv16, init_mask, init_mask)  # init_mem

    logits_list = []
    for i in range(1, t):
        qk16, qv16, s16, s8, s4 = _ref_encode_key(model, frames[:, i])
        context, n = model.swem_core.matching(qk16, qv16)
        logits, pred_mask = _ref_decode_valid(
            model, n, context, s8, s4, valid_obj, out_size)
        logits_list.append(logits)
        if i < t - 1:  # swem_trainer.py:80-91
            pred = torch.argmax(pred_mask, dim=1, keepdim=True)
            obj_idx = torch.arange(n + 1).view(1, -1, 1, 1)
            hard = (pred.expand(-1, n + 1, -1, -1) == obj_idx).double()
            mv16 = _ref_encode_value(model, frames[:, i], pred_mask, s16)
            _ref_memorize(model, qk16, mv16, hard, pred_mask)
    return torch.stack(logits_list, dim=2)


def _ref_criterion(bce_mod, scores, target, it, valid_obj):
    """VOSLoss composition (losses/__init__.py:34-63): boots_ce + iou aux
    with the per-batch-element valid-channel selection loops."""
    bce = bce_mod.BootstrappedCE(START_WARM, END_WARM, TOP_P)
    loss_main, p = bce(scores, target, it, valid_obj)
    B = scores.shape[0]
    loss_aux = 0.0
    for b in range(B):
        cur_scores = scores[b][valid_obj[b] > 0.5]  # Nv, T, H, W
        cur_pred = F.softmax(cur_scores.transpose(0, 1), dim=1)  # T, Nv, H, W
        loss_aux = loss_aux + bce_mod.mask_iou_loss(cur_pred, target[b])
    loss_aux = loss_aux / B
    total = loss_main + AUX_RATIO * loss_aux
    return {"total_loss": total, "main_loss": loss_main,
            "aux_loss": loss_aux, "p": p}


# ------------------------------ fixtures --------------------------------- #
def _make_train_inputs(rng, B=2, T=3, n_slots=2):
    """Frames + per-frame GT masks; sample 1 has slot 2 invalid (the
    loaders' trailing-invalid [1,1,0] layout, video_dataset.py:318-325)."""
    H, W = IN_HW
    frames = rng.random((B, T, H, W, 3)).astype(np.float64)
    masks = np.zeros((B, T, H, W, n_slots + 1), np.float64)
    masks[..., 0] = 1.0
    boxes = [(6, 20, 8, 30), (30, 52, 48, 84)]
    for b in range(B):
        n_objs = 2 if b == 0 else 1
        for t in range(T):
            for n in range(n_objs):
                y0, y1, x0, x1 = boxes[n]
                dy, dx = 2 * t * (b + 1), 3 * t
                sl = np.s_[b, t, y0 + dy:y1 + dy, x0 + dx:x1 + dx, n + 1]
                masks[sl] = 1.0
                masks[b, t, y0 + dy:y1 + dy, x0 + dx:x1 + dx, 0] = 0.0
    label = np.argmax(masks, axis=-1).astype(np.int32)
    valid_obj = np.array([[1.0, 1.0, 1.0], [1.0, 1.0, 0.0]], np.float64)[:B]
    return frames, masks, label, valid_obj


def _grads_to_variables(model, template_sd):
    """torch param.grad -> flax-variables tree via the production converter
    (linear layout maps commute with d/dtheta); buffers (no grad) get zeros."""
    named = dict(model.named_parameters())
    grad_sd = {}
    for k, v in template_sd.items():
        p = named.get(k)
        if p is not None and p.grad is not None:
            grad_sd[k] = p.grad.detach().cpu().numpy()
        else:
            grad_sd[k] = np.zeros_like(np.asarray(v))
    return _convert_f64(grad_sd)


class TestComposedTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(7)
        ref_model, sd = _build_ref_full_swem(rng)
        kappa_n = _fixed_kappa(rng, n_max=2)
        init_state = _patch_ref_random_init(ref_model.swem_core, kappa_n)
        frames, masks, label, valid_obj = _make_train_inputs(rng)
        bce_mod = _load_ref("ref_bce", "losses/bce_losses.py")
        return dict(ref_model=ref_model, sd=sd, kappa_n=kappa_n,
                    init_state=init_state, frames=frames, masks=masks,
                    label=label, valid_obj=valid_obj, bce_mod=bce_mod)

    def _run_ref(self, s, it, with_grads=False):
        s["init_state"]["off"] = 0
        model = s["ref_model"]
        ft = torch.from_numpy(np.moveaxis(s["frames"], -1, 2)).double()
        mt0 = torch.from_numpy(np.moveaxis(s["masks"][:, 0], -1, 1)).double()
        vt = torch.from_numpy(s["valid_obj"]).double()
        lt = torch.from_numpy(s["label"].astype(np.int64))
        ctx = torch.enable_grad() if with_grads else torch.no_grad()
        with ctx:
            scores = _ref_one_step_forward(model, ft, mt0, vt)
            losses = _ref_criterion(s["bce_mod"], scores, lt[:, 1:], it, vt)
        if with_grads:
            model.zero_grad(set_to_none=True)
            losses["total_loss"].backward()
        return scores, losses

    def _run_ours(self, s, it, monkeypatch, with_grads=False):
        _patch_our_fresh_memory(monkeypatch, s["kappa_n"])
        variables = _convert_f64(s["sd"])
        model = SWEM(_our_cfg(n_slots=2))
        criterion = make_criterion(LossConfig(
            name="boots_ce", bs_ratio=TOP_P, bs_period=(START_WARM, END_WARM),
            aux="iou", aux_ratio=AUX_RATIO))
        fj = jnp.asarray(s["frames"])
        m0 = jnp.asarray(s["masks"][:, 0])
        vj = jnp.asarray(s["valid_obj"])
        lj = jnp.asarray(s["label"])

        def loss_fn(params):
            vs = {"params": params, "batch_stats": variables["batch_stats"]}
            logits = _unrolled_forward(model, vs, fj, m0, vj,
                                       jax.random.PRNGKey(0))
            losses = criterion(logits, lj[:, 1:], it, vj)
            return losses["total_loss"], (logits, losses)

        if with_grads:
            (_, (logits, losses)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(variables["params"])
        else:
            _, (logits, losses) = loss_fn(variables["params"])
            grads = None
        return logits, losses, grads

    @pytest.mark.parametrize("it", [0, 7])  # plain-CE and annealed boots-CE
    def test_forward_and_loss(self, setup, monkeypatch, it):
        """Stacked per-frame logits and every loss component match the
        stitched reference one_step in f64 — in both criterion regimes
        (it=0: plain CE, p=1; it=7: top-p bootstrap, p=0.65)."""
        ref_scores, ref_losses = self._run_ref(setup, it)
        with jax.enable_x64(True):
            logits, losses, _ = self._run_ours(setup, it, monkeypatch)
        # ref (B, N+1, T-1, H, W) -> (B, T-1, H, W, N+1)
        want = np.moveaxis(ref_scores.numpy(), 1, -1)
        np.testing.assert_allclose(
            np.asarray(logits), want, rtol=1e-6, atol=1e-8,
            err_msg="stacked train logits")
        for k in ("total_loss", "main_loss", "aux_loss", "p"):
            np.testing.assert_allclose(
                float(losses[k]), float(ref_losses[k]), rtol=1e-8,
                atol=1e-10, err_msg=f"loss component {k}")

    def test_gradients(self, setup, monkeypatch):
        """jax.grad of the composed loss == torch autograd leaf-by-leaf
        (via the production converter) — verifies stop-grad placement and
        every differentiable path of the unroll. it=0 keeps the pixel
        selection dense (no top-p tie routing)."""
        _, ref_losses = self._run_ref(setup, it=0, with_grads=True)
        with jax.enable_x64(True):
            ref_grads = _grads_to_variables(setup["ref_model"], setup["sd"])
            _, losses, grads = self._run_ours(
                setup, it=0, monkeypatch=monkeypatch, with_grads=True)
        np.testing.assert_allclose(
            float(losses["total_loss"]), float(ref_losses["total_loss"]),
            rtol=1e-8, atol=1e-10)

        flat_ours = jax.tree_util.tree_flatten_with_path(grads)[0]
        flat_ref = dict(jax.tree_util.tree_flatten_with_path(
            ref_grads["params"])[0])
        assert len(flat_ours) > 50  # the whole model, not a stub tree
        checked = 0
        for path, g in flat_ours:
            gr = np.asarray(flat_ref[path])
            go = np.asarray(g)
            scale = max(float(np.abs(gr).max()), 1e-30)
            np.testing.assert_allclose(
                go, gr, rtol=1e-6, atol=1e-8 * scale,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
            checked += 1
            if float(np.abs(gr).max()) > 0:
                assert float(np.abs(go).max()) > 0
        assert checked == len(flat_ours)
