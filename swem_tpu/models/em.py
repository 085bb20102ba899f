"""Sequential Weighted EM memory core — pure functional, TPU-first.

Re-implements the SWEM algorithm semantics of
/root/reference/methods/SWEM/modules.py:63-306 as pure JAX functions with
static shapes:

* ``init_bases``       — random prototype init   (modules.py:170-178)
* ``em_update``        — the W/E/M loop           (modules.py:93-168)
* ``read_memory``      — affinity read + top-l permutation-invariant
                         feature                  (modules.py:198-293)
* ``VOSMemory``        — the two-bank (first/update) memory state
                         (modules.py:29-60,183-193) expressed as a fixed-shape
                         pytree carried through ``lax.scan``.

Design notes (TPU):
- All shapes are static: ``(B, N, 2, C, L)`` with ``N`` the *maximum* object
  count. Inactive object slots carry all-zero masks, which makes every EM
  update an exact no-op for them (z == 0 keeps kappa/nu/zita unchanged), so
  padding reproduces the reference's dynamic-concat semantics exactly.
- Stop-gradient placement matches the reference's ``@torch.no_grad``
  boundaries: the E/M/W iteration (kappa, zita, z) is non-differentiable;
  only the final value-prototype update ``nu`` carries gradients (through the
  value features v and the previous nu).
- Pixel dim P = H/16 * W/16 sits in the contraction-friendly position for the
  MXU; everything is expressed as einsums XLA tiles onto the 128x128 MXU.
- The fixed-size carry {kappa, nu, zita} is the sequence-length-scaling story:
  O(1) memory in video length (SURVEY.md §5 long-context).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

# EM statistics are precision-sensitive (tau=0.05 exponentials amplify matmul
# error), so all EM einsums request full-precision MXU passes. The cost is
# negligible next to the conv towers.
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


@struct.dataclass
class Bases:
    """EM sufficient statistics for one memory bank.

    kappa: (B, N, 2, Ck, L) key prototypes  (branch dim 2 = [bg, fg])
    nu:    (B, N, 2, Cv, L) value prototypes
    zita:  (B, N, 2, 1,  L) accumulated responsibility mass
    """

    kappa: jnp.ndarray
    nu: jnp.ndarray
    zita: jnp.ndarray


@struct.dataclass
class VOSMemory:
    """Two-bank prototype memory (modules.py:74-76,183-193).

    ``first`` holds each object's bases frozen at its activation frame
    (mode='fixed'); ``update`` holds the latest frame's bases. ``obj_seen``
    marks object slots that have been initialized with a real mask;
    ``mem_count`` counts memorize calls (the update bank participates in
    reads only once mem_count >= 2, reproducing the reference's "update bank
    is None until the second memorize" behavior).
    """

    first: Bases
    update: Bases
    obj_seen: jnp.ndarray  # (B, N) bool
    mem_count: jnp.ndarray  # () int32


def l2norm(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """L2-normalize with the reference's +1e-6 denominator (modules.py:7-9)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True) + 1e-6
    return x / norm


def init_bases(
    rng: jax.Array,
    batch: int,
    n_objs: int,
    key_dim: int,
    val_dim: int,
    n_bases: int,
    dtype=jnp.float32,
) -> Bases:
    """Random prototype initialization (modules.py:170-178).

    kappa ~ N(0, sqrt(2/L)), l2-normalized over the channel dim; nu zeros;
    zita = 1e-6.
    """
    kappa = jax.random.normal(rng, (batch, n_objs, 2, key_dim, n_bases), dtype)
    kappa = kappa * math.sqrt(2.0 / n_bases)
    kappa = l2norm(kappa, axis=-2)
    nu = jnp.zeros((batch, n_objs, 2, val_dim, n_bases), dtype)
    zita = jnp.full((batch, n_objs, 2, 1, n_bases), 1e-6, dtype)
    return Bases(kappa=kappa, nu=nu, zita=zita)


def fresh_memory(
    rng: jax.Array,
    batch: int,
    n_objs: int,
    key_dim: int,
    val_dim: int,
    n_bases: int,
    dtype=jnp.float32,
) -> VOSMemory:
    """Empty memory: both banks random-initialized, nothing seen.

    Because EM is a no-op for zero-mask slots, pre-initializing every object
    slot here reproduces the reference's lazy per-object ``random_init`` at
    the activation frame (modules.py:140-146).
    """
    bases = init_bases(rng, batch, n_objs, key_dim, val_dim, n_bases, dtype)
    return VOSMemory(
        first=bases,
        update=bases,
        obj_seen=jnp.zeros((batch, n_objs), bool),
        mem_count=jnp.zeros((), jnp.int32),
    )


def _e_step(x: jnp.ndarray, kappa: jnp.ndarray, weights: jnp.ndarray, tau: float):
    """E step (modules.py:112-120): responsibilities z, weighted.

    x: (B, P, Ck); kappa: (B, N, 2, Ck, L); weights: (B, N, 2, P)
    returns z: (B, N, 2, P, L)
    """
    kn = l2norm(kappa, axis=-2)
    z = _einsum("bpc,bnscl->bnspl", x, kn)
    z = jax.nn.softmax(z / tau, axis=-1)
    return z * weights[..., None]


def _m_step(z, x, kappa0, zita0):
    """M step (modules.py:122-127): running weighted mean from frame-carry stats.

    z: (B,N,2,P,L); x: (B,P,Ck) -> kappa (B,N,2,Ck,L), zita (B,N,2,1,L)
    """
    # zita accumulates responsibility mass per base: sum over pixels.
    zita = zita0 + jnp.sum(z, axis=-2)[:, :, :, None, :]
    kappa = (
        zita0 * kappa0
        + _einsum("bpc,bnspl->bnscl", x, z)
    ) / zita
    return kappa, zita


def _w_step(xn, kappa, masks, tau):
    """W step (modules.py:93-110): pixel weights = mask * (1 - branch prob).

    xn: l2-normalized x (B, P, Ck); kappa: (B,N,2,Ck,L); masks: (B,N,2,P)
    """
    kn = l2norm(kappa, axis=-2)
    z = _einsum("bpc,bnscl->bnspl", xn, kn)
    maxes = jnp.max(z, axis=-1, keepdims=True)  # over L
    maxes = jnp.max(maxes, axis=2, keepdims=True)  # over {bg, fg}
    z_exp = jnp.exp((z - maxes) / tau)
    sum_exp = jnp.sum(z_exp, axis=-1)  # (B, N, 2, P)
    props = sum_exp / jnp.sum(sum_exp, axis=2, keepdims=True)
    return masks * (1.0 - props)


def em_update(
    x: jnp.ndarray,
    v: jnp.ndarray,
    masks: jnp.ndarray,
    bases0: Bases,
    *,
    n_iters: int,
    tau: float,
    use_pallas: bool = False,
) -> Bases:
    """One frame's Sequential Weighted EM update (modules.py:129-168).

    x:     (B, P, Ck)    query key features (P = H/16 * W/16, channel-last)
    v:     (B, N, P, Cv) value features per object
    masks: (B, N, 2, P)  [bg, fg] pixel weights per object
    bases0: warm-start statistics from the previous frame.

    The E/M/W loop is a fixed trip-count Python loop (n_iters is static) so
    XLA fully unrolls and fuses it. The whole loop runs under stop_gradient
    (matching @torch.no_grad on swe/swm/sww); only the final nu update is
    differentiable, through v and bases0.nu.
    """

    def _loop(x, masks, kappa0, zita0):
        xn = l2norm(x, axis=-1)
        weights = masks
        kappa = kappa0
        z = None
        for i in range(n_iters):
            z = _e_step(x, kappa, weights, tau)
            kappa, zita = _m_step(z, x, kappa0, zita0)
            if i < n_iters - 1:
                weights = _w_step(xn, kappa, masks, tau)
        return z, kappa, zita

    if use_pallas:
        from swem_tpu.ops.em_pallas import em_loop_pallas

        z, kappa, zita = jax.lax.stop_gradient(
            em_loop_pallas(
                x.astype(jnp.float32), masks, bases0.kappa, bases0.zita,
                n_iters=n_iters, tau=tau,
            )
        )
    else:
        z, kappa, zita = jax.lax.stop_gradient(
            _loop(x, masks, bases0.kappa, bases0.zita)
        )
    zita0 = jax.lax.stop_gradient(bases0.zita)
    nu = (
        zita0 * bases0.nu
        + _einsum("bnpv,bnspl->bnsvl", v, z)
    ) / zita
    return Bases(kappa=kappa, nu=nu, zita=zita)


def memory_write(mem: VOSMemory, bases: Bases, active: jnp.ndarray) -> VOSMemory:
    """Commit a frame's EM result to the two banks (modules.py:183-193).

    ``update`` is replaced wholesale; ``first`` keeps each object's bases
    frozen from its activation frame (fixed mode / MemoryBank.add_new,
    modules.py:44-60), expressed here as a per-object select on newly-seen
    slots. ``active``: (B, N) bool — object slots with an init mask provided
    at or before this frame.
    """
    newly = jnp.logical_and(active, jnp.logical_not(mem.obj_seen))
    sel = newly[:, :, None, None, None]
    first = Bases(
        kappa=jnp.where(sel, bases.kappa, mem.first.kappa),
        nu=jnp.where(sel, bases.nu, mem.first.nu),
        zita=jnp.where(sel, bases.zita, mem.first.zita),
    )
    return VOSMemory(
        first=first,
        update=bases,
        obj_seen=jnp.logical_or(mem.obj_seen, active),
        mem_count=mem.mem_count + 1,
    )


def memorize(
    mem: VOSMemory,
    x: jnp.ndarray,
    v: jnp.ndarray,
    masks: jnp.ndarray,
    active: jnp.ndarray,
    *,
    n_iters: int,
    tau: float,
    use_pallas: bool = False,
) -> VOSMemory:
    """EM-update from the latest bank and commit (modules.py:183-193).

    The warm start is always the ``update`` bank: after the first memorize it
    equals ``first`` (the reference warm-starts from ``first`` only while
    ``update`` is None, and they coincide at that point).

    Masks are gated by ``active``: a not-yet-appeared object's bg channel
    would otherwise be all-ones (prepare_em_masks on a zero mask channel),
    accumulating stale statistics the reference never sees — it random-inits
    a new object's bases at its first annotated frame (modules.py:140-146).
    Gating keeps inactive slots at their fresh random init until activation.
    (Training is unaffected: inactive slots contribute no loss or gradient
    either way.)
    """
    masks = masks * active[:, :, None, None].astype(masks.dtype)
    bases = em_update(x, v, masks, mem.update, n_iters=n_iters, tau=tau,
                      use_pallas=use_pallas)
    return memory_write(mem, bases, active)


def gather_memory(mem: VOSMemory) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Concatenate both banks along L (modules.py:295-306) + validity mask.

    Returns (mk, mv, base_valid):
      mk: (B, N, 2, Ck, 2L), mv: (B, N, 2, Cv, 2L), base_valid: (B, N, 2, 2L)

    The first half is valid once the object has been seen; the second half
    additionally requires mem_count >= 2 (the reference's update bank does
    not exist until the second memorize call). Masked bases are excluded
    from the affinity softmax and top-l feature in ``read_memory``, exactly
    reproducing the reference's L-vs-2L dynamic width with static shapes.
    """
    mk = jnp.concatenate([mem.first.kappa, mem.update.kappa], axis=-1)
    mv = jnp.concatenate([mem.first.nu, mem.update.nu], axis=-1)
    L = mem.first.kappa.shape[-1]
    seen = mem.obj_seen[:, :, None, None]  # (B, N, 1, 1)
    first_valid = jnp.broadcast_to(seen, seen.shape[:2] + (2, L))
    upd_valid = jnp.logical_and(first_valid, mem.mem_count >= 2)
    base_valid = jnp.concatenate([first_valid, upd_valid], axis=-1)
    return mk, mv, base_valid


def _perm_inv_feat(exp_aff: jnp.ndarray, topl: int) -> jnp.ndarray:
    """Permutation-invariant top-l affinity feature (modules.py:198-208).

    exp_aff: (B, N, 2, Lm, P) non-negative; returns S: (B, N, P, 2*topl)
    with channel order [bg_ratio_0..k-1, (1-bg_ratio)_0..k-1].

    The cumulative feature needs only the sorted top-l *values* (tie order
    is irrelevant to a prefix sum), so instead of ``lax.top_k`` — whose
    variadic sort runs along the minor (lane) axis after the transpose and
    costs ~10ms at eval shapes — the top-l values are extracted by ``topl``
    argmax-delete rounds along the sublane base axis (Lm stays second-to-
    minor, P stays in lanes). Measured ~17x faster on v5e at
    (1,2,2,256,1620) with bit-identical output.
    """
    Lm = exp_aff.shape[3]
    it = jax.lax.broadcasted_iota(jnp.int32, exp_aff.shape, 3)

    def body(vals, _):
        m = jnp.max(vals, axis=3, keepdims=True)
        # delete exactly one element per round (the first of any ties) so
        # tied values appear at successive ranks like a real sort
        first = jnp.min(jnp.where(vals == m, it, Lm), axis=3, keepdims=True)
        vals = jnp.where(it == first, -jnp.inf, vals)
        return vals, m[:, :, :, 0]

    _, tops = jax.lax.scan(body, exp_aff, None, length=topl)
    feat = jnp.cumsum(tops, axis=0)  # (topl, B, N, 2, P)
    bg, fg = feat[:, :, :, 0], feat[:, :, :, 1]  # branch 0 = bg (swem.py:80-84)
    ratio = bg / (bg + fg + 1e-30)  # (topl, B, N, P)
    ratio = jnp.moveaxis(ratio, 0, -1)  # (B, N, P, topl)
    return jnp.concatenate([ratio, 1.0 - ratio], axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _topk_vals(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """``lax.top_k`` values with a fused-reduce backward.

    top_k's built-in transpose is a scatter of the cotangents into the
    selected positions; XLA lowers that scatter to a serialized kCustom
    fusion costing ~10.3 ms PER CALL at the flagship train shape
    (rows 8·2·2·576, Lm 256 — two calls = 15% of the whole step,
    scripts/train_profile.py --map_top). The selected indices are unique
    per row, so the same gradient is exactly ``grad[..., i] = sum_j
    g[..., j] * (idx[..., j] == i)`` — a broadcast compare+select+reduce
    that XLA fuses to memory-bound passes over the inputs/output only
    (no (..., Lm, k) materialization): sub-ms instead of 10.3.
    """
    return jax.lax.top_k(x, k)[0]


def _topk_vals_fwd(x, k):
    vals, idx = jax.lax.top_k(x, k)
    return vals, (idx, x.shape[-1])


def _topk_vals_bwd(k, res, g):
    idx, n = res
    iota = jnp.arange(n, dtype=idx.dtype)  # (n,)
    out = jnp.sum(
        jnp.where(idx[..., None, :] == iota[:, None],
                  g[..., None, :], jnp.zeros((), g.dtype)),
        axis=-1,
    )  # (..., n)
    return (out,)


_topk_vals.defvjp(_topk_vals_fwd, _topk_vals_bwd)


def _perm_inv_feat_sorted(exp_aff: jnp.ndarray, topl: int) -> jnp.ndarray:
    """``_perm_inv_feat`` via ``lax.top_k`` — for the differentiated path.

    Identical values (a prefix sum over descending-sorted top-l values is
    the same sequence either way, ties included), but O(1) memory passes
    instead of the scan's ``topl`` round trips: at the flagship train shape
    the scan's 64-iteration loop runs in fwd AND transposed bwd per
    supervised frame, while top_k's backward is one unique-index scatter —
    expressed as a fused compare+reduce (``_topk_vals``), since XLA's
    scatter lowering for top_k's transpose is ~10 ms per frame. Measured
    (v5e, bs8 384² bf16, scripts/train_bench.py): 164.6 -> 154.5 ms/step
    for sort-vs-scan (round 3), then 137.6 -> 116.5 for the custom-vjp
    backward (round 4). Forward-only eval keeps the scan variant (measured
    17x faster there — the variadic sort loses on the much larger eval P
    with B=1).
    """
    x = jnp.swapaxes(exp_aff, -2, -1)  # (B, N, 2, P, Lm): Lm minor for sort
    tops = _topk_vals(x, topl)  # descending values (B, N, 2, P, topl)
    feat = jnp.cumsum(tops, axis=-1)
    bg, fg = feat[:, :, 0], feat[:, :, 1]  # branch 0 = bg (swem.py:80-84)
    ratio = bg / (bg + fg + 1e-30)  # (B, N, P, topl)
    return jnp.concatenate([ratio, 1.0 - ratio], axis=-1)


def _gaussian_kernels(aff: jnp.ndarray, hw: Tuple[int, int], n_kernel: int,
                      sigma: float, tau: float) -> jnp.ndarray:
    """Gaussian locality reweighting (modules.py:210-230, inference-only).

    For each prototype, place Gaussians at its top-``n_kernel`` query pixels
    and reweight every pixel by exp(max_kernel / tau).
    aff: (B, N, 2, Lm, P) raw affinities. Returns (B, N, 2, Lm, P).
    """
    h, w = hw
    _, top_idx = jax.lax.top_k(aff, n_kernel)  # (B,N,2,Lm,k) over pixels
    x_idx = (top_idx % w).astype(jnp.float32)  # (..., k)
    y_idx = ((top_idx // w) % h).astype(jnp.float32)
    P = aff.shape[-1]
    pix = jnp.arange(P)
    xv = (pix % w).astype(jnp.float32)  # (P,)
    yv = ((pix // w) % h).astype(jnp.float32)
    d2 = (
        (xv[:, None] - x_idx[..., None, :]) ** 2
        + (yv[:, None] - y_idx[..., None, :]) ** 2
    )  # (B,N,2,Lm,P,k)
    gauss = -d2 / (2.0 * sigma ** 2)
    return jnp.exp(jnp.max(gauss, axis=-1) / tau)


def read_memory(
    qk: jnp.ndarray,
    mk: jnp.ndarray,
    mv: jnp.ndarray,
    base_valid: jnp.ndarray,
    *,
    tau: float,
    topl: int,
    n_kernel: int = 0,
    sigma: float = 7.0,
    hw: Optional[Tuple[int, int]] = None,
    p_drop: float = 0.0,
    drop_rng: Optional[jax.Array] = None,
    use_pallas: bool = False,
    differentiable: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Attention-style memory read (modules.py:232-293).

    qk: (B, P, Ck) raw query keys (l2-normalized here, modules.py:282)
    mk: (B, N, 2, Ck, Lm) raw prototypes (l2-normalized here)
    mv: (B, N, 2, Cv, Lm)
    base_valid: (B, N, 2, Lm) bool
    n_kernel/sigma/hw: optional Gaussian locality reweighting of the
    affinity softmax (modules.py:253-256; inference-only, off by default).
    p_drop/drop_rng: random memory-base dropout on the value-read softmax
    (modules.py:258-263; training-only, 0.0 in the reference). Drops whole
    bases (shared across the {bg,fg} branch pair and all pixels) from the
    read normalization; the top-l feature S uses the undropped affinities,
    exactly as the reference computes S from pre-drop ``exp_aff``.

    Returns (mem_out, S): mem_out (B, N, P, Cv) value read;
    S (B, N, P, 2*topl) permutation-invariant feature.

    The affinity softmax is normalized jointly over the {bg,fg} x Lm base
    axes per object (modules.py:265-266); invalid bases are masked out of
    both the softmax and the top-l feature.

    ``use_pallas`` routes the affinity/softmax/read through the fused VMEM
    kernel (ops/read_pallas.py, inference-only — the caller gates on
    training); the Gaussian-kernel and p_drop variants always take the XLA
    path. ``differentiable=True`` (the training path) extracts the top-l
    feature with the sort-based variant, whose backward is a single gather
    instead of re-running the argmax-delete scan.
    """
    top_feat = _perm_inv_feat_sorted if differentiable else _perm_inv_feat
    if use_pallas and n_kernel == 0 and not (p_drop > 0.0 and drop_rng is not None):
        from swem_tpu.ops.read_pallas import read_memory_pallas

        mem_out, exp_aff = read_memory_pallas(qk, mk, mv, base_valid, tau=tau)
        return mem_out, top_feat(exp_aff, topl)

    qk = l2norm(qk, axis=-1)
    mk = l2norm(mk, axis=-2)
    aff = _einsum("bnscl,bpc->bnslp", mk, qk)
    neg = jnp.asarray(-jnp.inf, aff.dtype)
    aff = jnp.where(base_valid[..., None], aff, neg)
    maxes = jnp.max(aff, axis=(2, 3), keepdims=True)  # joint over {bg,fg} x Lm
    # exp(-inf - max) underflows to exactly 0 for masked bases; the extra
    # where guards the all-invalid case (max = -inf -> nan).
    exp_aff = jnp.where(
        base_valid[..., None], jnp.exp((aff - maxes) / tau), 0.0
    )
    if n_kernel > 0:
        assert hw is not None, "hw=(h16,w16) required for kernel reweighting"
        gauss = _gaussian_kernels(aff, hw, n_kernel, sigma, tau)
        weighted = exp_aff * gauss
        denom = jnp.sum(weighted, axis=(2, 3), keepdims=True)
        p_aff = weighted / (denom + 1e-8)  # modules.py:256 epsilon
    elif p_drop > 0.0 and drop_rng is not None:
        B, N, _, Lm, _ = exp_aff.shape
        keep = (jax.random.uniform(drop_rng, (B, N, 1, Lm, 1)) > p_drop)
        dropped = exp_aff * keep.astype(exp_aff.dtype)
        denom = jnp.sum(dropped, axis=(2, 3), keepdims=True)
        p_aff = dropped / (denom + 1e-6)  # modules.py:262 epsilon
    else:
        denom = jnp.sum(exp_aff, axis=(2, 3), keepdims=True)
        p_aff = exp_aff / (denom + 1e-30)
    mem_out = _einsum(
        "bnsvl,bnslp->bnpv", mv, p_aff)
    S = top_feat(exp_aff, topl)
    return mem_out, S
