"""Fused Pallas TPU kernel for the Sequential Weighted EM inner loop.

Layout strategy: the query pixels x are SHARED by every object and branch,
so all (object, branch) prototype blocks pack into one wide matmul axis —
each E step is a single (P, Ck) @ (Ck, N*2*L) GEMM and each M step a single
(Ck, P) @ (P, N*2*L) GEMM, keeping the MXU fed instead of looping small
per-object matmuls. kappa/zita/weights stay VMEM-resident across all
``n_iters`` iterations (the XLA path round-trips them through HBM between
iterations).

VMEM note: the (P, N*2*L) responsibility matrix would exceed the VMEM budget
as a double-buffered output, so the kernel emits only the small tensors that
determine the final z (the prototypes entering the last E step and the last
pixel weights); the wrapper recomputes z with one XLA matmul.

Per-block softmax/W-step reductions use static Python loops over the N*2
L-sized column blocks (branch-probability coupling per object,
modules.py:93-110). Semantics match em.py::_e_step/_m_step/_w_step.

Status (measured on v5e — full L x N x P sweep table + end-to-end
validation record in ops/policy.py):
- op-level, the kernel wins 10-25% at multi-object L=128 shapes and
  2.6-12.6x at the reference's config-default L=256 eval cells — but
  NEITHER survives end-to-end: the full production scan measured 1.009x
  at the L=128 8-slot bucket (the EM loop is ~2 ms of a ~24 ms frame)
  and 0.999x at L=256/N=4, whose isolated 24.8 ms XLA number is a
  microbench artifact (the real frame costs ~13.8 ms total — XLA only
  picks the pathological fusion in a bare scan-of-em_updates program).
- compile time with the Mosaic kernel inside the scan grew 3-40x
  through the remote-compile tunnel (20.6 s -> 881.7 s worst case).
- at training shapes it is step-neutral (250.4 vs 247.3 ms/step,
  identical loss).
ModelConfig.use_pallas=None (AUTO, the default) therefore routes every
call site to XLA; True forces this kernel for experiments. Axis closed
as a documented negative (VERDICT r2 item 2).
Note also that f32 matmul chains under tau=0.05 exponentials are chaotic:
individual prototypes may diverge between backends while representing the
same distribution (see tests/test_em_pallas.py tolerances).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _em_kernel(x_ref, masks_ref, kappa0_ref, zita0_ref,
               kappa_ref, zita_ref, kprev_ref, wlast_ref,
               *, n_iters: int, tau: float, n_objs: int, L: int):
    x = x_ref[0]  # (P, Ck)
    xinv = 1.0 / (jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + 1e-6)
    kappa0 = kappa0_ref[0]  # (Ck, N2L), column blocks of L per (object, branch)
    zita0 = zita0_ref[0]  # (1, N2L)
    masks = masks_ref[0]  # (P, N2)
    n2 = 2 * n_objs

    def l2norm_cols(k):
        return k / (jnp.sqrt(jnp.sum(k * k, axis=0, keepdims=True)) + 1e-6)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def blk(t, j):
        return t[:, j * L:(j + 1) * L]

    kappa = kappa0
    weights = masks
    kprev = kappa0
    wlast = masks
    for i in range(n_iters):
        kprev = kappa
        wlast = weights
        # E step: one wide GEMM, per-block softmax over L, pixel weights
        logits = dot(x, l2norm_cols(kappa)) / tau  # (P, N2L)
        zs = []
        for j in range(n2):
            lj = blk(logits, j)
            zj = jax.nn.softmax(lj, axis=-1) * weights[:, j][:, None]
            zs.append(zj)
        z = jnp.concatenate(zs, axis=-1)  # (P, N2L)
        # M step: one wide GEMM, running weighted mean from carried stats
        zita = zita0 + jnp.sum(z, axis=0, keepdims=True)
        kappa = (zita0 * kappa0 + dot(x.T, z)) / zita
        if i < n_iters - 1:
            # W step: per-object branch-probability coupling
            wl = dot(x, l2norm_cols(kappa)) * xinv / tau  # normalized logits
            new_w = []
            for n in range(n_objs):
                l_bg = blk(wl, 2 * n)
                l_fg = blk(wl, 2 * n + 1)
                m = jnp.maximum(
                    jnp.max(l_bg, axis=-1), jnp.max(l_fg, axis=-1)
                )[:, None]
                e_bg = jnp.sum(jnp.exp(l_bg - m), axis=-1)
                e_fg = jnp.sum(jnp.exp(l_fg - m), axis=-1)
                tot = e_bg + e_fg
                new_w.append(masks[:, 2 * n] * (1.0 - e_bg / tot))
                new_w.append(masks[:, 2 * n + 1] * (1.0 - e_fg / tot))
            weights = jnp.stack(new_w, axis=-1)

    kappa_ref[0] = kappa
    zita_ref[0] = zita
    kprev_ref[0] = kprev
    wlast_ref[0] = wlast


def em_loop_pallas(
    x: jnp.ndarray,
    masks: jnp.ndarray,
    kappa0: jnp.ndarray,
    zita0: jnp.ndarray,
    *,
    n_iters: int,
    tau: float,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused EM loop. Shapes as in em.py (f32):

    x (B, P, Ck); masks (B, N, 2, P); kappa0 (B, N, 2, Ck, L);
    zita0 (B, N, 2, 1, L) -> (z (B,N,2,P,L), kappa, zita).

    ``interpret=None`` (default) resolves to Pallas interpret mode on
    non-TPU backends so ``use_pallas=True`` is drivable everywhere (CPU
    compiled Mosaic is unsupported); TPU gets the compiled kernel.

    The whole loop is non-differentiable by SWEM semantics (@torch.no_grad
    on swe/swm/sww — em.em_update wraps the result in stop_gradient), but
    reverse-mode tracing still tries to linearize through pallas_call, which
    has no autodiff rule. A custom_vjp with zero cotangents makes the kernel
    trainable-code-path safe while preserving those semantics.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    specs = [jax.ShapeDtypeStruct(a.shape, a.dtype)
             for a in (x, masks, kappa0, zita0)]

    @jax.custom_vjp
    def call(x, masks, kappa0, zita0):
        return _em_loop_impl(x, masks, kappa0, zita0,
                             n_iters=n_iters, tau=tau, interpret=interpret)

    def fwd(x, masks, kappa0, zita0):
        return call(x, masks, kappa0, zita0), None

    def bwd(_, __):
        return tuple(jnp.zeros(s.shape, s.dtype) for s in specs)

    call.defvjp(fwd, bwd)
    return call(x, masks, kappa0, zita0)


def _em_loop_impl(
    x: jnp.ndarray,
    masks: jnp.ndarray,
    kappa0: jnp.ndarray,
    zita0: jnp.ndarray,
    *,
    n_iters: int,
    tau: float,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    B, P, Ck = x.shape
    N = masks.shape[1]
    L = kappa0.shape[-1]
    n2 = 2 * N
    Pp = _round_up(P, 128)
    x = x.astype(jnp.float32)
    masks = masks.astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, Pp - P), (0, 0))) if Pp != P else x
    # pack (N, 2, ...) into contiguous column blocks
    masks_pk = jnp.swapaxes(masks.reshape(B, n2, P), -1, -2)  # (B, P, N2)
    masks_pk = (
        jnp.pad(masks_pk, ((0, 0), (0, Pp - P), (0, 0))) if Pp != P else masks_pk
    )
    kappa_pk = (
        jnp.moveaxis(kappa0.astype(jnp.float32), 3, 1).reshape(B, Ck, n2 * L)
    )  # (B, Ck, N2L) with column block j = (n, s)
    zita_pk = zita0.astype(jnp.float32).reshape(B, 1, n2 * L)

    kernel = functools.partial(
        _em_kernel, n_iters=n_iters, tau=tau, n_objs=N, L=L
    )
    kappa, zita, kprev, wlast = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Pp, Ck), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp, n2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ck, n2 * L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n2 * L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Ck, n2 * L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n2 * L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ck, n2 * L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp, n2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Ck, n2 * L), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, n2 * L), jnp.float32),
            jax.ShapeDtypeStruct((B, Ck, n2 * L), jnp.float32),
            jax.ShapeDtypeStruct((B, Pp, n2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, masks_pk, kappa_pk, zita_pk)

    def unpack_k(t):  # (B, Ck, N2L) -> (B, N, 2, Ck, L)
        return jnp.moveaxis(t.reshape(B, Ck, N, 2, L), 1, 3)

    kappa = unpack_k(kappa)
    kprev = unpack_k(kprev)
    zita = zita.reshape(B, N, 2, 1, L)
    wlast = jnp.swapaxes(wlast[:, :P], -1, -2).reshape(B, N, 2, P)

    # final-iteration z, recomputed with one XLA matmul (E step on kprev/wlast)
    kn = kprev / (jnp.linalg.norm(kprev, axis=-2, keepdims=True) + 1e-6)
    logits = jnp.einsum(
        "bpc,bnscl->bnspl", x, kn, precision=jax.lax.Precision.HIGHEST
    )
    z = jax.nn.softmax(logits / tau, axis=-1) * wlast[..., None]
    return z, kappa, zita
