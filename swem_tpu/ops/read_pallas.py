"""Fused Pallas TPU kernel for the SWEM memory read (kernel B).

Fuses the affinity GEMM, the per-object joint {bg,fg}x2L masked softmax, and
the value read (reference semantics: /root/reference/methods/SWEM/
modules.py:232-293) into one VMEM-resident pass. The XLA path
(``em.read_memory``) materializes the (P, N*2*Lm) affinity tensor in HBM
several times (raw, masked, exp, normalized); here each P-tile's affinities
live only in VMEM between the two GEMMs.

Layout strategy mirrors kernel A (ops/em_pallas.py): all (object, branch)
prototype blocks pack into one wide GEMM axis — the affinity pass is a
single (Tp, Ck) @ (Ck, N*2*Lm) GEMM per tile and the value read one
(Tp, 2*Lm) @ (2*Lm, Cv) GEMM per object — with the softmax reductions
running per-object over its two L-blocks (the joint bg/fg normalization of
modules.py:265-266).

The permutation-invariant top-l feature S stays in XLA: the kernel emits the
(already masked) exponentiated affinities and ``em._perm_inv_feat`` consumes
them — its argmax-delete extraction is VPU-bound either way, and one HBM
round-trip of exp_aff (~7 MB at eval shapes) costs ~20 us.

Gradients: inference-only (``ModelConfig.use_pallas`` routes the read here
only outside training; the XLA path remains the oracle and the training
path).

Status (measured on v5e): the round-3 L x N x P sweep (scripts/
pallas_sweep.py; table in ops/policy.py) confirms the round-2 negative at
EVERY cell — ratio 0.98-1.12 vs XLA across L in {128, 256}, N in
{2, 4, 8, 12}, P in {576, 1620}, scan-amortized. The kernel body itself
is fast, but the wrapper must pack mk/mv into wide GEMM layouts and
relayout exp_aff from (P, G*Lm) back to the (.., Lm, P) layout the top-l
extraction wants — those transposes cost more than the fused softmax
saves, and XLA's own einsum+fusion pipeline already keeps the affinity
chain off HBM. The AUTO policy (ModelConfig.use_pallas=None) therefore
never selects this kernel; use_pallas=True still routes inference reads
here for experiments. Axis closed as a documented negative result;
revisit only if the read layout ever becomes channel-major end to end.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = 1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _read_kernel(qk_ref, mk_ref, mv_ref, valid_ref,
                 out_ref, exp_ref, *, tau: float, n_objs: int, Lm: int):
    """One (batch, P-tile) grid step.

    qk_ref:  (1, Tp, Ck)      l2-normalized query keys
    mk_ref:  (1, Ck, G*Lm)    l2-normalized packed prototypes (G = 2*n_objs)
    mv_ref:  (1, G*Lm, Cv)    packed value prototypes (row g*Lm+l)
    valid_ref: (1, 1, G*Lm)   0/1 base validity
    out_ref: (1, Tp, N*Cv)    value read, packed per object
    exp_ref: (1, Tp, G*Lm)    masked exponentiated affinities (for S)
    """
    x = qk_ref[0]  # (Tp, Ck)
    mk = mk_ref[0]  # (Ck, G*Lm)
    valid = valid_ref[0]  # (1, G*Lm)

    aff = jax.lax.dot_general(
        x, mk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Tp, G*Lm)
    # mask invalid bases additively so the joint max ignores them
    aff_m = aff + (valid - 1.0) * _NEG_BIG

    W2 = 2 * Lm  # columns per object (both branches)
    Tp = aff.shape[0]
    # per-object joint max / sum, broadcast back to full width (Mosaic
    # handles (Tp, 1) -> (Tp, W2) lane broadcasts; broadcasting *sliced*
    # (1, W2) rows does not lower, so all row-vector ops stay full-width)
    maxes = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.max(aff_m[:, n * W2:(n + 1) * W2], axis=-1, keepdims=True),
                (Tp, W2),
            )
            for n in range(n_objs)
        ],
        axis=-1,
    )  # (Tp, G*Lm)
    e = jnp.exp((aff_m - maxes) / tau) * valid  # exact 0 for invalid bases
    denom = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.sum(e[:, n * W2:(n + 1) * W2], axis=-1, keepdims=True),
                (Tp, W2),
            )
            for n in range(n_objs)
        ],
        axis=-1,
    )
    p = e / (denom + 1e-30)
    exp_ref[0] = e
    for n in range(n_objs):
        mv_n = mv_ref[0, pl.ds(n * W2, W2), :]  # (2Lm, Cv)
        out = jax.lax.dot_general(
            p[:, n * W2:(n + 1) * W2], mv_n, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (Tp, Cv)
        Cv = out.shape[-1]
        out_ref[0, :, n * Cv:(n + 1) * Cv] = out


def read_memory_pallas(
    qk: jnp.ndarray,
    mk: jnp.ndarray,
    mv: jnp.ndarray,
    base_valid: jnp.ndarray,
    *,
    tau: float,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused affinity + joint softmax + value read.

    qk: (B, P, Ck) raw query keys; mk: (B, N, 2, Ck, Lm) raw prototypes;
    mv: (B, N, 2, Cv, Lm); base_valid: (B, N, 2, Lm) bool.
    Returns (mem_out (B, N, P, Cv), exp_aff (B, N, 2, Lm, P)) matching the
    intermediate/output of em.read_memory's XLA formulation.
    ``interpret=None`` (default) resolves to interpret mode on non-TPU
    backends so ``use_pallas=True`` is drivable everywhere.
    """
    from swem_tpu.models.em import l2norm

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, P, Ck = qk.shape
    N, _, _, Lm = mk.shape[1], mk.shape[2], mk.shape[3], mk.shape[4]
    Cv = mv.shape[3]
    G = 2 * N

    qk = l2norm(qk.astype(jnp.float32), axis=-1)
    mk = l2norm(mk.astype(jnp.float32), axis=-2)
    # pack (N, 2, Ck|Cv, Lm) into contiguous column/row blocks g = (n, s)
    mkp = jnp.moveaxis(mk, 3, 1).reshape(B, Ck, G * Lm)
    mvp = jnp.moveaxis(mv.astype(jnp.float32), 3, 4).reshape(B, G * Lm, Cv)
    validp = base_valid.reshape(B, 1, G * Lm).astype(jnp.float32)

    # tile P: ~512-row tiles padded to the f32 sublane quantum
    nP = max(1, -(-P // 512))
    Tp = _round_up(-(-P // nP), 128)
    Pp = nP * Tp
    qkp = jnp.pad(qk, ((0, 0), (0, Pp - P), (0, 0))) if Pp != P else qk

    kernel = functools.partial(_read_kernel, tau=tau, n_objs=N, Lm=Lm)
    out, exp_aff = pl.pallas_call(
        kernel,
        grid=(B, nP),
        in_specs=[
            pl.BlockSpec((1, Tp, Ck), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ck, G * Lm), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * Lm, Cv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G * Lm), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Tp, N * Cv), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, G * Lm), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Pp, N * Cv), jnp.float32),
            jax.ShapeDtypeStruct((B, Pp, G * Lm), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkp, mkp, mvp, validp)

    mem_out = out[:, :P].reshape(B, P, N, Cv)
    mem_out = jnp.moveaxis(mem_out, 1, 2)  # (B, N, P, Cv)
    exp_aff = exp_aff[:, :P].reshape(B, P, N, 2, Lm)
    exp_aff = jnp.transpose(exp_aff, (0, 2, 3, 4, 1))  # (B, N, 2, Lm, P)
    return mem_out, exp_aff
