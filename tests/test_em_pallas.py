"""Pallas EM kernel parity tests (interpret mode on CPU; the XLA em.py path
is the oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swem_tpu.models import em
from swem_tpu.ops.em_pallas import em_loop_pallas
from test_em import make_inputs


def xla_loop(x, masks, kappa0, zita0, n_iters, tau):
    """The reference XLA path's loop outputs (via em_update internals)."""
    bases = em.em_update(
        jnp.asarray(x), jnp.zeros((x.shape[0], masks.shape[1], x.shape[1], 4)),
        jnp.asarray(masks),
        em.Bases(jnp.asarray(kappa0),
                 jnp.zeros(kappa0.shape[:3] + (4, kappa0.shape[-1])),
                 jnp.asarray(zita0)),
        n_iters=n_iters, tau=tau,
    )
    return bases.kappa, bases.zita


@pytest.mark.parametrize("P", [48, 130])  # non-multiple-of-128 exercises padding
@pytest.mark.parametrize("n_iters", [1, 4])
@pytest.mark.parametrize("N", [2, 8])  # 8 = a slot bucket the AUTO policy routes here
def test_kernel_matches_xla(rng, P, n_iters, N):
    x, v, masks, kappa0, nu0, zita0 = make_inputs(rng, B=2, N=N, P=P, Ck=16, Cv=8, L=8)
    tau = 0.05
    z, kappa, zita = em_loop_pallas(
        jnp.asarray(x), jnp.asarray(masks), jnp.asarray(kappa0), jnp.asarray(zita0),
        n_iters=n_iters, tau=tau, interpret=True,
    )
    ref_kappa, ref_zita = xla_loop(x, masks, kappa0, zita0, n_iters, tau)
    # tau=0.05 exponentials amplify f32 reduction-order differences across
    # iterations (see test_em.py), and more objects compound it (more terms
    # in the joint softmax/coupling reductions); allow proportionally looser
    # bounds — a packing/wiring bug would be O(1) wrong everywhere, not
    # <1% of elements off by ~3e-2
    rtol, atol = (1e-4, 1e-5) if n_iters == 1 else (5e-2, 1e-2)
    np.testing.assert_allclose(np.asarray(kappa), np.asarray(ref_kappa),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(zita), np.asarray(ref_zita),
                               rtol=rtol, atol=atol)
    assert z.shape == (2, N, 2, P, 8)


@pytest.mark.parametrize("P", [48, 130])  # non-multiple-of-128 exercises padding
@pytest.mark.parametrize("masked", [False, True])
def test_read_kernel_matches_xla(rng, P, masked):
    """Kernel B (fused read) vs the XLA em.read_memory oracle."""
    from swem_tpu.ops.read_pallas import read_memory_pallas

    B, N, Ck, Cv, L = 2, 2, 16, 8, 8
    Lm = 2 * L
    qk = jnp.asarray(rng.standard_normal((B, P, Ck)).astype(np.float32))
    mk = jnp.asarray(rng.standard_normal((B, N, 2, Ck, Lm)).astype(np.float32))
    mv = jnp.asarray(rng.standard_normal((B, N, 2, Cv, Lm)).astype(np.float32))
    if masked:
        # second bank invalid (mem_count < 2) for one object, all valid other
        valid = np.ones((B, N, 2, Lm), bool)
        valid[:, 0, :, L:] = False
        valid = jnp.asarray(valid)
    else:
        valid = jnp.ones((B, N, 2, Lm), bool)
    tau, topl = 0.05, 4

    ref_out, ref_S = em.read_memory(qk, mk, mv, valid, tau=tau, topl=topl)
    mem_out, exp_aff = read_memory_pallas(qk, mk, mv, valid, tau=tau,
                                          interpret=True)
    S = em._perm_inv_feat(exp_aff, topl)
    np.testing.assert_allclose(np.asarray(mem_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(S), np.asarray(ref_S),
                               rtol=1e-4, atol=1e-6)


def test_read_memory_pallas_flag(rng):
    """read_memory(use_pallas=True) == read_memory(use_pallas=False)."""
    import swem_tpu.ops.read_pallas as rp

    B, N, P, Ck, Cv, Lm = 1, 2, 40, 16, 8, 16
    qk = jnp.asarray(rng.standard_normal((B, P, Ck)).astype(np.float32))
    mk = jnp.asarray(rng.standard_normal((B, N, 2, Ck, Lm)).astype(np.float32))
    mv = jnp.asarray(rng.standard_normal((B, N, 2, Cv, Lm)).astype(np.float32))
    valid = jnp.ones((B, N, 2, Lm), bool)
    ref = em.read_memory(qk, mk, mv, valid, tau=0.05, topl=4)

    orig = rp.read_memory_pallas
    rp.read_memory_pallas = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        got = em.read_memory(qk, mk, mv, valid, tau=0.05, topl=4,
                             use_pallas=True)
    finally:
        rp.read_memory_pallas = orig
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-6)


def test_em_update_pallas_flag(rng):
    """em_update(use_pallas=True) == em_update(use_pallas=False) end to end."""
    x, v, masks, kappa0, nu0, zita0 = make_inputs(rng, P=64, Ck=16, Cv=8, L=8)
    bases0 = em.Bases(jnp.asarray(kappa0), jnp.asarray(nu0), jnp.asarray(zita0))
    args = (jnp.asarray(x), jnp.asarray(v), jnp.asarray(masks), bases0)
    ref = em.em_update(*args, n_iters=3, tau=0.05, use_pallas=False)
    # interpret mode is reached through the pallas flag on CPU automatically
    import swem_tpu.ops.em_pallas as k

    orig = k.em_loop_pallas
    k_interp = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    k.em_loop_pallas = k_interp
    try:
        got = em.em_update(*args, n_iters=3, tau=0.05, use_pallas=True)
    finally:
        k.em_loop_pallas = orig
    np.testing.assert_allclose(np.asarray(got.kappa), np.asarray(ref.kappa),
                               rtol=1e-2, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got.nu), np.asarray(ref.nu),
                               rtol=1e-2, atol=3e-4)
