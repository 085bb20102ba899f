"""Unit tests for the Sequential Weighted EM core.

The oracle is an independent numpy transcription of the published SWEM
algorithm (E/M/W equations as documented in SURVEY.md §2.2), not the
reference code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swem_tpu.models import em


def np_l2norm(x, axis):
    return x / (np.linalg.norm(x, axis=axis, keepdims=True) + 1e-6)


def np_softmax(x, axis):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def np_em_update(x, v, masks, kappa0, nu0, zita0, n_iters, tau):
    """Numpy oracle for one EM frame update.

    x: (B,P,Ck); v: (B,N,P,Cv); masks: (B,N,2,P);
    kappa0: (B,N,2,Ck,L); nu0: (B,N,2,Cv,L); zita0: (B,N,2,1,L)
    """
    B, P, Ck = x.shape
    weights = masks.copy()
    kappa = kappa0.copy()
    xn = np_l2norm(x, axis=-1)
    z = None
    for i in range(n_iters):
        # E: z = softmax_L(x . l2norm(kappa) / tau) * weights
        kn = np_l2norm(kappa, axis=-2)
        logits = np.einsum("bpc,bnscl->bnspl", x, kn)
        z = np_softmax(logits / tau, axis=-1) * weights[..., None]
        # M: zita = zita0 + sum_p z ; kappa = (zita0*kappa0 + x^T z)/zita
        zita = zita0 + np.sum(z, axis=-2)[:, :, :, None, :]
        kappa = (zita0 * kappa0 + np.einsum("bpc,bnspl->bnscl", x, z)) / zita
        # W: weights = masks * (1 - branch prob), both x and kappa normalized
        if i < n_iters - 1:
            kn = np_l2norm(kappa, axis=-2)
            zz = np.einsum("bpc,bnscl->bnspl", xn, kn)
            maxes = np.max(zz, axis=-1, keepdims=True)
            maxes = np.max(maxes, axis=2, keepdims=True)
            z_exp = np.exp((zz - maxes) / tau)
            sum_exp = np.sum(z_exp, axis=-1)
            props = sum_exp / np.sum(sum_exp, axis=2, keepdims=True)
            weights = masks * (1.0 - props)
    nu = (zita0 * nu0 + np.einsum("bnpv,bnspl->bnsvl", v, z)) / zita
    return kappa, nu, zita


def make_inputs(rng, B=2, N=2, P=48, Ck=16, Cv=24, L=8):
    x = rng.standard_normal((B, P, Ck)).astype(np.float32)
    v = rng.standard_normal((B, N, P, Cv)).astype(np.float32)
    fg = (rng.random((B, N, P)) > 0.5).astype(np.float32)
    masks = np.stack([1.0 - fg, fg], axis=2)  # (B,N,2,P)
    kappa0 = np_l2norm(
        rng.standard_normal((B, N, 2, Ck, L)).astype(np.float32), axis=-2
    )
    nu0 = np.zeros((B, N, 2, Cv, L), np.float32)
    zita0 = np.full((B, N, 2, 1, L), 1e-6, np.float32)
    return x, v, masks, kappa0, nu0, zita0


class TestEMUpdate:
    @pytest.mark.parametrize("n_iters", [1, 4])
    def test_matches_numpy_oracle(self, rng, n_iters):
        # float64 on both sides: tau=0.05 exponentials amplify f32 reduction
        # order differences, so the semantics check runs in double precision.
        x, v, masks, kappa0, nu0, zita0 = [
            a.astype(np.float64) for a in make_inputs(rng)
        ]
        tau = 0.05
        ref_k, ref_n, ref_z = np_em_update(
            x, v, masks, kappa0, nu0, zita0, n_iters, tau
        )
        with jax.enable_x64(True):
            out = em.em_update(
                jnp.asarray(x),
                jnp.asarray(v),
                jnp.asarray(masks),
                em.Bases(jnp.asarray(kappa0), jnp.asarray(nu0), jnp.asarray(zita0)),
                n_iters=n_iters,
                tau=tau,
            )
            np.testing.assert_allclose(out.kappa, ref_k, rtol=1e-9, atol=1e-11)
            np.testing.assert_allclose(out.nu, ref_n, rtol=1e-9, atol=1e-11)
            np.testing.assert_allclose(out.zita, ref_z, rtol=1e-9, atol=1e-11)

    def test_zero_mask_slot_is_noop(self, rng):
        """Inactive object slots (all-zero masks) must leave bases unchanged.

        This property is what makes static max-object padding exact.
        """
        x, v, masks, kappa0, nu0, zita0 = make_inputs(rng)
        masks[:, 1] = 0.0  # object 1 inactive (both bg and fg weights zero)
        out = em.em_update(
            jnp.asarray(x),
            jnp.asarray(v),
            jnp.asarray(masks),
            em.Bases(jnp.asarray(kappa0), jnp.asarray(nu0), jnp.asarray(zita0)),
            n_iters=4,
            tau=0.05,
        )
        np.testing.assert_allclose(out.kappa[:, 1], kappa0[:, 1], atol=1e-6)
        np.testing.assert_allclose(out.nu[:, 1], nu0[:, 1], atol=1e-6)
        np.testing.assert_allclose(out.zita[:, 1], zita0[:, 1], atol=1e-6)

    def test_gradients_only_through_values(self, rng):
        """kappa/zita are stop-gradient; nu carries grads through v and nu0."""
        x, v, masks, kappa0, nu0, zita0 = make_inputs(rng, B=1, N=1, P=16, Ck=4, Cv=4, L=4)
        bases0 = em.Bases(jnp.asarray(kappa0), jnp.asarray(nu0), jnp.asarray(zita0))

        def f_x(xx):
            out = em.em_update(xx, jnp.asarray(v), jnp.asarray(masks), bases0, n_iters=2, tau=0.05)
            return jnp.sum(out.kappa) + jnp.sum(out.zita)

        gx = jax.grad(f_x)(jnp.asarray(x))
        np.testing.assert_allclose(gx, 0.0, atol=0)

        def f_v(vv):
            out = em.em_update(jnp.asarray(x), vv, jnp.asarray(masks), bases0, n_iters=2, tau=0.05)
            return jnp.sum(out.nu)

        gv = jax.grad(f_v)(jnp.asarray(v))
        assert float(jnp.abs(gv).max()) > 0.0

    def test_jit_and_scan_compatible(self, rng):
        x, v, masks, kappa0, nu0, zita0 = make_inputs(rng)
        bases0 = em.Bases(jnp.asarray(kappa0), jnp.asarray(nu0), jnp.asarray(zita0))

        @jax.jit
        def step(bases, _):
            out = em.em_update(
                jnp.asarray(x), jnp.asarray(v), jnp.asarray(masks), bases,
                n_iters=2, tau=0.05,
            )
            return out, out.zita.sum()

        final, sums = jax.lax.scan(step, bases0, jnp.arange(3))
        assert final.kappa.shape == kappa0.shape
        assert sums.shape == (3,)
        assert np.all(np.isfinite(np.asarray(final.nu)))


class TestMemoryBanks:
    def test_first_bank_frozen_after_activation(self, rng):
        x, v, masks, *_ = make_inputs(rng)
        B, N = masks.shape[:2]
        key = jax.random.PRNGKey(0)
        mem = em.fresh_memory(key, B, N, x.shape[-1], v.shape[-1], 8)
        active = jnp.ones((B, N), bool)
        mem1 = em.memorize(mem, jnp.asarray(x), jnp.asarray(v), jnp.asarray(masks),
                           active, n_iters=2, tau=0.05)
        # second frame with different features
        x2 = jnp.asarray(x[:, ::-1].copy())
        mem2 = em.memorize(mem1, x2, jnp.asarray(v), jnp.asarray(masks),
                           active, n_iters=2, tau=0.05)
        np.testing.assert_allclose(mem2.first.kappa, mem1.first.kappa)
        assert not np.allclose(mem2.update.kappa, mem1.update.kappa)
        assert int(mem2.mem_count) == 2

    def test_late_object_injection(self, rng):
        """Object activated at frame 2 gets its 'first' bases from frame 2."""
        x, v, masks, *_ = make_inputs(rng)
        B, N = masks.shape[:2]
        key = jax.random.PRNGKey(1)
        mem = em.fresh_memory(key, B, N, x.shape[-1], v.shape[-1], 8)
        active0 = jnp.asarray(np.array([[True, False]] * B))
        m0 = masks.copy()
        m0[:, 1] = 0.0
        mem = em.memorize(mem, jnp.asarray(x), jnp.asarray(v), jnp.asarray(m0),
                          active0, n_iters=2, tau=0.05)
        assert bool(mem.obj_seen[0, 0]) and not bool(mem.obj_seen[0, 1])
        frozen_obj0 = np.asarray(mem.first.kappa[:, 0])
        # frame 2: object 1 appears
        active1 = jnp.ones((B, N), bool)
        mem = em.memorize(mem, jnp.asarray(x), jnp.asarray(v), jnp.asarray(masks),
                          active1, n_iters=2, tau=0.05)
        assert bool(mem.obj_seen[0, 1])
        np.testing.assert_allclose(np.asarray(mem.first.kappa[:, 0]), frozen_obj0)
        # object 1's first == update (both written at activation frame)
        np.testing.assert_allclose(
            np.asarray(mem.first.kappa[:, 1]), np.asarray(mem.update.kappa[:, 1])
        )

    def test_gather_memory_validity(self, rng):
        x, v, masks, *_ = make_inputs(rng)
        B, N = masks.shape[:2]
        key = jax.random.PRNGKey(2)
        mem = em.fresh_memory(key, B, N, x.shape[-1], v.shape[-1], 8)
        active = jnp.ones((B, N), bool)
        mem1 = em.memorize(mem, jnp.asarray(x), jnp.asarray(v), jnp.asarray(masks),
                           active, n_iters=2, tau=0.05)
        mk, mv, valid = em.gather_memory(mem1)
        assert mk.shape[-1] == 16 and valid.shape[-1] == 16
        # after one memorize only the first half is valid
        assert np.all(np.asarray(valid[..., :8])) and not np.any(np.asarray(valid[..., 8:]))
        mem2 = em.memorize(mem1, jnp.asarray(x), jnp.asarray(v), jnp.asarray(masks),
                           active, n_iters=2, tau=0.05)
        _, _, valid2 = em.gather_memory(mem2)
        assert np.all(np.asarray(valid2))


class TestReadMemory:
    def np_read(self, qk, mk, mv, tau, topl):
        """Numpy oracle of the default matching path (no base masking)."""
        qk = np_l2norm(qk, axis=-1)
        mk = np_l2norm(mk, axis=-2)
        aff = np.einsum("bnscl,bpc->bnslp", mk, qk)
        maxes = np.max(aff, axis=(2, 3), keepdims=True)
        exp_aff = np.exp((aff - maxes) / tau)
        p_aff = exp_aff / np.sum(exp_aff, axis=(2, 3), keepdims=True)
        mem_out = np.einsum("bnsvl,bnslp->bnpv", mv, p_aff)
        # top-l cumulative feature
        s = -np.sort(-exp_aff, axis=3)[:, :, :, :topl]  # (B,N,2,topl,P)
        feat = np.cumsum(s, axis=3)
        ratio = feat[:, :, 0] / (feat[:, :, 0] + feat[:, :, 1])  # (B,N,topl,P)
        S = np.concatenate([ratio, 1 - ratio], axis=2)  # (B,N,2*topl,P)
        return mem_out, np.moveaxis(S, 2, 3)

    def test_matches_numpy_oracle(self, rng):
        B, N, P, Ck, Cv, L = 2, 2, 32, 8, 12, 16
        qk = rng.standard_normal((B, P, Ck)).astype(np.float32)
        mk = rng.standard_normal((B, N, 2, Ck, L)).astype(np.float32)
        mv = rng.standard_normal((B, N, 2, Cv, L)).astype(np.float32)
        valid = jnp.ones((B, N, 2, L), bool)
        ref_out, ref_S = self.np_read(qk, mk, mv, tau=0.05, topl=4)
        mem_out, S = em.read_memory(
            jnp.asarray(qk), jnp.asarray(mk), jnp.asarray(mv), valid, tau=0.05, topl=4
        )
        np.testing.assert_allclose(mem_out, ref_out, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(S, ref_S, rtol=2e-4, atol=1e-5)

    def test_masked_equals_smaller_bank(self, rng):
        """Masking the second half of 2L bases == running with L bases only."""
        B, N, P, Ck, Cv, L = 1, 2, 24, 8, 12, 16
        qk = rng.standard_normal((B, P, Ck)).astype(np.float32)
        mk = rng.standard_normal((B, N, 2, Ck, L)).astype(np.float32)
        mv = rng.standard_normal((B, N, 2, Cv, L)).astype(np.float32)
        mk2 = np.concatenate([mk, rng.standard_normal(mk.shape).astype(np.float32)], -1)
        mv2 = np.concatenate([mv, rng.standard_normal(mv.shape).astype(np.float32)], -1)
        valid = np.zeros((B, N, 2, 2 * L), bool)
        valid[..., :L] = True
        out_small, S_small = em.read_memory(
            jnp.asarray(qk), jnp.asarray(mk), jnp.asarray(mv),
            jnp.ones((B, N, 2, L), bool), tau=0.05, topl=4,
        )
        out_masked, S_masked = em.read_memory(
            jnp.asarray(qk), jnp.asarray(mk2), jnp.asarray(mv2),
            jnp.asarray(valid), tau=0.05, topl=4,
        )
        np.testing.assert_allclose(out_masked, out_small, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(S_masked, S_small, rtol=1e-5, atol=1e-6)

    def test_p_drop_zero_is_noop(self, rng):
        """p_drop=0 must match the default path even with an rng supplied."""
        B, N, P, Ck, Cv, L = 1, 2, 24, 8, 12, 16
        qk = rng.standard_normal((B, P, Ck)).astype(np.float32)
        mk = rng.standard_normal((B, N, 2, Ck, L)).astype(np.float32)
        mv = rng.standard_normal((B, N, 2, Cv, L)).astype(np.float32)
        valid = jnp.ones((B, N, 2, L), bool)
        base = em.read_memory(
            jnp.asarray(qk), jnp.asarray(mk), jnp.asarray(mv), valid,
            tau=0.05, topl=4,
        )
        dropped = em.read_memory(
            jnp.asarray(qk), jnp.asarray(mk), jnp.asarray(mv), valid,
            tau=0.05, topl=4, p_drop=0.0, drop_rng=jax.random.PRNGKey(0),
        )
        for a, b in zip(base, dropped):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_p_drop_matches_manual_renormalization(self, rng):
        """p_drop drops whole bases from the read softmax (shared over the
        {bg,fg} pair and all pixels, modules.py:258-262) and renormalizes
        with +1e-6; the top-l feature S stays undropped."""
        B, N, P, Ck, Cv, L = 1, 2, 24, 8, 12, 16
        tau, topl, p_drop = 0.05, 4, 0.5
        qk = rng.standard_normal((B, P, Ck)).astype(np.float32)
        mk = rng.standard_normal((B, N, 2, Ck, L)).astype(np.float32)
        mv = rng.standard_normal((B, N, 2, Cv, L)).astype(np.float32)
        valid = jnp.ones((B, N, 2, L), bool)
        key = jax.random.PRNGKey(7)
        out_drop, S_drop = em.read_memory(
            jnp.asarray(qk), jnp.asarray(mk), jnp.asarray(mv), valid,
            tau=tau, topl=topl, p_drop=p_drop, drop_rng=key,
        )
        _, S_base = em.read_memory(
            jnp.asarray(qk), jnp.asarray(mk), jnp.asarray(mv), valid,
            tau=tau, topl=topl,
        )
        np.testing.assert_array_equal(np.asarray(S_drop), np.asarray(S_base))

        # manual: same keep mask (the rng draw is deterministic), renormalize
        keep = np.asarray(jax.random.uniform(key, (B, N, 1, L, 1)) > p_drop)
        qkn = np_l2norm(qk, axis=-1)
        mkn = np_l2norm(mk, axis=-2)
        aff = np.einsum("bnscl,bpc->bnslp", mkn, qkn)
        exp_aff = np.exp((aff - aff.max(axis=(2, 3), keepdims=True)) / tau)
        dropped = exp_aff * keep
        p_aff = dropped / (dropped.sum(axis=(2, 3), keepdims=True) + 1e-6)
        want = np.einsum("bnsvl,bnslp->bnpv", mv, p_aff)
        np.testing.assert_allclose(np.asarray(out_drop), want, rtol=2e-4, atol=1e-5)
        # the drop actually changed something
        assert not np.allclose(np.asarray(out_drop), self.np_read(qk, mk, mv, tau, topl)[0])

    def test_sorted_top_feat_matches_scan_variant(self, rng):
        """The differentiated-path top-l feature (lax.top_k) must equal the
        argmax-delete scan variant bit-for-bit, ties included."""
        B, N, Lm, P, topl = 2, 2, 16, 24, 4
        exp_aff = np.exp(
            rng.standard_normal((B, N, 2, Lm, P)).astype(np.float32))
        # inject exact ties so both tie-handling paths are exercised
        exp_aff[0, 0, 0, 3] = exp_aff[0, 0, 0, 7]
        exp_aff[1, 1, 1, 0] = exp_aff[1, 1, 1, 1]
        a = np.asarray(em._perm_inv_feat(jnp.asarray(exp_aff), topl))
        b = np.asarray(em._perm_inv_feat_sorted(jnp.asarray(exp_aff), topl))
        np.testing.assert_array_equal(a, b)

    def test_differentiable_read_matches_and_has_finite_grads(self, rng):
        """read_memory(differentiable=True) is value-identical to the eval
        path and its gradients w.r.t. every input are finite."""
        B, N, P, Ck, Cv, L = 1, 2, 24, 8, 12, 16
        qk = jnp.asarray(rng.standard_normal((B, P, Ck)).astype(np.float32))
        mk = jnp.asarray(rng.standard_normal((B, N, 2, Ck, L)).astype(np.float32))
        mv = jnp.asarray(rng.standard_normal((B, N, 2, Cv, L)).astype(np.float32))
        valid = jnp.ones((B, N, 2, L), bool)
        out_e, S_e = em.read_memory(qk, mk, mv, valid, tau=0.05, topl=4)
        out_t, S_t = em.read_memory(
            qk, mk, mv, valid, tau=0.05, topl=4, differentiable=True)
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_e),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(S_t), np.asarray(S_e),
                                   rtol=1e-6, atol=1e-7)

        def loss(qk, mk, mv):
            o, S = em.read_memory(
                qk, mk, mv, valid, tau=0.05, topl=4, differentiable=True)
            return jnp.sum(o ** 2) + jnp.sum(S ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(qk, mk, mv)
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))
            assert np.any(np.asarray(g) != 0)

    def test_no_nans_for_unseen_objects(self, rng):
        B, N, P, Ck, Cv, L = 1, 2, 24, 8, 12, 16
        qk = rng.standard_normal((B, P, Ck)).astype(np.float32)
        mk = rng.standard_normal((B, N, 2, Ck, L)).astype(np.float32)
        mv = rng.standard_normal((B, N, 2, Cv, L)).astype(np.float32)
        valid = np.zeros((B, N, 2, L), bool)
        valid[:, 0] = True  # object 1 entirely unseen
        mem_out, S = em.read_memory(
            jnp.asarray(qk), jnp.asarray(mk), jnp.asarray(mv),
            jnp.asarray(valid), tau=0.05, topl=4,
        )
        assert np.all(np.isfinite(np.asarray(mem_out)))
        assert np.all(np.isfinite(np.asarray(S)))


class TestActiveGating:
    def test_inactive_slot_ignores_bg_ones_masks(self, rng):
        """prepare_em_masks gives inactive (all-zero) mask channels bg=1;
        memorize must gate them by `active` so not-yet-appeared objects keep
        their fresh random init until activation (the reference random-inits
        at the first annotated frame, modules.py:140-146)."""
        x, v, masks, *_ = make_inputs(rng)
        B, N = masks.shape[:2]
        masks = masks.copy()
        masks[:, 1, 0] = 1.0  # bg channel all-ones for the inactive slot
        masks[:, 1, 1] = 0.0
        key = jax.random.PRNGKey(5)
        mem = em.fresh_memory(key, B, N, x.shape[-1], v.shape[-1], 8)
        active = jnp.asarray(np.array([[True, False]] * B))
        mem1 = em.memorize(mem, jnp.asarray(x), jnp.asarray(v), jnp.asarray(masks),
                           active, n_iters=3, tau=0.05)
        np.testing.assert_allclose(mem1.update.kappa[:, 1], mem.update.kappa[:, 1],
                                   atol=1e-7)
        np.testing.assert_allclose(mem1.update.zita[:, 1], mem.update.zita[:, 1],
                                   atol=1e-7)
        # the active slot still updates normally
        assert not np.allclose(mem1.update.kappa[:, 0], mem.update.kappa[:, 0])
