"""Object-parallel execution: the padded object axis sharded over a mesh.

The reference's only multi-device strategy is DDP (SURVEY.md §2.5). The
'obj' mesh axis is a TPU-native extension: everything between the EM memory
banks and the soft-aggregation — value-encoder / fusion / decoder towers,
the profiled per-object hot spots — is embarrassingly parallel over the
padded object axis, so GSPMD splits it across chips with one all-gather per
frame at ``aggregate`` (swem.py:110-116). These tests validate, on the
hermetic 8-virtual-device CPU mesh, that sharded execution (a) produces the
unsharded predictions and (b) actually partitions the object axis (the
memory carry's sharding spec is inspected, not assumed).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swem_tpu.engine import ChunkedVideoRunner
from swem_tpu.models.swem import SWEM
from swem_tpu.parallel import make_mesh2
from tests.test_model import tiny_cfg, make_video


@pytest.fixture(scope="module")
def model4_and_vars():
    """Tiny model with a 4-slot object budget (divisible by mesh 'obj')."""
    cfg = tiny_cfg(max_objs=4)
    model = SWEM(cfg)
    rng = np.random.default_rng(0)
    frames, init_mask, _ = make_video(rng, n_objs=2, n_slots=4)
    variables = model.init(jax.random.PRNGKey(0), frames[0], init_mask)
    return model, variables


def _video(rng, B=1, n_objs=3):
    return make_video(rng, T=6, B=B, n_objs=n_objs, n_slots=4)


class TestObjectParallel:
    def test_obj_sharded_runner_matches_local(self, model4_and_vars):
        """Pure object-parallel (mesh 1x4): one video's 4 object slots split
        over 4 devices; predictions match the unsharded runner."""
        model, variables = model4_and_vars
        frames, init_mask, active = _video(np.random.default_rng(3))
        frames = np.asarray(frames)

        local = ChunkedVideoRunner(model, (64, 64), chunk=4)
        want = local(variables, jax.random.PRNGKey(7), frames, init_mask, active)

        mesh = make_mesh2(n_data=1, n_obj=4)
        sharded = ChunkedVideoRunner(model, (64, 64), chunk=4, mesh=mesh)
        got = sharded(variables, jax.random.PRNGKey(7), frames, init_mask, active)
        assert got.shape == want.shape
        # per-device partitioning can flip f32 argmax ties on a few pixels;
        # anything beyond that is a real sharding bug
        assert (got != want).mean() < 1e-3

    def test_data_obj_sharded_runner_matches_local(self, model4_and_vars):
        """Composed 2-D sharding (mesh 2x4): video batch over 'data' AND
        object slots over 'obj'."""
        model, variables = model4_and_vars
        frames, init_mask, active = _video(np.random.default_rng(5), B=2)
        frames = np.asarray(frames)

        local = ChunkedVideoRunner(model, (64, 64), chunk=4)
        want = local(variables, jax.random.PRNGKey(9), frames, init_mask, active)

        mesh = make_mesh2(n_data=2, n_obj=4)
        sharded = ChunkedVideoRunner(model, (64, 64), chunk=4, mesh=mesh)
        got = sharded(variables, jax.random.PRNGKey(9), frames, init_mask, active)
        assert got.shape == want.shape
        assert (got != want).mean() < 1e-3

    def test_memory_carry_is_obj_sharded(self, model4_and_vars):
        """The constraint must stick: the jitted init's memory banks come
        back physically partitioned along the object axis (otherwise the
        'win' would silently be a fully-replicated no-op)."""
        from swem_tpu.engine import init_memory
        from swem_tpu.parallel import EngineSharding

        model, variables = model4_and_vars
        frames, init_mask, active = _video(np.random.default_rng(1))
        mesh = make_mesh2(n_data=1, n_obj=4)
        esh = EngineSharding(mesh)
        mem = jax.jit(
            lambda v, r, f, m, a: init_memory(model, v, r, f, m, a,
                                              sharding=esh)
        )(variables, jax.random.PRNGKey(0), frames[0], init_mask, active)
        spec = mem.first.kappa.sharding.spec
        assert "obj" in jax.tree.leaves(tuple(spec)), spec
        # 4-way sharded N axis: each device holds 1 of 4 slots
        shard_shape = mem.first.kappa.sharding.shard_shape(mem.first.kappa.shape)
        assert shard_shape[1] == mem.first.kappa.shape[1] // 4

    def test_injection_obj_sharded(self, model4_and_vars):
        """YTVOS mid-video injection under object sharding: the traced
        activation/overwrite path crosses shard boundaries (the injected
        slot lives on one device) and must still match the local runner."""
        model, variables = model4_and_vars
        rngn = np.random.default_rng(11)
        frames, init_mask, active = _video(rngn, n_objs=2)
        frames = np.asarray(frames)
        active = np.asarray(active).copy()
        active[:, 2:] = False
        # object 3 appears at frame 3
        idx_map = np.zeros((1, 64, 64), np.uint8)
        idx_map[0, 48:60, 4:20] = 3
        injections = {3: (idx_map, np.array([[False, False, True, False]]))}

        local = ChunkedVideoRunner(model, (64, 64), chunk=4, injectable=True)
        want = local(variables, jax.random.PRNGKey(2), frames, init_mask,
                     jnp.asarray(active), injections=injections)

        mesh = make_mesh2(n_data=1, n_obj=4)
        sharded = ChunkedVideoRunner(model, (64, 64), chunk=4, mesh=mesh,
                                     injectable=True)
        got = sharded(variables, jax.random.PRNGKey(2), frames, init_mask,
                      jnp.asarray(active), injections=injections)
        assert got.shape == want.shape
        assert np.all(got[2, 0][idx_map[0] == 3] == 3)
        assert (got != want).mean() < 1e-3

    def test_committed_variables_are_replicated(self, model4_and_vars):
        """Checkpoint-restored variables arrive COMMITTED to one device
        (orbax -> SingleDeviceSharding); the runner must replicate them over
        the mesh instead of erroring with "incompatible devices". Caught by
        driving eval.py end-to-end with --obj_parallel from an orbax
        checkpoint (model.init outputs are uncommitted and auto-replicate,
        which is why the other tests never tripped it)."""
        model, variables = model4_and_vars
        committed = jax.device_put(variables, jax.devices()[0])
        frames, init_mask, active = _video(np.random.default_rng(3))
        frames = np.asarray(frames)

        local = ChunkedVideoRunner(model, (64, 64), chunk=4)
        want = local(variables, jax.random.PRNGKey(7), frames, init_mask, active)

        mesh = make_mesh2(n_data=1, n_obj=4)
        sharded = ChunkedVideoRunner(model, (64, 64), chunk=4, mesh=mesh)
        sharded.warmup(committed, (64, 64), 1, 4, frame_dtype=frames.dtype)
        got = sharded(committed, jax.random.PRNGKey(7), frames, init_mask, active)
        assert (got != want).mean() < 1e-3

    def test_max_objs_divisibility_enforced(self, model4_and_vars):
        model, _ = model4_and_vars
        mesh = make_mesh2(n_data=1, n_obj=3)
        with pytest.raises(ValueError, match="divisible"):
            ChunkedVideoRunner(model, (64, 64), chunk=4, mesh=mesh)


class TestObjectParallelTraining:
    def test_2d_sharded_train_step_matches_single_device(self):
        """Train step on a ('data', 'obj') = (4, 2) mesh: batch 8 sharded
        4-way, the 2 object slots split over 'obj'. The gradient all-reduce
        AND the per-object backward towers cross shards; loss and the
        post-step params must match the unsharded step (same tolerances as
        the 1-D data-parallel test in test_train.py)."""
        from swem_tpu.parallel import EngineSharding, replicate, shard_batch
        from swem_tpu.train import create_train_state, make_optimizer, make_train_step
        from tests.test_train import make_batch, tiny_train_cfg

        cfg = tiny_train_cfg()
        model = SWEM(cfg.model)
        tx, _ = make_optimizer(cfg.solver)
        batch = make_batch(np.random.default_rng(0))
        state = create_train_state(
            model, jax.random.PRNGKey(0), tx,
            batch["frames"][:, 0], batch["masks"][:, 0],
        )
        big = jax.tree.map(lambda x: jnp.concatenate([x] * 4), batch)

        local_fn = jax.jit(make_train_step(model, cfg, tx))
        s_local, m_local = local_fn(state, big, jax.random.PRNGKey(3))

        mesh = make_mesh2(n_data=4, n_obj=2)
        step_fn = jax.jit(make_train_step(model, cfg, tx,
                                          sharding=EngineSharding(mesh)))
        state_r = replicate(mesh, state)
        batch_s = shard_batch(mesh, big)
        s_shard, m_shard = step_fn(state_r, batch_s, jax.random.PRNGKey(3))

        np.testing.assert_allclose(
            float(m_shard["total_loss"]), float(m_local["total_loss"]), rtol=1e-4
        )
        lr = 2e-4
        diffs = np.concatenate([
            np.abs(np.asarray(a) - np.asarray(b)).ravel()
            for a, b in zip(jax.tree.leaves(s_shard.params),
                            jax.tree.leaves(s_local.params))
        ])
        assert diffs.max() < 3 * lr
        assert np.quantile(diffs, 0.99) < 1e-5


class TestMeshExtentDerivation:
    def test_derive_eval_mesh_extents(self):
        from swem_tpu.parallel import derive_eval_mesh_extents as d

        # pure data parallel: largest extent that divides the batch
        assert d(8, 1, 8) == (8, 1)
        assert d(8, 1, 4) == (4, 1)   # half the chips beat none
        assert d(8, 1, 6) == (6, 1)   # non-power-of-two divisor found
        assert d(8, 1, 3) == (3, 1)
        assert d(1, 1, 4) == (1, 1)   # single device: unsharded
        # 2-D: obj takes its share first, data gets the rest
        assert d(8, 2, 8) == (4, 2)
        assert d(8, 2, 2) == (2, 2)
        assert d(8, 4, 1) == (1, 4)   # pure object parallel
        assert d(8, 3, 8) == (4, 2)   # 3 doesn't divide 8 -> halve to 2
        assert d(6, 2, 3) == (3, 2)
        # oversubscribed obj request clamps to the device count
        assert d(4, 16, 1) == (1, 4)

    def test_clamp_pow2(self):
        from swem_tpu.parallel import clamp_pow2 as c

        assert c(8) == 8
        assert c(7) == 4          # round down to a power of two
        assert c(1) == 1
        assert c(8, 8) == 8
        assert c(8, 12) == 4      # halve until it divides
        assert c(8, 6) == 2
        assert c(8, 5) == 1       # odd divisor forces 1
        assert c(6, 8, 4) == 4    # multiple divisors: all must hold
        assert c(8, 8, 6) == 2

    def test_eval_devices_single_process_is_global(self):
        """Single-process runs see every device; the local-only restriction
        applies only under jax.distributed (disjoint per-process work must
        not build meshes spanning other hosts' devices)."""
        from swem_tpu.parallel import eval_devices

        assert jax.process_count() == 1
        assert eval_devices() == list(jax.devices())


class TestMeshVarsCache:
    def test_cache_keys_by_identity_not_id(self, model4_and_vars):
        """_mesh_vars must re-replicate when handed a DIFFERENT variables
        pytree (checkpoint reload), even one structurally equal to the last;
        keying by raw id() could alias a GC'd dict's reused id and silently
        serve the previous checkpoint's weights."""
        model, variables = model4_and_vars
        mesh = make_mesh2(n_data=1, n_obj=4)
        runner = ChunkedVideoRunner(model, (64, 64), chunk=4, mesh=mesh)

        rep1 = runner._mesh_vars(variables)
        assert runner._mesh_vars(variables) is rep1  # same object: cached
        reloaded = jax.tree.map(lambda x: x + 0, variables)  # "new checkpoint"
        rep2 = runner._mesh_vars(reloaded)
        assert rep2 is not rep1
        # the held key is the object itself (strong ref), immune to id reuse
        assert runner._vars_cache[0] is reloaded
