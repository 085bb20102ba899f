"""Pallas-routing policy (ops/policy.py).

The tri-state ``ModelConfig.use_pallas`` resolves per call site: explicit
bools pass through with the pre-policy semantics (read stays
inference-only); AUTO (None) resolves to the XLA path everywhere — the
end-to-end measurements recorded in the policy module showed no
production shape where the fused kernels pay (op-level wins up to
"12.6x" were microbench artifacts). ``em_pallas_profitable`` remains the
queryable op-level sweep table.
"""

from swem_tpu.ops.policy import em_pallas_profitable, resolve_use_pallas

FLAGSHIP = dict(L=128, n_objs=2, P=1620)
# the reference's config-default NUM_BASES=256 at eval P — the cell whose
# 12.6x op-level "win" measured 0.999x end to end (ops/policy.py)
WIN_OP_LEVEL = dict(L=256, n_objs=4, P=1620)


class TestExplicitFlags:
    def test_true_forces_em_everywhere(self):
        assert resolve_use_pallas(True, op="em", **FLAGSHIP)
        assert resolve_use_pallas(True, op="em", train=True, **FLAGSHIP)

    def test_true_read_stays_inference_only(self):
        assert resolve_use_pallas(True, op="read", **FLAGSHIP)
        assert not resolve_use_pallas(True, op="read", train=True, **FLAGSHIP)

    def test_false_forces_xla(self):
        assert not resolve_use_pallas(False, op="em", **WIN_OP_LEVEL)
        assert not resolve_use_pallas(False, op="read", **WIN_OP_LEVEL)


class TestAuto:
    def test_auto_is_xla_everywhere(self):
        """The measured conclusion: no end-to-end win at any production
        shape, so AUTO == XLA even at the biggest op-level-win cells."""
        for kw in (FLAGSHIP, WIN_OP_LEVEL):
            for op in ("em", "read"):
                for train in (False, True):
                    assert not resolve_use_pallas(None, op=op, train=train, **kw)

    def test_op_level_table_still_queryable(self):
        """The sweep record survives for experiments/future routing: the
        L=256 eval cells measured >=2x op-level; the flagship and the
        L=128 slot buckets did not."""
        assert em_pallas_profitable(256, 4, 1620)
        assert em_pallas_profitable(256, 2, 1620)
        assert not em_pallas_profitable(**{"L": 128, "n_objs": 2, "P": 1620})
        assert not em_pallas_profitable(128, 8, 1620)
        assert not em_pallas_profitable(128, 12, 1620)

    def test_off_grid_uses_nearest_cell(self):
        # just off the measured (256, 4, 1620) cell in each axis
        assert em_pallas_profitable(250, 4, 1600)
        # just off the losing (128, 2, 576) cell
        assert not em_pallas_profitable(130, 2, 600)


class TestModelIntegration:
    """AUTO default leaves behavior byte-identical to use_pallas=False."""

    def test_config_default_is_auto(self):
        from swem_tpu.config import ModelConfig

        assert ModelConfig().use_pallas is None

    def test_auto_equals_false(self):
        for op in ("em", "read"):
            for n_objs in (2, 4, 8, 12):
                for train in (False, True):
                    auto = resolve_use_pallas(None, op=op, L=128,
                                              n_objs=n_objs, P=1620,
                                              train=train)
                    forced = resolve_use_pallas(False, op=op, L=128,
                                                n_objs=n_objs, P=1620,
                                                train=train)
                    assert auto == forced == False  # noqa: E712
