"""Checkpoint-converter tests.

The oracle is an independently written *inverse* mapping: every parameter in
our flax SWEM tree is assigned its torch state_dict key following the
reference module attribute names (networks.py, mod_resnet.py, modules.py,
swem.py). A synthetic torch state_dict built from those keys must convert
into exactly our tree (same paths, transposed values). This catches any
naming or layout drift between the flax model and the reference checkpoint
format without needing torchvision.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swem_tpu.config import ModelConfig
from swem_tpu.io.checkpoint import widen_value_encoder
from swem_tpu.io.torch_import import convert_resnet_state_dict, convert_swem_state_dict
from swem_tpu.models.swem import SWEM


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def inverse_torch_key(col, path):
    """flax (collection, path) -> (torch key, layout transform)."""
    parts = list(path)
    leaf = parts.pop()
    # module path translation (reference attribute names)
    toks = []
    for i, p in enumerate(parts):
        if p == "trunk":
            continue
        if p.startswith("layer") and "_" in p and p.split("_")[1].isdigit():
            stage, idx = p.split("_")
            if parts[0] == "key_encoder" and stage == "layer1":
                stage = "res2"  # KeyEncoder.res2 = resnet.layer1 (networks.py:153)
            toks.extend([stage, idx])
        elif p == "downsample_conv":
            toks.extend(["downsample", "0"])
        elif p == "downsample_bn":
            toks.extend(["downsample", "1"])
        elif p == "channel_gate":
            toks.append("ChannelGate")
        elif p == "spatial_gate":
            toks.append("SpatialGate")
        elif p == "fc1":
            toks.extend(["mlp", "1"])
        elif p == "fc2":
            toks.extend(["mlp", "3"])
        elif p == "conv" and "spatial_gate" in parts:
            toks.extend(["spatial", "conv"])
        elif p == "fusion":
            toks.extend(["swem_core", "fusion_layer"])
        else:
            toks.append(p)
    leaf_map = {
        ("params", "kernel"): "weight",
        ("params", "scale"): "weight",
        ("params", "bias"): "bias",
        ("batch_stats", "mean"): "running_mean",
        ("batch_stats", "var"): "running_var",
    }
    return ".".join(toks + [leaf_map[(col, leaf)]])


def to_torch_layout(leaf_name, arr):
    if leaf_name == "kernel" and arr.ndim == 4:
        return np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
    if leaf_name == "kernel" and arr.ndim == 2:
        return np.transpose(arr, (1, 0))
    return arr


@pytest.fixture(scope="module")
def abstract_vars():
    cfg = ModelConfig()  # flagship structure: r50 key encoder, r18 value encoder
    model = SWEM(cfg)
    frame = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask = jnp.zeros((1, 64, 64, cfg.max_objs + 1), jnp.float32)
    return jax.eval_shape(model.init, jax.random.PRNGKey(0), frame, mask)


class TestSWEMConverter:
    def test_roundtrip_full_tree(self, abstract_vars, rng):
        flat = {}
        for col in ("params", "batch_stats"):
            flat.update({(col,) + p: v for p, v in flatten(abstract_vars[col]).items()})
        # synthesize the torch checkpoint
        state_dict = {}
        originals = {}
        for (col, *path), spec in flat.items():
            arr = rng.standard_normal(spec.shape).astype(np.float32)
            key = inverse_torch_key(col, path)
            assert key not in state_dict, f"duplicate torch key {key}"
            state_dict[key] = to_torch_layout(path[-1], arr)
            originals[(col,) + tuple(path)] = arr
        # add reference-only buffers that must be skipped
        state_dict["key_encoder.mean"] = np.zeros((1, 3, 1, 1), np.float32)
        state_dict["key_encoder.std"] = np.ones((1, 3, 1, 1), np.float32)
        state_dict["value_encoder.mean"] = np.zeros((1, 3, 1, 1), np.float32)
        state_dict["value_encoder.std"] = np.ones((1, 3, 1, 1), np.float32)

        converted = convert_swem_state_dict(state_dict)
        conv_flat = {}
        for col in ("params", "batch_stats"):
            conv_flat.update({(col,) + p: v for p, v in flatten(converted[col]).items()})

        assert set(conv_flat) == set(originals)
        for k, v in originals.items():
            np.testing.assert_array_equal(conv_flat[k], v, err_msg=str(k))

    def test_value_encoder_conv1_has_5_input_channels(self, abstract_vars):
        k = abstract_vars["params"]["value_encoder"]["trunk"]["conv1"]["kernel"]
        assert k.shape == (7, 7, 5, 64)


class TestResNetConverter:
    def test_resnet18_with_extra_channels(self, rng):
        # minimal torchvision-style state_dict: conv1 + bn1 + one basic block
        sd = {
            "conv1.weight": rng.standard_normal((64, 3, 7, 7)).astype(np.float32),
            "bn1.weight": np.ones(64, np.float32),
            "bn1.bias": np.zeros(64, np.float32),
            "bn1.running_mean": np.zeros(64, np.float32),
            "bn1.running_var": np.ones(64, np.float32),
            "bn1.num_batches_tracked": np.asarray(0),
            "layer1.0.conv1.weight": rng.standard_normal((64, 64, 3, 3)).astype(np.float32),
            "layer4.0.conv1.weight": rng.standard_normal((512, 256, 3, 3)).astype(np.float32),
            "fc.weight": rng.standard_normal((1000, 512)).astype(np.float32),
            "fc.bias": np.zeros(1000, np.float32),
        }
        out = convert_resnet_state_dict(sd, extra_chan=2, through_layer=3)
        k = out["params"]["conv1"]["kernel"]
        assert k.shape == (7, 7, 5, 64)
        np.testing.assert_array_equal(
            k[..., :3, :], np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
        )
        assert "layer4_0" not in out["params"]
        assert "fc" not in out["params"]
        assert out["batch_stats"]["bn1"]["var"].shape == (64,)


class TestSurgery:
    def test_widen_value_encoder(self, rng):
        params = {
            "value_encoder": {"trunk": {"conv1": {
                "kernel": jnp.asarray(rng.standard_normal((7, 7, 4, 64)).astype(np.float32))
            }}}
        }
        out = widen_value_encoder(params)
        k = out["value_encoder"]["trunk"]["conv1"]["kernel"]
        assert k.shape == (7, 7, 5, 64)
        np.testing.assert_array_equal(
            np.asarray(k[..., :4, :]),
            np.asarray(params["value_encoder"]["trunk"]["conv1"]["kernel"]),
        )


class TestSingleObjectCheckpointLoad:
    def test_registry_loads_so_orbax_into_mo_model(self, tmp_path):
        """A stage-0 single-object orbax checkpoint restores into the
        multi-object model via the 4-channel retry + conv1 widening."""
        import jax
        import jax.numpy as jnp

        from swem_tpu.config import EvalConfig, SWEMConfig
        from swem_tpu.io.checkpoint import save_params
        from swem_tpu.registry import load_variables

        so_cfg = ModelConfig(backbone="resnet18", keydim=8, valdim=16,
                             num_bases=4, num_em_iters=2, topl=2, max_objs=1,
                             mdim=16, single_object=True)
        so_model = SWEM(so_cfg)
        so_vars = so_model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 2)))
        assert so_vars["params"]["value_encoder"]["trunk"]["conv1"]["kernel"].shape[2] == 4
        ckpt = str(tmp_path / "so_ckpt")
        save_params(ckpt, so_vars)

        mo_cfg = SWEMConfig(
            model=ModelConfig(backbone="resnet18", keydim=8, valdim=16,
                              num_bases=4, num_em_iters=2, topl=2, max_objs=2,
                              mdim=16),
            eval=EvalConfig(max_objs=2),
        )
        variables = load_variables(mo_cfg, ckpt, max_objs=2)
        k = variables["params"]["value_encoder"]["trunk"]["conv1"]["kernel"]
        assert k.shape[2] == 5  # widened
        np.testing.assert_array_equal(
            np.asarray(k[..., :4, :]),
            np.asarray(so_vars["params"]["value_encoder"]["trunk"]["conv1"]["kernel"]),
        )
