"""Torch checkpoint conversion: reference SWEM / torchvision ResNet -> flax.

The reference ships weights as torch state_dicts (basic_trainer.py:110-139)
and initializes backbones from torchvision zoo files
(mod_resnet.py:139-166, networks.py:139-144 — broken as shipped; here the
weight path is an explicit argument). This module converts:

* a full SWEM checkpoint (``convert_swem_state_dict``) into
  {params, batch_stats} for swem_tpu.models.swem.SWEM,
* a torchvision resnet50/18 ImageNet checkpoint
  (``convert_resnet_state_dict``) into a ResNetTrunk subtree, with extra
  value-encoder input channels orthogonal-initialized
  (mod_resnet.py:14-32).

Layout conventions: torch conv (O, I, kH, kW) -> flax (kH, kW, I, O);
torch linear (O, I) -> flax (I, O); BN weight/bias -> scale/bias in params,
running_mean/var -> mean/var in batch_stats.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _set(tree: dict, path, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def _translate_module_path(parts) -> Tuple[str, ...]:
    """Map a torch module path to the flax module path."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("res2", "layer1", "layer2", "layer3", "layer4") and i + 1 < len(parts) \
                and parts[i + 1].isdigit():
            stage = {"res2": "layer1"}.get(p, p)
            out.append(f"{stage}_{parts[i + 1]}")
            i += 2
            continue
        if p == "downsample" and i + 1 < len(parts) and parts[i + 1] in ("0", "1"):
            out.append("downsample_conv" if parts[i + 1] == "0" else "downsample_bn")
            i += 2
            continue
        if p == "ChannelGate":
            out.append("channel_gate")
            i += 1
            continue
        if p == "SpatialGate":
            out.append("spatial_gate")
            i += 1
            continue
        if p == "mlp" and i + 1 < len(parts):
            out.append({"1": "fc1", "3": "fc2"}[parts[i + 1]])
            i += 2
            continue
        if p == "spatial" and i + 1 < len(parts) and parts[i + 1] == "conv":
            out.append("conv")
            i += 2
            continue
        out.append(p)
        i += 1
    return tuple(out)


_TOP_RENAMES = [
    (re.compile(r"^key_encoder\.(conv1|bn1|res2|layer2|layer3)\."),
     r"key_encoder.trunk.\1."),
    (re.compile(r"^value_encoder\.(conv1|bn1|layer1|layer2|layer3)\."),
     r"value_encoder.trunk.\1."),
    (re.compile(r"^swem_core\.fusion_layer\."), "fusion."),
]


def convert_swem_state_dict(state_dict: Dict[str, np.ndarray]) -> dict:
    """Reference SWEM torch state_dict -> {'params': ..., 'batch_stats': ...}."""
    params: dict = {}
    batch_stats: dict = {}
    for key, value in state_dict.items():
        v = np.asarray(value, dtype=np.float32)
        if key.split(".")[-1] in ("mean", "std"):
            continue  # ImageNet normalization buffers (networks.py:72-73)
        if key.endswith("num_batches_tracked"):
            continue
        for pat, repl in _TOP_RENAMES:
            key = pat.sub(repl, key)
        parts = key.split(".")
        leaf = parts[-1]
        path = _translate_module_path(parts[:-1])
        if leaf == "weight":
            if v.ndim == 4:
                _set(params, path + ("kernel",), _conv_w(v))
            elif v.ndim == 2:
                _set(params, path + ("kernel",), _linear_w(v))
            else:  # BatchNorm scale
                _set(params, path + ("scale",), v)
        elif leaf == "bias":
            _set(params, path + ("bias",), v)
        elif leaf == "running_mean":
            _set(batch_stats, path + ("mean",), v)
        elif leaf == "running_var":
            _set(batch_stats, path + ("var",), v)
        else:
            raise KeyError(f"unhandled torch key {key}")
    return {"params": params, "batch_stats": batch_stats}


def orthogonal_conv_hwio(rng: np.random.Generator, shape) -> np.ndarray:
    """Orthogonal conv kernel in HWIO with torch.nn.init.orthogonal_ semantics:
    the (O, I*kH*kW) matrix has orthonormal rows/columns."""
    h, w, cin, cout = shape
    rows, cols = cout, h * w * cin
    a = rng.standard_normal((max(rows, cols), min(rows, cols)))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    if rows < cols:
        q = q.T
    q = q[:rows, :cols].reshape(cout, cin, h, w)
    return np.ascontiguousarray(np.transpose(q, (2, 3, 1, 0))).astype(np.float32)



def convert_resnet_state_dict(
    state_dict: Dict[str, np.ndarray],
    extra_chan: int = 0,
    through_layer: int = 3,
    seed: int = 0,
    add_zero_conv_biases: bool = False,
) -> dict:
    """torchvision resnetXX state_dict -> ResNetTrunk {'params','batch_stats'}.

    ``extra_chan`` widens conv1's input (mask channels) with orthogonal init
    (mod_resnet.py:14-32); stages beyond ``through_layer`` are dropped (the
    trunks stop at layer3, networks.py:153-155).

    ``add_zero_conv_biases``: mod_resnet-style trunks (the value encoder)
    carry a trainable bias on every conv that the torchvision zoo checkpoint
    does not have; mod_resnet zero-inits them and ``strict=False``-loads the
    zoo weights over the rest (mod_resnet.py:118-132). Setting this
    synthesizes the zero biases so the converted tree matches
    ResNetTrunk(conv_bias=True) exactly.
    """
    params: dict = {}
    batch_stats: dict = {}
    rng = np.random.default_rng(seed)
    for key, value in state_dict.items():
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue
        stage = re.match(r"^layer(\d+)\.", key)
        if stage and int(stage.group(1)) > through_layer:
            continue
        v = np.asarray(value, dtype=np.float32)
        parts = key.split(".")
        leaf = parts[-1]
        path = _translate_module_path(parts[:-1])
        if leaf == "weight" and v.ndim == 4 and add_zero_conv_biases \
                and key[:-len("weight")] + "bias" not in state_dict:
            _set(params, path + ("bias",), np.zeros(v.shape[0], np.float32))
        if key == "conv1.weight" and extra_chan > 0:
            w = _conv_w(v)  # (7,7,3,64)
            pad = orthogonal_conv_hwio(rng, w.shape[:2] + (extra_chan, w.shape[-1]))
            _set(params, path + ("kernel",), np.concatenate([w, pad], axis=2))
            continue
        if leaf == "weight":
            if v.ndim == 4:
                _set(params, path + ("kernel",), _conv_w(v))
            else:
                _set(params, path + ("scale",), v)
        elif leaf == "bias":
            _set(params, path + ("bias",), v)
        elif leaf == "running_mean":
            _set(batch_stats, path + ("mean",), v)
        elif leaf == "running_var":
            _set(batch_stats, path + ("var",), v)
    return {"params": params, "batch_stats": batch_stats}


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state_dict to numpy (requires torch, CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def import_swem_checkpoint(path: str) -> dict:
    """.pth file -> flax variables for SWEM."""
    return convert_swem_state_dict(load_torch_file(path))
