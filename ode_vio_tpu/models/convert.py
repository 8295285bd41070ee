"""PyTorch -> JAX checkpoint conversion.

Two jobs (SURVEY.md section 5.4):
  * FlowNet-S weight surgery: load the torch FlowNet-S checkpoint the
    reference warm-starts from (/root/reference/scripts/train_model.py:180-188,
    key-intersection into the image encoder) into our ImageEncoder params.
  * Full reference-checkpoint conversion for parity testing: every module's
    torch ``state_dict`` tensors map onto our param trees.

Layout rules:
  * Conv2d  OIHW -> HWIO;  Conv1d (O, I, K) -> (K, I, O).
  * Linear (out, in) -> flax Dense kernel (in, out) [transpose]. The two
    flatten-boundary Linears (visual_head, inertial proj) additionally need
    an input-column permutation because torch flattens CHW/CL while we
    flatten HWC/LC (models/encoders.py).
  * Our pure-function MLP / RNN-cell params use the torch (out, in) layout
    natively (ops/mlp.py, ops/rnn_cells.py) and copy through unchanged.

All inputs are plain numpy arrays (callers do
``{k: v.numpy() for k, v in torch_sd.items()}``), keeping this module
torch-free.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

# reference conv-trunk names (Encoder.py:82-90) in our block order
_TRUNK_NAMES = (
    "conv1", "conv2", "conv3", "conv3_1", "conv4",
    "conv4_1", "conv5", "conv5_1", "conv6",
)

# (kernel, stride) of the trunk in block order (models/encoders.py TRUNK)
_TRUNK_KS = ((7, 2), (5, 2), (5, 2), (3, 1), (3, 2),
             (3, 1), (3, 2), (3, 1), (3, 2))


def trunk_out_hw(img_h: int, img_w: int) -> tuple[int, int]:
    """Exact conv-trunk output spatial shape for an input image size
    (symmetric torch-style padding: out = floor((in - 1) / s) + 1).
    (256, 512) -> (4, 8); small test images bottom out at 1."""
    h, w = img_h, img_w
    for k, s in _TRUNK_KS:
        h = (h - 1) // s + 1
        w = (w - 1) // s + 1
    return h, w


def _conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _conv1d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))  # OIK -> KIO


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)  # (out, in) -> (in, out)


def _chw_to_hwc_permutation(c: int, h: int, w: int) -> np.ndarray:
    """Column permutation taking a CHW-flattened input index to the HWC
    position: perm[hwc_index] = chw_index."""
    chw = np.arange(c * h * w).reshape(c, h, w)
    return np.transpose(chw, (1, 2, 0)).reshape(-1)


def convert_image_encoder(
    sd: Mapping[str, np.ndarray],
    conv_out_hw: tuple[int, int] | None = None,
    prefix: str = "",
) -> tuple[dict, dict]:
    """Map reference ImageEncoder / FlowNet-S-bn tensors onto
    (params, batch_stats) for models.encoders.ImageEncoder.

    Missing keys are skipped (the reference itself loads by key
    intersection, train_model.py:182-185), so a raw FlowNet-S checkpoint —
    which has no ``visual_head`` — converts cleanly.
    ``conv_out_hw`` is the conv-trunk output spatial shape (needed only for
    the visual_head column permutation; (4, 8) for 256x512 inputs).
    """
    params: dict = {}
    stats: dict = {}
    for i, name in enumerate(_TRUNK_NAMES):
        key = f"{prefix}{name}.0.weight"
        if key not in sd:
            continue
        block, bstat = {}, {}
        block["conv"] = {"kernel": _conv2d(np.asarray(sd[key]))}
        bn = f"{prefix}{name}.1"
        block["bn"] = {
            "scale": np.asarray(sd[f"{bn}.weight"]),
            "bias": np.asarray(sd[f"{bn}.bias"]),
        }
        bstat["bn"] = {
            "mean": np.asarray(sd[f"{bn}.running_mean"]),
            "var": np.asarray(sd[f"{bn}.running_var"]),
        }
        params[f"block{i}"] = block
        stats[f"block{i}"] = bstat

    head_w = f"{prefix}visual_head.weight"
    if head_w in sd:
        w = _linear(np.asarray(sd[head_w]))  # (in=CHW, out)
        if conv_out_hw is not None:
            h, wd = conv_out_hw
            c = w.shape[0] // (h * wd)
            w = w[_chw_to_hwc_permutation(c, h, wd)]
        params["visual_head"] = {
            "kernel": w,
            "bias": np.asarray(sd[f"{prefix}visual_head.bias"]),
        }
    return params, stats


def convert_inertial_encoder(
    sd: Mapping[str, np.ndarray], prefix: str = ""
) -> tuple[dict, dict]:
    """Reference InertialEncoder (Encoder.py:39-58): encoder_conv indices
    0/4/8 are Conv1d, 1/5/9 are BatchNorm1d, plus the proj Linear."""
    params: dict = {}
    stats: dict = {}
    for j, idx in enumerate((0, 4, 8)):
        conv = f"{prefix}encoder_conv.{idx}"
        params[f"conv{j}"] = {
            "kernel": _conv1d(np.asarray(sd[f"{conv}.weight"])),
            "bias": np.asarray(sd[f"{conv}.bias"]),
        }
        bn = f"{prefix}encoder_conv.{idx + 1}"
        params[f"bn{j}"] = {
            "scale": np.asarray(sd[f"{bn}.weight"]),
            "bias": np.asarray(sd[f"{bn}.bias"]),
        }
        stats[f"bn{j}"] = {
            "mean": np.asarray(sd[f"{bn}.running_mean"]),
            "var": np.asarray(sd[f"{bn}.running_var"]),
        }
    w = _linear(np.asarray(sd[f"{prefix}proj.weight"]))  # (in=C*L, out)
    c, l = 256, 11  # torch flattens (C, L); we flatten (L, C)
    w = w[_chw_to_hwc_permutation(c, 1, l)]
    params["proj"] = {"kernel": w, "bias": np.asarray(sd[f"{prefix}proj.bias"])}
    return params, stats


def convert_mlp(sd: Mapping[str, np.ndarray], prefix: str) -> list:
    """torch nn.Sequential of Linear(+activation) -> our ops.mlp param list
    (kept in torch (out, in) layout)."""
    # Linear layers sit at the even Sequential indices, interleaved with
    # activations; collect every `<prefix>.<i>.weight` in index order.
    base = f"{prefix}." if prefix else ""
    indices = sorted(
        int(k[len(base) :].split(".")[0])
        for k in sd
        if k.startswith(base) and k.endswith(".weight")
        and k[len(base) :].split(".")[0].isdigit()
    )
    return [
        {
            "w": np.asarray(sd[f"{base}{i}.weight"]),
            "b": np.asarray(sd[f"{base}{i}.bias"]),
        }
        for i in indices
    ]


def convert_rnn_stack(
    sd: Mapping[str, np.ndarray], prefix: str, num_layers: int
) -> list:
    """torch nn.RNN/nn.GRU flat params -> ops.rnn_cells stack (layout
    identical)."""
    return [
        {
            "w_ih": np.asarray(sd[f"{prefix}weight_ih_l{k}"]),
            "w_hh": np.asarray(sd[f"{prefix}weight_hh_l{k}"]),
            "b_ih": np.asarray(sd[f"{prefix}bias_ih_l{k}"]),
            "b_hh": np.asarray(sd[f"{prefix}bias_hh_l{k}"]),
        }
        for k in range(num_layers)
    ]


def convert_dense(sd: Mapping[str, np.ndarray], key: str) -> dict:
    return {
        "kernel": _linear(np.asarray(sd[f"{key}.weight"])),
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def convert_regressor(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """nn.Sequential(Linear, LeakyReLU, Linear) -> PoseRegressor."""
    base = f"{prefix}." if prefix else ""
    return {
        "fc0": convert_dense(sd, f"{base}0"),
        "fc1": convert_dense(sd, f"{base}2"),
    }


def convert_cfc_cell(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """ncps-style CfC cell tensors -> ops.liquid CfC params. Layout: ncps's
    CfCCell ('default' mode) holds ``backbone.0`` (Linear over [x, h]),
    ``ff1``/``ff2`` candidate heads and ``time_a``/``time_b`` gate heads —
    exactly the structure of :func:`ode_vio_tpu.ops.liquid.init_cfc`, kept
    in the torch (out, in) layout, so tensors copy through unchanged
    (reference cell: PoseNCP.py:21-27 via ncps.torch.CfC)."""
    def lin(name):
        return {
            "w": np.asarray(sd[f"{prefix}{name}.weight"]),
            "b": np.asarray(sd[f"{prefix}{name}.bias"]),
        }

    return {
        "backbone": lin("backbone.0"),
        "ff1": lin("ff1"),
        "ff2": lin("ff2"),
        "time_a": lin("time_a"),
        "time_b": lin("time_b"),
    }


def convert_ltc_cell(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """LTC cell tensors -> ops.liquid LTC params. Our LTC is a TPU-first
    re-design (fused semi-implicit Euler over W_x/W_h conductances,
    ops/liquid.py:68-99) — not ncps's per-synapse biophysical
    parameterisation, which has no one-to-one tensor mapping. The accepted
    layout is the torch replica of OUR cell: ``w_x``/``w_h`` Linears plus
    ``log_tau``/``A`` vectors (tests/test_convert_cores.py pins parity)."""
    return {
        "w_x": {"w": np.asarray(sd[f"{prefix}w_x.weight"]),
                "b": np.asarray(sd[f"{prefix}w_x.bias"])},
        "w_h": {"w": np.asarray(sd[f"{prefix}w_h.weight"]),
                "b": np.asarray(sd[f"{prefix}w_h.bias"])},
        "log_tau": np.asarray(sd[f"{prefix}log_tau"]),
        "A": np.asarray(sd[f"{prefix}A"]),
    }


def convert_pose_net(
    sd: Mapping[str, np.ndarray],
    model_type: str,
    rnn_num_layers: int = 2,
    prefix: str = "Pose_net.",
) -> dict:
    """Reference pose-core state_dict -> our pose_net param subtree.
    Covers all six families (reference modules PoseODERNN.py:39-68,
    PoseRNN.py:6-52, PoseCDE.py:43-74, PoseRDE.py:43-72, PoseNCP.py:7-37)."""
    pose: dict = {}
    if model_type in ("ode-rnn", "rnn"):
        if model_type == "ode-rnn":
            pose["ode_func"] = convert_mlp(sd, f"{prefix}ode_func.net")
        pose["rnn"] = convert_rnn_stack(sd, f"{prefix}rnn.", rnn_num_layers)
    elif model_type in ("cde", "rde"):
        pose["cde_func"] = convert_mlp(sd, f"{prefix}cde_func.net")
        # initial state net: Sequential(Linear, Tanh) (PoseCDE.py:58-61)
        pose["initial"] = convert_dense(sd, f"{prefix}initial.0")
        if model_type == "cde":
            # reduction_net: Linear -> LeakyReLU -> Linear (PoseCDE.py:53-57)
            pose["reduction0"] = convert_dense(sd, f"{prefix}reduction_net.0")
            pose["reduction1"] = convert_dense(sd, f"{prefix}reduction_net.2")
        else:
            # single Linear (PoseRDE.py:57)
            pose["reduction"] = convert_dense(sd, f"{prefix}reduction_net")
    elif model_type == "cfc":
        pose["cfc"] = convert_cfc_cell(sd, f"{prefix}rnn.rnn_cell.")
    elif model_type == "ltc":
        pose["ltc"] = convert_ltc_cell(sd, f"{prefix}rnn.")
    else:
        raise ValueError(f"unknown pose core '{model_type}'")
    pose["regressor"] = convert_regressor(sd, f"{prefix}regressor")
    if f"{prefix}fuse.net.0.weight" in sd:
        pose["fuse"] = {"gate": convert_dense(sd, f"{prefix}fuse.net.0")}
    return pose


def convert_deepvio(
    sd: Mapping[str, np.ndarray],
    model_type: str,
    rnn_num_layers: int = 2,
    conv_out_hw: tuple[int, int] = (4, 8),
) -> dict:
    """Full reference DeepVIO state_dict -> our {'params','batch_stats'}
    variables, for every pose-core family."""
    img_p, img_s = convert_image_encoder(sd, conv_out_hw, prefix="Image_net.")
    imu_p, imu_s = convert_inertial_encoder(sd, prefix="Inertial_net.")
    params = {
        "image_encoder": img_p,
        "inertial_encoder": imu_p,
        "pose_net": convert_pose_net(sd, model_type, rnn_num_layers),
    }
    stats = {"image_encoder": img_s, "inertial_encoder": imu_s}
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Reverse direction: JAX variables -> reference-layout torch state_dict
# ---------------------------------------------------------------------------

def _inv_rows(perm: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Invert a row permutation applied by the forward converter."""
    out = np.empty_like(w)
    out[perm] = w
    return out


def _np(x) -> np.ndarray:
    return np.asarray(x)


def export_image_encoder(params, stats, conv_out_hw, prefix="Image_net."):
    sd: Dict[str, np.ndarray] = {}
    for i, name in enumerate(_TRUNK_NAMES):
        block = params.get(f"block{i}")
        if block is None:
            continue
        sd[f"{prefix}{name}.0.weight"] = np.transpose(
            _np(block["conv"]["kernel"]), (3, 2, 0, 1)  # HWIO -> OIHW
        )
        bn = block["bn"]
        bs = stats[f"block{i}"]["bn"]
        sd[f"{prefix}{name}.1.weight"] = _np(bn["scale"])
        sd[f"{prefix}{name}.1.bias"] = _np(bn["bias"])
        sd[f"{prefix}{name}.1.running_mean"] = _np(bs["mean"])
        sd[f"{prefix}{name}.1.running_var"] = _np(bs["var"])
    head = params.get("visual_head")
    if head is not None:
        w = _np(head["kernel"])  # (in=HWC, out)
        h, wd = conv_out_hw
        c = w.shape[0] // (h * wd)
        w = _inv_rows(_chw_to_hwc_permutation(c, h, wd), w)
        sd[f"{prefix}visual_head.weight"] = np.transpose(w)
        sd[f"{prefix}visual_head.bias"] = _np(head["bias"])
    return sd


def export_inertial_encoder(params, stats, prefix="Inertial_net."):
    sd: Dict[str, np.ndarray] = {}
    for j, idx in enumerate((0, 4, 8)):
        conv = params[f"conv{j}"]
        sd[f"{prefix}encoder_conv.{idx}.weight"] = np.transpose(
            _np(conv["kernel"]), (2, 1, 0)  # KIO -> OIK
        )
        sd[f"{prefix}encoder_conv.{idx}.bias"] = _np(conv["bias"])
        bn_p = params[f"bn{j}"]
        bn_s = stats[f"bn{j}"]
        sd[f"{prefix}encoder_conv.{idx + 1}.weight"] = _np(bn_p["scale"])
        sd[f"{prefix}encoder_conv.{idx + 1}.bias"] = _np(bn_p["bias"])
        sd[f"{prefix}encoder_conv.{idx + 1}.running_mean"] = _np(bn_s["mean"])
        sd[f"{prefix}encoder_conv.{idx + 1}.running_var"] = _np(bn_s["var"])
    w = _np(params["proj"]["kernel"])
    w = _inv_rows(_chw_to_hwc_permutation(256, 1, 11), w)
    sd[f"{prefix}proj.weight"] = np.transpose(w)
    sd[f"{prefix}proj.bias"] = _np(params["proj"]["bias"])
    return sd


def _export_mlp(sd, layers, prefix):
    for i, layer in enumerate(layers):
        sd[f"{prefix}.{2 * i}.weight"] = _np(layer["w"])
        sd[f"{prefix}.{2 * i}.bias"] = _np(layer["b"])


def _export_dense(sd, dense, key):
    sd[f"{key}.weight"] = np.transpose(_np(dense["kernel"]))
    sd[f"{key}.bias"] = _np(dense["bias"])


def _export_lin(sd, lin, key):
    sd[f"{key}.weight"] = _np(lin["w"])
    sd[f"{key}.bias"] = _np(lin["b"])


def export_pose_net(pose, model_type, prefix="Pose_net."):
    sd: Dict[str, np.ndarray] = {}
    if model_type in ("ode-rnn", "rnn"):
        if model_type == "ode-rnn":
            _export_mlp(sd, pose["ode_func"], f"{prefix}ode_func.net")
        for k, layer in enumerate(pose["rnn"]):
            sd[f"{prefix}rnn.weight_ih_l{k}"] = _np(layer["w_ih"])
            sd[f"{prefix}rnn.weight_hh_l{k}"] = _np(layer["w_hh"])
            sd[f"{prefix}rnn.bias_ih_l{k}"] = _np(layer["b_ih"])
            sd[f"{prefix}rnn.bias_hh_l{k}"] = _np(layer["b_hh"])
    elif model_type in ("cde", "rde"):
        _export_mlp(sd, pose["cde_func"], f"{prefix}cde_func.net")
        _export_dense(sd, pose["initial"], f"{prefix}initial.0")
        if model_type == "cde":
            _export_dense(sd, pose["reduction0"], f"{prefix}reduction_net.0")
            _export_dense(sd, pose["reduction1"], f"{prefix}reduction_net.2")
        else:
            _export_dense(sd, pose["reduction"], f"{prefix}reduction_net")
    elif model_type == "cfc":
        cell = pose["cfc"]
        _export_lin(sd, cell["backbone"], f"{prefix}rnn.rnn_cell.backbone.0")
        for name in ("ff1", "ff2", "time_a", "time_b"):
            _export_lin(sd, cell[name], f"{prefix}rnn.rnn_cell.{name}")
    elif model_type == "ltc":
        cell = pose["ltc"]
        _export_lin(sd, cell["w_x"], f"{prefix}rnn.w_x")
        _export_lin(sd, cell["w_h"], f"{prefix}rnn.w_h")
        sd[f"{prefix}rnn.log_tau"] = _np(cell["log_tau"])
        sd[f"{prefix}rnn.A"] = _np(cell["A"])
    else:
        raise ValueError(f"unknown pose core '{model_type}'")
    _export_dense(sd, pose["regressor"]["fc0"], f"{prefix}regressor.0")
    _export_dense(sd, pose["regressor"]["fc1"], f"{prefix}regressor.2")
    if "fuse" in pose:
        _export_dense(sd, pose["fuse"]["gate"], f"{prefix}fuse.net.0")
    return sd


def export_deepvio(
    variables,
    model_type: str,
    conv_out_hw: tuple[int, int] = (4, 8),
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_deepvio`: our variables pytree back into a
    reference-layout state_dict (numpy), so a model trained here can be
    loaded by the reference's torch tooling
    (``model.load_state_dict({k: torch.from_numpy(v) ...}, strict=False)``
    — non-strict only because BatchNorm ``num_batches_tracked`` counters
    are not emitted). Exact roundtrip: ``convert_deepvio(export_deepvio(v))
    == v`` (tests/test_convert_cores.py::TestRoundtrip)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd = export_image_encoder(
        params["image_encoder"], stats.get("image_encoder", {}), conv_out_hw
    )
    sd.update(
        export_inertial_encoder(
            params["inertial_encoder"], stats.get("inertial_encoder", {})
        )
    )
    sd.update(export_pose_net(params["pose_net"], model_type))
    return sd


def load_torch_checkpoint(path) -> Dict[str, np.ndarray]:
    """Read a .pth/.tar torch checkpoint into numpy (torch CPU build)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().numpy() for k, v in sd.items()}


def variables_from_pretrain(path, model_cfg) -> Dict | None:
    """Accept the reference's ``--pretrain model.pth`` directly.

    If ``path`` is a reference-layout checkpoint *file* (torch ``.pth`` /
    ``.tar`` / ``.pt`` pickle per /root/reference/README.md:67-77, or the
    torch-free ``.npz`` written by ``cli.export``), convert it to our
    ``{'params','batch_stats'}`` variables. Returns ``None`` when ``path``
    is not a file (an Orbax checkpoint directory — the caller restores it
    itself). This is what lets every CLI load upstream pretrained weights
    with the same flag the reference uses (scripts/test_model.py:106-108).
    """
    from pathlib import Path

    p = Path(path)
    if not p.is_file():
        return None
    if p.suffix == ".npz":
        with np.load(p) as z:
            sd = {k: z[k] for k in z.files}
    else:
        sd = load_torch_checkpoint(p)
    return convert_deepvio(
        sd,
        model_cfg.model_type,
        rnn_num_layers=model_cfg.rnn_num_layers,
        conv_out_hw=trunk_out_hw(model_cfg.img_h, model_cfg.img_w),
    )


def maybe_load_reference(path, model_cfg, init_vars) -> Dict | None:
    """The shared CLI entry for ``--pretrain``: if ``path`` is a
    reference-layout checkpoint *file*, convert it, structure-check it
    against the flag-built model and return device-ready variables;
    return ``None`` when ``path`` is an Orbax checkpoint directory (the
    caller restores that itself)."""
    converted = variables_from_pretrain(path, model_cfg)
    if converted is None:
        return None
    check_structure(converted, init_vars)
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, converted)


def check_structure(converted: Mapping, init_vars: Mapping) -> None:
    """Raise with a readable message when a converted checkpoint's param
    tree does not match the model the flags built (wrong ``--model_type``,
    dims, or layer counts) instead of a downstream shape crash."""
    import jax

    conv_paths = {
        p: np.shape(v) for p, v in
        jax.tree_util.tree_leaves_with_path(converted["params"])
    }
    init_paths = {
        p: np.shape(v) for p, v in
        jax.tree_util.tree_leaves_with_path(init_vars["params"])
    }
    if conv_paths == init_paths:
        return
    missing = sorted(str(p) for p in (set(init_paths) - set(conv_paths)))[:5]
    extra = sorted(str(p) for p in (set(conv_paths) - set(init_paths)))[:5]
    shape = sorted(
        f"{p}: ckpt{conv_paths[p]} != model{init_paths[p]}"
        for p in set(conv_paths) & set(init_paths)
        if conv_paths[p] != init_paths[p]
    )[:5]
    raise SystemExit(
        "converted checkpoint does not match the model flags: "
        f"missing {missing} extra {extra} shape-mismatch {shape}"
    )
