"""Torch-free reader for PyTorch/Lightning checkpoints + layout mapping.

The released Beat This! checkpoints are PyTorch-Lightning ``.ckpt`` files
(zip archives in the torch-1.6+ serialization format) containing
``state_dict``, ``hyper_parameters`` and ``datamodule_hyper_parameters``
(reference: README.md:108-109, launch_scripts/clean_checkpoints.py:17-32).
This module parses that format with nothing but ``zipfile`` + ``pickle``:
tensor payloads are materialized as numpy arrays straight from the archive's
storage entries, so the framework has no runtime torch dependency.

It also performs the torch->JAX parameter conversion documented in
beat_this_tpu/model/layers.py: linear weights are transposed to
(in, out), conv kernels go OIHW (out, in, freq, time) -> (time, freq, in, out)
for the NHWC/HWIO TPU layout, and batch-norm running statistics are split
into the separate `state` pytree. Key rewriting mirrors the reference
(`model.` prefix strip, `_orig_mod.` removal — beat_this/utils.py:105-111,
beat_this/model/beat_tracker.py:194-203).
"""

from __future__ import annotations

import pathlib
import pickle
import zipfile
from typing import Any

import numpy as np

try:  # bfloat16 numpy support ships with jax
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
    "BFloat16Storage": _BFLOAT16,
}


class _StorageRef:
    """Lazy handle to a storage payload inside the checkpoint zip."""

    __slots__ = ("dtype", "key", "numel")

    def __init__(self, dtype, key, numel):
        self.dtype, self.key, self.numel = dtype, key, numel


class _TorchStub:
    """Stands in for any torch.* global referenced by the pickle."""

    def __init__(self, name):
        self.name = name

    def __call__(self, *args, **kwargs):  # e.g. torch.device("cpu")
        return self

    def __repr__(self):
        return f"<torch-stub {self.name}>"


def _rebuild_tensor_v2(storage, offset, size, stride, *_args):
    return {"storage": storage, "offset": offset, "size": tuple(size),
            "stride": tuple(stride)}


def _rebuild_parameter(data, requires_grad=True, hooks=None):
    return data


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, load_storage):
        super().__init__(file)
        self._load_storage = load_storage

    def find_class(self, module, name):
        if name in _STORAGE_DTYPES:
            return ("storage_dtype", _STORAGE_DTYPES[name])
        if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
            return _rebuild_tensor_v2
        if (module, name) == ("torch._utils", "_rebuild_parameter"):
            return _rebuild_parameter
        if (module, name) == ("collections", "OrderedDict"):
            import collections

            return collections.OrderedDict
        if (module, name) == ("torch", "Size"):
            return tuple
        if module == "pathlib" and name.endswith("Path"):
            return pathlib.PurePosixPath
        if module.startswith("torch") or module.startswith("pytorch_lightning"):
            return _TorchStub(f"{module}.{name}")
        if module in ("numpy", "numpy.core.multiarray", "numpy._core.multiarray",
                      "builtins", "__builtin__"):
            return super().find_class(module, name)
        # default-deny anything else: return an inert stub instead of importing
        return _TorchStub(f"{module}.{name}")

    def persistent_load(self, pid):
        if isinstance(pid, tuple) and pid and pid[0] == "storage":
            _, storage_type, key, _location, numel = pid
            if isinstance(storage_type, tuple) and storage_type[0] == "storage_dtype":
                dtype = storage_type[1]
            else:  # torch.storage.TypedStorage style (dtype passed in pid)
                raise ValueError(f"unsupported storage type {storage_type!r}")
            return self._load_storage(_StorageRef(dtype, str(key), int(numel)))
        raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")


def _materialize(tensor_dict: dict, raw: bytes, dtype: np.dtype) -> np.ndarray:
    size, stride, offset = (
        tensor_dict["size"], tensor_dict["stride"], tensor_dict["offset"]
    )
    flat = np.frombuffer(raw, dtype=dtype)
    if not size:
        return flat[offset : offset + 1].reshape(())
    arr = np.lib.stride_tricks.as_strided(
        flat[offset:],
        shape=size,
        strides=tuple(s * dtype.itemsize for s in stride),
    )
    return np.array(arr)  # own the memory


def load_torch_checkpoint(path) -> dict:
    """Load a torch-format checkpoint into plain Python + numpy objects.

    Equivalent surface to `torch.load(path, map_location="cpu",
    weights_only=True)` as used by the reference loader
    (beat_this/inference.py:27-30), implemented without torch.
    """
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
        root = pkl_name[: -len("data.pkl")]
        raw_cache: dict[str, bytes] = {}

        def load_storage(ref: _StorageRef):
            if ref.key not in raw_cache:
                raw_cache[ref.key] = zf.read(f"{root}data/{ref.key}")
            return (ref, raw_cache[ref.key])

        with zf.open(pkl_name) as f:
            obj = _Unpickler(f, load_storage).load()

    def resolve(x):
        if isinstance(x, dict):
            if "storage" in x and "stride" in x and "size" in x:
                ref, raw = x["storage"]
                return _materialize(x, raw, ref.dtype)
            return {k: resolve(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            t = type(x)
            if t is tuple and isinstance(x, tuple) and len(x) == 2 and x and isinstance(
                x[0], _StorageRef
            ):
                return x
            return t(resolve(v) for v in x)
        return x

    return resolve(obj)


# ---------------------------------------------------------------------------
# torch state-dict <-> JAX pytree mapping
# ---------------------------------------------------------------------------


def _strip_keys(state_dict: dict) -> dict:
    """Remove `model.` and `_orig_mod.` prefixes (reference
    beat_this/utils.py:105-111, beat_this/model/beat_tracker.py:194-203) and
    drop non-model entries (losses' pos_weight buffers, rotary freqs)."""
    out = {}
    for key, value in state_dict.items():
        key = key.replace("_orig_mod.", "")
        if key.startswith("model."):
            key = key[len("model.") :]
        if "rotary_embed" in key or key.endswith("num_batches_tracked"):
            continue
        if key.startswith(("beat_loss.", "downbeat_loss.")):
            continue
        out[key] = value
    return out


def _f32(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _linear(sd, prefix, bias=True):
    p = {"w": _f32(sd[f"{prefix}.weight"]).T}
    if bias:
        p["b"] = _f32(sd[f"{prefix}.bias"])
    return p


def _conv(sd, key):
    # torch OIHW with H=freq, W=time  ->  ours (time, freq, in, out)
    return {"w": _f32(sd[key]).transpose(3, 2, 1, 0)}


def _bn_split(sd, prefix):
    params = {"gamma": _f32(sd[f"{prefix}.weight"]), "beta": _f32(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _f32(sd[f"{prefix}.running_mean"]),
        "var": _f32(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _attention(sd, prefix):
    return {
        "norm_gamma": _f32(sd[f"{prefix}.norm.gamma"]),
        "qkv_w": _f32(sd[f"{prefix}.to_qkv.weight"]).T,
        "gates_w": _f32(sd[f"{prefix}.to_gates.weight"]).T,
        "gates_b": _f32(sd[f"{prefix}.to_gates.bias"]),
        "out_w": _f32(sd[f"{prefix}.to_out.0.weight"]).T,
    }


def _ff(sd, prefix):
    return {
        "norm_gamma": _f32(sd[f"{prefix}.net.0.gamma"]),
        "w1": _f32(sd[f"{prefix}.net.1.weight"]).T,
        "b1": _f32(sd[f"{prefix}.net.1.bias"]),
        "w2": _f32(sd[f"{prefix}.net.4.weight"]).T,
        "b2": _f32(sd[f"{prefix}.net.4.bias"]),
    }


def torch_state_dict_to_pytree(state_dict: dict, config) -> tuple[dict, dict]:
    """Convert a reference BeatThis state_dict into (params, state) pytrees.

    Accepts both bare-model and Lightning (`model.`-prefixed) dicts. The name
    scheme follows the reference module tree (beat_this/model/beat_tracker.py,
    beat_this/model/roformer.py).
    """
    sd = _strip_keys(state_dict)
    params: dict[str, Any] = {}
    state: dict[str, Any] = {}

    bn1d_p, bn1d_s = _bn_split(sd, "frontend.stem.bn1d")
    bn2d_p, bn2d_s = _bn_split(sd, "frontend.stem.bn2d")
    params["stem"] = {
        "bn1d": bn1d_p,
        "conv": _conv(sd, "frontend.stem.conv2d.weight"),
        "bn2d": bn2d_p,
    }
    state["stem"] = {"bn1d": bn1d_s, "bn2d": bn2d_s}

    params["blocks"], state["blocks"] = [], []
    for i in range(3):
        base = f"frontend.blocks.{i}"
        block: dict[str, Any] = {}
        if f"{base}.partial.attnF.norm.gamma" in sd:
            block["partial"] = {
                "attnF": _attention(sd, f"{base}.partial.attnF"),
                "ffF": _ff(sd, f"{base}.partial.ffF"),
                "attnT": _attention(sd, f"{base}.partial.attnT"),
                "ffT": _ff(sd, f"{base}.partial.ffT"),
            }
        block["conv"] = _conv(sd, f"{base}.conv2d.weight")
        bn_p, bn_s = _bn_split(sd, f"{base}.norm")
        block["bn"] = bn_p
        params["blocks"].append(block)
        state["blocks"].append({"bn": bn_s})

    params["linear"] = _linear(sd, "frontend.linear")
    params["transformer"] = {
        "layers": [
            {
                "attn": _attention(sd, f"transformer_blocks.layers.{i}.0"),
                "ff": _ff(sd, f"transformer_blocks.layers.{i}.1"),
            }
            for i in range(config.n_layers)
        ],
        "norm_gamma": _f32(sd["transformer_blocks.norm.gamma"]),
    }
    params["head"] = _linear(sd, "task_heads.beat_downbeat_lin")
    return params, state


def pytree_to_torch_state_dict(params: dict, state: dict) -> dict:
    """Inverse mapping: export (params, state) as a reference-named torch
    state_dict (numpy arrays), for checkpoint interchange with the PyTorch
    stack."""
    sd: dict[str, np.ndarray] = {}

    def put_bn(prefix, p, s):
        sd[f"{prefix}.weight"] = _f32(p["gamma"])
        sd[f"{prefix}.bias"] = _f32(p["beta"])
        sd[f"{prefix}.running_mean"] = _f32(s["mean"])
        sd[f"{prefix}.running_var"] = _f32(s["var"])
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    def put_attention(prefix, p):
        sd[f"{prefix}.norm.gamma"] = _f32(p["norm_gamma"])
        sd[f"{prefix}.to_qkv.weight"] = _f32(p["qkv_w"]).T
        sd[f"{prefix}.to_gates.weight"] = _f32(p["gates_w"]).T
        sd[f"{prefix}.to_gates.bias"] = _f32(p["gates_b"])
        sd[f"{prefix}.to_out.0.weight"] = _f32(p["out_w"]).T

    def put_ff(prefix, p):
        sd[f"{prefix}.net.0.gamma"] = _f32(p["norm_gamma"])
        sd[f"{prefix}.net.1.weight"] = _f32(p["w1"]).T
        sd[f"{prefix}.net.1.bias"] = _f32(p["b1"])
        sd[f"{prefix}.net.4.weight"] = _f32(p["w2"]).T
        sd[f"{prefix}.net.4.bias"] = _f32(p["b2"])

    put_bn("frontend.stem.bn1d", params["stem"]["bn1d"], state["stem"]["bn1d"])
    sd["frontend.stem.conv2d.weight"] = _f32(
        params["stem"]["conv"]["w"]
    ).transpose(3, 2, 1, 0)
    put_bn("frontend.stem.bn2d", params["stem"]["bn2d"], state["stem"]["bn2d"])

    for i, (block, bstate) in enumerate(zip(params["blocks"], state["blocks"])):
        base = f"frontend.blocks.{i}"
        if "partial" in block:
            put_attention(f"{base}.partial.attnF", block["partial"]["attnF"])
            put_ff(f"{base}.partial.ffF", block["partial"]["ffF"])
            put_attention(f"{base}.partial.attnT", block["partial"]["attnT"])
            put_ff(f"{base}.partial.ffT", block["partial"]["ffT"])
        sd[f"{base}.conv2d.weight"] = _f32(block["conv"]["w"]).transpose(3, 2, 1, 0)
        put_bn(f"{base}.norm", block["bn"], bstate["bn"])

    sd["frontend.linear.weight"] = _f32(params["linear"]["w"]).T
    sd["frontend.linear.bias"] = _f32(params["linear"]["b"])
    for i, layer in enumerate(params["transformer"]["layers"]):
        put_attention(f"transformer_blocks.layers.{i}.0", layer["attn"])
        put_ff(f"transformer_blocks.layers.{i}.1", layer["ff"])
    sd["transformer_blocks.norm.gamma"] = _f32(params["transformer"]["norm_gamma"])
    sd["task_heads.beat_downbeat_lin.weight"] = _f32(params["head"]["w"]).T
    sd["task_heads.beat_downbeat_lin.bias"] = _f32(params["head"]["b"])
    return sd
