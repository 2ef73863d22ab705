"""Functional NN layers over explicit param pytrees.

The TPU-native replacement for the reference models' ``jt.Module`` layers.
Parameters are plain nested dicts of ``jnp`` arrays — no module classes — so
that (a) every model is a pure jit-compiled function and (b) mapping the
reference's ``.pth``/``.pkl`` checkpoints onto our trees is a mechanical key
rename (see ``tpuseg/weights``).

Conventions (TPU-native):
  - activations are NHWC (channels on the 128-lane axis)
  - conv kernels are HWIO (torch OIHW is transposed at load time)
  - compute dtype follows the input; params may be kept in f32 and cast
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(
    x: jax.Array,
    p: dict,
    stride: int | tuple = 1,
    padding: int | str | tuple = 0,
    dilation: int | tuple = 1,
    groups: int = 1,
) -> jax.Array:
    """2D convolution, NHWC x HWIO -> NHWC (torch Conv2d semantics)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    w = p["weight"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if p.get("bias") is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


def conv_transpose2d(x: jax.Array, p: dict, stride: int = 2) -> jax.Array:
    """torch ConvTranspose2d (padding=0). Weight stored as
    torch_weight.transpose(2, 3, 0, 1) i.e. [kh, kw, in, out]; verified
    numerically identical to torch (tests/test_maskrcnn.py)."""
    w = p["weight"].astype(x.dtype)
    out = jax.lax.conv_transpose(
        x,
        w,
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
        transpose_kernel=True,
    )
    if p.get("bias") is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


def linear(x: jax.Array, p: dict) -> jax.Array:
    """Dense layer; weight stored [in, out] (torch [out, in] transposed at load)."""
    out = jnp.dot(x, p["weight"].astype(x.dtype))
    if p.get("bias") is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


def frozen_batch_norm(x: jax.Array, p: dict, eps: float = 0.0) -> jax.Array:
    """FrozenBatchNorm2d (detectron backbone): affine with folded stats.

    Reference: maskrcnn-benchmark's FrozenBatchNorm2d — BN where the batch
    statistics and affine params are fixed; upstream uses eps=0 because the
    Caffe2-origin weights already fold epsilon into running_var.
    """
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    bias = p["bias"] - p["running_mean"] * scale
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def batch_norm_inference(x: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    """BatchNorm2d in eval mode (yolact/yolo backbones at inference)."""
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    bias = p["bias"] - p["running_mean"] * scale
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


# --- train-mode BatchNorm (yolact/yolo/pose2seg training parity) -----------
#
# The reference trainers run BN in training mode (normalize by batch
# statistics, update running stats with momentum); only the detectron family
# freezes BN. Functionally: ``batch_norm`` normalizes by batch stats while a
# ``bn_train_mode`` context is active and tapes ``(param_dict, mean, var,
# n)`` at trace time; the trainer returns the taped stats as an aux output
# (keyed by param path via :func:`bn_tape_by_path`) and folds them into the
# master params with :func:`bn_apply_stats` — torch ``momentum=0.1``
# semantics, unbiased variance for the running update.

_BN_TAPE = None


class bn_train_mode:
    """Trace-time context switching :func:`batch_norm` to training mode."""

    def __init__(self):
        self.tape = []

    def __enter__(self):
        global _BN_TAPE
        self._prev = _BN_TAPE
        _BN_TAPE = self
        return self

    def __exit__(self, *exc):
        global _BN_TAPE
        _BN_TAPE = self._prev
        return False


def bn_training() -> bool:
    return _BN_TAPE is not None


def batch_norm(x: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    """BatchNorm2d: eval mode normally; batch-stat mode under
    :class:`bn_train_mode` (stats computed in f32, torch semantics —
    normalization uses the biased variance)."""
    if _BN_TAPE is None:
        return batch_norm_inference(x, p, eps=eps)
    axes = tuple(range(x.ndim - 1))
    # stats in at-least-f32 (torch semantics for bf16/f32 inputs; an f64
    # input keeps f64 so x64-mode equivalence tests stay bit-tight)
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(cdt)
    mean = jnp.mean(xf, axes)
    var = jnp.var(xf, axes)
    n = 1
    for a in axes:
        n *= x.shape[a]
    _BN_TAPE.tape.append((p, mean, var, n))
    scale = p["weight"].astype(cdt) * jax.lax.rsqrt(var + eps)
    bias = p["bias"].astype(cdt) - mean * scale
    return (xf * scale + bias).astype(x.dtype)


def bn_tape_by_path(params, tape) -> dict:
    """Resolve taped BN param dicts to their paths in ``params`` (the SAME
    tree object the forward indexed into). Returns ``{path_tuple: (mean,
    var, n)}`` — a valid pytree aux output (tracers as leaves, static
    paths as keys)."""
    paths = {}

    def walk(t, pre):
        if isinstance(t, dict):
            paths[id(t)] = pre
            for k, v in t.items():
                walk(v, pre + (k,))
        elif isinstance(t, (list, tuple)):
            for i, v in enumerate(t):
                walk(v, pre + (i,))

    walk(params, ())
    out = {}
    for entry in tape:
        if len(entry) == 4:
            p, mean, var, n = entry
            path = paths.get(id(p))
        else:
            # (anchor, relpath, mean, var, n) re-taped by
            # checkpoint_with_bn: stats that escaped a remat region as
            # explicit outputs, anchored at the params subtree the
            # rematted function received — resolve the anchor by id, then
            # extend by the path recorded inside the region
            anchor, rel, mean, var, n = entry
            base = paths.get(id(anchor))
            path = None if base is None else base + rel
        if path is None:
            raise ValueError("taped BN params not found in the given tree — "
                             "pass the exact tree the forward used")
        out[path] = (mean, var, float(n))
    return out


def checkpoint_with_bn(f, params_argnum: int = 0, **remat_kw):
    """``jax.checkpoint`` that composes with :class:`bn_train_mode`.

    A taped value produced INSIDE a remat region belongs to the region's
    sub-trace; stashing it on the ambient tape would leak the tracer (the
    reason per-block remat used to be skipped in training — VERDICT r3 #7).
    Here the region runs under its own local tape and returns the batch
    stats as explicit outputs of the checkpointed function (outputs are
    always residuals, so remat semantics are unchanged); the wrapper then
    re-tapes them onto the ambient tape anchored at the params argument, so
    ``bn_tape_by_path`` on the outer tree resolves them to full paths.

    ``params_argnum`` names the positional argument holding the params
    (sub)tree whose BN layers may tape. With no ambient tape (inference /
    frozen-BN training) this is exactly ``jax.checkpoint(f)``.
    """
    plain = jax.checkpoint(f, **remat_kw)
    meta = {}

    def inner(*args):
        with bn_train_mode() as bt:
            out = f(*args)
        stats = bn_tape_by_path(args[params_argnum], bt.tape)
        items = sorted(stats.items(), key=lambda kv: tuple(map(str, kv[0])))
        # static (path, n) stashed trace-side; overwritten identically when
        # remat replays the trace during backward
        meta["static"] = [(path, n) for path, (_, _, n) in items]
        return out, [(m, v) for _, (m, v, _) in items]

    rematted = jax.checkpoint(inner, **remat_kw)

    def wrapper(*args):
        if _BN_TAPE is None:
            return plain(*args)
        out, vals = rematted(*args)
        anchor = args[params_argnum]
        for (path, n), (m, v) in zip(meta["static"], vals):
            _BN_TAPE.tape.append((anchor, path, m, v, n))
        return out

    return wrapper


def bn_apply_stats(params, stats: dict, momentum: float = 0.1):
    """New params tree with each ``{path: (mean, var, n)}`` entry's
    ``running_mean``/``running_var`` updated (torch: ``r = (1-m)*r +
    m*batch``; running_var uses the unbiased batch variance)."""

    def rec(t, pre):
        if isinstance(t, dict):
            if pre in stats:
                mean, var, n = stats[pre]
                unbiased = var * (n / max(n - 1.0, 1.0))
                t = dict(t)
                rm, rv = t["running_mean"], t["running_var"]
                t["running_mean"] = ((1 - momentum) * rm
                                     + momentum * mean.astype(rm.dtype))
                t["running_var"] = ((1 - momentum) * rv
                                    + momentum * unbiased.astype(rv.dtype))
                return t
            return {k: rec(v, pre + (k,)) for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            return type(t)(rec(v, pre + (i,)) for i, v in enumerate(t))
        return t

    return rec(params, ())


def bn_param_groups(params):
    """lr_scale tree pinning BN running statistics (torch buffers — never
    optimizer-updated; eval-mode BN gives them real gradients and plain
    SGD+wd would otherwise train them)."""

    def spec(path, leaf):
        keys = [getattr(k, "key", None) for k in path]
        return 0.0 if ("running_mean" in keys or "running_var" in keys) else 1.0

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_norm_train(x: jax.Array, p: dict, eps: float = 1e-5, axes=(0, 1, 2)):
    """BatchNorm2d training mode: normalize by batch stats.

    Returns (out, batch_mean, batch_var) so the train step can update the
    running statistics functionally.
    """
    mean = jnp.mean(x, axes)
    var = jnp.var(x, axes)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return out, mean, var


def layer_norm(x: jax.Array, p: dict, eps: float = 1e-6) -> jax.Array:
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    return out * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)


def group_norm(x: jax.Array, p: dict, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over NHWC (detectron GN heads)."""
    n, h, w, c = x.shape
    g = num_groups
    xg = x.reshape(n, h, w, g, c // g)
    mean = jnp.mean(xg, (1, 2, 4), keepdims=True)
    var = jnp.var(xg, (1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(n, h, w, c)
    return out * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)


def max_pool2d(
    x: jax.Array, kernel: int, stride: int | None = None, padding: int = 0
) -> jax.Array:
    """torch MaxPool2d semantics (pads with -inf)."""
    stride = stride or kernel
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool2d(x: jax.Array, kernel: int, stride: int | None = None) -> jax.Array:
    stride = stride or kernel
    out = jax.lax.reduce_window(
        x,
        jnp.asarray(0, x.dtype),
        jax.lax.add,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return out / (kernel * kernel)


def global_avg_pool(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=(1, 2))


def resize_nearest(x: jax.Array, out_hw: tuple):
    """Nearest resize matching torch interpolate(mode='nearest') (floor rule)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    ridx = (jnp.arange(oh) * h // oh).astype(jnp.int32)
    cidx = (jnp.arange(ow) * w // ow).astype(jnp.int32)
    return x[:, ridx][:, :, cidx]


def relu(x):
    return jnp.maximum(x, 0)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def dropout(x, rate, key, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0)


# ---------------------------------------------------------------------------
# Initializers (for training-from-scratch parity with the reference)
# ---------------------------------------------------------------------------


def kaiming_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in = kh * kw * cin
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def xavier_linear(key, cin, cout, dtype=jnp.float32):
    bound = np.sqrt(6.0 / (cin + cout))
    return jax.random.uniform(key, (cin, cout), dtype, -bound, bound)


def conv_params(key, kh, kw, cin, cout, bias=True, dtype=jnp.float32):
    p = {"weight": kaiming_conv(key, kh, kw, cin, cout, dtype)}
    p["bias"] = jnp.zeros((cout,), dtype) if bias else None
    return p


def linear_params(key, cin, cout, bias=True, dtype=jnp.float32):
    p = {"weight": xavier_linear(key, cin, cout, dtype)}
    p["bias"] = jnp.zeros((cout,), dtype) if bias else None
    return p


def bn_params(c, dtype=jnp.float32):
    return {
        "weight": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "running_mean": jnp.zeros((c,), dtype),
        "running_var": jnp.ones((c,), dtype),
    }


def ln_params(c, dtype=jnp.float32):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
