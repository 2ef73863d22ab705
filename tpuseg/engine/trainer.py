"""Training engine: optimizer, LR schedules, jitted DP train step, checkpoints.

Reference surfaces reproduced:
  - YOLACT train.py: SGD momentum 0.9 / wd 5e-4, lr warmup (500 iters, from
    lr/3? — upstream: warmup_until=500, warmup_init=lr/10... the shipped
    config uses linear warmup from warmup_init to lr), gamma-0.1 steps,
    ``weights/<cfg>_<epoch>_<iter>`` checkpoint naming with
    ``--start_iter=-1`` parsed from the filename [README.md:225-237]
  - detectron solver: WarmupMultiStepLR (SOLVER.STEPS, factor 1/3 warmup)
    [README.md:277-282]

The train step is ONE jit program: loss + grads + SGD update, with the batch
sharded over the mesh "data" axis and params replicated — XLA inserts the
gradient all-reduce over ICI (the jt.mpi/NCCL-DDP equivalent).
"""
from __future__ import annotations

import os
import re
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# LR schedules
# ---------------------------------------------------------------------------


def yolact_lr_schedule(base_lr=1e-3, warmup_until=500, warmup_init=1e-4,
                       steps=(280000, 600000, 700000, 750000), gamma=0.1):
    """yolact train.py set_lr logic as a pure function of iteration."""

    def lr(it):
        it = jnp.asarray(it, jnp.float32)
        warm = warmup_init + (base_lr - warmup_init) * it / warmup_until
        decays = sum(jnp.where(it >= s, 1, 0) for s in steps)
        stepped = base_lr * gamma**decays
        return jnp.where(it < warmup_until, warm, stepped)

    return lr


def warmup_multistep_lr(base_lr=0.01, steps=(120000, 160000), gamma=0.1,
                        warmup_factor=1.0 / 3, warmup_iters=500,
                        warmup_method="linear"):
    """maskrcnn-benchmark WarmupMultiStepLR."""

    def lr(it):
        it = jnp.asarray(it, jnp.float32)
        if warmup_method == "linear":
            alpha = it / warmup_iters
            wf = warmup_factor * (1 - alpha) + alpha
        else:
            wf = jnp.asarray(warmup_factor)
        wf = jnp.where(it < warmup_iters, wf, 1.0)
        decays = sum(jnp.where(it >= s, 1, 0) for s in steps)
        return base_lr * wf * gamma**decays

    return lr


# ---------------------------------------------------------------------------
# SGD with momentum + weight decay (reference optimizer for all detectors)
# ---------------------------------------------------------------------------


def sgd_init(params):
    return jax.tree.map(jnp.zeros_like, params)


def cast_floats(tree, dtype):
    """Cast every floating leaf to ``dtype`` (mixed-precision forward: f32
    master params stay in the optimizer, the model computes in bf16; the
    cast's transpose returns f32 grads). Loss modules already upcast
    logits to f32 at their entry points, so losses stay f32-stable."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


def sgd_update(params, grads, momentum_buf, lr, momentum=0.9,
               weight_decay=5e-4, lr_scale=None, wd_scale=None):
    """torch.optim.SGD semantics: buf = m*buf + (grad + wd*p); p -= lr*buf.

    ``lr_scale``/``wd_scale``: optional trees of per-leaf multipliers
    (param-group semantics: maskrcnn-benchmark gives biases lr x2 / wd 0
    and never updates FrozenBN buffers or frozen backbone stages —
    lr_scale 0 freezes a leaf)."""

    def upd(p, g, b, ls, ws):
        if g is None or ls == 0.0:
            return p, b
        g = g + (weight_decay * ws) * p
        b = momentum * b + g
        return p - (lr * ls) * b, b

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = jax.tree.leaves(grads)
    flat_b = jax.tree.leaves(momentum_buf)
    flat_ls = (jax.tree.leaves(lr_scale) if lr_scale is not None
               else [1.0] * len(flat_p))
    flat_ws = (jax.tree.leaves(wd_scale) if wd_scale is not None
               else [1.0] * len(flat_p))
    new_p, new_b = zip(*[upd(p, g, b, ls, ws) for p, g, b, ls, ws
                         in zip(flat_p, flat_g, flat_b, flat_ls, flat_ws)])
    return jax.tree.unflatten(treedef, new_p), jax.tree.unflatten(treedef, new_b)


def detectron_param_groups(params):
    """(lr_scale, wd_scale) trees for maskrcnn-benchmark's make_optimizer:
    biases lr x2 (BIAS_LR_FACTOR) with wd 0; FrozenBN affine buffers and
    the frozen stem+layer1 stages (FREEZE_CONV_BODY_AT=2) lr 0."""

    def spec(path, leaf):
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        skeys = [k for k in keys if isinstance(k, str)]
        frozen_stage = ("backbone" in skeys
                        and ("stem" in skeys or "layer1" in skeys))
        frozen_bn = any(k == "bn" or k.startswith("bn") for k in skeys)
        if frozen_stage or frozen_bn:
            return 0.0, 0.0
        if skeys and skeys[-1] == "bias":
            return 2.0, 0.0
        return 1.0, 1.0

    both = jax.tree_util.tree_map_with_path(spec, params)
    lr_scale = jax.tree.map(lambda t: t[0], both,
                            is_leaf=lambda x: isinstance(x, tuple))
    wd_scale = jax.tree.map(lambda t: t[1], both,
                            is_leaf=lambda x: isinstance(x, tuple))
    return lr_scale, wd_scale


# ---------------------------------------------------------------------------
# Checkpoint naming (yolact SavePath convention)
# ---------------------------------------------------------------------------

_CKPT_RE = re.compile(r"^(?P<name>.+)_(?P<epoch>\d+)_(?P<iter>\d+)\.(npz|pth)$")


def ckpt_path(folder: str, cfg_name: str, epoch: int, iteration: int,
              fmt: str = "pth") -> str:
    """yolact SavePath naming: weights/<cfg>_<epoch>_<iter>.<ext>
    (README.md:232-233). fmt="pth" (default, reference convention — the
    file round-trips through real torch) or "npz"."""
    return os.path.join(folder, f"{cfg_name}_{epoch}_{iteration}.{fmt}")


def parse_ckpt_iter(path: str) -> int:
    """--start_iter=-1: parse the iteration from the filename (README:233)."""
    m = _CKPT_RE.match(os.path.basename(path))
    if not m:
        raise ValueError(f"checkpoint name not parseable: {path}")
    return int(m.group("iter"))


def save_params_npz(path: str, params) -> None:
    flat = {}

    def rec(tree, pre):
        if isinstance(tree, dict):
            for k, v in tree.items():
                rec(v, f"{pre}{k}.")
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                rec(v, f"{pre}{i}.")
        elif tree is not None:
            flat[pre[:-1]] = np.asarray(tree)

    rec(params, "")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def save_params_pth(path: str, params, model_cfg) -> None:
    """Write a reference-format torch-zip checkpoint: the param tree maps
    back to a dbolya-named state dict (weights/yolact_map.to_torch_state)
    and serializes via the pure-Python torch writer, so the snapshot loads
    through upstream ``load_weights`` AND through real ``torch.load``."""
    from tpuseg.weights.torch_io import save_torch_file
    from tpuseg.weights.yolact_map import to_torch_state

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_torch_file(path, to_torch_state(params, model_cfg))


def load_params_ckpt(path: str, like, model_cfg=None):
    """Resume from either checkpoint format by extension (.pth reads back
    through the real torch-checkpoint path: unpickle + weight map)."""
    if path.endswith(".pth"):
        from tpuseg.weights.torch_io import flatten_state_dict, load_torch_file
        from tpuseg.weights.yolact_map import from_torch_state

        flat = flatten_state_dict(load_torch_file(path))
        params = from_torch_state(flat, model_cfg)
        return jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None, params,
            is_leaf=lambda x: x is None or isinstance(x, np.ndarray))
    return load_params_npz(path, like)


def load_params_npz(path: str, like) -> dict:
    data = np.load(path)

    def rec(tree, pre):
        if isinstance(tree, dict):
            return {k: rec(v, f"{pre}{k}.") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [rec(v, f"{pre}{i}.") for i, v in enumerate(tree)]
        if tree is None:
            return None
        return jnp.asarray(data[pre[:-1]])

    return rec(like, "")


# ---------------------------------------------------------------------------
# YOLACT train step (single jit program, DP over the mesh)
# ---------------------------------------------------------------------------


@dataclass
class YolactTrainer:
    """Iteration-based trainer mirroring yolact train.py."""

    model_cfg: object
    loss_cfg: object = None
    lr_fn: object = None
    momentum: float = 0.9
    weight_decay: float = 5e-4
    # None = reference-parity f32; jnp.bfloat16 = TPU mixed precision
    # (f32 master weights, bf16 forward/backward compute)
    compute_dtype: object = None
    # yolact train.py freezes BN when the per-GPU batch is < 6 ("Per-GPU
    # batch size is less than the recommended limit for batch norm");
    # otherwise BN trains (batch statistics + running-stat momentum 0.1)
    freeze_bn: bool = False

    def __post_init__(self):
        from tpuseg.models.yolact import make_priors_np
        from tpuseg.models.yolact_loss import YolactLossConfig

        if self.loss_cfg is None:
            self.loss_cfg = YolactLossConfig()
        if self.lr_fn is None:
            self.lr_fn = yolact_lr_schedule()
        self.priors = jnp.asarray(make_priors_np(self.model_cfg))
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        from tpuseg.models.yolact import forward_train
        from tpuseg.models.yolact_loss import total_loss
        from tpuseg.nn import layers as L

        mcfg, lcfg = self.model_cfg, self.loss_cfg
        priors = self.priors
        mom, wd = self.momentum, self.weight_decay
        lr_fn = self.lr_fn
        train_bn = not self.freeze_bn

        cdt = self.compute_dtype

        def loss_fn(params, images, targets, key):
            pc = params
            if cdt is not None:
                pc = cast_floats(params, cdt)
                images = images.astype(cdt)
            if train_bn:
                with L.bn_train_mode() as bt:
                    preds, sem = forward_train(pc, images, mcfg)
                bn_stats = L.bn_tape_by_path(pc, bt.tape)
            else:
                preds, sem = forward_train(pc, images, mcfg)
                bn_stats = {}
            if cdt is not None:
                preds = {k: v.astype(jnp.float32) for k, v in preds.items()}
                sem = sem.astype(jnp.float32)
            miou_fn = None
            if lcfg.use_maskiou and "maskiou" in pc:
                from tpuseg.models.yolact import maskiou_net

                def miou_fn(m):
                    m = m if cdt is None else m.astype(cdt)
                    return maskiou_net(pc["maskiou"], m, mcfg).astype(
                        jnp.float32)
            losses = total_loss(preds, sem, targets, priors, key, lcfg,
                                maskiou_fn=miou_fn)
            return losses["total"], (losses, bn_stats)

        def step(params, buf, images, targets, key, iteration):
            (_, (losses, bn_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, images, targets, key)
            lr = lr_fn(iteration)
            # running stats are torch buffers: updated by momentum below,
            # never by the optimizer (eval-mode BN still routes real
            # gradients into them, so they must be pinned explicitly)
            ls = L.bn_param_groups(params)
            params, buf = sgd_update(params, grads, buf, lr, mom, wd,
                                     lr_scale=ls)
            if bn_stats:
                params = L.bn_apply_stats(params, bn_stats)
            return params, buf, losses

        return step

    def init_state(self, params):
        return sgd_init(params)

    def train_step(self, params, buf, images, targets, key, iteration):
        """images [B,H,W,3] float normalized; targets per yolact_loss.total_loss."""
        return self._step(params, buf, images, targets, key, iteration)
