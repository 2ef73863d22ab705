import numpy as np
import jax
import jax.numpy as jnp


def test_sharded_inference_yolact():
    """Batch-sharded YOLACT inference over the 8-device CPU mesh."""
    from tpuseg.models import yolact as Y
    from tpuseg.parallel.inference import ShardedInference

    cfg = Y.YolactConfig(img_size=64, num_classes=4, nms_top_k=8,
                         max_num_detections=5)
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    priors = jnp.asarray(Y.make_priors_np(cfg))

    def fn(params, images):
        return Y.full_pipeline(params, priors, images, cfg)

    sharded = ShardedInference(fn, params)
    assert sharded.data_size == 8
    images = jnp.zeros((16, 64, 64, 3), jnp.uint8)
    out = sharded(images)
    assert out["boxes"].shape == (16, 5, 4)
    # outputs are sharded across all 8 devices
    assert len(out["boxes"].sharding.device_set) == 8
    # matches single-device execution
    single = jax.jit(fn)(params, images)
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(single["scores"]),
        rtol=1e-4, atol=1e-5)


def test_coco_demo_facade(rng):
    from tpuseg.engine.predictor import COCODemo

    demo = COCODemo(min_image_size=128, confidence_threshold=0.001)
    # shrink the model for CPU: monkeypatch is overkill — drive the public
    # surface with the default model once at a small image
    img = rng.integers(0, 255, (100, 140, 3)).astype(np.uint8)
    out = demo.run_on_opencv_image(img)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_measure_throughput():
    from tpuseg.utils.profiler import measure_throughput

    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((8, 8))
    ips, ms = measure_throughput(f, x, iters=5, warmup=1, items_per_call=8)
    assert ips > 0 and ms > 0


def test_yolact_sharded_eval_matches_single_device(rng):
    """--devices=all path: identical detections 1-dev vs 8-dev virtual mesh
    (VERDICT r1 #7)."""
    import jax.numpy as jnp

    from tpuseg.engine.yolact_engine import YolactPredictor
    from tpuseg.models import yolact as Y

    cfg = Y.YolactConfig(img_size=128, num_classes=5, nms_top_k=8,
                         max_num_detections=5)
    params = Y.init_params(jax.random.PRNGKey(0), cfg)
    imgs = rng.integers(0, 255, (8, 128, 128, 3)).astype(np.uint8)

    p1 = YolactPredictor(cfg, params=params, batch_size=8)
    p8 = YolactPredictor(cfg, params=params, batch_size=8, devices="all")
    assert p8.n_devices == 8
    out1 = p1.run_batch(imgs)
    out8 = p8.run_batch(imgs)
    assert set(out1) == set(out8)
    v1, v8 = out1["valid"], out8["valid"]
    np.testing.assert_array_equal(v1, v8)
    for k in ("boxes", "scores", "classes", "masks"):
        # invalid padded slots hold garbage (class-offset NMS coords) — only
        # valid detections are the contract
        np.testing.assert_allclose(out1[k][v1], out8[k][v8], rtol=5e-3,
                                   atol=1e-4, err_msg=k)


def test_maskrcnn_sharded_eval_matches_single_device(rng, monkeypatch):
    import tpuseg.engine.maskrcnn_engine as ME
    from tpuseg.models import maskrcnn as M

    cfg = M.MaskRCNNConfig(
        rpn_pre_nms_top_n=32, rpn_post_nms_top_n=32, fpn_post_nms_top_n=16,
        detections_per_img=4, pre_final_nms_topk=64, num_classes=5)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    imgs = [rng.integers(0, 255, (50, 75, 3)).astype(np.uint8)
            for _ in range(8)]

    # min/max_image_size drive the static canvas (48 x ceil64(96) = 128)
    p1 = ME.MaskRCNNPredictor(cfg=cfg, params=params, batch_size=8,
                              min_image_size=48, max_image_size=96)
    p8 = ME.MaskRCNNPredictor(cfg=cfg, params=params, batch_size=8,
                              devices="all", min_image_size=48,
                              max_image_size=96)
    r1 = p1.run_on_bgr_images(imgs)
    r8 = p8.run_on_bgr_images(imgs)
    for a, b in zip(r1, r8):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-4,
                                       err_msg=k)
    # odd-size batch exercises the pad-to-devices path
    r5 = p8.run_on_bgr_images(imgs[:5])
    for a, b in zip(r1[:5], r5):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-4)
    # pad > len(batch): a single image on 8 devices (the evaluate_coco
    # leftover path) must pad 1 -> 8 rows, not 1 -> 2
    r1x = p8.run_on_bgr_images(imgs[:1])
    for k in r1[0]:
        np.testing.assert_allclose(r1[0][k], r1x[0][k], rtol=1e-4,
                                   atol=1e-4)


def test_maskrcnn_pallas_spmd_shard_map(rng):
    """pallas_call under SPMD: the real kernel code paths (interpret mode)
    run per-shard via shard_map over the 8-device CPU mesh and agree with
    the single-device jnp path (VERDICT r2 next-round #4).

    GSPMD cannot partition a Pallas custom call (no sharding rule), so the
    documented multi-chip strategy for Mask R-CNN is shard_map over the
    data axis — each chip launches the RoIAlign/NMS kernels on its local
    batch shard. ShardedInference(use_shard_map=True) is that path.
    """
    from tpuseg.models import maskrcnn as M
    from tpuseg.ops.pallas import pallas_override
    from tpuseg.parallel.inference import ShardedInference

    cfg = M.MaskRCNNConfig(
        rpn_pre_nms_top_n=32, rpn_post_nms_top_n=32, fpn_post_nms_top_n=16,
        detections_per_img=4, pre_final_nms_topk=64, num_classes=5)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(
        rng.standard_normal((8, 64, 128, 3)).astype(np.float32) * 20.0)
    hw = jnp.asarray([[64, 128]] * 8, jnp.int32)

    def fn(p, batch):
        im, hw_b = batch
        return M.forward_inference(p, im, hw_b, cfg)

    single = jax.jit(lambda p, im, h: M.forward_inference(p, im, h, cfg))(
        params, images, hw)  # jnp (non-pallas) reference path
    with pallas_override(use_pallas=True, interpret=True):
        sharded = ShardedInference(fn, params, use_shard_map=True)
        out = sharded((images, hw))
        out = jax.device_get(out)
    v1 = np.asarray(single["valid"])
    v8 = np.asarray(out["valid"])
    np.testing.assert_array_equal(v1, v8)
    np.testing.assert_allclose(np.asarray(out["scores"])[v8],
                               np.asarray(single["scores"])[v1],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["boxes"])[v8],
                               np.asarray(single["boxes"])[v1],
                               rtol=1e-3, atol=0.1)
    # masks: pallas folds bilinear+bin-average into MXU matmuls — fp
    # reassociation vs the jnp gather path moves a handful of sigmoid
    # outputs by ~1e-2 (2/21168 elements here); detections are identical
    np.testing.assert_allclose(np.asarray(out["masks"])[v8],
                               np.asarray(single["masks"])[v1],
                               rtol=2e-3, atol=2e-2)


def test_retinanet_sharded_eval_matches_single_device(rng):
    """1-vs-8 device identity for the RetinaNet pipeline (GSPMD batch
    sharding — the remaining detectron-family meta-arch)."""
    from tpuseg.models import retinanet as RN
    from tpuseg.parallel.inference import ShardedInference

    cfg = RN.RetinaNetConfig(pre_nms_top_n=32, detections_per_img=8,
                             num_classes=5)
    params = RN.init_params(jax.random.PRNGKey(0), cfg)
    # modest scale: saturated sigmoid scores (exact 1.0 ties) make the
    # final top-k order an implementation detail GSPMD may permute
    images = jnp.asarray(
        rng.standard_normal((8, 128, 128, 3)).astype(np.float32) * 2.0)
    hw = jnp.asarray([[120, 128]] * 8, jnp.int32)

    def fn(p, batch):
        im, hw_b = batch
        return RN.forward_inference(p, im, hw_b, cfg)

    single = jax.jit(lambda p, im, h: RN.forward_inference(p, im, h, cfg))(
        params, images, hw)
    sharded = ShardedInference(fn, params)
    out = jax.device_get(sharded((images, hw)))
    v1 = np.asarray(single["valid"])
    np.testing.assert_array_equal(v1, out["valid"])
    for k, atol in (("scores", 1e-4), ("boxes", 1e-2), ("classes", 0)):
        # boxes at 1e-2 px: GSPMD recompiles the decode with different fp
        # association than the single-device program
        np.testing.assert_allclose(np.asarray(out[k])[out["valid"]],
                                   np.asarray(single[k])[v1],
                                   rtol=1e-4, atol=atol, err_msg=k)


def test_yolov3_sharded_eval_matches_single_device(rng):
    """1-vs-8 device identity for the full YOLOv3 pipeline."""
    from tpuseg.models import yolov3 as Y3
    from tpuseg.parallel.inference import ShardedInference

    cfg = Y3.YoloV3Config(input_size=96, num_classes=6, max_det=8,
                          pre_nms_topk=64)
    params = Y3.init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(
        rng.standard_normal((8, 96, 96, 3)).astype(np.float32) * 0.2 + 0.5)

    def pipe(p, im):
        outs = Y3.forward(p, im, cfg)
        boxes, obj, cls = Y3.decode(outs, cfg)
        return Y3.postprocess(boxes, obj, cls, cfg)

    single = jax.jit(pipe)(params, images)
    sharded = ShardedInference(pipe, params)
    out = jax.device_get(sharded(images))
    v1 = np.asarray(single["valid"])
    np.testing.assert_array_equal(v1, out["valid"])
    # random init explodes the exp() wh decode to huge/inf coordinates —
    # legitimate garbage detections; rtol-only comparison (fp association
    # differs between the GSPMD and single-device compilations)
    for k in ("scores", "boxes", "classes"):
        np.testing.assert_allclose(np.asarray(out[k])[out["valid"]],
                                   np.asarray(single[k])[v1],
                                   rtol=1e-2, atol=1e-4, err_msg=k)


def _yolact_train_batch(rng, cfg, b, dtype=np.float32):
    from tpuseg.models import yolact as Y

    g = 8
    sizes = Y.level_sizes(cfg)
    proto = sizes[0] * 2
    xy = rng.uniform(0, 0.5, (b, g, 2))
    wh = rng.uniform(0.2, 0.5, (b, g, 2))
    classes = rng.integers(0, cfg.num_classes - 1, (b, g)).astype(np.int32)
    classes[:, g // 2:] = -1
    targets = {
        "boxes": jnp.asarray(
            np.concatenate([xy, xy + wh], -1).astype(dtype)),
        "classes": jnp.asarray(classes),
        "crowd": jnp.zeros((b, g), bool),
        "masks_proto": jnp.asarray(
            (rng.uniform(size=(b, g, proto, proto)) > 0.5).astype(dtype)),
        "masks_sem": jnp.asarray(
            (rng.uniform(size=(b, g, sizes[0], sizes[0])) > 0.5)
            .astype(dtype)),
    }
    images = jnp.asarray(
        rng.standard_normal((b, cfg.img_size, cfg.img_size, 3))
        .astype(dtype))
    return images, targets


def _tree_close(a, b, rtol, atol, prefix="", scale_atol=False):
    """Leaf-wise allclose over two pytrees. With ``scale_atol`` the atol for
    each leaf is relative to the LEAF's own magnitude scale: elements that
    are near-zero by cancellation of large summands carry floating-point
    noise proportional to the summand scale, not their own value (same
    rationale as test_bn_train's remat equivalence)."""
    fa = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(a)}
    fb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert set(fa) == set(fb)
    for k in fa:
        va, vb = np.asarray(fa[k]), np.asarray(fb[k])
        at = atol
        if scale_atol and np.issubdtype(va.dtype, np.floating):
            at = atol * max(np.abs(va).max(), np.abs(vb).max(), 1.0)
        np.testing.assert_allclose(va, vb, rtol=rtol, atol=at,
                                   err_msg=f"{prefix}{k}")


def test_yolact_train_step_identity_1v8(rng):
    """One full YOLACT optimizer step (loss + grads + SGD + BN running-stat
    update, train-mode BN) on identical data: GSPMD-sharded over the
    8-device mesh vs single device — updated params equal (VERDICT r3 #5:
    DP gradient all-reduce parity for TRAINING, not just eval).

    Runs in float64: the sharded program reassociates the batch reductions
    (BN stats become cross-device collectives), and in f32 those ~1e-7
    seeds amplify through 53 train-mode BNs to ~5% on near-zero grad
    elements (measured) — f64 pins the identity to ~1e-12 instead, which
    actually distinguishes 'same semantics' from 'per-shard BN stats'."""
    from tpuseg.engine.trainer import YolactTrainer
    from tpuseg.models import yolact as Y
    from tpuseg.parallel.mesh import make_mesh, replicate, shard_batch

    with jax.enable_x64():
        cfg = Y.YolactConfig(img_size=64, num_classes=4, nms_top_k=8,
                             max_num_detections=5)
        trainer = YolactTrainer(cfg)
        params = jax.tree.map(
            lambda v: v.astype(jnp.float64)
            if jnp.issubdtype(v.dtype, jnp.floating) else v,
            Y.init_params(jax.random.PRNGKey(0), cfg))
        images, targets = _yolact_train_batch(rng, cfg, b=8, dtype=np.float64)
        key = jax.random.PRNGKey(1)

        # single device (default placement)
        buf1 = trainer.init_state(params)
        p1, _, l1 = trainer.train_step(params, buf1, images, targets, key, 0)

        # replicated params + batch sharded over the 8-device data axis:
        # the SAME jit program, GSPMD inserts the gradient all-reduce.
        # Train-mode BN batch statistics are global means over the sharded
        # batch axis — XLA turns them into cross-device collectives, so
        # semantics match the single-device step exactly.
        mesh = make_mesh(8)
        pr = replicate(params, mesh)
        buf8 = replicate(trainer.init_state(params), mesh)
        p8, _, l8 = trainer.train_step(
            pr, buf8, shard_batch(images, mesh), shard_batch(targets, mesh),
            key, 0)
        leaf = jax.tree_util.tree_leaves(p8)[0]
        assert len(leaf.sharding.device_set) == 8
        np.testing.assert_allclose(float(l1["total"]), float(l8["total"]),
                                   rtol=1e-12)
        _tree_close(p1, p8, rtol=1e-9, atol=1e-10, prefix="params",
                    scale_atol=True)


def test_maskrcnn_train_step_identity_1v8(rng):
    """One Mask R-CNN FPN optimizer step, GSPMD-sharded vs single device.

    Runs in float64 for a reason specific to this model: the RPN top-k/NMS
    makes the program DISCRETELY sensitive to accumulate-order noise — in
    f32, GSPMD's conv reassociation shifts borderline objectness scores
    enough to flip proposal selection, and the two sides then train on
    different RoIs (measured: 6% of layer2 grad elements off by O(1),
    a selection flip, not tolerance noise). In f64 the reassociation noise
    (~1e-13 rel) cannot cross any score gap; the model's own f32 casts at
    the loss boundaries quantize identically on both sides, so selection
    and sampling match exactly and the comparison is tight.

    Sized down (32x32 canvas, batch 4, 4-device mesh) because f64 convs on
    the single-vCPU virtual mesh are ~10x f32: the 64x64/8-dev variant ran
    ~15 min for ONE sharded step."""
    from tpuseg.engine.trainer import sgd_init, sgd_update
    from tpuseg.models import maskrcnn as M
    from tpuseg.models import maskrcnn_loss as ML
    from tpuseg.parallel.mesh import make_mesh, replicate, shard_batch

    with jax.enable_x64():
        cfg = M.MaskRCNNConfig(
            rpn_pre_nms_top_n=16, rpn_post_nms_top_n=16,
            fpn_post_nms_top_n=8, detections_per_img=4,
            pre_final_nms_topk=32, num_classes=5)
        lcfg = ML.MaskRCNNLossConfig(
            num_classes=5, rpn_batch_per_image=8, roi_batch_per_image=8,
            gt_mask_crop=32)
        params = jax.tree.map(
            lambda v: v.astype(jnp.float64)
            if jnp.issubdtype(v.dtype, jnp.floating) else v,
            M.init_params(jax.random.PRNGKey(2), cfg))
        b, gm = 4, 4
        xy = rng.uniform(0, 14, (b, gm, 2))
        wh = rng.uniform(6, 16, (b, gm, 2))
        classes = rng.integers(0, 4, (b, gm)).astype(np.int32)
        classes[:, gm // 2:] = -1
        targets = {
            "boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1)),
            "classes": jnp.asarray(classes),
            "mask_crops": jnp.asarray(
                (rng.uniform(size=(b, gm, 32, 32)) > 0.5).astype(np.float64)),
        }
        images = jnp.asarray(rng.standard_normal((b, 32, 32, 3)))
        hw = jnp.asarray([[32, 32]] * b, jnp.int32)
        key = jax.random.PRNGKey(3)

        @jax.jit
        def step(p, buf, im, hwb, tg):
            def loss_fn(pp):
                losses = M.forward_train_losses(
                    pp, im, hwb, tg, key, cfg, lcfg)
                return losses["total"], losses

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            p, buf = sgd_update(p, grads, buf, 1e-3, 0.9, 1e-4)
            return p, buf, losses

        p1, _, l1 = step(params, sgd_init(params), images, hw, targets)

        mesh = make_mesh(4)
        p8, _, l8 = step(
            replicate(params, mesh), replicate(sgd_init(params), mesh),
            shard_batch(images, mesh), shard_batch(hw, mesh),
            shard_batch(targets, mesh))
        np.testing.assert_allclose(float(l1["total"]), float(l8["total"]),
                                   rtol=1e-6)
        # residual noise floor: the model's internal f32 casts (loss inputs)
        # quantize cotangents at f32 eps; scale-aware atol covers grad
        # elements near zero by cancellation (same rationale as the yolact
        # identity test above)
        _tree_close(p1, p8, rtol=1e-5, atol=1e-7, prefix="params",
                    scale_atol=True)


def test_maskrcnn_train_shard_map_pallas_grads(rng):
    """RoIAlign BACKWARD kernel under SPMD: the full Mask R-CNN train-step
    gradient, computed per-shard under shard_map with the Pallas kernels
    forced ON (interpret mode) and pmean'd over the data axis, matches the
    identical shard_map program on the jnp gather path (VERDICT r3 #5).

    Same shard structure and same per-shard RNG keys on both sides, so the
    only difference is kernel-vs-jnp — this pins pallas_call's custom VJP
    inside a shard_map'd gradient program.
    """
    from tpuseg.models import maskrcnn as M
    from tpuseg.models import maskrcnn_loss as ML
    from tpuseg.ops.pallas import pallas_override
    from tpuseg.parallel.mesh import make_mesh, replicate, shard_batch
    from jax.sharding import PartitionSpec as P

    cfg = M.MaskRCNNConfig(
        rpn_pre_nms_top_n=32, rpn_post_nms_top_n=32, fpn_post_nms_top_n=16,
        detections_per_img=4, pre_final_nms_topk=64, num_classes=5)
    lcfg = ML.MaskRCNNLossConfig(
        num_classes=5, rpn_batch_per_image=16, roi_batch_per_image=16,
        gt_mask_crop=32)
    params = M.init_params(jax.random.PRNGKey(2), cfg)
    b, gm = 8, 4
    xy = rng.uniform(0, 30, (b, gm, 2)).astype(np.float32)
    wh = rng.uniform(10, 30, (b, gm, 2)).astype(np.float32)
    classes = rng.integers(0, 4, (b, gm)).astype(np.int32)
    classes[:, gm // 2:] = -1
    targets = {
        "boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        "classes": jnp.asarray(classes),
        "mask_crops": jnp.asarray(
            (rng.uniform(size=(b, gm, 32, 32)) > 0.5).astype(np.float32)),
    }
    images = jnp.asarray(
        rng.standard_normal((b, 64, 64, 3)).astype(np.float32))
    hw = jnp.asarray([[64, 64]] * b, jnp.int32)
    # one raw uint32 key per image, sharded with the batch
    keys = jnp.stack([jax.random.PRNGKey(10 + i) for i in range(b)])

    mesh = make_mesh(8)

    def shard_grads(p, im, hwb, tg, kk):
        def loss_fn(pp):
            return M.forward_train_losses(
                pp, im, hwb, tg, kk[0], cfg, lcfg)["total"]

        g = jax.grad(loss_fn)(p)
        return jax.tree.map(lambda x: jax.lax.pmean(x, "data"), g)

    def make_smapped():
        # fresh function object per variant: pallas_override is read at
        # TRACE time, so reusing one jitted callable would hit the compile
        # cache and silently ignore the override
        return jax.jit(jax.shard_map(
            lambda *a: shard_grads(*a), mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
            out_specs=P(), check_vma=False))

    args = (replicate(params, mesh), shard_batch(images, mesh),
            shard_batch(hw, mesh), shard_batch(targets, mesh),
            shard_batch(keys, mesh))
    g_jnp = jax.device_get(make_smapped()(*args))  # jnp gather path
    with pallas_override(use_pallas=True, interpret=True):
        g_pl = jax.device_get(make_smapped()(*args))
    # scale-aware atol: the RMW-scatter backward accumulates overlapping roi
    # windows in a different order than the jnp segment-sum path, so grad
    # elements near zero by cancellation differ at the summand scale
    # (measured: 0.07% of elements, ~3e-4 abs, on layer2 conv grads
    # downstream of the pooled-feature scatter)
    _tree_close(g_jnp, g_pl, rtol=2e-3, atol=5e-4, prefix="grads",
                scale_atol=True)


def test_pose2seg_sharded_eval_matches_single_device(rng):
    """1-vs-8 device identity for the Pose2Seg padded-people pipeline."""
    from tpuseg.models import pose2seg as P2S
    from tpuseg.parallel.inference import ShardedInference

    cfg = P2S.Pose2SegConfig(input_size=64, align_size=16, max_people=2,
                             paste_size=32)
    params = P2S.init_params(jax.random.PRNGKey(0), cfg)
    b, pp = 8, cfg.max_people
    images = jnp.asarray(
        rng.standard_normal((b, 64, 64, 3)).astype(np.float32))
    theta = jnp.asarray(np.tile(
        np.asarray([[0.3, 0.0, 0.1], [0.0, 0.3, 0.1]], np.float32),
        (b, pp, 1, 1)))
    inv_theta = jnp.asarray(np.tile(
        np.asarray([[3.0, 0.0, -0.3], [0.0, 3.0, -0.3]], np.float32),
        (b, pp, 1, 1)))
    pvalid = jnp.ones((b, pp), bool)
    skel = jnp.asarray(rng.standard_normal(
        (b, pp, cfg.align_size, cfg.align_size,
         cfg.skeleton_channels)).astype(np.float32))

    def fn(p, batch):
        im, th, ith, pv, sk = batch
        return P2S.forward(p, im, th, ith, pv, cfg, skel_feats=sk)

    single = jax.jit(
        lambda p, im, th, ith, pv, sk:
        P2S.forward(p, im, th, ith, pv, cfg, skel_feats=sk))(
            params, images, theta, inv_theta, pvalid, skel)
    sharded = ShardedInference(fn, params)
    out = jax.device_get(sharded((images, theta, inv_theta, pvalid, skel)))
    np.testing.assert_allclose(np.asarray(out["masks"]),
                               np.asarray(single["masks"]),
                               rtol=1e-4, atol=1e-5)
    # logits are ~1e4 under random weights; 1e-2 relative tolerates the
    # cross-compilation fp association difference
    np.testing.assert_allclose(np.asarray(out["aligned_logits"]),
                               np.asarray(single["aligned_logits"]),
                               rtol=1e-2, atol=1e-4)
