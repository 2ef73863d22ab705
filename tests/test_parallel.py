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
