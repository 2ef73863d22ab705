import numpy as np
import jax.numpy as jnp

from tpuseg.ops import nms as N
from tpuseg.ops.pallas.nms_pl import nms_mask_pallas
from tests.test_boxes import rand_boxes


def test_pallas_nms_matches_jnp_interpret(rng):
    for n in (64, 128, 300, 1000):
        boxes = rand_boxes(rng, n, size=30.0)
        scores = rng.standard_normal(n).astype(np.float32)
        want = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        got = np.asarray(nms_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")


def test_pallas_nms_validity_and_chain(rng):
    boxes = rand_boxes(rng, 200, size=40.0)
    scores = rng.standard_normal(200).astype(np.float32)
    valid = rng.uniform(size=200) > 0.3
    want = np.asarray(N.nms_mask(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid)))
    got = np.asarray(nms_mask_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid),
        interpret=True))
    np.testing.assert_array_equal(got, want)
    # resurrection chain
    chain = np.array([[0, 0, 10, 10], [4, 0, 14, 10], [8, 0, 18, 10]], np.float32)
    cs = np.array([0.9, 0.8, 0.7], np.float32)
    keep = np.asarray(nms_mask_pallas(
        jnp.asarray(chain), jnp.asarray(cs), 0.3, interpret=True))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_pallas_nms_batched(rng):
    b, n = 3, 200
    boxes = np.stack([rand_boxes(rng, n, size=40.0) for _ in range(b)])
    scores = rng.standard_normal((b, n)).astype(np.float32)
    valid = rng.uniform(size=(b, n)) > 0.2
    from tpuseg.ops.pallas.nms_pl import nms_mask_pallas_batched

    got = np.asarray(nms_mask_pallas_batched(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid),
        interpret=True))
    for i in range(b):
        want = np.asarray(N.nms_mask(
            jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.5,
            jnp.asarray(valid[i])))
        np.testing.assert_array_equal(got[i], want, err_msg=f"b={i}")


def test_pallas_nms_to_remove_matches_reference(rng):
    import jax.numpy as jnp

    from tpuseg.ops.nms import nms_mask_reference
    from tpuseg.ops.pallas.nms_pl import nms_mask_pallas_batched

    n = 256
    b = rng.uniform(0, 50, (2, n, 2)).astype(np.float32)
    wh = rng.uniform(1, 20, (2, n, 2)).astype(np.float32)
    bx = jnp.asarray(np.concatenate([b, b + wh], -1))
    sc = jnp.asarray(rng.uniform(size=(2, n)).astype(np.float32))
    got = np.asarray(nms_mask_pallas_batched(
        bx, sc, 0.5, interpret=True, to_remove=1.0))
    for i in range(2):
        want = np.asarray(nms_mask_reference(bx[i], sc[i], 0.5, to_remove=1.0))
        np.testing.assert_array_equal(got[i], want)
