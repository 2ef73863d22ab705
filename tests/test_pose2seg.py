import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuseg.models import pose2seg as P2S


def test_solve_similarity_recovers_transform(rng):
    src = rng.uniform(0, 100, (17, 2))
    ang = 0.4
    s = 1.7
    R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    t = np.array([12.0, -5.0])
    dst = s * (src @ R.T) + t
    valid = np.ones(17, bool)
    valid[3:6] = False
    A, res = P2S.solve_similarity(src, dst, valid)
    assert res < 1e-6
    got = src @ A[:, :2].T + A[:, 2]
    np.testing.assert_allclose(got, dst, atol=1e-6)


def test_solve_similarity_degenerate():
    src = np.zeros((17, 2))
    A, res = P2S.solve_similarity(src, src, np.ones(17, bool))
    assert A is None and res == np.inf
    A, res = P2S.solve_similarity(src, src, np.zeros(17, bool))
    assert A is None


def test_best_template_selects_exact_match(rng):
    cfg = P2S.Pose2SegConfig()
    tpl = P2S.templates()[1]  # upper body
    # keypoints = template mapped into pixel space by a known similarity
    kp = np.zeros((17, 3))
    kp[:, :2] = tpl * 200 + np.array([50, 80])
    kp[:, 2] = 2
    A, res = P2S.best_template_affine(kp, cfg)
    assert res < 1e-6
    # A maps pixels back to unit frame
    got = kp[:, :2] @ A[:, :2].T + A[:, 2]
    np.testing.assert_allclose(got, tpl, atol=1e-6)


def test_theta_roundtrip_paste(rng):
    """Align a known rectangle region, paste it back: overlap must be high."""
    from tpuseg.ops.sampling import affine_align, affine_grid, grid_sample

    cfg = P2S.Pose2SegConfig(input_size=128, align_size=32)
    s = 128
    # identity-ish affine: map pixel box [32, 96) to unit frame
    A = np.array([[1 / 64.0, 0, -0.5], [0, 1 / 64.0, -0.5]])
    theta = P2S.affine_to_theta(A, s, s)
    inv = P2S.inverse_theta(A, s, s)
    img = np.zeros((1, s, s, 1), np.float32)
    img[0, 40:90, 35:80, 0] = 1.0
    aligned = affine_align(jnp.asarray(img), jnp.asarray(theta)[None, None],
                           cfg.align_size)  # [1,1,32,32,1]
    grid = affine_grid(jnp.asarray(inv)[None], s, s)
    pasted = np.asarray(grid_sample(
        np.asarray(aligned)[0], grid))[0, :, :, 0]
    inter = ((pasted > 0.5) & (img[0, :, :, 0] > 0.5)).sum()
    union = ((pasted > 0.5) | (img[0, :, :, 0] > 0.5)).sum()
    assert inter / union > 0.93  # bilinear roundtrip through 32px crop


def test_forward_shapes():
    cfg = P2S.Pose2SegConfig(input_size=64, align_size=16, max_people=4,
                             seg_blocks=2, paste_size=64)
    params = P2S.init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.zeros((1, 64, 64, 3))
    theta = jnp.zeros((1, 4, 2, 3))
    theta = theta.at[:, :, 0, 0].set(0.5).at[:, :, 1, 1].set(0.5)
    valid = jnp.asarray([[True, True, False, False]])
    out = jax.jit(lambda p, im, t, it, v: P2S.forward(p, im, t, it, v, cfg))(
        params, images, theta, theta, valid)
    assert out["masks"].shape == (1, 4, 64, 64)
    assert out["aligned_logits"].shape == (1, 4, 16, 16, 2)
    m = np.asarray(out["masks"])
    assert np.all(m[0, 2:] == 0)  # invalid people masked out


def test_predictor_end_to_end(rng):
    from tpuseg.engine.pose2seg_engine import Pose2SegPredictor

    cfg = P2S.Pose2SegConfig(input_size=64, align_size=16, max_people=4,
                             seg_blocks=2, paste_size=32)
    pred = Pose2SegPredictor(cfg)
    img = rng.integers(0, 255, (100, 80, 3)).astype(np.uint8)
    tpl = P2S.templates()[0]
    kp = np.zeros((2, 17, 3))
    kp[0, :, :2] = tpl * 60 + [10, 20]
    kp[0, :, 2] = 2
    kp[1, :, :2] = tpl * 40 + [30, 10]
    kp[1, :, 2] = 2
    out = pred.run_on_image(img, kp)
    assert out["masks"].shape == (2, 100, 80)
    assert out["valid"].all()
