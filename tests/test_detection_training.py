"""Detector training: anchor matching/encoding round trips, balanced sampling
shape-stability, and a full train step that reduces the loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from construction_clip_tpu.models.detection import init_fasterrcnn, level_anchors
from construction_clip_tpu.train.detection import (
    encode_boxes, match_anchors, sample_balanced, smooth_l1,
    DetectionBatch, detection_loss, make_detection_train_step)
from construction_clip_tpu.train.state import TrainState


def test_box_encode_decode_roundtrip(rng):
    from construction_clip_tpu.models.detection import decode_boxes

    anchors = jnp.asarray([[10, 10, 50, 60], [0, 0, 32, 32]], jnp.float32)
    gt = jnp.asarray([[12, 8, 55, 70], [4, 2, 30, 28]], jnp.float32)
    deltas = encode_boxes(gt, anchors)
    back = decode_boxes(deltas, anchors)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), rtol=1e-5, atol=1e-4)


def test_match_anchors():
    anchors = jnp.asarray([[0, 0, 10, 10], [100, 100, 120, 120], [0, 0, 9, 11],
                           [40, 40, 60, 60]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10], [41, 41, 59, 59]], jnp.float32)
    valid = jnp.asarray([True, True])
    idx, labels = match_anchors(anchors, gt, valid, fg_thresh=0.7, bg_thresh=0.3)
    l = np.asarray(labels)
    assert l[0] == 1          # exact match -> fg
    assert l[1] == 0          # far away -> bg
    assert l[3] == 1          # best anchor for gt 1 rescued to fg
    assert int(idx[0]) == 0 and int(idx[3]) == 1
    # padding gt is never matched
    idx2, labels2 = match_anchors(anchors, gt, jnp.asarray([True, False]),
                                  fg_thresh=0.7, bg_thresh=0.3)
    assert np.asarray(labels2)[3] == 0  # gt 1 invalid -> anchor 3 becomes bg


def test_sample_balanced_static_shapes(rng):
    labels = jnp.asarray(rng.choice([-1, 0, 1], size=200, p=[0.2, 0.7, 0.1]))
    fg_idx, fg_take, bg_idx, bg_take = sample_balanced(
        labels, jax.random.key(0), num=64, fg_fraction=0.5)
    assert fg_idx.shape == (32,) and bg_idx.shape == (32,)
    assert (np.asarray(labels)[np.asarray(fg_idx)][np.asarray(fg_take)] == 1).all()
    assert (np.asarray(labels)[np.asarray(bg_idx)][np.asarray(bg_take)] == 0).all()


def test_smooth_l1():
    x = jnp.asarray([0.0, 0.05, 1.0])
    out = np.asarray(smooth_l1(x, beta=1 / 9))
    assert out[0] == 0
    assert out[2] == pytest.approx(1.0 - 0.5 / 9)


def test_train_step_reduces_loss(rng):
    S = 64
    params = init_fasterrcnn(jax.random.key(0), num_classes=4)
    imgs = jnp.asarray(rng.random((2, S, S, 3)).astype(np.float32))
    gt_boxes = jnp.asarray([[[8, 8, 40, 40], [20, 30, 50, 60]],
                            [[5, 5, 30, 25], [0, 0, 0, 0]]], jnp.float32)
    gt_labels = jnp.asarray([[1, 2], [3, 0]], jnp.int32)
    batch = DetectionBatch(images=imgs, gt_boxes=gt_boxes, gt_labels=gt_labels)

    # random-init R-CNN needs clipping: the RPN log-ratio regression targets are
    # large until the head calms down
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    step = make_detection_train_step(tx, image_size=S, num_classes=4)
    state = TrainState.create(params, tx)
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses


def test_dp_matches_single_device():
    """8-way DP detection step == single device (loss and updated params)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS, MODEL_AXIS
    from construction_clip_tpu.models.detection import init_fasterrcnn
    from construction_clip_tpu.train.detection import (DetectionBatch,
                                                       make_detection_train_step)
    from construction_clip_tpu.train.state import TrainState, make_adamw

    B, S = 8, 64
    rng = np.random.default_rng(0)
    batch = DetectionBatch(
        images=jnp.asarray(rng.random((B, S, S, 3)).astype(np.float32)),
        gt_boxes=jnp.asarray(
            np.tile(np.array([[4.0, 4.0, 30.0, 30.0]], np.float32), (B, 2, 1))),
        gt_labels=jnp.ones((B, 2), jnp.int32),
    )
    tx = make_adamw(1e-4, warmup_steps=0, total_steps=10)
    key = jax.random.key(3)

    params = init_fasterrcnn(jax.random.key(0), num_classes=4)
    single = make_detection_train_step(tx, image_size=S, num_classes=4)
    s1, m1 = single(TrainState.create(params, tx), batch, key)

    mesh = create_mesh({DATA_AXIS: 8, MODEL_AXIS: 1})
    params = init_fasterrcnn(jax.random.key(0), num_classes=4)
    dp = make_detection_train_step(tx, image_size=S, num_classes=4, mesh=mesh)
    s8, m8 = dp(TrainState.create(params, tx), batch, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5, atol=1e-6)
    # pmean vs single-device batch-mean reduce in different orders; AdamW's
    # grad/sqrt(v) amplifies the fp noise on near-zero grads -> loose atol
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=5e-4)
