"""Model tests: shapes, decode geometry, NMS, losses, tiny overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stereo_vision_tpu.models import (
    YOLOv8,
    PoseNet,
    anchor_points,
    decode_predictions,
    detection_loss,
    pose_loss,
    nms,
    landmarks_to_pixels,
    NUM_LANDMARKS,
    REG_MAX,
)

IMG = 128  # tiny, divisible by 32


@pytest.fixture(scope="module")
def yolo_setup():
    model = YOLOv8(num_classes=4, variant="n")
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    variables = model.init(rng, x, train=False)
    return model, variables


class TestYOLOv8:
    def test_raw_map_shapes(self, yolo_setup):
        model, variables = yolo_setup
        x = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
        outs = model.apply(variables, x, train=False)
        assert len(outs) == 3
        for o, s in zip(outs, (8, 16, 32)):
            assert o.shape == (2, IMG // s, IMG // s, 4 * REG_MAX + 4)

    def test_anchor_points_cover_image(self):
        pts, strides = anchor_points((IMG, IMG))
        n = (IMG // 8) ** 2 + (IMG // 16) ** 2 + (IMG // 32) ** 2
        assert pts.shape == (n, 2) and strides.shape == (n,)
        px = np.asarray(pts[:, 0] * strides)
        assert px.min() > 0 and px.max() < IMG

    def test_decode_shapes(self, yolo_setup):
        model, variables = yolo_setup
        x = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
        outs = model.apply(variables, x, train=False)
        boxes, probs = decode_predictions(outs, (IMG, IMG), 4)
        n = (IMG // 8) ** 2 + (IMG // 16) ** 2 + (IMG // 32) ** 2
        assert boxes.shape == (2, n, 4)
        assert probs.shape == (2, n, 4)
        assert bool(jnp.all(probs >= 0) & jnp.all(probs <= 1))

    def test_nms_suppresses_overlaps(self):
        boxes = jnp.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
        )
        scores = jnp.array([0.9, 0.8, 0.7])
        classes = jnp.zeros(3, jnp.int32)
        det = nms(boxes, scores, classes, iou_threshold=0.5, score_threshold=0.1, max_det=3)
        kept = np.asarray(det.valid)
        assert kept.sum() == 2  # second box suppressed

    def test_nms_class_aware(self):
        boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
        scores = jnp.array([0.9, 0.8])
        classes = jnp.array([0, 1], jnp.int32)
        det = nms(boxes, scores, classes, iou_threshold=0.5, score_threshold=0.1, max_det=2)
        assert np.asarray(det.valid).sum() == 2  # different classes both kept

    def test_loss_finite_and_decreases(self, yolo_setup):
        model, variables = yolo_setup
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, IMG, IMG, 3))
        gt_boxes = jnp.array([[[30.0, 30.0, 80.0, 90.0]]])
        gt_cls = jnp.array([[2]], jnp.int32)
        gt_valid = jnp.array([[True]])

        def loss_fn(params):
            outs = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x,
                train=False,
            )
            return detection_loss(outs, gt_boxes, gt_cls, gt_valid, (IMG, IMG), 4)

        params = variables["params"]
        l0 = float(loss_fn(params))
        assert np.isfinite(l0)
        tx = optax.adam(1e-3)
        state = tx.init(params)

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss_fn)(p)
            u, s = tx.update(g, s)
            return optax.apply_updates(p, u), s, l

        best = l0
        for _ in range(15):
            params, state, l = step(params, state)
            best = min(best, float(l))
        assert best < l0


class TestPoseNet:
    def test_output_shape_and_ranges(self):
        model = PoseNet(width=16)
        x = jnp.zeros((2, 128, 128, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, NUM_LANDMARKS, 4)
        xy = np.asarray(out[..., :2])
        vis = np.asarray(out[..., 3])
        assert (xy >= 0).all() and (xy <= 1).all()
        assert (vis >= 0).all() and (vis <= 1).all()

    def test_stereo_batching_one_graph(self):
        # left+right in a single [2B, H, W, 3] forward — the jit graph the
        # reference's per-camera MediaPipe loop becomes.
        model = PoseNet(width=16)
        left = jax.random.uniform(jax.random.PRNGKey(1), (3, 128, 128, 3))
        right = jax.random.uniform(jax.random.PRNGKey(2), (3, 128, 128, 3))
        x = jnp.concatenate([left, right], axis=0)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x)
        assert out.shape == (6, NUM_LANDMARKS, 4)

    def test_pose_loss_trains(self):
        model = PoseNet(width=16)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3))
        gt = jnp.concatenate(
            [
                jax.random.uniform(jax.random.PRNGKey(2), (2, NUM_LANDMARKS, 3)),
                jnp.ones((2, NUM_LANDMARKS, 1)),
            ],
            axis=-1,
        )
        variables = model.init(jax.random.PRNGKey(0), x, train=False)

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x,
                train=False,
            )
            return pose_loss(out, gt)

        params = variables["params"]
        l0 = float(loss_fn(params))
        tx = optax.adam(1e-3)
        state = tx.init(params)

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss_fn)(p)
            u, s = tx.update(g, s)
            return optax.apply_updates(p, u), s, l

        best = l0
        for _ in range(15):
            params, state, l = step(params, state)
            best = min(best, float(l))
        assert best < l0

    def test_landmarks_to_pixels(self):
        lm = jnp.full((1, NUM_LANDMARKS, 4), 0.5)
        px = np.asarray(landmarks_to_pixels(lm, 1920, 1080))
        assert abs(px[0, 0, 0] - 960) < 1e-5
        assert abs(px[0, 0, 1] - 540) < 1e-5
        assert abs(px[0, 0, 3] - 0.5) < 1e-5


class TestShardedTraining:
    def test_dp_tp_train_step(self, cpu_mesh):
        import optax
        from stereo_vision_tpu.models.train import make_train_step, shard_variables
        from stereo_vision_tpu.models.pose import PoseNet, pose_loss
        from stereo_vision_tpu.parallel.mesh import SPACE_AXIS

        model = PoseNet(width=16)
        B, HW = 8, 64
        x = jnp.zeros((B, HW, HW, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)

        # tp placement picks up wide Dense kernels
        _, shardings = shard_variables(cpu_mesh, variables["params"])
        import jax.tree_util as jtu
        specs = [s.spec for s in jtu.tree_leaves(shardings, is_leaf=lambda l: hasattr(l, "spec"))]
        assert any(SPACE_AXIS in str(sp) for sp in specs), "no tensor-parallel kernels found"

        init_state, step = make_train_step(
            cpu_mesh,
            lambda v, inp: model.apply(v, inp, train=False),
            lambda out, tgt: pose_loss(out, tgt),
            optax.adam(1e-3),
        )
        state = init_state(variables)
        gt = jnp.concatenate(
            [jnp.full((B, 33, 3), 0.5), jnp.ones((B, 33, 1))], axis=-1
        )
        xb = np.random.default_rng(0).random((B, HW, HW, 3), np.float32)
        state, l0 = step(state, xb, np.asarray(gt))
        state, l1 = step(state, xb, np.asarray(gt))
        assert np.isfinite(float(l0)) and np.isfinite(float(l1))
        assert int(state.step) == 2
