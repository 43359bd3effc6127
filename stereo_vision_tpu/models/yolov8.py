"""YOLOv8-class anchor-free detector in flax.

TPU-native replacement for the reference's ultralytics dependency
(reference: ball_drop.py:89-160 + :817-823, ball_motion.py, single_cam_drop.py
all call ``YOLO(model)(image)``). Architecture follows the public YOLOv8
design: CSP backbone with C2f blocks + SPPF, PAN neck, decoupled
anchor-free head with DFL box regression (reg_max=16) over strides
8/16/32.

TPU-first choices:
- NHWC layout, bf16-ready; all convs land on the MXU.
- Left+right camera frames run as one batched ``[2B, H, W, 3]`` jit graph
  (the BASELINE.json config #4 requirement) — there is no per-image call.
- Decode (DFL expectation + ltrb->xyxy) and NMS are jit-compatible with
  static max-detection counts; no data-dependent shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stereo_vision_tpu.models.layers import C2f, ConvBnSiLU, SPPF, upsample2x, make_divisible

# depth/width multipliers per variant (public YOLOv8 scaling table).
VARIANTS = {
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
    "m": (2 / 3, 0.75, 768),
    "l": (1.0, 1.00, 512),
    "x": (1.0, 1.25, 512),
}

STRIDES = (8, 16, 32)
REG_MAX = 16


class YOLOv8(nn.Module):
    """Backbone + PAN neck + decoupled head.

    Returns per-scale raw maps: list of (B, Hs, Ws, 4*REG_MAX + num_classes).
    """

    num_classes: int = 80
    variant: str = "m"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        d, w, maxc = VARIANTS[self.variant]
        ch = [make_divisible(min(c, maxc) * w) for c in (64, 128, 256, 512, 1024)]
        n1 = max(round(3 * d), 1)
        n2 = max(round(6 * d), 1)

        # Backbone
        x = ConvBnSiLU(ch[0], 3, 2)(x, train)          # P1
        x = ConvBnSiLU(ch[1], 3, 2)(x, train)          # P2
        x = C2f(ch[1], n1)(x, train)
        x = ConvBnSiLU(ch[2], 3, 2)(x, train)          # P3
        p3 = C2f(ch[2], n2)(x, train)
        x = ConvBnSiLU(ch[3], 3, 2)(p3, train)         # P4
        p4 = C2f(ch[3], n2)(x, train)
        x = ConvBnSiLU(ch[4], 3, 2)(p4, train)         # P5
        x = C2f(ch[4], n1)(x, train)
        p5 = SPPF(ch[4])(x, train)

        # PAN neck
        u4 = jnp.concatenate([upsample2x(p5), p4], axis=-1)
        t4 = C2f(ch[3], n1, shortcut=False)(u4, train)
        u3 = jnp.concatenate([upsample2x(t4), p3], axis=-1)
        o3 = C2f(ch[2], n1, shortcut=False)(u3, train)
        d4 = jnp.concatenate([ConvBnSiLU(ch[2], 3, 2)(o3, train), t4], axis=-1)
        o4 = C2f(ch[3], n1, shortcut=False)(d4, train)
        d5 = jnp.concatenate([ConvBnSiLU(ch[3], 3, 2)(o4, train), p5], axis=-1)
        o5 = C2f(ch[4], n1, shortcut=False)(d5, train)

        # Decoupled head per scale
        outs = []
        c_reg = max(16, ch[2] // 4, 4 * REG_MAX)
        c_cls = max(ch[2], min(self.num_classes, 100))
        for feat in (o3, o4, o5):
            b = ConvBnSiLU(c_reg, 3)(feat, train)
            b = ConvBnSiLU(c_reg, 3)(b, train)
            b = nn.Conv(4 * REG_MAX, (1, 1), dtype=feat.dtype)(b)
            c = ConvBnSiLU(c_cls, 3)(feat, train)
            c = ConvBnSiLU(c_cls, 3)(c, train)
            c = nn.Conv(self.num_classes, (1, 1), dtype=feat.dtype)(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs


def anchor_points(img_hw: tuple[int, int], strides: Sequence[int] = STRIDES):
    """Concatenated (N, 2) cell-center points and (N,) stride vector."""
    pts, svec = [], []
    H, W = img_hw
    for s in strides:
        hs, ws = H // s, W // s
        ys = (jnp.arange(hs, dtype=jnp.float32) + 0.5)
        xs = (jnp.arange(ws, dtype=jnp.float32) + 0.5)
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)
        pts.append(grid)
        svec.append(jnp.full(hs * ws, s, jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(svec)


def dfl_expectation(box_logits: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, REG_MAX) logits -> (..., 4) expected ltrb distances."""
    p = jax.nn.softmax(box_logits, axis=-1)
    bins = jnp.arange(REG_MAX, dtype=p.dtype)
    return jnp.sum(p * bins, axis=-1)


def decode_predictions(raw_maps, img_hw: tuple[int, int], num_classes: int):
    """Raw per-scale maps -> ((B, N, 4) xyxy boxes px, (B, N, C) cls probs)."""
    B = raw_maps[0].shape[0]
    flat = []
    for m in raw_maps:
        flat.append(m.reshape(B, -1, m.shape[-1]))
    x = jnp.concatenate(flat, axis=1)  # (B, N, 4*REG_MAX + C)
    box_logits = x[..., : 4 * REG_MAX].reshape(B, -1, 4, REG_MAX)
    cls_logits = x[..., 4 * REG_MAX :]
    ltrb = dfl_expectation(box_logits)  # (B, N, 4) in stride units
    pts, strides = anchor_points(img_hw)
    x1y1 = (pts[None] - ltrb[..., :2]) * strides[None, :, None]
    x2y2 = (pts[None] + ltrb[..., 2:]) * strides[None, :, None]
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    return boxes, jax.nn.sigmoid(cls_logits)


class Detections(NamedTuple):
    boxes: jnp.ndarray    # (B, K, 4) xyxy
    scores: jnp.ndarray   # (B, K)
    classes: jnp.ndarray  # (B, K) int32
    valid: jnp.ndarray    # (B, K) bool


def _iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(K, 4) x (K, 4) -> (K, K) IoU."""
    area = lambda t: jnp.maximum(t[:, 2] - t[:, 0], 0) * jnp.maximum(t[:, 3] - t[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a)[:, None] + area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("max_det",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.25,
    max_det: int = 100,
) -> Detections:
    """Class-aware greedy NMS with static shapes (single image).

    Args:
      boxes: (N, 4), scores: (N,), classes: (N,) int.
    """
    k = min(max_det, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[idx]
    top_cls = classes[idx]
    # Offset boxes by class so cross-class overlaps never suppress.
    off = top_cls.astype(boxes.dtype)[:, None] * 1e5
    iou = _iou_matrix(top_boxes + off, top_boxes + off)

    def body(i, keep):
        sup = (iou[i] > iou_threshold) & keep[i] & (jnp.arange(k) > i)
        return keep & ~sup

    keep = jax.lax.fori_loop(0, k, body, jnp.ones(k, bool))
    keep = keep & (top_scores > score_threshold)
    return Detections(top_boxes, top_scores, top_cls, keep)


def detect(
    model: YOLOv8,
    variables,
    images: jnp.ndarray,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.25,
    max_det: int = 100,
) -> Detections:
    """Batched end-to-end inference: images (B, H, W, 3) in [0, 1]."""
    raw = model.apply(variables, images, train=False)
    boxes, probs = decode_predictions(raw, images.shape[1:3], model.num_classes)
    scores = probs.max(-1)
    classes = probs.argmax(-1).astype(jnp.int32)
    return jax.vmap(
        lambda b, s, c: nms(b, s, c, iou_threshold, score_threshold, max_det)
    )(boxes, scores, classes)


# ---------------------------------------------------------------------------
# Training loss (simplified TAL: center-prior assignment + CIoU + BCE + DFL)
# ---------------------------------------------------------------------------


def _ciou(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Complete IoU between (..., 4) xyxy boxes."""
    px1, py1, px2, py2 = pred[..., 0], pred[..., 1], pred[..., 2], pred[..., 3]
    gx1, gy1, gx2, gy2 = gt[..., 0], gt[..., 1], gt[..., 2], gt[..., 3]
    iw = jnp.maximum(jnp.minimum(px2, gx2) - jnp.maximum(px1, gx1), 0)
    ih = jnp.maximum(jnp.minimum(py2, gy2) - jnp.maximum(py1, gy1), 0)
    inter = iw * ih
    pa = jnp.maximum(px2 - px1, 0) * jnp.maximum(py2 - py1, 0)
    ga = jnp.maximum(gx2 - gx1, 0) * jnp.maximum(gy2 - gy1, 0)
    union = pa + ga - inter
    iou = inter / jnp.maximum(union, 1e-9)
    # center distance / enclosing diagonal
    pcx, pcy = (px1 + px2) / 2, (py1 + py2) / 2
    gcx, gcy = (gx1 + gx2) / 2, (gy1 + gy2) / 2
    rho2 = (pcx - gcx) ** 2 + (pcy - gcy) ** 2
    cw = jnp.maximum(px2, gx2) - jnp.minimum(px1, gx1)
    chh = jnp.maximum(py2, gy2) - jnp.minimum(py1, gy1)
    c2 = cw**2 + chh**2
    # aspect term
    pw, ph = jnp.maximum(px2 - px1, 1e-9), jnp.maximum(py2 - py1, 1e-9)
    gw, gh = jnp.maximum(gx2 - gx1, 1e-9), jnp.maximum(gy2 - gy1, 1e-9)
    v = (4 / jnp.pi**2) * (jnp.arctan(gw / gh) - jnp.arctan(pw / ph)) ** 2
    alpha = v / jnp.maximum(1 - iou + v, 1e-9)
    return iou - rho2 / jnp.maximum(c2, 1e-9) - alpha * v


def detection_loss(
    raw_maps,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    img_hw: tuple[int, int],
    num_classes: int,
):
    """YOLOv8-style loss with center-inside assignment.

    Args:
      raw_maps: model outputs.
      gt_boxes: (B, M, 4) xyxy pixels; gt_classes: (B, M) int;
      gt_valid: (B, M) bool.

    Returns scalar loss (cls BCE + 7.5*CIoU + 1.5*DFL, YOLOv8 gains).
    """
    B = raw_maps[0].shape[0]
    flat = [m.reshape(B, -1, m.shape[-1]) for m in raw_maps]
    x = jnp.concatenate(flat, axis=1)
    box_logits = x[..., : 4 * REG_MAX].reshape(B, -1, 4, REG_MAX)
    cls_logits = x[..., 4 * REG_MAX :]
    ltrb = dfl_expectation(box_logits)
    pts, strides = anchor_points(img_hw)
    pred_boxes = jnp.concatenate(
        [
            (pts[None] - ltrb[..., :2]) * strides[None, :, None],
            (pts[None] + ltrb[..., 2:]) * strides[None, :, None],
        ],
        axis=-1,
    )  # (B, N, 4)

    px = pts[:, 0] * strides
    py = pts[:, 1] * strides

    def per_image(pb, cl, bl, gtb, gtc, gtv):
        # (N, M) anchor-center-inside-gt mask
        inside = (
            (px[:, None] >= gtb[None, :, 0])
            & (px[:, None] <= gtb[None, :, 2])
            & (py[:, None] >= gtb[None, :, 1])
            & (py[:, None] <= gtb[None, :, 3])
            & gtv[None, :]
        )
        iou = jax.vmap(lambda g: _ciou(pb, g[None].repeat(pb.shape[0], 0)))(gtb).T  # (N, M)
        score = jnp.where(inside, iou, -1.0)
        best_gt = jnp.argmax(score, axis=1)            # (N,)
        pos = jnp.max(score, axis=1) > 0.0             # assigned anchors
        tgt_box = gtb[best_gt]
        tgt_cls = gtc[best_gt]

        # classification BCE with soft IoU targets
        cls_t = jax.nn.one_hot(tgt_cls, num_classes) * jnp.maximum(
            jnp.max(score, axis=1), 0.0
        )[:, None]
        cls_t = jnp.where(pos[:, None], cls_t, 0.0)
        bce = jnp.mean(
            jnp.sum(
                jnp.maximum(cl, 0) - cl * cls_t + jnp.log1p(jnp.exp(-jnp.abs(cl))),
                axis=-1,
            )
        )

        npos = jnp.maximum(jnp.sum(pos), 1)
        ciou_loss = jnp.sum(jnp.where(pos, 1.0 - _ciou(pb, tgt_box), 0.0)) / npos

        # DFL: distances of the target box in stride units
        t_ltrb = jnp.stack(
            [
                px - tgt_box[:, 0],
                py - tgt_box[:, 1],
                tgt_box[:, 2] - px,
                tgt_box[:, 3] - py,
            ],
            axis=-1,
        ) / strides[:, None]
        t_ltrb = jnp.clip(t_ltrb, 0, REG_MAX - 1 - 1e-3)
        tl = jnp.floor(t_ltrb)
        wr = t_ltrb - tl
        tl_i = tl.astype(jnp.int32)
        logp = jax.nn.log_softmax(bl, axis=-1)
        gather = lambda i: jnp.take_along_axis(logp, i[..., None], axis=-1)[..., 0]
        dfl = -(gather(tl_i) * (1 - wr) + gather(jnp.minimum(tl_i + 1, REG_MAX - 1)) * wr)
        dfl_loss = jnp.sum(jnp.where(pos[:, None], dfl, 0.0)) / (npos * 4)
        return bce + 7.5 * ciou_loss + 1.5 * dfl_loss

    losses = jax.vmap(per_image)(
        pred_boxes, cls_logits, box_logits, gt_boxes, gt_classes, gt_valid
    )
    return jnp.mean(losses)
