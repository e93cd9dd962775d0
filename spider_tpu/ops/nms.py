"""Non-maximum suppression — XLA sort-based, static shapes (the TPU-native
replacement for mmcv's CUDA batched_nms; SURVEY.md §2.2)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a [N,4], b [M,4] xyxy -> IoU [N,M]."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float = 0.5,
        max_outputs: int = 100) -> jnp.ndarray:
    """Greedy NMS with static output count. Returns indices into `boxes`
    ([max_outputs], padded with -1)."""
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    iou = box_iou(boxes_sorted, boxes_sorted)
    n = boxes.shape[0]

    def body(i, keep):
        # suppressed if a higher-ranked KEPT box overlaps too much
        sup = jnp.any((iou[i] > iou_threshold) & keep.astype(bool)
                      & (jnp.arange(n) < i))
        return keep.at[i].set(jnp.where(sup, 0, 1))

    keep = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), jnp.int32))
    kept_scores = jnp.where(keep.astype(bool), scores[order], -jnp.inf)
    top = jnp.argsort(-kept_scores)[:max_outputs]
    valid = kept_scores[top] > -jnp.inf
    return jnp.where(valid, order[top], -1)


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                class_ids: jnp.ndarray, iou_threshold: float = 0.5,
                max_outputs: int = 100) -> jnp.ndarray:
    """Class-aware NMS via the coordinate-offset trick (mmcv batched_nms)."""
    offset = class_ids.astype(boxes.dtype)[:, None] * (
        jnp.max(boxes) - jnp.min(boxes) + 1.0)
    return nms(boxes + offset, scores, iou_threshold, max_outputs)
