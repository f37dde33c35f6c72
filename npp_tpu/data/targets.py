"""Target generation: Gaussian pose heatmaps, parsing maps, edge maps.

TPU-native re-design of reference ``dataset/target_generation.py``:
- ``gen_pose_target`` (target_generation.py:94-121) with its per-pixel
  Python double loop (``gen_single_gaussian_map``:145-168) becomes a fully
  vectorized broadcasted ``exp(-d^2 / 2 sigma^2)`` — available both as a
  numpy host function (bit-matching the reference's truncation at exponent
  4.6052) and as a jit-able on-device function for the training input
  pipeline;
- ``generate_edge`` (target_generation.py:210-239): 4-direction label
  difference + rect-kernel dilation, expressed with shifted compares and a
  max-pool dilation;
- ``gen_parsing_target`` (target_generation.py:25-60): the affine warp chain
  for label maps (host-side, cv2-based, nearest interpolation).
"""
from __future__ import annotations

import functools

import cv2
import jax
import jax.numpy as jnp
import numpy as np

_TRUNC = 4.6052  # exponent cutoff (target_generation.py:151,163)


def _gaussian_grid(joints: np.ndarray, visibility: np.ndarray, stride: int,
                   grid_x: int, grid_y: int, sigma: float) -> np.ndarray:
    """Vectorized gaussian maps, (J, grid_y, grid_x)."""
    start = stride / 2.0 - 0.5
    xs = start + np.arange(grid_x, dtype=np.float64) * stride
    ys = start + np.arange(grid_y, dtype=np.float64) * stride
    dx2 = (xs[None, None, :] - joints[:, 0, None, None]) ** 2
    dy2 = (ys[None, :, None] - joints[:, 1, None, None]) ** 2
    exponent = (dx2 + dy2) / (2.0 * sigma * sigma)
    maps = np.where(exponent > _TRUNC, 0.0, np.exp(-exponent))
    maps = np.minimum(maps, 1.0)
    maps *= visibility[:, None, None].astype(np.float64)
    return maps


def gen_pose_target(joints: np.ndarray, visibility: np.ndarray,
                    stride: int = 8, grid_x: int = 46, grid_y: int = 46,
                    sigma: float = 7, aux: bool = False):
    """Reference ``gen_pose_target`` (target_generation.py:94-121).

    Returns (J+1, grid_y, grid_x) float32 maps: per-joint gaussians plus a
    background channel ``1 - max``. With ``aux=True`` also returns the
    2*sigma variant used by the aux pose head.
    """
    j = joints.shape[0]
    maps = np.zeros((j + 1, grid_y, grid_x), np.float32)
    maps[:j] = _gaussian_grid(joints, visibility, stride, grid_x, grid_y,
                              sigma)
    maps[j] = 1.0 - maps[:j].max(axis=0)
    if not aux:
        return maps, None
    aux_maps = np.zeros((j + 1, grid_y, grid_x), np.float32)
    aux_maps[:j] = _gaussian_grid(joints, visibility, stride, grid_x, grid_y,
                                  2 * sigma)
    aux_maps[j] = 1.0 - aux_maps[:j].max(axis=0)
    return maps, aux_maps


@functools.partial(jax.jit, static_argnames=("stride", "grid_x", "grid_y",
                                             "sigma", "aux"))
def gen_pose_target_device(joints: jnp.ndarray, visibility: jnp.ndarray,
                           stride: int = 4, grid_x: int = 96,
                           grid_y: int = 96, sigma: float = 3,
                           aux: bool = True):
    """On-device, batched heatmap rendering for the train input pipeline.

    ``joints``: (B, J, 2) xy in input-crop pixels; ``visibility``: (B, J).
    Returns NHWC maps (B, grid_y, grid_x, J+1) (+ aux) — one fused XLA
    kernel replacing the reference's Python pixel loops
    (target_generation.py:157-167).
    """
    start = stride / 2.0 - 0.5
    xs = start + jnp.arange(grid_x, dtype=jnp.float32) * stride
    ys = start + jnp.arange(grid_y, dtype=jnp.float32) * stride

    def render(sig):
        dx2 = (xs[None, None, None, :] - joints[:, :, 0, None, None]) ** 2
        dy2 = (ys[None, None, :, None] - joints[:, :, 1, None, None]) ** 2
        expo = (dx2 + dy2) / (2.0 * sig * sig)
        m = jnp.where(expo > _TRUNC, 0.0, jnp.exp(-expo))
        m = m * visibility[:, :, None, None]
        bg = 1.0 - m.max(axis=1, keepdims=True)
        m = jnp.concatenate([m, bg], axis=1)  # (B, J+1, H, W)
        return jnp.transpose(m, (0, 2, 3, 1))  # NHWC

    maps = render(float(sigma))
    if not aux:
        return maps, None
    return maps, render(2.0 * float(sigma))


def generate_edge(label: np.ndarray, edge_width: int = 3) -> np.ndarray:
    """Reference ``generate_edge`` (target_generation.py:210-239)."""
    h, w = label.shape
    edge = np.zeros(label.shape)
    edge_right = edge[1:h, :]
    edge_right[(label[1:h, :] != label[: h - 1, :])
               & (label[1:h, :] != 255) & (label[: h - 1, :] != 255)] = 1
    edge_up = edge[:, : w - 1]
    edge_up[(label[:, : w - 1] != label[:, 1:w])
            & (label[:, : w - 1] != 255) & (label[:, 1:w] != 255)] = 1
    edge_upright = edge[: h - 1, : w - 1]
    edge_upright[(label[: h - 1, : w - 1] != label[1:h, 1:w])
                 & (label[: h - 1, : w - 1] != 255)
                 & (label[1:h, 1:w] != 255)] = 1
    edge_bottomright = edge[: h - 1, 1:w]
    edge_bottomright[(label[: h - 1, 1:w] != label[1:h, : w - 1])
                     & (label[: h - 1, 1:w] != 255)
                     & (label[1:h, : w - 1] != 255)] = 1
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT,
                                       (edge_width, edge_width))
    return cv2.dilate(edge, kernel)


@functools.partial(jax.jit, static_argnames=("edge_width", "ignore"))
def generate_edge_device(label: jnp.ndarray, edge_width: int = 3,
                         ignore: int = 255) -> jnp.ndarray:
    """Batched on-device edge extraction, (B, H, W) int labels -> float mask.

    Shifted-compare in 4 directions + max-pool dilation — the TPU
    formulation of target_generation.py:210-239.
    """
    lab = label.astype(jnp.int32)
    valid = lab != ignore

    def diff(a_sl, b_sl, pad):
        a = lab[:, a_sl[0], a_sl[1]]
        b = lab[:, b_sl[0], b_sl[1]]
        va = valid[:, a_sl[0], a_sl[1]]
        vb = valid[:, b_sl[0], b_sl[1]]
        d = ((a != b) & va & vb).astype(jnp.float32)
        return jnp.pad(d, ((0, 0),) + pad)

    sl = slice(None)
    e = diff((slice(1, None), sl), (slice(None, -1), sl), ((1, 0), (0, 0)))
    e = jnp.maximum(e, diff((sl, slice(None, -1)), (sl, slice(1, None)),
                            ((0, 0), (0, 1))))
    e = jnp.maximum(e, diff((slice(None, -1), slice(None, -1)),
                            (slice(1, None), slice(1, None)),
                            ((0, 1), (0, 1))))
    e = jnp.maximum(e, diff((slice(None, -1), slice(1, None)),
                            (slice(1, None), slice(None, -1)),
                            ((0, 1), (1, 0))))
    # Dilation with a rect kernel == max pool with 'same' padding.
    p = edge_width // 2
    e = jax.lax.reduce_window(
        e, 0.0, jax.lax.max, (1, edge_width, edge_width),
        (1, 1, 1), ((0, 0), (p, p), (p, p)))
    return e


def gen_parsing_target(parsing_anno: np.ndarray, scale_param=None,
                       rotate_param=None, crop_param=None, flip_param=None,
                       stride: int = 8,
                       flip_pairs=((15, 14), (17, 16), (19, 18))
                       ) -> np.ndarray:
    """Reference ``gen_parsing_target`` (target_generation.py:25-60).

    Applies the same scale/rotate/crop/flip chain used on the image to the
    label map with nearest interpolation, 255 padding, and left/right class
    swapping on flip. ``flip_pairs=()`` reproduces the Pascal variant
    (target_generation.py:63-92).
    """
    t = parsing_anno.copy()
    if scale_param is not None:
        t = cv2.resize(t, None, fx=scale_param, fy=scale_param,
                       interpolation=cv2.INTER_NEAREST)
    if rotate_param is not None:
        t = cv2.warpAffine(t, rotate_param[0],
                           dsize=(int(rotate_param[1]), int(rotate_param[2])),
                           flags=cv2.INTER_NEAREST,
                           borderMode=cv2.BORDER_CONSTANT, borderValue=(255,))
    if crop_param is not None:
        cp = crop_param[0]
        out = np.zeros((crop_param[1], crop_param[2])) + 255
        out[cp[0, 3]:cp[0, 7], cp[0, 2]:cp[0, 6]] = \
            t[cp[0, 1]:cp[0, 5], cp[0, 0]:cp[0, 4]]
        t = out.astype(np.uint8)
    if flip_param:
        t = cv2.flip(t, 1)
        for right, left in flip_pairs:
            right_pos = t == right
            left_pos = t == left
            t[right_pos] = left
            t[left_pos] = right
    if stride != 1:
        t = cv2.resize(t, None, fx=1.0 / stride, fy=1.0 / stride,
                       interpolation=cv2.INTER_NEAREST)
    return t


# LIP 16-joint limb segments (dataset/data_loader.py:241-246).
LIP_BODY_PARTS = ((1, 0), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7),
                  (1, 14), (14, 15), (15, 8), (8, 9), (9, 10), (15, 11),
                  (11, 12), (12, 13))


def get_paf_by_hm(hm: np.ndarray, vis, body_parts=LIP_BODY_PARTS,
                  sigma_paf: float = 5, variable_width: bool = False
                  ) -> np.ndarray:
    """Part-affinity fields from heatmap argmax keypoints
    (target_generation.py:170-208; the reference's off-by-default
    alternative pose target). ``hm``: (J+1, H, W). Returns
    (2*len(body_parts), H, W)."""
    size = hm.shape[-2:]
    n_parts = len(body_parts)
    out_pafs = np.zeros((n_parts, 2, size[0], size[1]))
    n_person = np.zeros((n_parts, size[0], size[1]))
    keypoints = np.zeros((hm.shape[0] - 1, 2))
    for i in range(hm.shape[0] - 1):
        pos = np.unravel_index(hm[i].argmax(), size)
        keypoints[i] = (pos[1], pos[0])
    x, y = np.meshgrid(np.arange(size[1]), np.arange(size[0]))
    for i, (a, b) in enumerate(body_parts):
        if not (vis[a] and vis[b]):
            continue
        seg = keypoints[b] - keypoints[a]
        length = np.linalg.norm(seg)
        if length <= 1e-2:
            continue
        sigma = sigma_paf * length * 0.025 if variable_width else sigma_paf
        v = seg / length
        v_per = (v[1], -v[0])
        d_along = v[0] * (x - keypoints[a][0]) + v[1] * (y - keypoints[a][1])
        d_perp = np.abs(v_per[0] * (x - keypoints[a][0])
                        + v_per[1] * (y - keypoints[a][1]))
        mask = ((d_along >= 0) & (d_along <= length)
                & (d_perp <= sigma)).astype("float32")
        out_pafs[i, 0] += mask * v[0]
        out_pafs[i, 1] += mask * v[1]
        n_person[i] += mask
    out_pafs = out_pafs / (n_person[:, None] + 1e-8)
    return out_pafs.reshape(n_parts * 2, size[0], size[1])


def gen_pose_target_paf(joints, visibility, body_parts=LIP_BODY_PARTS,
                        stride: int = 8, grid_x: int = 46, grid_y: int = 46,
                        sigma: float = 7, aux: bool = False):
    """``gen_pose_target2`` (target_generation.py:124-143): gaussian maps
    plus PAF fields (+ their sum channel) as the aux target."""
    maps, _ = gen_pose_target(joints, visibility, stride, grid_x, grid_y,
                              sigma, aux=False)
    if not aux:
        return maps, None
    paf = get_paf_by_hm(maps, visibility, body_parts, sigma_paf=2.5)
    paf = np.concatenate([paf, paf.sum(axis=0, keepdims=True)], axis=0)
    return maps, paf
