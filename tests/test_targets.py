"""Target-generation parity: vectorized gaussian/edge vs the reference's
per-pixel algorithms (dataset/target_generation.py)."""
import cv2
import numpy as np

import jax.numpy as jnp

from npp_tpu.data import targets as T


def _reference_single_gaussian(center, stride, grid_x, grid_y, sigma):
    """Golden: the reference's per-pixel double loop
    (target_generation.py:145-168)."""
    gmap = np.zeros((grid_y, grid_x))
    start = stride / 2.0 - 0.5
    max_dist = np.ceil(np.sqrt(4.6052 * sigma * sigma * 2.0))
    sx = int(max(0, np.floor((center[0] - max_dist - start) / stride)))
    ex = int(min(grid_x, np.ceil((center[0] + max_dist - start) / stride)))
    sy = int(max(0, np.floor((center[1] - max_dist - start) / stride)))
    ey = int(min(grid_y, np.ceil((center[1] + max_dist - start) / stride)))
    for gy in range(sy, ey):
        for gx in range(sx, ex):
            x = start + gx * stride
            y = start + gy * stride
            d2 = (x - center[0]) ** 2 + (y - center[1]) ** 2
            expo = d2 / 2.0 / sigma / sigma
            if expo > 4.6052:
                continue
            gmap[gy, gx] += np.exp(-expo)
            gmap[gy, gx] = min(gmap[gy, gx], 1)
    return gmap


def test_gaussian_matches_reference_loop():
    rng = np.random.default_rng(0)
    joints = rng.uniform(-10, 100, (4, 2))
    vis = np.array([True, True, False, True])
    maps, aux = T.gen_pose_target(joints, vis, stride=4, grid_x=24,
                                  grid_y=24, sigma=3, aux=True)
    for j in range(4):
        if vis[j]:
            golden = _reference_single_gaussian(joints[j], 4, 24, 24, 3)
            np.testing.assert_allclose(maps[j], golden, atol=1e-6)
            golden_aux = _reference_single_gaussian(joints[j], 4, 24, 24, 6)
            np.testing.assert_allclose(aux[j], golden_aux, atol=1e-6)
        else:
            assert np.all(maps[j] == 0)
    np.testing.assert_allclose(maps[-1], 1 - maps[:4].max(0), atol=1e-6)


def test_device_gaussian_matches_host():
    rng = np.random.default_rng(1)
    joints = rng.uniform(0, 96, (2, 5, 2)).astype(np.float32)
    vis = np.ones((2, 5), np.float32)
    vis[0, 2] = 0
    dev, dev_aux = T.gen_pose_target_device(jnp.asarray(joints),
                                            jnp.asarray(vis), stride=4,
                                            grid_x=24, grid_y=24, sigma=3,
                                            aux=True)
    for b in range(2):
        host, host_aux = T.gen_pose_target(joints[b].astype(np.float64),
                                           vis[b] > 0, stride=4, grid_x=24,
                                           grid_y=24, sigma=3, aux=True)
        np.testing.assert_allclose(np.asarray(dev)[b].transpose(2, 0, 1),
                                   host, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dev_aux)[b].transpose(2, 0, 1),
                                   host_aux, atol=1e-5)


def test_edge_device_matches_host():
    rng = np.random.default_rng(2)
    label = rng.integers(0, 5, (20, 20)).astype(np.uint8)
    label[3:6, 3:6] = 255
    host = T.generate_edge(label, edge_width=3)
    dev = np.asarray(T.generate_edge_device(
        jnp.asarray(label[None].astype(np.int32)), edge_width=3))[0]
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_gen_parsing_target_flip_swaps_classes():
    label = np.zeros((16, 16), np.uint8)
    label[:, :8] = 14  # leftArm on image-left
    label[:, 8:] = 15  # rightArm on image-right
    out = T.gen_parsing_target(label, flip_param=True, stride=1)
    # After h-flip + class swap: image-left half (formerly right side,
    # class 15) must now be class 14.
    assert (out[:, :8] == 14).all()
    assert (out[:, 8:] == 15).all()


def test_gen_parsing_target_crop_pads_255():
    label = np.arange(64, dtype=np.uint8).reshape(8, 8) % 20
    crop_param = np.array([[2, 2, 0, 0, 8, 8, 6, 6]])
    out = T.gen_parsing_target(label, crop_param=[crop_param, 10, 10],
                               stride=1)
    assert out.shape == (10, 10)
    assert (out[6:, :] == 255).all()
    assert (out[:, 6:] == 255).all()
    np.testing.assert_array_equal(out[:6, :6], label[2:8, 2:8])


def test_pallas_renderer_matches_xla():
    """The Pallas heatmap kernel must be bit-identical to the XLA renderer
    (interpret mode on CPU; compiled on TPU)."""
    import jax
    from npp_tpu.ops.pallas_kernels import render_heatmaps_pallas

    rng = np.random.default_rng(3)
    joints = jnp.asarray(rng.uniform(-20, 120, (2, 5, 2)), jnp.float32)
    vis = jnp.asarray((rng.random((2, 5)) > 0.2), jnp.float32)
    pm, pa = render_heatmaps_pallas(joints, vis, stride=4, grid_x=24,
                                    grid_y=24, sigma=3.0)
    xm, xa = T.gen_pose_target_device(joints, vis, stride=4, grid_x=24,
                                      grid_y=24, sigma=3, aux=True)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(xm), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(xa), atol=1e-6)


def test_paf_fields():
    rng = np.random.default_rng(4)
    joints = rng.uniform(10, 80, (16, 2))
    vis = np.ones(16, bool)
    maps, paf = T.gen_pose_target_paf(joints, vis, stride=4, grid_x=24,
                                      grid_y=24, sigma=3, aux=True)
    assert paf.shape == (2 * len(T.LIP_BODY_PARTS) + 1, 24, 24)
    # Unit vectors along limbs: nonzero magnitudes bounded by 1.
    mag = np.sqrt(paf[0] ** 2 + paf[1] ** 2)
    assert mag.max() <= 1.0 + 1e-6
    assert (mag > 0).any()
