"""Parity of on-device preprocessing ops against the reference's PIL/numpy math."""

import numpy as np
from PIL import Image, ImageDraw

import jax.numpy as jnp

from shineon_tpu.ops import image_ops


def test_normalize_roundtrip(rng):
    img = rng.randint(0, 256, (4, 6, 3)).astype(np.uint8)
    normed = np.asarray(image_ops.normalize_rgb(jnp.asarray(img)))
    assert normed.min() >= -1 and normed.max() <= 1
    back = np.asarray(image_ops.denormalize_to_uint8(jnp.asarray(normed)))
    np.testing.assert_array_equal(back, img)


def test_cloth_mask_intended_and_quirk(rng):
    cloth = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    cloth[:2] = 250  # white background
    mask = np.asarray(image_ops.cloth_mask_from_image(jnp.asarray(cloth)))
    assert mask.shape == (8, 8, 1)
    assert (mask[:2] == 0).all()
    # reference-quirk mode: threshold compared against normalized values ->
    # all ones (tryon_dataset.py:169-177 under torch semantics)
    quirk = np.asarray(
        image_ops.cloth_mask_from_image(jnp.asarray(cloth), reference_quirk=True)
    )
    assert (quirk == 1).all()


def test_body_silhouette_matches_pil():
    h, w = 256, 192
    parse = np.zeros((h, w), np.uint8)
    parse[40:200, 50:150] = 5  # a body blob
    ours = np.asarray(image_ops.body_silhouette(jnp.asarray(parse), h, w))[..., 0]

    # reference path (tryon_dataset.py:346-367)
    sil = (parse > 0).astype(np.float32)
    pil = Image.fromarray((sil * 255).astype(np.uint8))
    pil = pil.resize((w // 16, h // 16), Image.BILINEAR)
    pil = pil.resize((w, h), Image.BILINEAR)
    theirs = np.asarray(pil).astype(np.float32) / 255.0
    theirs = (theirs - 0.5) / 0.5
    # PIL's fixed-point bilinear differs from float bilinear by ~1 LSB of uint8
    assert np.abs(ours - theirs).max() <= 3.0 / 127.5


def test_head_crop_and_cloth_segment():
    parse = np.zeros((6, 6), np.uint8)
    parse[0, 0] = image_ops.LIP_FACE
    parse[1, 1] = image_ops.LIP_UPPER_CLOTHES
    img = np.full((6, 6, 3), 0.5, np.float32)
    head = np.asarray(image_ops.head_crop(jnp.asarray(img), jnp.asarray(parse)))
    assert np.allclose(head[0, 0], 0.5)
    assert np.allclose(head[1, 1], -1.0)  # non-head filled with -1
    cloth = np.asarray(
        image_ops.segment_cloths_from_image(jnp.asarray(img), jnp.asarray(parse))
    )
    assert np.allclose(cloth[1, 1], 0.5)
    assert np.allclose(cloth[0, 0], 1.0)  # non-cloth filled with +1


def test_pose_heatmaps_match_pil_rectangles(rng):
    h, w, r, k = 64, 48, 5, 18
    kp = np.zeros((k, 3), np.float32)
    kp[:, 0] = rng.rand(k) * (w + 10) - 5
    kp[:, 1] = rng.rand(k) * (h + 10) - 5
    kp[3] = [0.5, 0.5, 0]  # invalid point (x <= 1)
    pose_map, vis = image_ops.pose_keypoint_heatmaps(jnp.asarray(kp), h, w, r)
    pose_map, vis = np.asarray(pose_map), np.asarray(vis)
    assert pose_map.shape == (h, w, k)

    im_vis = Image.new("L", (w, h))
    draw_vis = ImageDraw.Draw(im_vis)
    for i in range(k):
        one = Image.new("L", (w, h))
        x, y = kp[i, 0], kp[i, 1]
        if x > 1 and y > 1:
            d = ImageDraw.Draw(one)
            d.rectangle((x - r, y - r, x + r, y + r), "white", "white")
            draw_vis.rectangle((x - r, y - r, x + r, y + r), "white", "white")
        expected = (np.asarray(one).astype(np.float32) / 255.0 - 0.5) / 0.5
        np.testing.assert_array_equal(pose_map[..., i], expected, err_msg=f"joint {i}")
    expected_vis = (np.asarray(im_vis).astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_array_equal(vis[..., 0], expected_vis)


def test_flow_normalize():
    flow = np.array([[[[0.0, 1.0]]]], np.float32)
    out = np.asarray(image_ops.normalize_flow(jnp.asarray(flow)))
    np.testing.assert_allclose(out, [[[[-1.0, 1.0]]]])


def test_channel_norm():
    x = np.array([[[[3.0, 4.0]]]], np.float32)
    out = np.asarray(image_ops.channel_norm(jnp.asarray(x)))
    np.testing.assert_allclose(out, [[[[5.0]]]])
