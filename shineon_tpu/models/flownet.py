"""FlowNet wrapper: offline optical-flow + confidence computation.

Reference: models/flownet.py:18-109 — loads FlowNet2 with the NVIDIA
checkpoint, resizes inputs to /64 multiples, estimates flow, and derives a
confidence mask ``conf = (||im1 - resample(im2, flow)||^2 < 0.02)``. Used as an
offline preprocessing stage to generate the `.flo` annotations the video
models condition on (docs/1_installation_and_data.md:100-104).

TPU-native: the whole estimate (resize -> FlowNet2 -> warp -> confidence) is
one jitted program; frames are processed in batches.
"""

from __future__ import annotations

import os
import os.path as osp
from glob import glob
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shineon_tpu.datasets.flow_utils import write_flow
from shineon_tpu.networks.flownet import FlowNet2
from shineon_tpu.networks.flownet.flownet2 import convert_torch_flownet2_state_dict
from shineon_tpu.ops.grid_sample import resample2d
from shineon_tpu.utils.log import get_logger

logger = get_logger()


class FlowNet:
    """Inference-only flow estimator (reference models/flownet.py:22-59)."""

    def __init__(self, checkpoint_path: Optional[str] = None, rng_seed: int = 420):
        self.model = FlowNet2()
        self.variables = self._load(checkpoint_path, rng_seed)

        @jax.jit
        def _estimate(variables, im1, im2):
            B, H, W, _ = im1.shape
            H64 = max(64, int(np.floor(np.ceil(H / 64.0) * 64.0)))
            W64 = max(64, int(np.floor(np.ceil(W / 64.0) * 64.0)))
            im1r = jax.image.resize(im1, (B, H64, W64, 3), method="bilinear")
            im2r = jax.image.resize(im2, (B, H64, W64, 3), method="bilinear")
            flow = self.model.apply(variables, im1r, im2r)
            flow = jax.image.resize(flow, (B, H, W, 2), method="bilinear")
            # rescale displacement units to the original resolution
            flow = flow * jnp.asarray([W / W64, H / H64], jnp.float32)
            # confidence: squared warp error below 0.02 (flownet.py:49-58)
            x1 = im1.astype(jnp.float32) / 255.0
            x2 = im2.astype(jnp.float32) / 255.0
            warped = resample2d(x2, flow)
            err = jnp.sum((x1 - warped) ** 2, axis=-1, keepdims=True)
            conf = (err < 0.02).astype(jnp.float32)
            return flow, conf

        self._estimate = _estimate

    def _load(self, checkpoint_path, rng_seed):
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(self.model.init)(jax.random.PRNGKey(rng_seed), dummy, dummy)
        path = checkpoint_path or os.environ.get("SHINEON_FLOWNET2_WEIGHTS", "")
        if path and osp.exists(path):
            import torch

            payload = torch.load(path, map_location="cpu", weights_only=False)
            state_dict = payload.get("state_dict", payload)
            converted = convert_torch_flownet2_state_dict(state_dict)
            variables = {"params": converted["params"]}
            logger.info(f"FlowNet2 weights loaded from {path}")
        else:
            logger.warning(
                "FlowNet2 running with RANDOM weights (no checkpoint at "
                f"{path!r}); set SHINEON_FLOWNET2_WEIGHTS or pass "
                "checkpoint_path to produce meaningful flow."
            )
        return variables

    def __call__(
        self, im1_u8: np.ndarray, im2_u8: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, H, W, 3) uint8 frame pairs -> (flow (B,H,W,2), conf (B,H,W,1))."""
        flow, conf = self._estimate(
            self.variables,
            jnp.asarray(im1_u8, jnp.float32),
            jnp.asarray(im2_u8, jnp.float32),
        )
        return np.asarray(flow), np.asarray(conf)


def generate_flow_annotations(
    frames_root: str,
    out_root: str,
    checkpoint_path: Optional[str] = None,
    batch_size: int = 4,
) -> int:
    """Walk per-video frame folders and write consecutive-frame .flo files —
    the offline stage mirroring docs/1_installation_and_data.md:100-104.

    Returns the number of flow files written.
    """
    from PIL import Image

    net = FlowNet(checkpoint_path)
    written = 0
    for video in sorted(os.listdir(frames_root)):
        vdir = osp.join(frames_root, video)
        if not osp.isdir(vdir):
            continue
        frames = sorted(glob(osp.join(vdir, "*.png")))
        out_dir = osp.join(out_root, video)
        os.makedirs(out_dir, exist_ok=True)
        pairs = list(zip(frames[:-1], frames[1:]))
        for i in range(0, len(pairs), batch_size):
            chunk = pairs[i:i + batch_size]
            im1 = np.stack(
                [np.asarray(Image.open(a).convert("RGB")) for a, _ in chunk]
            )
            im2 = np.stack(
                [np.asarray(Image.open(b).convert("RGB")) for _, b in chunk]
            )
            flow, _ = net(im1, im2)
            for (a, _), f in zip(chunk, flow):
                out_path = osp.join(
                    out_dir, osp.basename(a).replace(".png", ".flo")
                )
                write_flow(out_path, f)
                written += 1
    return written
