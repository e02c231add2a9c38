"""SSIM/PSNR implementation checks + checkpoint round-trips."""

import numpy as np
import jax
import jax.numpy as jnp

from shineon_tpu.utils.metrics import (
    peak_signal_noise_ratio,
    structural_similarity,
)


def test_ssim_identical_images(rng):
    img = (rng.rand(64, 48, 3) * 255).astype(np.uint8)
    assert structural_similarity(
        img, img, data_range=255, multichannel=True
    ) == 1.0


def test_ssim_decreases_with_noise(rng):
    img = (rng.rand(64, 48) * 255).astype(np.float64)
    low_noise = img + rng.randn(64, 48) * 5
    high_noise = img + rng.randn(64, 48) * 50
    s_low = structural_similarity(img, low_noise, data_range=255)
    s_high = structural_similarity(img, high_noise, data_range=255)
    assert 1.0 > s_low > s_high > 0.0


def test_ssim_constant_shift():
    """A mean shift reduces luminance similarity predictably."""
    a = np.full((32, 32), 100.0)
    b = np.full((32, 32), 120.0)
    # closed form: variance 0 -> S = (2*ux*uy + C1)/(ux^2+uy^2+C1) (contrast
    # and structure terms are C2/C2 = 1)
    C1 = (0.01 * 255) ** 2
    expected = (2 * 100 * 120 + C1) / (100 ** 2 + 120 ** 2 + C1)
    got = structural_similarity(a, b, data_range=255)
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_psnr():
    a = np.zeros((8, 8))
    b = np.full((8, 8), 10.0)
    # mse=100, data_range=255 -> 10*log10(255^2/100)
    np.testing.assert_allclose(
        peak_signal_noise_ratio(a, b, data_range=255),
        10 * np.log10(255 ** 2 / 100),
    )
    assert peak_signal_noise_ratio(a, a, data_range=255) == float("inf")


def test_checkpoint_roundtrip(tmp_path):
    from shineon_tpu.training.checkpointing import load_checkpoint, save_checkpoint
    from shineon_tpu.training.state import NetState, TrainState

    state = TrainState.create({
        "net": NetState(
            params={"w": jnp.arange(6.0).reshape(2, 3)},
            stats={"batch_stats": {"m": jnp.ones((3,))}},
            opt_state=(jnp.zeros((2, 3)),),
        )
    })
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, state)
    np.testing.assert_array_equal(
        np.asarray(restored.nets["net"].params["w"]),
        np.asarray(state.nets["net"].params["w"]),
    )
    assert int(np.asarray(restored.step)) == 0


def test_checkpoint_keeper_topk_and_named(tmp_path):
    from shineon_tpu.training.checkpointing import CheckpointKeeper, load_checkpoint
    from shineon_tpu.training.state import NetState, TrainState

    def mk(v):
        return TrainState.create({
            "net": NetState(
                params={"w": jnp.full((2,), float(v))}, stats={}, opt_state=()
            )
        })

    keeper = CheckpointKeeper(str(tmp_path / "ck"), save_count=2, top_k=2)
    keeper.save_validation(1, mk(1), checkpoint_on=0.5)
    keeper.save_validation(2, mk(2), checkpoint_on=0.1)
    keeper.save_validation(3, mk(3), checkpoint_on=0.9)
    assert keeper.maybe_save_step(2, mk(2))
    assert not keeper.maybe_save_step(3, mk(3))
    path = keeper.save_named("interrupted_by_Test", mk(9))
    keeper.wait()
    restored = load_checkpoint(path, mk(0))
    np.testing.assert_array_equal(
        np.asarray(restored.nets["net"].params["w"]), [9.0, 9.0]
    )
    # top-k kept the 2 best (steps 1 and 2), dropped the worst (step 3)
    import os

    kept = sorted(os.listdir(tmp_path / "ck" / "topk"))
    kept = [k for k in kept if k.isdigit()]
    assert kept == ["1", "2"], kept
