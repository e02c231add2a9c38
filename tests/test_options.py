"""CLI option-surface parity tests: three-phase composition, model/dataset
flag injection, synonyms, normalization passes."""

import pytest

from shineon_tpu.options.base_options import namespace_from_defaults


def test_warp_viton_defaults():
    opt = namespace_from_defaults("warp", "viton")
    assert opt.model == "warp"
    assert opt.person_inputs == ["agnostic", "cocopose"]  # sorted
    assert opt.cloth_inputs == ["cloth"]
    assert opt.grid_size == 5
    assert opt.fine_width == 192 and opt.fine_height == 256
    assert opt.batch_size == 8
    assert opt.lr == 1e-4
    assert opt.keep_epochs == 5 and opt.decay_epochs == 5
    assert opt.precision == 16
    # image dataset: the n-frames flags are only injected by video datasets
    assert not hasattr(opt, "n_frames_total")


def test_model_synonyms():
    assert namespace_from_defaults("gmm", "viton").model == "warp"
    assert namespace_from_defaults("tom", "viton").model == "unet_mask"
    assert namespace_from_defaults("unet", "viton").model == "unet_mask"


def test_unet_mask_defaults():
    opt = namespace_from_defaults("unet_mask", "vvt")
    assert opt.person_inputs == ["agnostic", "densepose"]
    assert opt.pen_flow_mask == 1.0
    assert opt.n_frames_total == 1  # vvt injects the flag; default is 1
    assert opt.n_frames_now == 1  # defaulted to total


def test_sams_defaults():
    opt = namespace_from_defaults("sams", "vvt")
    assert opt.person_inputs == ["agnostic", "densepose", "flow"]
    assert opt.encoder_input == "flow"
    # argparse subtlety faithfully preserved: SamsModel's
    # set_defaults(n_frames_total=5) fires BEFORE the dataset phase adds the
    # --n_frames_total argument with an explicit default=1, which wins
    # (argparse only retrofits parser-level defaults onto existing actions).
    # The reference docs therefore pass --n_frames_total 5 explicitly.
    assert opt.n_frames_total == 1
    assert opt.n_frames_now == 1
    assert opt.batch_size == 4  # SAMS overrides the base default of 8
    assert opt.norm_G == "spectralspadesyncbatch3x3"
    assert opt.ngf_base == 2 and opt.ngf_pow_outer == 6 and opt.ngf_pow_inner == 10
    assert opt.num_middle == 3
    assert opt.gan_mode == "hinge"
    assert opt.lr_D == 3e-4
    assert opt.num_D == 2 and opt.n_layers_D == 4 and opt.ndf == 64
    assert opt.norm_D == "spectralinstance"
    assert opt.wt_l1 == opt.wt_vgg == opt.wt_multiscale == opt.wt_temporal == 1.0
    assert opt.init_type == "xavier" and opt.init_variance == 0.02


def test_dataset_flags_injected():
    opt = namespace_from_defaults("warp", "vvt")
    assert hasattr(opt, "vvt_dataroot")
    assert hasattr(opt, "warp_cloth_dir")
    opt = namespace_from_defaults("warp", "viton")
    assert hasattr(opt, "viton_dataroot") and opt.data_list == "train_pairs.txt"
    opt = namespace_from_defaults("warp", "mpv")
    assert hasattr(opt, "mpv_dataroot")
    opt = namespace_from_defaults("warp", "viton_vvt_mpv")
    assert hasattr(opt, "viton_dataroot")
    assert hasattr(opt, "vvt_dataroot")
    assert hasattr(opt, "mpv_dataroot")


def test_test_options():
    opt = namespace_from_defaults("warp", "viton", is_train=False)
    assert opt.is_train is False
    assert opt.datamode == "test"
    assert opt.no_shuffle is True
    assert opt.result_dir == "test_results"
    assert opt.val_fraction == 0  # whole set at test time


def test_n_frames_now_override():
    opt = namespace_from_defaults("sams", "vvt", n_frames_total=5, n_frames_now=2)
    assert opt.n_frames_now == 2 and opt.n_frames_total == 5


def test_val_check_clamped_to_datacap():
    opt = namespace_from_defaults(
        "warp", "viton", val_check_interval="100", datacap="10"
    )
    assert opt.val_check_interval == "10"


def test_fast_dev_run_forces_val_every_step():
    opt = namespace_from_defaults("warp", "viton", fast_dev_run=True)
    assert opt.val_check_interval == 1


def test_test_without_checkpoint_refuses():
    """test.py with no --checkpoint must fail loudly (reference train.py:39-45
    refuses to test an un-restored model) unless --allow_random_init."""
    import train as train_mod

    argv = [
        "--name", "guard_test", "--model", "warp", "--dataset", "viton",
        "--viton_dataroot", "/nonexistent",
    ]
    with pytest.raises(SystemExit, match="checkpoint"):
        train_mod.main(train=False, argv=argv)
    # the explicit opt-out flag exists and defaults off
    opt = namespace_from_defaults("warp", "viton", is_train=False)
    assert opt.allow_random_init is False


def test_int8_spade_flag_sets_env(monkeypatch):
    """--int8_spade (TestOptions) wires the quantized-serving env switch."""
    from shineon_tpu.options.test_options import TestOptions

    monkeypatch.delenv("SHINEON_INT8_SPADE", raising=False)
    opt = TestOptions().parse(argv=[
        "--name", "int8_opt", "--model", "warp", "--dataset", "viton",
        "--viton_dataroot", "/nonexistent", "--int8_spade",
    ])
    assert opt.int8_spade is True
    import os

    assert os.environ.get("SHINEON_INT8_SPADE") == "1"
    # don't leak quantized serving into later tests in this process (the
    # ownership rule below would clear it on the next parse, but tests that
    # never parse options must not see it either)
    os.environ.pop("SHINEON_INT8_SPADE", None)


def test_int8_spade_env_does_not_leak_across_parses(monkeypatch):
    """A parse() WITHOUT --int8_spade clears a value a previous parse() set
    (ADVICE r3: long-lived processes must not leak quantized serving into
    runs that did not request it) — but never clobbers an external export."""
    import os

    from shineon_tpu.options.test_options import TestOptions

    base = [
        "--name", "int8_leak", "--model", "warp", "--dataset", "viton",
        "--viton_dataroot", "/nonexistent",
    ]
    monkeypatch.delenv("SHINEON_INT8_SPADE", raising=False)
    TestOptions().parse(argv=base + ["--int8_spade"])
    assert os.environ.get("SHINEON_INT8_SPADE") == "1"
    TestOptions().parse(argv=base)
    assert "SHINEON_INT8_SPADE" not in os.environ

    # externally exported value survives a flag-absent parse
    monkeypatch.setenv("SHINEON_INT8_SPADE", "1")
    TestOptions().parse(argv=base)
    assert os.environ.get("SHINEON_INT8_SPADE") == "1"


def test_exact_gan_step_is_default():
    """The reference's per-optimizer regeneration is the default; the faster
    approximation is opt-in via --fast_gan_step (ADVICE r3)."""
    opt = namespace_from_defaults("sams", "vvt")
    assert opt.fast_gan_step is False
