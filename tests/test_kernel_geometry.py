"""Pin the fused kernel's geometry decisions for known configs.

These are pure host-side functions, but their outputs decide compiled
kernel shapes and hardware-only behavior (fold row lengths, left-pad,
supported num_select) — a silent change here surfaces only as a TPU
recompile or a Mosaic error, so pin them in CI.
"""

from hsc_tpu.ops.mp_kernels import _lpad, pallas_fold, pallas_num_select_options


def test_flagship_geometry():
    npos = 16384 - 32 + 1  # flagship: block 16384, W=32
    assert pallas_fold(npos, 32) == 8
    assert pallas_num_select_options(npos, 32) == (1, 8, 16)
    assert _lpad(32) == 128


def test_wide_window_geometry():
    assert _lpad(129) == 128  # boundary: W-1 = 128 still fits the default
    assert _lpad(130) == 256
    assert _lpad(160) == 256
    assert _lpad(300) == 384
    npos = 2048 - 160 + 1
    assert pallas_fold(npos, 160) == 4  # cw=448 forces the 4-fold cache


def test_small_geometry():
    npos = 1024 - 16 + 1  # the test-suite config
    assert pallas_fold(npos, 16) == 4
    assert 1 in pallas_num_select_options(npos, 16)
