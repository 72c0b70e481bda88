import os

import numpy as np
import pytest

from humanvid_tpu.pipelines.context import all_step_windows, ordered_halving, uniform_windows

REF = "/root/reference/src/pipelines/context.py"


def test_short_video_single_window():
    assert uniform_windows(0, 16, context_size=24) == [list(range(16))]


def test_windows_cover_all_frames():
    for step in range(8):
        w = uniform_windows(step, 72, 24, 1, 4)
        covered = set(i for win in w for i in win)
        assert covered == set(range(72))


def test_all_step_windows_static_shape():
    w = all_step_windows(30, 72, 24, 1, 4)
    assert w.shape == (30, 4, 24)
    assert w.dtype == np.int32
    assert w.min() >= 0 and w.max() < 72


def test_ordered_halving_is_bit_reversal():
    assert ordered_halving(0) == 0.0
    assert ordered_halving(1) == 0.5
    assert ordered_halving(2) == 0.25
    assert ordered_halving(3) == 0.75


@pytest.mark.skipif(not os.path.exists(REF), reason="reference tree not mounted")
def test_parity_with_reference():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_context", REF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    for step in [0, 1, 2, 7, 15, 29]:
        for nf in [16, 24, 48, 72, 100]:
            expected = list(ref.uniform(step, 30, nf, 24, 1, 4, True))
            assert uniform_windows(step, nf, 24, 1, 4, True) == expected
