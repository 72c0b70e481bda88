"""Native libav video core: encode/decode round trip, random access, parity
with the video_io facade. Skips when the C++ core can't build (no g++/ffmpeg).
"""

import numpy as np
import pytest

from humanvid_tpu.native import available

pytestmark = pytest.mark.skipif(not available(), reason="native video core unavailable")


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    from humanvid_tpu.data.native_video import VideoWriter

    H, W, F = 64, 96, 30
    rng = np.random.default_rng(0)
    # smooth content so lossy round-trip errors stay small
    base = rng.integers(0, 255, (8, 12, 3), dtype=np.uint8)
    import cv2
    big = cv2.resize(base, (W, H), interpolation=cv2.INTER_CUBIC)
    frames = np.stack([np.roll(big, 3 * i, axis=1) for i in range(F)])
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    with VideoWriter(path, W, H, fps=12.0) as w:
        w.write(frames)
    return path, frames


def test_index_and_metadata(clip):
    from humanvid_tpu.data.native_video import VideoReader

    path, frames = clip
    with VideoReader(path) as r:
        assert len(r) == frames.shape[0]
        assert (r.width, r.height) == (frames.shape[2], frames.shape[1])
        assert abs(r.fps - 12.0) < 1e-3


def test_random_access_and_duplicates(clip):
    from humanvid_tpu.data.native_video import VideoReader

    path, frames = clip
    with VideoReader(path) as r:
        batch = r.get_batch([29, 0, 7, 7, 15])
        assert batch.shape == (5, 64, 96, 3)
        assert (batch[2] == batch[3]).all()
        for out_i, src_i in [(0, 29), (1, 0), (2, 7), (4, 15)]:
            err = np.abs(batch[out_i].astype(int) - frames[src_i].astype(int)).mean()
            assert err < 16, (src_i, err)


def test_sequential_matches_batch(clip):
    from humanvid_tpu.data.native_video import VideoReader

    path, frames = clip
    with VideoReader(path) as r:
        allf = r.read_all()
        single = np.stack([r[i] for i in [0, 10, 29]])
    assert allf.shape[0] == frames.shape[0]
    assert (allf[[0, 10, 29]] == single).all()


def test_video_io_facade_uses_native(clip, tmp_path):
    from humanvid_tpu.data import video_io

    path, frames = clip
    assert video_io.get_frame_count(path) == frames.shape[0]
    sel = video_io.read_frames(path, indices=[3, 1])
    assert sel.shape == (2, 64, 96, 3)
    out = str(tmp_path / "grid.mp4")
    video_io.save_videos_grid([frames, frames], out, fps=12.0)
    assert video_io.get_frame_count(out) == frames.shape[0]


def test_out_of_range_raises(clip):
    from humanvid_tpu.data.native_video import VideoReader

    path, frames = clip
    with VideoReader(path) as r:
        with pytest.raises(IOError):
            r.get_batch([frames.shape[0]])
